"""Fused DiceCE loss (CT config) as a Pallas kernel pair with a custom VJP.

Behavior contract: identical value/gradient to
``medseg.ops.losses.dice_ce_loss(softmax=True, to_onehot_y=True)`` — the
MONAI 0.6 ``DiceCELoss(to_onehot_y=True, softmax=True)`` the reference
trains with (`/root/reference/unetr_segmentation_3d.py:404`), re-derived
analytically for the backward pass.

Why a kernel: the training-step trace (benchmarks/trace_train.py) shows the
jnp loss chain costs ~38 ms/step at 4x96^3x14 — every pass runs on
channels-MINOR fp32 tensors whose 14/16-lane tiling wastes ~8x of each
vector op (measured ~60 GB/s effective on the CE backward fusion). Here the
class dim sits on SUBLANES of the compact of-form layout (B, D, CO_pad,
H*W) and the whole loss is two passes:

- forward: one read of (logits, labels) -> CE sum + per-(b, c) soft-dice
  sums (intersection, pred, ground) via grid-accumulated stat rows; the
  scalar loss assembles in XLA from ~KB of sums.
- backward: one read + one dlogits write; softmax is recomputed in-kernel,
  the dice quotient terms enter as per-(b, c) coefficient rows
  (coefA*g + coefB), CE as cec*(p - g), chained through softmax in closed
  form: dlogit = cec*(p - g) + p*(u - sum_k p_k u_k).

Gradient w.r.t. labels is float0 (integer targets).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from medseg.kernels.conv_of import LANE, _COMPILER_PARAMS

_NR = 1e-5  # MONAI smooth_nr / smooth_dr
_DR = 1e-5
_NEG = -1e30  # finite stand-in for -inf (0 * -inf = NaN hazards)


def _zb_loss(d: int) -> int:
    for z in (8, 4, 2):
        if d % z == 0:
            return z
    return 1


def _loss_fwd_kernel(
    lg_ref, lab_ref, ce_ref, i_ref, p_ref, g_ref, *, zb: int, n_classes: int
):
    zblk = pl.program_id(1)
    co = lg_ref.shape[2]
    lo = lg_ref.shape[3]
    cls = jax.lax.broadcasted_iota(jnp.int32, (co, lo), 0)
    valid = cls < n_classes

    ce_acc = jnp.zeros((), jnp.float32)
    i_acc = jnp.zeros((co, 1), jnp.float32)
    p_acc = jnp.zeros((co, 1), jnp.float32)
    g_acc = jnp.zeros((co, 1), jnp.float32)
    for j in range(zb):
        l = jnp.where(valid, lg_ref[0, j].astype(jnp.float32), _NEG)
        lab = lab_ref[0, j][None, :]  # (1, LO) int32
        m = jnp.max(l, axis=0, keepdims=True)
        e = jnp.exp(l - m)
        z = jnp.sum(e, axis=0, keepdims=True)
        p = e / z
        g = (lab == cls).astype(jnp.float32)
        logp = jnp.where(valid, l - m - jnp.log(z), 0.0)
        ce_acc += jnp.sum(g * logp)
        i_acc += jnp.sum(p * g, axis=1, keepdims=True)
        p_acc += jnp.sum(p, axis=1, keepdims=True)
        g_acc += jnp.sum(g, axis=1, keepdims=True)

    ce_row = jnp.broadcast_to(-ce_acc, (1, co, LANE))

    @pl.when(zblk == 0)
    def _():
        ce_ref[...] = ce_row
        i_ref[...] = jnp.broadcast_to(i_acc, (co, LANE))[None]
        p_ref[...] = jnp.broadcast_to(p_acc, (co, LANE))[None]
        g_ref[...] = jnp.broadcast_to(g_acc, (co, LANE))[None]

    @pl.when(zblk != 0)
    def _():
        ce_ref[...] += ce_row
        i_ref[...] += jnp.broadcast_to(i_acc, (co, LANE))[None]
        p_ref[...] += jnp.broadcast_to(p_acc, (co, LANE))[None]
        g_ref[...] += jnp.broadcast_to(g_acc, (co, LANE))[None]


def _loss_bwd_kernel(
    lg_ref, lab_ref, ca_ref, cb_ref, cec_ref, dl_ref, *, zb: int, n_classes: int
):
    co = lg_ref.shape[2]
    lo = lg_ref.shape[3]
    cls = jax.lax.broadcasted_iota(jnp.int32, (co, lo), 0)
    valid = cls < n_classes
    ca = ca_ref[0]  # (CO, 1) fp32
    cb = cb_ref[0]
    cec = cec_ref[0]  # (1, 1)

    rows = []
    for j in range(zb):
        l = jnp.where(valid, lg_ref[0, j].astype(jnp.float32), _NEG)
        lab = lab_ref[0, j][None, :]
        m = jnp.max(l, axis=0, keepdims=True)
        e = jnp.exp(l - m)
        z = jnp.sum(e, axis=0, keepdims=True)
        p = e / z
        g = (lab == cls).astype(jnp.float32)
        u = ca * g + cb  # dL_dice/dp, (CO, LO); zero rows at pad classes
        pu = jnp.sum(p * u, axis=0, keepdims=True)  # (1, LO)
        dl = cec * (p - g) + p * (u - pu)
        rows.append(dl)
    dl_ref[...] = jnp.stack(rows)[None].astype(dl_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def dice_ce_of(
    logits_of: jax.Array,  # (B, D, CO_pad, LO) compact of-form, no DPAD rows
    labels: jax.Array,  # (B, D, LO) int32 class indices
    n_classes: int,
    interpret: bool = False,
) -> jax.Array:
    loss, _ = _fwd(logits_of, labels, n_classes, interpret)
    return loss


def _sums(logits_of, labels, n_classes, interpret):
    bsz, d, co, lo = logits_of.shape
    zb = _zb_loss(d)
    stat_spec = pl.BlockSpec((1, co, LANE), lambda bb, zz: (bb, 0, 0))
    stat_shape = jax.ShapeDtypeStruct((bsz, co, LANE), jnp.float32)
    ce, i_s, p_s, g_s = pl.pallas_call(
        functools.partial(_loss_fwd_kernel, zb=zb, n_classes=n_classes),
        grid=(bsz, d // zb),
        in_specs=[
            pl.BlockSpec((1, zb, co, lo), lambda bb, zz: (bb, zz, 0, 0)),
            pl.BlockSpec((1, zb, lo), lambda bb, zz: (bb, zz, 0)),
        ],
        out_specs=(stat_spec,) * 4,
        out_shape=(stat_shape,) * 4,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(logits_of, labels)
    return ce[:, 0, 0], i_s[..., 0], p_s[..., 0], g_s[..., 0]


def _fwd(logits_of, labels, n_classes, interpret):
    bsz, d, co, lo = logits_of.shape
    ce_sum, i_s, p_s, g_s = _sums(logits_of, labels, n_classes, interpret)
    i_c = i_s[:, :n_classes]
    p_c = p_s[:, :n_classes]
    g_c = g_s[:, :n_classes]
    denom = g_c + p_c + _DR
    dice = jnp.mean(1.0 - (2.0 * i_c + _NR) / denom)
    n_vox = bsz * d * lo
    loss = dice + jnp.sum(ce_sum) / n_vox
    return loss, (logits_of, labels, i_c, denom)


def _bwd(n_classes, interpret, res, gbar):
    logits_of, labels, i_c, denom = res
    bsz, d, co, lo = logits_of.shape
    zb = _zb_loss(d)
    inv_bc = gbar / (bsz * n_classes)  # d(mean over B x C')
    ca = -2.0 * inv_bc / denom  # (B, C') df/dI
    cb = inv_bc * (2.0 * i_c + _NR) / jnp.square(denom)  # df/dD
    pad = ((0, 0), (0, co - n_classes))
    ca = jnp.pad(ca, pad)[..., None]  # (B, CO, 1), pad-class rows 0
    cb = jnp.pad(cb, pad)[..., None]
    cec = jnp.broadcast_to(gbar / (bsz * d * lo), (bsz, 1, 1)).astype(jnp.float32)

    row = lambda c_: pl.BlockSpec((1, c_, 1), lambda bb, zz: (bb, 0, 0))
    dl = pl.pallas_call(
        functools.partial(_loss_bwd_kernel, zb=zb, n_classes=n_classes),
        grid=(bsz, d // zb),
        in_specs=[
            pl.BlockSpec((1, zb, co, lo), lambda bb, zz: (bb, zz, 0, 0)),
            pl.BlockSpec((1, zb, lo), lambda bb, zz: (bb, zz, 0)),
            row(co), row(co), row(1),
        ],
        out_specs=pl.BlockSpec((1, zb, co, lo), lambda bb, zz: (bb, zz, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, d, co, lo), logits_of.dtype),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(logits_of, labels, ca.astype(jnp.float32), cb.astype(jnp.float32), cec)
    return dl, np.zeros(labels.shape, dtype=jax.dtypes.float0)


dice_ce_of.defvjp(_fwd, _bwd)


def fused_loss_supported(logits_shape, task: str) -> bool:
    """CT (softmax + one-hot-target) config on compact-lane shapes only; the
    MRI sigmoid/multi-label config keeps the jnp path."""
    if task != "ct" or len(logits_shape) != 5:
        return False
    _, d, h, w, c = logits_shape
    return (h * w) % 128 == 0 and d >= 2 and c <= 16


def dice_ce_fused(
    logits: jax.Array,  # (B, D, H, W, C) as the model emits
    label: jax.Array,  # (B, D, H, W[, 1]) class indices
    *,
    interpret: bool = False,
) -> jax.Array:
    """NDHWC entry: relayout to of-form (one transpose — still ~4x cheaper
    than running the jnp chain on channels-minor tensors) and run the fused
    kernel. Same value/grad as
    ``dice_ce_loss(softmax=True, to_onehot_y=True)``."""
    b, d, h, w, c = logits.shape
    if label.ndim == 5:
        label = label[..., 0]
    co = max(8, -(-c // 8) * 8)
    lg = logits.transpose(0, 1, 4, 2, 3).reshape(b, d, c, h * w)
    lg = jnp.pad(lg, ((0, 0), (0, 0), (0, co - c), (0, 0)))
    lab = label.reshape(b, d, h * w).astype(jnp.int32)
    return dice_ce_of(lg, lab, c, interpret)
