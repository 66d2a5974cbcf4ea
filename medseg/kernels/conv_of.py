"""Pallas TPU kernel: fused 3x3x3 conv in OUTPUT-FORM flat layout.

Second-generation kernel behind the UNETR full-resolution stages
(`/root/reference/unetr.py:90-98,165-174`; the two stages are 77% of the
measured forward, docs/PERF_NOTES.md). The round-1 kernel (conv3d.py) wins
2.1x standalone but pays full HBM passes around every conv: repad to the
halo layout, instance-norm stats, norm apply, LeakyReLU — each a read+write
over ~450MB at 8x96^3. This kernel eliminates them:

- **Output-form layout (B, D, C, H*WP)**: what a conv WRITES is directly
  what the next conv READS. No repad pass: z-halos are handled by clamping
  the 3 row-stream index maps and zeroing invalid rows; y-halos by +-WP lane
  rolls with the wrapped y-block masked.
- **Fused input transform**: the previous conv's instance-norm affine
  (a*x + b, per batch element and channel) and LeakyReLU execute on rows in
  VMEM while building the patch matrix — the norm "apply" pass costs nothing
  at HBM level.
- **Stats epilogue**: per-(b, channel) sum and sum-of-squares of the masked
  conv output accumulate into revisited output blocks, so the NEXT norm's
  mean/var need no separate pass over the tensor (two-phase instance norm:
  stats here, apply in the consumer).
- **Residual tap**: optionally computes the block's 1x1x1 projection
  (conv3) of the same (transformed) input rows in the same pass, with its
  own stats.

The MXU matmul keeps the round-1 shape ((3*CO, 9*C) x (9C, H*WP): all three
dx taps in one multiply, dx results rolled into place by +-1 lane).

Backward: inference-path kernel; training uses the XLA path (conv3d.py
routes). Semantics are parity-tested against the plain flax forward in
tests/test_conv_of.py (interpret mode on CPU, real kernels on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from medseg.kernels.conv3d import LANE, _wp, weight_matrix
from medseg.models.blocks import LEAKY_SLOPE, NORM_EPS


def to_output_form(x: jax.Array, dtype=None) -> jax.Array:
    """NDHWC (B, D, H, W, C) -> output-form flat (B, D, C, H*WP).

    Valid x data sits at lanes [1, w+1) of each WP block (the lane convention
    of conv3d.py's conv output), pad lanes zero.
    """
    b, d, h, w, c = x.shape
    wp = _wp(w)
    xt = x.transpose(0, 1, 4, 2, 3)  # (B, D, C, H, W)
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, 0), (0, 0), (1, wp - w - 1)))
    out = xt.reshape(b, d, c, h * wp)
    return out.astype(dtype) if dtype is not None else out


def from_output_form(o: jax.Array, h: int, w: int) -> jax.Array:
    """Output-form (B, D, C, H*WP) -> NDHWC (B, D, H, W, C)."""
    b, d, c, _ = o.shape
    wp = _wp(w)
    return o.reshape(b, d, c, h, wp)[..., 1 : w + 1].transpose(0, 1, 3, 4, 2)


def _kernel(
    *refs,
    c: int,
    c_out: int,
    h: int,
    w: int,
    wp: int,
    d: int,
    input_act: str,
    residual: bool,
    compute_dtype,
):
    if residual:
        (x0, x1, x2, a_ref, b_ref, w_ref, wr_ref,
         o_ref, s_ref, ss_ref, r_ref, rs_ref, rss_ref) = refs
    else:
        x0, x1, x2, a_ref, b_ref, w_ref, o_ref, s_ref, ss_ref = refs
    z = pl.program_id(1)
    lo = h * wp
    lane = jax.lax.broadcasted_iota(jnp.int32, (c, lo), 1)
    lane_valid = ((lane % wp) >= 1) & ((lane % wp) < w + 1)

    rows = []
    for k, xr in enumerate((x0, x1, x2)):
        r = xr[0, 0].astype(jnp.float32)  # (C, LO)
        if input_act == "affine_leaky":
            r = r * a_ref[0] + b_ref[0]  # (C, 1) broadcast over lanes
            r = jnp.where(r >= 0, r, LEAKY_SLOPE * r)
        zi = z - 1 + k
        zvalid = jnp.logical_and(zi >= 0, zi < d)
        r = jnp.where(jnp.logical_and(lane_valid, zvalid), r, 0.0)
        rows.append(r)

    pieces = []
    for dz in range(3):
        base = rows[dz]
        # dy taps: output row y reads input row y + (dy - 1)
        down = pltpu.roll(base, wp, 1)  # input row y-1 lands at block y
        down = jnp.where(lane >= wp, down, 0.0)
        up = pltpu.roll(base, lo - wp, 1)  # input row y+1 at block y
        up = jnp.where(lane < lo - wp, up, 0.0)
        pieces.extend([down, base, up])
    patches9 = jnp.concatenate(pieces, axis=0).astype(compute_dtype)  # (9C, LO)

    m3 = jnp.dot(w_ref[...], patches9, preferred_element_type=jnp.float32)
    acc = None
    for dx in range(3):
        m = jax.lax.slice(m3, (dx * c_out, 0), ((dx + 1) * c_out, lo))
        sh = (lo - (dx - 1)) % lo
        if sh:
            m = pltpu.roll(m, sh, 1)
        acc = m if acc is None else acc + m
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (c_out, lo), 1)
    out_valid = ((out_lane % wp) >= 1) & ((out_lane % wp) < w + 1)
    acc = jnp.where(out_valid, acc, 0.0)
    o_ref[...] = acc.astype(o_ref.dtype)[None, None]

    def accumulate_stats(vals, sref, ssref):
        s = jnp.broadcast_to(jnp.sum(vals, axis=1, keepdims=True), (c_out, LANE))
        ss = jnp.broadcast_to(
            jnp.sum(vals * vals, axis=1, keepdims=True), (c_out, LANE)
        )

        @pl.when(z == 0)
        def _():
            sref[...] = s[None]
            ssref[...] = ss[None]

        @pl.when(z != 0)
        def _():
            sref[...] += s[None]
            ssref[...] += ss[None]

    accumulate_stats(acc, s_ref, ss_ref)

    if residual:
        # 1x1x1 projection (conv3) of the transformed center row
        res = jnp.dot(
            wr_ref[...], rows[1].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        res = jnp.where(out_valid, res, 0.0)
        r_ref[...] = res.astype(r_ref.dtype)[None, None]
        accumulate_stats(res, rs_ref, rss_ref)


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "input_act", "residual", "out_dtype", "interpret"),
)
def conv3x3x3_of(
    x: jax.Array,  # output-form (B, D, C, H*WP)
    wmat: jax.Array,  # (3*CO, 9*C) from conv3d.weight_matrix
    a: jax.Array,  # (B, C, 1) fp32 input-affine scale (input_act="affine_leaky")
    b: jax.Array,  # (B, C, 1) fp32 input-affine bias
    wres: jax.Array | None = None,  # (CO, C) residual 1x1 weights
    *,
    h: int,
    w: int,
    input_act: str = "none",  # "none" | "affine_leaky"
    residual: bool = False,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Fused conv. Returns (out, s, ss) or (out, s, ss, res, rs, rss) with
    ``residual=True``. ``s``/``ss`` are (B, CO, 128) lane-broadcast sums /
    sums-of-squares over the valid voxels (take lane 0)."""
    bsz, d, c, lo = x.shape
    wp = _wp(w)
    c_out = wmat.shape[0] // 3
    compute_dtype = wmat.dtype
    if input_act == "none":
        # unused, but block shapes must match the input channel count
        a = jnp.zeros((bsz, c, 1), jnp.float32)
        b = jnp.zeros((bsz, c, 1), jnp.float32)

    def row_spec(k):
        return pl.BlockSpec(
            (1, 1, c, lo),
            lambda bb, z, k=k: (bb, jnp.clip(z - 1 + k, 0, d - 1), 0, 0),
        )

    ab_spec = pl.BlockSpec((1, c, 1), lambda bb, z: (bb, 0, 0))
    stat_spec = pl.BlockSpec((1, c_out, LANE), lambda bb, z: (bb, 0, 0))
    out_spec = pl.BlockSpec((1, 1, c_out, lo), lambda bb, z: (bb, z, 0, 0))
    stat_shape = jax.ShapeDtypeStruct((bsz, c_out, LANE), jnp.float32)
    res_shape = jax.ShapeDtypeStruct((bsz, d, c_out, lo), out_dtype)

    in_specs = [row_spec(0), row_spec(1), row_spec(2), ab_spec, ab_spec,
                pl.BlockSpec(memory_space=pltpu.VMEM)]
    operands = [x, x, x, a, b, wmat]
    out_specs = [out_spec, stat_spec, stat_spec]
    out_shape = [res_shape, stat_shape, stat_shape]
    if residual:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(wres)
        out_specs += [out_spec, stat_spec, stat_spec]
        out_shape += [res_shape, stat_shape, stat_shape]

    kern = functools.partial(
        _kernel,
        c=c,
        c_out=c_out,
        h=h,
        w=w,
        wp=wp,
        d=d,
        input_act=input_act,
        residual=residual,
        compute_dtype=compute_dtype,
    )
    return pl.pallas_call(
        kern,
        grid=(bsz, d),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*operands)


def _combine_kernel(
    up0, up1, up2, y0, y1, y2, x0, x1, x2,
    ay_ref, by_ref, ax_ref, bx_ref, w_ref, wr_ref,
    o_ref, s_ref, ss_ref, r_ref, rs_ref, rss_ref,
    *, c_half: int, c_out: int, h: int, w: int, wp: int, d: int, compute_dtype,
):
    """conv3x3x3 over the 2*c_half-channel concat [up ; leaky(ay*y+by+ax*x+bx)]
    with the skip-combine computed on rows in VMEM (kills the standalone
    enc1-combine + concat HBM passes of the v2 serving path). Residual 1x1
    tap + two-phase-norm statistics as in ``_kernel``."""
    z = pl.program_id(1)
    lo = h * wp
    lane = jax.lax.broadcasted_iota(jnp.int32, (2 * c_half, lo), 1)
    lane_valid = ((lane % wp) >= 1) & ((lane % wp) < w + 1)

    rows = []
    for k, (ur, yr, xr) in enumerate(((up0, y0, x0), (up1, y1, x1), (up2, y2, x2))):
        u = ur[0, 0].astype(jnp.float32)  # (C_half, LO)
        comb = (
            yr[0, 0].astype(jnp.float32) * ay_ref[0]
            + by_ref[0]
            + xr[0, 0].astype(jnp.float32) * ax_ref[0]  # (1,LO)*(C_half,1)
            + bx_ref[0]
        )
        comb = jnp.where(comb >= 0, comb, LEAKY_SLOPE * comb)
        r = jnp.concatenate([u, comb], axis=0)  # (2*C_half, LO)
        zi = z - 1 + k
        zvalid = jnp.logical_and(zi >= 0, zi < d)
        rows.append(jnp.where(jnp.logical_and(lane_valid, zvalid), r, 0.0))

    pieces = []
    for dz in range(3):
        base = rows[dz]
        down = pltpu.roll(base, wp, 1)
        down = jnp.where(lane >= wp, down, 0.0)
        up_sh = pltpu.roll(base, lo - wp, 1)
        up_sh = jnp.where(lane < lo - wp, up_sh, 0.0)
        pieces.extend([down, base, up_sh])
    patches9 = jnp.concatenate(pieces, axis=0).astype(compute_dtype)

    m3 = jnp.dot(w_ref[...], patches9, preferred_element_type=jnp.float32)
    acc = None
    for dx in range(3):
        m = jax.lax.slice(m3, (dx * c_out, 0), ((dx + 1) * c_out, lo))
        sh = (lo - (dx - 1)) % lo
        if sh:
            m = pltpu.roll(m, sh, 1)
        acc = m if acc is None else acc + m
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (c_out, lo), 1)
    out_valid = ((out_lane % wp) >= 1) & ((out_lane % wp) < w + 1)
    acc = jnp.where(out_valid, acc, 0.0)
    o_ref[...] = acc.astype(o_ref.dtype)[None, None]

    def accumulate_stats(vals, sref, ssref):
        s = jnp.broadcast_to(jnp.sum(vals, axis=1, keepdims=True), (c_out, LANE))
        ss = jnp.broadcast_to(
            jnp.sum(vals * vals, axis=1, keepdims=True), (c_out, LANE)
        )

        @pl.when(z == 0)
        def _():
            sref[...] = s[None]
            ssref[...] = ss[None]

        @pl.when(z != 0)
        def _():
            sref[...] += s[None]
            ssref[...] += ss[None]

    accumulate_stats(acc, s_ref, ss_ref)

    res = jnp.dot(
        wr_ref[...], rows[1].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    res = jnp.where(out_valid, res, 0.0)
    r_ref[...] = res.astype(r_ref.dtype)[None, None]
    accumulate_stats(res, rs_ref, rss_ref)


@functools.partial(
    jax.jit, static_argnames=("h", "w", "out_dtype", "interpret")
)
def conv3x3x3_of_combine(
    up: jax.Array,  # (B, D, C_half, LO) raw transpose-conv output rows
    y: jax.Array,  # (B, D, C_half, LO) previous conv output (pre-norm)
    x1: jax.Array,  # (B, D, 1, LO) single-channel block input (enc1 residual)
    ay: jax.Array,  # (B, C_half, 1) instance-norm affine for y
    by: jax.Array,
    ax: jax.Array,  # (B, C_half, 1) residual-path affine for x (a3 * k3 folded)
    bx: jax.Array,
    wmat: jax.Array,  # (3*CO, 9*2*C_half)
    wres: jax.Array,  # (CO, 2*C_half)
    *,
    h: int,
    w: int,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Fused UnetrUpBlock entry conv for the full-res decoder stage: builds
    the [up ; enc1-combined] 2*C_half-channel input inline from the up /
    y / x row streams and runs the 3x3x3 conv + residual tap + stats.
    Returns (out, s, ss, res, rs, rss)."""
    bsz, d, c_half, lo = up.shape
    wp = _wp(w)
    c_out = wmat.shape[0] // 3
    compute_dtype = wmat.dtype

    def row_spec(arr_c, k):
        return pl.BlockSpec(
            (1, 1, arr_c, lo),
            lambda bb, z, k=k: (bb, jnp.clip(z - 1 + k, 0, d - 1), 0, 0),
        )

    ab_spec = pl.BlockSpec((1, c_half, 1), lambda bb, z: (bb, 0, 0))
    stat_spec = pl.BlockSpec((1, c_out, LANE), lambda bb, z: (bb, 0, 0))
    out_spec = pl.BlockSpec((1, 1, c_out, lo), lambda bb, z: (bb, z, 0, 0))
    stat_shape = jax.ShapeDtypeStruct((bsz, c_out, LANE), jnp.float32)
    res_shape = jax.ShapeDtypeStruct((bsz, d, c_out, lo), out_dtype)

    kern = functools.partial(
        _combine_kernel,
        c_half=c_half, c_out=c_out, h=h, w=w, wp=wp, d=d,
        compute_dtype=compute_dtype,
    )
    return pl.pallas_call(
        kern,
        grid=(bsz, d),
        in_specs=[
            row_spec(c_half, 0), row_spec(c_half, 1), row_spec(c_half, 2),
            row_spec(c_half, 0), row_spec(c_half, 1), row_spec(c_half, 2),
            row_spec(1, 0), row_spec(1, 1), row_spec(1, 2),
            ab_spec, ab_spec, ab_spec, ab_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, stat_spec, stat_spec, out_spec, stat_spec, stat_spec),
        out_shape=(res_shape, stat_shape, stat_shape, res_shape, stat_shape, stat_shape),
        interpret=interpret,
    )(up, up, up, y, y, y, x1, x1, x1, ay, by, ax, bx, wmat, wres)


def _outhead_kernel(
    z_ref, r_ref, az_ref, bz_ref, ar_ref, br_ref, k_ref, bias_ref, o_ref,
    *, compute_dtype,
):
    """Final residual-block combine + LeakyReLU + 1x1x1 out head, one pass:
    logits = K @ leaky(az*z + bz + ar*res + br) + bias, written in
    output-form. Replaces two fp32 combine passes + einsum + bias add."""
    comb = (
        z_ref[0, 0].astype(jnp.float32) * az_ref[0]
        + bz_ref[0]
        + r_ref[0, 0].astype(jnp.float32) * ar_ref[0]
        + br_ref[0]
    )
    comb = jnp.where(comb >= 0, comb, LEAKY_SLOPE * comb)
    out = jnp.dot(
        k_ref[...], comb.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (out + bias_ref[...])[None, None].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def outhead_of(
    z: jax.Array,  # (B, D, C, LO) final conv output (pre-norm)
    res: jax.Array,  # (B, D, C, LO) residual tap (pre-norm)
    az: jax.Array,  # (B, C, 1) norm affines
    bz: jax.Array,
    ar: jax.Array,
    br: jax.Array,
    kout: jax.Array,  # (CO_pad, C) 1x1x1 out-head weights (rows >= n_classes zero)
    bias: jax.Array,  # (CO_pad, 1) fp32
    *,
    out_dtype=jnp.float32,
    interpret: bool = False,
):
    """Output-form logits (B, D, CO_pad, LO). Pad channels carry bias only;
    callers slice [:n_classes]."""
    bsz, d, c, lo = z.shape
    co = kout.shape[0]
    row = lambda: pl.BlockSpec((1, 1, c, lo), lambda bb, zz: (bb, zz, 0, 0))
    ab_spec = pl.BlockSpec((1, c, 1), lambda bb, zz: (bb, 0, 0))
    return pl.pallas_call(
        functools.partial(_outhead_kernel, compute_dtype=kout.dtype),
        grid=(bsz, d),
        in_specs=[
            row(), row(), ab_spec, ab_spec, ab_spec, ab_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, co, lo), lambda bb, zz: (bb, zz, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, d, co, lo), out_dtype),
        interpret=interpret,
    )(z, res, az, bz, ar, br, kout, bias)


def convt_expand_of(
    t: jax.Array,  # (B, S, S, S, C_in) low-res NDHWC
    convt_params: dict,  # {"kernel": (2,2,2,CO,CI), "bias": (CO,)}
    dtype,
) -> jax.Array:
    """ConvTranspose(k=2, s=2) evaluated as one einsum with the output
    written DIRECTLY in output-form (B, 2S, CO, 2S*WP) — the (d,i)/(h,j)/
    (w,l) interleaves become reshape dims of the einsum output instead of a
    separate NDHWC materialization + layout pass.

    With k == s the transpose-conv has exactly one tap per output voxel:
    out[2d+i, 2h+j, 2w+l, co] = sum_ci t[d,h,w,ci] * K[i,j,l,co,ci] + bias
    (flax ConvTranspose(transpose_kernel=True) stores K as (i,j,l,CO,CI)
    with torch orientation; verified exact vs the module in
    tests/test_conv_of.py)."""
    b, s, _, _, _ = t.shape
    kern = convt_params["kernel"]
    bias = convt_params["bias"]
    co = kern.shape[3]
    s2 = 2 * s
    wp = _wp(s2)
    T = jnp.einsum(
        "bdhwc,ijlkc->bdikhjwl", t, kern.astype(t.dtype),
        preferred_element_type=jnp.float32,
    )
    T = T + bias[None, None, None, :, None, None, None, None]
    T = T.reshape(b, s2, co, s2, s2).astype(dtype)
    T = jnp.pad(T, ((0, 0), (0, 0), (0, 0), (0, 0), (1, wp - s2 - 1)))
    return T.reshape(b, s2, co, s2 * wp)


def norm_affine_from_stats(
    s: jax.Array,  # (B, C, 128) lane-broadcast sums
    ss: jax.Array,
    scale: jax.Array,  # (C,) instance-norm gamma
    bias: jax.Array,  # (C,) beta
    n_valid: int,
    eps: float = NORM_EPS,
):
    """Per-(b, c) affine (a, b) such that a*x + b == instance_norm(x).

    Returns (B, C, 1) pairs ready for ``conv3x3x3_of``'s input transform.
    """
    mean = s[..., :1] / n_valid  # (B, C, 1)
    var = ss[..., :1] / n_valid - mean * mean
    rstd = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    a = scale[None, :, None] * rstd
    return a, bias[None, :, None] - mean * a


def res_weight(kernel3: jax.Array, dtype) -> jax.Array:
    """(1,1,1,C,CO) conv3 kernel -> (CO, C) matmul weights."""
    return kernel3[0, 0, 0].transpose(1, 0).astype(dtype)
