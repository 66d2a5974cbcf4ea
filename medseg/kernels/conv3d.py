"""Pallas TPU kernel: 3x3x3 convolution for UNETR's full-resolution stages.

WHY: XLA's TPU conv lowering for the small-channel (C=16..32) stride-1 convs
that dominate UNETR's decoder (`/root/reference/unetr.py:90-98,165-174`;
``feature_size=16`` at `unetr_segmentation_3d.py:505`) materializes im2col
patches through HBM — measured ~4.7-6 TF/s on v5e (HBM-bound at ~410 GB/s,
since every input element is re-read up to 27x). This kernel reads the input
once per z-halo row and builds patches in VMEM, measuring ~2x faster
(7.6ms vs 15.8ms for the 16->16 conv on 8x96^3, chained-device-time).

DESIGN ("flat-lane" layout): activations live as ``(B, D+2, C, (H+2)*WP)``
where the last dim flattens (y, x) with ``WP = roundup(W+2, 128)`` lanes per
y-row (x at lane x+1; y at block y+1; halos built in). Then for one (b, z)
grid step:

- the three z-halo rows arrive via three BlockSpec streams over the SAME
  array with index maps z / z+1 / z+2 — Pallas's automatic pipeline
  double-buffers them (overlapping windows can't be expressed as one
  blocked input);
- the 9 (dz, dy) taps are 128-aligned lane slices (dy shifts are whole
  y-blocks), concatenated on sublanes into a (9C, H*WP) patch matrix;
- ONE MXU matmul against the (3*C_out, 9C) filter computes all three dx
  variants at once (3x better MXU utilization than M=C_out=16);
- the dx variants are rolled into place by +-1 lane (wraparound lands only
  in pad lanes) and summed; pad lanes are re-zeroed for the next layer.

Backward falls back to XLA via ``jax.custom_vjp`` (correct by construction;
inference is the headline path, and the forward used in training is this
same kernel).

Constraints: C_in a multiple of 8 (sublane alignment of the concat) and
<= 128; stride 1; 'same' padding; cubic-ish spatial dims with H*WP lanes
fitting VMEM blocks. Anything else routes to XLA.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _wp(w: int) -> int:
    """Lanes per y-row in the flat layout: x at lane x+1 plus 2 halo lanes.

    Rows only need 128-lane alignment of the FLAT (H*WP) dim, not of WP
    itself: W=48 packs two 64-lane y-rows per vreg (H*64 stays a multiple of
    128 for even H), doubling lane occupancy on the 48^3 decoder stages —
    the dy shifts are still plain lane rotates by +-WP.
    """
    if w + 2 <= 64:
        return 64
    return int(np.ceil((w + 2) / LANE) * LANE)


def flat_supported(x_shape: Sequence[int], c_out: int) -> bool:
    """Route to Pallas where it measures faster than XLA's conv (v5e, chained
    device times incl. layout round-trips — docs/PERF_NOTES.md):

    | shape              | pallas | xla  |
    | 96^3 16->16        |  7.6ms | 15.8 |
    | 96^3 32->16        | 23.6   | 69.2 |
    | 48^3 64->32        |  8.8   | 34.1 |
    | 48^3 32->32        |  6.2   |  5.0 |  -> XLA
    | 24^3 128->64/64->64|  3-4   |  ~2  |  -> XLA

    Rule: spatial >= 48 AND (channel-reducing conv, or square conv at high
    lane occupancy). XLA's im2col cost scales with C_in (27x re-read), so
    channel-reducing convs are where it loses hardest.
    """
    b, d, h, w, c = x_shape
    if c % 8 != 0 or c > 128 or c_out > 128 or c_out % 8 != 0:
        return False
    if w < 48:
        return False
    wp = _wp(w)
    occupancy = (w + 2) / wp
    if not (c > c_out or (c == c_out and occupancy >= 0.7)):
        return False
    lanes = (h + 2) * wp
    # per-step VMEM: 3 input rows + patches + fp32 out, double-buffered rows
    row_bytes = c * lanes * 2
    patch_bytes = 9 * c * h * wp * 2
    out_bytes = 3 * c_out * h * wp * 4
    return row_bytes * 6 + patch_bytes + out_bytes < 64 * 1024 * 1024


def to_flat(x: jax.Array) -> jax.Array:
    """(B, D, H, W, C) -> flat-lane (B, D+2, C, (H+2)*WP), halos zeroed."""
    b, d, h, w, c = x.shape
    wp = _wp(w)
    xt = x.transpose(0, 1, 4, 2, 3)  # (B, D, C, H, W)
    xt = jnp.pad(xt, ((0, 0), (1, 1), (0, 0), (1, 1), (1, wp - w - 1)))
    return xt.reshape(b, d + 2, c, (h + 2) * wp)


def from_flat(o: jax.Array, h: int, w: int) -> jax.Array:
    """Flat-lane conv output (B, D, CO, H*WP) -> (B, D, H, W, CO)."""
    b, d, co, _ = o.shape
    wp = _wp(w)
    return o.reshape(b, d, co, h, wp)[..., 1 : w + 1].transpose(0, 1, 3, 4, 2)


def _kernel(x0_ref, x1_ref, x2_ref, w_ref, o_ref, *, c, c_out, h, w, wp):
    lo = h * wp
    rows = [x0_ref[0, 0], x1_ref[0, 0], x2_ref[0, 0]]  # (C, (H+2)*WP) each
    pieces = []
    for dz in range(3):
        for dy in range(3):
            pieces.append(
                jax.lax.slice(rows[dz], (0, dy * wp), (c, dy * wp + lo))
            )
    patches9 = jnp.concatenate(pieces, axis=0)  # (9C, LO)
    m3 = jnp.dot(w_ref[...], patches9, preferred_element_type=jnp.float32)
    acc = None
    for dx in range(3):
        m = jax.lax.slice(m3, (dx * c_out, 0), ((dx + 1) * c_out, lo))
        sh = (lo - (dx - 1)) % lo
        if sh:
            m = pltpu.roll(m, sh, 1)
        acc = m if acc is None else acc + m
    lane = jax.lax.broadcasted_iota(jnp.int32, (c_out, lo), 1) % wp
    o_ref[...] = jnp.where((lane >= 1) & (lane < w + 1), acc, 0.0)[None, None]


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def conv3x3x3_flat(xt: jax.Array, wmat: jax.Array, *, h: int, w: int, interpret: bool = False):
    """Flat-lane conv: xt (B, D+2, C, (H+2)*WP) x wmat (3*CO, 9*C, ordered
    (dx | co) x (dz, dy, ci)) -> (B, D, CO, H*WP) fp32."""
    b, dp, c, lanes = xt.shape
    d = dp - 2
    wp = _wp(w)
    c_out = wmat.shape[0] // 3
    lo = h * wp
    spec = lambda k: pl.BlockSpec((1, 1, c, lanes), lambda bb, z, k=k: (bb, z + k, 0, 0))
    return pl.pallas_call(
        functools.partial(_kernel, c=c, c_out=c_out, h=h, w=w, wp=wp),
        grid=(b, d),
        in_specs=[spec(0), spec(1), spec(2), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, c_out, lo), lambda bb, z: (bb, z, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, d, c_out, lo), jnp.float32),
        interpret=interpret,
    )(xt, xt, xt, wmat)


def weight_matrix(kernel: jax.Array, dtype) -> jax.Array:
    """(3,3,3,C,CO) -> (3*CO, 9*C): dx-major rows, (dz, dy, ci) columns."""
    c, c_out = kernel.shape[3], kernel.shape[4]
    return kernel.transpose(2, 4, 0, 1, 3).reshape(3 * c_out, 9 * c).astype(dtype)


def _pallas_conv(x: jax.Array, kernel: jax.Array, interpret: bool = False) -> jax.Array:
    b, d, h, w, c = x.shape
    xt = to_flat(x)
    wmat = weight_matrix(kernel, x.dtype)
    out = conv3x3x3_flat(xt, wmat, h=h, w=w, interpret=interpret)
    return from_flat(out, h, w)


def _xla_conv(x, kernel):
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        (1, 1, 1),
        [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )


# Per-conv Pallas routing. The chained device-time table above (which INCLUDES
# the NDHWC<->flat round trips) says per-conv routing should win 2-4x on the
# routed shapes — and it does standalone and in the full-model forward — but
# inside the sliding-window program the gains vanish (equal at small volumes,
# REGRESSION at 512^3-scale, where the 2.75GB accumulator + pallas's extra
# buffers create HBM allocation pressure). Until that interaction is fixed
# (docs/PERF_NOTES.md round-2 plan), routing defaults OFF and can be enabled
# with MEDSEG_PALLAS_CONV=1 (training: neutral; standalone inference: faster).
import os as _os

PALLAS_PER_CONV = _os.environ.get("MEDSEG_PALLAS_CONV", "0") == "1"

# Of-form conv routing for the TRAINING path (fwd + bwd-data through the
# halo-fetch Pallas kernel in medseg/kernels/conv_of.py, filter-grad as an
# explicit bf16 XLA conv). Motivation (benchmarks/probe_convbwd.py, v5e,
# 4x96^3 16->16): XLA conv fwd 10.9 ms / bwd 22.3 ms regardless of dtype
# (layout-bound), vs ~1.3 ms for the of-form kernel — and the old fp32-vjp
# backward gains nothing from fp32 (bf16 dk rel err 2e-3). "of" routes
# eligible shapes; "xla" restores the previous behavior.
TRAIN_CONV = _os.environ.get("MEDSEG_TRAIN_CONV", "of")
_OF_MIN_HW = 48 * 48


def _of_ok(xshape, c_out: int) -> bool:
    _, d, h, w, c = xshape
    return (
        h * w >= _OF_MIN_HW
        and (h * w) % 128 == 0  # compact lane convention only
        and d % 2 == 0
        and c <= 64
        and c_out <= 64
    )


def _route_of(x, kernel, interpret: bool = False) -> bool:
    return (
        TRAIN_CONV == "of"
        and (interpret or jax.default_backend() == "tpu")
        and _of_ok(x.shape, kernel.shape[-1])
    )


def _of_conv(x: jax.Array, kernel: jax.Array, interpret: bool = False) -> jax.Array:
    """NDHWC conv via the of-form halo kernel; fp32 output like ``_xla_conv``."""
    from medseg.kernels import conv_of

    b, d, h, w, c = x.shape
    cd = jnp.bfloat16 if x.dtype == jnp.bfloat16 else x.dtype
    x_of = conv_of.to_output_form(x, dtype=cd)
    wmat = weight_matrix(kernel, cd)
    z = jnp.zeros((b, c, 1), jnp.float32)
    y_of, _, _ = conv_of.conv3x3x3_of(
        x_of, wmat, z, z, h=h, w=w, input_act="none",
        out_dtype=jnp.float32, interpret=interpret,
    )
    return conv_of.from_output_form(y_of, h, w)


def _conv_dx(g: jax.Array, kernel: jax.Array, interpret: bool = False) -> jax.Array:
    """Data grad: same-pad conv of the cotangent with the spatially flipped,
    io-transposed kernel (exact for stride-1 zero-padded 3^3 convs)."""
    kflip = jnp.flip(kernel, axis=(0, 1, 2)).swapaxes(3, 4)
    return _of_conv(g.astype(jnp.bfloat16), kflip.astype(jnp.bfloat16), interpret)


def _conv_dk(x: jax.Array, g: jax.Array, cd) -> jax.Array:
    """Filter grad as one conv contracting the batch dim: lhs = x with
    batch<->feature swapped (spec CDHWN), rhs = the cotangent as a
    whole-volume kernel (spec IDHWO); padding 1 -> 3^3 spatial output.
    Verified against the fp32 vjp oracle in benchmarks/probe_convbwd.py."""
    dk = jax.lax.conv_general_dilated(
        x.astype(cd),
        g.astype(cd),
        (1, 1, 1),
        [(1, 1)] * 3,
        dimension_numbers=("CDHWN", "IDHWO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    return dk.transpose(1, 2, 3, 0, 4)  # (CI,3,3,3,CO) -> (3,3,3,CI,CO)


@jax.custom_vjp
def conv3x3x3(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """3x3x3 stride-1 same-pad conv, NDHWC x (3,3,3,Cin,Cout) -> fp32 NDHWC.

    Pallas fast path on TPU when `flat_supported` and enabled; exact XLA
    fallback otherwise (CPU tests, unusual shapes).
    """
    if _route_of(x, kernel):
        return _of_conv(x, kernel)
    if (
        PALLAS_PER_CONV
        and jax.default_backend() == "tpu"
        and flat_supported(x.shape, kernel.shape[-1])
    ):
        return _pallas_conv(x, kernel)
    return _xla_conv(x, kernel)


# Interpret-mode switch for the routed custom-VJP path (CPU tests force
# routing on and flip this; the env knob is for ad-hoc debugging).
INTERPRET = _os.environ.get("MEDSEG_CONV_INTERPRET", "0") == "1"


def _fwd(x, kernel):
    if _route_of(x, kernel):
        # Save x in OF-FORM: the bwd's wgrad kernel consumes it directly, so
        # neither fwd output nor bwd re-pays the NDHWC->of relayout of x.
        from medseg.kernels import conv_of

        b, d, h, w, c = x.shape
        cd = jnp.bfloat16 if x.dtype == jnp.bfloat16 else x.dtype
        x_of = conv_of.to_output_form(x, dtype=cd)
        return _of_conv_from_of(x_of, kernel, h, w, INTERPRET), (x_of, kernel)
    return conv3x3x3(x, kernel), (x, kernel)


def _of_conv_from_of(x_of, kernel, h: int, w: int, interpret: bool = False):
    from medseg.kernels import conv_of

    b, _, c, _ = x_of.shape
    z = jnp.zeros((b, c, 1), jnp.float32)
    y_of, _, _ = conv_of.conv3x3x3_of(
        x_of, weight_matrix(kernel, x_of.dtype), z, z, h=h, w=w,
        input_act="none", out_dtype=jnp.float32, interpret=interpret,
    )
    return conv_of.from_output_form(y_of, h, w)


def _of_wgrad(x: jax.Array, g: jax.Array, interpret: bool = False) -> jax.Array:
    """Filter grad through the of-form Pallas wgrad kernel (bf16 operands,
    fp32 accumulation — same numerics class as ``_conv_dk(bf16)``). The XLA
    (CDHWN x IDHWO) lowering of ``_conv_dk`` runs at ~5.6 TF/s fused with
    the optimizer update at the 16-channel full-res shapes
    (benchmarks/trace_train.py); the kernel reuses the forward's patch
    stencil with adjoint-rolled cotangent rows."""
    from medseg.kernels import conv_of

    b, d, h, w, c = x.shape
    co = g.shape[-1]
    x_of = conv_of.to_output_form(x, dtype=jnp.bfloat16)
    g_of = g.transpose(0, 1, 4, 2, 3).reshape(b, d, co, h * w).astype(jnp.bfloat16)
    dw = conv_of.conv3x3x3_wgrad_of(x_of, g_of, h=h, w=w, interpret=interpret)
    return conv_of.wgrad_to_kernel(dw, c, co)


WGRAD = _os.environ.get("MEDSEG_WGRAD", "of")


def _bwd(res, g):
    xres, kernel = res
    if xres.ndim == 4:
        # Routed path (residual is of-form). ONE to_output_form of the
        # cotangent feeds both the bwd-data conv (flipped-transposed
        # weights) and the Pallas wgrad kernel (MEDSEG_WGRAD=xla restores
        # the explicit bf16 XLA conv of _conv_dk: exact-but-slow,
        # probe_convbwd.py).
        from medseg.kernels import conv_of

        b, d, h, w, co = g.shape
        cd = jnp.bfloat16
        g_of = conv_of.to_output_form(g, dtype=cd)
        kflip = jnp.flip(kernel, axis=(0, 1, 2)).swapaxes(3, 4)
        dx = _of_conv_from_of(g_of, kflip.astype(cd), h, w, INTERPRET)
        c_in = xres.shape[2]
        if WGRAD == "of":
            dw = conv_of.conv3x3x3_wgrad_of(
                xres, g_of, h=h, w=w, interpret=INTERPRET
            )
            dk = conv_of.wgrad_to_kernel(dw, c_in, co)
        else:
            x = conv_of.from_output_form(xres, h, w)
            dk = _conv_dk(x, g, jnp.bfloat16)
        return dx.astype(xres.dtype), dk.astype(kernel.dtype)
    # Backward through the mathematically-identical XLA conv in fp32
    # (correct by construction; XLA's conv transpose rules don't handle
    # mixed-precision cotangents with preferred_element_type), cast back to
    # the parameter dtypes. Not the inference hot path.
    _, vjp = jax.vjp(
        _xla_conv, xres.astype(jnp.float32), kernel.astype(jnp.float32)
    )
    dx, dk = vjp(g.astype(jnp.float32))
    return dx.astype(xres.dtype), dk.astype(kernel.dtype)


conv3x3x3.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Of-form-IO conv: the block-level training fast path.
#
# ``conv3x3x3`` pays an NDHWC<->of-form relayout round trip per conv (fwd:
# to_output_form + from_output_form; bwd: the same for the cotangent/dx) —
# ~47 ms of the 148 ms train step at 4x96^3 (benchmarks/trace_train.py).
# ``conv3x3x3_ofio`` keeps BOTH operands and results in compact of-form
# (B, D + 2*DPAD, C, H*W) so a whole conv-norm-act block (models/blocks.py
# of-path) converts once at block entry/exit instead of once per conv.
#
# Guard-row contract: of-form tensors carry DPAD undefined guard rows. The
# kernels never read them un-masked and never write them, so this wrapper
# zeroes the guard rows of every kernel OUTPUT (two 1-row writes, not a full
# pass). With that, every forward value is finite, elementwise jnp ops
# (norm/leaky) between convs are autodiff-exact, and no garbage can reach
# parameter gradients: the only cross-row reductions (instance-norm stats)
# slice the valid rows, so guard rows carry zero cotangent.
# ---------------------------------------------------------------------------


def _zero_guard_rows(y: jax.Array) -> jax.Array:
    from medseg.kernels.conv_of import DPAD

    y = jax.lax.dynamic_update_slice_in_dim(
        y, jnp.zeros((y.shape[0], DPAD) + y.shape[2:], y.dtype), 0, axis=1
    )
    return jax.lax.dynamic_update_slice_in_dim(
        y,
        jnp.zeros((y.shape[0], DPAD) + y.shape[2:], y.dtype),
        y.shape[1] - DPAD,
        axis=1,
    )


def _ofio_impl(x_of: jax.Array, kernel: jax.Array, h: int, w: int) -> jax.Array:
    from medseg.kernels import conv_of

    b, _, c, _ = x_of.shape
    z = jnp.zeros((b, c, 1), jnp.float32)
    y, _, _ = conv_of.conv3x3x3_of(
        x_of, weight_matrix(kernel, x_of.dtype), z, z, h=h, w=w,
        input_act="none", out_dtype=x_of.dtype, interpret=INTERPRET,
    )
    return _zero_guard_rows(y)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3x3x3_ofio(x_of: jax.Array, kernel: jax.Array, h: int, w: int) -> jax.Array:
    """3x3x3 stride-1 same-pad conv with of-form input AND output.

    x_of: compact of-form (B, D + 2*DPAD, C, H*W); kernel (3, 3, 3, C, CO).
    Returns (B, D + 2*DPAD, CO, H*W) in x_of's dtype (fp32 MXU accumulation,
    one rounding — same numerics class as ``conv3x3x3(...).astype(dtype)``),
    guard rows zeroed.
    """
    return _ofio_impl(x_of, kernel, h, w)


def _ofio_fwd(x_of, kernel, h, w):
    return _ofio_impl(x_of, kernel, h, w), (x_of, kernel)


def _ofio_bwd(h, w, res, g):
    from medseg.kernels import conv_of

    x_of, kernel = res
    cd = jnp.bfloat16 if x_of.dtype == jnp.bfloat16 else x_of.dtype
    g_of = g.astype(cd)
    kflip = jnp.flip(kernel, axis=(0, 1, 2)).swapaxes(3, 4)
    dx = _ofio_impl(g_of, kflip.astype(cd), h, w)
    c_in, co = x_of.shape[2], g.shape[2]
    if WGRAD == "of":
        dw = conv_of.conv3x3x3_wgrad_of(
            x_of.astype(cd), g_of, h=h, w=w, interpret=INTERPRET
        )
        dk = conv_of.wgrad_to_kernel(dw, c_in, co)
    else:
        dk = _conv_dk(
            conv_of.from_output_form(x_of, h, w),
            conv_of.from_output_form(g, h, w),
            jnp.bfloat16,
        )
    return dx.astype(x_of.dtype), dk.astype(kernel.dtype)


conv3x3x3_ofio.defvjp(_ofio_fwd, _ofio_bwd)


def train_of_active() -> bool:
    """Whether the of-form training routing is live for this process
    (the block-level of-path in models/blocks.py keys off this + shape)."""
    return TRAIN_CONV == "of" and (INTERPRET or jax.default_backend() == "tpu")
