"""Pallas TPU kernel: fused 3x3x3 conv in OUTPUT-FORM flat layout.

Second-generation kernel behind the UNETR full-resolution stages
(`/root/reference/unetr.py:90-98,165-174`; the two stages are 77% of the
measured forward, docs/PERF_NOTES.md). The round-1 kernel (conv3d.py) wins
2.1x standalone but pays full HBM passes around every conv: repad to the
halo layout, instance-norm stats, norm apply, LeakyReLU — each a read+write
over ~450MB at 8x96^3. This kernel eliminates them:

- **Output-form layout (B, D, C, H*WR)**: what a conv WRITES is directly
  what the next conv READS. No repad pass: z-halos are handled by clamping
  the 3 row-stream index maps and zeroing invalid rows; y-halos by +-WR lane
  rolls with the wrapped y-block masked. Two lane conventions (see
  ``_compact``): COMPACT (H*W % 128 == 0: exactly W lanes per y-row, x at
  lane x, dx rolls edge-masked) and PADDED (WR = _wp(W), x at lane x+1,
  pad lanes absorb the dx roll crossings).
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
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from medseg.kernels.conv3d import LANE, _wp, weight_matrix
from medseg.models.blocks import LEAKY_SLOPE, NORM_EPS

# Multi-z blocks push the per-step patch matrix past the default 16MB scoped
# vmem budget; v5e has 128MB of VMEM — let Mosaic use it.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _compact(h: int, w: int) -> bool:
    """COMPACT lane convention: when H*W is a multiple of the 128-lane vreg,
    y-rows need no pad lanes at all — x sits at lane x, the dy shift is a
    roll by W, and the dx +-1 rolls get explicit x-edge masks instead of
    absorbing pads. Kills every interleaved pad op around the kernels (the
    96->128 lane pad alone cost 6.6 ms/batch in the round-2 SWI trace) and
    cuts kernel lane work 25% at W=96/48. Otherwise the padded convention
    (_wp lanes, x at lane x+1) applies."""
    return (h * w) % LANE == 0


def _lanes_row(h: int, w: int) -> int:
    return w if _compact(h, w) else _wp(w)


def _x_off(h: int, w: int) -> int:
    return 0 if _compact(h, w) else 1


# All of-form tensors carry DPAD guard rows at BOTH ends of the z axis:
# shape (B, D + 2*DPAD, C, LO) with data at rows [DPAD, DPAD + D). The pad
# rows hold UNDEFINED values (kernels never write them) and exist so the
# single-stream z-halo windows ([zb*z-1, zb*z+zb+1) in data coords) never
# index out of bounds — Mosaic's Element indexing supports no low padding.
# Every consumer must mask rows by global-z validity (the kernels do, via
# ``_zvalid``) or slice them off (``from_output_form`` does).
DPAD = 1


def to_output_form(x: jax.Array, dtype=None) -> jax.Array:
    """NDHWC (B, D, H, W, C) -> output-form flat (B, D + 2*DPAD, C, H*WR).

    Compact convention (H*W % 128 == 0): pure transpose+reshape, x at lane x.
    Padded convention otherwise: WR = _wp(W) lanes per y-row, valid x data at
    lanes [1, w+1), pad lanes zero. Data sits at z rows [DPAD, DPAD + D).
    """
    b, d, h, w, c = x.shape
    xt = x.transpose(0, 1, 4, 2, 3)  # (B, D, C, H, W)
    if not _compact(h, w):
        wp = _wp(w)
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, 0), (0, 0), (1, wp - w - 1)))
    out = xt.reshape(b, d, c, h * _lanes_row(h, w))
    out = jnp.pad(out, ((0, 0), (DPAD, DPAD), (0, 0), (0, 0)))
    return out.astype(dtype) if dtype is not None else out


def from_output_form(o: jax.Array, h: int, w: int, dpad: int = DPAD) -> jax.Array:
    """Output-form (B, D + 2*dpad, C, H*WR) -> NDHWC (B, D, H, W, C).
    Pass ``dpad=0`` for unpadded arrays (e.g. ``outhead_of`` logits)."""
    b, dp, c, _ = o.shape
    d = dp - 2 * dpad
    wr = _lanes_row(h, w)
    x0 = _x_off(h, w)
    o = o[:, dpad : dpad + d].reshape(b, d, c, h, wr)
    if x0 or wr != w:
        o = o[..., x0 : x0 + w]
    return o.transpose(0, 1, 3, 4, 2)


def _zb_for(d: int, c_in: int) -> int:
    """z-slices per grid step: amortizes the z-halo overfetch (to (Z+2)/Z),
    per-step DMA/pipeline overhead, and widens the matmul N by Z. Bounded by
    VMEM (patch matrix is (9*C, Z*LO)).

    Defaults depend on the fetch pipeline. The manual DMA ring holds ONE
    (ZB+2)-row window per stream (vs the automatic Element-halo pipeline's
    3 offset z-streams), so much larger blocks fit VMEM — and they cut the
    combine kernel's m-ring overfetch (ZD = zb/2 + 2 d-rows per zb z-rows:
    1.5x at zb=2, 1.12x at zb=16). Hardware sweep under the ring (bench
    config 4, v5e): ZB32 2/4/8/16/32 -> 1.187/1.209/1.220/1.224/OOM vol/s;
    ZB16 8/12/16 at ZB32=16 -> 1.224/1.232/1.230. Automatic-pipeline
    defaults (ring off) stay at the round-2 sweep values (ZB16=8, ZB32=2 —
    larger blocks OOM VMEM there)."""
    if c_in <= 16:
        limit = int(
            os.environ.get("MEDSEG_ZB16", "12" if _manual_fetch_on() else "8")
        )
    else:
        limit = int(
            os.environ.get("MEDSEG_ZB32", "16" if _manual_fetch_on() else "2")
        )
    for z in (limit, 8, 4, 2):
        if z <= limit and d % z == 0:
            return z
    return 1


def _roll_lanes(x: jax.Array, shift: int, interpret: bool) -> jax.Array:
    """Lane-rotate that supports bf16 via an int32 sublane-pack bitcast
    (Mosaic only rotates 32-bit data; pltpu.bitcast packs pairs of bf16
    along SUBLANES, leaving lanes 1:1, so lane rolls commute)."""
    if x.dtype == jnp.bfloat16 and x.shape[0] % 2 == 0 and not interpret:
        packed = pltpu.bitcast(x, jnp.int32)  # (C/2, L)
        return pltpu.bitcast(pltpu.roll(packed, shift, 1), jnp.bfloat16)
    return pltpu.roll(x, shift, 1)


def _dz_bases(sel, zb: int, lo: int):
    """sel (ZB+2, C, LO) -> three (C, ZB*LO) lane-concats: segment j of
    base[t] is input row z=j-1+t for output slice j."""
    return [
        jnp.concatenate([sel[j + t] for j in range(zb)], axis=-1)
        for t in range(3)
    ]


def _stencil9(bases, c: int, zb: int, lo: int, wp: int, compute_dtype, interpret):
    """The (dz, dy) taps over (C, N_SEG*LO) bases -> patch matrix
    (3*len(bases)*C, N_SEG*LO); len(bases)=3 for single-z outputs, 4 for
    z-pair outputs (rows z-1..z+2 shared by outputs z and z+1).

    dy rolls cross both y-row and z-segment boundaries; both land in lanes
    masked off by the per-segment modulo masks (lane % LO), matching the
    per-slice zero-padding semantics."""
    width = bases[0].shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (c, width), 1)
    seg_lane = lane % lo
    pieces = []
    for base in bases:
        down = _roll_lanes(base, wp, interpret)
        down = jnp.where(seg_lane >= wp, down, jnp.zeros_like(base))
        up = _roll_lanes(base, width - wp, interpret)
        up = jnp.where(seg_lane < lo - wp, up, jnp.zeros_like(base))
        pieces.extend([down, base, up])
    return jnp.concatenate(pieces, axis=0).astype(compute_dtype)


def _pp_ok(h: int, w: int) -> bool:
    """PARITY-PLANE lane convention: lanes ordered as 4 (y, x)-parity planes
    of (H/2)*(W/2) voxels — lane = (2j+l)*SEG + (W/2)*hh + ww for voxel
    (y, x) = (2hh+j, 2ww+l), SEG = (H/2)*(W/2).

    Why: the decoder2 transpose-conv's output IS four parity planes (one per
    (j, l) filter tap), so in PP it writes as direct matmul output slices —
    no interleaved-lane relayout (8+ ms/batch of XLA pad/copy in the compact
    convention). Stencil taps become per-plane lane rolls; one deinterleave
    runs per VOLUME instead of per window. Requires even H, W and a
    128-multiple plane segment."""
    return h % 2 == 0 and w % 2 == 0 and ((h // 2) * (w // 2)) % LANE == 0


def to_pp(x: jax.Array, dtype=None) -> jax.Array:
    """NDHWC (B, D, H, W, C) -> parity-plane flat (B, D + 2*DPAD, C, 4*SEG),
    data at z rows [DPAD, DPAD + D)."""
    b, d, h, w, c = x.shape
    xt = x.reshape(b, d, h // 2, 2, w // 2, 2, c)
    xt = xt.transpose(0, 1, 6, 3, 5, 2, 4)  # (B, D, C, j, l, hh, ww)
    out = xt.reshape(b, d, c, h * w)
    out = jnp.pad(out, ((0, 0), (DPAD, DPAD), (0, 0), (0, 0)))
    return out.astype(dtype) if dtype is not None else out


def from_pp(o: jax.Array, h: int, w: int, dpad: int = DPAD) -> jax.Array:
    """Parity-plane flat (B, D + 2*dpad, C, 4*SEG) -> NDHWC (B, D, H, W, C).
    Pass ``dpad=0`` for unpadded arrays (e.g. ``outhead_of`` logits)."""
    b, dp, c, _ = o.shape
    d = dp - 2 * dpad
    o = o[:, dpad : dpad + d].reshape(b, d, c, 2, 2, h // 2, w // 2)
    return o.transpose(0, 1, 5, 3, 6, 4, 2).reshape(b, d, h, w, c)


def _dy_taps_pp(base, dy: int, lo: int, seg: int, wh: int, hmax: int, interpret):
    """PP tap for y+dy (dy = +-1) over a (C, N_SEG*LO) base.

    The source plane row flips parity: half of each tap is a PURE
    plane-group slice (128-aligned: 2*SEG is a lane-tile multiple — no VPU
    shuffle), the other half a roll by WH of the opposite half-width group
    with an hh-edge mask. Output plane order is [j=0 group ; j=1 group] per
    z-segment, reassembled by aligned concat.

    dy=-1: out j=0 <- (j'=1, hh-1): roll(j1 group, +WH), mask hh>=1
           out j=1 <- (j'=0, hh):   j0 group verbatim
    dy=+1: out j=0 <- (j'=1, hh):   j1 group verbatim
           out j=1 <- (j'=0, hh+1): roll(j0 group, -WH), mask hh<max-1
    """
    c, width = base.shape
    nseg = width // lo
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (c, 2 * seg), 1)
    hh_pos = (lane2 % seg) // wh
    out = []
    for s in range(nseg):
        j0 = jax.lax.slice(base, (0, s * lo), (c, s * lo + 2 * seg))
        j1 = jax.lax.slice(base, (0, s * lo + 2 * seg), (c, s * lo + 4 * seg))
        if dy == -1:
            a = _roll_lanes(j1, wh, interpret)  # content[hh] = j1[hh-1]
            a = jnp.where(hh_pos >= 1, a, jnp.zeros_like(a))
            out.extend([a, j0])
        else:
            b = _roll_lanes(j0, 2 * seg - wh, interpret)  # content[hh] = j0[hh+1]
            b = jnp.where(hh_pos < hmax - 1, b, jnp.zeros_like(b))
            out.extend([j1, b])
    return jnp.concatenate(out, axis=-1)


def _stencil9_pp(bases, c: int, lo: int, seg: int, wh: int, hmax: int,
                 compute_dtype, interpret):
    """PP analogue of _stencil9: (dz, dy) taps -> (3*len(bases)*C, width)."""
    pieces = []
    for base in bases:
        pieces.append(_dy_taps_pp(base, -1, lo, seg, wh, hmax, interpret))
        pieces.append(base)
        pieces.append(_dy_taps_pp(base, +1, lo, seg, wh, hmax, interpret))
    return jnp.concatenate(pieces, axis=0).astype(compute_dtype)


def _dx_combine_pp(m3, c_out: int, nseg: int, lo: int, seg: int, wh: int,
                   wmax: int, interpret):
    """PP analogue of _dx_combine: the three dx tap rows move across the
    l-parity planes. As in _dy_taps_pp, half of each dx!=0 tap is a pure
    aligned plane slice (SEG is a lane-tile multiple) and the other half a
    +-1 roll of a single plane with a ww-edge mask; aligned concats
    reassemble the [l=0 ; l=1] plane order within each j-group."""
    width = nseg * lo
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (c_out, seg), 1)
    ww_pos = lane1 % wh
    acc = None
    for dx in range(3):
        m = jax.lax.slice(m3, (dx * c_out, 0), ((dx + 1) * c_out, width))
        if dx == 1:
            piece = m
        else:
            groups = []
            for g in range(2 * nseg):  # j-groups of [l0-plane ; l1-plane]
                l0 = jax.lax.slice(m, (0, g * 2 * seg), (c_out, g * 2 * seg + seg))
                l1 = jax.lax.slice(
                    m, (0, g * 2 * seg + seg), (c_out, g * 2 * seg + 2 * seg)
                )
                if dx == 0:  # left tap: out l=0 <- (l'=1, ww-1); out l=1 <- l0
                    a = _roll_lanes(l1, 1, interpret)
                    a = jnp.where(ww_pos >= 1, a, jnp.zeros_like(a))
                    groups.extend([a, l0])
                else:  # right tap: out l=0 <- (l'=1, ww); out l=1 <- (l0, ww+1)
                    b = _roll_lanes(l0, seg - 1, interpret)
                    b = jnp.where(ww_pos < wmax - 1, b, jnp.zeros_like(b))
                    groups.extend([l1, b])
            piece = jnp.concatenate(groups, axis=-1)
        acc = piece if acc is None else acc + piece
    return acc


def _pair_ok(zb: int, c: int) -> bool:
    """z-pair mode: two z-outputs share one matmul with block-sparse
    (6*CO, 12*C) weights. Wins exactly when the single-z K=9C underfills
    its 128-lane tiles (C<=32: util 21%->42% at C=16, 28%->56% at C=32);
    at C>=64 the plain shape already fills K and pairing's 4/3 FLOP
    inflation loses. Needs an even number of z-slices per grid step."""
    return zb % 2 == 0 and c <= 32


def weight_matrix_pair(wmat: jax.Array) -> jax.Array:
    """(3*CO, 9*C) single-z weights -> (6*CO, 12*C) z-pair block weights.

    K covers 4 z-rows x (3 dy x C); output block q in {0,1} (slice z+q)
    reads rows q..q+2, i.e. K-offset q*3C for its 9C span."""
    m3, k9 = wmat.shape
    c3 = k9 // 3
    out = jnp.zeros((2 * m3, k9 + c3), wmat.dtype)
    out = out.at[:m3, :k9].set(wmat)
    return out.at[m3:, c3:].set(wmat)


def _conv_core(sel, w_ref, c, c_out, zb, lo, wp, w, compute_dtype, interpret,
               pp=False, h=None):
    """Transformed/masked sel rows (ZB+2, C, LO) -> conv output (ZB, CO, LO)
    plus the center-row concat (C, ZB*LO) for the residual tap. Uses the
    z-pair matmul shape when profitable; ``pp`` selects the parity-plane
    stencils."""
    if pp:
        seg, wh, hmax, wmax = (h // 2) * (w // 2), w // 2, h // 2, w // 2

        def stencil(bases):
            return _stencil9_pp(bases, c, lo, seg, wh, hmax, compute_dtype, interpret)

        def dxc(m3, nseg):
            return _dx_combine_pp(m3, c_out, nseg, lo, seg, wh, wmax, interpret)
    else:
        def stencil(bases):
            return _stencil9(bases, c, zb, lo, wp, compute_dtype, interpret)

        def dxc(m3, nseg):
            return _dx_combine(m3, c_out, nseg, lo, wp, w)

    center = jnp.concatenate([sel[j + 1] for j in range(zb)], axis=-1)
    if _pair_ok(zb, c):
        np_ = zb // 2
        bases = [
            jnp.concatenate([sel[2 * p + t] for p in range(np_)], axis=-1)
            for t in range(4)
        ]  # (C, NP*LO) x 4 z-row positions
        patches = stencil(bases)
        m = jnp.dot(w_ref[...], patches, preferred_element_type=jnp.float32)
        parts = [
            dxc(
                jax.lax.slice(m, (q * 3 * c_out, 0), ((q + 1) * 3 * c_out, np_ * lo)),
                np_,
            )
            for q in range(2)
        ]  # part q: output slices 2p+q, segments p
        out = jnp.stack(
            [
                jax.lax.slice(parts[j % 2], (0, (j // 2) * lo), (c_out, (j // 2 + 1) * lo))
                for j in range(zb)
            ]
        )
        full_for_stats = jnp.concatenate(parts, axis=-1)
        return out, full_for_stats, center
    bases = _dz_bases(sel, zb, lo)
    patches9 = stencil(bases)
    m3 = jnp.dot(w_ref[...], patches9, preferred_element_type=jnp.float32)
    acc = dxc(m3, zb)
    return _stack_z(acc, c_out, zb, lo), acc, center


def _dx_combine(m3, c_out: int, zb: int, lo: int, wp: int, w: int):
    """(3*CO, ZB*LO) matmul result -> masked conv output (CO, ZB*LO): the
    three dx tap rows roll +-1 lane into place and sum.

    Padded convention: pad lanes absorb every boundary crossing (incl.
    z-segment seams); one out_valid mask at the end. Compact convention
    (wp == w): the +-1 rolls land on REAL lanes at x-edges, so the rolled
    pieces are edge-masked before summing; no final mask needed."""
    zlo = zb * lo
    compact = wp == w
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (c_out, zlo), 1)
    xpos = out_lane % wp
    acc = None
    for dx in range(3):
        m = jax.lax.slice(m3, (dx * c_out, 0), ((dx + 1) * c_out, zlo))
        sh = (zlo - (dx - 1)) % zlo
        if sh:
            m = pltpu.roll(m, sh, 1)
        if compact and dx == 0:  # left tap: out x==0 has no left neighbor
            m = jnp.where(xpos == 0, 0.0, m)
        elif compact and dx == 2:  # right tap: out x==w-1 has no right
            m = jnp.where(xpos == w - 1, 0.0, m)
        acc = m if acc is None else acc + m
    if compact:
        return acc
    out_valid = (xpos >= 1) & (xpos < w + 1)
    return jnp.where(out_valid, acc, 0.0)


def _stack_z(full, c_out: int, zb: int, lo: int):
    """(CO, ZB*LO) -> (ZB, CO, LO) by 128-aligned lane slices (no relayout
    of the lane dim: each segment slice starts at a multiple of LO)."""
    return jnp.stack(
        [jax.lax.slice(full, (0, j * lo), (c_out, (j + 1) * lo)) for j in range(zb)]
    )


def _halo_spec(zb: int, arr_c: int, lo: int) -> pl.BlockSpec:
    """Single-stream halo fetch: one ``pl.Element`` window of ZB+2 z-rows
    (data rows [ZB*z-1, ZB*z+ZB], i.e. padded rows [ZB*z, ZB*z+ZB+2) with
    DPAD=1) per grid step, delivered exactly in the ``sel`` row order
    (row j = global data z = ZB*zblk + j - 1). Replaces the original three
    offset z-block streams, which re-DMA'd every input row 3x — measured
    DMA-bound at ~388 GB/s of *actual* traffic (measured with the 3-stream
    probe, since superseded by benchmarks/probe_halo_ablate.py + probe_zb);
    the halo window fetches (ZB+2)/ZB ~= 1.5x instead. The DPAD guard rows
    keep every window in bounds (Mosaic Element indexing supports no low
    padding); their garbage values MUST be masked by ``_zvalid`` before use
    (they are, in both kernels)."""
    return pl.BlockSpec(
        (pl.Element(1), pl.Element(zb + 2), pl.Element(arr_c), pl.Element(lo)),
        lambda bb, z: (bb, DPAD + z * zb - 1, 0, 0),
    )


def _padded_out_spec(zb: int, arr_c: int, lo: int) -> pl.BlockSpec:
    """Write ZB z-rows at data offset ZB*z into a DPAD-padded of-form output
    (pad rows left unwritten/undefined)."""
    return pl.BlockSpec(
        (pl.Element(1), pl.Element(zb), pl.Element(arr_c), pl.Element(lo)),
        lambda bb, z: (bb, DPAD + z * zb, 0, 0),
    )


def _zvalid(zblk, zb: int, d: int, c: int, lo: int):
    """(ZB+2, 1, 1) mask: sel row i is global z = ZB*zblk + i - 1."""
    i = jax.lax.broadcasted_iota(jnp.int32, (zb + 2, 1, 1), 0)
    zg = zb * zblk + i - 1
    return jnp.logical_and(zg >= 0, zg < d)


def _ring_fetch(nzb: int, first, steady=None, after_wait=None):
    """The 2-slot double-buffered DMA ring protocol shared by every manual
    fetch below: start the NEXT grid step's window DMA before waiting on the
    current one, overlapping fetch with compute. Mosaic serializes the
    automatic ``pl.Element`` halo pipeline against compute (measured ~2x:
    probe_pipeline.py) because the overlapping Element windows alias; the
    explicit ring restores the overlap.

    Grid order is (b, z) with z fastest; slots are indexed by the GLOBAL
    step ``g = bb*nzb + z`` so they stay consistent across batch boundaries
    (a z-local slot breaks when nzb is odd, and double-fetches at z == 0 of
    every bb > 0); the prefetch crosses into the next batch element at
    z == nzb-1.

    ``first(slot, bsel, zsel)`` builds the descriptor for window z == 0 of a
    batch element; ``steady`` (default: ``first``) for z > 0 windows — waits
    always pair with the descriptor shape that was started. ``after_wait(g)``
    runs post-wait on non-final z steps (e.g. head-reuse VMEM copies).
    Returns the current slot index (a traced scalar)."""
    bb = pl.program_id(0)
    z = pl.program_id(1)
    nb = pl.num_programs(0)
    g = bb * nzb + z
    uniform = steady is None
    if uniform:
        steady = first

    @pl.when(g == 0)
    def _():
        first(0, bb, 0).start()

    nxt = z + 1
    last = nxt == nzb

    @pl.when(jnp.logical_not(last))
    def _():
        steady((g + 1) % 2, bb, nxt).start()

    @pl.when(jnp.logical_and(last, bb + 1 < nb))
    def _():
        first((g + 1) % 2, bb + 1, 0).start()

    if uniform:
        first(g % 2, bb, z).wait()
    else:
        @pl.when(z == 0)
        def _():
            first(g % 2, bb, z).wait()

        @pl.when(z != 0)
        def _():
            steady(g % 2, bb, z).wait()

    if after_wait is not None:
        @pl.when(jnp.logical_not(last))
        def _():
            after_wait(g)

    return g % 2


def _manual_window(x_hbm, buf, sem, zb: int, nzb: int):
    """Manual double-buffered halo fetch (``_ring_fetch``): returns this
    step's (ZB+2, C, LO) window rows from the 2-slot VMEM ring.

    HEAD REUSE: within a batch element, window z+1's first two halo rows ==
    window z's last two rows, so the within-batch prefetch DMAs only the ZB
    new rows into buf[nxt][2:] and the two head rows are copied VMEM-local
    from the current slot after its wait — eliminating the (ZB+2)/ZB halo
    overfetch entirely (read traffic 1.25x -> 1.0x at ZB=8). Window z == 0
    of each batch element is a full ZB+2 fetch."""

    def full(slot, bsel, zsel):
        return pltpu.make_async_copy(
            x_hbm.at[bsel, pl.ds(zsel * zb, zb + 2)],
            buf.at[slot],
            sem.at[slot],
        )

    def tail(slot, bsel, zsel):
        return pltpu.make_async_copy(
            x_hbm.at[bsel, pl.ds(zsel * zb + 2, zb)],
            buf.at[slot, pl.ds(2, zb)],
            sem.at[slot],
        )

    def head_copy(g):
        # head rows for the next window: VMEM-local copy of this window's
        # last two rows (disjoint from the in-flight tail DMA into [2:])
        buf[(g + 1) % 2, 0:2] = buf[g % 2, zb : zb + 2]

    return buf[_ring_fetch(nzb, full, tail, head_copy)]


def _manual_window_m(m_hbm, buf, sem, zb: int, nzb: int, s: int, zd: int):
    """Ring fetch of the transpose-conv MATMUL output ``m`` (B, 8CO, S, SEG)
    for the combine kernel's ``up`` stream (see ``convt_matmul_pp``): per
    grid step one (8CO, <=ZD, SEG) block covering the d-rows feeding this
    window's z-rows. Same global-step slot scheme as ``_manual_window``.

    The in-kernel row mapping is kept FULLY STATIC (Mosaic cannot lower a
    dynamic-index slice of a loaded array — hardware lowering error found
    in the round-3 A/B) by absorbing the volume-edge clamp into the DMA
    descriptors instead: buffer row dl holds global d-row
    ``zb*zblk//2 - 1 + dl``; the bottom window's fetch lands at buffer
    offset 1 (buf row 0 = the d=-1 row, garbage) and the top window fetches
    one fewer row (buf row ZD-1 = the d=S row, garbage). Both garbage rows
    feed only z-rows that ``_zvalid`` zeroes (z = -1 and z = D)."""
    if s + 1 < zd or nzb < 2:  # callers gate on d >= zb + 4
        raise ValueError(
            f"_manual_window_m needs S+1 >= ZD and nzb >= 2 "
            f"(S={s}, ZD={zd}, nzb={nzb}); disable up_m for this depth"
        )

    # m is laid out (B, S, 8CH, SEG) with the sliced d-rows on the MAJOR
    # (untiled) dim: Mosaic requires DMA slice sizes along the tiled
    # (sublane/lane) dims to be tiling-aligned, and ZD = zb//2 + 2 is not
    def bottom(slot, bsel, zsel):
        return pltpu.make_async_copy(
            m_hbm.at[bsel, pl.ds(0, zd - 1)],
            buf.at[slot, pl.ds(1, zd - 1)],
            sem.at[slot],
        )

    def interior(slot, bsel, zsel):
        return pltpu.make_async_copy(
            m_hbm.at[bsel, pl.ds(zb * zsel // 2 - 1, zd)],
            buf.at[slot],
            sem.at[slot],
        )

    def top(slot, bsel, zsel):
        return pltpu.make_async_copy(
            m_hbm.at[bsel, pl.ds(zb * zsel // 2 - 1, zd - 1)],
            buf.at[slot, pl.ds(0, zd - 1)],
            sem.at[slot],
        )

    class _Steady:
        """Interior/top descriptor selected by a ``pl.when`` branch at both
        the start and the wait site (waits must pair with the started
        descriptor's byte count)."""

        def __init__(self, slot, bsel, zsel):
            self.args = (slot, bsel, zsel)

        def start(self):
            slot, bsel, zsel = self.args

            @pl.when(zsel != nzb - 1)
            def _():
                interior(slot, bsel, zsel).start()

            @pl.when(zsel == nzb - 1)
            def _():
                top(slot, bsel, zsel).start()

        def wait(self):
            slot, bsel, zsel = self.args

            @pl.when(zsel != nzb - 1)
            def _():
                interior(slot, bsel, zsel).wait()

            @pl.when(zsel == nzb - 1)
            def _():
                top(slot, bsel, zsel).wait()

    return buf[_ring_fetch(nzb, bottom, _Steady)]


def _up_rows_from_m(mblk, zb: int, zd: int, ch: int, seg: int):
    """Rearrange an m-block (ZD, 8*CH, SEG) into the up halo window rows
    (ZB+2, CH, 4*SEG) for this grid step.

    Window row r holds output z = zb*zblk + r - 1 = 2d + i. With zb even,
    the parity i_r = (r+1) % 2 is static per r, and with the edge-variant
    fetch of ``_manual_window_m`` (buffer row dl = global d-row
    zb*zblk//2 - 1 + dl) the within-block d-offset is static too:
    dl(0) = 0, dl(r>=1) = (r-1)//2 + 1 — every extract is a pure static
    slice. Edge garbage rows are zeroed by the caller's ``_zvalid`` mask."""
    rows = []
    for r in range(zb + 2):
        i_r = (r + 1) % 2
        dl = 0 if r == 0 else (r - 1) // 2 + 1
        planes = [
            mblk[dl, (i_r * 4 + jl) * ch : (i_r * 4 + jl + 1) * ch]
            for jl in range(4)
        ]  # 4 x (CH, SEG)
        rows.append(jnp.concatenate(planes, axis=-1))
    return jnp.stack(rows)  # (ZB+2, CH, 4*SEG)


def convt_matmul_pp(
    t_of: jax.Array,  # (B, S + 2*DPAD, C_in, S*S) low-res COMPACT of-form
    convt_params: dict,  # {"kernel": (2,2,2,CO,CI), "bias": (CO,)}
    dtype,
) -> jax.Array:
    """The matmul half of ``convt_expand_pp`` WITHOUT the plane transpose:
    returns m (B, S, 8*CO, SEG) where row (i*4 + 2j + l)*CO + co at (d, hw)
    is the (i, j, l) filter tap of input slice d — i.e. output voxel
    z = 2d+i, plane (j, l), channel co. The sliced d-rows sit on the MAJOR
    (untiled) dim so the combine kernel's ring can DMA arbitrary-size d
    windows (Mosaic constrains slice sizes on the tiled sublane/lane dims
    only). The combine kernel consumes this directly (``_up_rows_from_m``),
    skipping the 2x volume-bytes materialization+transpose pass of the up
    tensor entirely."""
    b, sp, ci, seg = t_of.shape
    s = sp - 2 * DPAD
    t_of = t_of[:, DPAD : DPAD + s]
    kern = convt_params["kernel"]  # (2, 2, 2, CO, CI) torch orientation
    bias = convt_params["bias"]
    co = kern.shape[3]
    k8 = kern.reshape(8 * co, ci).astype(t_of.dtype)
    b8 = jnp.tile(bias.astype(jnp.float32), 8)  # co fastest, like k8's rows
    m = jnp.einsum(
        "tc,bdcl->bdtl", k8, t_of, preferred_element_type=jnp.float32
    )
    return (m + b8[None, None, :, None]).astype(dtype)


def _kernel(
    *refs,
    c: int,
    c_out: int,
    h: int,
    w: int,
    wp: int,
    d: int,
    zb: int,
    input_act: str,
    residual: bool,
    compute_dtype,
    interpret: bool,
    pp: bool = False,
    manual: bool = False,
):
    scratch = ()
    if residual:
        (xh, a_ref, b_ref, w_ref, wr_ref,
         o_ref, s_ref, ss_ref, r_ref, rs_ref, rss_ref, *scratch) = refs
    else:
        xh, a_ref, b_ref, w_ref, o_ref, s_ref, ss_ref, *scratch = refs
    zblk = pl.program_id(1)
    lo = h * wp if not pp else h * w

    if manual:
        win = _manual_window(xh, scratch[0], scratch[1], zb, d // zb)
    else:
        win = xh[0]
    sel = win.astype(jnp.float32)  # halo window rows (ZB+2, C, LO)
    if input_act == "affine_leaky":
        sel = sel * a_ref[0][None] + b_ref[0][None]
        sel = jnp.where(sel >= 0, sel, LEAKY_SLOPE * sel)
    if pp or wp == w:  # compact/pp: every lane is a real voxel
        sel = jnp.where(_zvalid(zblk, zb, d, c, lo), sel, 0.0)
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, c, lo), 2)
        lane_valid = ((lane % wp) >= 1) & ((lane % wp) < w + 1)
        sel = jnp.where(
            jnp.logical_and(lane_valid, _zvalid(zblk, zb, d, c, lo)), sel, 0.0
        )
    # bf16 through the rolls (int32 pair-pack bitcast) when sublanes pack
    # evenly; C=1 (conv1) stays fp32 — Mosaic only rotates 32-bit data
    if compute_dtype == jnp.bfloat16 and c % 2 == 0:
        sel = sel.astype(compute_dtype)

    out, acc, center = _conv_core(
        sel, w_ref, c, c_out, zb, lo, wp, w, compute_dtype, interpret,
        pp=pp, h=h,
    )
    o_ref[...] = out.astype(o_ref.dtype)[None]

    def accumulate_stats(vals, sref, ssref):
        s = jnp.broadcast_to(jnp.sum(vals, axis=1, keepdims=True), (c_out, LANE))
        ss = jnp.broadcast_to(
            jnp.sum(vals * vals, axis=1, keepdims=True), (c_out, LANE)
        )

        @pl.when(zblk == 0)
        def _():
            sref[...] = s[None]
            ssref[...] = ss[None]

        @pl.when(zblk != 0)
        def _():
            sref[...] += s[None]
            ssref[...] += ss[None]

    accumulate_stats(acc, s_ref, ss_ref)

    if residual:
        # 1x1x1 projection (conv3) of the transformed center rows
        res = jnp.dot(wr_ref[...], center, preferred_element_type=jnp.float32)
        if wp != w:
            out_lane = jax.lax.broadcasted_iota(jnp.int32, (c_out, zb * lo), 1)
            out_valid = ((out_lane % wp) >= 1) & ((out_lane % wp) < w + 1)
            res = jnp.where(out_valid, res, 0.0)
        r_ref[...] = _stack_z(res, c_out, zb, lo).astype(r_ref.dtype)[None]
        accumulate_stats(res, rs_ref, rss_ref)


def _manual_fetch_on() -> bool:
    """Manual double-buffered halo fetch (see _manual_window).
    Default ON for real TPU backends — the ring enables up_m (the combine
    kernel consuming the transpose-conv matmul output directly), measured
    A/B on v5e: serving 1.098 -> 1.188 vol/s, fast_apply_v3 parity exact
    (benchmarks/ab_manual.py). Default OFF elsewhere (interpret-mode CPU
    tests keep the cheaper-to-trace automatic Element-halo pipeline;
    explicit MEDSEG_MANUAL_FETCH=1 still forces it, as the ring parity
    tests do). Read at trace time — set it before the first call."""
    env = os.environ.get("MEDSEG_MANUAL_FETCH")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "tpu"


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "input_act", "residual", "out_dtype", "interpret", "pp"),
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
    pp: bool = False,  # parity-plane lane convention (see _pp_ok)
):
    """Fused conv. Returns (out, s, ss) or (out, s, ss, res, rs, rss) with
    ``residual=True``. ``s``/``ss`` are (B, CO, 128) lane-broadcast sums /
    sums-of-squares over the valid voxels (take lane 0)."""
    bsz, dp, c, lo = x.shape
    d = dp - 2 * DPAD
    wp = w if lo == h * w else _wp(w)  # compact vs padded lane convention
    assert lo == h * wp, (lo, h, w, wp)
    assert not pp or _pp_ok(h, w)
    c_out = wmat.shape[0] // 3
    compute_dtype = wmat.dtype
    zb = _zb_for(d, c)
    nzb = d // zb
    if _pair_ok(zb, c):
        wmat = weight_matrix_pair(wmat)
    if input_act == "none":
        # unused, but block shapes must match the input channel count
        a = jnp.zeros((bsz, c, 1), jnp.float32)
        b = jnp.zeros((bsz, c, 1), jnp.float32)

    ab_spec = pl.BlockSpec((1, c, 1), lambda bb, z: (bb, 0, 0))
    stat_spec = pl.BlockSpec((1, c_out, LANE), lambda bb, z: (bb, 0, 0))
    out_spec = _padded_out_spec(zb, c_out, lo)
    stat_shape = jax.ShapeDtypeStruct((bsz, c_out, LANE), jnp.float32)
    res_shape = jax.ShapeDtypeStruct((bsz, dp, c_out, lo), out_dtype)

    # Mosaic rejects explicit-DMA blocks whose sublane (channel) dim is below
    # the dtype packing factor; C=1 (enc1.conv1) stays on the automatic halo
    # pipeline — its bytes are 1/16th of a 16-channel stream anyway
    manual = _manual_fetch_on() and c >= 8
    x_spec = (
        pl.BlockSpec(memory_space=pl.ANY) if manual else _halo_spec(zb, c, lo)
    )
    in_specs = [x_spec, ab_spec, ab_spec,
                pl.BlockSpec(memory_space=pltpu.VMEM)]
    operands = [x, a, b, wmat]
    out_specs = [out_spec, stat_spec, stat_spec]
    out_shape = [res_shape, stat_shape, stat_shape]
    if residual:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(wres)
        out_specs += [out_spec, stat_spec, stat_spec]
        out_shape += [res_shape, stat_shape, stat_shape]
    scratch_shapes = (
        [pltpu.VMEM((2, zb + 2, c, lo), x.dtype), pltpu.SemaphoreType.DMA((2,))]
        if manual
        else []
    )

    kern = functools.partial(
        _kernel,
        c=c,
        c_out=c_out,
        h=h,
        w=w,
        wp=wp,
        d=d,
        zb=zb,
        input_act=input_act,
        residual=residual,
        compute_dtype=compute_dtype,
        interpret=interpret,
        pp=pp,
        manual=manual,
    )
    return pl.pallas_call(
        kern,
        grid=(bsz, nzb),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch_shapes,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(*operands)


def _wgrad_kernel(
    xh, g_ref, dw_ref, *scratch,
    c: int, c_out: int, h: int, w: int, d: int, zb: int,
    compute_dtype, interpret: bool, manual: bool,
):
    """Filter gradient of the 3x3x3 stride-1 zero-pad conv, of-form compact:
    dW(3CO, 9C) += adjoint-rolled cotangent rows @ patches^T per (b, zblk).

    The forward (``_kernel``) computes out = R(W @ S(x)) with S = the
    (dz, dy) patch stencil and R = the dx roll-combine (``_dx_combine``,
    compact: edge-masked +-1 lane rolls). By bilinearity
    dW = sum_blocks R*(g) @ S(x)^T where R* is the roll adjoint: mask the
    x==0 column for the left tap (x==w-1 for the right), then roll the
    OPPOSITE way; the mask-before-roll ordering makes the lane-rotation
    wraparound (across z segments and volume edges) multiply zeroed values,
    exactly mirroring the forward's mask-after-roll."""
    zblk = pl.program_id(1)
    bb = pl.program_id(0)
    lo = h * w  # compact only (asserted by the wrapper)
    if manual:
        win = _manual_window(xh, scratch[0], scratch[1], zb, d // zb)
    else:
        win = xh[0]
    sel = jnp.where(_zvalid(zblk, zb, d, c, lo), win.astype(jnp.float32), 0.0)
    if compute_dtype == jnp.bfloat16 and c % 2 == 0:
        sel = sel.astype(compute_dtype)
    bases = _dz_bases(sel, zb, lo)
    patches9 = _stencil9(bases, c, zb, lo, w, compute_dtype, interpret)

    gblk = g_ref[0]  # (ZB, CO, LO)
    zlo = zb * lo
    gfull = jnp.concatenate(
        [gblk[j] for j in range(zb)], axis=-1
    ).astype(jnp.float32)  # (CO, ZB*LO)
    xpos = jax.lax.broadcasted_iota(jnp.int32, (c_out, zlo), 1) % w
    rows = []
    for dx in range(3):
        gm = gfull
        if dx == 0:
            gm = jnp.where(xpos == 0, 0.0, gm)
        elif dx == 2:
            gm = jnp.where(xpos == w - 1, 0.0, gm)
        sh = (dx - 1) % zlo
        if sh:
            gm = pltpu.roll(gm, sh, 1)
        rows.append(gm.astype(compute_dtype))
    gstack = jnp.concatenate(rows, axis=0)  # (3CO, ZB*LO)
    dw = jax.lax.dot_general(
        gstack, patches9, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (3CO, 9C)

    @pl.when((bb == 0) & (zblk == 0))
    def _():
        dw_ref[...] = dw

    @pl.when((bb != 0) | (zblk != 0))
    def _():
        dw_ref[...] += dw


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def conv3x3x3_wgrad_of(
    x: jax.Array,  # output-form (B, D + 2*DPAD, C, H*W) compact
    g: jax.Array,  # cotangent (B, D [+ 2*DPAD], CO, H*W) compact
    *,
    h: int,
    w: int,
    interpret: bool = False,
) -> jax.Array:
    """dL/dW of ``conv3x3x3_of(input_act="none")`` in ``weight_matrix``
    layout (3*CO, 9*C) fp32. Training use: replaces the XLA filter-grad conv
    (``conv3d._conv_dk``) whose (CDHWN x IDHWO) lowering runs at ~5.6 TF/s
    on the 16-channel full-res shapes (benchmarks/trace_train.py). ``g``
    may arrive DPAD-padded (a ``to_output_form`` result shared with the
    bwd-data conv) — the guard rows are simply never read."""
    bsz, dp, c, lo = x.shape
    d = dp - 2 * DPAD
    assert lo == h * w, "wgrad kernel: compact lane convention only"
    _, dg, c_out, log = g.shape
    g_dpad = DPAD if dg == dp else 0
    assert (dg, log) == (d + 2 * g_dpad, lo), (g.shape, x.shape)
    zb = _zb_for(d, c)
    manual = _manual_fetch_on() and c >= 8
    x_spec = (
        pl.BlockSpec(memory_space=pl.ANY) if manual else _halo_spec(zb, c, lo)
    )
    scratch_shapes = (
        [pltpu.VMEM((2, zb + 2, c, lo), x.dtype), pltpu.SemaphoreType.DMA((2,))]
        if manual
        else []
    )
    return pl.pallas_call(
        functools.partial(
            _wgrad_kernel,
            c=c, c_out=c_out, h=h, w=w, d=d, zb=zb,
            compute_dtype=g.dtype, interpret=interpret, manual=manual,
        ),
        grid=(bsz, d // zb),
        in_specs=[
            x_spec,
            pl.BlockSpec(
                (pl.Element(1), pl.Element(zb), pl.Element(c_out), pl.Element(lo)),
                lambda bb, z: (bb, g_dpad + z * zb, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec((3 * c_out, 9 * c), lambda bb, z: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((3 * c_out, 9 * c), jnp.float32),
        scratch_shapes=scratch_shapes,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(x, g)


def wgrad_to_kernel(dw: jax.Array, c: int, c_out: int) -> jax.Array:
    """(3*CO, 9*C) ``weight_matrix``-layout gradient -> (3, 3, 3, C, CO)
    kernel gradient (the inverse of ``conv3d.weight_matrix``'s packing:
    dx-major rows, (dz, dy, ci) columns)."""
    return dw.reshape(3, c_out, 3, 3, c).transpose(2, 3, 0, 4, 1)


def _cat2_kernel(
    xa, xb, w_ref, wr_ref,
    o_ref, s_ref, ss_ref, r_ref, rs_ref, rss_ref,
    *scratch,
    c_half: int, c_out: int, h: int, w: int, wp: int, d: int, zb: int,
    compute_dtype, interpret: bool, manual: bool = False,
):
    """conv3x3x3 + residual tap over the channel-concat [xa ; xb] of two
    equal-width of-form streams, concatenated on rows in VMEM — removes the
    standalone HBM concat pass of the mid-resolution ``up_block_of`` entry
    conv (compact lane convention; input_act none)."""
    zblk = pl.program_id(1)
    lo = h * wp
    c = 2 * c_half

    if manual:
        abuf, asem, bbuf, bsem = scratch
        nzb = d // zb
        a_win = _manual_window(xa, abuf, asem, zb, nzb)
        b_win = _manual_window(xb, bbuf, bsem, zb, nzb)
    else:
        a_win, b_win = xa[0], xb[0]
    sel = jnp.concatenate(
        [a_win.astype(jnp.float32), b_win.astype(jnp.float32)], axis=1
    )  # (ZB+2, C, LO)
    if wp == w:  # compact: every lane is a real voxel
        sel = jnp.where(_zvalid(zblk, zb, d, c, lo), sel, 0.0)
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, c, lo), 2)
        lane_valid = ((lane % wp) >= 1) & ((lane % wp) < w + 1)
        sel = jnp.where(
            jnp.logical_and(lane_valid, _zvalid(zblk, zb, d, c, lo)), sel, 0.0
        )
    if compute_dtype == jnp.bfloat16 and c % 2 == 0:
        sel = sel.astype(compute_dtype)

    out, acc, center = _conv_core(
        sel, w_ref, c, c_out, zb, lo, wp, w, compute_dtype, interpret
    )
    o_ref[...] = out.astype(o_ref.dtype)[None]

    def accumulate_stats(vals, sref, ssref):
        s = jnp.broadcast_to(jnp.sum(vals, axis=1, keepdims=True), (c_out, LANE))
        ss = jnp.broadcast_to(
            jnp.sum(vals * vals, axis=1, keepdims=True), (c_out, LANE)
        )

        @pl.when(zblk == 0)
        def _():
            sref[...] = s[None]
            ssref[...] = ss[None]

        @pl.when(zblk != 0)
        def _():
            sref[...] += s[None]
            ssref[...] += ss[None]

    accumulate_stats(acc, s_ref, ss_ref)

    res = jnp.dot(wr_ref[...], center, preferred_element_type=jnp.float32)
    if wp != w:
        out_lane = jax.lax.broadcasted_iota(jnp.int32, (c_out, zb * lo), 1)
        out_valid = ((out_lane % wp) >= 1) & ((out_lane % wp) < w + 1)
        res = jnp.where(out_valid, res, 0.0)
    r_ref[...] = _stack_z(res, c_out, zb, lo).astype(r_ref.dtype)[None]
    accumulate_stats(res, rs_ref, rss_ref)


@functools.partial(
    jax.jit, static_argnames=("h", "w", "out_dtype", "interpret")
)
def conv3x3x3_of_cat2(
    xa: jax.Array,  # (B, D, C_half, LO) of-form stream A (e.g. upsample)
    xb: jax.Array,  # (B, D, C_half, LO) of-form stream B (e.g. skip)
    wmat: jax.Array,  # (3*CO, 9*2*C_half)
    wres: jax.Array,  # (CO, 2*C_half)
    *,
    h: int,
    w: int,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Fused entry conv for ``up_block_of``: conv3x3x3 + residual 1x1 tap +
    stats over the in-VMEM channel concat of two of-form streams.
    Returns (out, s, ss, res, rs, rss) like ``conv3x3x3_of(residual=True)``."""
    bsz, dp, c_half, lo = xa.shape
    assert xb.shape == xa.shape, (xa.shape, xb.shape)
    d = dp - 2 * DPAD
    wp = w if lo == h * w else _wp(w)
    assert lo == h * wp, (lo, h, w, wp)
    c_out = wmat.shape[0] // 3
    compute_dtype = wmat.dtype
    zb = _zb_for(d, 2 * c_half)
    nzb = d // zb
    if _pair_ok(zb, 2 * c_half):
        wmat = weight_matrix_pair(wmat)

    stat_spec = pl.BlockSpec((1, c_out, LANE), lambda bb, z: (bb, 0, 0))
    out_spec = _padded_out_spec(zb, c_out, lo)
    stat_shape = jax.ShapeDtypeStruct((bsz, c_out, LANE), jnp.float32)
    res_shape = jax.ShapeDtypeStruct((bsz, dp, c_out, lo), out_dtype)

    manual = _manual_fetch_on()
    x_spec = (
        pl.BlockSpec(memory_space=pl.ANY)
        if manual
        else _halo_spec(zb, c_half, lo)
    )
    scratch_shapes = []
    if manual:
        for op in (xa, xb):
            scratch_shapes += [
                pltpu.VMEM((2, zb + 2, c_half, lo), op.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ]

    kern = functools.partial(
        _cat2_kernel,
        c_half=c_half, c_out=c_out, h=h, w=w, wp=wp, d=d, zb=zb,
        compute_dtype=compute_dtype, interpret=interpret, manual=manual,
    )
    return pl.pallas_call(
        kern,
        grid=(bsz, nzb),
        in_specs=[
            x_spec, x_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, stat_spec, stat_spec, out_spec, stat_spec, stat_spec),
        out_shape=(res_shape, stat_shape, stat_shape, res_shape, stat_shape, stat_shape),
        scratch_shapes=scratch_shapes,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(xa, xb, wmat, wres)


def _combine_kernel(
    uph, yh, xh,
    ay_ref, by_ref, ax_ref, bx_ref, w_ref, wr_ref,
    o_ref, s_ref, ss_ref, r_ref, rs_ref, rss_ref,
    *scratch,
    c_half: int, c_out: int, h: int, w: int, wp: int, d: int, zb: int,
    compute_dtype, interpret: bool, pp: bool = False, manual: bool = False,
    up_m: bool = False,
):
    """conv3x3x3 over the 2*c_half-channel concat [up ; leaky(ay*y+by+ax*x+bx)]
    with the skip-combine computed on rows in VMEM (kills the standalone
    enc1-combine + concat HBM passes of the v2 serving path). Residual 1x1
    tap + two-phase-norm statistics as in ``_kernel``; multi-z blocked.

    ``up_m``: the up stream is the raw transpose-conv matmul output m
    (B, 8*CH, S, SEG) instead of the materialized of-form tensor — the
    plane rearrange happens here on VMEM rows (``_up_rows_from_m``)."""
    zblk = pl.program_id(1)
    lo = h * wp if not pp else h * w
    c = 2 * c_half

    if manual:
        ubuf, usem, ybuf, ysem = scratch
        nzb = d // zb
        if up_m:
            s_half = d // 2
            zd = zb // 2 + 2
            mblk = _manual_window_m(uph, ubuf, usem, zb, nzb, s_half, zd)
            u_win = _up_rows_from_m(mblk, zb, zd, c_half, lo // 4)
        else:
            u_win = _manual_window(uph, ubuf, usem, zb, nzb)
        y_win = _manual_window(yh, ybuf, ysem, zb, nzb)
        x_win = xh[0]  # always the automatic halo pipeline (see wrapper)
    else:
        u_win, y_win, x_win = uph[0], yh[0], xh[0]
    u_sel = u_win.astype(jnp.float32)  # halo rows (ZB+2, CH, LO)
    y_sel = y_win.astype(jnp.float32)
    x_sel = x_win.astype(jnp.float32)  # (ZB+2, 1 or CH, LO)
    comb = (
        y_sel * ay_ref[0][None]
        + by_ref[0][None]
        # C_in=1: (.., 1, LO) * (CH, 1) broadcast (conv3 folded into ax);
        # multi-channel: elementwise norm3 affine on the conv3 rows
        + x_sel * ax_ref[0][None]
        + bx_ref[0][None]
    )
    comb = jnp.where(comb >= 0, comb, LEAKY_SLOPE * comb)
    sel = jnp.concatenate([u_sel, comb], axis=1)  # (ZB+2, C, LO)
    if pp or wp == w:  # compact/pp: every lane is a real voxel
        sel = jnp.where(_zvalid(zblk, zb, d, c, lo), sel, 0.0)
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, c, lo), 2)
        lane_valid = ((lane % wp) >= 1) & ((lane % wp) < w + 1)
        sel = jnp.where(
            jnp.logical_and(lane_valid, _zvalid(zblk, zb, d, c, lo)), sel, 0.0
        )
    if compute_dtype == jnp.bfloat16 and c % 2 == 0:
        sel = sel.astype(compute_dtype)

    out, acc, center = _conv_core(
        sel, w_ref, c, c_out, zb, lo, wp, w, compute_dtype, interpret,
        pp=pp, h=h,
    )
    o_ref[...] = out.astype(o_ref.dtype)[None]

    def accumulate_stats(vals, sref, ssref):
        s = jnp.broadcast_to(jnp.sum(vals, axis=1, keepdims=True), (c_out, LANE))
        ss = jnp.broadcast_to(
            jnp.sum(vals * vals, axis=1, keepdims=True), (c_out, LANE)
        )

        @pl.when(zblk == 0)
        def _():
            sref[...] = s[None]
            ssref[...] = ss[None]

        @pl.when(zblk != 0)
        def _():
            sref[...] += s[None]
            ssref[...] += ss[None]

    accumulate_stats(acc, s_ref, ss_ref)

    res = jnp.dot(wr_ref[...], center, preferred_element_type=jnp.float32)
    if not pp and wp != w:
        out_lane = jax.lax.broadcasted_iota(jnp.int32, (c_out, zb * lo), 1)
        out_valid = ((out_lane % wp) >= 1) & ((out_lane % wp) < w + 1)
        res = jnp.where(out_valid, res, 0.0)
    r_ref[...] = _stack_z(res, c_out, zb, lo).astype(r_ref.dtype)[None]
    accumulate_stats(res, rs_ref, rss_ref)


@functools.partial(
    jax.jit, static_argnames=("h", "w", "out_dtype", "interpret", "pp", "up_m")
)
def conv3x3x3_of_combine(
    up: jax.Array,  # (B, D, C_half, LO) raw transpose-conv output rows; or
    # the raw matmul form (B, 8*C_half, D/2, LO/4) from convt_matmul_pp
    # when ``up_m`` (pp + manual fetch only)
    y: jax.Array,  # (B, D, C_half, LO) previous conv output (pre-norm)
    x1: jax.Array,  # enc1 residual stream: (B, D, 1, LO) raw block input
    # (C_in=1, conv3 folded into ``ax``) or (B, D, C_half, LO) conv3 matmul
    # rows (multi-channel input, round-5)
    ay: jax.Array,  # (B, C_half, 1) instance-norm affine for y
    by: jax.Array,
    ax: jax.Array,  # (B, C_half, 1) residual-path affine for x (a3 * k3
    # folded when C_in=1; the plain norm3 affine otherwise)
    bx: jax.Array,
    wmat: jax.Array,  # (3*CO, 9*2*C_half)
    wres: jax.Array,  # (CO, 2*C_half)
    *,
    h: int,
    w: int,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    pp: bool = False,
    up_m: bool = False,
):
    """Fused UnetrUpBlock entry conv for the full-res decoder stage: builds
    the [up ; enc1-combined] 2*C_half-channel input inline from the up /
    y / x row streams and runs the 3x3x3 conv + residual tap + stats.
    Returns (out, s, ss, res, rs, rss)."""
    bsz, dp, c_half, lo = y.shape
    d = dp - 2 * DPAD
    wp = w if lo == h * w else _wp(w)  # compact vs padded lane convention
    assert lo == h * wp, (lo, h, w, wp)
    c_out = wmat.shape[0] // 3
    compute_dtype = wmat.dtype
    zb = _zb_for(d, 2 * c_half)
    nzb = d // zb
    if _pair_ok(zb, 2 * c_half):
        wmat = weight_matrix_pair(wmat)

    manual = _manual_fetch_on()
    if up_m:
        assert pp and manual and zb % 2 == 0, (pp, manual, zb)
        assert up.shape == (bsz, d // 2, 8 * c_half, lo // 4), up.shape

    ab_spec = pl.BlockSpec((1, c_half, 1), lambda bb, z: (bb, 0, 0))
    stat_spec = pl.BlockSpec((1, c_out, LANE), lambda bb, z: (bb, 0, 0))
    out_spec = _padded_out_spec(zb, c_out, lo)
    stat_shape = jax.ShapeDtypeStruct((bsz, c_out, LANE), jnp.float32)
    res_shape = jax.ShapeDtypeStruct((bsz, dp, c_out, lo), out_dtype)

    # the x stream stays on the automatic halo pipeline even in manual
    # mode: at C=1 its (ZB+2, 1, LO) ring blocks have a sublane dim below
    # the bf16 packing factor, which Mosaic rejects for explicit DMAs (and
    # at 1/16th of the y stream's bytes the ring gains nothing); the
    # multi-channel residual stream keeps the same route for uniformity
    x_c = x1.shape[2]
    halo = (
        (lambda arr_c: pl.BlockSpec(memory_space=pl.ANY))
        if manual
        else (lambda arr_c: _halo_spec(zb, arr_c, lo))
    )
    scratch_shapes = []
    if manual:
        if up_m:
            scratch_shapes += [
                pltpu.VMEM((2, zb // 2 + 2, 8 * c_half, lo // 4), up.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        else:
            scratch_shapes += [
                pltpu.VMEM((2, zb + 2, c_half, lo), up.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        scratch_shapes += [
            pltpu.VMEM((2, zb + 2, c_half, lo), y.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    kern = functools.partial(
        _combine_kernel,
        c_half=c_half, c_out=c_out, h=h, w=w, wp=wp, d=d, zb=zb,
        compute_dtype=compute_dtype, interpret=interpret, pp=pp, manual=manual,
        up_m=up_m,
    )
    return pl.pallas_call(
        kern,
        grid=(bsz, nzb),
        in_specs=[
            halo(c_half),
            halo(c_half),
            _halo_spec(zb, x_c, lo),  # x stream: always automatic
            ab_spec, ab_spec, ab_spec, ab_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, stat_spec, stat_spec, out_spec, stat_spec, stat_spec),
        out_shape=(res_shape, stat_shape, stat_shape, res_shape, stat_shape, stat_shape),
        scratch_shapes=scratch_shapes,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(up, y, x1, ay, by, ax, bx, wmat, wres)


def _manual_rows(x_hbm, buf, sem, zb: int, nzb: int):
    """Aligned no-halo variant of ``_manual_window`` (same ``_ring_fetch``
    protocol): zb-row windows at padded offset DPAD + z*zb. No head reuse
    (windows are disjoint)."""

    def fetch(slot, bsel, zsel):
        return pltpu.make_async_copy(
            x_hbm.at[bsel, pl.ds(DPAD + zsel * zb, zb)],
            buf.at[slot],
            sem.at[slot],
        )

    return buf[_ring_fetch(nzb, fetch)]


def _outhead_kernel(
    *refs, zb: int, nzb: int, scaled: bool, compute_dtype, manual: bool = False,
    transposed: bool = False, zpack: int = 1,
):
    """Final residual-block combine + LeakyReLU + 1x1x1 out head, one pass:
    logits = (K @ leaky(az*z + bz + ar*res + br) + bias) [* scale], written
    in output-form. Replaces two fp32 combine passes + einsum + bias add;
    with ``scaled``, the sliding-window blend weight (importance * 1/count
    * window-validity, one row per (b, z)) multiplies in the epilogue so the
    serving path emits PRE-WEIGHTED logits (kills a standalone full-volume
    multiply pass). Multi-z blocked (no halos for a 1x1x1 head).

    ``transposed``: emit (ZB, LO, CO) instead of (ZB, CO, LO) — the matmul
    runs with the contraction on the lhs SUBLANE dim (Mosaic lowers the
    transposed-lhs dot natively, benchmarks/probe_relayout2.py), so the
    row-major HBM result IS the ppk/flatk K-minor window form and the
    XLA exit ``swapaxes(2,3)`` relayout (45 ms/vol at 96^3, round-3c trace)
    disappears. Bias rides as an extra contraction row ([comb; w] x
    [K ; bias*], w = scale row or ones) so scale and bias both apply in the
    lane-natural orientation.

    ``zpack`` (requires transposed): pack ``zpack`` consecutive z-rows into
    the lane dim — per grid step ONE (ZB//zpack groups of) (LO, zpack*CO)
    value whose lane tile is full when zpack*CO == 128. The bare transposed
    store is a CO(=16)-lane-minor write that runs at ~1/8 DMA efficiency
    (probe_outhead_t.py: 8.44 vs 4.08 ms/call); packing restores aligned
    full-tile stores while keeping the K-minor-within-z window form."""
    if scaled:
        (z_ref, r_ref, az_ref, bz_ref, ar_ref, br_ref, k_ref, bias_ref,
         sc_ref, o_ref, *scratch) = refs
    else:
        (z_ref, r_ref, az_ref, bz_ref, ar_ref, br_ref, k_ref, bias_ref,
         o_ref, *scratch) = refs
    if manual:
        z_win = _manual_rows(z_ref, scratch[0], scratch[1], zb, nzb)
        r_win = _manual_rows(r_ref, scratch[2], scratch[3], zb, nzb)
        sc_win = (
            _manual_rows(sc_ref, scratch[4], scratch[5], zb, nzb)
            if scaled
            else None
        )
    else:
        z_win, r_win = z_ref[0], r_ref[0]
        sc_win = sc_ref[0] if scaled else None
    comb = (
        z_win.astype(jnp.float32) * az_ref[0][None]
        + bz_ref[0][None]
        + r_win.astype(jnp.float32) * ar_ref[0][None]
        + br_ref[0][None]
    )  # (ZB, C, LO)
    comb = jnp.where(comb >= 0, comb, LEAKY_SLOPE * comb).astype(compute_dtype)
    if transposed:
        # out[l, k] = sum_c comb[c, l]*K[c, k] + w[l]*bias[k], with
        # w = scale (pre-weighted serving) or 1. k_ref is (C+1, CO):
        # rows [0, C) the head weights, row C the bias (fp32 values cast
        # to compute dtype by the caller).
        lo = comb.shape[-1]
        outs = []
        for j in range(zb):
            if scaled:
                w_row = sc_win[j].astype(jnp.float32)  # (1, LO)
                lhs = jnp.concatenate(
                    [comb[j].astype(jnp.float32) * w_row, w_row], axis=0
                ).astype(compute_dtype)
            else:
                lhs = jnp.concatenate(
                    [comb[j], jnp.ones((1, lo), comb.dtype)], axis=0
                )
            outs.append(
                jax.lax.dot_general(
                    lhs, k_ref[...], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(o_ref.dtype)
                # cast per z-row: the fp32 (LO, CO) values are lane-padded
                # 8x in VMEM — keeping zb of them live at fp32 costs ~38MB
            )  # (LO, CO)
        if zpack > 1:
            # z-packed lanes: groups of zpack consecutive z-rows concat on
            # the lane dim -> (ZB//zpack, LO, zpack*CO) full-tile stores
            groups = [
                jnp.concatenate(outs[g * zpack : (g + 1) * zpack], axis=-1)
                for g in range(zb // zpack)
            ]
            o_ref[...] = jnp.stack(groups)[None]
            return
        o_ref[...] = jnp.stack(outs)[None]
        return
    outs = [
        jnp.dot(k_ref[...], comb[j], preferred_element_type=jnp.float32)
        + bias_ref[...]
        for j in range(zb)
    ]
    out = jnp.stack(outs)
    if scaled:
        out = out * sc_win.astype(jnp.float32)  # (ZB, 1, LO) broadcast
    o_ref[...] = out[None].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "interpret", "transposed", "zpack")
)
def outhead_of(
    z: jax.Array,  # (B, D, C, LO) final conv output (pre-norm)
    res: jax.Array,  # (B, D, C, LO) residual tap (pre-norm)
    az: jax.Array,  # (B, C, 1) norm affines
    bz: jax.Array,
    ar: jax.Array,
    br: jax.Array,
    kout: jax.Array,  # (CO_pad, C) 1x1x1 out-head weights (rows >= n_classes zero)
    bias: jax.Array,  # (CO_pad, 1) fp32
    scale: jax.Array | None = None,  # (B, D, 1, LO) fp32 per-voxel blend weight
    *,
    out_dtype=jnp.float32,
    interpret: bool = False,
    transposed: bool = False,
    zpack: int = 1,
):
    """UNPADDED output-form logits (B, D, CO_pad, LO) — the pallas chain's
    exit point drops the DPAD guard rows. Pad channels carry bias only;
    callers slice [:n_classes]. ``scale`` multiplies the logits in the
    kernel epilogue (sliding-window blend weights).

    With ``transposed=True`` the result is (B, D, LO, CO_pad): row-major
    this IS the flatk/ppk K-minor window form — the caller's reshape to
    (B, D, 4, H/2, (W/2)*K16) (pp) or (B, D, H, W, K16) (compact) is a free
    bitcast, replacing the measured 45 ms/vol ``swapaxes(2,3)`` exit copy.
    The (ZB, LO, CO) block is lane-padded to 128 in VMEM (8x for CO=16), so
    the z-block is capped separately (MEDSEG_ZB_OUTHEAD_T, default 4).

    ``zpack > 1`` (requires ``transposed`` and ``d % zpack == 0``; pick
    zpack = 128 // CO_pad so the lane tile is full): the result is
    (B, D/zpack, LO, zpack*CO_pad) — groups of zpack consecutive z-rows
    packed on the lane dim, the z-packed ppk window form the zrow walk
    consumes (K-minor within each packed z-row)."""
    bsz, dp, c, lo = z.shape
    d = dp - 2 * DPAD
    co = kout.shape[0]
    if zpack > 1:
        assert transposed and d % zpack == 0, (d, zpack, transposed)
    zb = _zb_for(d, c)
    if transposed:
        limit = max(int(os.environ.get("MEDSEG_ZB_OUTHEAD_T", "4")), zpack)
        zb = min(zb, limit)
        if zpack > 1:
            # zb a multiple of zpack; d % zpack == 0 guarantees termination
            zb = max(zb - zb % zpack, zpack)
            while d % zb:
                zb -= zpack
        else:
            while d % zb:
                zb -= 1
    nzb = d // zb
    manual = _manual_fetch_on()
    # no z-halo here (1x1x1 head): aligned ZB windows at data offset ZB*zz
    if manual:
        row = lambda arr_c: pl.BlockSpec(memory_space=pl.ANY)
    else:
        row = lambda arr_c: pl.BlockSpec(
            (pl.Element(1), pl.Element(zb), pl.Element(arr_c), pl.Element(lo)),
            lambda bb, zz: (bb, DPAD + zz * zb, 0, 0),
        )
    ab_spec = pl.BlockSpec((1, c, 1), lambda bb, zz: (bb, 0, 0))
    if transposed:
        # (C+1, CO): head weights + bias row (see _outhead_kernel)
        kmat = jnp.concatenate(
            [kout.T, bias.astype(kout.dtype).reshape(1, co)], axis=0
        )
    else:
        kmat = kout
    in_specs = [
        row(c), row(c), ab_spec, ab_spec, ab_spec, ab_spec,
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    operands = [z, res, az, bz, ar, br, kmat, bias]
    stream_cs = [c, c]
    if scale is not None:
        in_specs.append(row(1))
        operands.append(scale)
        stream_cs.append(1)
    scratch_shapes = []
    if manual:
        for arr_c, op in zip(stream_cs, (z, res, scale)):
            scratch_shapes += [
                pltpu.VMEM((2, zb, arr_c, lo), op.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ]
    if zpack > 1:
        out_block = (1, zb // zpack, lo, zpack * co)
        out_dims = (bsz, d // zpack, lo, zpack * co)
    elif transposed:
        out_block = (1, zb, lo, co)
        out_dims = (bsz, d, lo, co)
    else:
        out_block = (1, zb, co, lo)
        out_dims = (bsz, d, co, lo)
    return pl.pallas_call(
        functools.partial(
            _outhead_kernel, zb=zb, nzb=nzb, scaled=scale is not None,
            compute_dtype=kout.dtype, manual=manual, transposed=transposed,
            zpack=zpack,
        ),
        grid=(bsz, nzb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(out_block, lambda bb, zz: (bb, zz, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(out_dims, out_dtype),
        scratch_shapes=scratch_shapes,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(*operands)


def _outhead_row_kernel(
    z_ref, r_ref, az_ref, bz_ref, ar_ref, br_ref, k_ref, sc_ref, o_ref,
    *,
    zb: int,
    n_w: int,
    rh2: int,
    rw2: int,
    w_starts2: tuple,
    compute_dtype,
):
    """Out head + z-pack + in-kernel W-FOLD (round 5).

    Grid (g, nzb, n_w), n_w innermost: the out block (one folded rowblock
    row) is revisited across the n_w consecutive window steps — window wi's
    z-packed rows accumulate into the row at its static ww offset, so the
    per-window logits never round-trip HBM and the XLA W-fold pass
    disappears (the windows' only HBM traffic is the z2/res/scale reads the
    head needs anyway)."""
    wi = pl.program_id(2)
    z_win, r_win, sc_win = z_ref[0], r_ref[0], sc_ref[0]
    comb = (
        z_win.astype(jnp.float32) * az_ref[0][None]
        + bz_ref[0][None]
        + r_win.astype(jnp.float32) * ar_ref[0][None]
        + br_ref[0][None]
    )  # (ZB, C, LO)
    comb = jnp.where(comb >= 0, comb, LEAKY_SLOPE * comb).astype(compute_dtype)
    outs = []
    for j in range(zb):
        w_row = sc_win[j].astype(jnp.float32)  # (1, LO)
        lhs = jnp.concatenate(
            [comb[j].astype(jnp.float32) * w_row, w_row], axis=0
        ).astype(compute_dtype)
        outs.append(
            jax.lax.dot_general(
                lhs, k_ref[...], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)  # see _outhead_kernel: fp32 lane pad x8
        )  # (LO, CO)
    win = jnp.concatenate(outs, axis=-1)  # (LO, ZB*CO = 128)
    win = win.reshape(4, rh2, rw2, win.shape[-1])

    @pl.when(wi == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    for w_idx in range(n_w):

        @pl.when(wi == w_idx)
        def _(w_idx=w_idx):
            ws2 = w_starts2[w_idx]
            sl = (0, 0) + (slice(None), slice(None), pl.ds(ws2, rw2), slice(None))
            o_ref[sl] = o_ref[sl] + win


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_w", "w_starts2", "wp_half", "rh2", "rw2", "zpack",
        "out_dtype", "interpret",
    ),
)
def outhead_row_of(
    z: jax.Array,  # (n_w*G, D + 2*DPAD, C, LO) final conv output (pre-norm)
    res: jax.Array,  # same shape: residual tap (pre-norm)
    az: jax.Array,  # (n_w*G, C, 1) norm affines
    bz: jax.Array,
    ar: jax.Array,
    br: jax.Array,
    kout: jax.Array,  # (CO_pad, C)
    bias: jax.Array,  # (CO_pad, 1) fp32
    scale: jax.Array,  # (n_w*G, D + 2*DPAD, 1, LO) fp32 blend weight
    *,
    n_w: int,
    w_starts2: tuple,  # per-window ww offsets (w_start // 2), static
    wp_half: int,  # folded row width Wp // 2
    rh2: int,
    rw2: int,
    zpack: int,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """W-FOLDED z-packed rows (G, D/zp, 4, rh2, wp_half*zp*CO): the n_w
    windows of each rowblock overlap-add inside the kernel (see
    ``_outhead_row_kernel``). The batch dim must be n_w-major over the
    window axis (window wi of group gg sits at batch index wi*G + gg —
    the zrow walk's ``jnp.stack`` window order). Windows are the
    ``fast_apply_v3(pp=True)`` pre-weighted serving windows; ``scale`` is
    mandatory (it carries importance * 1/count * validity)."""
    bsz, dp, c, lo = z.shape
    d = dp - 2 * DPAD
    g = bsz // n_w
    co = kout.shape[0]
    assert bsz == n_w * g and len(w_starts2) == n_w
    assert zpack * co == 128 and d % zpack == 0, (zpack, co, d)
    assert lo == 4 * rh2 * rw2, (lo, rh2, rw2)
    zb = zpack
    nzb = d // zb
    kmat = jnp.concatenate(
        [kout.T, bias.astype(kout.dtype).reshape(1, co)], axis=0
    )

    def row(arr_c):
        return pl.BlockSpec(
            (pl.Element(1), pl.Element(zb), pl.Element(arr_c), pl.Element(lo)),
            lambda gg, zz, wi: (wi * g + gg, DPAD + zz * zb, 0, 0),
        )

    ab_spec = pl.BlockSpec((1, c, 1), lambda gg, zz, wi: (wi * g + gg, 0, 0))
    out_spec = pl.BlockSpec(
        (1, 1, 4, rh2, wp_half, zb * co),
        lambda gg, zz, wi: (gg, zz, 0, 0, 0, 0),
    )
    out = pl.pallas_call(
        functools.partial(
            _outhead_row_kernel,
            zb=zb, n_w=n_w, rh2=rh2, rw2=rw2, w_starts2=w_starts2,
            compute_dtype=kout.dtype,
        ),
        grid=(g, nzb, n_w),
        in_specs=[
            row(c), row(c), ab_spec, ab_spec, ab_spec, ab_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            row(1),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(
            (g, nzb, 4, rh2, wp_half, zb * co), out_dtype
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(z, res, az, bz, ar, br, kmat, scale)
    return out.reshape(g, nzb, 4, rh2, wp_half * zb * co)


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
    # Emit the einsum in the dot-natural index order and CAST TO bf16 BEFORE
    # the (d,i)/(h,j)/(w,l) interleave transpose: the zip is a lane-level
    # relayout copy XLA runs at ~125 GB/s (round-3c trace, fusion.2008 +
    # copy.965/.966/.968 ~= 68 ms/vol at dec3) — halving its bytes halves it.
    T = jnp.einsum(
        "bdhwc,ijlkc->bdhwijlk", t, kern.astype(t.dtype),
        preferred_element_type=jnp.float32,
    )
    T = (T + bias[None, None, None, None, None, None, None, :]).astype(dtype)
    T = T.transpose(0, 1, 4, 7, 2, 5, 3, 6)  # -> (b, d, i, k, h, j, w, l)
    T = T.reshape(b, s2, co, s2, s2)
    if _compact(s2, s2):
        T = T.reshape(b, s2, co, s2 * s2)
    else:
        wp = _wp(s2)
        T = jnp.pad(T, ((0, 0), (0, 0), (0, 0), (0, 0), (1, wp - s2 - 1)))
        T = T.reshape(b, s2, co, s2 * wp)
    return jnp.pad(T, ((0, 0), (DPAD, DPAD), (0, 0), (0, 0)))


def convt_expand_pp(
    t_of: jax.Array,  # (B, S, C_in, S*S) low-res COMPACT of-form
    convt_params: dict,  # {"kernel": (2,2,2,CO,CI), "bias": (CO,)}
    dtype,
) -> jax.Array:
    """ConvTranspose(k=2, s=2) straight into the PARITY-PLANE layout:
    output (B, 2S, CO, 4*S*S) where plane (j, l) of slice z=2d+i is the
    (i, j, l) filter tap of input slice d — a pure matmul output slice.

    One stacked dot ((8*CO, CI) x (CI, S*S) per (b, d)) plus ONE
    major-dims-only transpose; no interleaved-lane relayout at all (the
    compact-convention einsum+pad+copy chain cost ~8 ms/batch in the
    round-2 SWI trace). Input is the 48^3 decoder's native of-form output,
    so the NDHWC round-trip disappears too."""
    b, sp, ci, seg = t_of.shape
    s = sp - 2 * DPAD
    t_of = t_of[:, DPAD : DPAD + s]  # drop guard rows (garbage would poison)
    kern = convt_params["kernel"]  # (2, 2, 2, CO, CI) torch orientation
    bias = convt_params["bias"]
    co = kern.shape[3]
    k8 = kern.reshape(8 * co, ci).astype(t_of.dtype)  # rows (i, j, l, co)
    b8 = jnp.tile(bias.astype(jnp.float32), 8)  # co fastest, like k8's rows
    m = jnp.einsum(
        "tc,bdcl->btdl", k8, t_of, preferred_element_type=jnp.float32
    )  # (B, 8CO, S, SEG) — lanes untouched, major-dims transpose only
    m = m + b8[None, :, None, None]
    m = m.reshape(b, 2, 4, co, s, seg)  # (B, i, (j,l), CO, S, SEG)
    m = m.transpose(0, 4, 1, 3, 2, 5)  # (B, S, i, CO, (j,l), SEG)
    out = m.reshape(b, 2 * s, co, 4 * seg).astype(dtype)
    return jnp.pad(out, ((0, 0), (DPAD, DPAD), (0, 0), (0, 0)))


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
