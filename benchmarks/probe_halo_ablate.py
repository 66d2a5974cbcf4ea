"""Attribute the single-stream halo conv kernel's time (zb=8, C=16, 8x96^3):
DMA floor vs stencil build (bases concat + dy rolls) vs matmul vs fp32
dx-combine/stack epilogue. Variants replicate the production structure from
medseg/kernels/conv_of.py, differing in exactly one stage:

  prod       conv3x3x3_of itself
  copy       halo window in -> center rows out (DMA floor)
  nostencil  bases = unrolled dup-concat (no dy rolls/masks)
  nodx       matmul out: take first CO rows, no rolls/adds/stack
  bf16dx     full structure, but m cast to bf16 before dx rolls+adds
  bf16mm     matmul emits bf16 (preferred_element_type), bf16 epilogue
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_medseg"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import medseg.kernels.conv_of as conv_of  # noqa: E402
from medseg.kernels.conv3d import weight_matrix  # noqa: E402
from medseg.kernels.conv_of import (  # noqa: E402
    _COMPILER_PARAMS,
    _dx_combine,
    _halo_spec,
    _padded_out_spec,
    _roll_lanes,
    _stack_z,
    _zvalid,
    weight_matrix_pair,
)

B, D, C, H, W = 8, 96, 16, 96, 96
LO = H * W
ZB = 8
NZB = D // ZB
NP = ZB // 2


def sync1(x):
    return float(np.asarray(jax.lax.slice(x.reshape(-1), (0,), (1,)))[0])


def _kernel(xh, w_ref, o_ref, *, mode):
    zblk = pl.program_id(1)
    sel = xh[0].astype(jnp.float32)
    sel = jnp.where(_zvalid(zblk, ZB, D, C, LO), sel, 0.0)
    sel = sel.astype(jnp.bfloat16)

    if mode == "copy":
        o_ref[...] = jnp.stack([sel[j + 1] for j in range(ZB)])[None].astype(o_ref.dtype)
        return

    # pair-mode bases (C, NP*LO) x 4 z-row positions
    bases = [
        jnp.concatenate([sel[2 * p + t] for p in range(NP)], axis=-1)
        for t in range(4)
    ]
    width = NP * LO
    lane = jax.lax.broadcasted_iota(jnp.int32, (C, width), 1)
    seg_lane = lane % LO
    pieces = []
    for base in bases:
        if mode == "nostencil":
            pieces.extend([base, base, base])
            continue
        down = _roll_lanes(base, W, False)
        down = jnp.where(seg_lane >= W, down, jnp.zeros_like(base))
        up = _roll_lanes(base, width - W, False)
        up = jnp.where(seg_lane < LO - W, up, jnp.zeros_like(base))
        pieces.extend([down, base, up])
    patches = jnp.concatenate(pieces, axis=0).astype(jnp.bfloat16)

    ptype = jnp.bfloat16 if mode == "bf16mm" else jnp.float32
    m = jnp.dot(w_ref[...], patches, preferred_element_type=ptype)

    if mode == "nodx":
        # first CO rows of block q, stacked as ZB slices (no rolls/adds)
        parts = [
            jax.lax.slice(m, (q * 3 * C, 0), (q * 3 * C + C, width)) for q in range(2)
        ]
        out = jnp.stack(
            [
                jax.lax.slice(parts[j % 2], (0, (j // 2) * LO), (C, (j // 2 + 1) * LO))
                for j in range(ZB)
            ]
        )
        o_ref[...] = out[None].astype(o_ref.dtype)
        return

    if mode in ("bf16dx", "bf16mm"):
        m = m.astype(jnp.bfloat16)

    def dx_combine(m3):
        zlo = NP * LO
        out_lane = jax.lax.broadcasted_iota(jnp.int32, (C, zlo), 1)
        xpos = out_lane % W
        acc = None
        for dx in range(3):
            mm = jax.lax.slice(m3, (dx * C, 0), ((dx + 1) * C, zlo))
            sh = (zlo - (dx - 1)) % zlo
            if sh:
                mm = _roll_lanes(mm, sh, False)
            if dx == 0:
                mm = jnp.where(xpos == 0, 0.0, mm).astype(m3.dtype)
            elif dx == 2:
                mm = jnp.where(xpos == W - 1, 0.0, mm).astype(m3.dtype)
            acc = mm if acc is None else acc + mm
        return acc

    parts = [
        dx_combine(jax.lax.slice(m, (q * 3 * C, 0), ((q + 1) * 3 * C, width)))
        for q in range(2)
    ]
    out = jnp.stack(
        [
            jax.lax.slice(parts[j % 2], (0, (j // 2) * LO), (C, (j // 2 + 1) * LO))
            for j in range(ZB)
        ]
    )
    o_ref[...] = out[None].astype(o_ref.dtype)


def make_variant(mode):
    kern = functools.partial(_kernel, mode=mode)

    @jax.jit
    def run(x, wmat):
        return pl.pallas_call(
            kern,
            grid=(B, NZB),
            in_specs=[
                _halo_spec(ZB, C, LO),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=_padded_out_spec(ZB, C, LO),
            out_shape=jax.ShapeDtypeStruct((B, D + 2, C, LO), jnp.bfloat16),
            compiler_params=_COMPILER_PARAMS,
        )(x, wmat)

    return run


def bench(name, fn, *args, reps=30):
    out = fn(*args)
    sync1(out[0] if isinstance(out, (tuple, list)) else out)
    t0 = time.perf_counter()
    o = None
    for _ in range(reps):
        o = fn(*args)
    sync1(o[0] if isinstance(o, (tuple, list)) else o)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:<40s} {dt*1e3:7.2f} ms", flush=True)
    return dt


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    x = (0.1 * jax.random.normal(jax.random.key(0), (B, D + 2, C, LO))).astype(jnp.bfloat16)
    kern3 = 0.1 * jax.random.normal(jax.random.key(1), (3, 3, 3, C, C), jnp.float32)
    wmat = weight_matrix(kern3, jnp.bfloat16)
    wpair = weight_matrix_pair(wmat)
    a = jnp.zeros((B, C, 1), jnp.float32)

    bench("production conv3x3x3_of", lambda: conv_of.conv3x3x3_of(
        x, wmat, a, a, h=H, w=W, input_act="none", out_dtype=jnp.bfloat16)[0])
    full = make_variant("full")
    bf16dx = make_variant("bf16dx")
    bf16mm = make_variant("bf16mm")
    bench("replica full", full, x, wpair)
    bench("replica copy (DMA floor)", make_variant("copy"), x, wpair)
    bench("replica nostencil (no dy rolls)", make_variant("nostencil"), x, wpair)
    bench("replica nodx (no dx epilogue)", make_variant("nodx"), x, wpair)
    bench("replica bf16dx", bf16dx, x, wpair)
    # bf16mm rejected: Mosaic requires 32-bit matmul accumulators
    # ('tpu.matmul op Expected matmul acc to be 32-bit').

    # numerics: bf16 epilogue vs fp32 epilogue
    ref = np.asarray(full(x, wpair), np.float32)
    for nm, fn in (("bf16dx", bf16dx),):
        got = np.asarray(fn(x, wpair), np.float32)
        err = np.abs(got[:, 1:-1] - ref[:, 1:-1]).max()
        rel = err / max(np.abs(ref[:, 1:-1]).max(), 1e-9)
        print(f"{nm} vs fp32 epilogue: max abs {err:.3e} rel {rel:.3e}", flush=True)


if __name__ == "__main__":
    main()
