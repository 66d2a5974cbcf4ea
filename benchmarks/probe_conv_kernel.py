"""Attribute the conv_of kernel's time: DMA (3 halo streams) vs VPU stencil
vs MXU matmul.

Variants of a stripped conv3x3x3 (C=CO=16, 8x96^3, z-pair matmul shape,
compact lanes) differing ONLY in streams/stencil/matmul:

  full      3 z-streams + stencil + matmul   (== production structure)
  1stream   1 z-stream  + stencil + matmul   (wrong halo numerics, same work)
  nostencil 3 z-streams + copy    + matmul   (no rolls/masks)
  floor     1 z-stream  + copy    + matmul   (DMA + MXU only)
  nomatmul  3 z-streams + stencil + reduce   (no MXU)

Production reference: conv3x3x3_of itself.
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

from medseg.kernels.conv3d import weight_matrix  # noqa: E402
from medseg.kernels.conv_of import (  # noqa: E402
    _COMPILER_PARAMS,
    _conv_core,
    _sel_rows,
    _zvalid,
    conv3x3x3_of,
)

B, D, C, H, W = 8, 96, 16, 96, 96
LO = H * W
ZB = 4
NZB = D // ZB


def sync1(x):
    return float(np.asarray(jax.lax.slice(x.reshape(-1), (0,), (1,)))[0])


def _kernel(x0, x1, x2, w_ref, o_ref, *, streams, stencil, matmul):
    zblk = pl.program_id(1)
    if streams == 3:
        sel = _sel_rows(x0, x1, x2, ZB).astype(jnp.float32)
    else:
        raw = jnp.concatenate([x0[0], x0[0][: 2 * ZB + 1 - ZB]], axis=0)
        sel = jax.lax.slice_in_dim(raw, 0, ZB + 2, axis=0)
    sel = jnp.where(_zvalid(zblk, ZB, D, C, LO), sel, 0.0).astype(jnp.bfloat16)
    if stencil and matmul:
        out, _, _ = _conv_core(
            sel, w_ref, C, C, ZB, LO, W, W, jnp.bfloat16, False
        )
        o_ref[...] = out.astype(o_ref.dtype)[None]
    elif matmul:
        # copy-patches: K rows are plain repeats of the center rows
        center = jnp.concatenate([sel[j + 1] for j in range(ZB)], axis=-1)
        patches = jnp.concatenate([center] * 9, axis=0)  # (9C, ZB*LO)
        m = jnp.dot(
            w_ref[: 3 * C, : 9 * C], patches, preferred_element_type=jnp.float32
        )
        acc = sum(
            jax.lax.slice(m, (dx * C, 0), ((dx + 1) * C, ZB * LO))
            for dx in range(3)
        )
        o_ref[...] = jnp.stack(
            [
                jax.lax.slice(acc, (0, j * LO), (C, (j + 1) * LO))
                for j in range(ZB)
            ]
        ).astype(o_ref.dtype)[None]
    else:
        # stencil only, reduce instead of matmul
        from medseg.kernels.conv_of import _dz_bases, _stencil9

        bases = _dz_bases(sel, ZB, LO)
        patches = _stencil9(bases, C, ZB, LO, W, jnp.bfloat16, False)
        red = jnp.sum(patches.astype(jnp.float32), axis=0, keepdims=True)
        o_ref[...] = jnp.broadcast_to(
            red[:, : ZB * LO].reshape(1, ZB, 1, LO), (1, ZB, C, LO)
        ).astype(o_ref.dtype)


def make_variant(streams, stencil, matmul):
    def row_spec(k):
        return pl.BlockSpec(
            (1, ZB, C, LO),
            lambda bb, z, k=k: (bb, jnp.clip(z - 1 + k, 0, NZB - 1), 0, 0),
        )

    kern = functools.partial(
        _kernel, streams=streams, stencil=stencil, matmul=matmul
    )

    @jax.jit
    def run(x, wmat):
        return pl.pallas_call(
            kern,
            grid=(B, NZB),
            in_specs=[row_spec(0), row_spec(1), row_spec(2),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, ZB, C, LO), lambda bb, z: (bb, z, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, D, C, LO), jnp.bfloat16),
            compiler_params=_COMPILER_PARAMS,
        )(x, x, x, wmat)

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
    print(f"{name:<34s} {dt*1e3:7.2f} ms", flush=True)
    return dt


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    x = (0.1 * jax.random.normal(jax.random.key(0), (B, D, C, LO))).astype(jnp.bfloat16)
    kern3 = 0.1 * jax.random.normal(jax.random.key(1), (3, 3, 3, C, C), jnp.float32)
    wmat = weight_matrix(kern3, jnp.bfloat16)  # (3C, 9C)
    from medseg.kernels.conv_of import weight_matrix_pair

    wpair = weight_matrix_pair(wmat)  # (6C, 12C) — _conv_core uses pair mode

    a = jnp.zeros((B, C, 1), jnp.float32)
    bench("production conv3x3x3_of", lambda: conv3x3x3_of(
        x, wmat, a, a, h=H, w=W, input_act="none", out_dtype=jnp.bfloat16)[0])

    bench("replica full (3s+stencil+mm)", make_variant(3, True, True), x, wpair)
    bench("replica 1stream (+stencil+mm)", make_variant(1, True, True), x, wpair)
    bench("replica nostencil (3s+mm)", make_variant(3, False, True), x, wpair)
    bench("replica floor (1s+mm)", make_variant(1, False, True), x, wpair)
    bench("replica nomatmul (3s+stencil)", make_variant(3, True, False), x, wpair)


if __name__ == "__main__":
    main()
