"""Isolate the conv_of DMA/compute serialization (round-3 kernel item).

Evidence so far (benchmarks/probe_halo_ablate.py): the 16->16 conv kernel at
batch 10 runs 3.71 ms vs a 2.21 ms pure-copy replica through the SAME
Element-halo BlockSpec structure — i.e. the kernel pays copy + compute nearly
SERIALIZED, and even the pure copy reaches only ~290 GB/s vs the chip's
measured ~530. Per grid step the numbers are ~15 us DMA + ~14 us MXU: if the
fetch of step z+1 overlapped the compute of step z, the kernel would run at
max(dma, mxu) ~= 1.9 ms instead of 3.7.

Variants measured here (all copy-only unless marked, (B=10, D+2*DPAD, 16,
9216) bf16, grid (b, nzb)):
  elem_halo     - current structure: pl.Element halo window in, padded write
  blocked       - plain Blocked specs, no halo (Mosaic's standard pipeline)
  manual_db     - input memory_space=ANY + VMEM scratch double buffer with
                  make_async_copy, output via normal BlockSpec
  conv_base     - the real conv3x3x3_of kernel (reference point)
  conv_manual   - conv compute fed by the manual double buffer

Usage: python benchmarks/probe_pipeline.py [batch] [zb]
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
from medseg.kernels import conv_of  # noqa: E402
from medseg.kernels.conv_of import DPAD, conv3x3x3_of  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 10
ZB = int(sys.argv[2]) if len(sys.argv) > 2 else 8
S = 96
C = 16
LO = S * S
_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def sync1(x):
    return float(np.asarray(jax.lax.slice(x.reshape(-1), (0,), (1,)))[0])


def bench(name, fn, *args, reps=30):
    out = fn(*args)
    sync1(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync1(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:<44s} {dt:7.2f} ms", flush=True)
    return dt


def make_elem_halo(d):
    nzb = d // ZB

    def kernel(xh, o_ref):
        o_ref[...] = xh[0, 1 : ZB + 1][None]

    return pl.pallas_call(
        kernel,
        grid=(B, nzb),
        in_specs=[conv_of._halo_spec(ZB, C, LO)],
        out_specs=conv_of._padded_out_spec(ZB, C, LO),
        out_shape=jax.ShapeDtypeStruct((B, d + 2 * DPAD, C, LO), jnp.bfloat16),
        compiler_params=_PARAMS,
    )


def make_blocked(d):
    nzb = d // ZB

    def kernel(xb, o_ref):
        o_ref[...] = xb[...]

    return pl.pallas_call(
        kernel,
        grid=(B, nzb),
        in_specs=[pl.BlockSpec((1, ZB, C, LO), lambda bb, z: (bb, z, 0, 0))],
        out_specs=pl.BlockSpec((1, ZB, C, LO), lambda bb, z: (bb, z, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, d, C, LO), jnp.bfloat16),
        compiler_params=_PARAMS,
    )


def _manual_db_body(x_hbm, o_ref, buf, sem, *, nzb, compute):
    win = conv_of._manual_window(x_hbm, buf, sem, ZB, nzb)
    o_ref[...] = compute(win)[None]


def make_manual_db(d, compute=None):
    nzb = d // ZB
    if compute is None:
        compute = lambda sel: sel[1 : ZB + 1]
    return pl.pallas_call(
        functools.partial(_manual_db_body, nzb=nzb, compute=compute),
        grid=(B, nzb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=conv_of._padded_out_spec(ZB, C, LO),
        out_shape=jax.ShapeDtypeStruct((B, d + 2 * DPAD, C, LO), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, ZB + 2, C, LO), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=_PARAMS,
    )


def main():
    print(f"devices: {jax.devices()}  B={B} ZB={ZB}", file=sys.stderr, flush=True)
    os.environ["MEDSEG_ZB16"] = str(ZB)
    key = jax.random.key(0)
    x = (0.1 * jax.random.normal(key, (B, S + 2 * DPAD, C, LO))).astype(jnp.bfloat16)
    k16 = 0.1 * jax.random.normal(key, (3, 3, 3, C, C), jnp.float32)
    w16 = weight_matrix(k16, jnp.bfloat16)
    a = jnp.ones((B, C, 1), jnp.float32)
    b = jnp.zeros((B, C, 1), jnp.float32)

    gbytes = (B * S * C * LO * 2) / 1e9  # payload (1x read, 1x write)

    t = bench("elem_halo copy", jax.jit(make_elem_halo(S)), x)
    print(f"    -> {(gbytes * (1 + (ZB + 2) / ZB)) / (t / 1e3):6.1f} GB/s eff")
    xb = x[:, DPAD : DPAD + S]
    t = bench("blocked copy", jax.jit(make_blocked(S)), xb)
    print(f"    -> {(gbytes * 2) / (t / 1e3):6.1f} GB/s eff")
    t = bench("manual_db copy", jax.jit(make_manual_db(S)), x)
    print(f"    -> {(gbytes * (1 + (ZB + 2) / ZB)) / (t / 1e3):6.1f} GB/s eff")

    def conv_base(xx):
        return conv3x3x3_of(
            xx, w16, a, b, h=S, w=S, input_act="affine_leaky",
            out_dtype=jnp.bfloat16,
        )[0]

    bench("conv_of 16->16 (current)", jax.jit(conv_base), x)

    w_use = conv_of.weight_matrix_pair(w16) if conv_of._pair_ok(ZB, C) else w16

    def conv_compute2(sel):
        selF = sel.astype(jnp.float32)
        selF = selF * a[0][None] + b[0][None]
        selF = jnp.where(selF >= 0, selF, 0.01 * selF)
        sel2 = selF.astype(jnp.bfloat16)
        # inline _conv_core with prepared weights
        out, _, _ = conv_of._conv_core(
            sel2, w_use, C, C, ZB, LO, S, S, jnp.bfloat16, False,
        )
        return out.astype(jnp.bfloat16)

    bench("conv manual_db (fetch-overlapped)", jax.jit(make_manual_db(S, conv_compute2)), x)


if __name__ == "__main__":
    main()
