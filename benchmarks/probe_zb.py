"""The conv_of kernel is DMA-bound at ~194 GB/s effective (the retired
3-stream ablation probe measured every variant at 2.3-2.5 ms for 452MB of
in+out traffic; its successor is benchmarks/probe_halo_ablate.py). Probe
whether bigger z-blocks (fewer, larger DMA transfers) lift effective
bandwidth, plus a half-size run to detect fixed per-call overhead.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_medseg"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import medseg.kernels.conv_of as conv_of  # noqa: E402
from medseg.kernels.conv3d import weight_matrix  # noqa: E402

B, D, C, H, W = 8, 96, 16, 96, 96
LO = H * W


def sync1(x):
    return float(np.asarray(jax.lax.slice(x.reshape(-1), (0,), (1,)))[0])


def bench(name, fn, *args, reps=30):
    out = fn(*args)
    sync1(out[0] if isinstance(out, (tuple, list)) else out)
    t0 = time.perf_counter()
    o = None
    for _ in range(reps):
        o = fn(*args)
    sync1(o[0] if isinstance(o, (tuple, list)) else o)
    dt = (time.perf_counter() - t0) / reps
    gbps = (2 * B * D * C * LO * 2) / dt / 1e9
    print(f"{name:<40s} {dt*1e3:7.2f} ms   {gbps:6.0f} GB/s eff", flush=True)
    return dt


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    x = (0.1 * jax.random.normal(jax.random.key(0), (B, D + 2, C, LO))).astype(jnp.bfloat16)
    kern3 = 0.1 * jax.random.normal(jax.random.key(1), (3, 3, 3, C, C), jnp.float32)
    wmat = weight_matrix(kern3, jnp.bfloat16)
    a = jnp.zeros((B, C, 1), jnp.float32)

    orig = conv_of._zb_for
    for zb in (4, 8, 12, 16):
        conv_of._zb_for = lambda d, c, zb=zb: zb if d % zb == 0 else orig(d, c)
        conv_of.conv3x3x3_of.clear_cache() if hasattr(conv_of.conv3x3x3_of, "clear_cache") else None
        try:
            bench(f"conv 16->16 zb={zb}", lambda: conv_of.conv3x3x3_of(
                x, wmat, a, a, h=H, w=W, input_act="none", out_dtype=jnp.bfloat16)[0])
        except Exception as e:
            print(f"zb={zb} failed: {str(e)[:150]}", flush=True)
    conv_of._zb_for = orig

    # half-batch: fixed-overhead detection (expect ~half the time if BW-bound)
    xh = x[:4]
    ah = a[:4]
    bench("conv 16->16 zb=4 HALF batch", lambda: conv_of.conv3x3x3_of(
        xh, wmat, ah, ah, h=H, w=W, input_act="none", out_dtype=jnp.bfloat16)[0],
    )


if __name__ == "__main__":
    main()
