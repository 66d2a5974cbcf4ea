"""HBM bandwidth probe: pure-stream XLA ops on inference-shaped tensors.

Establishes the per-pass bandwidth ceiling the fused kernels should be
compared against (v5e spec: 819 GB/s).

Usage: python -m benchmarks.probe_bw
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

K = 10


def sync1(x):
    flat = x.ravel() if x.ndim else x
    return float(np.asarray(jax.lax.slice(flat, (0,), (1,)))[0])


def chain_bench(name, stage_fn, gbytes, *args):
    def loop(*a):
        first, rest = a[0], a[1:]

        def body(carry, _):
            out = stage_fn(carry, *rest)
            leaf = jax.tree_util.tree_leaves(out)[0]
            probe = (0.0 * leaf.ravel()[0]).astype(carry.dtype)
            return carry + probe, ()

        final, _ = jax.lax.scan(body, first, None, length=K)
        return final

    fn = jax.jit(loop)
    sync1(fn(*args))
    t0 = time.perf_counter()
    sync1(fn(*args))
    ms = (time.perf_counter() - t0) / K * 1e3
    print(f"{name:<52s} {ms:8.2f} ms  {gbytes / (ms / 1e3):7.0f} GB/s")
    return ms


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    key = jax.random.key(0)
    # output-form shaped bf16 (8, 96, 16, 12288) = 226 MB
    a = jax.random.normal(key, (8, 96, 16, 12288), jnp.bfloat16)
    b = jax.random.normal(jax.random.key(1), (8, 96, 16, 12288), jnp.bfloat16)
    gb = a.size * 2 / 1e9

    chain_bench("bf16 x+1 (read+write 0.45GB)", lambda t: t + 1, 2 * gb, a)
    chain_bench("bf16 x+y (2 reads+write 0.68GB)", lambda t, u: t + u, 3 * gb, a, b)
    chain_bench("bf16->fp32 math->bf16 (leaky(ax+b))",
                lambda t: jnp.where(t.astype(jnp.float32) * 1.01 + 0.1 >= 0,
                                    t.astype(jnp.float32) * 1.01 + 0.1,
                                    0.01 * (t.astype(jnp.float32) * 1.01 + 0.1)).astype(jnp.bfloat16),
                2 * gb, a)
    # big flat copy
    flat = jax.random.normal(key, (128, 1024, 1024), jnp.bfloat16)  # 268MB
    gbf = flat.size * 2 / 1e9
    chain_bench("bf16 x+1 flat (128,1024,1024)", lambda t: t + 1, 2 * gbf, flat)
    # fp32 variant
    af = a.astype(jnp.float32)
    chain_bench("fp32 x+1 (read+write 0.9GB)", lambda t: t + 1, 2 * a.size * 4 / 1e9, af)
    # transpose minor dim (the to_output_form pattern)
    nd = jax.random.normal(key, (8, 96, 96, 96, 16), jnp.bfloat16)
    chain_bench("transpose NDHWC->NDCHW (0.45GB)",
                lambda t: t.transpose(0, 1, 4, 2, 3), 2 * nd.size * 2 / 1e9, nd)
    # reduction
    chain_bench("sum over all (read 0.23GB)", lambda t: t.astype(jnp.float32).sum(), gb, a)
    # matmul sanity: bf16 (4096x4096)@(4096x4096)
    m = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
    ms = chain_bench("matmul 4096^3 bf16 (137 GFLOP)", lambda t, u: t @ u, 3 * m.size * 2 / 1e9, m, m)
    print(f"matmul: {2 * 4096**3 / (ms / 1e3) / 1e12:.1f} TF/s", file=sys.stderr)


if __name__ == "__main__":
    main()
