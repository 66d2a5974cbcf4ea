"""Attribute conv3x3x3 backward cost at the training shape (4x96^3, 16ch):
current fp32 jax.vjp bwd vs bf16 data-grad conv + bf16 filter-grad conv.
Validates the filter-grad dimension_numbers against the vjp oracle.
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

from medseg.kernels.conv3d import _xla_conv  # noqa: E402

B, S, CI, CO = 4, 96, 16, 16


def sync1(x):
    return float(np.asarray(jax.lax.slice(x.reshape(-1), (0, ), (1, )))[0])


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    sync1(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync1(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:<46s} {dt:7.2f} ms", flush=True)


def bwd_fp32(x, kernel, g):
    _, vjp = jax.vjp(_xla_conv, x.astype(jnp.float32), kernel.astype(jnp.float32))
    dx, dk = vjp(g.astype(jnp.float32))
    return dx.astype(x.dtype), dk


def dx_bf16(g, kernel):
    kflip = jnp.flip(kernel, axis=(0, 1, 2)).swapaxes(3, 4)
    return jax.lax.conv_general_dilated(
        g.astype(jnp.bfloat16), kflip.astype(jnp.bfloat16), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )


def dk_bf16(x, g):
    # dk[kd,kh,kw,ci,co] = sum_{b,z,y,x} x[b,z+kd-1,...,ci] g[b,z,...,co]
    # lhs = x with (batch<->feature swapped): N=CI, C=B; rhs = g as kernel
    # with spatial = whole volume, I=B, O=CO; padding 1 -> 3^3 output.
    return jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16),
        g.astype(jnp.bfloat16),
        window_strides=(1, 1, 1),
        padding=[(1, 1)] * 3,
        dimension_numbers=("CDHWN", "IDHWO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    kx, kk, kg = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(kx, (B, S, S, S, CI), jnp.bfloat16)
    kernel = jax.random.normal(kk, (3, 3, 3, CI, CO), jnp.float32) * 0.1
    g = jax.random.normal(kg, (B, S, S, S, CO), jnp.bfloat16)

    fwd = jax.jit(lambda: _xla_conv(x, kernel.astype(jnp.bfloat16)))
    timeit("fwd conv bf16 (XLA)", fwd)
    fwd32 = jax.jit(lambda: _xla_conv(x.astype(jnp.float32), kernel))
    timeit("fwd conv fp32 (XLA)", fwd32)

    cur = jax.jit(lambda: bwd_fp32(x, kernel, g))
    timeit("current bwd (fp32 vjp: dx+dk)", cur)

    dxf = jax.jit(lambda: dx_bf16(g, kernel))
    timeit("dx bf16 conv", dxf)

    # filter grad via explicit conv; check against oracle first
    try:
        dkf = jax.jit(lambda: dk_bf16(x, g))
        got = np.asarray(dkf())
        _, dk_ref = cur()
        ref = np.asarray(dk_ref)
        got_t = got.transpose(1, 2, 3, 0, 4)  # (CI,3,3,3,CO) -> (3,3,3,CI,CO)
        print("dk shapes", got.shape, ref.shape, file=sys.stderr)
        err = np.abs(got_t - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"dk_bf16 rel err vs fp32 oracle: {err:.4f}", flush=True)
        timeit("dk bf16 conv", dkf)
    except Exception as e:
        print(f"dk_bf16 failed: {str(e)[:300]}", flush=True)

    # bf16 vjp wholesale (let XLA derive both, bf16 in/out)
    def bwd_b16(xx, kk_, gg):
        _, vjp = jax.vjp(
            lambda aa, bb: jax.lax.conv_general_dilated(
                aa, bb, (1, 1, 1), [(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            ),
            xx.astype(jnp.bfloat16), kk_.astype(jnp.bfloat16),
        )
        return vjp(gg.astype(jnp.bfloat16))
    b16 = jax.jit(lambda: bwd_b16(x, kernel, g))
    timeit("bwd bf16 vjp (dx+dk)", b16)
    dx_a, dk_a = cur()
    dx_b, dk_b = b16()
    for n, aa, bb in (("dx", dx_a, dx_b), ("dk", dk_a, dk_b)):
        aa, bb = np.asarray(aa, np.float32), np.asarray(bb, np.float32)
        err = np.abs(aa - bb).max() / (np.abs(aa).max() + 1e-9)
        print(f"bf16 vjp {n} rel err: {err:.4f}", flush=True)


if __name__ == "__main__":
    main()
