"""Probe achievable matmul TF/s with REAL dependence chains.

The 0*out[0] probe trick is unsafe for pure-matmul micro-benches (XLA hoists
the loop-invariant matmul once the probe folds; apparent 585 TF/s > peak).
Here the carry IS the matmul output, so every rep must execute.
"""
import sys, time
import jax, jax.numpy as jnp
import os
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_medseg"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import numpy as np

K = 200

def sync1(x):
    return float(np.asarray(jax.lax.slice(x.ravel(), (0,), (1,))[0]))

def bench(name, f, x0, *rest, flops, k=K):
    """f(carry, *rest) -> same shape/dtype as carry."""
    def loop(c, *r):
        def body(c, _):
            return f(c, *r), ()
        fin, _ = jax.lax.scan(body, c, None, length=k)
        return fin
    fn = jax.jit(loop)
    sync1(fn(x0, *rest))
    t0 = time.perf_counter(); sync1(fn(x0, *rest)); dt = (time.perf_counter() - t0) / k
    unit = flops / dt / 1e12
    print(f"{name:<46s} {dt*1e3:8.3f} ms  {unit:7.2f} TF/s", flush=True)

def r(shape, dt=jnp.bfloat16, scale=0.01):
    return (scale * jax.random.normal(jax.random.key(0), shape)).astype(dt)

# pure big matmuls: carry = x @ y (square keeps shape)
for n in (2048, 4096, 8192):
    bench(f"matmul {n}^3 bf16", lambda x, y: (x @ y).astype(jnp.bfloat16),
          r((n, n)), r((n, n)), flops=2 * n**3, k=40 if n == 8192 else 200)

n = 4096
bench("matmul 4096 int8->int32->int8",
      lambda x, y: jnp.clip(jnp.dot(x, y, preferred_element_type=jnp.int32), -127, 127).astype(jnp.int8),
      jnp.ones((n, n), jnp.int8), jnp.ones((n, n), jnp.int8), flops=2 * n**3)

# vit-shaped: carry (M,768); y1 (768,3072), y2 (3072,768): two matmuls per rep
M = 8 * 216
bench(f"vit mlp pair ({M}x768x3072 + back)",
      lambda x, y1, y2: ((x @ y1) @ y2).astype(jnp.bfloat16),
      r((M, 768)), r((768, 3072)), r((3072, 768)), flops=2*M*768*3072*2)

# conv-shaped: carry (9C, LO); W (3CO,9C) with CO s.t. 3CO rows -> remap back
# to (9C, LO) via a second matmul with (9C, 3CO)
for c in (16, 32, 64):
    lo = 96 * 128
    co3 = 3 * c
    bench(f"conv-shape pair (({co3},{9*c})x({9*c},{lo}))x2",
          lambda x, w1, w2: jnp.dot(w2, jnp.dot(w1, x, preferred_element_type=jnp.float32).astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32).astype(jnp.bfloat16),
          r((9 * c, lo)), r((co3, 9 * c)), r((9 * c, co3)), flops=2*co3*9*c*lo*2)

# HBM: elementwise copy-scale of a big fp32 array (read+write)
for mb in (256,):
    n = mb * 1024 * 1024 // 4
    bench(f"hbm r+w {mb}MB fp32 x*1.01", lambda x: x * jnp.float32(1.01),
          jnp.ones((n,), jnp.float32), flops=1)
    # report GB/s for this one
