"""Per-stage attribution INSIDE the fused full-res chain (19.1 ms of the
26.7 ms batch-8 model call): conv1 (C=1), conv2 (16->16), convt expand,
combine (32->16 + res), z2 conv, outhead, form conversions, stats math.

Each stage is benched standalone with 30 sequential dispatches (relay RTT
amortizes via queueing); cross-check the sum against the chained whole.
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

from medseg.kernels import conv_of  # noqa: E402
from medseg.kernels.conv3d import weight_matrix  # noqa: E402
from medseg.kernels.conv_of import (  # noqa: E402
    conv3x3x3_of,
    conv3x3x3_of_combine,
    convt_expand_of,
    from_output_form,
    outhead_of,
    res_weight,
    to_output_form,
)

B, S = (int(sys.argv[1]) if len(sys.argv) > 1 else 8), 96
C = 16
LO = S * S
K = 14


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


def main():
    print(f"devices: {jax.devices()}  B={B}", file=sys.stderr, flush=True)
    key = jax.random.key(0)
    x = 0.3 + 0.1 * jax.random.normal(key, (B, S, S, S, 1), jnp.float32)
    x_of1 = to_output_form(x.astype(jnp.bfloat16), jnp.bfloat16)  # C=1
    y = (0.1 * jax.random.normal(key, (B, S + 2, C, LO))).astype(jnp.bfloat16)
    dec1 = 0.1 * jax.random.normal(key, (B, S // 2, S // 2, S // 2, 2 * C), jnp.bfloat16)
    k1 = 0.1 * jax.random.normal(key, (3, 3, 3, 1, C), jnp.float32)
    k16 = 0.1 * jax.random.normal(key, (3, 3, 3, C, C), jnp.float32)
    k32 = 0.1 * jax.random.normal(key, (3, 3, 3, 2 * C, C), jnp.float32)
    kt = {
        "kernel": 0.1 * jax.random.normal(key, (2, 2, 2, C, 2 * C), jnp.float32),
        "bias": jnp.zeros((C,), jnp.float32),
    }
    kres = 0.1 * jax.random.normal(key, (1, 1, 1, 2 * C, C), jnp.float32)
    w1 = weight_matrix(k1, jnp.bfloat16)
    w16 = weight_matrix(k16, jnp.bfloat16)
    w32 = weight_matrix(k32, jnp.bfloat16)
    wres = res_weight(kres, jnp.bfloat16)
    a1 = jnp.zeros((B, 1, 1), jnp.float32)
    a16 = jnp.ones((B, C, 1), jnp.float32)
    b16 = jnp.zeros((B, C, 1), jnp.float32)
    a32 = jnp.ones((B, 2 * C, 1), jnp.float32)
    ko = jnp.zeros((C, C), jnp.bfloat16)
    bo = jnp.zeros((C, 1), jnp.float32)
    up_of = jax.jit(lambda d: convt_expand_of(d, kt, jnp.bfloat16))(dec1)

    bench("to_output_form (C=1 input)", jax.jit(
        lambda xx: to_output_form(xx.astype(jnp.bfloat16), jnp.bfloat16)), x)
    bench("conv1 C=1->16", lambda: conv3x3x3_of(
        x_of1, w1, a1, a1, h=S, w=S, input_act="none", out_dtype=jnp.bfloat16)[0])
    bench("conv2 16->16 affine_leaky", lambda: conv3x3x3_of(
        y, w16, a16, b16, h=S, w=S, input_act="affine_leaky", out_dtype=jnp.bfloat16)[0])
    bench("conv 16->16 no-act", lambda: conv3x3x3_of(
        y, w16, a16, b16, h=S, w=S, input_act="none", out_dtype=jnp.bfloat16)[0])
    bench("convt_expand_of (48^3x32 -> 96^3x16)", jax.jit(
        lambda d: convt_expand_of(d, kt, jnp.bfloat16)), dec1)
    bench("combine 32->16 (+res)", lambda: conv3x3x3_of_combine(
        up_of, y, x_of1, a16, b16, a16, b16, w32, wres, h=S, w=S,
        out_dtype=jnp.bfloat16)[0])
    bench("outhead", lambda: outhead_of(
        y, y, a16, b16, a16, b16, ko, bo, out_dtype=jnp.float32))
    logits_of = outhead_of(y, y, a16, b16, a16, b16, ko, bo, out_dtype=jnp.float32)
    bench("from_output_form (fp32 out)", jax.jit(  # outhead out is unpadded
        lambda o: from_output_form(o, S, S, dpad=0)), logits_of)


if __name__ == "__main__":
    main()
