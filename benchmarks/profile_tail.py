"""Micro-timing of the fused full-res tail's components (8x96^3, bf16).

Separates the conv_of Pallas kernels from the XLA glue (layout conversions,
transpose-conv, fp32 combine passes, out head) to find where the tail's
52.7 ms (benchmarks/profile_stages.py) actually goes.

Usage: python -m benchmarks.profile_tail [batch] [size]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
S = int(sys.argv[2]) if len(sys.argv) > 2 else 96
K = 10


def sync1(x):
    flat = x.ravel() if x.ndim else x
    return float(np.asarray(jax.lax.slice(flat, (0,), (1,)))[0])


def chain_bench(name, stage_fn, *args):
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
    print(f"{name:<46s} {ms:8.2f} ms")
    return ms


def main():
    from medseg.kernels.conv3d import _xla_conv, weight_matrix
    from medseg.kernels.conv_of import conv3x3x3_of, res_weight, to_output_form, from_output_form
    from medseg.kernels import unetr_of
    from medseg.models.blocks import ConvTranspose3d
    from medseg.models.unetr import unetr_b16

    print(f"devices: {jax.devices()}  batch={B} size={S}^3  K={K}", file=sys.stderr)
    dt = jnp.bfloat16
    fs = 16
    model = unetr_b16(in_channels=1, out_channels=14, crop_size=S, dtype=dt)
    x = 0.3 + 0.1 * jax.random.normal(jax.random.key(1), (B, S, S, S, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x)
    p = params["params"]
    e1 = p["encoder1"]["layer"]
    d2 = p["decoder2"]["conv_block"]

    key = jax.random.key(2)
    lo = S * ((S // 128 + 1) * 128 if S % 128 else S)
    # representative tensors
    y_of16 = jax.random.normal(key, (B, S, fs, lo), dt)  # 16-ch output-form
    y_of32 = jax.random.normal(key, (B, S, 2 * fs, lo), dt)
    a16 = jnp.ones((B, fs, 1), jnp.float32)
    b16 = jnp.zeros((B, fs, 1), jnp.float32)
    a32 = jnp.ones((B, 2 * fs, 1), jnp.float32)
    b32 = jnp.zeros((B, 2 * fs, 1), jnp.float32)
    w16 = weight_matrix(e1["conv2"]["conv"]["kernel"], dt)  # (48, 144)
    w32 = weight_matrix(d2["conv1"]["conv"]["kernel"], dt)  # (48, 288)
    wres = res_weight(d2["conv3"]["conv"]["kernel"], dt)
    dec1 = jax.random.normal(key, (B, S // 2, S // 2, S // 2, 2 * fs), dt)
    ndhwc16 = jax.random.normal(key, (B, S, S, S, fs), dt)

    chain_bench("conv_of 16->16 (affine_leaky)",
                lambda t, w, a, bb: conv3x3x3_of(t, w, a, bb, h=S, w=S,
                                                 input_act="affine_leaky", out_dtype=dt)[0],
                y_of16, w16, a16, b16)
    chain_bench("conv_of 32->16 +residual (none)",
                lambda t, w, a, bb, wr: conv3x3x3_of(t, w, a, bb, wr, h=S, w=S,
                                                     input_act="none", residual=True,
                                                     out_dtype=dt)[0],
                y_of32, w32, a32, b32, wres)
    chain_bench("xla conv1 (1->16 NDHWC)",
                lambda t, w: _xla_conv(t.astype(dt), w.astype(dt)),
                x, e1["conv1"]["conv"]["kernel"])
    chain_bench("convtranspose (48^3 32 -> 96^3 16)",
                lambda t, pp: ConvTranspose3d(fs, dtype=dt).apply(
                    {"params": {"convt": pp}}, t),
                dec1, p["decoder2"]["transp_conv"]["convt"])
    chain_bench("to_output_form 16ch", lambda t: to_output_form(t, dt), ndhwc16)
    chain_bench("from_output_form 16ch", lambda t: from_output_form(t, S, S), y_of16)

    def combine(t, u):
        out = unetr_of._leaky(
            1.01 * t.astype(jnp.float32) + 0.1 + 0.99 * u.astype(jnp.float32) - 0.1)
        return out.astype(dt)

    chain_bench("fp32 combine pass (2 reads + write, 16ch)", combine, y_of16, y_of16)

    def outhead(t, kk, bb):
        logits_of = jnp.einsum("bdcl,ck->bdkl", t, kk, preferred_element_type=jnp.float32)
        logits_of = logits_of + bb[None, None, :, None]
        return from_output_form(logits_of, S, S).astype(dt)

    chain_bench("out head einsum (16->14) + from_of",
                outhead, y_of16, p["out"]["conv"]["kernel"][0, 0, 0].astype(dt),
                p["out"]["conv"]["bias"])

    def concat(t, u):
        return jnp.concatenate([t, u], axis=2)

    chain_bench("concat 16+16ch output-form", concat, y_of16, y_of16)

    # stats-only epilogue cost: conv_of with vs without residual tap
    chain_bench("conv_of 32->16 (none, no residual)",
                lambda t, w, a, bb: conv3x3x3_of(t, w, a, bb, h=S, w=S,
                                                 input_act="none", out_dtype=dt)[0],
                y_of32, w32, a32, b32)


if __name__ == "__main__":
    main()
