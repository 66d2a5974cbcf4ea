"""Per-stage timing of the UNETR serving forward on TPU.

Times each component of the inference path with an in-jit ``lax.scan``
dependency chain (K repetitions of the stage, each consuming one element of
the previous output), synced by a 1-element fetch — the only reliable
device-time method through the axon relay (docs/PERF_NOTES.md: per-dispatch
RPC overhead pollutes independent-dispatch timing; block_until_ready does
not block).

Usage: python -m benchmarks.profile_stages [batch] [size]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
S = int(sys.argv[2]) if len(sys.argv) > 2 else 96
K = 10  # chained reps inside one jit


def sync1(x):
    """Fetch ONE element (device-side slice first) to drain the stream."""
    flat = x.ravel() if x.ndim else x
    return float(np.asarray(jax.lax.slice(flat, (0,), (1,))))


def chain_bench(name, stage_fn, *args):
    """stage_fn(*args) -> arbitrary pytree. Runs K chained reps in one jit:
    each rep adds a 0-weighted scalar from the previous output to the first
    array arg, forcing serialization without changing values."""

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
    out = fn(*args)
    sync1(out)  # compile + warm
    t0 = time.perf_counter()
    out = fn(*args)
    sync1(out)
    total = time.perf_counter() - t0
    ms = total / K * 1e3
    print(f"{name:<44s} {ms:8.2f} ms")
    return ms


def main():
    from medseg.kernels.conv_of import to_output_form, from_output_form
    from medseg.kernels import unetr_of
    from medseg.models.blocks import ConvTranspose3d, UnetrPrUpBlock, UnetrUpBlock
    from medseg.models.unetr import unetr_b16
    from medseg.models.vit import ViT3D

    print(f"devices: {jax.devices()}  batch={B} size={S}^3  K={K}", file=sys.stderr)
    model = unetr_b16(in_channels=1, out_channels=14, crop_size=S, dtype=jnp.bfloat16)
    x = 0.3 + 0.1 * jax.random.normal(jax.random.key(1), (B, S, S, S, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x)
    p = params["params"]
    dt = jnp.bfloat16
    fs = model.feature_size

    full = chain_bench(
        "full XLA apply", lambda xx, pp: model.apply(pp, xx, return_encoder_features=False),
        x, params)
    fast = chain_bench(
        "fast_apply_v2", lambda xx, pp: unetr_of.fast_apply_v2(model, pp, xx), x, params)

    vit = ViT3D(hidden_size=model.hidden_size, mlp_dim=model.mlp_dim,
                num_layers=model.num_layers, num_heads=model.num_heads,
                patch_size=model.patch_size, dropout_rate=0.0, dtype=dt)
    chain_bench("vit", lambda xx, pp: vit.apply({"params": pp}, xx), x, p["vit"])
    tokens, hidden = jax.jit(lambda pp, xx: vit.apply({"params": pp}, xx))(p["vit"], x)

    fd = S // 16

    def proj(t):
        return t.reshape(B, fd, fd, fd, model.hidden_size)

    h3, h6, h9 = proj(hidden[3]), proj(hidden[6]), proj(hidden[9])
    tok = proj(tokens)
    enc2m = UnetrPrUpBlock(fs * 2, num_layer=2, res_block=True, dtype=dt)
    enc3m = UnetrPrUpBlock(fs * 4, num_layer=1, res_block=True, dtype=dt)
    enc4m = UnetrPrUpBlock(fs * 8, num_layer=0, res_block=True, dtype=dt)
    enc2 = jax.jit(lambda pp, t: enc2m.apply({"params": pp}, t))(p["encoder2"], h3)
    enc3 = jax.jit(lambda pp, t: enc3m.apply({"params": pp}, t))(p["encoder3"], h6)
    enc4 = jax.jit(lambda pp, t: enc4m.apply({"params": pp}, t))(p["encoder4"], h9)
    chain_bench("encoder2 (PrUp x3 -> 48^3)", lambda t, pp: enc2m.apply({"params": pp}, t), h3, p["encoder2"])
    chain_bench("encoder3 (PrUp x2 -> 24^3)", lambda t, pp: enc3m.apply({"params": pp}, t), h6, p["encoder3"])
    chain_bench("encoder4 (PrUp x1 -> 12^3)", lambda t, pp: enc4m.apply({"params": pp}, t), h9, p["encoder4"])

    upm8 = UnetrUpBlock(fs * 8, res_block=True, dtype=dt)
    upm4 = UnetrUpBlock(fs * 4, res_block=True, dtype=dt)
    upm2 = UnetrUpBlock(fs * 2, res_block=True, dtype=dt)
    dec3 = jax.jit(lambda pp, a, b2: upm8.apply({"params": pp}, a, b2))(p["decoder5"], tok, enc4)
    dec2 = jax.jit(lambda pp, a, b2: upm4.apply({"params": pp}, a, b2))(p["decoder4"], dec3, enc3)
    dec1 = jax.jit(lambda pp, a, b2: upm2.apply({"params": pp}, a, b2))(p["decoder3"], dec2, enc2)
    chain_bench("decoder5 (6->12)", lambda a, pp, b2: upm8.apply({"params": pp}, a, b2), tok, p["decoder5"], enc4)
    chain_bench("decoder4 (12->24)", lambda a, pp, b2: upm4.apply({"params": pp}, a, b2), dec3, p["decoder4"], enc3)
    chain_bench("decoder3 XLA (24->48)", lambda a, pp, b2: upm2.apply({"params": pp}, a, b2), dec2, p["decoder3"], enc2)
    chain_bench(
        "decoder3 up_block_of (24->48)",
        lambda a, pp, b2: unetr_of.up_block_of(pp, a, b2, fs * 2, dt),
        dec2, p["decoder3"], enc2)

    # fused full-res tail (everything after dec1), replicating fast_apply_v2
    def fullres(xx, pp, d1):
        from medseg.kernels.conv3d import _xla_conv, weight_matrix
        from medseg.kernels.conv_of import conv3x3x3_of, res_weight

        e1 = pp["encoder1"]["layer"]
        xd = xx.astype(dt)
        n_valid = S * S * S
        mask = jnp.asarray(unetr_of._lane_mask(S, S))[None, None, None, :]
        y1 = _xla_conv(xd, e1["conv1"]["conv"]["kernel"].astype(dt))
        y1_of = to_output_form(y1, dt)
        s1 = jnp.sum(y1, axis=(1, 2, 3)).astype(jnp.float32)
        ss1 = jnp.sum(jnp.square(y1.astype(jnp.float32)), axis=(1, 2, 3))
        a1, b1 = unetr_of._affine(s1, ss1, e1["norm1"], n_valid)
        y2, s2, ss2 = conv3x3x3_of(y1_of, weight_matrix(e1["conv2"]["conv"]["kernel"], dt),
                                   a1, b1, h=S, w=S, input_act="affine_leaky", out_dtype=dt)
        a2, b2 = unetr_of._affine(s2[..., 0], ss2[..., 0], e1["norm2"], n_valid)
        k3 = e1["conv3"]["conv"]["kernel"][0, 0, 0].astype(jnp.float32)
        sx = jnp.sum(xx.astype(jnp.float32), axis=(1, 2, 3, 4))
        ssx = jnp.sum(jnp.square(xx.astype(jnp.float32)), axis=(1, 2, 3, 4))
        s3 = sx[:, None] * k3[0][None, :]
        ss3 = ssx[:, None] * jnp.square(k3[0])[None, :]
        a3, b3 = unetr_of._affine(s3, ss3, e1["norm3"], n_valid)
        x_of = to_output_form(xd, dt)
        up = ConvTranspose3d(fs, dtype=dt).apply(
            {"params": {"convt": pp["decoder2"]["transp_conv"]["convt"]}}, d1)
        up_of = to_output_form(up, dt)
        enc1_comb = unetr_of._leaky(
            a2[:, None] * y2.astype(jnp.float32) + b2[:, None]
            + (a3[:, None] * k3[0][None, None, :, None]) * x_of.astype(jnp.float32) + b3[:, None])
        enc1_comb = (enc1_comb * mask).astype(dt)
        cat = jnp.concatenate([up_of, enc1_comb], axis=2)
        d2 = pp["decoder2"]["conv_block"]
        z1, zs1, zss1, res, rs, rss = conv3x3x3_of(
            cat, weight_matrix(d2["conv1"]["conv"]["kernel"], dt), a1, b1,
            res_weight(d2["conv3"]["conv"]["kernel"], dt),
            h=S, w=S, input_act="none", residual=True, out_dtype=dt)
        za1, zb1 = unetr_of._affine(zs1[..., 0], zss1[..., 0], d2["norm1"], n_valid)
        z2, zs2, zss2 = conv3x3x3_of(z1, weight_matrix(d2["conv2"]["conv"]["kernel"], dt),
                                     za1, zb1, h=S, w=S, input_act="affine_leaky", out_dtype=dt)
        za2, zb2 = unetr_of._affine(zs2[..., 0], zss2[..., 0], d2["norm2"], n_valid)
        za3, zb3 = unetr_of._affine(rs[..., 0], rss[..., 0], d2["norm3"], n_valid)
        combined = unetr_of._leaky(
            za2[:, None] * z2.astype(jnp.float32) + zb2[:, None]
            + za3[:, None] * res.astype(jnp.float32) + zb3[:, None])
        combined = (combined * mask).astype(dt)
        k_out = pp["out"]["conv"]["kernel"][0, 0, 0].astype(dt)
        logits_of = jnp.einsum("bdcl,ck->bdkl", combined, k_out,
                               preferred_element_type=jnp.float32)
        logits_of = logits_of + pp["out"]["conv"]["bias"][None, None, :, None]
        return from_output_form(logits_of, S, S).astype(dt)

    chain_bench("fused full-res tail (enc1+dec2+out)", fullres, x, p, dec1)

    # micro: layout conversions at full resolution
    y = jax.random.normal(jax.random.key(2), (B, S, S, S, fs), jnp.bfloat16)
    y_of = to_output_form(y, dt)
    chain_bench("to_output_form (16ch full-res)", lambda t: to_output_form(t, dt), y)
    chain_bench("from_output_form (16ch full-res)", lambda t: from_output_form(t, S, S), y_of)

    print(f"\nsum-check: full {full:.1f}ms fast {fast:.1f}ms", file=sys.stderr)


if __name__ == "__main__":
    main()
