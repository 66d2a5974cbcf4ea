"""Stage breakdown of fast_apply_v3 at serving shapes (chained in-jit reps)."""
import sys, time
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import os
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_medseg"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
S = int(sys.argv[2]) if len(sys.argv) > 2 else 96
K = 30

def sync1(x):
    return float(np.asarray(jax.lax.slice(x.ravel(), (0,), (1,))))

_FLOOR = [0.0]  # fixed per-call dispatch+fetch RTT (s), measured by an empty chain

def chain_bench(name, stage_fn, *args):
    """NOTE: the 0*leaf probe lets XLA hoist loop-invariant stages when the
    carry never changes numerically — safe here ONLY because every stage_fn
    consumes the carry as its tensor input and the probe is float (XLA keeps
    0*x for floats, NaN semantics). The measured per-call RTT floor
    (~28ms through the axon relay) is subtracted."""
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
    out = fn(*args); sync1(out)
    t0 = time.perf_counter(); out = fn(*args); sync1(out)
    ms = max(time.perf_counter() - t0 - _FLOOR[0], 1e-9) / K * 1e3
    print(f"{name:<44s} {ms:8.2f} ms", flush=True)
    return ms


def measure_floor():
    x = jnp.ones((8, 8), jnp.float32)
    def loop(c):
        def body(c, _):
            return c * jnp.float32(1.0000001), ()
        fin, _ = jax.lax.scan(body, c, None, length=K)
        return fin
    fn = jax.jit(loop)
    sync1(fn(x))
    t0 = time.perf_counter(); sync1(fn(x))
    _FLOOR[0] = time.perf_counter() - t0
    print(f"per-call RTT floor: {_FLOOR[0]*1e3:.1f} ms", flush=True)

def main():
    from medseg.kernels import unetr_of
    from medseg.models.blocks import UnetrPrUpBlock, UnetrUpBlock
    from medseg.models.unetr import unetr_b16
    from medseg.models.vit import ViT3D

    print(f"devices: {jax.devices()}  batch={B} size={S}^3  K={K}", file=sys.stderr)
    measure_floor()
    model = unetr_b16(in_channels=1, out_channels=14, crop_size=S, dtype=jnp.bfloat16)
    x = 0.3 + 0.1 * jax.random.normal(jax.random.key(1), (B, S, S, S, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x)
    p = params["params"]
    dt = jnp.bfloat16
    fs = model.feature_size

    t_full = chain_bench("fast_apply_v3 (cf)", lambda xx, pp: unetr_of.fast_apply_v3(model, pp, xx, channels_first=True), x, params)
    t_xla = chain_bench("full XLA apply", lambda xx, pp: model.apply(pp, xx, return_encoder_features=False), x, params)

    vit = ViT3D(hidden_size=model.hidden_size, mlp_dim=model.mlp_dim,
                num_layers=model.num_layers, num_heads=model.num_heads,
                patch_size=model.patch_size, dropout_rate=0.0, dtype=dt)
    t_vit = chain_bench("vit", lambda xx, pp: vit.apply({"params": pp}, xx), x, p["vit"])
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
    t_e2 = chain_bench("encoder2 (PrUp x3 -> 48^3)", lambda t, pp: enc2m.apply({"params": pp}, t), h3, p["encoder2"])
    t_e3 = chain_bench("encoder3 (PrUp x2 -> 24^3)", lambda t, pp: enc3m.apply({"params": pp}, t), h6, p["encoder3"])
    t_e4 = chain_bench("encoder4 (PrUp x1 -> 12^3)", lambda t, pp: enc4m.apply({"params": pp}, t), h9, p["encoder4"])

    upm8 = UnetrUpBlock(fs * 8, res_block=True, dtype=dt)
    upm4 = UnetrUpBlock(fs * 4, res_block=True, dtype=dt)
    dec3 = jax.jit(lambda pp, a, b2: upm8.apply({"params": pp}, a, b2))(p["decoder5"], tok, enc4)
    dec2 = jax.jit(lambda pp, a, b2: upm4.apply({"params": pp}, a, b2))(p["decoder4"], dec3, enc3)
    t_d5 = chain_bench("decoder5 (6->12)", lambda a, pp, b2: upm8.apply({"params": pp}, a, b2), tok, p["decoder5"], enc4)
    t_d4 = chain_bench("decoder4 (12->24)", lambda a, pp, b2: upm4.apply({"params": pp}, a, b2), dec3, p["decoder4"], enc3)
    t_d3 = chain_bench("decoder3 up_block_of (24->48)", lambda a, pp, b2: unetr_of.up_block_of(pp, a, b2, fs * 2, dt), dec2, p["decoder3"], enc2)
    dec1 = jax.jit(lambda a, pp, b2: unetr_of.up_block_of(pp, a, b2, fs * 2, dt))(dec2, p["decoder3"], enc2)

    # full-res chain of v3 alone: run v3 minus the known stages
    def fullres_v3(xx, pp, d1):
        from medseg.kernels.conv3d import weight_matrix
        from medseg.kernels.conv_of import (conv3x3x3_of, conv3x3x3_of_combine,
                                            convt_expand_of, outhead_of, res_weight, to_output_form)
        b_, d_, h_, w_, _ = xx.shape
        n_valid = d_ * h_ * w_
        from medseg.kernels.conv3d import _wp
        wp = _wp(w_)
        n_classes = 14
        e1 = pp["encoder1"]["layer"]
        x_of = to_output_form(xx.astype(dt), dt)
        y1, s1, ss1 = conv3x3x3_of(x_of, weight_matrix(e1["conv1"]["conv"]["kernel"], dt), None, None, h=h_, w=w_, input_act="none", out_dtype=dt)
        a1, b1 = unetr_of._affine(s1[..., 0], ss1[..., 0], e1["norm1"], n_valid)
        y2, s2, ss2 = conv3x3x3_of(y1, weight_matrix(e1["conv2"]["conv"]["kernel"], dt), a1, b1, h=h_, w=w_, input_act="affine_leaky", out_dtype=dt)
        a2, b2 = unetr_of._affine(s2[..., 0], ss2[..., 0], e1["norm2"], n_valid)
        k3 = e1["conv3"]["conv"]["kernel"][0, 0, 0].astype(jnp.float32)
        sx = jnp.sum(xx.astype(jnp.float32), axis=(1, 2, 3, 4))
        ssx = jnp.sum(jnp.square(xx.astype(jnp.float32)), axis=(1, 2, 3, 4))
        s3 = sx[:, None] * k3[0][None, :]
        ss3 = ssx[:, None] * jnp.square(k3[0])[None, :]
        a3, b3 = unetr_of._affine(s3, ss3, e1["norm3"], n_valid)
        ax = a3 * k3[0][None, :, None]
        up_of = convt_expand_of(d1, pp["decoder2"]["transp_conv"]["convt"], dt)
        d2 = pp["decoder2"]["conv_block"]
        z1, zs1, zss1, res, rs, rss = conv3x3x3_of_combine(up_of, y2, x_of, a2, b2, ax, b3,
            weight_matrix(d2["conv1"]["conv"]["kernel"], dt), res_weight(d2["conv3"]["conv"]["kernel"], dt),
            h=h_, w=w_, out_dtype=dt)
        za1, zb1 = unetr_of._affine(zs1[..., 0], zss1[..., 0], d2["norm1"], n_valid)
        z2, zs2, zss2 = conv3x3x3_of(z1, weight_matrix(d2["conv2"]["conv"]["kernel"], dt), za1, zb1, h=h_, w=w_, input_act="affine_leaky", out_dtype=dt)
        za2, zb2 = unetr_of._affine(zs2[..., 0], zss2[..., 0], d2["norm2"], n_valid)
        za3, zb3 = unetr_of._affine(rs[..., 0], rss[..., 0], d2["norm3"], n_valid)
        co_pad = 16
        k_out = jnp.zeros((co_pad, fs), dt).at[:n_classes].set(pp["out"]["conv"]["kernel"][0, 0, 0].astype(dt).T)
        bias = jnp.zeros((co_pad, 1), jnp.float32).at[:n_classes, 0].set(pp["out"]["conv"]["bias"].astype(jnp.float32))
        logits_of = outhead_of(z2, res, za2, zb2, za3, zb3, k_out, bias, out_dtype=jnp.float32)
        from medseg.kernels.conv_of import from_output_form
        # outhead_of returns UNPADDED z (no DPAD guard rows)
        return from_output_form(logits_of, h_, w_, dpad=0)[..., :n_classes]

    t_fr = chain_bench("fused full-res chain v3", fullres_v3, x, p, dec1)
    acc = t_vit + t_e2 + t_e3 + t_e4 + t_d5 + t_d4 + t_d3 + t_fr
    print(f"\nsum of stages {acc:.1f}ms vs v3 whole {t_full:.1f}ms (XLA {t_xla:.1f}ms)", flush=True)

if __name__ == "__main__":
    main()
