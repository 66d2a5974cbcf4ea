"""Per-stage attribution of the ACTUAL pp serving chain (fast_apply_v3
pp=True, flat_k16=True) at the zrow model batch (n_w = 10 w-windows per
rowblock at 512^2 / roi 96 / overlap 0.5).

Stages mirror unetr_of.fast_apply_v3 lines 415-491; cross-check the sum
against the whole fast_apply_v3 call.

Usage: python benchmarks/probe_ppchain.py [batch]
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

from medseg.kernels.conv3d import weight_matrix  # noqa: E402
from medseg.kernels.conv_of import (  # noqa: E402
    conv3x3x3_of,
    conv3x3x3_of_combine,
    convt_expand_pp,
    outhead_of,
    res_weight,
    to_output_form,
    to_pp,
)
from medseg.kernels import unetr_of  # noqa: E402
from medseg.models.unetr import unetr_b16  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 10
S = 96
C = 16
LO = S * S
K16 = 16


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
    model = unetr_b16(in_channels=1, out_channels=14, crop_size=S, dtype=jnp.bfloat16)
    x = 0.3 + 0.1 * jax.random.normal(key, (B, S, S, S, 1), jnp.float32)
    variables = model.init(jax.random.key(1), x[:1])
    p = variables["params"]
    wgt = jnp.ones((B, S, S, S, 1), jnp.float32)

    x_of = to_pp(x.astype(jnp.bfloat16), jnp.bfloat16)  # (B, S+2, 1, LO)
    y = (0.1 * jax.random.normal(key, (B, S + 2, C, LO))).astype(jnp.bfloat16)
    dec1 = to_output_form(
        0.1 * jax.random.normal(
            key, (B, S // 2, S // 2, S // 2, 2 * C), jnp.bfloat16
        ),
        jnp.bfloat16,
    )  # low-res compact of-form, as up_block_of(return_of=True) emits
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
    a16 = jnp.ones((B, C, 1), jnp.float32)
    b16 = jnp.zeros((B, C, 1), jnp.float32)
    ko = jnp.zeros((K16, C), jnp.bfloat16)
    bo = jnp.zeros((K16, 1), jnp.float32)
    up_of = jax.jit(lambda d: convt_expand_pp(d, kt, jnp.bfloat16))(dec1)
    scale_of = to_pp(wgt, jnp.float32)

    def xla_stages(pp_, xx):
        enc2, dec2 = unetr_of._xla_stages(model, pp_, xx)
        return unetr_of.up_block_of(
            pp_["decoder3"], dec2, enc2, model.feature_size * 2, jnp.bfloat16,
            return_of=True,
        )

    bench("xla stages (ViT+mid) + dec3", jax.jit(xla_stages), p, x)

    # --- sub-attribution of the XLA stages ---
    from medseg.models.blocks import UnetrPrUpBlock, UnetrUpBlock
    from medseg.models.vit import ViT3D

    vit = ViT3D(
        hidden_size=model.hidden_size, mlp_dim=model.mlp_dim,
        num_layers=model.num_layers, num_heads=model.num_heads,
        patch_size=model.patch_size, dropout_rate=model.dropout_rate,
        dtype=model.dtype,
    )
    fs = model.feature_size
    fd = S // model.patch_size

    def run_vit(pv, xx):
        return unetr_of._apply_sub(vit, pv, xx)

    bench("  vit (12 layers)", jax.jit(run_vit), p["vit"], x)
    tokens, hidden = run_vit(p["vit"], x)
    q = model.num_layers // 4
    proj = lambda t: t.reshape(B, fd, fd, fd, model.hidden_size)
    h3, h6, h9 = proj(hidden[q]), proj(hidden[2 * q]), proj(hidden[3 * q])
    tok = proj(tokens)

    def run_enc2(pe, t):
        return unetr_of._apply_sub(
            UnetrPrUpBlock(fs * 2, num_layer=2, res_block=model.res_block,
                           dtype=model.dtype), pe, t)

    def run_enc34_dec5(pp_, t3, t6, t9, tk):
        enc3 = unetr_of._apply_sub(
            UnetrPrUpBlock(fs * 4, num_layer=1, res_block=model.res_block,
                           dtype=model.dtype), pp_["encoder3"], t6)
        enc4 = unetr_of._apply_sub(
            UnetrPrUpBlock(fs * 8, num_layer=0, res_block=model.res_block,
                           dtype=model.dtype), pp_["encoder4"], t9)
        dec3 = unetr_of._apply_sub(
            UnetrUpBlock(fs * 8, res_block=model.res_block, dtype=model.dtype),
            pp_["decoder5"], tk, enc4)
        return dec3

    bench("  enc2 (6->48^3, 32ch)", jax.jit(run_enc2), p["encoder2"], h3)
    enc2 = run_enc2(p["encoder2"], h3)
    bench("  enc3+enc4+dec5", jax.jit(run_enc34_dec5), p, h3, h6, h9, tok)
    dec3m = run_enc34_dec5(p, h3, h6, h9, tok)

    def run_dec4(pd, a, bb):
        return unetr_of._apply_sub(
            UnetrUpBlock(fs * 4, res_block=model.res_block, dtype=model.dtype),
            pd, a, bb)

    h6e = unetr_of._apply_sub(
        UnetrPrUpBlock(fs * 4, num_layer=1, res_block=model.res_block,
                       dtype=model.dtype), p["encoder3"], h6)
    bench("  dec4 (24^3, 64ch)", jax.jit(run_dec4), p["decoder4"], dec3m, h6e)
    dec2m = run_dec4(p["decoder4"], dec3m, h6e)

    def run_dec3(pd, a, bb):
        return unetr_of.up_block_of(pd, a, bb, fs * 2, jnp.bfloat16,
                                    return_of=True)

    bench("  dec3 up_block_of (48^3, 32ch)", jax.jit(run_dec3),
          p["decoder3"], dec2m, enc2)
    bench("to_pp (C=1 input)", jax.jit(
        lambda xx: to_pp(xx.astype(jnp.bfloat16), jnp.bfloat16)), x)
    bench("conv1 C=1->16 pp", lambda: conv3x3x3_of(
        x_of, w1, None, None, h=S, w=S, input_act="none",
        out_dtype=jnp.bfloat16, pp=True)[0])
    bench("conv2 16->16 affine_leaky pp", lambda: conv3x3x3_of(
        y, w16, a16, b16, h=S, w=S, input_act="affine_leaky",
        out_dtype=jnp.bfloat16, pp=True)[0])
    bench("convt_expand_pp (48^3x32 -> 96^3x16)", jax.jit(
        lambda d: convt_expand_pp(d, kt, jnp.bfloat16)), dec1)
    bench("combine 32->16 (+res) pp", lambda: conv3x3x3_of_combine(
        up_of, y, x_of, a16, b16, a16, b16, w32, wres, h=S, w=S,
        out_dtype=jnp.bfloat16, pp=True)[0])
    bench("z2 conv 16->16 affine_leaky pp", lambda: conv3x3x3_of(
        y, w16, a16, b16, h=S, w=S, input_act="affine_leaky",
        out_dtype=jnp.bfloat16, pp=True)[0])
    bench("outhead (scaled, bf16)", lambda: outhead_of(
        y, y, a16, b16, a16, b16, ko, bo, scale_of, out_dtype=jnp.bfloat16))
    logits_of = outhead_of(
        y, y, a16, b16, a16, b16, ko, bo, scale_of, out_dtype=jnp.bfloat16)
    bench("ppk window reshape", jax.jit(
        lambda o: o.swapaxes(2, 3).reshape(B, S, 4, S // 2, (S // 2) * K16)),
        logits_of)

    apply_fn = jax.jit(lambda vv, xx, ww: unetr_of.fast_apply_v3(
        model, vv, xx, flat_k16=True, out_scale=ww, pp=True))
    dt = bench("WHOLE fast_apply_v3 (pp, flat_k16)", apply_fn, variables, x, wgt)
    print(f"  -> {dt * 1e3 / B:.2f} ms/window", flush=True)

    if os.environ.get("PP_SWEEP", "0") == "1":
        for bb in (5, 20, 30):
            xs = 0.3 + 0.1 * jax.random.normal(key, (bb, S, S, S, 1), jnp.float32)
            ws = jnp.ones((bb, S, S, S, 1), jnp.float32)
            dt = bench(f"WHOLE fast_apply_v3 B={bb}", apply_fn, variables, xs, ws,
                       reps=15)
            print(f"  -> {dt * 1e3 / bb:.2f} ms/window", flush=True)


if __name__ == "__main__":
    main()
