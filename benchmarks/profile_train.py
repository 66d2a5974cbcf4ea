"""Decompose the 96^3/14-class training step (BENCH train_btcv_step).

Round-2 measured 466 ms/step (batch 4, bf16+remat) with no stage breakdown.
Chained-timing stages (docs/PERF_NOTES.md measurement rules):

- full step (fwd+bwd+AdamW, donated) — the bench number
- grads only (no optimizer update)
- fwd-only loss
- loss fn alone on fixed logits (fwd+bwd)
- remat OFF variant of the full step
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

from medseg.engine.state import create_train_state  # noqa: E402
from medseg.engine.train import make_train_step  # noqa: E402
from medseg.models.unetr import unetr_b16  # noqa: E402
from medseg.ops.losses import dice_ce_loss  # noqa: E402

ROI, K, B = 96, 14, 4


def sync1(x):
    x = jax.tree_util.tree_leaves(x)[0]  # works for pytrees (grads) too
    return float(np.asarray(jax.lax.slice(x.reshape(-1), (0,), (1,)))[0])


def timeit(name, fn, *args, n=6):
    out = fn(*args)
    sync1(out[1] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync1(out[1] if isinstance(out, tuple) else out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:<42s} {dt*1e3:8.1f} ms", flush=True)
    return dt


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    img = jax.random.normal(jax.random.key(2), (B, ROI, ROI, ROI, 1), jnp.float32)
    lab = jax.random.randint(jax.random.key(3), (B, ROI, ROI, ROI), 0, K)

    for remat in (True, "lowres", False):
        model = unetr_b16(1, K, ROI, dtype=jnp.bfloat16, remat=remat)
        state = create_train_state(
            model, rng=jax.random.key(0), sample_input=img[:1],
            learning_rate=1e-4, weight_decay=1e-5,
        )
        tag = {True: "remat", "lowres": "lowres", False: "noremat"}[remat]

        def loss_fn(params, model=model):
            logits = model.apply(params, img, return_encoder_features=False)
            return dice_ce_loss(logits, lab, softmax=True, to_onehot_y=True)

        fwd = jax.jit(loss_fn)
        timeit(f"fwd loss only ({tag})", lambda s=state: fwd(s.params))
        if not remat:
            continue  # bwd without remat OOMs at batch 4 (20.8G > 15.75G)

        step = make_train_step(model, task="ct", donate=False)
        timeit(f"full step ({tag})", lambda s=state: step(s, {"image": img, "label": lab}))
        if remat == "lowres":
            continue

        grads_fn = jax.jit(jax.grad(loss_fn))
        timeit(f"grads only ({tag})", lambda s=state: grads_fn(s.params))

        # optimizer alone: apply precomputed grads (jitted)
        g = grads_fn(state.params)
        opt_step = jax.jit(lambda s, gg: s.apply_gradients(gg))
        timeit("apply_gradients (AdamW) only",
               lambda s=state, g=g: opt_step(s, g).params)

    # loss alone on fixed logits
    logits0 = jax.random.normal(jax.random.key(4), (B, ROI, ROI, ROI, K), jnp.bfloat16)

    def loss_only(lg):
        return dice_ce_loss(lg, lab, softmax=True, to_onehot_y=True)

    g = jax.jit(jax.grad(lambda lg: loss_only(lg)))
    timeit("dice_ce fwd+bwd on fixed logits", lambda: g(logits0))
    timeit("dice_ce fwd on fixed logits", jax.jit(loss_only), logits0)


if __name__ == "__main__":
    main()
