"""Attribute the 62.9 ms DiceCE fwd (4x96^3x14 fp32) and test the TPU-first
rewrite: replace take_along_axis (minor-dim gather) and materialized one-hot
with broadcast iota-compare masks that fuse into the reduction loops.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_medseg"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from medseg.ops.losses import dice_ce_loss, dice_loss, softmax_ce_with_label_indices

B, R, K = 4, 96, 14


def sync(x):
    return float(np.asarray(x))


def timeit(name, fn, reps=20):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn()
    sync(o)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:<44s} {dt:7.2f} ms", flush=True)


def ce_iota(logits, labels):
    lg = logits.astype(jnp.float32)
    lab = labels.astype(jnp.int32)[..., None]
    cls = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, lg.shape[-1]), 4)
    picked = jnp.sum(jnp.where(lab == cls, lg, 0.0), axis=-1)
    lse = jax.nn.logsumexp(lg, axis=-1)
    return jnp.mean(lse - picked)


def dice_iota(logits, labels):
    lg = logits.astype(jnp.float32)
    probs = jax.nn.softmax(lg, axis=-1)
    lab = labels.astype(jnp.int32)[..., None]
    cls = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, lg.shape[-1]), 4)
    mask = lab == cls
    spatial = (1, 2, 3)
    inter = jnp.sum(jnp.where(mask, probs, 0.0), axis=spatial)
    go = jnp.sum(mask.astype(jnp.float32), axis=spatial)
    po = jnp.sum(probs, axis=spatial)
    f = 1.0 - (2.0 * inter + 1e-5) / (go + po + 1e-5)
    return jnp.mean(f)


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    kx, kl = jax.random.split(jax.random.key(0))
    logits = jax.random.normal(kx, (B, R, R, R, K), jnp.bfloat16)
    labels = jax.random.randint(kl, (B, R, R, R), 0, K)

    cur_ce = jax.jit(lambda: softmax_ce_with_label_indices(logits, labels))
    cur_dice = jax.jit(lambda: dice_loss(logits, labels, softmax=True, to_onehot_y=True))
    cur_full = jax.jit(lambda: dice_ce_loss(logits, labels, softmax=True, to_onehot_y=True))
    timeit("current CE (take_along_axis)", cur_ce)
    timeit("current dice (one_hot)", cur_dice)
    timeit("current dice_ce", cur_full)

    new_ce = jax.jit(lambda: ce_iota(logits, labels))
    new_dice = jax.jit(lambda: dice_iota(logits, labels))
    new_full = jax.jit(lambda: ce_iota(logits, labels) + dice_iota(logits, labels))
    timeit("iota CE", new_ce)
    timeit("iota dice", new_dice)
    timeit("iota dice_ce", new_full)

    # numerics agreement
    a, b = sync(cur_full()), sync(new_full())
    print(f"values: current {a:.6f} iota {b:.6f}", flush=True)

    # grads
    lf32 = logits.astype(jnp.float32)
    g_cur = jax.jit(jax.grad(lambda lg: dice_ce_loss(lg, labels, softmax=True, to_onehot_y=True)))
    g_new = jax.jit(jax.grad(lambda lg: ce_iota(lg, labels) + dice_iota(lg, labels)))
    timeit("grad current", lambda: g_cur(lf32)[0, 0, 0, 0, 0])
    timeit("grad iota", lambda: g_new(lf32)[0, 0, 0, 0, 0])


if __name__ == "__main__":
    main()
