"""Minimal hardware sweep: full train step, remat=True vs remat='lowres'.

remat='lowres' (added with the block-level of-form training path, see
medseg/models/unetr.py remat-tier docstring) checkpoints only the ViT and the
<=24^3 decoder stages, keeping the full-res conv activations live — trading
HBM for skipping the most expensive part of the remat re-forward.

Differs from benchmarks/profile_train.py (which also times both remat tiers
as part of its full stage-by-stage trace): this is the minimal isolated A/B —
just the two full-step timings, no tracing, for quick hardware re-checks.
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

ROI, K, B = 96, 14, 4


def sync1(x):
    x = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(jax.lax.slice(x.reshape(-1), (0,), (1,)))[0])


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    img = jax.random.normal(jax.random.key(2), (B, ROI, ROI, ROI, 1), jnp.float32)
    lab = jax.random.randint(jax.random.key(3), (B, ROI, ROI, ROI), 0, K)
    batch = {"image": img, "label": lab}

    for remat in (True, "lowres"):
        tag = {True: "remat", "lowres": "lowres"}[remat]
        model = unetr_b16(1, K, ROI, dtype=jnp.bfloat16, remat=remat)
        state = create_train_state(
            model, rng=jax.random.key(0), sample_input=img[:1],
            learning_rate=1e-4, weight_decay=1e-5,
        )
        step = make_train_step(model, task="ct", donate=False)
        t0 = time.perf_counter()
        out = step(state, batch)
        sync1(out[1] if isinstance(out, tuple) else out)
        print(f"full step ({tag}) compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            out = step(state, batch)
        sync1(out[1] if isinstance(out, tuple) else out)
        dt = (time.perf_counter() - t0) / n
        print(f"full step ({tag}): {dt*1e3:8.1f} ms  ({B/dt:.1f} patches/s)", flush=True)


if __name__ == "__main__":
    main()
