"""Decompose the zrow serving pipeline (BASELINE config 4) on the real TPU.

Stages measured with real dependence chains / volume-level reps (see
docs/PERF_NOTES.md "measurement gotchas"):

1. model-only: fast_apply_v3(pp) per-window ms at several batch sizes
   (feedback chain; the zrow walk runs batch = n_w = 3 at config 4);
2. glue-only: full zrow program with a trivial voxel-wise 1->K16 predictor
   (real-size window materialization, real gathers/folds) — s/volume;
3. full: the bench pipeline itself (for cross-checking 1 + 2).
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

from medseg.kernels.unetr_of import fast_apply_v3  # noqa: E402
from medseg.models.unetr import unetr_b16  # noqa: E402
from medseg.ops.sliding_window import SlidingWindowSpec  # noqa: E402
from medseg.ops.swi_zrow import sliding_window_inference_zrow  # noqa: E402

ROI, K = 96, 14
K16 = 16
VOL = (512, 512, 160)
FLOPS_W = 125.74e9


def sync1(x):
    return float(np.asarray(jax.lax.slice(x.reshape(-1), (0,), (1,)))[0])


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    model = unetr_b16(1, K, ROI, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, ROI, ROI, ROI, 1)))
    spec = SlidingWindowSpec(roi=(ROI,) * 3, overlap=0.5, sw_batch=4, mode="gaussian")
    volume = 0.3 + 0.2 * jax.random.normal(jax.random.key(1), VOL + (1,), jnp.float32)

    # ---- 1. model-only chains (python-loop device chaining: the relay's
    # remote-compile endpoint 413s on a scan-wrapped model graph) ----
    @jax.jit
    def chained_call(p, x, wgt):
        # params must be an ARGUMENT: a closed-over param tree is baked into
        # the compile payload as constants and 413s the relay's endpoint
        out = fast_apply_v3(model, p, x, flat_k16=True, out_scale=wgt, pp=True)
        probe = out[0, 0, 0, 0, 0].astype(jnp.float32)  # real dependency
        return x + 1e-20 * probe, out

    for b in (3, 4, 6, 8):
        x0 = 0.3 + 0.2 * jax.random.normal(jax.random.key(2), (b, ROI, ROI, ROI, 1), jnp.float32)
        wgt = jnp.ones((b, ROI, ROI, ROI, 1), jnp.float32)
        reps = 20
        x, out = chained_call(params, x0, wgt)
        sync1(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            x, out = chained_call(params, x, wgt)
        sync1(out)
        dt = (time.perf_counter() - t0) / reps
        per_w = dt / b * 1e3
        tf = b * FLOPS_W / dt / 1e12
        print(f"model pp batch {b}: {dt*1e3:7.2f} ms/call  {per_w:6.2f} ms/window  {tf:6.1f} TF/s", flush=True)

    # ---- 2. glue-only zrow (trivial predictor, real-size windows) ----
    wmat = 0.1 * jax.random.normal(jax.random.key(3), (1, K16), jnp.float32)

    def trivial_pp(p, wins, wgt):
        lg = (wins * wgt) @ p  # (B, rd, rh, rw, K16)
        b, rd, rh, rw, _ = lg.shape
        g = lg.reshape(b, rd, rh // 2, 2, rw // 2, 2, K16)
        return (
            g.transpose(0, 1, 3, 5, 2, 4, 6)
            .reshape(b, rd, 4, rh // 2, (rw // 2) * K16)
            .astype(jnp.bfloat16)
        )

    def run_glue():
        return sliding_window_inference_zrow(wmat, volume, trivial_pp, K, spec, acc_dtype="bf16")

    out = run_glue(); sync1(out)
    t0 = time.perf_counter(); sync1(out); rtt = time.perf_counter() - t0
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        last = run_glue()
    sync1(last)
    glue = (time.perf_counter() - t0 - rtt) / reps
    print(f"zrow glue-only (trivial model): {glue:6.3f} s/vol", flush=True)

    # ---- 3. full zrow ----
    def apply_fn(p, windows, wgt):
        return fast_apply_v3(model, p, windows, flat_k16=True, out_scale=wgt, pp=True)

    def run_full():
        return sliding_window_inference_zrow(params, volume, apply_fn, K, spec, acc_dtype="bf16")

    out = run_full(); sync1(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        last = run_full()
    sync1(last)
    full = (time.perf_counter() - t0 - rtt) / reps
    print(f"zrow full: {full:6.3f} s/vol ({1/full:.3f} vol/s)", flush=True)


if __name__ == "__main__":
    main()
