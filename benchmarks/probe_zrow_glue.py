"""Glue cost of the zrow walk: trivial pp-form predictor through the REAL
sliding_window_inference_zrow at BASELINE config-4 geometry, volume-level
reps (each ~0.1-0.8s >> the ~30ms relay RTT). Also the model-only per-window
cost at the walk's actual batch (g*n_w) for cross-checking bench = model+glue.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_medseg"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import numpy as np

from medseg.kernels.unetr_of import fast_apply_v3, ndhwc_to_pp_windows
from medseg.models.unetr import unetr_b16
from medseg.ops.sliding_window import SlidingWindowSpec
from medseg.ops import swi_zrow

ROI, K = 96, 14
VOL = (512, 512, 160)


def sync1(x):
    # single-element getitem: a flat reshape of the tiled (D,H,W,14) output
    # compiles a relayout copy padded to 128 lanes = 21.5GB -> OOM
    return float(np.asarray(x[(0,) * x.ndim]))


def vol_reps(fn, *args, reps=5):
    out = fn(*args); sync1(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); out = fn(*args); sync1(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    print(f"devices {jax.devices()}", file=sys.stderr, flush=True)
    spec = SlidingWindowSpec(roi=(ROI,) * 3, overlap=0.5, mode="gaussian")
    volume = 0.3 + 0.2 * jax.random.normal(jax.random.key(1), VOL + (1,), jnp.float32)

    # trivial predictor: 1->K16 broadcast of the input voxel, pp windows.
    # OPT-IN (ZROW_GLUE_TRIVIAL=1): with no real model in the walk, XLA's
    # buffer assignment keeps whole scan-stacked stages live and the compile
    # OOMs at 512^3 (21.5GB allocation) — use benchmarks/trace_zrow.py's
    # profiler rollup for glue attribution instead (ground truth).
    if os.environ.get("ZROW_GLUE_TRIVIAL", "0") == "1":
        kvec = jnp.linspace(0.5, 1.5, 16, dtype=jnp.float32)

        def trivial_apply(params, wins, wgt):
            out = (wins * wgt).astype(jnp.bfloat16) * kvec.astype(jnp.bfloat16)
            return ndhwc_to_pp_windows(out)

        t_glue = vol_reps(
            lambda v: swi_zrow.sliding_window_inference_zrow(
                None, v, trivial_apply, K, spec
            ),
            volume,
        )
        print(f"glue-only (trivial predictor): {t_glue*1e3:.1f} ms/vol "
              f"({t_glue/300*1e3:.3f} ms/window)", flush=True)

    # model-only at the walk's batch (g*n_w = 6 at config 4)
    model = unetr_b16(1, K, ROI, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, ROI, ROI, ROI, 1)))

    KCH = 30

    for b in (6,):
        x0 = 0.3 + 0.2 * jax.random.normal(jax.random.key(2), (b, ROI, ROI, ROI, 1), jnp.float32)
        wgt = jnp.ones((b, ROI, ROI, ROI, 1), jnp.float32)

        @jax.jit
        def loop(p, x, w):
            def body(c, _):
                o = fast_apply_v3(model, p, c, flat_k16=True, out_scale=w, pp=True)
                probe = (0.0 * o[0, 0, 0, 0, 0]).astype(c.dtype)
                return c + probe, ()
            fin, _ = jax.lax.scan(body, x, None, length=KCH)
            return fin

        sync1(loop(params, x0, wgt))
        t0 = time.perf_counter(); sync1(loop(params, x0, wgt))
        ms = (time.perf_counter() - t0) / KCH * 1e3
        print(f"model-only batch {b}: {ms:.2f} ms/call ({ms/b:.3f} ms/window; "
              f"x300 = {ms/b*300:.0f} ms/vol)", flush=True)

    # full pipeline for the cross-check
    def pp_apply(p, wins, wgt):
        return fast_apply_v3(model, p, wins, flat_k16=True, out_scale=wgt, pp=True)

    t_full = vol_reps(
        lambda p, v: swi_zrow.sliding_window_inference_zrow(p, v, pp_apply, K, spec),
        params, volume,
    )
    print(f"full zrow pipeline: {t_full*1e3:.1f} ms/vol", flush=True)


if __name__ == "__main__":
    main()
