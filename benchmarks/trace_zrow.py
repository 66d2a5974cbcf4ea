"""Profiler trace of one zrow serving volume (config 4) + device-op rollup.

The trace is ground truth for glue attribution (docs/PERF_NOTES.md
measurement gotchas). Writes /tmp/zrow_trace and prints the top device ops
grouped by fusion/kernel name.
"""
import glob, gzip, json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_medseg"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import numpy as np

from medseg.kernels.unetr_of import fast_apply_v3
from medseg.models.unetr import unetr_b16
from medseg.ops.sliding_window import SlidingWindowSpec
from medseg.ops import swi_zrow

ROI, K = 96, 14
VOL = (512, 512, 160)
TRACE = "/tmp/zrow_trace"


def sync1(x):
    # single-element getitem: a flat reshape of the tiled (D,H,W,14) output
    # compiles a relayout copy padded to 128 lanes = 21.5GB -> OOM
    return float(np.asarray(x[(0,) * x.ndim]))


def main():
    print(f"devices {jax.devices()}", file=sys.stderr, flush=True)
    spec = SlidingWindowSpec(roi=(ROI,) * 3, overlap=0.5, mode="gaussian")
    volume = 0.3 + 0.2 * jax.random.normal(jax.random.key(1), VOL + (1,), jnp.float32)
    model = unetr_b16(1, K, ROI, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, ROI, ROI, ROI, 1)))

    def pp_apply(p, wins, wgt):
        return fast_apply_v3(model, p, wins, flat_k16=True, out_scale=wgt, pp=True)

    run = lambda: swi_zrow.sliding_window_inference_zrow(params, volume, pp_apply, K, spec)
    sync1(run())  # compile
    t0 = time.perf_counter(); sync1(run())
    print(f"warm: {(time.perf_counter()-t0)*1e3:.0f} ms/vol", flush=True)

    os.system(f"rm -rf {TRACE}")
    jax.profiler.start_trace(TRACE)
    sync1(run())
    jax.profiler.stop_trace()

    # rollup
    paths = glob.glob(f"{TRACE}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace under {TRACE}"
    with gzip.open(paths[0], "rt") as f:
        tr = json.load(f)
    ev = [e for e in tr["traceEvents"] if e.get("ph") == "X"]
    # device lanes: pid whose thread names mention TensorCore / device
    names = {}
    for e in ev:
        cat = e.get("args", {}).get("device_type", "")
        pass
    # group by pid to find the busiest lane
    by_pid = {}
    for e in ev:
        by_pid.setdefault(e["pid"], 0.0)
        by_pid[e["pid"]] += e.get("dur", 0.0)
    # heuristics: the device pid has the largest total dur with op-like names
    meta = {e["pid"]: e["args"].get("name", "") for e in tr["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    print("\nlanes:", {p: (meta.get(p, ""), round(d / 1e3, 1)) for p, d in sorted(by_pid.items(), key=lambda kv: -kv[1])[:6]}, flush=True)
    dev_pids = [p for p in by_pid if "TPU" in meta.get(p, "") or "/device" in meta.get(p, "")]
    if not dev_pids:
        dev_pids = [max(by_pid, key=by_pid.get)]
    groups = {}
    total = 0.0
    for e in ev:
        if e["pid"] not in dev_pids:
            continue
        n = e["name"]
        dur = e.get("dur", 0.0)
        total += dur
        # collapse fusion indices: fusion.123 -> fusion; keep pallas names
        base = n.split(".")[0]
        groups[base] = groups.get(base, 0.0) + dur
    print(f"\ndevice total {total/1e3:.1f} ms; top groups:", flush=True)
    for nname, d in sorted(groups.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {nname:<52s} {d/1e3:9.2f} ms", flush=True)

    # also top individual ops
    singles = {}
    for e in ev:
        if e["pid"] in dev_pids:
            singles[e["name"]] = singles.get(e["name"], 0.0) + e.get("dur", 0.0)
    print("\ntop individual ops:", flush=True)
    for nname, d in sorted(singles.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {nname:<60s} {d/1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
