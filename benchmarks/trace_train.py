"""Profiler-trace attribution for the training step (fwd+bwd+AdamW).

Captures a jax.profiler trace of N train steps on TPU and aggregates
device-event durations by op category (conv fwd / conv bwd-data /
conv bwd-weights / matmul / elementwise-fusion / copy / reduce), so the
training-path optimization (VERDICT r2 item 5) attacks the real bind.
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_medseg"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from medseg.engine.state import create_train_state
from medseg.engine.train import make_train_step
from medseg.models.unetr import unetr_b16

ROI, K, B = 96, 14, 4
N_STEPS = 3


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    model = unetr_b16(1, K, ROI, dtype=jnp.bfloat16, remat=True)
    img = jax.random.normal(jax.random.key(2), (B, ROI, ROI, ROI, 1), jnp.float32)
    lab = jax.random.randint(jax.random.key(3), (B, ROI, ROI, ROI), 0, K)
    state = create_train_state(
        model, rng=jax.random.key(0), sample_input=img[:1],
        learning_rate=1e-4, weight_decay=1e-5,
    )
    step = make_train_step(model, task="ct", donate=False)
    batch = {"image": img, "label": lab}
    s2, loss = step(state, batch)
    print("warm loss", float(loss), flush=True)

    trace_dir = "/tmp/medseg_trace_train"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    for _ in range(N_STEPS):
        s2, loss = step(state, batch)
    float(loss)
    jax.profiler.stop_trace()

    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)

    # device-lane complete events only
    pids = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pids[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "/device" in n.lower()}

    total = defaultdict(float)
    examples = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1e3  # ms
        cat = classify(name)
        total[cat] += dur
        if dur > examples.get(cat, (0, ""))[0]:
            examples[cat] = (dur, name)
    grand = sum(total.values())
    print(f"\ndevice time over {N_STEPS} steps: {grand:.1f} ms "
          f"({grand / N_STEPS:.1f} ms/step)", flush=True)
    for cat, ms in sorted(total.items(), key=lambda kv: -kv[1]):
        ex = examples[cat]
        print(f"{cat:<28s} {ms / N_STEPS:8.1f} ms/step   biggest: "
              f"{ex[0]:.2f}ms {ex[1][:80]}", flush=True)


def classify(name: str) -> str:
    n = name.lower()
    if "convbackwardinput" in n or ("conv" in n and "transpose" in n and "grad" in n):
        return "conv bwd-data"
    if "convbackwardfilter" in n:
        return "conv bwd-weights"
    if n.startswith("%conv") or "convolution" in n or n.startswith("conv"):
        return "convolution"
    if "dot" in n or "matmul" in n or "gemm" in n:
        return "matmul"
    if "allreduce" in n or "psum" in n:
        return "collective"
    if "copy" in n or "transpose" in n or "reshape" in n or "bitcast" in n:
        return "copy/relayout"
    if "reduce" in n:
        return "reduce"
    if "fusion" in n or "loop" in n:
        return "fusion(elementwise/other)"
    if "scatter" in n or "gather" in n or "dynamic" in n:
        return "gather/scatter"
    return "other"


if __name__ == "__main__":
    main()
