"""Preprocessing throughput: host (C++/OpenMP, numpy) vs device resample.

The Spacingd chain on a realistic abdominal CT (512x512x148 at
0.76x0.76x3.0 mm -> 1 mm iso => 389x389x444 output, ~67M voxels) plus the
fused intensity window. Numbers go into docs/PERF_NOTES.md (VERDICT r2
item 4: "a measured preprocessing throughput number, volumes/s host vs
device").
"""

import os
import sys
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_medseg"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from medseg.data import transforms as T  # noqa: E402
from medseg.ops.resample import respace_device  # noqa: E402

SHAPE = (512, 512, 148)
AFFINE = np.diag([0.76, 0.76, 3.0, 1.0])
WINDOW = (-175.0, 250.0, 0.0, 1.0, True)


def main():
    rng = np.random.default_rng(0)
    data = (rng.normal(size=SHAPE) * 200).astype(np.float32)
    sample = {"image": data, "image_affine": AFFINE.copy()}

    # host: C++/OpenMP resample + host window
    t0 = time.perf_counter()
    host = T.respace(dict(sample), (1.0, 1.0, 1.0), keys=("image",), modes=("trilinear",))
    host = T.scale_intensity_range(host, *WINDOW[:4], clip=WINDOW[4])
    t_host = time.perf_counter() - t0
    out_shape = host["image"].shape
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        h = T.respace(dict(sample), (1.0, 1.0, 1.0), keys=("image",), modes=("trilinear",))
        h = T.scale_intensity_range(h, *WINDOW[:4], clip=WINDOW[4])
    t_host = (time.perf_counter() - t0) / reps
    print(f"host C++/OpenMP respace+window: {t_host*1e3:7.1f} ms/volume "
          f"({1/t_host:5.2f} vol/s), out {out_shape}", flush=True)

    # device: separable MXU resample with fused window (includes H2D of the
    # raw volume and the final device sync)
    def dev_run():
        out = respace_device(
            dict(sample), (1.0, 1.0, 1.0), keys=("image",),
            modes=("trilinear",), window=WINDOW,
        )
        img = out["image"]
        jax.block_until_ready(img)
        return float(np.asarray(img[0, 0, 0]))  # relay-safe sync

    dev_run()  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        dev_run()
    t_dev = (time.perf_counter() - t0) / reps
    print(f"device separable respace+window (incl. H2D): {t_dev*1e3:7.1f} ms/volume "
          f"({1/t_dev:5.2f} vol/s)", flush=True)
    print(f"device/host speedup: {t_host/t_dev:.2f}x", flush=True)


if __name__ == "__main__":
    main()
