"""Benchmark: sliding-window whole-volume inference, volumes/sec/chip.

BASELINE.json config 4: full-resolution 512x512x160 CT, UNETR-B/16 with 96^3
windows, 0.5 overlap, gaussian blending, 14 classes (BTCV abdominal), bf16
compute. The reference implementation is MONAI ``sliding_window_inference``
(a Python loop over window stacks) around a PyTorch UNETR
(`/root/reference/unetr_segmentation_3d.py:109,694`).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...audit
fields (flops_per_window_gf, tflops, mfu)}.

vs_baseline: the reference repo publishes no throughput numbers (BASELINE.md)
and this image has no A100, so the denominator (0.5 volumes/s) is derived
with explicit provenance in docs/BASELINE_MEASUREMENT.md: XLA-measured
125.7 GF/window, a same-host measurement of the torch+MONAI-contract SWI
loop (benchmarks/baseline_torch.py), and A100 fp16 utilization arithmetic
(0.37-0.83 vol/s band; 0.5 = center). The ">=5x vs A100 at Dice parity"
north-star corresponds to vs_baseline >= 5 (>= 2.5 volumes/s/chip).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: the 512^3 SWI program with the fused Pallas
# forward takes ~12 min to compile cold but reloads in seconds. Keep the
# cache out of git (~/.cache) but stable across bench invocations.
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_medseg"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

A100_PYTORCH_BASELINE_VOL_PER_SEC = 0.5  # derivation: docs/BASELINE_MEASUREMENT.md
FLOPS_PER_WINDOW = 125.74e9  # XLA cost analysis, docs/BASELINE_MEASUREMENT.md §1
V5E_PEAK_BF16_TFLOPS = 197.0  # TPU v5e chip peak (bf16)

VOLUME_SHAPE = (512, 512, 160)
ROI = 96
N_CLASSES = 14
OVERLAP = 0.5
# sw_batch sweep on the round-2 ppk pipeline: 2 -> 0.857, 4 -> 0.941,
# 8 -> 0.903, 12 -> 0.767 vol/s. 4 balances model batching against scatter
# serialization and memory pressure (and matches MONAI's own
# sw_batch_size=4 default at unetr_segmentation_3d.py:109).
SW_BATCH = int(os.environ.get("BENCH_SWB", "4"))
DEFAULT_FAST = "6"  # zrow pipeline (ops/swi_zrow.py)
WARMUP = 1
ITERS = 3


def main() -> None:
    from medseg.models.unetr import unetr_b16
    from medseg.ops.sliding_window import SlidingWindowSpec, sliding_window_inference

    fast = os.environ.get("BENCH_FAST", DEFAULT_FAST)
    if fast not in ("0", "2", "3", "4", "5", "6"):
        # fail loudly BEFORE any compile: an unknown value (e.g. the removed
        # round-1 "1") would otherwise run the plain-XLA path while the JSON
        # records the requested pipeline string — mislabeled measurements
        raise SystemExit(f"unknown BENCH_FAST={fast!r} (valid: 0,2,3,4,5,6)")

    print(f"devices: {jax.devices()}", file=sys.stderr)
    model = unetr_b16(in_channels=1, out_channels=N_CLASSES, crop_size=ROI, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x_init = jnp.zeros((SW_BATCH, ROI, ROI, ROI, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x_init)

    # Fast path selection: "6" (default) = v3 fused forward + z-row walk with
    # deferred overlap-add (no scatter at all, ops/swi_zrow.py); "5" = v3 +
    # parity-plane scatter ("ppk"); "4" = v3 + flat-K16 scatter; "3" = v3
    # channel-first; "2" = v2 fused forward; "0" = plain XLA. All
    # parity-tested in tests/test_conv_of.py + tests/test_swi_zrow.py.
    out_layout = "ndhwc"
    if fast == "6":
        from medseg.kernels.unetr_of import fast_apply_v3, serving_gelu_approx

        out_layout = "zrow"
        gelu = serving_gelu_approx()  # production serving default (TPU: on)

        def apply_fn(p, windows, wgt, zpack=1, w_fold=None):
            return fast_apply_v3(
                model, p, windows, flat_k16=True, out_scale=wgt, pp=True,
                gelu_approx=gelu, zpack=zpack, w_fold=w_fold,
            )
    elif fast == "5":
        # v3 + PARITY-PLANE full-res layout: the transpose-conv writes its
        # four (y, x)-parity planes as direct matmul slices (no interleaved
        # relayout), the scatter accumulates in plane order, one
        # deinterleave per volume (kernels/conv_of.py:_pp_ok)
        from medseg.kernels.unetr_of import fast_apply_v3, serving_gelu_approx

        out_layout = "ppk"
        gelu = serving_gelu_approx()

        def apply_fn(p, windows, wgt):
            return fast_apply_v3(
                model, p, windows, flat_k16=True, out_scale=wgt, pp=True,
                gelu_approx=gelu,
            )
    elif fast == "4":
        # v3 forward emitting bf16 NDHWC-K16 logits into the tile-aligned
        # flat (D, H, W*K16) scatter (misaligned-DUS fix, round-2); the
        # blend weight multiplies inside the out-head kernel epilogue
        from medseg.kernels.unetr_of import fast_apply_v3, serving_gelu_approx

        out_layout = "flatk"
        gelu = serving_gelu_approx()

        def apply_fn(p, windows, wgt):
            return fast_apply_v3(
                model, p, windows, flat_k16=True, out_scale=wgt,
                gelu_approx=gelu,
            )
    elif fast == "3":
        from medseg.kernels.unetr_of import fast_apply_v3

        out_layout = "ndchw"

        def apply_fn(p, windows):
            return fast_apply_v3(model, p, windows, channels_first=True)
    elif fast == "2":
        from medseg.kernels.unetr_of import fast_apply_v2

        def apply_fn(p, windows):
            return fast_apply_v2(model, p, windows)
    else:
        def apply_fn(p, windows):
            return model.apply(p, windows, return_encoder_features=False)

    spec = SlidingWindowSpec(
        roi=(ROI,) * 3, overlap=OVERLAP, sw_batch=SW_BATCH, mode="gaussian"
    )
    # generate the volume ON device — no host->device upload in the hot path
    volume = 0.3 + 0.2 * jax.random.normal(
        jax.random.key(1), VOLUME_SHAPE + (1,), jnp.float32
    )

    acc_dtype = os.environ.get(
        "BENCH_ACC", "bf16" if fast in ("4", "5", "6") else "fp32"
    )
    if fast == "6":
        from medseg.ops.swi_zrow import sliding_window_inference_zrow

        def run():
            return sliding_window_inference_zrow(
                params, volume, apply_fn, N_CLASSES, spec, acc_dtype=acc_dtype
            )
    else:
        def run():
            return sliding_window_inference(
                params, volume, apply_fn, N_CLASSES, spec, out_layout=out_layout,
                apply_takes_weight=fast in ("4", "5"),
                acc_dtype=acc_dtype,
            )

    def sync(x):
        # device->host fetch of a single element forces completion of the
        # whole dependency chain (block_until_ready is unreliable through
        # remote-TPU relays)
        return float(np.asarray(x[0, 0, 0, 0]))

    t0 = time.perf_counter()
    out = run()
    sync(out)
    compile_time = time.perf_counter() - t0
    print(f"first call (compile+run): {compile_time:.1f}s", file=sys.stderr)

    # measure fetch round-trip to subtract it from the timed loop
    t0 = time.perf_counter()
    sync(out)
    rtt = time.perf_counter() - t0

    reps = max(ITERS, 5)
    t0 = time.perf_counter()
    last = None
    for _ in range(reps):
        last = run()
    sync(last)  # all reps serialize on the single device stream
    total = time.perf_counter() - t0
    per_volume = max((total - rtt) / reps, 1e-9)
    print(f"fetch rtt {rtt:.3f}s; {reps} reps in {total:.3f}s", file=sys.stderr)
    vols_per_sec = 1.0 / per_volume
    n_windows = _count_windows()
    windows_per_sec = n_windows / per_volume
    tflops = windows_per_sec * FLOPS_PER_WINDOW / 1e12
    mfu = tflops / V5E_PEAK_BF16_TFLOPS
    print(
        f"median {per_volume:.3f}s/volume ({n_windows} windows, "
        f"{windows_per_sec:.1f} windows/sec), out {out.shape} {out.dtype}; "
        f"{FLOPS_PER_WINDOW / 1e9:.1f} GF/window -> {tflops:.2f} TF/s "
        f"achieved = {mfu * 100:.1f}% MFU (v5e bf16 peak {V5E_PEAK_BF16_TFLOPS} TF/s)",
        file=sys.stderr,
    )

    # secondary configs (BASELINE.json 1/2/3/5), each failure-isolated so the
    # headline metric always emits; skip with BENCH_ONLY=4
    configs: dict = {
        "4_full_res_swi": {
            "volumes_per_sec": round(vols_per_sec, 4),
            "windows_per_sec": round(windows_per_sec, 1),
            "pipeline": f"BENCH_FAST={fast}",
            "kernel_env": {
                k: os.environ[k]
                for k in (
                    "MEDSEG_MANUAL_FETCH", "MEDSEG_UP_DIRECT",
                    "MEDSEG_ZB16", "MEDSEG_ZB32", "BENCH_SWB",
                    "MEDSEG_ZROW_TB", "MEDSEG_FAST_GELU",
                )
                if k in os.environ
            },
            "manual_ring": _manual_ring_resolved(),
            "gelu_approx": _gelu_resolved(),
        }
    }
    if os.environ.get("BENCH_ONLY", "") != "4":
        for key, fn in (
            ("1_fwd_dice_96", _config1_forward_dice),
            ("2_spleen_finetune_step", lambda: _train_step_throughput(2, 2)),
            ("3_ranking_pretrain_step", _config3_pretrain),
            ("5_dp_virtual_mesh", _config5_dp_virtual),
            ("6_pretrain_wallclock", _config6_pretrain_wallclock),
            ("7_e2e_infer", _config7_e2e_infer),
            ("8_brats_swi", _config8_brats_swi),
            ("9_brats_finetune_step", _config9_brats_finetune),
            ("train_btcv_step", lambda: _train_step_throughput(N_CLASSES, 4)),
        ):
            t0 = time.perf_counter()
            try:
                configs[key] = fn()
            except Exception as e:  # keep the primary metric robust
                configs[key] = {"error": str(e)[:200]}
            print(
                f"config {key}: {configs[key]} ({time.perf_counter()-t0:.0f}s)",
                file=sys.stderr,
            )
    print(
        json.dumps(
            {
                "metric": "swi_volumes_per_sec_per_chip",
                "value": round(vols_per_sec, 4),
                "unit": "volumes/sec",
                "vs_baseline": round(vols_per_sec / A100_PYTORCH_BASELINE_VOL_PER_SEC, 3),
                # honest margin at both edges of the derived A100 band
                # (0.37-0.83 vol/s, docs/BASELINE_MEASUREMENT.md §3)
                "vs_baseline_band": {
                    "low_edge_0.83": round(vols_per_sec / 0.83, 3),
                    "high_edge_0.37": round(vols_per_sec / 0.37, 3),
                },
                "flops_per_window_gf": round(FLOPS_PER_WINDOW / 1e9, 1),
                "tflops": round(tflops, 2),
                "mfu": round(mfu, 4),
                "configs": configs,
            }
        )
    )


def _manual_ring_resolved() -> bool:
    """The resolved manual-DMA-ring default (env override or TPU-backend
    default) — recorded in the JSON so headline numbers are attributable
    even when no kernel env vars are set."""
    from medseg.kernels.conv_of import _manual_fetch_on

    return _manual_fetch_on()


def _gelu_resolved() -> bool:
    """The resolved serving GELU mode (tanh-approx on TPU by default,
    MEDSEG_FAST_GELU overrides) — recorded in the JSON audit trail."""
    from medseg.kernels.unetr_of import serving_gelu_approx

    return serving_gelu_approx()


def _train_step_throughput(n_classes: int, batch: int) -> dict:
    """Train-step timing (fwd+bwd+AdamW, bf16+remat) at 96^3 crops."""
    from medseg.engine.state import create_train_state
    from medseg.engine.train import make_train_step
    from medseg.models.unetr import unetr_b16

    model = unetr_b16(1, n_classes, ROI, dtype=jnp.bfloat16, remat=True)
    img = jax.random.normal(jax.random.key(2), (batch, ROI, ROI, ROI, 1), jnp.float32)
    lab = jax.random.randint(jax.random.key(3), (batch, ROI, ROI, ROI), 0, n_classes)
    state = create_train_state(
        model, rng=jax.random.key(0), sample_input=img[:1],
        learning_rate=1e-4, weight_decay=1e-5,
    )
    step = make_train_step(model, task="ct", donate=True)
    b = {"image": img, "label": lab}
    state, loss = step(state, b)
    float(loss)
    n = 6
    t0 = time.perf_counter()
    for _ in range(n):
        state, loss = step(state, b)
    float(loss)
    dt = (time.perf_counter() - t0) / n
    return {
        "ms_per_step": round(dt * 1e3, 1),
        "patches_per_sec": round(batch / dt, 2),
        "batch": batch,
        "n_classes": n_classes,
    }


def _config1_forward_dice() -> dict:
    """Config 1: UNETR-base forward + Dice loss, one 96^3 volume, batch 1."""
    from medseg.models.unetr import unetr_b16
    from medseg.ops.losses import dice_ce_loss

    model = unetr_b16(1, N_CLASSES, ROI, dtype=jnp.bfloat16)
    img = jax.random.normal(jax.random.key(4), (1, ROI, ROI, ROI, 1), jnp.float32)
    lab = jax.random.randint(jax.random.key(5), (1, ROI, ROI, ROI), 0, N_CLASSES)
    params = jax.jit(model.init)(jax.random.key(0), img)

    @jax.jit
    def fwd(p, x, y):
        logits = model.apply(p, x, return_encoder_features=False)
        return dice_ce_loss(logits, y, softmax=True, to_onehot_y=True)

    float(fwd(params, img, lab))
    n = 8
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(params, img, lab)
    float(out)
    dt = (time.perf_counter() - t0) / n
    return {"ms_per_fwd_dice": round(dt * 1e3, 1), "patches_per_sec": round(1 / dt, 2)}


def _config3_pretrain() -> dict:
    """Config 3: ranking pretraining step (feat stage), batch 4 @96^3."""
    from medseg.engine.pretrain import make_pretrain_step
    from medseg.engine.state import create_train_state
    from medseg.models.unetr import unetr_b16

    model = unetr_b16(1, 2, ROI, dtype=jnp.bfloat16, remat=True)
    img = jax.random.normal(jax.random.key(6), (4, ROI, ROI, ROI, 1), jnp.float32)
    state = create_train_state(
        model, rng=jax.random.key(0), sample_input=img[:1],
        learning_rate=1e-4, weight_decay=1e-5,
    )
    step = make_pretrain_step(
        model, update_arc="feat", loss_type="ranking",
        num_partitions=4, temperature=0.1, donate=True,
    )
    idx = jnp.asarray([0, 1, 2, 3]) * (ROI // 8 // 4)
    state, loss = step(state, img, idx, axis=0)
    float(loss)
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        state, loss = step(state, img, idx, axis=0)
    float(loss)
    dt = (time.perf_counter() - t0) / n
    return {"ms_per_step_feat": round(dt * 1e3, 1), "steps_per_sec": round(1 / dt, 2)}


def _config6_pretrain_wallclock() -> dict:
    """Two-stage (feat -> recon) ranking pretraining run to the reference
    convergence rule on a synthetic dataset — the repo's wall-clock answer to
    the paper's Table 1 (0.3 h Comp. vs 5.27 h Cont. on Task 9, 1x V100;
    `unetr_ranking_pretraining_3d.py:238-296,527-601`, BASELINE.md).

    Full-size UNETR-B/16 at 96^3 crops, batch 4 (2 volumes x 2 crops),
    num_partitions=4, rtol=1e-2, window=10, max 250 epochs — the reference's
    exact stage loop, minus NIfTI decode (synthetic device-resident crops) so
    the number isolates the compute the paper's Table 1 measures.
    """
    from medseg.engine.pretrain import (
        ConvergenceTracker,
        feature_dim_for_axis,
        make_pretrain_step,
    )
    from medseg.engine.state import create_train_state
    from medseg.models.unetr import unetr_b16
    from medseg.ops.ranking import sample_partition_indices

    model = unetr_b16(1, 2, ROI, dtype=jnp.bfloat16, remat=True)
    rng = np.random.default_rng(7)
    # 8 synthetic unlabeled volumes -> 4 loader batches of 2 volumes x 2 crops
    batches = [
        jnp.asarray(rng.normal(0.3, 0.2, size=(4, ROI, ROI, ROI, 1)), jnp.float32)
        for _ in range(4)
    ]
    state = create_train_state(
        model, rng=jax.random.key(0), sample_input=batches[0][:1],
        learning_rate=1e-4, weight_decay=1e-5,
    )
    out: dict = {}
    total = 0.0
    for arc in ("feat", "recon"):
        step = make_pretrain_step(
            model, update_arc=arc, loss_type="ranking",
            num_partitions=4, temperature=0.1, donate=True,
        )
        # compile outside the clock (the reference pays no compile; steady-
        # state is what Table 1's hours measure)
        np_rng = np.random.default_rng(11)
        for axis in (0, 1, 2):
            dim = feature_dim_for_axis(ROI, arc, axis)
            idx = jnp.asarray(sample_partition_indices(np_rng, dim, 4))
            state, loss = step(state, batches[0], idx, axis=axis)
        float(loss)
        tracker = ConvergenceTracker(rtol=1e-2, window=10, max_iterations=250)
        steps = 0
        step_times: list[float] = []
        stage_cap_s = float(os.environ.get("BENCH_PRETRAIN_CAP_S", "240"))
        t_stage = time.perf_counter()
        while not tracker.converged:
            if time.perf_counter() - t_stage > stage_cap_s:
                out[f"{arc}_capped"] = True  # convergence-rule run time-boxed
                break
            axis_losses = []
            for axis in (0, 1, 2):
                dim = feature_dim_for_axis(ROI, arc, axis)
                axis_loss = 0.0
                for b in batches:
                    idx = jnp.asarray(sample_partition_indices(np_rng, dim, 4))
                    t0 = time.perf_counter()
                    state, loss = step(state, b, idx, axis=axis)
                    axis_loss += float(loss)  # blocks, like the reference
                    step_times.append(time.perf_counter() - t0)
                    steps += 1
                axis_losses.append(axis_loss / len(batches))
            tracker.update(float(np.mean(axis_losses)))
        stage_s = time.perf_counter() - t_stage
        total += stage_s
        out[f"{arc}_seconds"] = round(stage_s, 1)
        out[f"{arc}_epochs"] = tracker.iterations
        out[f"{arc}_steps"] = steps
        out[f"ms_per_step_{arc}"] = round(
            1e3 * float(np.median(step_times)), 1
        )
    out["total_seconds"] = round(total, 1)
    out["ref_table1_task9_hours"] = {"comparative": 0.3, "contrastive": 5.27}
    return out


def _config7_e2e_infer() -> dict:
    """Config 7: END-TO-END serving through the infer CLI — NIfTI decode +
    preprocess + SWI + mask post + NIfTI write, over synthetic 512x512x160 CT
    volumes (the reference pipeline scope, `unetr_segmentation_3d.py:322-400`
    + `:109`). The synthetic dataset + checkpoint are cached across bench
    runs (~/.cache/medseg_bench)."""
    import pathlib

    from medseg.cli import infer as infer_cli
    from medseg.data.nifti import write_nifti as _wn

    cache = pathlib.Path(os.path.expanduser("~/.cache/medseg_bench"))
    data_root = cache / "data"
    ds = data_root / "BenchCT"
    n_vols = 4
    if not (ds / "dataset.json").exists():
        (ds / "imagesTr").mkdir(parents=True, exist_ok=True)
        rng = np.random.default_rng(0)
        entries = []
        for i in range(n_vols):
            img = rng.normal(100.0, 80.0, size=VOLUME_SHAPE).astype(np.float32)
            _wn(str(ds / "imagesTr" / f"v{i}.nii.gz"), img)
            entries.append({"image": f"imagesTr/v{i}.nii.gz",
                            "label": f"imagesTr/v{i}.nii.gz"})
        with open(ds / "dataset.json", "w") as f:
            json.dump({"training": entries}, f)
    ckpt_dir = cache / "ckpt_btcv"
    if not (ckpt_dir / "best").exists():
        from medseg.engine.checkpoint import CheckpointManager
        from medseg.engine.state import create_train_state
        from medseg.models.unetr import unetr_b16

        model = unetr_b16(1, N_CLASSES, ROI, dtype=jnp.bfloat16)
        state = create_train_state(
            model, rng=jax.random.key(0),
            sample_input=jnp.zeros((1, ROI, ROI, ROI, 1), jnp.float32),
            learning_rate=1e-4, weight_decay=1e-5,
        )
        CheckpointManager(str(ckpt_dir)).save(state, block=True)
    out_dir = cache / "out"
    stats_path = cache / "e2e_stats.json"
    infer_cli.main([
        str(data_root), "BenchCT", str(ckpt_dir), str(out_dir),
        str(N_CLASSES), "--bf16", "--sw-overlap", str(OVERLAP),
        "--sw-mode", "gaussian", "--stats-json", str(stats_path),
    ])
    with open(stats_path) as f:
        stats = json.load(f)
    stats["note"] = "decode+preprocess+SWI+mask+write vol/s, first (compile) volume excluded"
    return stats


def _config8_brats_swi() -> dict:
    """Config 8: the BraTS half of Table 1 — 4-modality MRI serving at the
    reference flagship shape (240x240x155 native, 128^3 windows, sigmoid;
    `unetr_segmentation_3d.py:309-318,407-482`). Multi-channel input routes
    to the exact flax forward (the fused chain is C_in=1-only, round-5
    gate), so this measures the XLA path."""
    from medseg.engine.evaluate import Validator
    from medseg.models.unetr import unetr_b16
    from medseg.ops.sliding_window import SlidingWindowSpec

    roi, k = 128, 4
    model = unetr_b16(4, k, roi, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, roi, roi, roi, 4), jnp.float32)
    )
    spec = SlidingWindowSpec(roi=(roi,) * 3, overlap=OVERLAP, sw_batch=4,
                             mode="gaussian")
    validator = Validator(model, k, "mri", spec, acc_dtype="bf16")
    vol = 0.3 * jax.random.normal(
        jax.random.key(1), (240, 240, 155, 4), jnp.float32
    )
    logits = validator.infer_volume(params, vol)
    float(np.asarray(logits[0, 0, 0, 0]))  # compile + run
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        logits = validator.infer_volume(params, vol)
    float(np.asarray(logits[0, 0, 0, 0]))
    dt = (time.perf_counter() - t0) / reps
    from medseg.ops.sliding_window import compute_window_starts

    n_win = len(compute_window_starts(
        tuple(max(s, roi) for s in (240, 240, 155)), (roi,) * 3, OVERLAP
    ))
    return {
        "volumes_per_sec": round(1.0 / dt, 4),
        "windows_per_sec": round(n_win / dt, 1),
        "n_windows": n_win,
        "pipeline": "exact flax (multi-channel gate)",
    }


def _config9_brats_finetune() -> dict:
    """Config 9: BraTS fine-tune step (4-ch 128^3 crops, sigmoid DiceCE) —
    the training half of Table 1's Task-1 rows."""
    return _train_step_throughput_cfg(
        n_classes=4, batch=2, roi=128, in_ch=4, task="mri"
    )


def _train_step_throughput_cfg(
    n_classes: int, batch: int, roi: int, in_ch: int, task: str
) -> dict:
    from medseg.engine.state import create_train_state
    from medseg.engine.train import make_train_step
    from medseg.models.unetr import unetr_b16

    model = unetr_b16(in_ch, n_classes, roi, dtype=jnp.bfloat16, remat=True)
    img = jax.random.normal(
        jax.random.key(2), (batch, roi, roi, roi, in_ch), jnp.float32
    )
    if task == "ct":
        lab = jax.random.randint(
            jax.random.key(3), (batch, roi, roi, roi), 0, n_classes
        )
    else:
        lab = (
            jax.random.uniform(jax.random.key(3), (batch, roi, roi, roi, n_classes))
            > 0.7
        ).astype(jnp.float32)
    state = create_train_state(
        model, rng=jax.random.key(0), sample_input=img[:1],
        learning_rate=1e-4, weight_decay=1e-5,
    )
    step = make_train_step(model, task=task, donate=True)
    b = {"image": img, "label": lab}
    state, loss = step(state, b)
    float(loss)
    n = 6
    t0 = time.perf_counter()
    for _ in range(n):
        state, loss = step(state, b)
    float(loss)
    dt = (time.perf_counter() - t0) / n
    return {
        "ms_per_step": round(dt * 1e3, 1),
        "patches_per_sec": round(batch / dt, 2),
        "batch": batch,
        "n_classes": n_classes,
        "roi": roi,
        "in_channels": in_ch,
    }


def _config5_dp_virtual() -> dict:
    """Config 5: data-parallel step scaling, SIMULATED on a virtual 8-device
    CPU mesh (no multi-chip hardware in this environment — labeled as such;
    the real-slice path is the same code via medseg/parallel/runtime.py)."""
    import subprocess

    code = (
        "import __graft_entry__ as g, time, json;"
        "t0=time.time(); g.dryrun_multichip(8);"
        "print(json.dumps({'dryrun_8dev_seconds': round(time.time()-t0, 1)}))"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-300:])
    data = json.loads(out.stdout.strip().splitlines()[-1])
    data["note"] = (
        "correctness smoke, not a scaling number: wall-seconds of the full "
        "sharded train-step dryrun on a virtual 8-device CPU mesh (no "
        "multi-chip hardware in this environment)"
    )
    return data


def _count_windows() -> int:
    from medseg.ops.sliding_window import compute_window_starts

    padded = tuple(max(s, ROI) for s in VOLUME_SHAPE)
    return len(compute_window_starts(padded, (ROI,) * 3, OVERLAP))


if __name__ == "__main__":
    main()
