"""Elastic recovery: scheduled "latest" saves, crash-resume, CLI smoke.

The reference's only failure handling is reload-best-and-reset-step
(`/root/reference/unetr_segmentation_3d.py:612-615`); SURVEY.md §5 asks the
rebuild to exceed it with full-train-state scheduled checkpoints and
freshest-wins resume. These tests pin that behavior, plus the pretraining
resume iteration accounting (`unetr_ranking_pretraining_3d.py:539-540`
intent) and a sub-minute default-set CLI smoke so `pytest -m "not slow"`
exercises the drivers.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medseg.engine.checkpoint import CheckpointManager
from medseg.engine.state import create_train_state
from medseg.engine.train import TrainLoop, make_train_step
from medseg.models.unetr import UNETR

TINY_CLI = [
    "--crop-size", "16",
    "--feature-size", "2",
    "--hidden-size", "16",
    "--mlp-dim", "32",
    "--num-heads", "2",
    "--num-layers", "2",
    "--num-workers", "0",
]


def tiny_model():
    return UNETR(
        in_channels=1, out_channels=2, img_size=(16, 16, 16),
        feature_size=2, hidden_size=16, mlp_dim=32, num_heads=2, num_layers=2,
    )


def tiny_state(model, seed=0):
    sample = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)
    return create_train_state(
        model, rng=jax.random.key(seed), sample_input=sample,
        learning_rate=1e-3, weight_decay=1e-5,
    )


def batch_iter(rng, n):
    for _ in range(n):
        yield {
            "image": jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)), jnp.float32),
            "label": jnp.asarray(rng.integers(0, 2, size=(1, 16, 16, 16))),
        }


def test_crash_resume_from_latest(tmp_path):
    """Kill training mid-interval; the restart resumes from the scheduled
    'latest' save with step AND optimizer state intact (not from the older
    best, not from scratch)."""
    model = tiny_model()
    state = tiny_state(model)
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    step_fn = make_train_step(model, task="ct")

    crash_at = 5

    def crashing_step(s, b):
        if int(s.step) + 1 == crash_at:
            raise RuntimeError("simulated mid-interval crash")
        return step_fn(s, b)

    loop = TrainLoop(
        crashing_step, max_iterations=10, eval_num=2, checkpointer=ckpt,
        validator=lambda s: 0.1,  # constant metric: best saved once, at step 2
        save_latest_every=2, log_fn=lambda m: None,
    )
    rng = np.random.default_rng(0)
    with pytest.raises(RuntimeError, match="simulated"):
        loop.run(state, batch_iter(rng, 10))
    ckpt.wait()
    assert ckpt.exists("best") and ckpt.exists("latest")

    # fresh process: new state structure, restore the freshest checkpoint
    state2 = tiny_state(model, seed=1)
    state2 = ckpt.restore_freshest(state2)
    assert int(state2.step) == 4  # last scheduled save before the crash
    # optimizer state came back too (non-zero AdamW moments)
    mu_leaves = jax.tree.leaves(state2.opt_state)
    assert any(float(jnp.abs(l).max()) > 0 for l in mu_leaves if hasattr(l, "max"))

    # and the loop continues counting from the restored step
    loop2 = TrainLoop(
        step_fn, max_iterations=6, eval_num=100, checkpointer=None,
        log_fn=lambda m: None,
    )
    state2 = loop2.run(state2, batch_iter(rng, 10))
    assert int(state2.step) == 6


def test_restore_freshest_prefers_newer_best(tmp_path):
    """When the best checkpoint is NEWER than latest (normal completion),
    freshest-wins restores best."""
    model = tiny_model()
    state = tiny_state(model)
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    step_fn = make_train_step(model, task="ct")
    rng = np.random.default_rng(0)
    for b in batch_iter(rng, 2):
        state, _ = step_fn(state, b)
    ckpt.save(state, name="latest")  # step 2
    for b in batch_iter(rng, 1):
        state, _ = step_fn(state, b)
    ckpt.save(state, metrics={"dice": 0.5})  # best at step 3
    ckpt.wait()

    restored = ckpt.restore_freshest(tiny_state(model, seed=2))
    assert int(restored.step) == 3


def test_convergence_tracker_resume_accounting():
    """A resumed pretraining stage carries its consumed epoch budget
    (reference intent at `unetr_ranking_pretraining_3d.py:539-540`)."""
    from medseg.engine.pretrain import ConvergenceTracker

    t = ConvergenceTracker(rtol=1e-2, window=10, max_iterations=5)
    t.iterations = 5  # consumed in the crashed run
    assert t.converged  # no budget left: stage is skipped on resume
    t2 = ConvergenceTracker(rtol=1e-2, window=10, max_iterations=5)
    t2.iterations = 3
    assert not t2.converged
    t2.update(1.0)
    t2.update(1.0)
    assert t2.converged  # exactly 2 more epochs ran


def make_smoke_dataset(tmp_path, n=2, shape=(20, 20, 20)):
    from medseg.data.nifti import write_nifti

    rng = np.random.default_rng(0)
    root = tmp_path / "data" / "SmokeCT"
    (root / "imagesTr").mkdir(parents=True)
    (root / "labelsTr").mkdir(parents=True)
    entries = []
    for i in range(n):
        img = rng.normal(100.0, 80.0, size=shape).astype(np.float32)
        lab = np.zeros(shape, np.float32)
        lab[4:12, 4:12, 4:12] = 1.0
        write_nifti(str(root / "imagesTr" / f"i{i}.nii.gz"), img)
        write_nifti(str(root / "labelsTr" / f"l{i}.nii.gz"), lab)
        entries.append(
            {"image": f"imagesTr/i{i}.nii.gz", "label": f"labelsTr/l{i}.nii.gz"}
        )
    with open(root / "dataset.json", "w") as f:
        json.dump({"training": entries}, f)
    return str(tmp_path / "data")


def test_segmentation_cli_smoke(tmp_path):
    """Sub-minute driver smoke in the DEFAULT test set: tiny model, 2
    volumes, 1 fold, 2 steps — catches CLI wiring regressions that the
    slow-marked end-to-end tests only see in full runs."""
    from medseg.cli.segmentation import main

    data_dir = make_smoke_dataset(tmp_path)
    out_root = str(tmp_path / "results")
    results = main(
        [
            data_dir, "SmokeCT", out_root, "2", "", "train", "1e6", "1e-3",
            "--folds", "2", "--max-folds", "1",
            "--max-iterations", "2", "--eval-num", "2",
            "--save-latest-every", "1",
        ]
        + TINY_CLI
    )
    assert len(results) == 1 and np.isfinite(results[0]["dice"])
    ckdir = os.path.join(out_root, "SmokeCT_0", "checkpoints")
    assert os.path.isdir(os.path.join(ckdir, "best"))
    assert os.path.isdir(os.path.join(ckdir, "latest"))


def test_resume_does_not_demote_best(tmp_path):
    """Round-4 advisor: a resumed run must seed best-so-far from the sidecar
    metadata, so the first post-resume validation only saves as 'best' on a
    genuine improvement. Without the seed, best_metric restarts at -1 and a
    WORSE post-resume Dice silently overwrites the historical best."""
    from medseg.cli.segmentation import main

    data_dir = make_smoke_dataset(tmp_path)
    out_root = str(tmp_path / "results")
    common = [
        data_dir, "SmokeCT", out_root, "2", "", "train", "1e6", "1e-3",
        "--folds", "2", "--max-folds", "1", "--eval-num", "2",
        "--save-latest-every", "1",
    ] + TINY_CLI
    main(common + ["--max-iterations", "2"])

    # pretend the first run achieved an unbeatable best
    meta_path = os.path.join(out_root, "SmokeCT_0", "checkpoints", "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta["dice"] = 2.0
    with open(meta_path, "w") as f:
        json.dump(meta, f)

    main(common + ["--max-iterations", "4"])  # resumes from step 2
    with open(meta_path) as f:
        meta2 = json.load(f)
    assert meta2["dice"] == 2.0  # worse resumed validation did not demote it


def test_pretrain_stage_skip_when_completed(tmp_path):
    """Round-4 advisor: a pretraining stage that CONVERGED early (plateau,
    epochs < max_iterations) must be skipped on resume, not re-entered for
    another plateau window. The final save stamps completed=1; run_stage
    returns before touching the loader (loader=None proves it)."""
    from medseg.cli.pretraining import build_parser, run_stage
    from medseg.config import preset
    from medseg.utils.artifacts import RunLogger

    args = build_parser().parse_args(
        [
            str(tmp_path / "data"), "TinyCT", str(tmp_path / "out"), "2",
            "1e-3", "0.1", "ranking", "--max-iterations", "3",
            "--crop-size", "16", "--feature-size", "2", "--hidden-size", "16",
            "--mlp-dim", "32", "--num-heads", "2", "--num-layers", "2",
            "--no-progress",
        ]
    )
    cfg = preset("TinyCT", 2)
    model = tiny_model()
    state = tiny_state(model)
    out_dir = str(tmp_path / "out" / "TinyCT_0")
    os.makedirs(out_dir, exist_ok=True)
    prefix = f"feat_lr_{args.learning_rate}_temp_{args.temperature}"
    ckpt = CheckpointManager(os.path.join(out_dir, prefix))
    # converged after 2 of 3 allowed epochs in the "previous run"
    ckpt.save(state, metrics={"epoch": 2, "completed": 1}, block=True)

    logger = RunLogger(out_dir, "pretrain_test")
    out_state = run_stage(
        args, cfg, model, tiny_state(model, seed=3), None, "feat", out_dir, logger
    )
    # restored the completed stage's weights without training
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(out_state.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )
    assert int(out_state.step) == int(state.step)
