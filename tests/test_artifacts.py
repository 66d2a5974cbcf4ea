"""Run-artifact tests: logs, metric dumps, curve plots, slice overlays."""

import json
import os

import numpy as np

from medseg.utils.artifacts import (
    RunLogger,
    plot_loss_vs_time,
    plot_training_curves,
    save_metric_series,
    save_slice_overlays,
    select_overlay_slices,
)
from medseg.utils.profiling import StepTimer, Throughput


def test_run_logger(tmp_path):
    lg = RunLogger(str(tmp_path), "run")
    lg.write("hello")
    lg.write("world")
    lg.event("final_metrics", fold=0, dice=0.9)
    text = open(lg.text_path).read()
    assert text == "hello\nworld\n"
    events = [json.loads(l) for l in open(lg.jsonl_path)]
    assert events[0]["kind"] == "final_metrics"
    assert events[0]["dice"] == 0.9


def test_metric_series_and_plots(tmp_path):
    save_metric_series(str(tmp_path), "run", {"loss": [3.0, 2.0, 1.0], "dice": [0.5, 0.7]})
    assert np.load(tmp_path / "run_loss.npy").tolist() == [3.0, 2.0, 1.0]
    plot_training_curves(str(tmp_path / "curves.png"), [3, 2, 1], [0.5, 0.7], 500)
    plot_loss_vs_time(str(tmp_path / "lvt.png"), [3, 2, 1], [1.0, 1.1, 0.9])
    assert os.path.getsize(tmp_path / "curves.png") > 0
    assert os.path.getsize(tmp_path / "lvt.png") > 0


def test_overlay_slice_selection_and_pdf(tmp_path, rng):
    image = rng.normal(size=(16, 16, 8)).astype(np.float32)
    label = np.zeros((16, 16, 8), np.int64)
    pred = np.zeros_like(label)
    label[4:8, 4:8, 2:5] = 1
    pred[5:9, 5:9, 2:5] = 1
    slices = select_overlay_slices(label, pred, n_classes=2)
    assert slices == [2, 3, 4]
    n = save_slice_overlays(str(tmp_path / "ov.pdf"), image, label, pred, 2)
    assert n == 3
    assert os.path.getsize(tmp_path / "ov.pdf") > 0


def test_step_timer_and_throughput():
    import time

    t = StepTimer()
    for _ in range(3):
        with t:
            time.sleep(0.01)
    assert 0.005 < t.mean < 0.1
    assert t.total > 0.02

    tp = Throughput()
    tp.update(4)
    time.sleep(0.01)
    tp.update(4)
    assert tp.rate > 0
