from medseg.utils.artifacts import (
    RunLogger,
    save_metric_series,
    plot_training_curves,
    plot_loss_vs_time,
    save_slice_overlays,
)
from medseg.utils.profiling import StepTimer, Throughput

__all__ = [
    "RunLogger",
    "save_metric_series",
    "plot_training_curves",
    "plot_loss_vs_time",
    "save_slice_overlays",
    "StepTimer",
    "Throughput",
]
