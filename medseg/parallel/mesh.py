"""Device mesh and sharding helpers — the framework's communication layer.

The reference has NO distributed path at all (single CUDA device,
`/root/reference/unetr_segmentation_3d.py:499-500`; SURVEY.md §2.3). The
TPU-native design scales by data parallelism over a ``jax.sharding.Mesh``:

- the batch axis is sharded over the ``data`` mesh axis;
- parameters and optimizer state are replicated;
- gradient reduction is XLA's own all-reduce over ICI, inserted automatically
  when a jitted step consumes sharded batches and produces replicated
  parameter updates (no hand-written collectives needed — the compiler places
  ``psum`` on the data axis);
- eval-metric confusion counts reduce the same way.

A second ``model`` axis is plumbed through so tensor-parallel sharding could
be added without API changes, but ViT-B fits on one chip's HBM, so every
preset uses ``model=1`` (SURVEY.md §2.3 "TP: not needed").
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: int | None = None,
    *,
    model_parallel: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Create a (data, model) mesh over the available devices.

    With ``n_devices=None`` uses all local devices. ``model_parallel`` splits
    off an inner model axis (contiguous devices, so model-axis collectives ride
    the fastest ICI links).
    """
    devs = list(devices) if devices is not None else list(jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree onto the mesh, batch axis sharded over data."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def psum_metric_counts(mesh: Mesh, pred, target):
    """All-reduce eval confusion counts over the mesh data axis.

    The data-parallel eval path: each chip computes (B_local, C, 4)
    [tp, fp, tn, fn] counts for its batch shard, then one ``psum`` over ICI
    yields the global per-class totals on every chip (SURVEY.md §5.8 "eval
    metric reduction via psum of confusion counts"). Returns (C, 4) float32,
    replicated.
    """
    from jax import shard_map

    from medseg.ops.metrics import confusion_counts

    def local(pred, target):
        counts = confusion_counts(pred, target)  # (B_local, C, 4)
        return jax.lax.psum(jnp.sum(counts, axis=0), DATA_AXIS)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)(pred, target)
