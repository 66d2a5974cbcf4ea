"""Multi-host runtime bring-up: distributed init + per-host data sharding.

BASELINE config 5 is a v5e-16 slice — 4 hosts x 4 chips. The reference is
strictly single-process (`/root/reference/unetr_segmentation_3d.py:499-500`;
its only concurrency is 4 DataLoader workers, `:586-592`); the TPU-native
scale-out (SURVEY.md §2.3/§5.8) is:

- one JAX process per host, joined via ``jax.distributed.initialize``
  (``initialize_distributed`` below; on TPU pods every argument
  auto-detects from the metadata server, so a bare call suffices);
- a global (data, model) mesh over ``jax.devices()`` (global after init —
  ``medseg.parallel.mesh.make_mesh`` already spans it);
- the input pipeline sharded per host (``shard_datalist``: each process
  loads only its ``rank::world`` slice of the datalist) feeding
  process-local batches assembled into globally-sharded arrays
  (``shard_batch_multihost`` -> ``jax.make_array_from_process_local_data``);
- gradient/metric reductions unchanged — XLA places the same ``psum`` over
  ICI (intra-host) and DCN (cross-host) from the sharding annotations.

Launch recipe (documented for v5e-16, unchanged code)::

    # on each of the 4 hosts (TPU runtime auto-detects all arguments):
    python -m medseg.cli.segmentation ... --data-parallel

Tested without a cluster via N OS processes of virtual CPU devices
(tests/test_multihost.py) — Gloo backs the cross-process collectives.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import numpy as np

from medseg.parallel.mesh import batch_sharding, make_mesh, replicated_sharding


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: Sequence[int] | None = None,
) -> None:
    """Join (or bootstrap) the multi-process runtime.

    On a real TPU pod slice every argument is auto-detected (set
    ``MEDSEG_DISTRIBUTED=1`` or pass arguments to opt in); on CPU/GPU (or in
    the multi-process CPU simulation) pass them explicitly or via the
    ``MEDSEG_COORDINATOR`` / ``MEDSEG_NUM_PROCESSES`` / ``MEDSEG_PROCESS_ID``
    environment variables. Must run before the first backend touch (any
    ``jax.devices()``/computation — a JAX constraint); safe to call when
    already initialized (no-op) and in single-process runs.
    """
    if jax.distributed.is_initialized():
        return
    coordinator_address = coordinator_address or os.environ.get("MEDSEG_COORDINATOR")
    if num_processes is None and "MEDSEG_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["MEDSEG_NUM_PROCESSES"])
    if process_id is None and "MEDSEG_PROCESS_ID" in os.environ:
        process_id = int(os.environ["MEDSEG_PROCESS_ID"])
    if num_processes == 1:
        return  # single-process run: nothing to join
    if (
        coordinator_address is None
        and num_processes is None
        and process_id is None
        and os.environ.get("MEDSEG_DISTRIBUTED", "0") != "1"
    ):
        # No explicit multi-process config and no opt-in: leave the runtime
        # single-process (the common single-host case; TPU pod launchers set
        # MEDSEG_DISTRIBUTED=1 and let jax auto-detect the rest).
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def process_info() -> tuple[int, int]:
    """(process_index, process_count) of this host."""
    return jax.process_index(), jax.process_count()


def barrier(name: str = "barrier") -> None:
    """Cross-host synchronization point. No-op with one process; otherwise
    blocks until every process reaches the same named point (used e.g.
    between rank 0 committing a checkpoint and other ranks reading it off
    the shared filesystem)."""
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def shard_datalist(items: list, process_index: int | None = None,
                   process_count: int | None = None) -> list:
    """This host's slice of a datalist: ``items[rank::world]``.

    Deterministic, disjoint, covering; stride (not blocks) so heterogeneous
    volume sizes spread evenly. Single-process: the full list.
    """
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    if process_count <= 1:
        return list(items)
    return list(items)[process_index::process_count]


def per_host_batch_size(global_batch: int, process_count: int | None = None) -> int:
    if process_count is None:
        process_count = jax.process_count()
    if global_batch % process_count:
        raise ValueError(
            f"global batch {global_batch} not divisible by {process_count} hosts"
        )
    return global_batch // process_count


def shard_batch_multihost(mesh, batch, expected_local_batch: int | None = None):
    """Assemble a host-local batch pytree into globally-sharded arrays.

    Each process passes its LOCAL shard (leading dim = global_batch /
    process_count); the result is one global array per leaf, batch axis
    sharded over the mesh ``data`` axis. Single-process: plain ``device_put``
    (identical to ``mesh.shard_batch``).

    ``expected_local_batch`` guards the multi-host SPMD contract: every
    process must contribute the SAME local leading dim at the same step —
    ``make_array_from_process_local_data`` does not check, so a short tail
    batch on one host silently builds arrays with *different global shapes
    per process* and training corrupts without an error. Callers that cycle
    a DataLoader must use ``drop_last`` and pass the full batch size here;
    a mismatch raises on the offending host instead.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() <= 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
    if expected_local_batch is not None:
        for path, x in jax.tree_util.tree_flatten_with_path(batch)[0]:
            if np.shape(x)[0] != expected_local_batch:
                raise ValueError(
                    f"multi-host batch leaf {jax.tree_util.keystr(path)} has local "
                    f"batch {np.shape(x)[0]} != expected {expected_local_batch}; "
                    "other hosts would assemble a different global shape "
                    "(use drop_last=True on the loader)"
                )
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), batch
    )


def replicate_multihost(mesh, tree):
    """Replicate a pytree (params / opt state) across a multi-process mesh.

    Every process must hold identical host values (true for seeded init and
    restored checkpoints); each contributes the full array
    (``make_array_from_process_local_data`` with a replicated spec).
    """
    sh = replicated_sharding(mesh)
    if jax.process_count() <= 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), tree
    )


def global_mesh(model_parallel: int = 1):
    """The (data, model) mesh over ALL processes' devices."""
    return make_mesh(model_parallel=model_parallel)
