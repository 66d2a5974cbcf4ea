"""Worker for the multi-process CPU simulation test (tests/test_multihost.py).

Each OS process models one HOST of a multi-host slice (BASELINE config 5:
v5e-16 = 4 hosts): own JAX process joined via ``jax.distributed.initialize``
(Gloo-backed CPU collectives), 2 virtual devices, per-host datalist shard,
globally-sharded batch, one data-parallel train step + a psum'd metric
reduction. Run as ``python tests/multihost_worker.py RANK WORLD PORT``.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
rank, world, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from medseg.parallel.runtime import (  # noqa: E402
    initialize_distributed,
    per_host_batch_size,
    process_info,
    replicate_multihost,
    shard_batch_multihost,
    shard_datalist,
    global_mesh,
)

initialize_distributed(f"localhost:{port}", world, rank)
assert process_info() == (rank, world)
assert len(jax.devices()) == 2 * world, jax.devices()
assert len(jax.local_devices()) == 2

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from medseg.engine.state import create_train_state  # noqa: E402
from medseg.engine.train import make_train_step  # noqa: E402
from medseg.models.unetr import UNETR  # noqa: E402
from medseg.ops.metrics import confusion_counts  # noqa: E402
from medseg.parallel.mesh import psum_metric_counts  # noqa: E402

mesh = global_mesh()
assert mesh.devices.size == 2 * world

# per-host datalist shard: disjoint + covering is asserted by the parent
my_items = shard_datalist(list(range(10)))

model = UNETR(
    in_channels=1, out_channels=2, img_size=(32, 32, 32), feature_size=4,
    hidden_size=24, mlp_dim=48, num_heads=4, num_layers=4, patch_size=16,
)
rng = np.random.default_rng(0)  # same data on every host; sliced per host
GLOBAL_BATCH = 4
image = rng.normal(size=(GLOBAL_BATCH, 32, 32, 32, 1)).astype(np.float32)
label = (image[..., 0] > 0).astype(np.int32)
lb = per_host_batch_size(GLOBAL_BATCH)
sl = slice(rank * lb, (rank + 1) * lb)

state = create_train_state(
    model, rng=jax.random.key(0), sample_input=jnp.asarray(image[:1]),
    learning_rate=1e-3, weight_decay=1e-5,
)
state = state.replace(
    params=replicate_multihost(mesh, state.params),
    opt_state=replicate_multihost(mesh, state.opt_state),
)
batch = shard_batch_multihost(mesh, {"image": image[sl], "label": label[sl]})
step = make_train_step(model, task="ct", donate=False)
state, loss = step(state, batch)
loss = float(loss)

# psum'd eval-metric reduction across hosts
pred = (label[..., None] == np.arange(2)).astype(np.float32)
targ = pred.copy()
counts = psum_metric_counts(
    mesh,
    shard_batch_multihost(mesh, pred[sl]),
    shard_batch_multihost(mesh, targ[sl]),
)
expect = np.asarray(confusion_counts(jnp.asarray(pred), jnp.asarray(targ))).sum(0)
np.testing.assert_allclose(np.asarray(counts), expect, rtol=1e-5)

# the SPMD batch guard: a short tail batch (uneven host shards without
# drop_last) must raise on the offending host, not silently assemble
# globally inconsistent arrays
short = {"image": image[: lb - 1] if rank == 0 else image[:lb]}
try:
    shard_batch_multihost(mesh, short, expected_local_batch=lb)
    guard_ok = rank != 0  # rank 0's short batch must have raised
except ValueError:
    guard_ok = rank == 0

print(
    json.dumps({"rank": rank, "loss": loss, "shard": my_items, "guard_ok": guard_ok}),
    flush=True,
)
