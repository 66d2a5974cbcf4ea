"""Data-parallel training over a virtual 8-device CPU mesh.

SURVEY.md §2.3 / §7 stage 7: mesh + sharded batches, replicated params,
XLA-inserted gradient all-reduce; verified against the single-device step.
BASELINE.json config 5 (v5e-16 data-parallel bf16) exercises this same path
on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medseg.engine.state import create_train_state
from medseg.engine.train import make_train_step
from medseg.models.unetr import UNETR
from medseg.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)


def tiny_model():
    return UNETR(
        in_channels=1,
        out_channels=2,
        img_size=(16, 16, 16),
        feature_size=2,
        hidden_size=8,
        mlp_dim=16,
        num_heads=2,
        num_layers=4,
        patch_size=16,
    )


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")
    mesh2 = make_mesh(4, model_parallel=2)
    assert mesh2.devices.shape == (2, 2)


def test_data_parallel_step_matches_single_device(rng):
    model = tiny_model()
    image = rng.normal(size=(8, 16, 16, 16, 1)).astype(np.float32)
    label = rng.integers(0, 2, size=(8, 16, 16, 16)).astype(np.int32)
    batch = {"image": jnp.asarray(image), "label": jnp.asarray(label)}

    state = create_train_state(
        model,
        rng=jax.random.key(0),
        sample_input=batch["image"][:1],
        learning_rate=1e-3,
        weight_decay=1e-5,
    )
    step = make_train_step(model, task="ct", donate=False)

    # single-device result
    state_single, loss_single = step(state, batch)

    # sharded over the 8-device mesh
    mesh = make_mesh()
    state_sharded = state.replace(
        params=replicate(mesh, state.params),
        opt_state=replicate(mesh, state.opt_state),
    )
    batch_sharded = shard_batch(mesh, batch)
    sh = batch_sharding(mesh)
    assert batch_sharded["image"].sharding == sh
    state_dp, loss_dp = step(state_sharded, batch_sharded)

    np.testing.assert_allclose(float(loss_dp), float(loss_single), rtol=1e-5)
    # Gradients agree up to fp32 cross-shard reduction-order noise. Params can
    # differ more: AdamW's m/sqrt(v) amplifies that noise to O(lr) wherever the
    # gradient is ~0, so bound the param delta by one optimizer step instead.
    from medseg.ops.losses import dice_ce_loss

    def grads_of(p, b):
        def loss_fn(params):
            logits = model.apply(params, b["image"], return_encoder_features=False)
            return dice_ce_loss(logits, b["label"], softmax=True, to_onehot_y=True)

        return jax.jit(jax.grad(loss_fn))(p)

    g_single = grads_of(state.params, batch)
    g_dp = grads_of(state_sharded.params, batch_sharded)
    for a, b in zip(jax.tree_util.tree_leaves(g_dp), jax.tree_util.tree_leaves(g_single)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_dp.params),
        jax.tree_util.tree_leaves(state_single.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0.1, atol=2.1e-3)


def test_sharded_batch_spans_devices(rng):
    mesh = make_mesh()
    x = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    xs = shard_batch(mesh, {"x": x})["x"]
    assert len(xs.addressable_shards) == 8
    assert xs.addressable_shards[0].data.shape == (1, 4)


def test_sharded_sliding_window_matches_single_device(rng):
    """Window-grid context parallelism: 8-way sharded SWI == single-device SWI."""
    import jax.numpy as jnp
    from medseg.ops.sliding_window import (
        SlidingWindowSpec,
        sliding_window_inference,
        sliding_window_inference_sharded,
    )

    def voxelwise_apply(params, windows):
        return jnp.einsum("bdhwc,ck->bdhwk", windows, params)

    vol = rng.normal(size=(20, 18, 14, 3)).astype(np.float32)
    w = rng.normal(size=(3, 5)).astype(np.float32)
    spec = SlidingWindowSpec(roi=(8, 8, 8), overlap=0.5, sw_batch=2, mode="gaussian")
    ref = sliding_window_inference(jnp.asarray(w), jnp.asarray(vol), voxelwise_apply, 5, spec)
    mesh = make_mesh()
    got = sliding_window_inference_sharded(
        jnp.asarray(w), jnp.asarray(vol), voxelwise_apply, 5, spec, mesh
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_sharded_swi_channels_first_matches(rng):
    """Channel-first sharded SWI (the v3 fast-path layout) == single-device."""
    import jax.numpy as jnp
    from medseg.ops.sliding_window import (
        SlidingWindowSpec,
        sliding_window_inference,
        sliding_window_inference_sharded,
    )
    from medseg.parallel.mesh import make_mesh

    vol = rng.normal(size=(20, 18, 14, 3)).astype(np.float32)
    w = rng.normal(size=(3, 5)).astype(np.float32)
    spec = SlidingWindowSpec(roi=(8, 8, 8), overlap=0.5, sw_batch=2, mode="gaussian")

    def apply_cf(params, windows):
        return jnp.einsum("bdhwc,ck->bdkhw", windows, params)

    def apply_nd(params, windows):
        return jnp.einsum("bdhwc,ck->bdhwk", windows, params)

    ref = sliding_window_inference(jnp.asarray(w), jnp.asarray(vol), apply_nd, 5, spec)
    mesh = make_mesh()
    got = sliding_window_inference_sharded(
        jnp.asarray(w), jnp.asarray(vol), apply_cf, 5, spec, mesh, out_layout="ndchw"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)
