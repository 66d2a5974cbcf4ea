"""Engine tests: train step learns, loops behave, checkpoints round-trip,
torch checkpoints convert.

SURVEY.md §4.3 prescribes a synthetic-data overfit test for the train engine.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medseg.engine.checkpoint import (
    CheckpointManager,
    convert_torch_state_dict,
    merge_params,
)
from medseg.engine.pretrain import (
    ConvergenceTracker,
    make_pretrain_step,
)
from medseg.engine.state import create_train_state
from medseg.engine.train import TrainLoop, make_train_step
from medseg.models.unetr import UNETR


def tiny_model(out_channels=2, crop=32):
    return UNETR(
        in_channels=1,
        out_channels=out_channels,
        img_size=(crop, crop, crop),
        feature_size=4,
        hidden_size=24,
        mlp_dim=48,
        num_heads=4,
        num_layers=4,
        patch_size=16,
    )


@pytest.fixture(scope="module")
def overfit_setup():
    model = tiny_model()
    rng = np.random.default_rng(0)
    image = rng.normal(size=(2, 32, 32, 32, 1)).astype(np.float32)
    label = (image[..., 0] > 0).astype(np.int32)
    state = create_train_state(
        model,
        rng=jax.random.key(0),
        sample_input=jnp.asarray(image),
        learning_rate=1e-3,
        weight_decay=1e-5,
    )
    return model, state, image, label


def test_train_step_overfits(overfit_setup):
    model, state, image, label = overfit_setup
    step = make_train_step(model, task="ct", donate=False)
    batch = {"image": jnp.asarray(image), "label": jnp.asarray(label)}
    state, first_loss = step(state, batch)
    losses = [float(first_loss)]
    for _ in range(30):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses[::10]
    assert int(state.step) == 31


def test_train_loop_tracks_best(overfit_setup):
    model, state, image, label = overfit_setup
    step = make_train_step(model, task="ct", donate=False)
    batch = {"image": jnp.asarray(image), "label": jnp.asarray(label)}

    metrics = iter([0.3, 0.5, 0.4])
    loop = TrainLoop(
        step,
        max_iterations=6,
        eval_num=2,
        validator=lambda s: next(metrics),
        log_fn=lambda s: None,
    )

    def batches():
        while True:
            yield batch

    state = loop.run(state, batches())
    assert loop.best_metric == pytest.approx(0.5)
    assert loop.best_step == 4
    assert len(loop.loss_history) == 6


def test_train_loop_async_dispatch_matches_sync(overfit_setup):
    """sync_every>1 must not change training math or history — only when the
    host blocks on device losses (pipelined production mode)."""
    model, state, image, label = overfit_setup
    step = make_train_step(model, task="ct", donate=False)
    batch = {"image": jnp.asarray(image), "label": jnp.asarray(label)}

    def batches():
        while True:
            yield batch

    seen = []
    loops = []
    for sync_every in (1, 4):
        loop = TrainLoop(
            step,
            max_iterations=7,
            eval_num=100,
            log_fn=lambda s: None,
            sync_every=sync_every,
            progress=lambda s, t, l: seen.append((s, t)),
        )
        loop.run(state, batches())
        loops.append(loop.loss_history)
    assert len(loops[0]) == len(loops[1]) == 7
    np.testing.assert_allclose(loops[0], loops[1], rtol=1e-6)
    assert seen[-1] == (7, 7)  # progress hook saw the final step


def test_pretrain_step_feat_and_recon(rng):
    model = tiny_model(out_channels=2, crop=32)
    images = jnp.asarray(rng.normal(size=(4, 32, 32, 32, 1)).astype(np.float32))
    state = create_train_state(
        model,
        rng=jax.random.key(1),
        sample_input=images,
        learning_rate=1e-3,
        weight_decay=1e-5,
    )
    for arc, dim in [("feat", 4), ("recon", 32)]:
        step = make_pretrain_step(
            model,
            update_arc=arc,
            loss_type="ranking",
            num_partitions=4,
            temperature=0.1,
            donate=False,
        )
        idx = jnp.asarray([0, 1, 2, 3]) * (dim // 4)
        state2, loss = step(state, images, idx, axis=0)
        assert np.isfinite(float(loss))
        assert int(state2.step) == int(state.step) + 1
        if arc == "recon":
            # encoder params unchanged: frozen (stop_gradient) and wd-decayed?
            # AdamW applies weight decay only through updates; zero grads ->
            # moments stay zero but decay still applies via optax.adamw update.
            # So check decoder changed instead, and vit changed less.
            pass


def test_pretrain_recon_freezes_encoder(rng):
    """In recon stage the ViT/encoder taps receive zero gradient; with AdamW
    decoupled decay params still shrink, so compare gradient flow directly."""
    model = tiny_model(out_channels=2, crop=32)
    images = jnp.asarray(rng.normal(size=(4, 32, 32, 32, 1)).astype(np.float32))
    from medseg.ops.ranking import (
        gather_partition_slices,
        pairwise_channel_cosine,
        bt_ranking_loss,
    )

    params = model.init(jax.random.key(0), images)

    def loss(p):
        _, logits = model.apply(p, images, freeze_encoder=True)
        slices = gather_partition_slices(logits, jnp.asarray([0, 8, 16, 24]), 0)
        return bt_ranking_loss(pairwise_channel_cosine(slices), 4, 0.1)

    grads = jax.grad(loss)(params)
    vit_norm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads["params"]["vit"]))
    dec_norm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads["params"]["decoder5"]))
    assert vit_norm == 0.0
    assert dec_norm > 0.0


def test_convergence_tracker():
    t = ConvergenceTracker(rtol=1e-2, window=3, max_iterations=100)
    for loss in [10.0, 5.0, 3.0]:
        t.update(loss)
        assert not t.converged
    t.update(6.0)  # mean(5,3,6)=4.67, |4.67-6|=1.33 > 0.0467
    assert not t.converged
    for _ in range(5):
        t.update(4.0)
    assert t.converged  # flat losses
    t2 = ConvergenceTracker(max_iterations=2)
    t2.update(1.0)
    t2.update(100.0)
    assert t2.converged  # iteration cap


def test_checkpoint_roundtrip(tmp_path, overfit_setup):
    model, state, image, label = overfit_setup
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(state, metrics={"dice": 0.75})
    assert mgr.exists()
    assert mgr.metadata()["dice"] == pytest.approx(0.75)

    # perturb, then restore
    perturbed = state.replace(
        params=jax.tree_util.tree_map(lambda x: x + 1.0, state.params)
    )
    restored = mgr.restore(perturbed)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_checkpoint_converter(rng):
    """Synthetic reference state_dict (MONAI 0.6 key schema) -> flax params
    that the model can actually apply."""
    import torch

    model = tiny_model(out_channels=3, crop=32)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 32, 1)).astype(np.float32))
    template = model.init(jax.random.key(0), x)

    hidden, mlp, n_layers, fs = 24, 48, 4, 4
    p = 16
    n_tokens = (32 // p) ** 3
    sd = {}
    sd["vit.patch_embedding.patch_embeddings.1.weight"] = torch.randn(hidden, p**3 * 1)
    sd["vit.patch_embedding.patch_embeddings.1.bias"] = torch.randn(hidden)
    sd["vit.patch_embedding.position_embeddings"] = torch.randn(1, n_tokens, hidden)
    for i in range(n_layers):
        sd[f"vit.blocks.{i}.norm1.weight"] = torch.randn(hidden)
        sd[f"vit.blocks.{i}.norm1.bias"] = torch.randn(hidden)
        sd[f"vit.blocks.{i}.norm2.weight"] = torch.randn(hidden)
        sd[f"vit.blocks.{i}.norm2.bias"] = torch.randn(hidden)
        sd[f"vit.blocks.{i}.attn.qkv.weight"] = torch.randn(3 * hidden, hidden)
        sd[f"vit.blocks.{i}.attn.out_proj.weight"] = torch.randn(hidden, hidden)
        sd[f"vit.blocks.{i}.attn.out_proj.bias"] = torch.randn(hidden)
        sd[f"vit.blocks.{i}.mlp.linear1.weight"] = torch.randn(mlp, hidden)
        sd[f"vit.blocks.{i}.mlp.linear1.bias"] = torch.randn(mlp)
        sd[f"vit.blocks.{i}.mlp.linear2.weight"] = torch.randn(hidden, mlp)
        sd[f"vit.blocks.{i}.mlp.linear2.bias"] = torch.randn(hidden)
    sd["vit.norm.weight"] = torch.randn(hidden)
    sd["vit.norm.bias"] = torch.randn(hidden)
    # encoder1 res block (1 -> fs), includes 1x1 projection conv3
    sd["encoder1.layer.conv1.conv.weight"] = torch.randn(fs, 1, 3, 3, 3)
    sd["encoder1.layer.conv2.conv.weight"] = torch.randn(fs, fs, 3, 3, 3)
    sd["encoder1.layer.conv3.conv.weight"] = torch.randn(fs, 1, 1, 1, 1)
    for n in ("norm1", "norm2", "norm3"):
        sd[f"encoder1.layer.{n}.weight"] = torch.randn(fs)
        sd[f"encoder1.layer.{n}.bias"] = torch.randn(fs)
    # encoders 2-4: transpose convs (hidden -> fs*2/4/8 then self)
    for enc, mult, extra in ((2, 2, 2), (3, 4, 1), (4, 8, 0)):
        ch = fs * mult
        sd[f"encoder{enc}.transp_conv_init.conv.weight"] = torch.randn(hidden, ch, 2, 2, 2)
        for i in range(extra):
            sd[f"encoder{enc}.blocks.{i}.conv.weight"] = torch.randn(ch, ch, 2, 2, 2)
    # decoders
    dec_io = {5: (hidden, fs * 8), 4: (fs * 8, fs * 4), 3: (fs * 4, fs * 2), 2: (fs * 2, fs)}
    for d, (cin, cout) in dec_io.items():
        sd[f"decoder{d}.transp_conv.conv.weight"] = torch.randn(cin, cout, 2, 2, 2)
        sd[f"decoder{d}.conv_block.conv1.conv.weight"] = torch.randn(cout, 2 * cout, 3, 3, 3)
        sd[f"decoder{d}.conv_block.conv2.conv.weight"] = torch.randn(cout, cout, 3, 3, 3)
        sd[f"decoder{d}.conv_block.conv3.conv.weight"] = torch.randn(cout, 2 * cout, 1, 1, 1)
        for n in ("norm1", "norm2", "norm3"):
            sd[f"decoder{d}.conv_block.{n}.weight"] = torch.randn(cout)
            sd[f"decoder{d}.conv_block.{n}.bias"] = torch.randn(cout)
    sd["out.conv.conv.weight"] = torch.randn(3, fs, 1, 1, 1)
    sd["out.conv.conv.bias"] = torch.randn(3)

    converted = convert_torch_state_dict(sd)
    params = merge_params(template, converted)
    enc4, logits = model.apply(params, x)
    assert logits.shape == (1, 32, 32, 32, 3)
    # converted weights actually landed (not the template init)
    got = np.asarray(params["params"]["out"]["conv"]["bias"])
    np.testing.assert_allclose(got, sd["out.conv.conv.bias"].numpy(), rtol=1e-6)


def test_train_step_device_augment(rng):
    """Device-side augmentation path: step runs, loss finite, rng advances."""
    model = tiny_model()
    image = jnp.asarray(rng.normal(size=(2, 32, 32, 32, 1)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 2, size=(2, 32, 32, 32)).astype(np.int32))
    state = create_train_state(
        model, rng=jax.random.key(5), sample_input=image,
        learning_rate=1e-3, weight_decay=1e-5,
    )
    step = make_train_step(model, task="ct", donate=False, device_augment=True)
    rng_before = np.asarray(jax.random.key_data(state.rng))
    state2, loss = step(state, {"image": image, "label": label})
    assert np.isfinite(float(loss))
    assert not np.array_equal(np.asarray(jax.random.key_data(state2.rng)), rng_before)


def test_training_determinism(overfit_setup):
    """SURVEY §4.5: fixed PRNG key -> bit-identical losses across runs."""
    model, state0, image, label = overfit_setup
    batch = {"image": jnp.asarray(image), "label": jnp.asarray(label)}

    def run(seed):
        st = create_train_state(
            model, rng=jax.random.key(seed), sample_input=batch["image"],
            learning_rate=1e-3, weight_decay=1e-5,
        )
        step = make_train_step(model, task="ct", donate=False)
        out = []
        for _ in range(3):
            st, loss = step(st, batch)
            out.append(float(loss))
        return out

    assert run(42) == run(42)
