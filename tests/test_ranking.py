"""Ranking-pretraining objective parity vs a direct loop reimplementation.

The loop oracle below reproduces the reference semantics
(`/root/reference/unetr_ranking_pretraining_3d.py:59-236`) literally — slice
extraction with itertools product/permutations, per-triplet torch cosine — and
the vectorized TPU path must match it to float tolerance for both the
Bradley-Terry ranking loss and the InfoNCE contrastive baseline.
"""

import itertools

import jax.numpy as jnp
import numpy as np
import torch

from medseg.ops.ranking import (
    bt_ranking_loss,
    gather_partition_slices,
    info_nce_loss,
    pairwise_channel_cosine,
    sample_half_indices,
    sample_partition_indices,
    triplet_index_table,
)

P = 4  # num_partitions, reference :330
TEMP = 0.1


def oracle_slices(feats_ncdhw: np.ndarray, slice_indices, axis: int):
    """Reference extract_triplets_more_partitions slicing: for each partition
    take the slice at its index from each of the 4 views, flatten to (C, S)."""
    cos = torch.nn.CosineSimilarity(dim=-1, eps=1e-6)
    f1, f2 = feats_ncdhw[:2], feats_ncdhw[2:]
    slices_list = []
    for idx in slice_indices:
        views = []
        for vol in (f1, f2):
            for b in range(2):
                sl = np.take(vol[b], idx, axis=axis + 1)  # (C, ...) minus one spatial axis
                views.append(torch.tensor(sl.reshape(sl.shape[0], -1)))
        slices_list.append(views)
    reference, similar, dissimilar = [], [], []
    for p in range(P):
        others = []
        for q in range(P):
            if q != p:
                others.extend(slices_list[q])
        for (r, s), d in itertools.product(
            itertools.permutations(slices_list[p], 2), others
        ):
            reference.append(r)
            similar.append(s)
            dissimilar.append(d)
    return cos, reference, similar, dissimilar


def oracle_bt(cos, reference, similar, dissimilar):
    loss = 0.0
    for r, s, d in zip(reference, similar, dissimilar):
        comp = cos(r, s) / TEMP - cos(r, d) / TEMP
        loss = loss + torch.mean(torch.log(1 + torch.exp(-comp)))
    return float(loss)


def oracle_info_nce(cos, reference, similar, dissimilar):
    loss = 0.0
    for r, s in zip(reference, similar):
        numerator = torch.exp(cos(r, s) / TEMP)
        denom = [torch.exp(cos(r, d) / TEMP) for d in dissimilar]
        denom.append(numerator)
        denom = torch.stack(denom, dim=0).sum(dim=0)
        loss = loss - torch.mean(torch.log(numerator / denom))
    return float(loss)


def _make_feats(rng):
    # (4, C, D, H, W) like the reference enc4 features (batch of 2 vols x 2 augs)
    return rng.normal(size=(4, 3, 8, 8, 8)).astype(np.float32)


def test_triplet_table_size():
    r, s, d = triplet_index_table(P)
    assert len(r) == len(s) == len(d) == 576  # P * 12 perms * (P-1)*4 dissims
    # views within a partition never appear as their own dissimilar
    assert all(ri // 4 != di // 4 for ri, di in zip(r, d))


def test_bt_loss_matches_reference_loop(rng):
    feats = _make_feats(rng)
    for axis in range(3):
        idx = sample_partition_indices(rng, feats.shape[2 + axis], P)
        cos, ref, sim, dis = oracle_slices(feats, idx, axis)
        expected = oracle_bt(cos, ref, sim, dis)

        feats_j = jnp.asarray(feats.transpose(0, 2, 3, 4, 1))  # NDHWC
        slices = gather_partition_slices(feats_j, jnp.asarray(idx), axis)
        got = bt_ranking_loss(pairwise_channel_cosine(slices), P, TEMP)
        np.testing.assert_allclose(float(got), expected, rtol=1e-4)


def test_info_nce_matches_reference_loop(rng):
    feats = _make_feats(rng)
    idx = sample_partition_indices(rng, feats.shape[2], P)
    cos, ref, sim, dis = oracle_slices(feats, idx, 0)
    expected = oracle_info_nce(cos, ref, sim, dis)

    feats_j = jnp.asarray(feats.transpose(0, 2, 3, 4, 1))
    slices = gather_partition_slices(feats_j, jnp.asarray(idx), 0)
    got = info_nce_loss(pairwise_channel_cosine(slices), P, TEMP)
    np.testing.assert_allclose(float(got), expected, rtol=1e-4)


def oracle_slices_legacy(feats_ncdhw: np.ndarray, slice1_idx, slice2_idx, axis: int):
    """Literal mirror of the LEGACY extract_triplets
    (`unetr_ranking_pretraining_3d.py:135-200`): 4 views at each of the two
    half-volume slice indices, then both-direction product/permutations."""
    cos = torch.nn.CosineSimilarity(dim=-1, eps=1e-6)
    f1, f2 = feats_ncdhw[:2], feats_ncdhw[2:]

    def views_at(idx):
        out = []
        for vol in (f1, f2):
            for b in range(2):
                sl = np.take(vol[b], idx, axis=axis + 1)
                out.append(torch.tensor(sl.reshape(sl.shape[0], -1)))
        return out

    group1, group2 = views_at(slice1_idx), views_at(slice2_idx)
    reference, similar, dissimilar = [], [], []
    for (r, s), d in itertools.product(itertools.permutations(group1, 2), group2):
        reference.append(r)
        similar.append(s)
        dissimilar.append(d)
    for (r, s), d in itertools.product(itertools.permutations(group2, 2), group1):
        reference.append(r)
        similar.append(s)
        dissimilar.append(d)
    return cos, reference, similar, dissimilar


def test_legacy_2half_table_size():
    r, s, d = triplet_index_table(2)
    assert len(r) == len(s) == len(d) == 96  # 2 * 12 perms * 4 dissims
    assert all(ri // 4 != di // 4 for ri, di in zip(r, d))


def test_legacy_2half_sampling(rng):
    for size in (8, 10, 17):
        for _ in range(20):
            low, high = sample_half_indices(rng, size)
            assert 0 <= low < size // 2
            assert size // 2 <= high < size


def test_legacy_2half_bt_loss_matches_reference_loop(rng):
    feats = _make_feats(rng)
    for axis in range(3):
        idx = sample_half_indices(rng, feats.shape[2 + axis])
        cos, ref, sim, dis = oracle_slices_legacy(feats, idx[0], idx[1], axis)
        expected = oracle_bt(cos, ref, sim, dis)

        feats_j = jnp.asarray(feats.transpose(0, 2, 3, 4, 1))  # NDHWC
        slices = gather_partition_slices(feats_j, jnp.asarray(idx), axis)
        got = bt_ranking_loss(pairwise_channel_cosine(slices), 2, TEMP)
        np.testing.assert_allclose(float(got), expected, rtol=1e-4)


def test_legacy_2half_info_nce_matches_reference_loop(rng):
    feats = _make_feats(rng)
    idx = sample_half_indices(rng, feats.shape[2])
    cos, ref, sim, dis = oracle_slices_legacy(feats, idx[0], idx[1], 0)
    expected = oracle_info_nce(cos, ref, sim, dis)

    feats_j = jnp.asarray(feats.transpose(0, 2, 3, 4, 1))
    slices = gather_partition_slices(feats_j, jnp.asarray(idx), 0)
    got = info_nce_loss(pairwise_channel_cosine(slices), 2, TEMP)
    np.testing.assert_allclose(float(got), expected, rtol=1e-4)


def test_gather_slices_shape(rng):
    feats = jnp.asarray(rng.normal(size=(4, 8, 10, 12, 5)).astype(np.float32))
    idx = jnp.asarray([0, 2, 4, 6])
    for axis, spatial in [(0, 10 * 12), (1, 8 * 12), (2, 8 * 10)]:
        s = gather_partition_slices(feats, idx, axis)
        assert s.shape == (4, 4, 5, spatial)


def test_bt_loss_orders_similarity(rng):
    """Sanity: loss is lower when within-partition slices are truly similar."""
    base = rng.normal(size=(1, 8, 8, 8, 6)).astype(np.float32)
    similar_feats = np.concatenate(
        [base + 0.01 * rng.normal(size=base.shape).astype(np.float32) for _ in range(4)]
    )
    random_feats = rng.normal(size=(4, 8, 8, 8, 6)).astype(np.float32)
    idx = jnp.asarray([0, 2, 4, 6])
    loss_sim = bt_ranking_loss(
        pairwise_channel_cosine(gather_partition_slices(jnp.asarray(similar_feats), idx, 0)),
        P,
        TEMP,
    )
    loss_rand = bt_ranking_loss(
        pairwise_channel_cosine(gather_partition_slices(jnp.asarray(random_feats), idx, 0)),
        P,
        TEMP,
    )
    assert float(loss_sim) < float(loss_rand)
