"""Owner-computes halo-exchange edge partitioning tests: the halo step
must match the single-device step numerically, the host layout must obey
its contracts, and halos must be narrow on spatially-sorted frames."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_neural_network_for_radar_perception_tpu.config.config import (
    tiny_test_config,
)
from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
    SyntheticRadarDataset, pad_frame, stack_batch,
)
from graph_neural_network_for_radar_perception_tpu.parallel.halo import (
    build_halo_shards, make_halo_batch, make_halo_train_step, required_halo,
    spatial_sort_frame,
)
from graph_neural_network_for_radar_perception_tpu.parallel.mesh import make_mesh
from graph_neural_network_for_radar_perception_tpu.train import steps as T


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config(batch_size=4)


@pytest.fixture(scope="module")
def sorted_batch(cfg):
    ds = SyntheticRadarDataset(cfg, seed=11, num_objects=2)
    items = [
        pad_frame(spatial_sort_frame(ds.sample_frame()), cfg)
        for _ in range(cfg.batch_size)
    ]
    return stack_batch(items)


def test_spatial_sort_preserves_contracts(cfg):
    """Sorting permutes nodes but keeps row-major directed order, triu
    undirected order, and the node↔edge feature relationship."""
    ds = SyntheticRadarDataset(cfg, seed=3, num_objects=2)
    fr = spatial_sort_frame(ds.sample_frame())
    # x-major node order
    assert np.all(np.diff(fr.other_feat[:, 0]) >= -1e-9)
    # row-major directed edges
    key = fr.senders.astype(np.int64) * fr.n + fr.receivers
    assert np.all(np.diff(key) > 0)
    # triu undirected edges
    assert np.all(fr.und_senders < fr.und_receivers)
    ukey = fr.und_senders.astype(np.int64) * fr.n + fr.und_receivers
    assert np.all(np.diff(ukey) > 0)
    # edge features still describe (sender → receiver) of the new order
    dxy = (fr.other_feat[fr.senders, :2] - fr.other_feat[fr.receivers, :2]) / 10.0
    np.testing.assert_allclose(fr.edge_feat[:, :2], dxy, atol=1e-5)


def test_spatial_sort_shrinks_halo(cfg):
    ds = SyntheticRadarDataset(cfg, seed=5, num_objects=2)
    fr = ds.sample_frame()
    g_unsorted, _ = pad_frame(fr, cfg)
    g_sorted, _ = pad_frame(spatial_sort_frame(fr), cfg)
    h_sorted = required_halo(g_sorted, 2)
    h_unsorted = required_halo(g_unsorted, 2)
    # Communication ∝ halo: sorting must bound it well below N.
    assert h_sorted < cfg.max_nodes // 2
    assert h_sorted <= h_unsorted


def test_build_halo_shards_owner_assignment(cfg, sorted_batch):
    g0 = jax.tree.map(lambda x: np.asarray(x)[0], sorted_batch.graph)
    halo = max(required_halo(g0, 2), 8)
    sh = build_halo_shards(g0, 2, halo)
    nl = cfg.max_nodes // 2
    m = np.asarray(g0.edge_mask)
    assert int(sh.mask.sum()) == int(m.sum())  # every edge owned once
    for g in range(2):
        dst = sh.dst_loc[g][sh.mask[g]]
        src = sh.src_loc[g][sh.mask[g]]
        assert dst.min(initial=0) >= 0 and dst.max(initial=0) < nl
        assert src.min(initial=0) >= 0 and src.max(initial=0) < nl + 2 * halo


def test_build_halo_shards_raises_on_unsorted(cfg):
    ds = SyntheticRadarDataset(cfg, seed=9, num_objects=2)
    g, _ = pad_frame(ds.sample_frame(), cfg)
    need = required_halo(g, 4)
    if need <= 8:
        pytest.skip("frame accidentally local enough")
    with pytest.raises(ValueError, match="halo"):
        build_halo_shards(g, 4, 8)


def test_halo_step_matches_single_device(cfg, sorted_batch):
    batch = jax.tree.map(jnp.asarray, sorted_batch)
    halo = 8 * max(
        1,
        -(-max(
            required_halo(jax.tree.map(lambda x: np.asarray(x)[b],
                                       sorted_batch.graph), 2)
            for b in range(cfg.batch_size)
        ) // 8),
    )
    mesh = make_mesh(n_data=4, n_graph=2)
    step = make_halo_train_step(cfg, mesh, halo)
    shards = make_halo_batch(sorted_batch, cfg, 2, halo)
    b, s = step.place(batch, shards)

    state = T.create_train_state(cfg, jax.random.key(0))
    single = T.make_train_step(cfg)

    s_h, s_1 = state, state
    for _ in range(2):
        s_h, m_h = step(s_h, b, s)
        s_1, m_1 = single(s_1, batch)
    for k in m_1:
        np.testing.assert_allclose(
            float(m_h[k]), float(m_1[k]), rtol=2e-3, atol=1e-5, err_msg=k
        )
    for a, c in zip(jax.tree.leaves(s_h.params), jax.tree.leaves(s_1.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=2e-4, atol=1e-6
        )


def test_halo_step_four_way(cfg, sorted_batch):
    """G=4 owners, halo from the data; metrics still match."""
    batch = jax.tree.map(jnp.asarray, sorted_batch)
    halo = 8 * max(
        1,
        -(-max(
            required_halo(jax.tree.map(lambda x: np.asarray(x)[b],
                                       sorted_batch.graph), 4)
            for b in range(cfg.batch_size)
        ) // 8),
    )
    mesh = make_mesh(n_data=2, n_graph=4)
    step = make_halo_train_step(cfg, mesh, halo)
    shards = make_halo_batch(sorted_batch, cfg, 4, halo)
    b, s = step.place(batch, shards)
    state = T.create_train_state(cfg, jax.random.key(1))
    single = T.make_train_step(cfg)
    s_h, m_h = step(state, b, s)
    s_1, m_1 = single(state, batch)
    for k in m_1:
        np.testing.assert_allclose(
            float(m_h[k]), float(m_1[k]), rtol=2e-3, atol=1e-5, err_msg=k
        )


def test_scaling_harness_halo_mode():
    from graph_neural_network_for_radar_perception_tpu.parallel.scaling import (
        measure_scaling,
    )

    cfg = tiny_test_config(batch_size=2)
    res = measure_scaling(
        cfg, [(1, 1), (2, 2)], batch_per_device=1, iters=2,
        graph_partition="halo",
    )
    assert len(res) == 2
    assert res[1]["devices"] == 4
    for r in res:
        assert r["edge_msgs_per_s"] > 0


def test_halo_step_with_onehot_segops(cfg, sorted_batch, monkeypatch):
    """Owner-computes halo partitioning composed with the TPU one-hot
    segment-op lowering (ops/segment.py round 5) — the flagship
    multi-chip configuration on real TPU hardware.  Both sides run with
    SEGOP_IMPL=onehot so numerics match exactly."""
    monkeypatch.setenv("SEGOP_IMPL", "onehot")
    batch = jax.tree.map(jnp.asarray, sorted_batch)
    halo = 8 * max(
        1,
        -(-max(
            required_halo(jax.tree.map(lambda x: np.asarray(x)[b],
                                       sorted_batch.graph), 2)
            for b in range(cfg.batch_size)
        ) // 8),
    )
    mesh = make_mesh(n_data=4, n_graph=2)
    step = make_halo_train_step(cfg, mesh, halo)
    shards = make_halo_batch(sorted_batch, cfg, 2, halo)
    b, s = step.place(batch, shards)

    state = T.create_train_state(cfg, jax.random.key(0))
    single = T.make_train_step(cfg)
    s_h, m_h = step(state, b, s)
    s_1, m_1 = single(state, batch)
    for k in m_1:
        np.testing.assert_allclose(
            float(m_h[k]), float(m_1[k]), rtol=2e-3, atol=1e-5, err_msg=k
        )
    for a, c in zip(jax.tree.leaves(s_h.params), jax.tree.leaves(s_1.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=2e-4, atol=1e-6
        )
