"""Sharded-execution tests on the virtual 8-device CPU mesh: the
edge-partitioned step must match the single-device step numerically, and
the dryrun entry must execute."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_neural_network_for_radar_perception_tpu.config.config import (
    tiny_test_config,
)
from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
    SyntheticRadarDataset,
)
from graph_neural_network_for_radar_perception_tpu.parallel.mesh import make_mesh
from graph_neural_network_for_radar_perception_tpu.parallel.sharded import (
    make_dp_train_step,
    make_edge_sharded_train_step,
)
from graph_neural_network_for_radar_perception_tpu.train import steps as T


def to_jnp(tree):
    return jax.tree.map(jnp.asarray, tree)


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config(batch_size=4)


@pytest.fixture(scope="module")
def batch(cfg):
    ds = SyntheticRadarDataset(cfg, seed=5, num_objects=2)
    return to_jnp(next(ds.batches(cfg.batch_size)))


def metrics_close(m1, m2, rtol=2e-3):
    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m2[k]), rtol=rtol, atol=1e-5, err_msg=k
        )


def test_devices_available():
    assert len(jax.devices()) == 8


def test_dp_step_matches_single_device(cfg, batch):
    state = T.create_train_state(cfg, jax.random.key(0))
    single = T.make_train_step(cfg)
    mesh = make_mesh(n_data=4, n_graph=1)
    dp = make_dp_train_step(cfg, mesh)

    s1, m1 = single(state, batch)
    s2, m2 = dp(state, batch)
    metrics_close(m1, m2)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        )


def test_edge_sharded_matches_single_device(cfg, batch):
    state = T.create_train_state(cfg, jax.random.key(0))
    single = T.make_train_step(cfg)
    mesh = make_mesh(n_data=4, n_graph=2)
    sharded = make_edge_sharded_train_step(cfg, mesh)

    s1, m1 = single(state, batch)
    s2, m2 = sharded(state, sharded.place_batch(batch))
    metrics_close(m1, m2)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        )


def test_edge_sharded_multiple_steps_stay_finite(cfg, batch):
    mesh = make_mesh(n_data=2, n_graph=4)
    cfg4 = tiny_test_config(batch_size=2)
    ds = SyntheticRadarDataset(cfg4, seed=9, num_objects=2)
    b = to_jnp(next(ds.batches(2)))
    state = T.create_train_state(cfg4, jax.random.key(1))
    step = make_edge_sharded_train_step(cfg4, mesh)
    b = step.place_batch(b)
    for _ in range(3):
        state, m = step(state, b)
    assert np.isfinite(float(m["loss_total"]))
    assert float(m["skipped"]) == 0.0


def test_dryrun_entry():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_scaling_harness_runs():
    from graph_neural_network_for_radar_perception_tpu.parallel.scaling import (
        measure_scaling,
    )

    cfg = tiny_test_config(batch_size=2)
    res = measure_scaling(
        cfg, [(1, 1), (2, 1), (2, 2)], batch_per_device=1, iters=2
    )
    assert len(res) == 3
    assert res[0]["devices"] == 1 and res[2]["devices"] == 4
    for r in res:
        assert r["edge_msgs_per_s"] > 0
        assert 0 < r["efficiency"] <= 4.0


def test_edge_sharded_with_onehot_segops(cfg, batch, monkeypatch):
    """The TPU lowering of the segment ops (one-hot MXU matmuls,
    ops/segment.py round 5) must compose with shard_map edge sharding —
    this is the combination a real multi-chip TPU run executes.  Both
    the single-device reference and the sharded step run with
    SEGOP_IMPL=onehot so their numerics match exactly."""
    monkeypatch.setenv("SEGOP_IMPL", "onehot")
    state = T.create_train_state(cfg, jax.random.key(0))
    single = T.make_train_step(cfg)
    mesh = make_mesh(n_data=4, n_graph=2)
    sharded = make_edge_sharded_train_step(cfg, mesh)

    s1, m1 = single(state, batch)
    s2, m2 = sharded(state, sharded.place_batch(batch))
    metrics_close(m1, m2)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        )
