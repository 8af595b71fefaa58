"""Utilities: prefetch pipeline, profiling, checkpoint round trip,
metrics writer."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from graph_neural_network_for_radar_perception_tpu.data.prefetch import (
    device_prefetch, threaded_batches,
)
from graph_neural_network_for_radar_perception_tpu.utils.metrics_writer import (
    MetricsWriter, RunningMeans,
)
from graph_neural_network_for_radar_perception_tpu.utils.profiling import (
    StepTimer, ThroughputMeter,
)


def test_threaded_batches_merges_all():
    def make_iter():
        return iter(range(10))

    out = sorted(threaded_batches(make_iter, num_workers=3, queue_size=2))
    assert out == sorted(list(range(10)) * 3)


def test_device_prefetch_preserves_order_and_values():
    batches = [{"x": np.full((4,), i, np.float32)} for i in range(7)]
    out = list(device_prefetch(iter(batches), buffer_size=3))
    assert len(out) == 7
    for i, b in enumerate(out):
        assert isinstance(b["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])


def test_step_timer_and_throughput():
    t = StepTimer()
    for _ in range(5):
        with t.step():
            pass
    s = t.summary()
    assert s["steps"] == 5 and s["mean_ms"] >= 0

    m = ThroughputMeter(units_per_step=100)
    m.start()
    m.tick(10)
    assert m.rate() > 0


def test_running_means_and_writer(tmp_path):
    rm = RunningMeans()
    rm.update({"a": 1.0})
    rm.update({"a": 3.0})
    assert rm.means()["a"] == 2.0

    w = MetricsWriter(str(tmp_path), use_tensorboard=False)
    w.write_train_val(10, {"loss": 1.5}, {"loss": 2.0})
    w.close()
    lines = open(tmp_path / "metrics.jsonl").read().strip().splitlines()
    recs = [json.loads(ln) for ln in lines]
    assert recs[0]["train/loss"] == 1.5
    assert recs[1]["val/loss"] == 2.0


def test_checkpoint_roundtrip(tmp_path):
    from graph_neural_network_for_radar_perception_tpu.utils.checkpoint import (
        CheckpointManager, load_params_msgpack, save_params_msgpack,
    )

    state = {"w": jnp.arange(6.0).reshape(2, 3), "step": jnp.asarray(5)}
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(5, jax.device_get(state), wait=True)
    assert mgr.latest_step() == 5
    restored = mgr.restore(template=jax.device_get(state))
    np.testing.assert_array_equal(
        np.asarray(restored["w"]), np.asarray(state["w"])
    )
    mgr.close()

    path = str(tmp_path / "params.msgpack")
    save_params_msgpack({"w": state["w"]}, path)
    loaded = load_params_msgpack({"w": jnp.zeros((2, 3))}, path)
    np.testing.assert_array_equal(np.asarray(loaded["w"]), np.asarray(state["w"]))


def test_bucketed_batching_and_training():
    from graph_neural_network_for_radar_perception_tpu.config.config import (
        tiny_test_config,
    )
    from graph_neural_network_for_radar_perception_tpu.data.bucketing import (
        Bucket, bucketed_batches, make_bucketed_train_step,
    )
    from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
        SyntheticRadarDataset,
    )
    from graph_neural_network_for_radar_perception_tpu.train.steps import (
        create_train_state,
    )

    cfg = tiny_test_config(max_nodes=128, max_clusters=64, batch_size=2)
    buckets = [Bucket(64, 32, 4), Bucket(128, 64, 2)]
    ds = SyntheticRadarDataset(cfg, seed=0, num_objects=2)

    def frames():
        for _ in range(24):
            yield ds.sample_frame()

    state = create_train_state(cfg, jax.random.key(0))
    step = make_bucketed_train_step(cfg, buckets)
    seen = set()
    n_batches = 0
    for bucket, batch in bucketed_batches(frames(), cfg, buckets):
        assert batch.graph.node_feat.shape[1] == bucket.max_nodes
        assert batch.graph.node_feat.shape[0] == bucket.batch_size
        state, m = step(state, bucket, jax.tree.map(jnp.asarray, batch))
        assert np.isfinite(float(m["loss_total"]))
        seen.add(bucket.max_nodes)
        n_batches += 1
    assert n_batches >= 2


def test_trainer_train_bucketed():
    """The production loop consumes the bucketed stream end-to-end."""
    from graph_neural_network_for_radar_perception_tpu.config.config import (
        tiny_test_config,
    )
    from graph_neural_network_for_radar_perception_tpu.data.bucketing import (
        Bucket,
    )
    from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
        SyntheticRadarDataset,
    )
    from graph_neural_network_for_radar_perception_tpu.train.trainer import (
        TrainHooks, train_bucketed,
    )

    cfg = tiny_test_config(max_nodes=128, max_clusters=64, batch_size=2)
    buckets = [Bucket(64, 32, 2), Bucket(128, 64, 2)]
    ds = SyntheticRadarDataset(cfg, seed=1, num_objects=2)

    def frames():
        while True:
            yield ds.sample_frame()

    logs = []
    state = train_bucketed(
        cfg, frames(), buckets=buckets, max_iters=6,
        hooks=TrainHooks(log_period=2, val_period=1000,
                         print_fn=logs.append),
    )
    assert int(state.step) == 6
    assert len(logs) == 3


def test_prediction_export_schema(tmp_path):
    import dataclasses

    from graph_neural_network_for_radar_perception_tpu.utils.export import (
        PredictionFileSchemas, per_point_predictions_to_json,
    )

    preds = {b"uuid-1": 3, "uuid-2": 0}
    out = per_point_predictions_to_json(
        preds, str(tmp_path / "p.json"), {0: "CAR", 11: None},
        PredictionFileSchemas.SemSeg,
    )
    loaded = json.load(open(tmp_path / "p.json"))
    assert loaded["schema"] == 1
    assert loaded["predictions"]["uuid-1"] == 3
    assert loaded["label_mapping"]["0"] == "CAR" or loaded["label_mapping"].get("0") == "CAR"
    assert "11" in loaded["label_mapping"] or 11 in out["label_mapping"]


def test_rotation_invariant_features():
    from graph_neural_network_for_radar_perception_tpu.infer.proposals import (
        rotation_invariant_cluster_features,
    )

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(12, 2)).astype(np.float32) @ np.array(
        [[2.0, 0.3], [0.3, 0.5]], np.float32
    ) + 5.0
    mask = np.ones(12, bool)
    f = np.asarray(
        rotation_invariant_cluster_features(jnp.asarray(pts), jnp.asarray(mask))
    )
    # invariance: rotating+shifting inputs leaves |features| unchanged (up
    # to eigenvector sign flips)
    th = 0.8
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]],
                 np.float32)
    pts2 = pts @ R.T + np.array([10.0, -3.0], np.float32)
    f2 = np.asarray(
        rotation_invariant_cluster_features(jnp.asarray(pts2), jnp.asarray(mask))
    )
    np.testing.assert_allclose(np.abs(f[:, :2]), np.abs(f2[:, :2]), atol=1e-3)
    np.testing.assert_allclose(f[:, 2], f2[:, 2], atol=1e-3)  # radius


def test_sequence_viewer_export(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    from graph_neural_network_for_radar_perception_tpu.config.config import (
        tiny_test_config,
    )
    from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
        SyntheticRadarDataset,
    )
    from graph_neural_network_for_radar_perception_tpu.viz.viewer import (
        SequenceViewer,
    )

    cfg = tiny_test_config()
    ds = SyntheticRadarDataset(cfg, seed=0, num_objects=1)
    frames = [ds.sample_frame() for _ in range(3)]
    v = SequenceViewer(frames, figsize=(4, 4))
    gif = v.export(str(tmp_path / "seq"), gif=True)
    assert os.path.exists(gif)


def test_multiprocess_loader_smoke():
    from graph_neural_network_for_radar_perception_tpu.config.config import (
        tiny_test_config,
    )
    from graph_neural_network_for_radar_perception_tpu.data.mp_loader import (
        MultiprocessBatches,
    )

    cfg = tiny_test_config()
    with MultiprocessBatches(cfg, 2, num_workers=2, seed=0) as mpb:
        b1 = next(mpb)
        b2 = next(mpb)
    assert b1.graph.node_feat.shape == (2, cfg.max_nodes, 6)
    assert b2.graph.node_mask.any()
