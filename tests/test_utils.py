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
