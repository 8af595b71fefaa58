"""End-to-end pipeline test: train briefly on synthetic frames, then run
the full detection/segmentation evaluation drivers — the framework's
equivalent of the reference's performance notebooks (SURVEY.md §3.4)."""

import glob
import os

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
from graph_neural_network_for_radar_perception_tpu.eval import drivers as D
from graph_neural_network_for_radar_perception_tpu.infer.pipeline import (
    FrameDetector,
)
from graph_neural_network_for_radar_perception_tpu.train import steps as T


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    cfg = tiny_test_config(
        batch_size=2, learning_rate=0.02, max_train_iter=2000
    )
    ds = SyntheticRadarDataset(cfg, seed=0, num_objects=2)
    state = T.create_train_state(cfg, jax.random.key(0))
    step = T.make_train_step(cfg)
    gen = ds.batches(cfg.batch_size)
    for _ in range(150):
        state, m = step(state, jax.tree.map(jnp.asarray, next(gen)))
    assert np.isfinite(float(m["loss_total"]))
    return cfg, state.params


def test_frame_detector_outputs(trained):
    cfg, params = trained
    det = FrameDetector(cfg, params, eps=1.4)
    ds = SyntheticRadarDataset(cfg, seed=50, num_objects=2)
    fr = ds.sample_frame()
    d = det.detect_frame_arrays(fr)
    assert d.node_class.shape == (fr.n,)
    assert d.num_clusters >= 1
    assert np.isfinite(d.cluster_mu[: d.num_clusters]).all()
    dets = d.detections(filter_false=True)
    assert (dets["obj_class"] != 6).all()


def test_segmentation_eval_driver(trained, tmp_path):
    cfg, params = trained
    det = FrameDetector(cfg, params)
    ds = SyntheticRadarDataset(cfg, seed=60, num_objects=2)
    frames = [ds.sample_frame() for _ in range(4)]
    acc = D.segmentation_confusion(det, frames)
    assert acc.cm.sum() == sum(min(f.n, cfg.max_nodes) for f in frames)
    # accuracy after 150 iters should beat uniform-random over 7 classes
    accuracy = np.trace(acc.cm) / acc.cm.sum()
    assert accuracy > 1.0 / 7.0

    p = D.write_sequence_json(acc, str(tmp_path), "sequence_7")
    pr = D.aggregate_sequence_jsons([p], cfg.num_classes)
    assert pr["precision"].shape == (6,)  # NONE dropped


def test_detection_eval_driver(trained):
    cfg, params = trained
    det = FrameDetector(cfg, params, eps=1.4)
    ds = SyntheticRadarDataset(cfg, seed=70, num_objects=2)

    def data_gen():
        for _ in range(4):
            from graph_neural_network_for_radar_perception_tpu.data.synthetic import (
                make_synthetic_frame,
            )

            yield make_synthetic_frame(
                ds.rng, num_objects=2,
                window_size=cfg.temporal_window_size,
            )

    acc = D.evaluate_detection_from_data(
        det, data_gen(), cluster_size_threshold=1, eps=0.7
    )
    assert acc.cm.sum() > 0
    from graph_neural_network_for_radar_perception_tpu.eval.metrics import (
        precision_recall,
    )

    res = precision_recall(acc.cm)
    assert np.isfinite(res["precision"]).all()
