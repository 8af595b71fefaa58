"""Smoke tests: every viz function renders to a PNG without errors."""

import os

import matplotlib

matplotlib.use("Agg")

import jax
import numpy as np
import pytest

from graph_neural_network_for_radar_perception_tpu.config.config import (
    tiny_test_config,
)
from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
    SyntheticRadarDataset,
)
from graph_neural_network_for_radar_perception_tpu.infer.pipeline import (
    FrameDetector,
)
from graph_neural_network_for_radar_perception_tpu.train.steps import (
    init_params,
)
from graph_neural_network_for_radar_perception_tpu.viz import plots as V


@pytest.fixture(scope="module")
def det():
    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.key(0))
    d = FrameDetector(cfg, params)
    ds = SyntheticRadarDataset(cfg, seed=8, num_objects=2)
    return d.detect_frame_arrays(ds.sample_frame())


def test_primitives_render(det, tmp_path):
    import matplotlib.pyplot as plt

    px, py = det.xy[:, 0], det.xy[:, 1]
    fr = det.gt
    n = px.shape[0]
    V.plot_measurements(px, py)
    V.plot_range_rates(px, py, fr.other_feat[:n, 2], fr.other_feat[:n, 3])
    V.plot_graph(px, py, fr.senders, fr.receivers)
    V.plot_edge_labels(
        px, py, fr.und_senders, fr.und_receivers, fr.edge_class
    )
    V.plot_node_classes(px, py, det.node_class)
    V.plot_offsets(px, py, det.centers - det.xy)
    V.plot_clusters(
        px, py, det.node2cluster, det.num_clusters,
        cluster_mu=det.cluster_mu, cluster_sigma=det.cluster_sigma,
        cluster_class=det.cluster_class,
    )
    plt.savefig(tmp_path / "prims.png")
    plt.close("all")


def test_panels_and_gif(det, tmp_path):
    import matplotlib.pyplot as plt

    fig1 = V.plot_all_outputs(det, figsize=(8, 8))
    fig2 = V.compare_pred_gt(det, figsize=(8, 4))
    out = V.save_frames_as_gif([fig1, fig2], str(tmp_path / "out.gif"), fps=2)
    assert os.path.getsize(out) > 1000
    plt.close("all")


def test_long_tail_functions_render(det, tmp_path):
    """Every reference plot function has a working twin (PARITY.md map)."""
    import matplotlib.pyplot as plt

    px, py = det.xy[:, 0], det.xy[:, 1]
    n = px.shape[0]
    fr = det.gt
    centers = det.xy + fr.node_offsets[:n]
    V.plot_track_centers(px, py, centers[:, 0], centers[:, 1])
    V.plot_meas_and_gt_labels(px, py, fr.node_class[:n])
    V.plot_meas_cluster_centers(px, py, fr.node_offsets[:n])
    V.plot_meas_and_gt_labels_cluster_centers(
        px, py, fr.node_class[:n], fr.node_offsets[:n]
    )
    V.plot_pred_class(det)
    V.plot_pred_offsets(det)
    V.plot_pred_edge_class(det)
    V.plot_clusters_measurements_and_object_class(det)
    for fig_fn in (
        V.compare_pred_gt_class,
        V.compare_pred_gt_offsets,
        V.compare_pred_gt_offsets_meas,
        V.compare_pred_gt_edge_class,
        V.compare_pred_gt_offsets_edge_labels,
        V.compare_pred_gt_clusters,
        V.compare_pred_gt_object_classes,
    ):
        fig = fig_fn(det)
        assert fig is not None
    segs = V.compute_node_pairs(
        px, py, fr.edge_class, fr.und_senders, fr.und_receivers
    )
    assert segs.ndim == 3 and segs.shape[1:] == (2, 2)
    out = V.save_compare_pred_gt_clusters(det, str(tmp_path / "cmp.png"))
    assert os.path.exists(out)
    V.plot_channels(np.random.default_rng(0).random((16, 16, 3)))
    plt.close("all")


def test_interactive_viewer_widgets(tmp_path):
    """Interactive viewer parity essentials (reference Qt viewer:
    slider scrubbing, per-sensor toggles, display modes) — drive the
    widget callbacks headlessly and export."""
    import matplotlib

    matplotlib.use("Agg", force=True)
    from graph_neural_network_for_radar_perception_tpu.data.synthetic import (
        make_synthetic_frame,
    )
    from graph_neural_network_for_radar_perception_tpu.viz.viewer import (
        InteractiveSequenceViewer,
    )

    rng = np.random.default_rng(0)
    windows = [
        make_synthetic_frame(rng, num_objects=2, window_size=3)
        for _ in range(4)
    ]
    v = InteractiveSequenceViewer(windows)
    fig, widgets = v.build_figure()
    assert set(widgets) == {"slider", "sensors", "mode"}

    widgets["slider"].set_val(2)
    assert v.idx == 2
    n_before = int(v._visible_mask(windows[2]).sum())
    v.toggle_sensor(1)
    assert not v.sensors_on[1]
    assert int(v._visible_mask(windows[2]).sum()) <= n_before
    v.set_mode("doppler")
    v.set_mode("track")
    out = v.export(str(tmp_path / "viewer.png"))
    assert os.path.exists(out)
    import matplotlib.pyplot as plt

    plt.close(fig)
