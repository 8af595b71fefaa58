"""Multi-frame DECISION-level parity vs the shipped reference checkpoint.

test_checkpoint_parity proves activation parity on one frame; this test
checks what the system *decides* — per-node classes, DBSCAN cluster
memberships, per-cluster object classes, and the final FALSE-filtered
detection list — against a plain-numpy/torch executor running the
reference's published decode recipe over many fixture frames:

  forward → softmax/argmax node class        (output.py:107-110)
  offsets → unnormalize → centers            (output.py:100-104,
                                              compute_offsets.py:13-18)
  Simple_DBSCAN over predicted centers, with the d² <= eps quirk
                                             (clustering.py:31-40, 43-93)
  object head on the DBSCAN member lists     (gnn_detector.py:180-187)
  drop class FALSE (id 6)                    (output.py:123-128)

Frames come from the mini-RadarScenes fixture through the REAL data
pipeline (HDF5 window extract → ego-comp → ROI → dynamic filter → graph
build), so the parity covers preprocess → forward → decode end-to-end.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fixtures_radarscenes import make_mini_radarscenes  # noqa: E402
from test_checkpoint_parity import CKPT, reference_forward  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="reference checkpoint not present"
)

WINDOW = 5
EPS = 1.4  # DBSCAN threshold (compared against d², reference quirk)
MIN_FRAMES = 20


def ref_dbscan(centers: np.ndarray, eps: float):
    """Reference Simple_DBSCAN over predicted centers: adjacency is
    d² <= eps (sic — clustering.py:37 compares the SQUARED norm against
    eps), then BFS expansion assigning cluster ids in scan order
    (clustering.py:64-92)."""
    n = centers.shape[0]
    diff = centers[:, None, :] - centers[None, :, :]
    adj = (diff * diff).sum(-1) <= eps
    np.fill_diagonal(adj, False)
    labels = -np.ones(n, dtype=np.int64)
    cid = 0
    for m in range(n):
        if labels[m] != -1:
            continue
        labels[m] = cid
        queue, qi = [m], 0
        while qi < len(queue):
            i = queue[qi]
            qi += 1
            for j in np.flatnonzero(adj[i] & (labels == -1)):
                labels[j] = cid
                queue.append(j)
        cid += 1
    return labels, cid


@pytest.fixture(scope="module")
def fixture_frames(tmp_path_factory):
    """>= MIN_FRAMES preprocessed fixture frames via the real pipeline."""
    from graph_neural_network_for_radar_perception_tpu.config.config import (
        GNNConfig,
    )
    from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
        preprocess_frame,
    )
    from graph_neural_network_for_radar_perception_tpu.data.radarscenes import (
        SequenceCache,
    )

    root = str(tmp_path_factory.mktemp("radarscenes"))
    make_mini_radarscenes(root, seed=7, n_scenes=40, n_objects=4)
    cfg = GNNConfig(
        max_nodes=256, max_clusters=128, temporal_window_size=WINDOW,
        dataset_augmentation=False,
    )
    cache = SequenceCache(root, "data")
    frames = []
    for w in cache.windows("sequence_1", WINDOW):
        data = cache.extract_window(
            "sequence_1", w,
            reject_outlier_by_ransac=cfg.reject_static_meas_by_ransac,
        )
        fr = preprocess_frame(data, cfg)
        if fr is not None and fr.n >= 3:
            frames.append(fr)
    assert len(frames) >= MIN_FRAMES, f"only {len(frames)} usable frames"
    return cfg, frames


@pytest.fixture(scope="module")
def executors(fixture_frames):
    import jax

    from graph_neural_network_for_radar_perception_tpu.infer.pipeline import (
        FrameDetector,
    )
    from graph_neural_network_for_radar_perception_tpu.train.steps import (
        init_params,
    )
    from graph_neural_network_for_radar_perception_tpu.utils.torch_import import (
        load_reference_checkpoint,
    )

    cfg, _ = fixture_frames
    params = init_params(cfg, jax.random.key(0))
    params = load_reference_checkpoint(params, CKPT)
    det = FrameDetector(cfg, params, eps=EPS, use_object_head=True)
    sd = {
        k[5:]: v for k, v in torch.load(CKPT, map_location="cpu").items()
    }
    return det, sd


def _torch_decisions(sd, fr, cfg):
    """Reference-recipe decisions for one unpadded frame (plain torch)."""
    t = lambda a, dt=torch.float32: torch.tensor(np.asarray(a), dtype=dt)
    args = (
        sd, t(fr.node_feat), t(fr.edge_feat),
        t(fr.senders, torch.long), t(fr.receivers, torch.long),
        t(fr.und_senders, torch.long), t(fr.und_receivers, torch.long),
    )
    # Pass 1: trunk + node/offset/link heads (object head inputs unknown
    # until DBSCAN ran — the deploy ordering of gnn_detector.py:141-187).
    dummy_members = [torch.arange(fr.n)]
    node_cls, node_off, edge_cls, _ = reference_forward(
        *args, dummy_members
    )
    node_class = node_cls.argmax(-1).numpy()
    sigma = np.asarray(cfg.reg_sigma, np.float32)
    mu = np.asarray(cfg.reg_mu, np.float32)
    deltas = node_off.numpy() * sigma + mu  # unnormalize_gt_offsets
    centers = fr.other_feat[:, :2] + deltas
    labels, n_clusters = ref_dbscan(centers, EPS)
    members = [
        torch.tensor(np.flatnonzero(labels == c))
        for c in range(n_clusters)
    ]
    # Pass 2: object head on the DBSCAN member lists.
    _, _, _, obj_cls = reference_forward(*args, members)
    obj_class = obj_cls.argmax(-1).numpy()
    link_class = edge_cls.argmax(-1).numpy()
    return dict(
        node_class=node_class, centers=centers, labels=labels,
        n_clusters=n_clusters, obj_class=obj_class, link_class=link_class,
    )


def test_decision_parity_across_frames(fixture_frames, executors):
    cfg, frames = fixture_frames
    det, sd = executors
    checked = 0
    for fi, fr in enumerate(frames):
        ref = _torch_decisions(sd, fr, cfg)
        d = det.detect_frame_arrays(fr)
        n = fr.n
        np.testing.assert_array_equal(
            d.node_class, ref["node_class"],
            err_msg=f"frame {fi}: node class decisions diverge",
        )
        np.testing.assert_allclose(
            d.centers, ref["centers"], rtol=1e-3, atol=1e-3,
            err_msg=f"frame {fi}: decoded centers diverge",
        )
        assert d.num_clusters == ref["n_clusters"], (
            f"frame {fi}: cluster count {d.num_clusters} != "
            f"{ref['n_clusters']}"
        )
        np.testing.assert_array_equal(
            d.node2cluster, ref["labels"],
            err_msg=f"frame {fi}: DBSCAN memberships diverge",
        )
        np.testing.assert_array_equal(
            d.cluster_class[: d.num_clusters],
            ref["obj_class"],
            err_msg=f"frame {fi}: object class decisions diverge",
        )
        np.testing.assert_array_equal(
            d.link_class, ref["link_class"],
            err_msg=f"frame {fi}: link decisions diverge",
        )
        # Final detection list after the FALSE filter (output.py:123-128).
        dets = d.detections(filter_false=True)
        ref_keep = np.flatnonzero(ref["obj_class"] != 6)
        np.testing.assert_array_equal(
            dets["cluster_ids"], ref_keep,
            err_msg=f"frame {fi}: final detection sets diverge",
        )
        checked += 1
    assert checked >= MIN_FRAMES
