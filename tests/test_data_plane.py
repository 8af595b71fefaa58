"""Data-plane unit tests: SE(2) ego compensation, stationary gating,
RANSAC, ground truth, RadarScenes reader (fabricated HDF5), GAT model."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_neural_network_for_radar_perception_tpu.data import groundtruth as G
from graph_neural_network_for_radar_perception_tpu.data import se2
from graph_neural_network_for_radar_perception_tpu.data import selection as sel


class TestSE2:
    def test_se2_inverse(self, rng):
        T = se2.se2(1.0, 2.0, 0.7)
        np.testing.assert_allclose(
            se2.se2_inverse(T) @ T, np.eye(3), atol=1e-12
        )

    def test_seq_car_round_trip(self, rng):
        x, y = rng.normal(size=7), rng.normal(size=7)
        xc, yc = se2.seq_to_car(x, y, 3.0, -1.5, 0.8)
        xs, ys = se2.car_to_seq(xc, yc, 3.0, -1.5, 0.8)
        np.testing.assert_allclose(xs, x, atol=1e-12)
        np.testing.assert_allclose(ys, y, atol=1e-12)

    def test_seq_to_car_matches_vendored_matrix(self):
        # Reference trafo_matrix_seq_to_car (coordinate_transformation.py:
        # 15-30): [[c, s, -x·c - y·s], [-s, c, x·s - y·c]] applied to
        # homogeneous [x_seq, y_seq, 1].
        ex, ey, yaw = 2.0, -3.0, 0.6
        c, s = np.cos(yaw), np.sin(yaw)
        M = np.array([[c, s, -ex * c - ey * s], [-s, c, ex * s - ey * c]])
        pts = np.array([[4.0, 1.0, 1.0], [-2.0, 5.0, 1.0]])
        want = pts @ M.T
        got_x, got_y = se2.seq_to_car(pts[:, 0], pts[:, 1], ex, ey, yaw)
        np.testing.assert_allclose(got_x, want[:, 0], atol=1e-12)
        np.testing.assert_allclose(got_y, want[:, 1], atol=1e-12)

    def test_ego_compensation_identity_when_static(self, rng):
        px = [rng.normal(size=5), rng.normal(size=3)]
        py = [rng.normal(size=5), rng.normal(size=3)]
        vx = [rng.normal(size=5), rng.normal(size=3)]
        vy = [rng.normal(size=5), rng.normal(size=3)]
        opx, opy, ovx, ovy = se2.ego_compensate_window(
            px, py, vx, vy, [3.0, 3.0], [1.0, 1.0], [0.5, 0.5]
        )
        for a, b in zip(opx, px):
            np.testing.assert_allclose(a, b, atol=1e-12)
        # velocities pass through untouched (reference meas_sync.py:67-68)
        for a, b in zip(ovx, vx):
            np.testing.assert_allclose(a, b)

    def test_ego_compensation_pure_translation(self):
        # Ego moved +10 in x between frames: a world-fixed point seen at
        # x=5 in the old frame appears at x=-5 in the new frame.
        px = [np.array([5.0]), np.array([0.0])]
        py = [np.array([0.0]), np.array([0.0])]
        vz = [np.zeros(1), np.zeros(1)]
        opx, opy, _, _ = se2.ego_compensate_window(
            px, py, vz, vz, [0.0, 10.0], [0.0, 0.0], [0.0, 0.0]
        )
        np.testing.assert_allclose(opx[0], [-5.0], atol=1e-12)
        np.testing.assert_allclose(opx[1], [0.0], atol=1e-12)

    def test_ego_compensation_rotation(self):
        # 90° yaw change: old +x axis becomes new -y axis.
        px = [np.array([1.0]), np.array([0.0])]
        py = [np.array([0.0]), np.array([0.0])]
        vz = [np.zeros(1), np.zeros(1)]
        opx, opy, _, _ = se2.ego_compensate_window(
            px, py, vz, vz, [0.0, 0.0], [0.0, 0.0], [0.0, np.pi / 2]
        )
        np.testing.assert_allclose(opx[0], [0.0], atol=1e-12)
        np.testing.assert_allclose(opy[0], [-1.0], atol=1e-12)


class TestStationarySelection:
    def test_gating_marks_static_world(self):
        # forward-mounted radar, ego moving at 10 m/s: stationary returns
        # straight ahead show vr = -10
        az = np.array([0.0, 0.0, np.pi / 4])
        vr = np.array([-10.0, 3.0, -10.0 * np.cos(np.pi / 4)])
        flag = sel.identify_stationary_measurements(
            az, vr, tx=3.0, ty=0.0, theta=0.0, vx_odom=10.0, yawrate_odom=0.0
        )
        assert flag.tolist() == [True, False, True]

    def test_estimate_sensor_vx_vy_recovers_motion(self, rng):
        vx_true, vy_true = 8.0, -2.0
        theta = rng.uniform(-np.pi, np.pi, 100)
        vr = -(vx_true * np.cos(theta) + vy_true * np.sin(theta))
        vx, vy = sel.estimate_sensor_vx_vy(theta, vr)
        np.testing.assert_allclose([vx, vy], [vx_true, vy_true], atol=1e-9)

    def test_ransac_rejects_outliers(self, rng):
        theta = rng.uniform(-np.pi, np.pi, 200)
        vr = -(5.0 * np.cos(theta)) + rng.normal(0, 0.02, 200)
        outliers = rng.random(200) < 0.1
        vr[outliers] += rng.uniform(2, 5, outliers.sum())
        z = np.stack([theta, vr], axis=1)
        inliers, valid, ratio = sel.ransac(z, rng=rng)
        assert valid
        # most true outliers rejected
        assert (inliers & outliers).sum() <= 3
        assert inliers[~outliers].mean() > 0.95

    def test_ransac_too_few_measurements(self):
        z = np.zeros((5, 2))
        inliers, valid, ratio = sel.ransac(z)
        assert not valid and not inliers.any()


class TestGroundTruth:
    def test_offsets_point_to_track_mean(self):
        px = np.array([0.0, 2.0, 10.0], np.float32)
        py = np.array([0.0, 0.0, 5.0], np.float32)
        tid = np.array([b"a", b"a", b""])
        ox, oy = G.gt_offsets(px, py, tid)
        np.testing.assert_allclose(ox, [1.0, -1.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(oy, [0.0, 0.0, 0.0])

    def test_node_classes(self):
        tid = np.array([b"a", b"", b""])
        stat = np.array([False, True, False])
        lab = np.array([0, 11, 11])  # CAR, STATIC, STATIC raw ids
        cls = G.gt_node_classes(tid, stat, lab)
        assert cls.tolist() == [0.0, 7.0, 6.0]  # CAR, STATIC, FALSE

    def test_clusters_tracks_then_singletons(self):
        tid = np.array([b"b", b"a", b"", b"a", b""])
        labels = np.array([4, 0, 6, 0, 6], np.int32)
        n2c, ccls = G.gt_clusters(tid, labels)
        # np.unique order: a < b → cluster 0 = 'a', cluster 1 = 'b'
        assert n2c.tolist() == [1, 0, 2, 0, 3]
        assert ccls.tolist() == [0, 4, 6, 6]


class TestRadarScenesReader:
    @pytest.fixture
    def fake_dataset(self, tmp_path, rng):
        """Fabricate a minimal RadarScenes directory structure."""
        import h5py

        root = tmp_path
        ddir = root / "data"
        ddir.mkdir()
        (ddir / "sensors.json").write_text(json.dumps({
            f"radar_{i}": {"id": i, "x": 3.0, "y": 0.5 - 0.25 * i,
                           "yaw": 0.1 * i}
            for i in range(1, 5)
        }))
        (ddir / "sequences.json").write_text(json.dumps({
            "n_sequences": 2,
            "sequences": {
                "sequence_1": {"category": "train"},
                "sequence_2": {"category": "validation"},
            },
        }))
        for seq in ["sequence_1", "sequence_2"]:
            sdir = ddir / seq
            sdir.mkdir()
            n_scenes, per = 6, 10
            total = n_scenes * per
            radar = np.zeros(total, dtype=[
                ("timestamp", "<i8"), ("sensor_id", "u1"),
                ("range_sc", "<f4"), ("azimuth_sc", "<f4"),
                ("rcs", "<f4"), ("vr", "<f4"), ("vr_compensated", "<f4"),
                ("x_cc", "<f4"), ("y_cc", "<f4"),
                ("x_seq", "<f4"), ("y_seq", "<f4"),
                ("uuid", "S32"), ("track_id", "S32"), ("label_id", "u1"),
            ])
            radar["timestamp"] = np.repeat(np.arange(n_scenes), per) * 60000
            radar["x_cc"] = rng.uniform(0, 90, total)
            radar["y_cc"] = rng.uniform(-40, 40, total)
            radar["azimuth_sc"] = rng.uniform(-1, 1, total)
            radar["vr"] = rng.normal(0, 1, total)
            radar["vr_compensated"] = rng.normal(0, 1, total)
            radar["rcs"] = rng.normal(-5, 5, total)
            radar["label_id"] = 11
            # one moving car track
            radar["label_id"][::7] = 0
            radar["track_id"][::7] = b"trk"
            odo = np.zeros(n_scenes, dtype=[
                ("timestamp", "<i8"), ("x_seq", "<f8"), ("y_seq", "<f8"),
                ("yaw_seq", "<f8"), ("vx", "<f8"), ("yaw_rate", "<f8"),
            ])
            odo["timestamp"] = np.arange(n_scenes) * 60000
            odo["x_seq"] = np.arange(n_scenes) * 0.5
            odo["vx"] = 8.0
            with h5py.File(sdir / "radar_data.h5", "w") as f:
                f.create_dataset("radar_data", data=radar)
                f.create_dataset("odometry", data=odo)
            scenes = {}
            for i in range(n_scenes):
                ts = int(i) * 60000
                scenes[str(ts)] = {
                    "sensor_id": int(1 + i % 4),
                    "odometry_timestamp": ts,
                    "odometry_index": i,
                    "radar_indices": [i * per, (i + 1) * per],
                    "next_timestamp": (
                        int(i + 1) * 60000 if i + 1 < n_scenes else None
                    ),
                    "prev_timestamp": None,
                }
            (sdir / "scenes.json").write_text(json.dumps({
                "sequence_name": seq,
                "first_timestamp": 0,
                "scenes": scenes,
            }))
        return str(root)

    def test_reader_end_to_end(self, fake_dataset):
        from graph_neural_network_for_radar_perception_tpu.config.config import (
            tiny_test_config,
        )
        from graph_neural_network_for_radar_perception_tpu.data.radarscenes import (
            RadarScenesDataset, SequenceCache, build_metadata,
            train_val_test_split,
        )

        cfg = tiny_test_config(temporal_window_size=4)
        cfg.dataset_dir = "data"
        train, val, test = train_val_test_split(fake_dataset, "data")
        assert train == ["sequence_1"] and val == ["sequence_2"]

        cache = SequenceCache(fake_dataset, "data")
        md = build_metadata(cache, ["sequence_1"], 4)
        assert len(md) == 3  # 6 scenes, window 4 → 3 positions

        data = cache.extract_window("sequence_1", md[0]["data"])
        assert data["meas_px"].shape[0] == 40  # 4 frames × 10
        assert (data["meas_trackid"] != b"").sum() > 0

        ds = RadarScenesDataset(cfg, fake_dataset, md)
        item = ds[0]
        if item is not None:
            graph, labels = item
            assert graph.node_feat.shape == (cfg.max_nodes, 6)


def test_gat_model_forward():
    from graph_neural_network_for_radar_perception_tpu.config.config import (
        tiny_test_config,
    )
    from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
        SyntheticRadarDataset, pad_frame,
    )
    from graph_neural_network_for_radar_perception_tpu.models.gat import (
        RadarGNNv2,
    )

    cfg = tiny_test_config(hidden_node_channels_gat=32, num_heads_gat=4)
    ds = SyntheticRadarDataset(cfg, seed=5, num_objects=2)
    g, lbl = pad_frame(ds.sample_frame(), cfg)
    g = jax.tree.map(jnp.asarray, g)
    model = RadarGNNv2(cfg)
    params = model.init(
        jax.random.key(0), g, jnp.asarray(lbl.node2cluster),
        cfg.max_clusters, jnp.asarray(lbl.cluster_mask),
    )["params"]
    out = model.apply(
        {"params": params}, g, jnp.asarray(lbl.node2cluster),
        cfg.max_clusters, jnp.asarray(lbl.cluster_mask),
    )
    assert np.isfinite(np.asarray(out.node_cls)).all()
    assert out.node_cls.shape == (cfg.max_nodes, cfg.num_classes)
    # gradient flows
    def loss(p):
        o = model.apply(
            {"params": p}, g, jnp.asarray(lbl.node2cluster),
            cfg.max_clusters, jnp.asarray(lbl.cluster_mask),
        )
        return jnp.sum(o.node_cls**2)

    grads = jax.grad(loss)(params)
    assert all(
        np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(grads)
    )


def test_v1_fused_node_head_model():
    # Model_Inference_v1 (gnn_detector.py:204-313): node cls + offsets from
    # one shared stem; no separate predict_node/predict_offset params.
    from graph_neural_network_for_radar_perception_tpu.config.config import (
        tiny_test_config,
    )
    from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
        SyntheticRadarDataset, pad_frame,
    )
    from graph_neural_network_for_radar_perception_tpu.models.gnn import (
        RadarGNNv1,
    )

    cfg = tiny_test_config()
    ds = SyntheticRadarDataset(cfg, seed=5, num_objects=2)
    g, lbl = pad_frame(ds.sample_frame(), cfg)
    g = jax.tree.map(jnp.asarray, g)
    model = RadarGNNv1(cfg)
    args = (g, jnp.asarray(lbl.node2cluster), cfg.max_clusters,
            jnp.asarray(lbl.cluster_mask))
    params = model.init(jax.random.key(0), *args)["params"]
    assert "predict_node_fused" in params
    assert "predict_node" not in params and "predict_offset" not in params
    out = model.apply({"params": params}, *args)
    assert out.node_cls.shape == (cfg.max_nodes, cfg.num_classes)
    assert out.node_offsets.shape == (cfg.max_nodes, cfg.reg_offset_dim)
    assert np.isfinite(np.asarray(out.node_cls)).all()

    def loss(p):
        o = model.apply({"params": p}, *args)
        return jnp.sum(o.node_cls**2) + jnp.sum(o.node_offsets**2)

    grads = jax.grad(loss)(params)
    assert all(
        np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(grads)
    )


def test_variant_deploy_paths():
    """RadarGNNv1/v2 must support deploy (on-device DBSCAN proposals):
    v1 routes node heads through the fused NodePredictions head, v2
    through its GAT trunk — capability extensions over the reference,
    whose v1/v2 have no extract_proposals branch (gnn_detector.py:291-313).
    Regression for round-1 ADVICE (v1 inherited a deploy that referenced
    undefined submodules)."""
    from graph_neural_network_for_radar_perception_tpu.config.config import (
        tiny_test_config,
    )
    from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
        SyntheticRadarDataset, pad_frame,
    )
    from graph_neural_network_for_radar_perception_tpu.models.gat import (
        RadarGNNv2,
    )
    from graph_neural_network_for_radar_perception_tpu.models.gnn import (
        RadarGNN, RadarGNNv1,
    )

    cfg = tiny_test_config(hidden_node_channels_gat=32, num_heads_gat=4)
    ds = SyntheticRadarDataset(cfg, seed=7, num_objects=2)
    g, lbl = pad_frame(ds.sample_frame(), cfg)
    g = jax.tree.map(jnp.asarray, g)
    init_args = (g, jnp.asarray(lbl.node2cluster), cfg.max_clusters,
                 jnp.asarray(lbl.cluster_mask))
    for cls in (RadarGNN, RadarGNNv1, RadarGNNv2):
        model = cls(cfg)
        params = model.init(jax.random.key(0), *init_args)["params"]
        out = model.apply(
            {"params": params}, g, eps=1.4, method=cls.deploy
        )
        assert out.node_cls.shape == (cfg.max_nodes, cfg.num_classes)
        assert out.node_offsets.shape == (cfg.max_nodes, cfg.reg_offset_dim)
        assert np.isfinite(np.asarray(out.centers)).all()
        n2c = np.asarray(out.node2cluster)
        nm = np.asarray(g.node_mask)
        assert (n2c[nm] < int(out.num_clusters)).all(), cls.__name__
