"""Tests for clustering (device vs host parity), proposals, association
metrics, and the finetuning step."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_neural_network_for_radar_perception_tpu.eval import metrics as M
from graph_neural_network_for_radar_perception_tpu.infer import clustering as C
from graph_neural_network_for_radar_perception_tpu.infer import proposals as P


class TestClustering:
    def test_device_matches_host_bfs(self, rng):
        for trial in range(5):
            n_valid, n_cap = 40, 48
            centers = rng.uniform(0, 20, size=(n_valid, 2)).astype(np.float32)
            eps = 4.0
            host_ids = C.dbscan_host(centers, eps)

            padded = np.zeros((n_cap, 2), np.float32)
            padded[:n_valid] = centers
            mask = np.arange(n_cap) < n_valid
            ids, num = C.dbscan_on_device(
                jnp.asarray(padded), jnp.asarray(mask), eps
            )
            ids = np.asarray(ids)
            assert int(num) == host_ids.max() + 1
            np.testing.assert_array_equal(ids[:n_valid], host_ids)
            assert (ids[n_valid:] == n_cap).all()

    def test_device_matches_host_on_permuted_paths(self, rng):
        # ADVICE round 3: fixed-round min-label propagation split permuted
        # path graphs (20/20 failures on 64-node paths).  Adjacency
        # squaring must be exact on these worst-case-diameter graphs.
        for trial in range(20):
            n_valid, n_cap = 64, 80
            # a path in a random index order: node perm[i] sits at x=i
            perm = rng.permutation(n_valid)
            centers = np.zeros((n_valid, 2), np.float32)
            centers[perm, 0] = np.arange(n_valid, dtype=np.float32)
            eps = 1.5  # d²=1 between path neighbours only
            host_ids = C.dbscan_host(centers, eps)
            assert host_ids.max() == 0  # sanity: one component

            padded = np.zeros((n_cap, 2), np.float32)
            padded[:n_valid] = centers
            padded[n_valid:] = 1e6  # keep padding away from the path
            mask = np.arange(n_cap) < n_valid
            ids, num = C.dbscan_on_device(
                jnp.asarray(padded), jnp.asarray(mask), eps
            )
            assert int(num) == 1
            np.testing.assert_array_equal(
                np.asarray(ids)[:n_valid], host_ids
            )

    def test_device_matches_host_on_shuffled_chain(self, rng):
        # Realistic elongated object: collinear points stored in a shuffled
        # (temporally interleaved) order — the advisor's second repro.
        n_valid, n_cap = 40, 48
        order = rng.permutation(n_valid)
        centers = np.stack(
            [0.8 * order.astype(np.float32),
             0.1 * rng.standard_normal(n_valid).astype(np.float32)],
            axis=-1,
        )
        eps = 1.0  # neighbour d² ≈ 0.64 < 1; skip-one d² ≈ 2.56 > 1
        host_ids = C.dbscan_host(centers, eps)
        padded = np.full((n_cap, 2), 1e6, np.float32)
        padded[:n_valid] = centers
        mask = np.arange(n_cap) < n_valid
        ids, num = C.dbscan_on_device(
            jnp.asarray(padded), jnp.asarray(mask), eps
        )
        assert int(num) == host_ids.max() + 1
        np.testing.assert_array_equal(np.asarray(ids)[:n_valid], host_ids)

    def test_adjacency_from_centers_squared_semantics(self):
        # Reference quirk: the SQUARED distance is compared against eps
        # (clustering.py:31-40): d=1.1 → d²=1.21 > eps=1.2 → not adjacent,
        # even though the plain distance 1.1 < 1.2.
        centers = jnp.asarray([[0.0, 0.0], [1.1, 0.0]])
        mask = jnp.asarray([True, True])
        adj = np.asarray(C.adjacency_from_centers(centers, mask, eps=1.2))
        assert not adj[0, 1]

    def test_adjacency_squared_exact(self):
        centers = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [5.0, 0.0]])
        mask = jnp.asarray([True, True, True])
        adj = np.asarray(C.adjacency_from_centers(centers, mask, eps=1.5))
        assert adj[0, 1] and adj[1, 0]  # d²=1 <= 1.5
        assert not adj[0, 2]
        assert not adj.diagonal().any()

    def test_from_links(self):
        centers = jnp.asarray(
            [[0.0, 0.0], [0.5, 0.0], [10.0, 0.0], [0.0, 0.6]]
        )
        mask = jnp.ones(4, bool)
        und_s = jnp.asarray([0, 0, 1], jnp.int32)
        und_r = jnp.asarray([1, 2, 3], jnp.int32)
        und_mask = jnp.ones(3, bool)
        pred = jnp.asarray([1, 1, 0], jnp.int32)  # 0-2 link killed by dist
        ids, num = C.dbscan_on_device(
            centers, mask, 1.5, from_links=True,
            und_senders=und_s, und_receivers=und_r, und_mask=und_mask,
            pred_edges=pred,
        )
        ids = np.asarray(ids)
        assert ids[0] == ids[1]
        assert ids[2] != ids[0]
        assert ids[3] != ids[0]  # link 1-3 predicted 0


class TestProposals:
    def test_mean_cov_match_reference_formula(self, rng):
        from graph_neural_network_for_radar_perception_tpu.data.groundtruth import (
            cluster_mean_cov,
        )

        n = 12
        xy = rng.normal(size=(n, 2)).astype(np.float32)
        n2c = np.array([0] * 5 + [1] * 6 + [2], dtype=np.int32)
        cls_idx = np.zeros(n, np.int32)
        mask = np.ones(n, bool)
        props = P.compute_proposals(
            jnp.asarray(xy), jnp.asarray(cls_idx), jnp.asarray(n2c),
            jnp.asarray(mask), 4, 7,
        )
        noise = 0.5 * np.eye(2)
        for c, sl in [(0, slice(0, 5)), (1, slice(5, 11)), (2, slice(11, 12))]:
            mu, sigma = cluster_mean_cov(xy[sl], noise)
            np.testing.assert_allclose(
                np.asarray(props.mu)[c], mu, rtol=1e-4, atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(props.sigma)[c], sigma, rtol=1e-4, atol=1e-4
            )
        assert not bool(np.asarray(props.valid)[3])

    def test_majority_label(self):
        xy = jnp.zeros((4, 2))
        cls_idx = jnp.asarray([2, 2, 5, 1], jnp.int32)
        n2c = jnp.asarray([0, 0, 0, 1], jnp.int32)
        mask = jnp.ones(4, bool)
        props = P.compute_proposals(xy, cls_idx, n2c, mask, 2, 7)
        assert int(np.asarray(props.label)[0]) == 2
        assert int(np.asarray(props.label)[1]) == 1

    def test_cov_ellipse_radii(self):
        mu = jnp.zeros(2)
        sigma = jnp.asarray([[4.0, 0.0], [0.0, 1.0]])
        pts = np.asarray(P.cov_ellipse(mu, sigma, n_points=64, chi2_scale=1.0))
        assert pytest.approx(np.abs(pts[:, 0]).max(), rel=1e-2) == 2.0
        assert pytest.approx(np.abs(pts[:, 1]).max(), rel=1e-2) == 1.0


class TestAssociation:
    def test_greedy_iou_with_false_for_unmatched(self):
        gt_members = [np.array([0, 1, 2]), np.array([5, 6])]
        pred_members = [np.array([0, 1]), np.array([8, 9]), np.array([5, 6])]
        gt_cls = np.array([0, 1])
        pred_cls = np.array([0, 3, 1])
        gt_a, pred_a = M.associate_clusters(
            gt_members, pred_members, gt_cls, pred_cls, n_nodes=10, eps=0.7
        )
        # Reference emits only min(G, P)=2 greedy pairs
        # (detection_accuracy.py:229-235): gt1↔pred2 (1−iou=0), gt0↔pred0
        # (1−iou=1/3).  The never-associated pred 1 does NOT enter the
        # confusion at all.
        pairs = set(zip(gt_a.astype(int), pred_a.astype(int)))
        assert pairs == {(1, 1), (0, 0)}

    def test_greedy_far_association_becomes_false(self):
        # An associated pair whose cost exceeds eps records the prediction
        # against GT class FALSE (detection_accuracy.py:238-244).
        gt_members = [np.array([0, 1, 2])]
        pred_members = [np.array([7, 8])]
        gt_a, pred_a = M.associate_clusters(
            gt_members, pred_members, np.array([2]), np.array([4]),
            n_nodes=10, eps=0.7,
        )
        assert set(zip(gt_a.astype(int), pred_a.astype(int))) == {(6, 4)}

    def test_precision_recall_drops_none(self):
        cm = np.zeros((7, 7), np.int64)
        cm[0, 0] = 8
        cm[0, 1] = 2
        cm[5, 5] = 100  # NONE must be dropped
        pr = M.precision_recall(cm)
        assert 5 not in pr["classes"].tolist()
        np.testing.assert_allclose(pr["recall"][0], 0.8)
        np.testing.assert_allclose(pr["precision"][0], 1.0)


class TestFinetune:
    def test_finetune_updates_only_object_head(self):
        from graph_neural_network_for_radar_perception_tpu.config.config import (
            tiny_test_config,
        )
        from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
            SyntheticRadarDataset, pad_frame, stack_batch,
        )
        from graph_neural_network_for_radar_perception_tpu.train.finetune import (
            make_finetune_step,
        )
        from graph_neural_network_for_radar_perception_tpu.train.steps import (
            TrainState, init_params,
        )

        cfg = tiny_test_config(batch_size=2)
        params = init_params(cfg, jax.random.key(0))
        build, _ = make_finetune_step(cfg)
        step, tx = build(params)
        state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

        ds = SyntheticRadarDataset(cfg, seed=4, num_objects=2)
        b = jax.tree.map(
            jnp.asarray,
            stack_batch([pad_frame(ds.sample_frame(), cfg) for _ in range(2)]),
        )
        new_state, m = step(state, b)
        assert np.isfinite(float(m["loss_obj_cls"]))
        assert float(m["skipped"]) == 0.0

        flat_old = jax.tree_util.tree_flatten_with_path(state.params)[0]
        flat_new = jax.tree_util.tree_flatten_with_path(new_state.params)[0]
        changed = []
        for (po, vo), (pn, vn) in zip(flat_old, flat_new):
            top = po[0].key
            if not np.allclose(np.asarray(vo), np.asarray(vn)):
                changed.append(top)
        assert changed, "object head params should have moved"
        assert set(changed) == {"predict_class"}, set(changed)


class TestAssociationRawLists:
    """compute_associations must preserve the raw unassociated class lists
    for the empty-side conditions (detection_accuracy.py:252-279)."""

    def test_both_sides_present(self):
        from graph_neural_network_for_radar_perception_tpu.eval import (
            metrics as M,
        )

        gm = [np.array([0, 1]), np.array([2, 3])]
        pm = [np.array([0, 1])]
        res = M.compute_associations(
            gm, pm, np.array([1, 2]), np.array([1]), n_nodes=6, eps=0.7
        )
        assert res.gt_associated.size == 1
        np.testing.assert_array_equal(res.obj_class_gt, [1, 2])
        np.testing.assert_array_equal(res.obj_class_pred, [1])
        # tuple-unpacking stays backward compatible
        gt_a, pred_a = res
        assert gt_a.size == 1 and pred_a.size == 1

    def test_gt_only(self):
        from graph_neural_network_for_radar_perception_tpu.eval import (
            metrics as M,
        )

        res = M.compute_associations(
            [np.array([0, 1])], [], np.array([3]), np.zeros((0,)), n_nodes=4
        )
        assert res.gt_associated.size == 0
        np.testing.assert_array_equal(res.obj_class_gt, [3])
        assert res.obj_class_pred.size == 0

    def test_pred_only(self):
        from graph_neural_network_for_radar_perception_tpu.eval import (
            metrics as M,
        )

        res = M.compute_associations(
            [], [np.array([0])], np.zeros((0,)), np.array([4]), n_nodes=4
        )
        assert res.obj_class_gt.size == 0
        np.testing.assert_array_equal(res.obj_class_pred, [4])

    def test_both_empty(self):
        from graph_neural_network_for_radar_perception_tpu.eval import (
            metrics as M,
        )

        res = M.compute_associations(
            [], [], np.zeros((0,)), np.zeros((0,)), n_nodes=4
        )
        assert all(
            a.size == 0
            for a in (res.gt_associated, res.pred_associated,
                      res.obj_class_gt, res.obj_class_pred)
        )
