"""Unit tests for segment ops, norms, and the on-device graph builder,
diffed against dense numpy references and the host-side golden builder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_neural_network_for_radar_perception_tpu.data import features as F
from graph_neural_network_for_radar_perception_tpu.ops import graph_build as GB
from graph_neural_network_for_radar_perception_tpu.ops import norms as N
from graph_neural_network_for_radar_perception_tpu.ops import segment as S


class TestSegmentOps:
    def test_masked_segment_sum_matches_dense(self, rng):
        e, n, d = 50, 8, 4
        data = rng.normal(size=(e, d)).astype(np.float32)
        ids = rng.integers(0, n, size=e).astype(np.int32)
        mask = rng.random(e) > 0.3
        out = S.masked_segment_sum(jnp.asarray(data), jnp.asarray(ids), n, jnp.asarray(mask))
        expect = np.zeros((n, d), np.float32)
        for i in range(e):
            if mask[i]:
                expect[ids[i]] += data[i]
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)

    def test_masked_segment_max(self, rng):
        e, n = 40, 6
        data = rng.normal(size=(e, 3)).astype(np.float32)
        ids = rng.integers(0, n, size=e).astype(np.int32)
        mask = rng.random(e) > 0.5
        out = np.asarray(
            S.masked_segment_max(jnp.asarray(data), jnp.asarray(ids), n, jnp.asarray(mask))
        )
        for seg in range(n):
            rows = data[(ids == seg) & mask]
            if rows.shape[0]:
                np.testing.assert_allclose(out[seg], rows.max(0), rtol=1e-6)
            else:
                np.testing.assert_allclose(out[seg], 0.0)

    def test_segment_sum_void_slot_dropped(self):
        # valid rows pointing at num_segments (void) must vanish
        data = jnp.ones((4, 2))
        ids = jnp.array([0, 1, 3, 3], jnp.int32)  # 3 == num_segments
        mask = jnp.array([True, True, True, True])
        out = S.masked_segment_sum(data, ids, 3, mask)
        np.testing.assert_allclose(np.asarray(out)[2], 0.0)

    def test_segment_softmax_sums_to_one(self, rng):
        e, n = 30, 5
        logits = jnp.asarray(rng.normal(size=(e,)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, n, size=e).astype(np.int32))
        mask = jnp.asarray(rng.random(e) > 0.2)
        w = S.segment_softmax(logits, ids, n, mask)
        sums = S.masked_segment_sum(w, ids, n, mask)
        present = np.asarray(S.segment_count(ids, n, mask)) > 0
        np.testing.assert_allclose(np.asarray(sums)[present], 1.0, rtol=1e-5)


def _torch_style_std(x, axis=None, keepdims=False):
    """Bessel-corrected std like torch.std."""
    n = np.prod([x.shape[a] for a in (axis if isinstance(axis, tuple) else (axis,))]) if axis is not None else x.size
    mean = np.mean(x, axis=axis, keepdims=True)
    var = np.sum((x - mean) ** 2, axis=axis, keepdims=keepdims) / max(n - 1, 1)
    return np.sqrt(var)


class TestNorms:
    def test_channel_norm(self, rng):
        x = rng.normal(size=(7, 16)).astype(np.float32)
        out = np.asarray(N.channel_norm(jnp.asarray(x), 1.0, 0.0))
        mean = x.mean(1, keepdims=True)
        std = _torch_style_std(x, axis=1, keepdims=True)
        expect = (x - mean) / (std + 1e-5)
        np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)

    def test_layer_norm_masked_matches_unpadded(self, rng):
        x = rng.normal(size=(5, 8)).astype(np.float32)
        xp = np.concatenate([x, np.zeros((3, 8), np.float32)])
        mask = np.array([True] * 5 + [False] * 3)
        out_full = np.asarray(N.layer_norm(jnp.asarray(x), 1.0, 0.0))
        out_masked = np.asarray(
            N.layer_norm(jnp.asarray(xp), 1.0, 0.0, jnp.asarray(mask))
        )[:5]
        np.testing.assert_allclose(out_masked, out_full, rtol=1e-4, atol=1e-5)

    def test_group_norm_masked_matches_unpadded(self, rng):
        x = rng.normal(size=(6, 8)).astype(np.float32)
        xp = np.concatenate([x, 7 * np.ones((4, 8), np.float32)])
        mask = np.array([True] * 6 + [False] * 4)
        out_full = np.asarray(N.group_norm(jnp.asarray(x), 1.0, 0.0, 2))
        out_masked = np.asarray(
            N.group_norm(jnp.asarray(xp), 1.0, 0.0, 2, jnp.asarray(mask))
        )[:6]
        np.testing.assert_allclose(out_masked, out_full, rtol=1e-4, atol=1e-5)

    def test_layer_norm_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.normal(size=(9, 12)).astype(np.float32)
        t = torch.tensor(x)
        expect = ((t - t.mean()) / (t.std() + 1e-5)).numpy()
        out = np.asarray(N.layer_norm(jnp.asarray(x), 1.0, 0.0))
        np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


class TestGraphBuild:
    """Device builder vs host golden builder (reference semantics)."""

    def _points(self, rng, n):
        return rng.uniform(0, 40, size=(n, 2)).astype(np.float32)

    @pytest.mark.parametrize("n_valid", [5, 17, 40])
    def test_knn_adjacency_matches_reference(self, rng, n_valid):
        k, n_cap = 4, 48
        pts = self._points(rng, n_valid)
        ref = F.adjacency_info(pts[:, 0], pts[:, 1], eps_sq=25.0, k=k)

        padded = np.zeros((n_cap, 2), np.float32)
        padded[:n_valid] = pts
        mask = np.zeros(n_cap, bool)
        mask[:n_valid] = True
        d2 = GB.pairwise_sq_dist(jnp.asarray(padded), jnp.asarray(mask))
        adj = np.asarray(GB.knn_adjacency_matrix(d2, jnp.asarray(mask), k))
        np.testing.assert_array_equal(adj[:n_valid, :n_valid], ref["adj_matrix"])
        assert not adj[n_valid:].any() and not adj[:, n_valid:].any()

    @pytest.mark.parametrize("n_valid", [6, 30])
    def test_full_structure_matches_reference(self, rng, n_valid):
        k, n_cap = 4, 32
        e_cap, eu_cap = 2 * k * n_cap, k * n_cap
        pts = self._points(rng, n_valid)
        ref = F.adjacency_info(pts[:, 0], pts[:, 1], eps_sq=25.0, k=k)

        padded = np.zeros((n_cap, 2), np.float32)
        padded[:n_valid] = pts
        mask = np.zeros(n_cap, bool)
        mask[:n_valid] = True
        gs = GB.build_graph_structure(
            jnp.asarray(padded), jnp.asarray(mask),
            k=k, eps_sq=25.0, edge_capacity=e_cap, und_capacity=eu_cap,
        )
        ne = int(np.asarray(gs.edge_mask).sum())
        assert ne == ref["adj_list"].shape[1]
        # row-major ordering parity with np.where
        np.testing.assert_array_equal(np.asarray(gs.senders)[:ne], ref["adj_list"][0])
        np.testing.assert_array_equal(np.asarray(gs.receivers)[:ne], ref["adj_list"][1])
        # degree parity (ball query)
        np.testing.assert_array_equal(
            np.asarray(gs.degree)[:n_valid], ref["degree"]
        )
        # undirected = triu of adjacency
        rows, cols = np.nonzero(np.triu(ref["adj_matrix"], k=1))
        nu = int(np.asarray(gs.und_mask).sum())
        assert nu == rows.shape[0]
        np.testing.assert_array_equal(np.asarray(gs.und_senders)[:nu], rows)
        np.testing.assert_array_equal(np.asarray(gs.und_receivers)[:nu], cols)

    def test_edge_features_match(self, rng):
        n_valid, k, n_cap = 20, 4, 24
        pts = self._points(rng, n_valid)
        data = {
            "meas_px": pts[:, 0], "meas_py": pts[:, 1],
            "meas_vx": rng.normal(size=n_valid).astype(np.float32),
            "meas_vy": rng.normal(size=n_valid).astype(np.float32),
            "meas_timestamp": rng.uniform(0, 1e6, n_valid),
        }
        ref = F.adjacency_info(pts[:, 0], pts[:, 1], 25.0, k)
        ref_ef = F.edge_features_np(data, ref["adj_list"])

        pad = lambda x: np.concatenate([x, np.zeros(n_cap - n_valid, x.dtype)])
        mask = np.arange(n_cap) < n_valid
        gs = GB.build_graph_structure(
            jnp.asarray(np.stack([pad(data["meas_px"]), pad(data["meas_py"])], -1)),
            jnp.asarray(mask), k=k, eps_sq=25.0,
            edge_capacity=2 * k * n_cap, und_capacity=k * n_cap,
        )
        ef = GB.compute_edge_features_device(
            pad(data["meas_px"]), pad(data["meas_py"]),
            pad(data["meas_vx"]), pad(data["meas_vy"]),
            pad(data["meas_timestamp"].astype(np.float64)).astype(np.float32),
            gs.senders, gs.receivers, gs.edge_mask,
        )
        ne = int(np.asarray(gs.edge_mask).sum())
        np.testing.assert_allclose(
            np.asarray(ef)[:ne], ref_ef, rtol=1e-4, atol=1e-5
        )


class TestOnehotSegops:
    """The TPU implementation of segment-sum/gather (one-hot MXU matmuls,
    docs/PERF.md round 5) must match the exact scatter/take path: values,
    gradients, and the mask/sentinel conventions."""

    def _both(self, fn, monkeypatch):
        monkeypatch.setenv("SEGOP_IMPL", "scatter")
        a = fn()
        monkeypatch.setenv("SEGOP_IMPL", "onehot")
        b = fn()
        return a, b

    def test_segment_sum_parity(self, rng, monkeypatch):
        E, N, D = 193, 41, 17
        data = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, N, (E,)).astype(np.int32))
        mask = jnp.asarray(rng.random(E) > 0.4)
        a, b = self._both(
            lambda: S.masked_segment_sum(data, ids, N, mask), monkeypatch
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-6,
                                   atol=1e-6)

    def test_segment_sum_1d_and_unmasked(self, rng, monkeypatch):
        E, N = 129, 23
        data = jnp.asarray(rng.normal(size=(E,)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, N, (E,)).astype(np.int32))
        a, b = self._both(
            lambda: S.masked_segment_sum(data, ids, N), monkeypatch
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-6,
                                   atol=1e-6)

    def test_gather_parity_and_grad(self, rng, monkeypatch):
        E, N, D = 211, 37, 13
        tab = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, N, (E,)).astype(np.int32))

        def run():
            val = S.gather_nodes(tab, ids)
            g = jax.grad(
                lambda t: jnp.sum(jnp.sin(S.gather_nodes(t, ids)))
            )(tab)
            return val, g

        (va, ga), (vb, gb) = self._both(run, monkeypatch)
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=2e-6,
                                   atol=1e-6)

    def test_gather_sentinel_gives_zero_row(self, rng, monkeypatch):
        """fast_path sentinel-pads edges with idx == N: the one-hot gather
        must yield a zero row there (jnp.take would clip)."""
        N, D = 11, 5
        tab = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
        ids = jnp.asarray(np.array([0, N, 3], np.int32))
        monkeypatch.setenv("SEGOP_IMPL", "onehot")
        out = S.gather_nodes(tab, ids)
        np.testing.assert_array_equal(np.asarray(out[1]), np.zeros(D))

    def test_model_loss_parity(self, monkeypatch):
        """Full model loss agrees between the two segop backends."""
        from graph_neural_network_for_radar_perception_tpu.config.config import (
            tiny_test_config,
        )
        from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
            SyntheticRadarDataset,
        )
        from graph_neural_network_for_radar_perception_tpu.train import (
            steps as T,
        )

        cfg = tiny_test_config()
        ds = SyntheticRadarDataset(cfg, seed=5, num_objects=2)
        batch = jax.tree.map(jnp.asarray, next(ds.batches(cfg.batch_size)))
        state = T.create_train_state(cfg, jax.random.key(0))
        loss_fn = T.make_loss_fn(cfg)
        monkeypatch.setenv("SEGOP_IMPL", "scatter")
        la, ma = jax.jit(loss_fn)(state.params, batch)
        monkeypatch.setenv("SEGOP_IMPL", "onehot")
        lb, mb = jax.jit(loss_fn)(state.params, batch)
        np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
        for k in ma:
            np.testing.assert_allclose(
                float(ma[k]), float(mb[k]), rtol=1e-4, atol=1e-6, err_msg=k
            )
