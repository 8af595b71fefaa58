"""BEV-grid data plane + CNN detector branch tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_neural_network_for_radar_perception_tpu.data import grid as G
from graph_neural_network_for_radar_perception_tpu.data.labels import (
    INVALID_NUM, ID_STATIC,
)
from graph_neural_network_for_radar_perception_tpu.models import cnn as CNN

SPEC = G.GridSpec(min_x=0, max_x=16, min_y=-8, max_y=8, dx=0.5, dy=0.5)


class TestGridDataPlane:
    def test_gridify_priority(self):
        # two measurements in the same cell: the dynamic one must win
        px = jnp.asarray([1.1, 1.2], jnp.float32)
        py = jnp.asarray([0.1, 0.2], jnp.float32)
        values = jnp.asarray([[1.0], [2.0]], jnp.float32)
        labels = jnp.asarray([ID_STATIC, 0.0], jnp.float32)
        mask = jnp.asarray([True, True])
        vg, lg = G.gridify(SPEC, px, py, values, labels, mask)
        ix, iy = SPEC.cell_index(px[1], py[1])
        assert float(vg[ix, iy, 0]) == 2.0
        assert float(lg[ix, iy]) == 0.0

    def test_gridify_empty_cells_invalid(self):
        px = jnp.asarray([1.0], jnp.float32)
        py = jnp.asarray([0.0], jnp.float32)
        vg, lg = G.gridify(
            SPEC, px, py, jnp.ones((1, 1)), jnp.zeros(1), jnp.asarray([True])
        )
        assert (np.asarray(lg) == INVALID_NUM).sum() == SPEC.num_x * SPEC.num_y - 1

    def test_likelihood_peaks_at_measurement(self):
        centers = jnp.asarray(SPEC.cell_centers())
        meas = jnp.asarray([[4.25, 0.25]], jnp.float32)
        cov = jnp.asarray([np.eye(2, dtype=np.float32)])
        lik = G.likelihood_map(SPEC, meas, cov, jnp.asarray([True]), centers)
        lik = np.asarray(lik)
        ix, iy = SPEC.cell_index(meas[0, 0], meas[0, 1])
        assert lik[int(ix), int(iy)] == lik.max()
        assert lik.max() == pytest.approx(1.0, abs=1e-3)

    def test_build_grid_sample(self, rng):
        n = 20
        data = {
            "meas_px": rng.uniform(0, 15, n).astype(np.float32),
            "meas_py": rng.uniform(-7, 7, n).astype(np.float32),
            "meas_vr": rng.normal(size=n).astype(np.float32),
            "meas_rcs": rng.normal(size=n).astype(np.float32),
        }
        gt = {
            "class_labels": rng.integers(0, 8, n).astype(np.float32),
            "offsetx": rng.normal(size=n).astype(np.float32),
            "offsety": rng.normal(size=n).astype(np.float32),
        }
        s = G.build_grid_sample(SPEC, data, gt, max_meas=32)
        assert s["image"].shape == (SPEC.num_x, SPEC.num_y, 3)
        assert s["label_grid"].shape == (SPEC.num_x, SPEC.num_y)
        n_valid = (s["label_grid"] != INVALID_NUM).sum()
        assert 0 < n_valid <= n


class TestCNNDetector:
    @pytest.fixture(scope="class")
    def tiny_cfg(self):
        return CNN.CNNConfig(
            base_stem_channels=(8, 8),
            base_kernel_sizes=(5, 3),
            bottleneck_number_of_blocks=(1, 1),
            bottleneck_stem_channels=(16, 16),
            bottleneck_width_channels=8,
            neck_out_channels=8,
            head_stem_channels=(8,),
            head_ffn_channels=(8,),
            learning_rate=0.01,
        )

    def test_forward_shapes(self, tiny_cfg, rng):
        model = CNN.GridDetector(tiny_cfg)
        image = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
        vr = jnp.zeros((1, 32, 32))
        rcs = jnp.zeros((1, 32, 32))
        params = model.init(jax.random.key(0), image, vr, rcs)["params"]
        out = model.apply({"params": params}, image, vr, rcs)
        assert out.cls.shape == (1, 32, 32, 8)
        assert out.reg.shape == (1, 32, 32, 2)

    def test_ws_conv_block(self, rng):
        # GroupNorm uses the reference's fixed 16 groups (constants.py:11),
        # so channels must be a multiple of 16.
        blk = CNN.WSConvBlock(features=32, kernel_size=3)
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 4)).astype(np.float32))
        params = blk.init(jax.random.key(0), x)["params"]
        out = blk.apply({"params": params}, x)
        assert out.shape == (1, 16, 16, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_training_reduces_loss(self, tiny_cfg, rng):
        model, init, step, loss_fn = CNN.make_grid_train_step(tiny_cfg)
        image = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
        vr = jnp.zeros((2, 32, 32))
        rcs = jnp.zeros((2, 32, 32))
        labels = np.full((2, 32, 32), INVALID_NUM, np.float32)
        labels[:, 5:15, 5:15] = rng.integers(0, 6, (2, 10, 10))
        labels[:, 20:25, 20:25] = 7.0  # STATIC cells
        offsets = rng.normal(size=(2, 32, 32, 2)).astype(np.float32)
        labels = jnp.asarray(labels)
        offsets = jnp.asarray(offsets)

        state = init(jax.random.key(0), image, vr, rcs)
        _, m0 = step(state, image, vr, rcs, labels, offsets)
        for _ in range(25):
            state, m = step(state, image, vr, rcs, labels, offsets)
        assert float(m["loss_total"]) < float(m0["loss_total"])
        assert float(m["skipped"]) == 0.0

    def test_loss_empty_grid_is_zero(self, tiny_cfg):
        out = CNN.GridOutputs(
            cls=jnp.zeros((1, 8, 8, 8)), reg=jnp.zeros((1, 8, 8, 2))
        )
        labels = jnp.full((1, 8, 8), INVALID_NUM)
        offsets = jnp.zeros((1, 8, 8, 2))
        total, m = CNN.grid_loss(out, labels, offsets, tiny_cfg)
        assert float(total) == 0.0
