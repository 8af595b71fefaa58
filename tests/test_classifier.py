"""Stage-2 object classifier: sample building, training, overfit."""

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
from graph_neural_network_for_radar_perception_tpu.models import classifier as CL


def tiny_ccfg(**kw):
    base = dict(
        node_feat_enc_stem_channels=(32, 32),
        graph_convolution_stem_channels=(32, 32),
        msg_mlp_hidden_dim=32,
        node_pred_stem_channels=(32, 32),
        max_points=128,
        max_objects=16,
        max_edges=1024,
        learning_rate=0.01,
    )
    base.update(kw)
    return CL.ClassifierConfig(**base)


@pytest.fixture(scope="module")
def samples():
    cfg = tiny_test_config()
    ccfg = tiny_ccfg()
    ds = SyntheticRadarDataset(cfg, seed=0, num_objects=2)
    out = []
    while len(out) < 4:
        fr = ds.sample_frame()
        s = CL.build_classifier_sample(
            fr.other_feat[:, :2], fr.node_feat[:, 1], fr.node_class,
            fr.node2cluster, int(fr.cluster_class.shape[0]), ccfg,
        )
        if s is not None:
            out.append(s)
    return ccfg, out


def stack(samples):
    return CL.ClassifierSample(
        *[jnp.asarray(np.stack([getattr(s, f) for s in samples]))
          for f in CL.ClassifierSample._fields]
    )


class TestSampleBuilding:
    def test_shapes_and_masks(self, samples):
        ccfg, ss = samples
        s = ss[0]
        assert s.point_feat.shape == (ccfg.max_points, 5)
        n_pts = s.point_mask.sum()
        assert n_pts > 0
        assert (s.point2object[~s.point_mask] == ccfg.max_objects).all()
        # all intra-cluster edges connect points of the same object
        em = s.edge_mask
        assert (
            s.point2object[s.senders[em]] == s.point2object[s.receivers[em]]
        ).all()

    def test_normalized_features_centered(self, samples):
        ccfg, ss = samples
        s = ss[0]
        # per-object mean of transformed xy ≈ 0
        for o in range(int(s.object_mask.sum())):
            sel = (s.point2object == o) & s.point_mask
            if sel.sum() > 1:
                np.testing.assert_allclose(
                    s.point_feat[sel, :2].mean(0), 0.0, atol=1e-4
                )

    def test_small_clusters_dropped(self):
        ccfg = tiny_ccfg(valid_cluster_num_meas_thr=3)
        xy = np.array([[0, 0], [1, 0], [0, 1], [5, 5], [6, 5]], np.float32)
        rcs = np.zeros(5, np.float32)
        gtc = np.array([0, 0, 0, 2, 2], np.int32)
        n2c = np.array([0, 0, 0, 1, 1], np.int32)
        s = CL.build_classifier_sample(xy, rcs, gtc, n2c, 2, ccfg)
        assert int(s.object_mask.sum()) == 1  # 2-point cluster dropped
        assert int(s.object_class[0]) == 0


class TestTraining:
    def test_loss_decreases_and_overfits(self, samples):
        ccfg, ss = samples
        batch = stack(ss)
        model, init, step, loss_fn = CL.make_classifier_train_step(ccfg)
        state = init(jax.random.key(0), ss[0])
        _, m0 = step(state, batch)
        for _ in range(150):
            state, m = step(state, batch)
        assert float(m["loss_obj_cls"]) < float(m0["loss_obj_cls"])
        assert float(m["object_accuracy"]) >= 0.75
        assert float(m["skipped"]) == 0.0
