"""End-to-end model + loss + train step tests, including the single-frame
overfit harness — the reference's de-facto correctness test
(script_overfit_gnn.ipynb, SURVEY.md §3.3): all four losses must shrink
dramatically when fitting one frame."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_neural_network_for_radar_perception_tpu.config.config import (
    tiny_test_config,
)
from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
    SyntheticRadarDataset,
    pad_frame,
    stack_batch,
)
from graph_neural_network_for_radar_perception_tpu.train import steps as T


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config()


@pytest.fixture(scope="module")
def batch(cfg):
    ds = SyntheticRadarDataset(cfg, seed=7, num_objects=3)
    return next(ds.batches(cfg.batch_size))


def to_jnp(tree):
    return jax.tree.map(jnp.asarray, tree)


class TestForward:
    def test_shapes_and_finiteness(self, cfg, batch):
        state = T.create_train_state(cfg, jax.random.key(0))
        loss_fn = T.make_loss_fn(cfg)
        total, metrics = loss_fn(state.params, to_jnp(batch))
        assert np.isfinite(float(total))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k

    def test_padding_invariance(self, cfg, batch):
        """Enlarging node capacity must not change the loss (masking is
        airtight)."""
        big = tiny_test_config(max_nodes=96, max_clusters=48)
        state = T.create_train_state(cfg, jax.random.key(0))

        ds = SyntheticRadarDataset(cfg, seed=21, num_objects=1)
        fr = ds.sample_frame()
        # The frame must fit the smaller capacity, otherwise truncation
        # differs between capacities and the comparison is meaningless.
        while fr.n > cfg.max_nodes or fr.cluster_class.shape[0] > cfg.max_clusters:
            fr = ds.sample_frame()
        b_small = stack_batch([pad_frame(fr, cfg)])
        b_big = stack_batch([pad_frame(fr, big)])

        # Same params applied at both capacities (shapes are per-feature,
        # capacity-independent).
        small_loss, small_m = T.make_loss_fn(cfg)(state.params, to_jnp(b_small))
        big_loss, big_m = T.make_loss_fn(big)(state.params, to_jnp(b_big))
        np.testing.assert_allclose(
            float(small_loss), float(big_loss), rtol=1e-4
        )
        for k in small_m:
            np.testing.assert_allclose(
                float(small_m[k]), float(big_m[k]), rtol=1e-4, err_msg=k
            )


class TestTrainStep:
    def test_loss_decreases(self, cfg, batch):
        state = T.create_train_state(cfg, jax.random.key(1))
        step = T.make_train_step(cfg)
        b = to_jnp(batch)
        _, m0 = step(state, b)
        for _ in range(30):
            state, m = step(state, b)
        assert float(m["loss_total"]) < float(m0["loss_total"])

    def test_overfit_single_frame(self):
        """Overfit milestone (SURVEY.md §7 step 4): a few hundred SGD steps
        on one small frame should collapse the total loss and push node/edge
        accuracy near 1."""
        cfg = tiny_test_config(
            learning_rate=0.02, max_train_iter=4000, batch_size=1
        )
        ds = SyntheticRadarDataset(cfg, seed=3, num_objects=2)
        b = to_jnp(stack_batch([pad_frame(ds.sample_frame(), cfg)]))
        state = T.create_train_state(cfg, jax.random.key(2))
        step = T.make_train_step(cfg)
        _, m0 = step(state, b)
        for _ in range(400):
            state, m = step(state, b)
        assert float(m["loss_total"]) < 0.35 * float(m0["loss_total"])
        assert float(m["segment_accuracy"]) > 0.85
        assert float(m["edge_accuracy"]) > 0.85
        assert float(m["skipped"]) == 0.0

    def test_nan_guard_skips_batch(self, cfg, batch):
        state = T.create_train_state(cfg, jax.random.key(0))
        step = T.make_train_step(cfg)
        bad = to_jnp(batch)
        poisoned = bad.graph.node_feat.at[0, 0, 0].set(jnp.nan)
        import dataclasses

        bad = dataclasses.replace(
            bad, graph=dataclasses.replace(bad.graph, node_feat=poisoned)
        )
        new_state, m = step(state, bad)
        assert float(m["skipped"]) == 1.0
        # params unchanged when skipped
        for a, b_ in zip(
            jax.tree.leaves(state.params), jax.tree.leaves(new_state.params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    def test_lr_schedule_milestones(self, cfg):
        sched = T.lr_schedule(cfg)
        m1, m2 = cfg.lr_milestones
        lr0 = float(sched(0))
        np.testing.assert_allclose(lr0, cfg.learning_rate)
        np.testing.assert_allclose(float(sched(m1 + 1)), lr0 * 0.1, rtol=1e-6)
        np.testing.assert_allclose(float(sched(m2 + 1)), lr0 * 0.01, rtol=1e-6)


class TestGradAccumulation:
    def test_accumulated_matches_large_batch(self):
        """k micro-batches of size 1 with accumulation == one step on the
        concatenated batch of size k (grads are mask-count-normalised per
        micro-batch, so parity is approximate up to per-batch count
        weighting; with identical micro-batches it is exact)."""
        from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
            SyntheticRadarDataset, pad_frame, stack_batch,
        )

        cfg1 = tiny_test_config(batch_size=1, grad_accumulation_steps=2)
        cfg2 = tiny_test_config(batch_size=2)
        ds = SyntheticRadarDataset(cfg1, seed=13, num_objects=2)
        fr = ds.sample_frame()
        item = pad_frame(fr, cfg1)
        b1 = to_jnp(stack_batch([item]))
        b2 = to_jnp(stack_batch([item, item]))

        s_acc = T.create_train_state(cfg1, jax.random.key(0))
        s_big = T.TrainState(
            s_acc.params,
            T.make_optimizer(cfg2).init(s_acc.params),
            jnp.zeros((), jnp.int32),
        )
        step_acc = T.make_train_step(cfg1)
        step_big = T.make_train_step(cfg2)

        # two micro-steps == one big step
        s_acc, m = step_acc(s_acc, b1)
        mid = jax.tree.leaves(s_acc.params)[0]
        # params unchanged after first micro-step (accumulating)
        np.testing.assert_array_equal(
            np.asarray(mid), np.asarray(jax.tree.leaves(s_big.params)[0])
        )
        s_acc, m = step_acc(s_acc, b1)
        s_big, m2 = step_big(s_big, b2)
        for a, b in zip(
            jax.tree.leaves(s_acc.params), jax.tree.leaves(s_big.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            )


class TestTrainScan:
    def test_scan_matches_sequential(self, cfg, batch):
        """K steps inside one lax.scan program == K sequential jitted
        steps, exactly (same batch every step)."""
        K = 3
        b = to_jnp(batch)
        s_seq = T.create_train_state(cfg, jax.random.key(2))
        s_scan = T.create_train_state(cfg, jax.random.key(2))
        step = T.make_train_step(cfg)
        for _ in range(K):
            s_seq, m_seq = step(s_seq, b)
        scan = T.make_train_scan(cfg, K)
        s_scan, m_scan = scan(s_scan, b)
        assert int(s_scan.step) == int(s_seq.step) == K
        for k in m_seq:
            np.testing.assert_allclose(
                float(m_scan[k]), float(m_seq[k]), rtol=1e-6, err_msg=k
            )
        for a, c in zip(
            jax.tree.leaves(s_seq.params), jax.tree.leaves(s_scan.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=1e-6, atol=1e-8
            )

    def test_scan_stacked_batches(self, cfg):
        """[K] stacked distinct batches == feeding them sequentially."""
        K = 3
        ds = SyntheticRadarDataset(cfg, seed=31, num_objects=2)
        gen = ds.batches(cfg.batch_size)
        bs = [to_jnp(next(gen)) for _ in range(K)]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *bs)
        s_seq = T.create_train_state(cfg, jax.random.key(3))
        s_scan = T.create_train_state(cfg, jax.random.key(3))
        step = T.make_train_step(cfg)
        for b in bs:
            s_seq, m_seq = step(s_seq, b)
        scan = T.make_train_scan(cfg, K)
        s_scan, m_scan = scan(s_scan, stacked)
        for k in m_seq:
            np.testing.assert_allclose(
                float(m_scan[k]), float(m_seq[k]), rtol=1e-6, err_msg=k
            )
        for a, c in zip(
            jax.tree.leaves(s_seq.params), jax.tree.leaves(s_scan.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=1e-6, atol=1e-8
            )

    def test_train_chunked_matches_plain_loop(self, cfg):
        """train_chunked (scan-dispatched) == train (per-step dispatch)
        over the same batch stream, including a short tail chunk."""
        from graph_neural_network_for_radar_perception_tpu.train.trainer import (
            TrainHooks, train, train_chunked,
        )

        ds = SyntheticRadarDataset(cfg, seed=41, num_objects=2)
        gen = ds.batches(cfg.batch_size)
        bs = [to_jnp(next(gen)) for _ in range(5)]
        hooks = TrainHooks(log_period=100, val_period=10**9,
                           print_fn=lambda s: None)
        s_a = train(cfg, iter(bs), hooks=hooks,
                    state=T.create_train_state(cfg, jax.random.key(4)),
                    train_step=T.make_train_step(cfg), max_iters=5)
        s_b = train_chunked(cfg, iter(bs), chunk=2, hooks=hooks,
                            state=T.create_train_state(cfg, jax.random.key(4)),
                            max_iters=5)
        assert int(s_a.step) == int(s_b.step) == 5
        for a, b in zip(
            jax.tree.leaves(s_a.params), jax.tree.leaves(s_b.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8
            )
