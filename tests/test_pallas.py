"""Fused message-passing Pallas kernel vs the unfused XLA reference —
forward and gradients (interpret mode on CPU; the same kernel compiles
natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_neural_network_for_radar_perception_tpu.ops.pallas import fused_mp


def make_problem(rng, n=128, e=700, d=32, de=16, h=64, d2=32):
    x = rng.normal(size=(n, d)).astype(np.float32)
    ef = rng.normal(size=(e, de)).astype(np.float32)
    senders = rng.integers(0, n, size=e).astype(np.int32)
    receivers = rng.integers(0, n, size=e).astype(np.int32)
    # sprinkle padded (sentinel) edges
    pad = rng.random(e) < 0.1
    senders[pad] = n
    receivers[pad] = n
    w1 = (rng.normal(size=(2 * d + de, h)) * 0.1).astype(np.float32)
    b1 = rng.normal(size=(h,)).astype(np.float32) * 0.1
    w2 = (rng.normal(size=(h, d2)) * 0.1).astype(np.float32)
    b2 = rng.normal(size=(d2,)).astype(np.float32) * 0.1
    return (x, ef, senders, receivers, w1, b1, w2, b2,
            np.float32(1.1), np.float32(0.05), np.float32(0.9),
            np.float32(-0.02))


def test_forward_matches_xla(rng):
    args = make_problem(rng)
    got = fused_mp.fused_message_pass(
        *[jnp.asarray(a) for a in args], 0.01, 256, True
    )
    want = fused_mp._xla_reference(
        *[jnp.asarray(a) for a in args], slope=0.01
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )


def test_forward_bf16_mode(rng):
    # bf16 MXU operands, f32 accumulate: agrees with the f32 reference to
    # bf16 rounding; gradients (f32 recompute) stay exact.
    args = make_problem(rng)
    got = fused_mp.fused_message_pass(
        *[jnp.asarray(a) for a in args], 0.01, 256, True, True
    )
    want = fused_mp._xla_reference(
        *[jnp.asarray(a) for a in args], slope=0.01
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=5e-2
    )

    # With a FIXED cotangent (linear loss) the bf16 kernel's gradient must
    # match the f32 reference exactly-ish: the backward is an f32 recompute
    # regardless of forward precision.
    jargs = [jnp.asarray(a) for a in args]
    cot = jnp.asarray(rng.normal(size=np.asarray(want).shape), jnp.float32)
    g_bf = jax.grad(
        lambda x: jnp.sum(
            fused_mp.fused_message_pass(
                x, *jargs[1:], 0.01, 256, True, True
            ) * cot
        )
    )(jargs[0])
    g_f32 = jax.grad(
        lambda x: jnp.sum(
            fused_mp._xla_reference(x, *jargs[1:], slope=0.01) * cot
        )
    )(jargs[0])
    np.testing.assert_allclose(
        np.asarray(g_bf), np.asarray(g_f32), rtol=2e-4, atol=2e-5
    )


def test_forward_non_divisible_tile(rng):
    args = make_problem(rng, e=500)
    got = fused_mp.fused_message_pass(
        *[jnp.asarray(a) for a in args], 0.01, 256, True
    )
    want = fused_mp._xla_reference(
        *[jnp.asarray(a) for a in args], slope=0.01
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )


@pytest.mark.parametrize("pallas_bwd", [False, True])
def test_gradients_match_xla(rng, pallas_bwd):
    # Backward selection is an explicit nondiff argument (not an env var),
    # so it is visible in the jit cache key.
    args = [jnp.asarray(a) for a in make_problem(rng, n=64, e=300)]

    def loss_kernel(x, ef, w1, b1, w2, b2, g1, be1, g2, be2):
        out = fused_mp.fused_message_pass(
            x, ef, args[2], args[3], w1, b1, w2, b2, g1, be1, g2, be2,
            0.01, 128, True, False, pallas_bwd,
        )
        return jnp.sum(out * out)

    def loss_xla(x, ef, w1, b1, w2, b2, g1, be1, g2, be2):
        out = fused_mp._xla_reference(
            x, ef, args[2], args[3], w1, b1, w2, b2, g1, be1, g2, be2,
            slope=0.01,
        )
        return jnp.sum(out * out)

    diff_args = [args[0], args[1]] + args[4:]
    gk = jax.grad(loss_kernel, argnums=tuple(range(10)))(*diff_args)
    gx = jax.grad(loss_xla, argnums=tuple(range(10)))(*diff_args)
    for i, (a, b) in enumerate(zip(gk, gx)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=f"grad {i}",
        )


def test_fast_path_matches_flax_model(rng):
    """fast_forward (Pallas kernel, interpret on CPU) must equal the flax
    model on the same params + graph."""
    import jax

    from graph_neural_network_for_radar_perception_tpu.config.config import (
        tiny_test_config,
    )
    from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
        SyntheticRadarDataset, pad_frame,
    )
    from graph_neural_network_for_radar_perception_tpu.models.fast_path import (
        fast_forward,
    )
    from graph_neural_network_for_radar_perception_tpu.models.gnn import RadarGNN
    from graph_neural_network_for_radar_perception_tpu.train.steps import (
        init_params,
    )

    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.key(3))
    ds = SyntheticRadarDataset(cfg, seed=2, num_objects=2)
    g, lbl = pad_frame(ds.sample_frame(), cfg)
    g = jax.tree.map(jnp.asarray, g)
    n2c = jnp.asarray(lbl.node2cluster)
    cm = jnp.asarray(lbl.cluster_mask)

    want = RadarGNN(cfg).apply(
        {"params": params}, g, n2c, cfg.max_clusters, cm
    )
    got = fast_forward(
        params, g, n2c, cfg.max_clusters, cm, cfg,
        edge_tile=128, interpret=True,
    )
    nm = np.asarray(g.node_mask)
    um = np.asarray(g.und_mask)
    cmsk = np.asarray(cm)
    np.testing.assert_allclose(
        np.asarray(got.node_cls)[nm], np.asarray(want.node_cls)[nm],
        rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(got.node_offsets)[nm], np.asarray(want.node_offsets)[nm],
        rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(got.edge_cls)[um], np.asarray(want.edge_cls)[um],
        rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(got.obj_cls)[cmsk], np.asarray(want.obj_cls)[cmsk],
        rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# CSR (destination-sorted) kernel — ops/pallas/csr_mp.py
# ---------------------------------------------------------------------------

def _symmetric_problem(rng, n=96, d=32, de=16, h=64, d2=32, k=6, pad=37):
    """Random symmetric kNN-like edge set in row-major (sender-sorted)
    order with sentinel padding — the layout the CSR kernel requires."""
    adj = np.zeros((n, n), bool)
    for i in range(n):
        nbrs = rng.choice([j for j in range(n) if j != i], size=k,
                          replace=False)
        adj[i, nbrs] = True
    adj |= adj.T
    s, r = np.nonzero(adj)
    e = s.shape[0]
    src = np.concatenate([r, np.full(pad, n)]).astype(np.int32)
    dst = np.concatenate([s, np.full(pad, n)]).astype(np.int32)
    x = rng.normal(size=(n, d)).astype(np.float32)
    ef = np.concatenate(
        [rng.normal(size=(e, de)), np.zeros((pad, de))]
    ).astype(np.float32)
    w1 = (rng.normal(size=(2 * d + de, h)) * 0.1).astype(np.float32)
    b1 = (rng.normal(size=(h,)) * 0.1).astype(np.float32)
    w2 = (rng.normal(size=(h, d2)) * 0.1).astype(np.float32)
    b2 = (rng.normal(size=(d2,)) * 0.1).astype(np.float32)
    sc = (np.float32(1.1), np.float32(0.05), np.float32(0.9),
          np.float32(-0.02))
    return [jnp.asarray(a) for a in (x, ef, src, dst, w1, b1, w2, b2, *sc)]


def test_csr_forward_matches_xla(rng):
    from graph_neural_network_for_radar_perception_tpu.ops.pallas import (
        csr_mp,
    )

    args = _symmetric_problem(rng)
    got = csr_mp.fused_message_pass_csr(*args, 0.01, 128, 64, True, False)
    want = fused_mp._xla_reference(*args, slope=0.01)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )


@pytest.mark.parametrize("pallas_bwd", [False, True])
def test_csr_gradients_match_xla(rng, pallas_bwd):
    from graph_neural_network_for_radar_perception_tpu.ops.pallas import (
        csr_mp,
    )

    args = _symmetric_problem(rng)

    def loss_kernel(x, ef, w1, b1, w2, b2, g1, be1, g2, be2):
        out = csr_mp.fused_message_pass_csr(
            x, ef, args[2], args[3], w1, b1, w2, b2, g1, be1, g2, be2,
            0.01, 128, 64, True, False, pallas_bwd,
        )
        return jnp.sum(out * out)

    def loss_xla(x, ef, w1, b1, w2, b2, g1, be1, g2, be2):
        out = fused_mp._xla_reference(
            x, ef, args[2], args[3], w1, b1, w2, b2, g1, be1, g2, be2,
            slope=0.01,
        )
        return jnp.sum(out * out)

    diff_args = [args[0], args[1]] + args[4:]
    gk = jax.grad(loss_kernel, argnums=tuple(range(10)))(*diff_args)
    gx = jax.grad(loss_xla, argnums=tuple(range(10)))(*diff_args)
    for i, (a, b) in enumerate(zip(gk, gx)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=f"grad {i}",
        )


def test_edge_reversal_contract():
    """flip(ef(s→r)) must equal ef(r→s) element-for-element on a real
    built graph — validates EDGE_FEATURE_REVERSAL_SIGNS against
    data/features compute_edge_features (reference
    graph_features.py:147-164), and that the row-major sender list is
    sorted (the CSR layout the kernel relies on)."""
    from graph_neural_network_for_radar_perception_tpu.config.config import (
        tiny_test_config,
    )
    from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
        SyntheticRadarDataset, pad_frame,
    )
    from graph_neural_network_for_radar_perception_tpu.ops.pallas.csr_mp import (
        reverse_edge_features, window_span_ok,
    )

    cfg = tiny_test_config()
    ds = SyntheticRadarDataset(cfg, seed=2, num_objects=2)
    g, _ = pad_frame(ds.sample_frame(), cfg)
    s, r = np.asarray(g.senders), np.asarray(g.receivers)
    m = np.asarray(g.edge_mask)
    ef = np.asarray(g.edge_feat)
    flip = np.asarray(reverse_edge_features(jnp.asarray(ef)))
    pos = {(int(a), int(b)): i for i, (a, b) in enumerate(zip(s[m], r[m]))}
    for i in np.flatnonzero(m):
        q = pos.get((int(r[i]), int(s[i])))
        assert q is not None, "edge set must be symmetric"
        np.testing.assert_allclose(ef[q], flip[i], atol=1e-6)
    sv = s[m]
    assert np.all(np.diff(sv.astype(np.int64)) >= 0), "senders not sorted"
    assert window_span_ok(np.where(m, s, cfg.max_nodes), m, 128, 64)


def test_fast_path_csr_matches_flax_model(rng):
    from graph_neural_network_for_radar_perception_tpu.config.config import (
        tiny_test_config,
    )
    from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
        SyntheticRadarDataset, pad_frame,
    )
    from graph_neural_network_for_radar_perception_tpu.models.fast_path import (
        fast_forward,
    )
    from graph_neural_network_for_radar_perception_tpu.models.gnn import RadarGNN
    from graph_neural_network_for_radar_perception_tpu.train.steps import (
        init_params,
    )

    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.key(3))
    ds = SyntheticRadarDataset(cfg, seed=2, num_objects=2)
    g, lbl = pad_frame(ds.sample_frame(), cfg)
    g = jax.tree.map(jnp.asarray, g)
    n2c = jnp.asarray(lbl.node2cluster)
    cm = jnp.asarray(lbl.cluster_mask)
    want = RadarGNN(cfg).apply(
        {"params": params}, g, n2c, cfg.max_clusters, cm
    )
    got = fast_forward(
        params, g, n2c, cfg.max_clusters, cm, cfg,
        edge_tile=128, window=64, interpret=True, mp_impl="csr",
    )
    for name in ("node_cls", "node_offsets", "edge_cls", "obj_cls"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), np.asarray(getattr(want, name)),
            rtol=2e-4, atol=2e-5, err_msg=name,
        )


def test_csr_contract_guard():
    """Contract violations are caught loudly, not returned as wrong sums
    (VERDICT r2: out-of-window edges were silently dropped)."""
    from graph_neural_network_for_radar_perception_tpu.ops.pallas.csr_mp import (
        csr_contract_ok, window_span_violations,
    )

    # A symmetric ring graph: sorted senders, closed under reversal.
    n = 64
    s = np.repeat(np.arange(n), 2)
    r = np.stack([(np.arange(n) - 1) % n, (np.arange(n) + 1) % n], 1).ravel()
    mask = np.ones_like(s, dtype=bool)
    ok, _ = csr_contract_ok(s, r, mask, edge_tile=32, window=48)
    assert ok

    # Drop one direction of a pair -> reversal closure fails.
    mask2 = mask.copy()
    mask2[-1] = False
    ok, reason = csr_contract_ok(s, r, mask2, edge_tile=32, window=48)
    assert not ok and "reversal" in reason

    # Destination jump wider than the window within one tile -> span fails
    # on the host check AND is counted by the traced guard.
    s3 = np.sort(np.concatenate([np.zeros(16, np.int64), np.full(16, 60)]))
    r3 = (s3 + 1) % n
    m3 = np.ones_like(s3, dtype=bool)
    ok, reason = csr_contract_ok(s3, r3, m3, edge_tile=32, window=16)
    assert not ok and "span" in reason
    viol = window_span_violations(
        jnp.asarray(s3, jnp.int32), n, edge_tile=32, window=16
    )
    assert int(viol) > 0


def test_pad_frame_validates_csr_contract():
    """cfg.mp_impl='csr' makes pad_frame raise on a contract-violating
    frame (here: edge-capacity truncation breaking reversal closure)."""
    import dataclasses as dc

    import pytest

    from graph_neural_network_for_radar_perception_tpu.config.config import (
        tiny_test_config,
    )
    from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
        SyntheticRadarDataset, pad_frame,
    )

    cfg = tiny_test_config(mp_impl="csr")
    ds = SyntheticRadarDataset(cfg, seed=0, num_objects=2)
    fr = ds.sample_frame()
    pad_frame(fr, cfg)  # intact frame passes

    # Drop the first directed edge: its reverse (stored later in the
    # row-major list) survives, so the set is no longer reversal-closed.
    bad = dc.replace(
        fr,
        senders=fr.senders[1:],
        receivers=fr.receivers[1:],
        edge_feat=fr.edge_feat[1:],
    )
    with pytest.raises(ValueError, match="CSR kernel contract"):
        pad_frame(bad, cfg)


def test_fast_path_csr_poisons_on_span_violation(rng):
    """In-jit guard: a graph violating the window-span bound yields NaN
    outputs (so the train step's NaN skip fires) instead of wrong sums."""
    from graph_neural_network_for_radar_perception_tpu.config.config import (
        tiny_test_config,
    )
    from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
        SyntheticRadarDataset, pad_frame,
    )
    from graph_neural_network_for_radar_perception_tpu.models.fast_path import (
        fast_forward,
    )
    from graph_neural_network_for_radar_perception_tpu.train.steps import (
        init_params,
    )

    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.key(3))
    ds = SyntheticRadarDataset(cfg, seed=2, num_objects=2)
    g, lbl = pad_frame(ds.sample_frame(), cfg)
    g = jax.tree.map(jnp.asarray, g)
    out = fast_forward(
        params, g, jnp.asarray(lbl.node2cluster), cfg.max_clusters,
        jnp.asarray(lbl.cluster_mask), cfg,
        edge_tile=16, window=8, interpret=True, mp_impl="csr",
    )
    # window=8 << span of 16-edge tiles on this graph -> must be poisoned.
    assert not np.isfinite(np.asarray(out.node_cls)).all()


# ---------------------------------------------------------------------------
# Source-windowed CSR kernel (csr_src_window > 0) — ops/pallas/csr_mp.py
# ---------------------------------------------------------------------------

def _banded_problem(rng, n=96, d=32, de=16, h=64, d2=32, k=6, pad=37):
    """Symmetric BANDED edge set (|i-j| <= k) in row-major order — the
    spatially-local index structure data/ordering.spatial_sort_frame
    produces, where every edge tile's sources span a narrow window."""
    adj = np.zeros((n, n), bool)
    for i in range(n):
        lo, hi = max(0, i - k), min(n, i + k + 1)
        adj[i, lo:hi] = True
        adj[i, i] = False
    s, r = np.nonzero(adj)
    e = s.shape[0]
    src = np.concatenate([r, np.full(pad, n)]).astype(np.int32)
    dst = np.concatenate([s, np.full(pad, n)]).astype(np.int32)
    x = rng.normal(size=(n, d)).astype(np.float32)
    ef = np.concatenate(
        [rng.normal(size=(e, de)), np.zeros((pad, de))]
    ).astype(np.float32)
    w1 = (rng.normal(size=(2 * d + de, h)) * 0.1).astype(np.float32)
    b1 = (rng.normal(size=(h,)) * 0.1).astype(np.float32)
    w2 = (rng.normal(size=(h, d2)) * 0.1).astype(np.float32)
    b2 = (rng.normal(size=(d2,)) * 0.1).astype(np.float32)
    sc = (np.float32(1.1), np.float32(0.05), np.float32(0.9),
          np.float32(-0.02))
    return [jnp.asarray(a) for a in (x, ef, src, dst, w1, b1, w2, b2, *sc)]


def test_csr_src_windowed_forward_matches_xla(rng):
    from graph_neural_network_for_radar_perception_tpu.ops.pallas import (
        csr_mp,
    )

    args = _banded_problem(rng)
    # src_window=64 on a banded graph (span per 128-edge tile << 56).
    got = csr_mp.fused_message_pass_csr(
        *args, 0.01, 128, 64, True, False, True, 64
    )
    want = fused_mp._xla_reference(*args, slope=0.01)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )


@pytest.mark.parametrize("pallas_bwd", [False, True])
def test_csr_src_windowed_gradients_match_xla(rng, pallas_bwd):
    from graph_neural_network_for_radar_perception_tpu.ops.pallas import (
        csr_mp,
    )

    args = _banded_problem(rng)

    def loss_kernel(x, ef, w1, b1, w2, b2, g1, be1, g2, be2):
        out = csr_mp.fused_message_pass_csr(
            x, ef, args[2], args[3], w1, b1, w2, b2, g1, be1, g2, be2,
            0.01, 128, 64, True, False, pallas_bwd, 64,
        )
        return jnp.sum(out * out)

    def loss_xla(x, ef, w1, b1, w2, b2, g1, be1, g2, be2):
        out = fused_mp._xla_reference(
            x, ef, args[2], args[3], w1, b1, w2, b2, g1, be1, g2, be2,
            slope=0.01,
        )
        return jnp.sum(out * out)

    diff_args = [args[0], args[1]] + args[4:]
    gk = jax.grad(loss_kernel, argnums=tuple(range(10)))(*diff_args)
    gx = jax.grad(loss_xla, argnums=tuple(range(10)))(*diff_args)
    for i, (a, b) in enumerate(zip(gk, gx)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=f"grad {i}",
        )


def test_src_window_contract_guards(rng):
    """Random (non-local) indices violate the source-window contract:
    the host check refuses, the traced counter is nonzero, and the
    fast path poisons — never wrong sums."""
    from graph_neural_network_for_radar_perception_tpu.ops.pallas.csr_mp import (
        csr_contract_ok, src_window_violations,
    )

    n = 96
    args = _symmetric_problem(rng, n=n)
    src, dst = np.asarray(args[2]), np.asarray(args[3])
    mask = dst < n
    # Random kNN indices: some 128-edge tile spans ~n sources >> 32-8.
    ok, reason = csr_contract_ok(
        np.where(mask, dst, n), np.where(mask, src, n), mask,
        edge_tile=128, window=64, src_window=32,
    )
    assert not ok and "source window" in reason
    viol = src_window_violations(
        jnp.asarray(src, jnp.int32), n, edge_tile=128, src_window=32
    )
    assert int(viol) > 0
    # The banded problem passes the same check.
    bargs = _banded_problem(rng, n=n)
    bsrc, bdst = np.asarray(bargs[2]), np.asarray(bargs[3])
    bmask = bdst < n
    ok, _ = csr_contract_ok(
        np.where(bmask, bdst, n), np.where(bmask, bsrc, n), bmask,
        edge_tile=128, window=64, src_window=64,
    )
    assert ok
    assert int(src_window_violations(
        jnp.asarray(bsrc, jnp.int32), n, edge_tile=128, src_window=64
    )) == 0


def test_fast_path_csr_src_windowed_spatial_sort(rng):
    """End-to-end: cfg(spatial_sort=True, csr_src_window) builds frames
    whose sorted node ids satisfy the source-window contract, and the
    src-windowed fast path matches the flax model on them."""
    import dataclasses as dc

    from graph_neural_network_for_radar_perception_tpu.config.config import (
        tiny_test_config,
    )
    from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
        SyntheticRadarDataset, pad_frame,
    )
    from graph_neural_network_for_radar_perception_tpu.models.fast_path import (
        fast_forward,
    )
    from graph_neural_network_for_radar_perception_tpu.models.gnn import RadarGNN
    from graph_neural_network_for_radar_perception_tpu.train.steps import (
        init_params,
    )

    cfg = tiny_test_config(
        mp_impl="csr", spatial_sort=True, csr_edge_tile=128, csr_window=64,
        max_nodes=128, max_clusters=64,
    )
    # 96 < max_nodes=128: the source gather is REALLY windowed (a value
    # >= the node capacity would clip to the unwindowed path).
    cfg = dc.replace(cfg, csr_src_window=96)
    params = init_params(cfg, jax.random.key(3))
    ds = SyntheticRadarDataset(cfg, seed=2, num_objects=2)
    g, lbl = pad_frame(ds.sample_frame(), cfg)  # validates the contract
    g = jax.tree.map(jnp.asarray, g)
    n2c = jnp.asarray(lbl.node2cluster)
    cm = jnp.asarray(lbl.cluster_mask)
    want = RadarGNN(cfg).apply(
        {"params": params}, g, n2c, cfg.max_clusters, cm
    )
    got = fast_forward(
        params, g, n2c, cfg.max_clusters, cm, cfg,
        interpret=True, mp_impl="csr",
    )
    for name in ("node_cls", "node_offsets", "edge_cls", "obj_cls"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), np.asarray(getattr(want, name)),
            rtol=2e-4, atol=2e-5, err_msg=name,
        )
