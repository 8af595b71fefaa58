"""Native C++ data-plane library vs the numpy golden implementations."""

import time

import numpy as np
import pytest

from graph_neural_network_for_radar_perception_tpu.data import features as F
from graph_neural_network_for_radar_perception_tpu.data import native as NAT
from graph_neural_network_for_radar_perception_tpu.data import se2
from graph_neural_network_for_radar_perception_tpu.data import selection as sel

pytestmark = pytest.mark.skipif(
    not NAT.available(), reason="native library not built (no toolchain?)"
)


def make_meas(rng, n):
    return {
        "px": rng.uniform(0, 80, n).astype(np.float32),
        "py": rng.uniform(-40, 40, n).astype(np.float32),
        "vx": rng.normal(size=n).astype(np.float32),
        "vy": rng.normal(size=n).astype(np.float32),
        "ts": rng.uniform(0, 6e5, n).astype(np.float64),
    }


@pytest.mark.parametrize("n", [7, 60, 300])
def test_graph_builder_matches_numpy(rng, n):
    m = make_meas(rng, n)
    k, eps_sq = 10, 25.0
    ref = F.adjacency_info(m["px"], m["py"], eps_sq, k)
    data = {
        "meas_px": m["px"], "meas_py": m["py"],
        "meas_vx": m["vx"], "meas_vy": m["vy"],
        "meas_timestamp": m["ts"],
    }
    ref_ef = F.edge_features_np(data, ref["adj_list"])
    rows, cols = np.nonzero(np.triu(ref["adj_matrix"], k=1))

    out = NAT.build_graph_native(
        m["px"], m["py"], m["vx"], m["vy"], m["ts"], k=k, eps_sq=eps_sq
    )
    np.testing.assert_array_equal(out["senders"], ref["adj_list"][0])
    np.testing.assert_array_equal(out["receivers"], ref["adj_list"][1])
    np.testing.assert_array_equal(out["und_senders"], rows)
    np.testing.assert_array_equal(out["und_receivers"], cols)
    np.testing.assert_array_equal(out["degree"], ref["degree"])
    np.testing.assert_allclose(out["edge_feat"], ref_ef, rtol=1e-5, atol=1e-6)


def test_ego_compensation_matches_numpy(rng):
    px = [rng.uniform(0, 50, 20).astype(np.float32) for _ in range(4)]
    py = [rng.uniform(-20, 20, 20).astype(np.float32) for _ in range(4)]
    vx = [rng.normal(size=20) for _ in range(4)]
    vy = [rng.normal(size=20) for _ in range(4)]
    ex = rng.uniform(0, 10, 4)
    ey = rng.uniform(0, 10, 4)
    eyaw = rng.uniform(-1, 1, 4)
    ref_px, ref_py, _, _ = se2.ego_compensate_window(
        px, py, vx, vy, ex, ey, eyaw
    )
    nat = NAT.ego_compensate_native(px, py, ex, ey, eyaw)
    assert nat is not None
    for a, b in zip(nat[0], ref_px):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)
    for a, b in zip(nat[1], ref_py):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)


def test_gating_matches_numpy(rng):
    n = 100
    az = rng.uniform(-1.5, 1.5, n).astype(np.float32)
    vr = rng.normal(-5, 3, n).astype(np.float32)
    ref = sel.identify_stationary_measurements(
        az.astype(np.float64), vr.astype(np.float64),
        tx=3.0, ty=0.3, theta=0.2, vx_odom=9.0, yawrate_odom=0.05,
    )
    nat = NAT.gate_stationary_native(az, vr, 3.0, 0.3, 0.2, 9.0, 0.05)
    # float32 vs float64 rounding can flip points exactly at the gate
    assert (nat != ref).mean() < 0.02


def test_native_faster_than_numpy(rng):
    n, k = 800, 10
    m = make_meas(rng, n)
    data = {
        "meas_px": m["px"], "meas_py": m["py"],
        "meas_vx": m["vx"], "meas_vy": m["vy"],
        "meas_timestamp": m["ts"],
    }

    t0 = time.perf_counter()
    for _ in range(3):
        ref = F.adjacency_info(m["px"], m["py"], 25.0, k)
        F.edge_features_np(data, ref["adj_list"])
        np.nonzero(np.triu(ref["adj_matrix"], k=1))
    t_np = (time.perf_counter() - t0) / 3

    t0 = time.perf_counter()
    for _ in range(3):
        NAT.build_graph_native(
            m["px"], m["py"], m["vx"], m["vy"], m["ts"], k=k, eps_sq=25.0
        )
    t_nat = (time.perf_counter() - t0) / 3
    print(f"\nnumpy {t_np * 1e3:.2f} ms vs native {t_nat * 1e3:.2f} ms "
          f"({t_np / t_nat:.1f}x)")
    assert t_nat < t_np


def test_preprocess_frame_native_equals_numpy(rng):
    """preprocess_frame must produce identical FrameArrays via native and
    numpy paths."""
    import dataclasses

    from graph_neural_network_for_radar_perception_tpu.config.config import (
        tiny_test_config,
    )
    from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
        preprocess_frame,
    )
    from graph_neural_network_for_radar_perception_tpu.data.synthetic import (
        make_synthetic_frame,
    )

    cfg = tiny_test_config()
    data = make_synthetic_frame(
        np.random.default_rng(5), num_objects=2, window_size=3
    )
    a = preprocess_frame(data, cfg, use_native=True)
    b = preprocess_frame(data, cfg, use_native=False)
    assert a is not None and b is not None
    for f in dataclasses.fields(a):
        va, vb = getattr(a, f.name), getattr(b, f.name)
        np.testing.assert_allclose(
            va, vb, rtol=1e-5, atol=1e-6, err_msg=f.name
        )
