"""ctypes bindings for the native (C++) host data-plane library.

Loads native/libradar_native.so (building it with make on first use if
the toolchain is available) and exposes drop-in replacements for the
numpy graph builder, SE(2) ego compensation and stationary gating.  Falls
back transparently to the numpy implementations when the library can't be
built, so the framework stays pure-Python-capable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libradar_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None

        c_int = ctypes.c_int
        c_float_p = np.ctypeslib.ndpointer(np.float32, flags="C")
        c_double_p = np.ctypeslib.ndpointer(np.float64, flags="C")
        c_int_p = np.ctypeslib.ndpointer(np.int32, flags="C")
        c_u8_p = np.ctypeslib.ndpointer(np.uint8, flags="C")

        lib.radar_build_graph.restype = c_int
        lib.radar_build_graph.argtypes = [
            c_float_p, c_float_p, c_float_p, c_float_p, c_double_p,
            c_int, c_int, ctypes.c_float, c_int, c_int,
            c_int_p, c_int_p, c_int_p, c_int_p,
            ctypes.POINTER(c_int), c_float_p, c_float_p,
        ]
        lib.radar_ego_compensate.restype = None
        lib.radar_ego_compensate.argtypes = [
            c_float_p, c_float_p, c_int_p, c_int,
            c_double_p, c_double_p, c_double_p,
        ]
        lib.radar_gate_stationary.restype = None
        lib.radar_gate_stationary.argtypes = [
            c_float_p, c_float_p, c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            c_u8_p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_graph_native(
    px, py, vx, vy, ts, *, k: int, eps_sq: float,
    e_cap: Optional[int] = None, eu_cap: Optional[int] = None,
):
    """Native twin of features.adjacency_info + edge_features_np.

    Returns dict(senders, receivers, und_senders, und_receivers, degree,
    edge_feat) with exact reference ordering, or None if the native
    library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = int(px.shape[0])
    if e_cap is None:
        e_cap = max(2 * (k + 1) * n, 64)
    if eu_cap is None:
        eu_cap = e_cap
    px = np.ascontiguousarray(px, np.float32)
    py = np.ascontiguousarray(py, np.float32)
    vx = np.ascontiguousarray(vx, np.float32)
    vy = np.ascontiguousarray(vy, np.float32)
    ts = np.ascontiguousarray(ts, np.float64)
    senders = np.empty(e_cap, np.int32)
    receivers = np.empty(e_cap, np.int32)
    und_s = np.empty(eu_cap, np.int32)
    und_r = np.empty(eu_cap, np.int32)
    degree = np.empty(n, np.float32)
    edge_feat = np.empty((e_cap, 7), np.float32)
    n_und = ctypes.c_int(0)
    n_edges = lib.radar_build_graph(
        px, py, vx, vy, ts, n, k, np.float32(eps_sq), e_cap, eu_cap,
        senders, receivers, und_s, und_r,
        ctypes.byref(n_und), degree, edge_feat.reshape(-1),
    )
    if n_edges < 0:
        raise ValueError("edge capacity overflow in native graph builder")
    return {
        "senders": senders[:n_edges],
        "receivers": receivers[:n_edges],
        "und_senders": und_s[: n_und.value],
        "und_receivers": und_r[: n_und.value],
        "degree": degree,
        "edge_feat": edge_feat[:n_edges],
    }


def ego_compensate_native(px_list, py_list, ego_x, ego_y, ego_yaw):
    """Native twin of se2.ego_compensate_window (positions only; velocities
    pass through, reference meas_sync.py:67-68)."""
    lib = _load()
    if lib is None:
        return None
    lengths = [int(p.shape[0]) for p in px_list]
    offsets = np.zeros(len(lengths) + 1, np.int32)
    offsets[1:] = np.cumsum(lengths)
    px = np.ascontiguousarray(np.concatenate(px_list), np.float32)
    py = np.ascontiguousarray(np.concatenate(py_list), np.float32)
    lib.radar_ego_compensate(
        px, py, offsets, len(lengths),
        np.ascontiguousarray(ego_x, np.float64),
        np.ascontiguousarray(ego_y, np.float64),
        np.ascontiguousarray(ego_yaw, np.float64),
    )
    out_px = [px[offsets[i]:offsets[i + 1]] for i in range(len(lengths))]
    out_py = [py[offsets[i]:offsets[i + 1]] for i in range(len(lengths))]
    return out_px, out_py


def gate_stationary_native(azimuth, vr, tx, ty, theta, vx_odom, yawrate_odom,
                           gamma: float = 1.5):
    """Native twin of selection.identify_stationary_measurements (no
    RANSAC)."""
    lib = _load()
    if lib is None:
        return None
    azimuth = np.ascontiguousarray(azimuth, np.float32)
    vr = np.ascontiguousarray(vr, np.float32)
    flag = np.empty(azimuth.shape[0], np.uint8)
    lib.radar_gate_stationary(
        azimuth, vr, azimuth.shape[0],
        float(tx), float(ty), float(theta),
        float(vx_odom), float(yawrate_odom), float(gamma), flag,
    )
    return flag.astype(bool)
