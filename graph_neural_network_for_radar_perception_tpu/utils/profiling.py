"""Profiling and tracing utilities.

The reference has no profiling at all (SURVEY.md §5: console prints +
tqdm).  Here: jax.profiler trace capture around training windows, a
per-step wall-clock timer with percentile summaries, and a simple
edges/s throughput meter used by bench.py and the trainer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, *, host_tracer_level: int = 2):
    """Capture a jax.profiler trace (viewable with TensorBoard or
    Perfetto) around a code block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with percentile summaries.

    Use `with timer.step():` around each iteration; the device sync is the
    caller's responsibility (time dispatch only, or block first)."""

    def __init__(self, max_records: int = 10_000):
        self._times: List[float] = []
        self._max = max_records

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        if len(self._times) < self._max:
            self._times.append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        arr = np.asarray(self._times)
        return {
            "steps": int(arr.size),
            "mean_ms": float(arr.mean() * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p90_ms": float(np.percentile(arr, 90) * 1e3),
            "p99_ms": float(np.percentile(arr, 99) * 1e3),
        }

    def reset(self):
        self._times.clear()


class ThroughputMeter:
    """Edges/s (or any unit/s) over a sliding window."""

    def __init__(self, units_per_step: float):
        self.units_per_step = units_per_step
        self._t0: Optional[float] = None
        self._steps = 0

    def start(self):
        self._t0 = time.perf_counter()
        self._steps = 0

    def tick(self, n: int = 1):
        self._steps += n

    def rate(self) -> float:
        if self._t0 is None or self._steps == 0:
            return 0.0
        dt = time.perf_counter() - self._t0
        return self._steps * self.units_per_step / max(dt, 1e-9)


def flops_per_train_step(cfg, batch_size: int) -> float:
    """Analytic FLOP estimate of one fwd+bwd train step of the flagship
    GNN (message MLPs dominate), for MFU-style reporting."""
    e = cfg.max_edges
    n = cfg.max_nodes
    d = cfg.graph_convolution_stem_channels[-1]
    h = cfg.msg_mlp_hidden_dim
    rounds = len(cfg.graph_convolution_stem_channels)
    msg = e * (3 * d * h + h * d) * 2           # msg MLP fwd MACs→FLOPs
    upd = n * (2 * d * d) * 2
    enc = n * sum(
        a * b * 2 for a, b in zip(
            (cfg.input_node_feat_dim,) + tuple(cfg.node_feat_enc_stem_channels[:-1]),
            cfg.node_feat_enc_stem_channels,
        )
    ) + e * sum(
        a * b * 2 for a, b in zip(
            (cfg.input_edge_feat_dim,) + tuple(cfg.edge_feat_enc_stem_channels[:-1]),
            cfg.edge_feat_enc_stem_channels,
        )
    )
    fwd = rounds * (msg + upd) + enc
    return 3.0 * fwd * batch_size  # bwd ≈ 2× fwd


# Dense peak matmul throughput per chip, bf16 (the MXU's native input
# format; f32-stored activations still run the MXU in bf16 passes under
# JAX's default matmul precision).  Public numbers from the TPU product
# pages/ISCA papers.
_PEAK_BF16_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v5": 459e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
    "TPU v6e": 918e12,
}


def device_peak_flops(device=None) -> Optional[float]:
    """Peak bf16 FLOP/s of the attached chip, or None when unknown (CPU,
    interpret mode).  MFU = measured FLOP/s / this."""
    import jax

    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "")
    for key, peak in _PEAK_BF16_FLOPS.items():
        if kind.startswith(key):
            return peak
    return None


def mfu(analytic_flops: float, seconds: float, device=None) -> Optional[float]:
    """Model FLOPs utilisation: analytic model FLOPs per wall-second over
    the chip's bf16 peak.  None when the peak is unknown."""
    peak = device_peak_flops(device)
    if peak is None or seconds <= 0:
        return None
    return analytic_flops / seconds / peak
