"""Iteration-based training loop.

TPU-native re-design of modules/neural_net/gnn/training.py:48-186:
iteration counter (not epochs), periodic validation sweep + checkpoint +
paired train/val scalars, NaN skipping (compiled into the step), exact
resume (params + optimiser + step via Orbax).  The host stays ahead of the
device by building the next padded batch while the current step runs
(dispatch is async; metrics are only pulled at log boundaries).
"""

from __future__ import annotations

import dataclasses
import itertools
import time
from typing import Callable, Iterable, Iterator, Optional

import jax
import numpy as np

from ..config.config import GNNConfig
from ..core.graph import GraphBatch
from ..utils.checkpoint import CheckpointManager
from ..utils.metrics_writer import MetricsWriter, RunningMeans
from .steps import TrainState, create_train_state, make_eval_step, make_train_step


@dataclasses.dataclass
class TrainHooks:
    log_period: int = 100
    val_period: int = 1000
    num_val_batches: int = 8
    checkpoint: Optional[CheckpointManager] = None
    writer: Optional[MetricsWriter] = None
    print_fn: Callable[[str], None] = print


def train(
    cfg: GNNConfig,
    train_batches: Iterator[GraphBatch],
    val_batches: Optional[Callable[[], Iterator[GraphBatch]]] = None,
    *,
    hooks: Optional[TrainHooks] = None,
    state: Optional[TrainState] = None,
    train_step=None,
    max_iters: Optional[int] = None,
    starting_iter: int = 0,
) -> TrainState:
    """Run the training loop; returns the final TrainState.

    `train_step` defaults to the single-device jitted step; pass a sharded
    step from parallel/ for multi-device runs (batches must then be placed
    by the caller or the step's own `place_batch`).
    """
    hooks = hooks or TrainHooks()
    if state is None:
        state = create_train_state(cfg, jax.random.key(cfg.seed))
    if train_step is None:
        train_step = make_train_step(cfg, donate=True)
    eval_step = make_eval_step(cfg)
    max_iters = max_iters if max_iters is not None else cfg.max_train_iter

    tracker = RunningMeans()
    t_start = time.perf_counter()
    last_metrics = None

    place = getattr(train_step, "place_batch", lambda b: b)

    for it in range(starting_iter, max_iters):
        batch = place(next(train_batches))
        state, metrics = train_step(state, batch)
        last_metrics = metrics

        if (it + 1) % hooks.log_period == 0:
            host_metrics = {k: float(v) for k, v in metrics.items()}
            tracker.update(host_metrics)
            means = tracker.means()
            elapsed = time.perf_counter() - t_start
            ips = hooks.log_period / max(elapsed, 1e-9)
            hooks.print_fn(
                f"iter {it + 1}: loss {host_metrics['loss_total']:.4f} "
                f"(node {host_metrics['loss_node_cls']:.3f} "
                f"edge {host_metrics['loss_edge_cls']:.3f} "
                f"reg {host_metrics['loss_node_reg']:.3f} "
                f"obj {host_metrics['loss_obj_cls']:.3f}) "
                f"{ips:.1f} it/s"
            )
            t_start = time.perf_counter()

        if (it + 1) % hooks.val_period == 0:
            val_means = None
            if val_batches is not None:
                vm = RunningMeans()
                for vb in itertools.islice(
                    val_batches(), hooks.num_val_batches
                ):
                    m = eval_step(state.params, place(vb))
                    vm.update({k: float(v) for k, v in m.items()})
                val_means = vm.means()
            if hooks.writer is not None:
                hooks.writer.write_train_val(
                    it + 1, tracker.means(), val_means
                )
            tracker.reset()
            if hooks.checkpoint is not None:
                hooks.checkpoint.save(it + 1, jax.device_get(state))

    # Always leave a final checkpoint so short runs (< val_period) and
    # resumes are never silently lost.
    if hooks.checkpoint is not None and max_iters > starting_iter:
        hooks.checkpoint.save(max_iters, jax.device_get(state), wait=True)

    return state


def train_chunked(
    cfg: GNNConfig,
    train_batches: Iterator[GraphBatch],
    *,
    chunk: int = 32,
    hooks: Optional[TrainHooks] = None,
    state: Optional[TrainState] = None,
    max_iters: Optional[int] = None,
    starting_iter: int = 0,
) -> TrainState:
    """Training loop dispatching `chunk` steps per compiled program.

    Stacks `chunk` host batches along a new leading axis and runs them
    through one `make_train_scan` program (train/steps.py) — numerically
    identical to `chunk` sequential steps, but one dispatch+readback per
    chunk.  On the tunnelled TPU runtime dispatch overhead is tens of ms
    per call once any metric has been read back (docs/PERF.md round 5),
    so chunking is the difference between dispatch-bound and
    compute-bound training there; on directly-attached devices it is a
    modest but free win.  Logging granularity becomes `chunk` steps
    (metrics of the chunk's last step are reported)."""
    import jax.numpy as jnp

    from .steps import make_train_scan

    hooks = hooks or TrainHooks()
    if state is None:
        state = create_train_state(cfg, jax.random.key(cfg.seed))
    max_iters = max_iters if max_iters is not None else cfg.max_train_iter
    run = make_train_scan(cfg, chunk)
    tracker = RunningMeans()
    t_start = time.perf_counter()
    it = starting_iter
    while it < max_iters:
        n = min(chunk, max_iters - it)
        host = [next(train_batches) for _ in range(n)]
        # A shorter tail needs its own exact-length program (scan length
        # is static); it compiles once and only on the final chunk.
        if n < chunk:
            run_tail = make_train_scan(cfg, n)
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *host[:n])
            state, metrics = run_tail(state, stacked)
        else:
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *host)
            state, metrics = run(state, stacked)
        it += n
        host_metrics = {k: float(v) for k, v in metrics.items()}
        tracker.update(host_metrics)
        if hooks.writer is not None:
            hooks.writer.write_train_val(it, tracker.means(), None)
        elapsed = time.perf_counter() - t_start
        hooks.print_fn(
            f"iter {it}: loss {host_metrics['loss_total']:.4f} "
            f"{n / max(elapsed, 1e-9):.1f} it/s (chunk={n})"
        )
        t_start = time.perf_counter()
    if hooks.checkpoint is not None and max_iters > starting_iter:
        hooks.checkpoint.save(max_iters, jax.device_get(state), wait=True)
    return state


def train_bucketed(
    cfg: GNNConfig,
    frames,
    *,
    buckets=None,
    donate: bool = True,
    val_batches=None,
    **train_kwargs,
) -> TrainState:
    """The production loop over BUCKETED static-shape batches.

    Frames are routed to the smallest capacity bucket that fits
    (data/bucketing.py), so padded work tracks the real frame-size
    distribution instead of the global maximum; one jitted executable per
    bucket shares the single TrainState.  `frames` is an iterator of
    FrameArrays (e.g. RadarScenesFrames.frames() or
    SyntheticRadarDataset.sample_frame in a loop); remaining kwargs
    forward to :func:`train`.
    """
    import jax.numpy as jnp

    from ..data.bucketing import (
        bucketed_batches, default_buckets, make_bucketed_train_step,
    )

    buckets = list(buckets or default_buckets(cfg))
    bstep = make_bucketed_train_step(cfg, buckets, donate=donate)

    def step(state, item):
        bucket, batch = item
        return bstep(state, bucket, batch)

    def to_device(item):
        bucket, batch = item
        return bucket, jax.tree.map(jnp.asarray, batch)

    stream = map(to_device, bucketed_batches(frames, cfg, buckets))
    return train(
        cfg, stream, val_batches, train_step=step, **train_kwargs
    )
