"""Multiprocess batch loader.

The threaded loader (data/prefetch.py) is GIL-bound: only the native C++
graph builder releases the GIL, so numpy label/padding work serialises
and caps training around ~17 it/s on one host.  This loader runs the full
preprocess→pad→stack pipeline in worker PROCESSES feeding a queue —
the TPU-native replacement for torch DataLoader(num_workers=N), which the
reference leaves at 0 (set_param_for_training_gnn.py:97-98).

Workers never initialise a device backend (pipeline code is numpy +
native C++), so fork startup is cheap and safe.

Measured note: for cheap synthetic frames the parent-side queue
deserialisation caps throughput (~50 batches/s, ≈ the single-thread
rate), so this pays off mainly for the real RadarScenes pipeline (HDF5
reads + RANSAC are far heavier per frame) and multi-host feeding.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import queue as queue_mod
from typing import Iterator, Optional

from ..config.config import GNNConfig
from ..core.graph import GraphBatch


def _worker_loop(cfg, batch_size, seed, source, data_root, q, stop):
    # Keep any accidental jax usage on CPU inside workers.
    os.environ["JAX_PLATFORMS"] = "cpu"
    if source == "synthetic":
        from .pipeline import SyntheticRadarDataset

        ds = SyntheticRadarDataset(cfg, seed=seed)
        gen = ds.batches(batch_size)
    elif source == "radarscenes":
        from .radarscenes import (
            RadarScenesDataset, SequenceCache, build_metadata,
            train_val_test_split,
        )

        train_seqs, _, _ = train_val_test_split(data_root, cfg.dataset_dir)
        cache = SequenceCache(data_root, cfg.dataset_dir)
        md = build_metadata(cache, train_seqs, cfg.temporal_window_size)
        ds = RadarScenesDataset(
            cfg, data_root, md, augment=cfg.dataset_augmentation, seed=seed
        )
        gen = ds.batches(batch_size)
    else:
        raise ValueError(source)

    while not stop.is_set():
        batch = next(gen)
        try:
            q.put(batch, timeout=1.0)
        except queue_mod.Full:
            continue


class MultiprocessBatches:
    """Iterator of GraphBatch built by worker processes."""

    def __init__(
        self,
        cfg: GNNConfig,
        batch_size: int,
        *,
        num_workers: int = 4,
        queue_size: int = 8,
        seed: int = 0,
        source: str = "synthetic",
        data_root: Optional[str] = None,
    ):
        ctx = mp.get_context("fork")
        self._q = ctx.Queue(maxsize=queue_size)
        self._stop = ctx.Event()
        self._procs = [
            ctx.Process(
                target=_worker_loop,
                args=(cfg, batch_size, seed + 1000 * i, source, data_root,
                      self._q, self._stop),
                daemon=True,
            )
            for i in range(num_workers)
        ]
        for p in self._procs:
            p.start()

    def __iter__(self) -> Iterator[GraphBatch]:
        return self

    def __next__(self) -> GraphBatch:
        return self._q.get()

    def close(self):
        self._stop.set()
        for p in self._procs:
            p.join(timeout=2.0)
            if p.is_alive():
                p.terminate()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
