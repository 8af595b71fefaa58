"""Scaling measurement harness: edges/s vs mesh size.

BASELINE.md targets ≥80 % edges/s scaling efficiency on a 2-host slice.
This harness measures the data-parallel and edge-partitioned train steps
across mesh shapes.  On real multi-chip hardware the numbers reflect ICI
collectives; on the virtual CPU mesh (tests) they validate orchestration
only — the harness records which backend produced them.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config.config import GNNConfig
from ..core.graph import GraphBatch
from ..train.steps import create_train_state
from .mesh import make_mesh
from .sharded import make_dp_train_step, make_edge_sharded_train_step


def _time_step(step, state, batch, iters: int = 10) -> float:
    state, m = step(state, batch)
    jax.block_until_ready(m["loss_total"])
    t0 = time.perf_counter()
    s = state
    for _ in range(iters):
        s, m = step(s, batch)
    jax.block_until_ready(m["loss_total"])
    return (time.perf_counter() - t0) / iters


def measure_scaling(
    cfg: GNNConfig,
    mesh_shapes: Sequence[Tuple[int, int]],
    *,
    batch_per_device: int = 2,
    make_batch=None,
    iters: int = 10,
    graph_partition: str = "psum",  # "psum" | "halo"
) -> List[Dict]:
    """Weak-scaling sweep: batch grows with the data axis so per-device
    work is constant; efficiency = throughput_n / (n · throughput_1).

    mesh_shapes: (n_data, n_graph) pairs; (1, 1) is measured as the
    single-device baseline automatically.  graph_partition picks the
    edge-partitioning design for n_graph > 1: the psum-per-round shard
    (parallel/sharded.py) or owner-computes halo exchange
    (parallel/halo.py, frames spatially sorted on the host)."""
    if make_batch is None:
        from ..data.pipeline import SyntheticRadarDataset, pad_frame, stack_batch

        def make_batch(batch_size: int) -> GraphBatch:
            ds = SyntheticRadarDataset(cfg, seed=0, num_objects=4)
            if graph_partition == "halo":
                from .halo import spatial_sort_frame

                items = [
                    pad_frame(spatial_sort_frame(ds.sample_frame()), cfg)
                    for _ in range(batch_size)
                ]
                return stack_batch(items)
            return jax.tree.map(jnp.asarray, next(ds.batches(batch_size)))

    state = create_train_state(cfg, jax.random.key(0))
    rounds = len(cfg.graph_convolution_stem_channels)

    results = []
    base_eps: Optional[float] = None
    for n_data, n_graph in mesh_shapes:
        n_dev = n_data * n_graph
        if n_dev > len(jax.devices()):
            continue
        mesh = make_mesh(n_data=n_data, n_graph=n_graph)
        batch = make_batch(batch_per_device * n_data)
        if n_graph > 1 and graph_partition == "halo":
            import numpy as np

            from .halo import make_halo_batch, make_halo_train_step, required_halo

            need = max(
                required_halo(
                    jax.tree.map(lambda x: np.asarray(x)[b], batch.graph),
                    n_graph,
                )
                for b in range(batch_per_device * n_data)
            )
            halo = max(-(-need // 8) * 8, 8)
            hstep = make_halo_train_step(cfg, mesh, halo)
            shards = make_halo_batch(batch, cfg, n_graph, halo)
            b_dev, s_dev = hstep.place(
                jax.tree.map(jnp.asarray, batch), shards
            )

            def step(state, _batch, _h=hstep, _b=b_dev, _s=s_dev):
                return _h(state, _b, _s)

            batch = b_dev
        elif n_graph > 1:
            step = make_edge_sharded_train_step(cfg, mesh)
            batch = step.place_batch(batch)
        else:
            step = make_dp_train_step(cfg, mesh)
        dt = _time_step(step, state, batch, iters)
        eps = batch_per_device * n_data * cfg.max_edges * rounds / dt
        if base_eps is None:
            base_eps = eps / n_dev  # per-device baseline
        results.append({
            "mesh": (n_data, n_graph),
            "devices": n_dev,
            "ms_per_step": dt * 1e3,
            "edge_msgs_per_s": eps,
            "efficiency": eps / (base_eps * n_dev),
            "backend": jax.devices()[0].platform,
        })
    return results


def measure_process_scaling(
    process_counts: Sequence[int] = (1, 2),
    *,
    devices_per_process: int = 4,
    batch_per_device: int = 1,
    bench_iters: int = 5,
    n_graph: int = 1,
    timeout: float = 600.0,
) -> List[Dict]:
    """Weak-scaling sweep over PROCESS counts (multi-host stand-in).

    Spawns real separate python processes per count (CPU backend,
    `devices_per_process` virtual devices each) wired with
    jax.distributed.initialize, and measures ms/step of the identical
    pjit program.  On a pod each process maps to one host and the 'data'
    axis crosses DCN — this harness exercises exactly that layout.
    Efficiency = throughput_n / (n · throughput_1).
    """
    import json
    import os
    import socket
    import subprocess
    import sys
    import tempfile

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)
    )))

    def free_port() -> int:
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            return s.getsockname()[1]

    results: List[Dict] = []
    base: Optional[float] = None
    for n_proc in process_counts:
        global_batch = batch_per_device * devices_per_process * n_proc
        with tempfile.TemporaryDirectory() as td:
            out = os.path.join(td, "r.json")
            port = free_port()
            env = dict(os.environ)
            env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
            procs = []
            for pid in range(n_proc):
                cmd = [
                    sys.executable, "-m",
                    "graph_neural_network_for_radar_perception_tpu"
                    ".parallel.worker",
                    "--platform", "cpu",
                    "--local-devices", str(devices_per_process),
                    "--steps", "1", "--bench-iters", str(bench_iters),
                    "--global-batch", str(global_batch),
                    "--n-graph", str(n_graph), "--out", out,
                ]
                if n_proc > 1:
                    cmd += [
                        "--coordinator", f"127.0.0.1:{port}",
                        "--num-processes", str(n_proc),
                        "--process-id", str(pid),
                    ]
                procs.append(subprocess.Popen(
                    cmd, env=env, cwd=repo, stdout=subprocess.PIPE,
                    stderr=subprocess.PIPE, text=True,
                ))
            for p in procs:
                o, e = p.communicate(timeout=timeout)
                if p.returncode != 0:
                    raise RuntimeError(f"worker failed:\n{o}\n{e}")
            with open(out) as f:
                res = json.load(f)
        thr = global_batch / (res["ms_per_step"] / 1e3)  # graphs/s
        if base is None:
            base = thr / n_proc
        results.append({
            "processes": n_proc,
            "devices": n_proc * devices_per_process,
            "ms_per_step": res["ms_per_step"],
            "graphs_per_s": thr,
            "efficiency": thr / (base * n_proc),
        })
    return results
