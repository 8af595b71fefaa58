"""Multi-host training worker: one process of a distributed run.

Launch one copy per host (or per simulated process in tests):

    python -m graph_neural_network_for_radar_perception_tpu.parallel.worker \
        --coordinator localhost:12345 --num-processes 2 --process-id 0 \
        --steps 5 --global-batch 8

Every process executes the same program: initialise the distributed
runtime, build the process-major ('data','graph') mesh, construct its own
shard of each global batch, and run the identical pjit train step — XLA
inserts the cross-host collectives (SURVEY.md §5 "distributed backend",
designed fresh; the reference has no distributed execution).

On CPU (tests) pass --platform cpu --local-devices 4 to simulate a
2-host × 4-device slice; on TPU pods omit coordinator/process flags
(auto-detected from the TPU metadata).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--global-batch", type=int, default=8)
    ap.add_argument("--n-graph", type=int, default=1)
    ap.add_argument("--graph-partition", default="edge",
                    choices=["edge", "halo"],
                    help="n_graph>1 partitioning mode: psum-per-round edge "
                         "sharding or owner-computes halo exchange")
    ap.add_argument("--platform", default=None, choices=[None, "cpu"])
    ap.add_argument("--local-devices", type=int, default=None,
                    help="virtual CPU device count (tests)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--bench-iters", type=int, default=0,
                    help="after training, time this many steps on a fixed "
                         "batch and report ms_per_step")
    ap.add_argument("--out", default=None,
                    help="file for final metrics JSON (process 0 only)")
    args = ap.parse_args(argv)

    if args.local_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.local_devices}"
        ).strip()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from .distributed import (
        assert_same_across_processes, globalize_batch, init_distributed,
        multihost_train_setup, process_local_batch_slice,
        replicated_create_state,
    )

    init_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import numpy as np

    from ..config.config import tiny_test_config
    from ..data.pipeline import SyntheticRadarDataset
    from ..parallel.mesh import edge_sharded_batch_specs

    halo_mode = args.n_graph > 1 and args.graph_partition == "halo"
    cfg = tiny_test_config(
        batch_size=args.global_batch, spatial_sort=halo_mode
    )
    # Deterministic synthetic stream → every process sees the same global
    # batches; pregenerate them so the halo width (a static jit argument)
    # can be sized to the worst frame of the run identically everywhere.
    ds = SyntheticRadarDataset(cfg, seed=args.seed, num_objects=2)
    fulls = [next(ds.batches(args.global_batch)) for _ in range(args.steps)]

    halo = 16
    if halo_mode:
        from .halo import make_halo_batch, required_halo

        need = max(
            required_halo(
                jax.tree.map(lambda x: np.asarray(x)[b], full.graph),
                args.n_graph,
            )
            for full in fulls
            for b in range(args.global_batch)
        )
        halo = 8 * max(1, -(-need // 8))

    mesh, step = multihost_train_setup(
        cfg, n_graph=args.n_graph,
        graph_partition=args.graph_partition, halo=halo,
    )
    state = replicated_create_state(cfg, mesh, seed=cfg.seed)
    assert_same_across_processes(state.params, "initial params")

    # Per-host feeding: each process materialises exactly its slice of
    # the global batch (real-data pipelines shard the frame index list
    # the same way).
    from jax.sharding import PartitionSpec as P

    sl = process_local_batch_slice(args.global_batch, mesh)
    specs = (
        edge_sharded_batch_specs(None)
        if args.n_graph > 1 and not halo_mode
        else None
    )

    def feed(full):
        local = jax.tree.map(lambda x: np.asarray(x)[sl], full)
        batch = globalize_batch(
            mesh, local,
            jax.tree.map(lambda _: P("data"), local) if halo_mode else specs,
        )
        if not halo_mode:
            return batch, None
        # Owner-assign this process's frames' edges on the host; the
        # [B, G, ...] shard arrays are global over ('data', 'graph').
        local_shards = make_halo_batch(local, cfg, args.n_graph, halo)
        shards = globalize_batch(
            mesh, local_shards,
            jax.tree.map(lambda _: P("data", "graph"), local_shards),
        )
        return batch, shards

    metrics, batch, shards = None, None, None
    for full in fulls:
        batch, shards = feed(full)
        if halo_mode:
            state, metrics = step(state, batch, shards)
        else:
            state, metrics = step(state, batch)

    ms_per_step = None
    if args.bench_iters:
        import time

        jax.block_until_ready(metrics["loss_total"])
        t0 = time.perf_counter()
        for _ in range(args.bench_iters):
            if halo_mode:
                state, metrics = step(state, batch, shards)
            else:
                state, metrics = step(state, batch)
        jax.block_until_ready(metrics["loss_total"])
        ms_per_step = (time.perf_counter() - t0) / args.bench_iters * 1e3

    host_metrics = {k: float(v) for k, v in metrics.items()}
    fp = float(
        sum(
            np.abs(np.asarray(jax.device_get(x), np.float64)).sum()
            for x in jax.tree.leaves(state.params)
        )
    )
    result = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "devices": len(jax.devices()),
        "metrics": host_metrics,
        "param_l1": fp,
        "ms_per_step": ms_per_step,
        "global_batch": args.global_batch,
    }
    print(json.dumps(result), flush=True)
    if args.out and jax.process_index() == 0:
        with open(args.out, "w") as f:
            json.dump(result, f)
    # Tear down cleanly so the coordinator releases the port for reruns.
    if jax.process_count() > 1:
        jax.distributed.shutdown()


if __name__ == "__main__":
    main()
