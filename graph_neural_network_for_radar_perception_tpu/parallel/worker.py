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

    cfg = tiny_test_config(batch_size=args.global_batch)
    mesh, step = multihost_train_setup(cfg, n_graph=args.n_graph)
    state = replicated_create_state(cfg, mesh, seed=cfg.seed)
    assert_same_across_processes(state.params, "initial params")

    # Per-host feeding: the synthetic stream is deterministic in its seed,
    # so each process can materialise exactly its slice of the global
    # batch (real-data pipelines shard the frame index list the same way).
    sl = process_local_batch_slice(args.global_batch, mesh)
    ds = SyntheticRadarDataset(cfg, seed=args.seed, num_objects=2)
    specs = (
        edge_sharded_batch_specs(None)
        if args.n_graph > 1
        else None
    )

    metrics, batch = None, None
    for _ in range(args.steps):
        full = next(ds.batches(args.global_batch))
        local = jax.tree.map(lambda x: np.asarray(x)[sl], full)
        batch = globalize_batch(mesh, local, specs)
        state, metrics = step(state, batch)

    ms_per_step = None
    if args.bench_iters:
        import time

        jax.block_until_ready(metrics["loss_total"])
        t0 = time.perf_counter()
        for _ in range(args.bench_iters):
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
