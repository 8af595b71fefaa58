"""Batch-size sweep for the train_b8 headline config (packed batches),
scan-slope timing (the only trustworthy methodology on this runtime —
docs/PERF.md round 5; this script's first version used per-dispatch
walls and "measured" 729 TFLOP/s at B=64, 3.7x the chip peak, which is
what exposed the methodology bug).

Each batch size runs in its own fresh subprocess and reports the
(t_K2 - t_K1)/(K2 - K1) slope of K-step scanned train programs.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_batch.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def measure(batch_size: int, k1: int = 20, k2: int = 80):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from bench import _host_batch, train_b8_config
    from graph_neural_network_for_radar_perception_tpu.train.steps import (
        create_train_state, make_train_scan,
    )
    from graph_neural_network_for_radar_perception_tpu.utils.profiling import (
        flops_per_train_step,
    )

    cfg = train_b8_config()
    host_batch = _host_batch(cfg, batch_size, num_objects=(2, 12))
    rounds = len(cfg.graph_convolution_stem_channels)
    cap_edges = batch_size * cfg.max_edges * rounds
    valid_edges = float(host_batch.graph.edge_mask.sum()) * rounds
    batch = jax.tree.map(jnp.asarray, host_batch)
    times = {}
    for K in (k1, k2):
        run = make_train_scan(cfg, K)
        state = create_train_state(cfg, jax.random.key(0))
        jax.block_until_ready(jax.tree.leaves(state.params)[0])
        state, m = run(state, batch)
        _ = float(m["loss_total"])  # compile + completion barrier
        best = float("inf")
        for _r in range(2):
            state = create_train_state(cfg, jax.random.key(0))
            jax.block_until_ready(jax.tree.leaves(state.params)[0])
            t0 = time.perf_counter()
            state, m = run(state, batch)
            _ = float(m["loss_total"])
            best = min(best, time.perf_counter() - t0)
        times[K] = best
    dt = (times[k2] - times[k1]) / (k2 - k1)
    flops = flops_per_train_step(cfg, batch_size)
    print(json.dumps({
        "batch": batch_size,
        "ms_per_step": dt * 1e3,
        "valid_eps": valid_edges / dt,
        "cap_eps": cap_edges / dt,
        "occupancy": valid_edges / cap_edges,
        "analytic_tflops": flops / dt / 1e12,
    }))


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        measure(int(sys.argv[2]))
        return
    for b in (8, 16, 32):
        r = subprocess.run(
            [sys.executable, __file__, "--one", str(b)],
            capture_output=True, text=True, timeout=2400,
        )
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        if r.returncode != 0 or not line:
            print(f"B={b}: FAILED rc={r.returncode} "
                  f"{r.stderr.strip().splitlines()[-3:]}", file=sys.stderr)
            continue
        d = json.loads(line)
        print(f"B={b}: {d['ms_per_step']:.2f} ms/step  "
              f"valid {d['valid_eps']:.3e}/s  cap {d['cap_eps']:.3e}/s  "
              f"occ {d['occupancy']:.1%}  {d['analytic_tflops']:.1f} TF/s",
              file=sys.stderr)
        print(line)


if __name__ == "__main__":
    main()
