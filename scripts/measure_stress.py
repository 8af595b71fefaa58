"""Measure the message-passing kernel matrix at DENSE fanout on the TPU.

Times one full train step (fwd+bwd+SGD) for the bench.py `stress_dense`
config (union-ball graphs, E_cap = 10*k*N ≈ 77k edges/graph, 14 rounds,
batch 2) across {slow, onehot, csr} x {xla, pallas backward}.  One config
per process (the remote runtime degrades ~30-60x when several large
executables share a process — docs/PERF.md).

Usage:  python scripts/measure_stress.py <impl> <backward> [iters]
            [edge_tile] [window] [src_window]
  impl:     slow | onehot | csr   (optionally with _bf16 suffix)
  backward: xla | pallas
  src_window > 0 additionally sets spatial_sort=True (the source-window
  contract needs spatially-coherent node ids).
Prints one line:  RESULT <ms_per_step>
"""
import dataclasses
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from graph_neural_network_for_radar_perception_tpu.config.config import GNNConfig
from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
    SyntheticRadarDataset,
)
from graph_neural_network_for_radar_perception_tpu.train.steps import (
    create_train_state, make_train_step,
)


def stress_config() -> GNNConfig:
    # Must match bench.py bench_stress_dense exactly.
    return GNNConfig(
        max_nodes=768,
        max_clusters=256,
        ball_query_eps_square=150.0,
        union_ball=True,
        edge_capacity_factor=10,
        graph_convolution_stem_channels=(64,) * 14,
    )


def main():
    impl, backward = sys.argv[1], sys.argv[2]
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    edge_tile = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    window = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    src_window = int(sys.argv[6]) if len(sys.argv) > 6 else 0

    cfg = stress_config()
    if edge_tile:
        cfg = dataclasses.replace(cfg, csr_edge_tile=edge_tile)
    if window:
        cfg = dataclasses.replace(cfg, csr_window=window)
    if src_window:
        cfg = dataclasses.replace(
            cfg, csr_src_window=src_window, spatial_sort=True
        )
    ds = SyntheticRadarDataset(cfg, seed=1, num_objects=16)
    batch = jax.tree.map(jnp.asarray, next(ds.batches(2)))
    state = create_train_state(cfg, jax.random.key(0))

    mp_bf16 = impl.endswith("_bf16")
    impl = impl.removesuffix("_bf16")
    if impl == "slow":
        step = make_train_step(cfg, use_fast_path=False, donate=True)
    else:
        step = make_train_step(
            cfg, use_fast_path=True, donate=True, mp_impl=impl,
            mp_bf16=mp_bf16, pallas_backward=(backward == "pallas"),
        )

    t_c0 = time.perf_counter()
    state, m = step(state, batch)
    jax.block_until_ready(m["loss_total"])
    compile_s = time.perf_counter() - t_c0

    for _ in range(3):
        state, m = step(state, batch)
    jax.block_until_ready(m["loss_total"])

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch)
        jax.block_until_ready(m["loss_total"])
        times.append((time.perf_counter() - t0) / iters)
    # Diagnostics AFTER timing (readback trap, docs/PERF.md).
    skipped = float(m.get("skipped", 0.0))
    print(f"compile {compile_s:.1f}s skipped={skipped}", file=sys.stderr)
    print(f"RESULT {min(times) * 1e3:.4f}")


if __name__ == "__main__":
    main()
