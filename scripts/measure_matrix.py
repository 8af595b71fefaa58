"""DEPRECATED (round 5): this script times per-dispatch walls, which on
the tunnelled runtime measure the dispatch stream, not device execution
(docs/PERF.md round-5 retraction).  Its numbers drove the wrong round-3/4
kernel decisions.  Kept only as the historical artifact; use
scripts/scan_truth.py / scripts/sweep_batch.py (scan-slope) instead.

Measure the message-passing kernel matrix end-to-end on the real TPU.

Times one full train step (fwd+bwd+SGD) for the shipped bench config
(max_nodes=768, batch 8) across {xla, onehot, csr} x {xla-bwd, pallas-bwd}
and donate={False, True}, each invocation in THIS process (run one config
per process via argv; the driver script loops).

Usage:  python scripts/measure_matrix.py <impl> <backward> <donate> [iters]
  impl:     slow | onehot | csr       (slow = no fast path, pure XLA model)
  backward: xla | pallas
  donate:   0 | 1
Prints one line:  RESULT <ms_per_step>
"""
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


def main():
    impl, backward, donate = sys.argv[1], sys.argv[2], bool(int(sys.argv[3]))
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 30

    cfg = GNNConfig(max_nodes=768, max_clusters=256)
    ds = SyntheticRadarDataset(cfg, seed=0, num_objects=8)
    batch = jax.tree.map(jnp.asarray, next(ds.batches(8)))
    state = create_train_state(cfg, jax.random.key(0))

    mp_bf16 = impl.endswith("_bf16")
    impl = impl.removesuffix("_bf16")
    if impl == "slow":
        step = make_train_step(cfg, use_fast_path=False, donate=donate)
    else:
        step = make_train_step(
            cfg, use_fast_path=True, donate=donate, mp_impl=impl,
            mp_bf16=mp_bf16, pallas_backward=(backward == "pallas"),
        )

    t_c0 = time.perf_counter()
    state, m = step(state, batch)
    jax.block_until_ready(m["loss_total"])
    compile_s = time.perf_counter() - t_c0

    # warmup a few steady-state steps
    for _ in range(3):
        state, m = step(state, batch)
    jax.block_until_ready(m["loss_total"])

    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    jax.block_until_ready(m["loss_total"])
    dt = (time.perf_counter() - t0) / iters
    print(f"compile {compile_s:.1f}s", file=sys.stderr)
    print(f"RESULT {dt * 1e3:.4f}")


if __name__ == "__main__":
    main()
