"""Ground-truth train-step timing: K steps inside ONE jitted lax.scan.

Round-5 finding: on the tunnelled runtime `block_until_ready` can return
before device execution completes (a chained 20-matmul scan "timed" at
0.4 ms for 662 ms of MXU work), so per-dispatch wall timing measures the
DISPATCH stream, not execution.  A blocking scalar readback flips the
session into per-step input re-upload (~28 ms RTT + batch bytes), so
readback-per-window over-reports instead.  The only unambiguous number:
one program that runs K sequentially-dependent steps server-side, timed
end-to-end including one readback, at two K values — the slope
(t_K2 - t_K1)/(K2 - K1) cancels RTT, upload, and dispatch overhead.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/scan_truth.py [B ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def make_scan_step(cfg, K: int):
    from functools import partial

    import optax

    from graph_neural_network_for_radar_perception_tpu.train.steps import (
        TrainState, all_finite, apply_if, make_loss_fn, make_optimizer,
    )

    loss_fn = make_loss_fn(cfg, False)
    tx = make_optimizer(cfg)

    @partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
    def train_scan(state, batch, k):
        def body(state, _):
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, batch)
            ok = all_finite(grads) & jnp.isfinite(loss)
            updates, opt_state = tx.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            params, opt_state = apply_if(
                ok, (params, opt_state), (state.params, state.opt_state)
            )
            return TrainState(params, opt_state, state.step + 1), loss

        state, losses = jax.lax.scan(body, state, None, length=k)
        return state, losses[-1]

    return lambda s, b: train_scan(s, b, K)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    sys.path.insert(0, "/root/repo")
    from bench import _host_batch, train_b8_config
    from graph_neural_network_for_radar_perception_tpu.train.steps import (
        create_train_state,
    )
    from graph_neural_network_for_radar_perception_tpu.utils.profiling import (
        flops_per_train_step,
    )

    bs = [int(a) for a in sys.argv[1:]] or [8]
    cfg = train_b8_config()
    K1, K2 = 100, 500
    for B in bs:
        host_batch = _host_batch(cfg, B, num_objects=(2, 12))
        batch = jax.tree.map(jnp.asarray, host_batch)
        valid_edges = float(host_batch.graph.edge_mask.sum()) * len(
            cfg.graph_convolution_stem_channels
        )
        times = {}
        for K in (K1, K2):
            prog = make_scan_step(cfg, K)
            state = create_train_state(cfg, jax.random.key(0))
            jax.block_until_ready(jax.tree.leaves(state.params)[0])
            state, l = prog(state, batch)
            _ = float(l)  # compile + warm barrier
            best = float("inf")
            for _ in range(3):
                state = create_train_state(cfg, jax.random.key(0))
                jax.block_until_ready(jax.tree.leaves(state.params)[0])
                t0 = time.perf_counter()
                state, l = prog(state, batch)
                lv = float(l)  # completion barrier
                best = min(best, time.perf_counter() - t0)
            times[K] = best
            print(f"B={B} K={K}: {best*1e3:.1f} ms total "
                  f"({best/K*1e3:.3f} ms/step raw, loss={lv:.4f})",
                  flush=True)
        slope = (times[K2] - times[K1]) / (K2 - K1)
        flops = flops_per_train_step(cfg, B)
        print(f"B={B}: TRUE {slope*1e3:.3f} ms/step  "
              f"valid {valid_edges/slope:.3e} edge-msgs/s  "
              f"{flops/slope/1e12:.1f} TF/s analytic", flush=True)


if __name__ == "__main__":
    main()
