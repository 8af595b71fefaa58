"""Benchmark: message-passing training throughput (edge-messages/s/chip).

Runs the full jitted training step (fwd+bwd+SGD) of the flagship RadarGNN
on one chip with a realistic batch, and compares against a PyTorch CPU
baseline implementing the reference's gather → message-MLP → scatter-add
recipe (torch_geometric's MessagePassing semantics; the reference repo
publishes no speed numbers — BASELINE.md).

Prints ONE JSON line:
  {"metric": "edge_messages_per_s", "value": N, "unit": "edges/s",
   "vs_baseline": ratio_vs_torch_cpu}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


BATCH = 8
N_NODES = 768
K = 10
ROUNDS = 7
WIDTH = 64
MSG_HIDDEN = 128


def bench_jax():
    import jax
    import jax.numpy as jnp

    from graph_neural_network_for_radar_perception_tpu.config.config import (
        GNNConfig,
    )
    from graph_neural_network_for_radar_perception_tpu.data.pipeline import (
        SyntheticRadarDataset,
    )
    from graph_neural_network_for_radar_perception_tpu.train.steps import (
        create_train_state,
        make_train_step,
    )

    cfg = GNNConfig(max_nodes=N_NODES, max_clusters=256)
    log(f"jax devices: {jax.devices()}")
    ds = SyntheticRadarDataset(cfg, seed=0, num_objects=8)
    batch = jax.tree.map(jnp.asarray, next(ds.batches(BATCH)))
    state = create_train_state(cfg, jax.random.key(0))
    step = make_train_step(cfg)

    # Warmup / compile.
    state, m = step(state, batch)
    jax.block_until_ready(m["loss_total"])

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    jax.block_until_ready(m["loss_total"])
    dt = time.perf_counter() - t0

    edges_per_step = BATCH * cfg.max_edges * ROUNDS
    eps = edges_per_step * iters / dt
    log(
        f"jax: {iters} steps in {dt:.3f}s → {eps:.3e} edge-messages/s "
        f"(step {dt / iters * 1e3:.2f} ms, E={cfg.max_edges})"
    )
    return eps, cfg.max_edges


def bench_torch(max_edges: int):
    """Reference-style message passing in plain torch (CPU): per-round
    gather endpoints → MLP([x_i‖x_j‖e]) → index_add scatter → update MLP,
    over the same batch geometry, with backward + SGD step."""
    import torch

    torch.manual_seed(0)
    dev = "cpu"
    E = max_edges

    class Block(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.msg = torch.nn.Sequential(
                torch.nn.Linear(2 * WIDTH + WIDTH, MSG_HIDDEN),
                torch.nn.LeakyReLU(0.01),
                torch.nn.Linear(MSG_HIDDEN, WIDTH),
                torch.nn.LeakyReLU(0.01),
            )
            self.upd = torch.nn.Sequential(
                torch.nn.Linear(2 * WIDTH, WIDTH),
                torch.nn.LeakyReLU(0.01),
            )

        def forward(self, x, e, senders, receivers):
            m = self.msg(torch.cat([x[receivers], x[senders], e], dim=-1))
            agg = torch.zeros_like(x).index_add_(0, receivers, m)
            return x + self.upd(torch.cat([x, agg], dim=-1))

    blocks = torch.nn.ModuleList([Block() for _ in range(ROUNDS)]).to(dev)
    opt = torch.optim.SGD(blocks.parameters(), lr=0.005, momentum=0.9)

    xs = [torch.randn(N_NODES, WIDTH) for _ in range(BATCH)]
    es = [torch.randn(E, WIDTH) for _ in range(BATCH)]
    snd = [torch.randint(0, N_NODES, (E,)) for _ in range(BATCH)]
    rcv = [torch.randint(0, N_NODES, (E,)) for _ in range(BATCH)]

    def step():
        opt.zero_grad()
        total = 0.0
        for b in range(BATCH):
            x = xs[b]
            for blk in blocks:
                x = blk(x, es[b], snd[b], rcv[b])
            total = total + x.square().mean()
        total.backward()
        opt.step()

    step()  # warmup
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = time.perf_counter() - t0
    eps = BATCH * E * ROUNDS * iters / dt
    log(
        f"torch-cpu: {iters} steps in {dt:.3f}s → {eps:.3e} edge-messages/s"
    )
    return eps


def main():
    jax_eps, max_edges = bench_jax()
    try:
        torch_eps = bench_torch(max_edges)
        ratio = jax_eps / torch_eps
    except Exception as exc:  # torch baseline is best-effort
        log(f"torch baseline failed: {exc}")
        ratio = float("nan")
    print(
        json.dumps(
            {
                "metric": "edge_messages_per_s",
                "value": jax_eps,
                "unit": "edges/s",
                "vs_baseline": ratio,
            }
        )
    )


if __name__ == "__main__":
    main()
