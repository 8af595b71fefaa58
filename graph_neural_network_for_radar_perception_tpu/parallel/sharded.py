"""Multi-device training steps: data parallelism + edge partitioning.

Two tiers, both pure pjit/shard_map — no hand-rolled process code
(SURVEY.md §5 "distributed backend"):

* ``make_dp_train_step`` — batch axis sharded over the full mesh; XLA's
  SPMD partitioner inserts the gradient all-reduce.  The straightforward
  production path for the shipped model size.

* ``make_edge_sharded_train_step`` — 2-D mesh ('data', 'graph'): batch
  over 'data', every per-edge array additionally sharded along E over
  'graph'.  Message-MLP work (the dominant FLOPs, E ≈ 20·N edges) divides
  across 'graph'; partial segment-sums combine with one psum per
  message-passing round (models/blocks.py).  The loss is computed inside
  shard_map with explicit psums and differentiated OUTSIDE it, so the
  transpose rules produce correct gradients for both sharded (edge) and
  replicated (node) computations.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config.config import GNNConfig
from ..core.graph import GraphBatch
from ..models.gnn import RadarGNN
from ..train.loss import LossSums, graph_loss_sums, reduce_loss_sums, tree_sum
from ..train.steps import TrainState, all_finite, apply_if, make_optimizer
from .mesh import edge_sharded_batch_specs

_EDGE_FIELDS = {"edge_sum", "edge_cnt", "edge_correct"}


def make_dp_train_step(cfg: GNNConfig, mesh: Mesh):
    """Data-parallel train step via jit + NamedSharding (params replicated,
    batch sharded on axis 0 over every mesh axis)."""
    from ..train.steps import make_loss_fn

    loss_fn = make_loss_fn(cfg)
    tx = make_optimizer(cfg)
    batch_sh = NamedSharding(mesh, P(mesh.axis_names))
    repl = NamedSharding(mesh, P())

    @partial(
        jax.jit,
        in_shardings=(repl, batch_sh),
        out_shardings=(repl, repl),
    )
    def train_step(state: TrainState, batch: GraphBatch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        ok = all_finite(grads) & jnp.isfinite(loss)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params, opt_state = apply_if(
            ok, (params, opt_state), (state.params, state.opt_state)
        )
        metrics = dict(metrics, skipped=(~ok).astype(jnp.float32))
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def _edge_sharded_loss(cfg: GNNConfig, mesh: Mesh):
    """Loss over a ('data','graph')-sharded batch, differentiable."""
    cfg_l = dataclasses.replace(cfg, graph_axis="graph")
    model = RadarGNN(cfg_l)

    def single(params, graph, node2cluster, cluster_mask):
        return model.apply(
            {"params": params}, graph, node2cluster, cfg.max_clusters,
            cluster_mask,
        )

    def local_loss(params, batch: GraphBatch):
        outs = jax.vmap(single, in_axes=(None, 0, 0, 0))(
            params, batch.graph, batch.labels.node2cluster,
            batch.labels.cluster_mask,
        )
        sums = jax.vmap(lambda o, g, l: graph_loss_sums(o, g, l, cfg_l))(
            outs, batch.graph, batch.labels
        )
        sums = tree_sum(sums)
        # Edge losses were computed on the local edge shard only: combine
        # across 'graph'.  Node/cluster losses are replicated across
        # 'graph' (identical on all members) — psum only over 'data'.
        sums = LossSums(**{
            name: (
                jax.lax.psum(val, ("data", "graph"))
                if name in _EDGE_FIELDS
                else jax.lax.psum(val, "data")
            )
            for name, val in sums._asdict().items()
        })
        total, metrics = reduce_loss_sums(sums, cfg)
        return total, metrics

    batch_specs = edge_sharded_batch_specs(None)
    sharded = shard_map(
        local_loss,
        mesh=mesh,
        in_specs=(P(), batch_specs),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return sharded


def make_edge_sharded_train_step(cfg: GNNConfig, mesh: Mesh):
    """Full train step with edge partitioning over the 'graph' mesh axis."""
    loss_fn = _edge_sharded_loss(cfg, mesh)
    tx = make_optimizer(cfg)
    repl = NamedSharding(mesh, P())

    @partial(jax.jit, out_shardings=(repl, repl))
    def train_step(state: TrainState, batch: GraphBatch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        ok = all_finite(grads) & jnp.isfinite(loss)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params, opt_state = apply_if(
            ok, (params, opt_state), (state.params, state.opt_state)
        )
        metrics = dict(metrics, skipped=(~ok).astype(jnp.float32))
        return TrainState(params, opt_state, state.step + 1), metrics

    def place_batch(batch: GraphBatch) -> GraphBatch:
        specs = edge_sharded_batch_specs(None)
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            batch, specs,
        )

    train_step.place_batch = place_batch
    return train_step
