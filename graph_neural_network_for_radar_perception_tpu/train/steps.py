"""Jitted train/eval steps and optimiser construction.

Replaces the reference's python training wrapper
(modules/neural_net/gnn/gnn_detector.py:419-478 — a per-graph python loop —
and gnn/training.py:48-186) with one compiled program: the model is vmapped
over the stacked batch, per-graph loss sums are combined, and the SGD
(momentum 0.9, coupled weight decay, MultiStep LR ×0.1 at 50 %/80 %) update
is fused in.  NaN protection becomes a branchless masked update rather than
the reference's python `skip_batch` (training.py:40-45).
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config.config import GNNConfig
from ..core.graph import GraphBatch, GraphLabels, RadarGraph
from ..models.gnn import RadarGNN
from .loss import graph_loss_sums, reduce_loss_sums, tree_sum


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def lr_schedule(cfg: GNNConfig) -> optax.Schedule:
    """MultiStepLR(γ=0.1 @50%/80%) equivalent
    (set_param_for_training_gnn.py:50-56)."""
    m1, m2 = cfg.lr_milestones
    return optax.piecewise_constant_schedule(
        init_value=cfg.learning_rate,
        boundaries_and_scales={m1: cfg.lr_gamma, m2: cfg.lr_gamma},
    )


def make_optimizer(cfg: GNNConfig) -> optax.GradientTransformation:
    """torch.optim.SGD(momentum=0.9, weight_decay) semantics: wd is added to
    the raw gradient BEFORE the momentum buffer (coupled), then
    p ← p − lr·buf.  AdamW option mirrors set_param_for_training_gnn.py:46-56.
    """
    sched = lr_schedule(cfg)
    if cfg.optim == "adamw":
        tx = optax.adamw(sched, weight_decay=cfg.weight_decay)
    else:
        tx = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(sched, momentum=cfg.momentum, nesterov=False),
        )
    if cfg.grad_accumulation_steps > 1:
        # Average grads over k micro-batches, apply every k-th call —
        # the reference's Σ (loss/k).backward() then one step
        # (training.py:189-233).
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accumulation_steps)
    return tx


def dummy_inputs(cfg: GNNConfig) -> Tuple[RadarGraph, GraphLabels]:
    """Capacity-shaped zero graph for model init / compile checks."""
    n, e, eu, c = cfg.max_nodes, cfg.max_edges, cfg.max_und_edges, cfg.max_clusters
    graph = RadarGraph(
        node_feat=jnp.zeros((n, cfg.input_node_feat_dim), jnp.float32),
        edge_feat=jnp.zeros((e, cfg.input_edge_feat_dim), jnp.float32),
        senders=jnp.zeros((e,), jnp.int32),
        receivers=jnp.zeros((e,), jnp.int32),
        node_mask=jnp.zeros((n,), bool).at[:2].set(True),
        edge_mask=jnp.zeros((e,), bool).at[:2].set(True),
        und_senders=jnp.zeros((eu,), jnp.int32),
        und_receivers=jnp.ones((eu,), jnp.int32),
        und_mask=jnp.zeros((eu,), bool).at[:1].set(True),
        other_feat=jnp.zeros((n, 4), jnp.float32),
    )
    labels = GraphLabels(
        node_class=jnp.zeros((n,), jnp.int32),
        node_offsets=jnp.zeros((n, 2), jnp.float32),
        edge_class=jnp.zeros((eu,), jnp.int32),
        node2cluster=jnp.full((n,), c, jnp.int32).at[:2].set(0),
        cluster_class=jnp.zeros((c,), jnp.int32),
        cluster_mask=jnp.zeros((c,), bool).at[:1].set(True),
    )
    return graph, labels


def init_params(cfg: GNNConfig, rng: jax.Array):
    model = RadarGNN(cfg)
    graph, labels = dummy_inputs(cfg)
    # One compiled program instead of eager per-op dispatch: on the remote
    # axon TPU, eager init is ~100 small compiles (~90 s cold) vs ~5 s for
    # a single jitted init (measured round 4; CLAUDE.md gotcha).
    init = jax.jit(model.init, static_argnums=(3,))
    variables = init(
        rng, graph, labels.node2cluster, cfg.max_clusters, labels.cluster_mask
    )
    return variables["params"]


def create_train_state(cfg: GNNConfig, rng: jax.Array) -> TrainState:
    # model init + optimiser init fused into ONE jitted program — eager
    # dispatch of either takes tens of seconds cold on the remote TPU.
    model = RadarGNN(cfg)
    graph, labels = dummy_inputs(cfg)
    tx = make_optimizer(cfg)

    def _init(rng):
        params = model.init(
            rng, graph, labels.node2cluster, cfg.max_clusters,
            labels.cluster_mask,
        )["params"]
        return TrainState(
            params=params,
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    return jax.jit(_init)(rng)


def batched_forward(model: RadarGNN, cfg: GNNConfig):
    """Returns fn(params, graph_batch, labels_batch) → batched GNNOutputs."""

    def single(params, graph, node2cluster, cluster_mask):
        return model.apply(
            {"params": params}, graph, node2cluster, cfg.max_clusters,
            cluster_mask,
        )

    return jax.vmap(single, in_axes=(None, 0, 0, 0))


def make_loss_fn(
    cfg: GNNConfig, use_fast_path: bool = False, mp_bf16: bool = False,
    mp_impl=None, pallas_backward=None,
) -> Callable:
    """Batched loss.  use_fast_path routes the forward through
    models/fast_path.fast_forward (Pallas fused message kernel) — same
    parameter tree, same numerics.  mp_bf16 additionally runs the fused
    kernel's matmuls with bf16 MXU operands (f32 accumulate/backward);
    mp_impl picks the kernel ("csr" | "onehot", default per config);
    pallas_backward selects the fused backward kernel."""
    if use_fast_path:
        from ..models.fast_path import fast_forward

        def single(params, graph, node2cluster, cluster_mask):
            return fast_forward(
                params, graph, node2cluster, cfg.max_clusters,
                cluster_mask, cfg, mp_bf16=mp_bf16, mp_impl=mp_impl,
                pallas_backward=pallas_backward,
            )

        fwd = jax.vmap(single, in_axes=(None, 0, 0, 0))
    else:
        model = RadarGNN(cfg)
        fwd = batched_forward(model, cfg)

    def loss_fn(params, batch: GraphBatch):
        outs = fwd(
            params, batch.graph, batch.labels.node2cluster,
            batch.labels.cluster_mask,
        )
        sums = jax.vmap(
            lambda o, g, l: graph_loss_sums(o, g, l, cfg)
        )(outs, batch.graph, batch.labels)
        total, metrics = reduce_loss_sums(tree_sum(sums), cfg)
        return total, metrics

    return loss_fn


def all_finite(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.all(
        jnp.stack([jnp.all(jnp.isfinite(x)) for x in leaves])
    )


def apply_if(ok, new_tree, old_tree):
    """Elementwise select between two pytrees on a scalar predicate
    (branchless NaN-batch skip)."""
    return jax.tree.map(
        lambda n, o: jnp.where(ok, n, o), new_tree, old_tree
    )


def make_train_step(
    cfg: GNNConfig, use_fast_path: bool = False, donate: bool = False,
    mp_bf16: bool = False, mp_impl=None, pallas_backward=None,
):
    """(state, batch) → (state, metrics); single-device.  Sharded variants
    live in parallel/.

    donate=True donates the TrainState so XLA updates params/momentum in
    place (halves state HBM traffic); the input state is then CONSUMED —
    callers must reassign it every step (the trainer does).  Leave False
    when the old state is inspected after the call (tests, probes).

    Do NOT time loops of this step on the tunnelled TPU runtime:
    `block_until_ready` there can return before device execution
    finishes, so per-dispatch walls measure the dispatch stream, not the
    chip (docs/PERF.md round 5 — this invalidated the round 1-4
    benchmark numbers).  Use `make_train_scan` and the two-K slope
    instead (bench.py does)."""
    loss_fn = make_loss_fn(
        cfg, use_fast_path, mp_bf16=mp_bf16, mp_impl=mp_impl,
        pallas_backward=pallas_backward,
    )
    tx = make_optimizer(cfg)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch: GraphBatch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        # Branchless skip of non-finite batches (training.py:40-45): the
        # whole update (including weight decay and momentum) is frozen.
        ok = all_finite(grads) & jnp.isfinite(loss)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params, opt_state = apply_if(
            ok, (params, opt_state), (state.params, state.opt_state)
        )
        metrics = dict(metrics, skipped=(~ok).astype(jnp.float32))
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_train_scan(
    cfg: GNNConfig, length: int, use_fast_path: bool = False,
    mp_bf16: bool = False, mp_impl=None, pallas_backward=None,
):
    """(state, batches) → (state, last_metrics): `length` train steps inside
    ONE compiled program (lax.scan), numerically identical to `length`
    sequential `make_train_step` calls (tests/test_train.py asserts this).

    Why it exists: one dispatch per K steps instead of K dispatches.  On
    the tunnelled TPU runtime this is also the only trustworthy timing
    unit — `block_until_ready` there can return before device execution
    finishes, so per-dispatch walls measure the dispatch stream, not the
    chip (docs/PERF.md round 5); a scanned program is forced sequential
    server-side and is timed end-to-end with a single readback.

    `batches` is either one GraphBatch (same batch every step — the bench
    case) or a GraphBatch pytree with a leading [length] axis (real
    training over K different batches per dispatch)."""
    loss_fn = make_loss_fn(
        cfg, use_fast_path, mp_bf16=mp_bf16, mp_impl=mp_impl,
        pallas_backward=pallas_backward,
    )
    tx = make_optimizer(cfg)

    def body(state: TrainState, batch: GraphBatch):
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

    @partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
    def train_scan(state: TrainState, batches, stacked: bool):
        if stacked:
            return jax.lax.scan(body, state, batches)
        return jax.lax.scan(
            lambda s, _: body(s, batches), state, None, length=length
        )

    def run(state, batches):
        # One batch reused ([B, ...] leaves) vs [length] stacked batches
        # ([length, B, ...] leaves): decided by the node_feat rank.
        stacked = batches.graph.node_feat.ndim == 4
        state, ms = train_scan(state, batches, stacked)
        # Last step's metrics (scan stacks them along the leading axis).
        return state, jax.tree.map(lambda x: x[-1], ms)

    return run


def make_eval_step(cfg: GNNConfig):
    loss_fn = make_loss_fn(cfg)

    @jax.jit
    def eval_step(params, batch: GraphBatch) -> Dict[str, jnp.ndarray]:
        _, metrics = loss_fn(params, batch)
        return metrics

    return eval_step
