"""Object-classifier finetuning over DBSCAN proposals.

Reference: Model_Object_Classifier_Finetuning (gnn_detector.py:481-519) +
gnn/finetuning.py:28-135 + set_param_for_finetuning_obj_classifier.py —
run the frozen trunk in deployment mode (DBSCAN clustering inside the
forward, eps=1.5), label each proposal by the majority vote
(bincount-argmax) of its member nodes' ground-truth classes, train ONLY the
object-classification head with CE.

TPU-native: the whole thing — DBSCAN included — is one jitted step
(infer/clustering.py label propagation), and freezing is an optax mask
instead of requires_grad flags (gnn_detector.py:127-133)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from ..config.config import GNNConfig
from ..core.graph import GraphBatch
from ..models.gnn import RadarGNN
from ..ops import segment as S
from .loss import cross_entropy
from .steps import TrainState, all_finite, apply_if


def majority_vote_labels(
    node_class: jnp.ndarray,     # [N] ground-truth node classes
    node2cluster: jnp.ndarray,   # [N] DBSCAN cluster ids (void = N)
    node_mask: jnp.ndarray,
    num_clusters_cap: int,
    num_classes: int,
) -> jnp.ndarray:
    """Per-cluster argmax-bincount of member GT labels
    (gnn_detector.py:511-513).  jnp.argmax picks the lowest index on ties,
    exactly like torch.argmax(torch.bincount(...))."""
    onehot = jax.nn.one_hot(node_class, num_classes, dtype=jnp.float32)
    votes = S.masked_segment_sum(
        onehot, node2cluster, num_clusters_cap, node_mask
    )
    return jnp.argmax(votes, axis=-1).astype(jnp.int32)


def make_finetune_optimizer(cfg: GNNConfig, params) -> optax.GradientTransformation:
    """SGD on the object head only (frozen everything else;
    set_param_for_finetuning_obj_classifier.py + gnn_detector.py:127-133)."""
    def label_fn(path, _):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        return "train" if top == "predict_class" else "freeze"

    labels = jax.tree_util.tree_map_with_path(label_fn, params)
    return optax.multi_transform(
        {
            "train": optax.chain(
                optax.add_decayed_weights(cfg.weight_decay_finetuning),
                optax.sgd(cfg.learning_rate_finetuning, momentum=cfg.momentum),
            ),
            "freeze": optax.set_to_zero(),
        },
        labels,
    )


def make_finetune_step(cfg: GNNConfig):
    model = RadarGNN(cfg)

    def single_graph_loss(params, graph, node_class):
        out = model.apply(
            {"params": params}, graph, eps=cfg.clustering_eps,
            method=RadarGNN.deploy,
        )
        n = graph.num_nodes
        gt = majority_vote_labels(
            node_class, out.node2cluster, graph.node_mask, n,
            cfg.num_classes,
        )
        cmask = (
            jnp.arange(n, dtype=jnp.int32) < out.num_clusters
        ).astype(jnp.float32)
        onehot = jax.nn.one_hot(gt, cfg.num_classes, dtype=jnp.float32)
        ce = cross_entropy(out.obj_cls, onehot)
        correct = (jnp.argmax(out.obj_cls, -1) == gt).astype(jnp.float32)
        return jnp.sum(ce * cmask), jnp.sum(cmask), jnp.sum(correct * cmask)

    def loss_fn(params, batch: GraphBatch):
        sums, cnts, corr = jax.vmap(
            single_graph_loss, in_axes=(None, 0, 0)
        )(params, batch.graph, batch.labels.node_class)
        total_cnt = jnp.maximum(jnp.sum(cnts), 1.0)
        loss = jnp.sum(sums) / total_cnt
        acc = jnp.sum(corr) / total_cnt
        return loss, {"loss_obj_cls": loss, "object_accuracy": acc}

    def build(params):
        tx = make_finetune_optimizer(cfg, params)

        @jax.jit
        def step(state: TrainState, batch: GraphBatch):
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
            metrics = dict(metrics, skipped=(~ok).astype(jnp.float32))
            return TrainState(params, opt_state, state.step + 1), metrics

        return step, tx

    return build, loss_fn
