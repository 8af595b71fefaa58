"""Multi-task loss with exact reference semantics under masking.

Reference (modules/neural_net/gnn/loss.py:10-76 + lossfunc.py:19-55):

* edge: sigmoid focal loss (α=0.25, γ=2) on 2-logit one-hot targets,
  summed over the logit axis, then mean over ALL undirected edges in the
  concatenated batch;
* node class: weighted CE with class weights [1,1,1,1,1,1,0.5]; the mean
  divides by the element COUNT, not the weight sum (reduction='none' then
  .sum()/shape[0]);
* offsets: 0.5 · Σ_dim (pred − gt)², mean over nodes; GT offsets are
  z-scored with μ=(0,0), σ=(8,4) before the loss (gnn_detector.py:464-466);
* object: plain CE, mean over clusters;
* weighted total with node/edge/reg/obj = 1/2/5/1 (yml:67-71).

Because the reference concatenates every graph in the batch before taking
means (gnn_detector.py:454-467), each loss here is a per-graph
(sum, count) pair; the train step sums pairs across the batch (and psums
across data-parallel shards) before dividing — exact parity despite padded
static shapes (SURVEY.md §7 "use mask-sums, not padded sizes").
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config.config import GNNConfig
from ..core.graph import GraphLabels, RadarGraph
from ..models.gnn import GNNOutputs

FOCAL_ALPHA = 0.25
FOCAL_GAMMA = 2.0


class LossSums(NamedTuple):
    """Per-graph weighted loss sums and element counts for each task, plus
    accuracy numerators.  All scalars; additive across graphs/devices."""

    edge_sum: jnp.ndarray
    edge_cnt: jnp.ndarray
    node_sum: jnp.ndarray
    node_cnt: jnp.ndarray
    reg_sum: jnp.ndarray
    reg_cnt: jnp.ndarray
    obj_sum: jnp.ndarray
    obj_cnt: jnp.ndarray
    node_correct: jnp.ndarray
    edge_correct: jnp.ndarray
    obj_correct: jnp.ndarray


def sigmoid_focal_loss(logits, targets, alpha=FOCAL_ALPHA, gamma=FOCAL_GAMMA):
    """torchvision.ops.sigmoid_focal_loss with reduction='none'
    (lossfunc.py:47-55)."""
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss


def cross_entropy(logits, labels_onehot, class_weights=None):
    """F.cross_entropy(reduction='none') on integer targets given one-hot:
    w[target] · (−log_softmax)[target] (lossfunc.py:19-26)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.sum(labels_onehot * logp, axis=-1)
    if class_weights is not None:
        w = jnp.sum(labels_onehot * class_weights[None, :], axis=-1)
        nll = nll * w
    return nll


def normalize_offsets_jnp(offsets, cfg: GNNConfig):
    """compute_offsets.py:6-11."""
    mu = jnp.asarray(cfg.reg_mu, dtype=offsets.dtype)
    sigma = jnp.asarray(cfg.reg_sigma, dtype=offsets.dtype)
    return (offsets - mu) / sigma


def graph_loss_sums(
    out: GNNOutputs,
    graph: RadarGraph,
    labels: GraphLabels,
    cfg: GNNConfig,
) -> LossSums:
    """Masked per-graph loss sums/counts for ONE graph (vmapped over B)."""
    f32 = jnp.float32
    ncls = cfg.num_classes
    necls = cfg.num_edge_classes
    cw = jnp.asarray(cfg.class_weights_dyn, dtype=f32)

    nmask = graph.node_mask.astype(f32)
    umask = graph.und_mask.astype(f32)
    cmask = labels.cluster_mask.astype(f32)

    # --- edge focal loss (loss.py:57-58) ---------------------------------
    edge_1h = jax.nn.one_hot(labels.edge_class, necls, dtype=f32)
    e_loss = jnp.sum(sigmoid_focal_loss(out.edge_cls, edge_1h), axis=-1)
    edge_sum = jnp.sum(e_loss * umask)
    edge_cnt = jnp.sum(umask)

    # --- node weighted CE (loss.py:61-62) --------------------------------
    node_1h = jax.nn.one_hot(labels.node_class, ncls, dtype=f32)
    n_loss = cross_entropy(out.node_cls, node_1h, cw)
    node_sum = jnp.sum(n_loss * nmask)
    node_cnt = jnp.sum(nmask)

    # --- offset regression (loss.py:65-66) -------------------------------
    gt_off = normalize_offsets_jnp(labels.node_offsets, cfg)
    r_loss = 0.5 * jnp.sum((out.node_offsets - gt_off) ** 2, axis=-1)
    reg_sum = jnp.sum(r_loss * nmask)
    reg_cnt = node_cnt

    # --- object CE (loss.py:69-70) ---------------------------------------
    obj_1h = jax.nn.one_hot(labels.cluster_class, ncls, dtype=f32)
    o_loss = cross_entropy(out.obj_cls, obj_1h)
    obj_sum = jnp.sum(o_loss * cmask)
    obj_cnt = jnp.sum(cmask)

    # --- accuracies (gnn_detector.py:23-28,473-476) ----------------------
    node_correct = jnp.sum(
        (jnp.argmax(out.node_cls, -1) == labels.node_class) * nmask
    )
    edge_correct = jnp.sum(
        (jnp.argmax(out.edge_cls, -1) == labels.edge_class) * umask
    )
    obj_correct = jnp.sum(
        (jnp.argmax(out.obj_cls, -1) == labels.cluster_class) * cmask
    )

    return LossSums(
        edge_sum, edge_cnt, node_sum, node_cnt, reg_sum, reg_cnt,
        obj_sum, obj_cnt, node_correct, edge_correct, obj_correct,
    )


def reduce_loss_sums(
    sums: LossSums, cfg: GNNConfig
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Batch-summed LossSums → (total weighted loss, metrics dict).

    Division by true element counts happens here, after all per-graph /
    per-device sums have been combined (loss.py:58,62,66,70 semantics)."""
    def safe(x, c):
        return x / jnp.maximum(c, 1.0)

    loss_edge = safe(sums.edge_sum, sums.edge_cnt) * cfg.edge_cls_loss_weight
    loss_node = safe(sums.node_sum, sums.node_cnt) * cfg.node_cls_loss_weight
    loss_reg = safe(sums.reg_sum, sums.reg_cnt) * cfg.node_reg_loss_weight
    loss_obj = safe(sums.obj_sum, sums.obj_cnt) * cfg.obj_cls_loss_weight
    total = loss_edge + loss_node + loss_reg + loss_obj
    metrics = {
        "loss_edge_cls": loss_edge,
        "loss_node_cls": loss_node,
        "loss_node_reg": loss_reg,
        "loss_obj_cls": loss_obj,
        "loss_total": total,
        "segment_accuracy": safe(sums.node_correct, sums.node_cnt),
        "edge_accuracy": safe(sums.edge_correct, sums.edge_cnt),
        "object_accuracy": safe(sums.obj_correct, sums.obj_cnt),
    }
    return total, metrics


def tree_sum(sums: LossSums) -> LossSums:
    """Sum a batched LossSums (leading axis B) into scalars."""
    return jax.tree.map(lambda x: jnp.sum(x, axis=0), sums)
