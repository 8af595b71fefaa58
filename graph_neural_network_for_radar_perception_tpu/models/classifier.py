"""Stage-2 standalone object classifier.

TPU-native re-design of the reference's second-stage GNN
(modules/neural_net/classifier/*, datagen_classifier.py — trained by
script_train_model_classifier.ipynb): DBSCAN proposals from the frozen
stage-1 detector become independent point clusters; each cluster's points
are translated to the cluster mean and rotated into its covariance
eigenbasis, featurised as [x', y', r, θ, rcs]
(datagen_classifier.py:75-94), connected all-to-all within the cluster
(block-diagonal adjacency, :102-112), run through a norm-free residual
message-passing stack (messages MLP([x_i ‖ x_j]), no edge features;
classifier/blocks.py:28-80), max-pooled per cluster BEFORE the head stem
(classifier/blocks.py:170-176 — note the reversed pool/stem order vs the
stage-1 object head), and classified with focal loss (α=−1, γ=2;
classifier/loss.py:5-15).

Static-shape representation: a frame's proposals are flattened into one
padded point array with a per-point object segment id; intra-cluster
edges are enumerated into fixed-capacity sender/receiver arrays.
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import segment as S
from ..train.loss import sigmoid_focal_loss
from .blocks import FFNBlock, Linear, MLPStack, ScalarNorm, TaskSpecificHead


@dataclasses.dataclass
class ClassifierConfig:
    """configuration_radarscenes_classifier.yml defaults."""

    clustering_eps: float = 1.4
    valid_cluster_num_meas_thr: int = 2
    meas_noise_var: float = 1.0
    activation: str = "leakyrelu"
    aggregation: str = "add"  # yml 'sum' == torch_geometric 'add'
    node_feat_enc_stem_channels: Sequence[int] = (256, 128, 128)
    graph_convolution_stem_channels: Sequence[int] = (128,) * 5
    msg_mlp_hidden_dim: int = 128
    node_pred_stem_channels: Sequence[int] = (128, 128, 128)
    input_node_feat_dim: int = 5
    num_classes: int = 7
    learning_rate: float = 0.001
    weight_decay: float = 1e-4
    momentum: float = 0.9
    max_train_iter: int = 100_000
    # static capacities
    max_points: int = 512
    max_objects: int = 64
    max_edges: int = 8192


class ClassifierSample(NamedTuple):
    """One frame's proposals, flattened + padded."""

    point_feat: jnp.ndarray   # [P, 5]
    point_mask: jnp.ndarray   # [P] bool
    point2object: jnp.ndarray  # [P] int32 (void = max_objects)
    senders: jnp.ndarray      # [E] int32
    receivers: jnp.ndarray    # [E] int32
    edge_mask: jnp.ndarray    # [E] bool
    object_class: jnp.ndarray  # [O] int32 (GT majority labels)
    object_mask: jnp.ndarray  # [O] bool


def normalize_cluster_points(xy: np.ndarray, noise_var: float):
    """Shift to the sample mean and rotate into the covariance eigenbasis
    (datagen_classifier.py:44-48 via np.linalg.eig)."""
    mu = xy.mean(axis=0)
    if xy.shape[0] > 1:
        err = (mu - xy)[:, :, None]
        sigma = (err @ err.transpose(0, 2, 1)).sum(0) / (xy.shape[0] - 1)
        sigma = sigma + noise_var * np.eye(2)
    else:
        sigma = noise_var * np.eye(2)
    _, evecs = np.linalg.eigh(sigma)
    return (xy - mu) @ evecs, mu, sigma


def build_classifier_sample(
    xy: np.ndarray,
    rcs: np.ndarray,
    node_gt_class: np.ndarray,
    node2cluster: np.ndarray,
    num_clusters: int,
    ccfg: ClassifierConfig,
) -> Optional[ClassifierSample]:
    """Flatten a frame's clusters into a padded ClassifierSample.

    Clusters below valid_cluster_num_meas_thr points are dropped
    (yml CLUSTERING).  GT label per cluster = majority vote of member GT
    classes (datagen_classifier.py:52-60)."""
    P, O, E = ccfg.max_points, ccfg.max_objects, ccfg.max_edges
    feats, p2o, senders, receivers, obj_cls = [], [], [], [], []
    offset = 0
    obj_idx = 0
    for c in range(num_clusters):
        members = np.flatnonzero(node2cluster == c)
        m = members.shape[0]
        if m < ccfg.valid_cluster_num_meas_thr:
            continue
        if offset + m > P or obj_idx >= O:
            break
        pts, _, _ = normalize_cluster_points(
            xy[members], ccfg.meas_noise_var
        )
        r = np.sqrt(pts[:, 0] ** 2 + pts[:, 1] ** 2)
        th = np.arctan2(pts[:, 1], pts[:, 0])
        feats.append(
            np.stack([pts[:, 0], pts[:, 1], r, th, rcs[members]], axis=-1)
        )
        p2o.append(np.full(m, obj_idx, dtype=np.int32))
        # fully connected intra-cluster, no self loops
        ii, jj = np.meshgrid(np.arange(m), np.arange(m), indexing="ij")
        keep = ii != jj
        senders.append((ii[keep] + offset).astype(np.int32))
        receivers.append((jj[keep] + offset).astype(np.int32))
        labels, counts = np.unique(
            node_gt_class[members], return_counts=True
        )
        obj_cls.append(int(labels[np.argmax(counts)]))
        offset += m
        obj_idx += 1

    if not feats:
        return None

    feat = np.concatenate(feats, axis=0).astype(np.float32)
    p2o = np.concatenate(p2o)
    s = np.concatenate(senders)[:E]
    r = np.concatenate(receivers)[:E]

    def pad(x, size, fill=0):
        out = np.full((size,) + x.shape[1:], fill, dtype=x.dtype)
        out[: x.shape[0]] = x[:size]
        return out

    n_pts, n_edges, n_obj = feat.shape[0], s.shape[0], obj_idx
    return ClassifierSample(
        point_feat=pad(feat, P),
        point_mask=np.arange(P) < n_pts,
        point2object=pad(p2o, P, fill=O),
        senders=pad(s, E),
        receivers=pad(r, E),
        edge_mask=np.arange(E) < n_edges,
        object_class=pad(np.asarray(obj_cls, np.int32), O),
        object_mask=np.arange(O) < n_obj,
    )


class NormFreeConvBlock(nn.Module):
    """classifier/blocks.py:28-80: residual block, messages from endpoint
    features only, no normalisation anywhere."""

    msg_channels: Sequence[int]
    upd_channels: Sequence[int]
    activation: str

    @nn.compact
    def __call__(self, x, senders, receivers, point_mask, edge_mask):
        n = x.shape[0]
        in_dim, out_dim = x.shape[-1], self.upd_channels[-1]
        if in_dim != out_dim:
            identity = Linear(out_dim)(x)
            identity = ScalarNorm("channel_normalization")(identity)
        else:
            identity = x
        m = jnp.concatenate(
            [S.gather_nodes(x, receivers), S.gather_nodes(x, senders)],
            axis=-1,
        )
        m = MLPStack(self.msg_channels, self.activation, None)(m)
        agg = S.masked_segment_sum(m, receivers, n, edge_mask)
        upd = MLPStack(self.upd_channels, self.activation, None)(
            jnp.concatenate([x, agg], axis=-1)
        )
        return identity + upd


class ObjectClassifierGNN(nn.Module):
    """classifier/classifier.py Model_Inference."""

    ccfg: ClassifierConfig

    @nn.compact
    def __call__(self, sample: ClassifierSample):
        c = self.ccfg
        x = MLPStack(
            c.node_feat_enc_stem_channels, c.activation, None,
            name="encode_node_feat",
        )(sample.point_feat)
        for i, ch in enumerate(c.graph_convolution_stem_channels):
            x = NormFreeConvBlock(
                [c.msg_mlp_hidden_dim, ch], [ch], c.activation,
                name=f"conv_{i}",
            )(x, sample.senders, sample.receivers, sample.point_mask,
              sample.edge_mask)
        # max-pool per object BEFORE the stem (classifier/blocks.py:170-176)
        pooled = S.masked_segment_max(
            x, sample.point2object, c.max_objects, sample.point_mask
        )
        pooled = MLPStack(
            c.node_pred_stem_channels, c.activation, None, name="stem",
        )(pooled)
        return TaskSpecificHead(
            c.num_classes, c.activation, None, init_bias=-np.log(99.0),
            name="pred_cls",
        )(pooled)


def classifier_loss(logits, sample: ClassifierSample, num_classes: int):
    """Focal(α=−1) summed over classes, mean over valid objects
    (classifier/loss.py:5-15)."""
    onehot = jax.nn.one_hot(sample.object_class, num_classes)
    per_obj = jnp.sum(
        sigmoid_focal_loss(logits, onehot, alpha=-1.0), axis=-1
    )
    mask = sample.object_mask.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(mask), 1.0)
    loss = jnp.sum(per_obj * mask) / cnt
    acc = jnp.sum(
        (jnp.argmax(logits, -1) == sample.object_class) * mask
    ) / cnt
    return loss, acc


def make_classifier_train_step(ccfg: ClassifierConfig):
    import optax

    from ..train.steps import TrainState, all_finite, apply_if

    model = ObjectClassifierGNN(ccfg)
    tx = optax.chain(
        optax.add_decayed_weights(ccfg.weight_decay),
        optax.sgd(ccfg.learning_rate, momentum=ccfg.momentum),
    )

    def init(rng, sample: ClassifierSample):
        params = model.init(rng, jax.tree.map(jnp.asarray, sample))["params"]
        return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    def loss_fn(params, batch):
        # batch: ClassifierSample with leading axis B
        logits = jax.vmap(
            lambda s: model.apply({"params": params}, s)
        )(batch)
        losses, accs = jax.vmap(
            lambda lg, s: classifier_loss(lg, s, ccfg.num_classes)
        )(logits, batch)
        return jnp.mean(losses), jnp.mean(accs)

    @jax.jit
    def step(state: TrainState, batch):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        ok = all_finite(grads) & jnp.isfinite(loss)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params, opt_state = apply_if(
            ok, (params, opt_state), (state.params, state.opt_state)
        )
        metrics = {
            "loss_obj_cls": loss,
            "object_accuracy": acc,
            "skipped": (~ok).astype(jnp.float32),
        }
        return TrainState(params, opt_state, state.step + 1), metrics

    return model, init, step, loss_fn
