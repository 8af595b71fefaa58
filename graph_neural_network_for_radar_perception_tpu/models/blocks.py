"""Flax building blocks for the radar GNN.

Re-designs modules/neural_net/common.py + gnn/gnn_blocks.py as pure
functional flax modules over static-shape masked graphs.  Parity notes:

* Linear init matches torch.nn.Linear (kaiming_uniform(a=√5) ⇒
  U(±1/√fan_in) for both weight and bias).
* Task heads use N(0, 0.01) weights and bias −log(99) for classification /
  0 for regression (modules/neural_net/constants.py:15-26 — the reference
  comments that without the negative bias "training can diverge").
* The three custom norms carry a single scalar (γ, β) pair each
  (common.py:208-253) and receive the node mask where their statistics
  couple across rows.
* Message passing: m_e = MLP([x_recv ‖ x_send ‖ e]) aggregated by
  segment-sum at the receiver (torch_geometric MessagePassing with
  aggr='add', flow="source_to_target"; gnn_blocks.py:45-113), then
  x ← identity + MLP([x ‖ agg]) with a Linear+norm projector when widths
  differ (gnn_blocks.py:84-94).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import norms as N
from ..ops import segment as S

LEAKY_SLOPE = 0.01  # constants.py:10
HEAD_STD = 0.01  # constants.py:16
CLS_BIAS = -math.log(99.0)  # constants.py:22


def activation_fn(name: str) -> Callable:
    """common.py:256-267."""
    if name == "relu":
        return jax.nn.relu
    if name == "leakyrelu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=LEAKY_SLOPE)
    if name == "swish":
        return jax.nn.silu
    return jax.nn.relu


def _torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    # flax kernel shape is (in, out); torch bound = 1/sqrt(fan_in)
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_linear_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Linear(nn.Module):
    """nn.Linear with torch-default initialisation."""

    features: int

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        return nn.Dense(
            self.features,
            kernel_init=_torch_linear_kernel_init,
            bias_init=_torch_linear_bias_init(in_features),
        )(x)


class ScalarNorm(nn.Module):
    """One of the reference's three norms, selected by name, with scalar
    affine parameters.  `mask` (rows of x) only affects layer/group norms,
    whose statistics couple across rows."""

    norm_layer: str
    num_groups: Optional[int] = None

    @nn.compact
    def __call__(self, x, mask=None):
        gamma = self.param("gamma", nn.initializers.ones, (1,))
        beta = self.param("beta", nn.initializers.zeros, (1,))
        if self.norm_layer == "channel_normalization":
            return N.channel_norm(x, gamma, beta)
        if self.norm_layer == "layer_normalization":
            return N.layer_norm(x, gamma, beta, mask)
        if self.norm_layer == "group_normalization":
            return N.group_norm(x, gamma, beta, self.num_groups, mask)
        raise ValueError(f"unknown norm_layer {self.norm_layer!r}")


class FFNBlock(nn.Module):
    """Linear → [norm] → activation (common.py:185-205)."""

    features: int
    activation: str
    norm_layer: Optional[str] = None
    num_groups: Optional[int] = None

    @nn.compact
    def __call__(self, x, mask=None):
        x = Linear(self.features)(x)
        if self.norm_layer is not None:
            x = ScalarNorm(self.norm_layer, self.num_groups)(x, mask)
        return activation_fn(self.activation)(x)


class MLPStack(nn.Module):
    """Sequence of FFNBlocks; `first_unnormalized` mirrors the encoders'
    convention that block 0 skips the norm (gnn_blocks.py:29-38)."""

    stem_channels: Sequence[int]
    activation: str
    norm_layer: Optional[str]
    num_groups: Optional[int] = None
    first_unnormalized: bool = False

    @nn.compact
    def __call__(self, x, mask=None):
        for i, ch in enumerate(self.stem_channels):
            norm = (
                None
                if (i == 0 and self.first_unnormalized)
                else self.norm_layer
            )
            x = FFNBlock(ch, self.activation, norm, self.num_groups)(x, mask)
        return x


class GraphFeatureEncoding(nn.Module):
    """Node/edge feature encoder (gnn_blocks.py:19-42)."""

    stem_channels: Sequence[int]
    activation: str
    norm_layer: str
    num_groups: Optional[int] = None

    @nn.compact
    def __call__(self, x, mask=None):
        return MLPStack(
            self.stem_channels, self.activation, self.norm_layer,
            self.num_groups, first_unnormalized=True,
        )(x, mask)


class ResidualGraphConvBlock(nn.Module):
    """One edge-conditioned residual message-passing round
    (gnn_blocks.py:45-113).

    When `graph_axis` is set (inside shard_map over a mesh axis), the edge
    arrays are assumed to be sharded along E across that axis: messages and
    the local segment reduction run on the local edge shard, and a single
    psum over the axis combines partial node aggregates — the
    edge-partitioned execution of SURVEY.md §5 (boundary-node exchange as an
    XLA collective over ICI)."""

    mlp_stem_channels_msg: Sequence[int]
    mlp_stem_channels_upd: Sequence[int]
    aggregation: str
    activation: str
    norm_layer: str
    num_groups: Optional[int] = None
    graph_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        node_feat,      # [N, D]
        edge_feat,      # [E, De]
        senders,        # [E]
        receivers,      # [E]
        node_mask,      # [N]
        edge_mask,      # [E]
        extra_features=None,
    ):
        num_nodes = node_feat.shape[0]
        in_dim = node_feat.shape[-1]
        out_dim = self.mlp_stem_channels_upd[-1]

        if in_dim != out_dim:  # gnn_blocks.py:84-94
            identity = Linear(out_dim)(node_feat)
            identity = ScalarNorm(self.norm_layer, self.num_groups)(
                identity, node_mask
            )
        else:
            identity = node_feat

        # message: MLP([x_i ‖ x_j ‖ e]) where i=receiver, j=sender
        # (torch_geometric message(x_i, x_j, edge_attr), gnn_blocks.py:112)
        x_i = S.gather_nodes(node_feat, receivers)
        x_j = S.gather_nodes(node_feat, senders)
        m = jnp.concatenate([x_i, x_j, edge_feat], axis=-1)
        m = MLPStack(
            self.mlp_stem_channels_msg, self.activation, self.norm_layer,
            self.num_groups,
        )(m, edge_mask)

        if self.aggregation == "add":
            agg = S.masked_segment_sum(m, receivers, num_nodes, edge_mask)
            if self.graph_axis is not None:
                agg = jax.lax.psum(agg, self.graph_axis)
        elif self.aggregation == "max":
            agg = S.masked_segment_max(m, receivers, num_nodes, edge_mask)
            if self.graph_axis is not None:
                agg = jax.lax.pmax(agg, self.graph_axis)
        elif self.aggregation == "mean":
            if self.graph_axis is not None:
                total = jax.lax.psum(
                    S.masked_segment_sum(m, receivers, num_nodes, edge_mask),
                    self.graph_axis,
                )
                cnt = jax.lax.psum(
                    S.segment_count(receivers, num_nodes, edge_mask),
                    self.graph_axis,
                )
                agg = total / jnp.maximum(cnt[:, None], 1.0)
            else:
                agg = S.masked_segment_mean(m, receivers, num_nodes, edge_mask)
        else:
            raise ValueError(f"unknown aggregation {self.aggregation!r}")

        if extra_features is not None:  # gnn_blocks.py:107
            upd_in = jnp.concatenate([node_feat, extra_features, agg], -1)
        else:
            upd_in = jnp.concatenate([node_feat, agg], axis=-1)
        upd = MLPStack(
            self.mlp_stem_channels_upd, self.activation, self.norm_layer,
            self.num_groups,
        )(upd_in, node_mask)
        return identity + upd


class GraphConvolution(nn.Module):
    """Stack of residual conv blocks (gnn_blocks.py:116-164)."""

    stem_channels: Sequence[int]
    msg_mlp_hidden_dim: int
    aggregation: str
    activation: str
    norm_layer: str
    num_groups: Optional[int] = None
    graph_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self, node_feat, edge_feat, senders, receivers, node_mask, edge_mask,
        extra_features=None,
    ):
        x = node_feat
        for ch in self.stem_channels:
            x = ResidualGraphConvBlock(
                mlp_stem_channels_msg=[self.msg_mlp_hidden_dim, ch],
                mlp_stem_channels_upd=[ch],
                aggregation=self.aggregation,
                activation=self.activation,
                norm_layer=self.norm_layer,
                num_groups=self.num_groups,
                graph_axis=self.graph_axis,
            )(x, edge_feat, senders, receivers, node_mask, edge_mask,
              extra_features)
        return x


class TaskSpecificHead(nn.Module):
    """FFN block + specially-initialised Linear (gnn_blocks.py:167-197)."""

    out_channels: int
    activation: str
    norm_layer: str
    num_groups: Optional[int] = None
    init_bias: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None):
        x = FFNBlock(
            x.shape[-1], self.activation, self.norm_layer, self.num_groups
        )(x, mask)
        return nn.Dense(
            self.out_channels,
            kernel_init=nn.initializers.normal(stddev=HEAD_STD),
            bias_init=nn.initializers.constant(self.init_bias),
        )(x)


class NodeSegmentation(nn.Module):
    """Per-node class logits (gnn_blocks.py:200-234)."""

    stem_channels: Sequence[int]
    num_classes: int
    activation: str
    norm_layer: str
    num_groups: Optional[int] = None

    @nn.compact
    def __call__(self, x, mask=None):
        x = MLPStack(
            self.stem_channels, self.activation, self.norm_layer,
            self.num_groups,
        )(x, mask)
        return TaskSpecificHead(
            self.num_classes, self.activation, self.norm_layer,
            self.num_groups, init_bias=CLS_BIAS,
        )(x, mask)


class NodeOffsetPredictions(nn.Module):
    """Per-node (dx, dy) regression (gnn_blocks.py:237-271)."""

    stem_channels: Sequence[int]
    reg_offset_dim: int
    activation: str
    norm_layer: str
    num_groups: Optional[int] = None

    @nn.compact
    def __call__(self, x, mask=None):
        x = MLPStack(
            self.stem_channels, self.activation, self.norm_layer,
            self.num_groups,
        )(x, mask)
        return TaskSpecificHead(
            self.reg_offset_dim, self.activation, self.norm_layer,
            self.num_groups, init_bias=0.0,
        )(x, mask)


class LinkPredictions(nn.Module):
    """Undirected-edge class logits (gnn_blocks.py:274-344).

    The reference extracts unique edges via torch.nonzero(torch.triu(adj));
    here the canonical undirected edge list arrives precomputed in that same
    row-major triu order (core/graph.py)."""

    num_blks_for_edges: int
    stem_channels: Sequence[int]
    num_classes: int
    activation: str
    norm_layer: str
    num_groups: Optional[int] = None

    @nn.compact
    def __call__(self, x, und_senders, und_receivers, node_mask, und_mask):
        for _ in range(self.num_blks_for_edges):  # edge_formation stem
            x = FFNBlock(
                x.shape[-1], self.activation, self.norm_layer,
                self.num_groups,
            )(x, node_mask)
        e = S.gather_nodes(x, und_senders) + S.gather_nodes(x, und_receivers)
        e = MLPStack(
            self.stem_channels, self.activation, self.norm_layer,
            self.num_groups,
        )(e, und_mask)
        return TaskSpecificHead(
            self.num_classes, self.activation, self.norm_layer,
            self.num_groups, init_bias=CLS_BIAS,
        )(e, und_mask)


class ObjectClassification(nn.Module):
    """Per-cluster logits via masked segment-max pooling
    (gnn_blocks.py:347-389 — the reference's python loop over clusters
    becomes one segment_max)."""

    stem_channels: Sequence[int]
    num_classes: int
    activation: str
    norm_layer: str
    num_groups: Optional[int] = None

    @nn.compact
    def __call__(self, x, node2cluster, num_clusters, node_mask, cluster_mask):
        x = MLPStack(
            self.stem_channels, self.activation, self.norm_layer,
            self.num_groups,
        )(x, node_mask)
        pooled = S.masked_segment_max(
            x, node2cluster, num_clusters, node_mask
        )
        return TaskSpecificHead(
            self.num_classes, self.activation, self.norm_layer,
            self.num_groups, init_bias=CLS_BIAS,
        )(pooled, cluster_mask)


class NodePredictions(nn.Module):
    """Fused cls+reg node head used by Model_Inference_v1
    (gnn_blocks.py:392-439)."""

    stem_channels: Sequence[int]
    num_classes: int
    reg_offset_dim: int
    activation: str
    norm_layer: str
    num_groups: Optional[int] = None

    @nn.compact
    def __call__(self, x, mask=None):
        x = MLPStack(
            self.stem_channels, self.activation, self.norm_layer,
            self.num_groups,
        )(x, mask)
        cls = TaskSpecificHead(
            self.num_classes, self.activation, self.norm_layer,
            self.num_groups, init_bias=CLS_BIAS,
        )(x, mask)
        reg = TaskSpecificHead(
            self.reg_offset_dim, self.activation, self.norm_layer,
            self.num_groups, init_bias=0.0,
        )(x, mask)
        return cls, reg
