"""GATv2 attention neck and the v2 model variant.

TPU-native re-design of the reference's dormant attention branch
(modules/neural_net/gnn/gnn_attention.py:13-123, "NOTE: not used" but kept
as a selectable capability, reference gnn_detector.py:316-416
Model_Inference_v2): GATv2Conv-equivalent attention implemented directly
with gathers + segment softmax (ops/segment.py) instead of
torch_geometric's CUDA kernels.

GATv2 semantics reproduced (torch_geometric GATv2Conv with concat=True,
negative_slope=0.2, add_self_loops=False, share_weights=False, edge_dim):
  s = LeakyReLU(W_l·x_src + W_r·x_dst + W_e·e, 0.2)
  α = softmax_over_incoming(a · s);  out_dst = Σ α · (W_l·x_src)
heads concatenated, bias added.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.config import GNNConfig
from ..core.graph import RadarGraph
from ..ops import segment as S
from .blocks import FFNBlock, Linear, ScalarNorm, activation_fn
from .gnn import RadarGNN


class GATv2Conv(nn.Module):
    """Multi-head GATv2 edge-conditioned attention convolution."""

    out_channels: int  # per-head width
    num_heads: int
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x, edge_feat, senders, receivers, node_mask, edge_mask):
        h, c = self.num_heads, self.out_channels
        n = x.shape[0]
        x_l = Linear(h * c, name="lin_l")(x).reshape(n, h, c)  # source
        x_r = Linear(h * c, name="lin_r")(x).reshape(n, h, c)  # target
        e = Linear(h * c, name="lin_edge")(edge_feat).reshape(-1, h, c)

        xs = S.gather_nodes(x_l.reshape(n, h * c), senders).reshape(-1, h, c)
        xr = S.gather_nodes(x_r.reshape(n, h * c), receivers).reshape(-1, h, c)
        s = xs + xr + e  # [E, H, C]
        s = jax.nn.leaky_relu(s, negative_slope=self.negative_slope)
        att = self.param(
            "att", nn.initializers.glorot_uniform(), (1, h, c)
        )
        logits = jnp.sum(s * att, axis=-1)  # [E, H]
        alpha = S.segment_softmax(
            logits, receivers, n, edge_mask
        )  # [E, H] normalised over incoming edges per head
        msg = xs * alpha[..., None]  # [E, H, C]
        out = S.masked_segment_sum(
            msg.reshape(-1, h * c), receivers, n, edge_mask
        )
        bias = self.param("bias", nn.initializers.zeros, (h * c,))
        return out + bias


class ResidualGraphAttnBlock(nn.Module):
    """gnn_attention.py:13-76: GATv2 aggregation + residual update MLP
    (update FFN blocks carry no norm; the projector uses
    layer_normalization)."""

    hidden_node_channels: int
    num_heads: int
    mlp_stem_channels_upd: Sequence[int]
    activation: str

    @nn.compact
    def __call__(self, x, edge_feat, senders, receivers, node_mask, edge_mask,
                 extra_features=None):
        in_dim = x.shape[-1]
        out_dim = self.mlp_stem_channels_upd[-1]
        if in_dim != out_dim:
            identity = Linear(out_dim)(x)
            identity = ScalarNorm("layer_normalization")(identity, node_mask)
        else:
            identity = x

        agg = GATv2Conv(
            out_channels=self.hidden_node_channels // self.num_heads,
            num_heads=self.num_heads,
        )(x, edge_feat, senders, receivers, node_mask, edge_mask)

        if extra_features is not None:
            upd_in = jnp.concatenate([x, extra_features, agg], axis=-1)
        else:
            upd_in = jnp.concatenate([x, agg], axis=-1)
        out = upd_in
        for ch in self.mlp_stem_channels_upd:
            out = FFNBlock(ch, self.activation, norm_layer=None)(out)
        return identity + out


class GraphAttention(nn.Module):
    """gnn_attention.py:79-123."""

    stem_channels: Sequence[int]
    hidden_node_channels: int
    num_heads: int
    activation: str

    @nn.compact
    def __call__(self, x, edge_feat, senders, receivers, node_mask, edge_mask,
                 extra_features=None):
        hid = self.hidden_node_channels
        for ch in self.stem_channels:
            x = ResidualGraphAttnBlock(
                hidden_node_channels=hid,
                num_heads=self.num_heads,
                mlp_stem_channels_upd=[hid // 2, hid // 4, ch],
                activation=self.activation,
            )(x, edge_feat, senders, receivers, node_mask, edge_mask,
              extra_features)
        return x


class RadarGNNv2(RadarGNN):
    """Model_Inference_v2 (gnn_detector.py:316-416): same encoders/heads as
    the flagship but a GATv2 neck.  Subclasses the flagship with the neck
    factory overridden, so ``deploy`` (on-device DBSCAN proposals) works
    here too — a capability extension; the reference's v2 has no
    extract_proposals branch."""

    def _make_neck(self):
        cfg = self.cfg
        # Same call signature and submodule name as the residual-conv neck
        # → same param-tree slot ("pass_messages").
        return GraphAttention(
            cfg.graph_convolution_stem_channels,
            cfg.hidden_node_channels_gat, cfg.num_heads_gat, cfg.activation,
        )
