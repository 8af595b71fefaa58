"""The integrated multi-task radar GNN (TPU-native Model_Inference).

Re-designs modules/neural_net/gnn/gnn_detector.py:31-201 over static-shape
masked graphs: encoders → message-passing stack → four task heads.

Two entry points, sharing parameters:

* ``__call__`` — training path: cluster membership is ground truth
  (reference ``cluster_node_idx`` lists become a per-node segment id).
* ``deploy`` — deployment path: decodes predicted cluster centers,
  runs DBSCAN **on device** (infer/clustering.py replaces the reference's
  CPU round trip at gnn_detector.py:164-187), and feeds the resulting
  clusters to the object head.

The module operates on ONE graph; batches are handled by ``jax.vmap``
outside (train/steps.py) so per-graph norm statistics match the reference's
per-graph forward loop (gnn_detector.py:443-452).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.config import GNNConfig
from ..core.graph import RadarGraph
from ..infer.clustering import dbscan_on_device
from .blocks import (
    GraphConvolution,
    GraphFeatureEncoding,
    LinkPredictions,
    NodeOffsetPredictions,
    NodePredictions,
    NodeSegmentation,
    ObjectClassification,
)


class GNNOutputs(NamedTuple):
    node_cls: jnp.ndarray      # [N, num_classes]
    node_offsets: jnp.ndarray  # [N, 2] (normalised units)
    edge_cls: jnp.ndarray      # [Eu, num_edge_classes]
    obj_cls: jnp.ndarray       # [C, num_classes]
    node_embed: jnp.ndarray    # [N, D] final node embeddings


class DeployOutputs(NamedTuple):
    node_cls: jnp.ndarray
    node_offsets: jnp.ndarray
    edge_cls: jnp.ndarray
    obj_cls: jnp.ndarray       # [N, num_classes] — one slot per possible cluster
    centers: jnp.ndarray       # [N, 2] decoded cluster centers
    node2cluster: jnp.ndarray  # [N] int32 (DBSCAN result; void = N)
    num_clusters: jnp.ndarray  # int32 scalar


def decode_cluster_centers(
    node_offsets: jnp.ndarray, other_feat: jnp.ndarray, cfg: GNNConfig
) -> jnp.ndarray:
    """Predicted centers = measurement xy + unnormalised offsets
    (gnn_detector.py:166-168)."""
    sigma = jnp.asarray(cfg.reg_sigma, dtype=node_offsets.dtype)
    mu = jnp.asarray(cfg.reg_mu, dtype=node_offsets.dtype)
    return other_feat[..., :2] + node_offsets * sigma + mu


class RadarGNN(nn.Module):
    """Four-task message-passing GNN (flagship model)."""

    cfg: GNNConfig

    def _make_neck(self):
        """Message-passing neck factory; v2 overrides with the GAT neck."""
        cfg = self.cfg
        return GraphConvolution(
            cfg.graph_convolution_stem_channels, cfg.msg_mlp_hidden_dim,
            cfg.aggregation, cfg.activation, cfg.norm_layer, cfg.num_groups,
            graph_axis=cfg.graph_axis,
        )

    def _setup_trunk_and_shared_heads(self):
        cfg = self.cfg
        self.encode_node_feat = GraphFeatureEncoding(
            cfg.node_feat_enc_stem_channels, cfg.activation, cfg.norm_layer,
            cfg.num_groups,
        )
        self.encode_edge_feat = GraphFeatureEncoding(
            cfg.edge_feat_enc_stem_channels, cfg.activation, cfg.norm_layer,
            cfg.num_groups,
        )
        self.pass_messages = self._make_neck()
        self.predict_link = LinkPredictions(
            cfg.num_blocks_to_compute_edge, cfg.link_pred_stem_channels,
            cfg.num_edge_classes, cfg.activation, cfg.norm_layer,
            cfg.num_groups,
        )
        self.predict_class = ObjectClassification(
            cfg.node_pred_stem_channels, cfg.num_classes, cfg.activation,
            cfg.norm_layer, cfg.num_groups,
        )

    def setup(self):
        cfg = self.cfg
        self._setup_trunk_and_shared_heads()
        self.predict_node = NodeSegmentation(
            cfg.node_pred_stem_channels, cfg.num_classes, cfg.activation,
            cfg.norm_layer, cfg.num_groups,
        )
        self.predict_offset = NodeOffsetPredictions(
            cfg.node_pred_stem_channels, cfg.reg_offset_dim, cfg.activation,
            cfg.norm_layer, cfg.num_groups,
        )

    def trunk(self, graph: RadarGraph, extra_features=None):
        """Encoders + message passing → final node embeddings + link/node
        head inputs (gnn_detector.py:151-156)."""
        nm, em = graph.node_mask, graph.edge_mask
        x = self.encode_node_feat(graph.node_feat, nm)
        e = self.encode_edge_feat(graph.edge_feat, em)
        x = self.pass_messages(
            x, e, graph.senders, graph.receivers, nm, em, extra_features
        )
        return x

    def _node_heads(self, x, nm):
        """(node_cls, node_off) — variants override this so ``deploy``
        works for every model family (v1 routes through the fused head)."""
        return self.predict_node(x, nm), self.predict_offset(x, nm)

    def __call__(
        self,
        graph: RadarGraph,
        node2cluster: jnp.ndarray,
        num_clusters: int,
        cluster_mask: jnp.ndarray,
        extra_features: Optional[jnp.ndarray] = None,
    ) -> GNNOutputs:
        nm = graph.node_mask
        x = self.trunk(graph, extra_features)
        node_cls = self.predict_node(x, nm)
        node_off = self.predict_offset(x, nm)
        edge_cls = self.predict_link(
            x, graph.und_senders, graph.und_receivers, nm, graph.und_mask
        )
        obj_cls = self.predict_class(
            x, node2cluster, num_clusters, nm, cluster_mask
        )
        return GNNOutputs(node_cls, node_off, edge_cls, obj_cls, x)

    def deploy(
        self,
        graph: RadarGraph,
        eps: float = 1.4,
        from_links: bool = False,
        extra_features: Optional[jnp.ndarray] = None,
    ) -> DeployOutputs:
        """Deployment forward with on-device DBSCAN proposals
        (gnn_detector.py:141-195, extract_proposals path; default eps=1.4
        per Model_Inference.__init__)."""
        nm = graph.node_mask
        n = graph.num_nodes
        x = self.trunk(graph, extra_features)
        node_cls, node_off = self._node_heads(x, nm)
        edge_cls = self.predict_link(
            x, graph.und_senders, graph.und_receivers, nm, graph.und_mask
        )
        centers = decode_cluster_centers(
            jnp.where(nm[:, None], node_off, 0.0), graph.other_feat, self.cfg
        )
        # stop_gradient mirrors the reference's clone().detach()
        # (gnn_detector.py:166).
        centers_sg = jax.lax.stop_gradient(
            jnp.where(nm[:, None], centers, 0.0)
        )
        if from_links:
            pred_edges = jnp.argmax(edge_cls, axis=-1)
            node2cluster, num_clusters = dbscan_on_device(
                centers_sg, nm, eps, from_links=True,
                und_senders=graph.und_senders,
                und_receivers=graph.und_receivers,
                und_mask=graph.und_mask,
                pred_edges=jax.lax.stop_gradient(pred_edges),
            )
        else:
            node2cluster, num_clusters = dbscan_on_device(
                centers_sg, nm, eps
            )
        cluster_mask = jnp.arange(n, dtype=jnp.int32) < num_clusters
        obj_cls = self.predict_class(x, node2cluster, n, nm, cluster_mask)
        return DeployOutputs(
            node_cls=node_cls,
            node_offsets=node_off,
            edge_cls=edge_cls,
            obj_cls=obj_cls,
            centers=centers,
            node2cluster=node2cluster,
            num_clusters=num_clusters,
        )


class RadarGNNv1(RadarGNN):
    """Model_Inference_v1 (gnn_detector.py:204-313): identical trunk and
    link/object heads, but node class + offset share one stem through the
    fused ``NodePredictions`` head (gnn_blocks.py:392-439).

    ``deploy`` (inherited) routes through the fused head via
    ``_node_heads`` — the reference's Model_Inference_v1 has no
    extract_proposals branch (gnn_detector.py:291-313), so this is a
    capability extension, not a port."""

    def setup(self):
        cfg = self.cfg
        self._setup_trunk_and_shared_heads()
        self.predict_node_fused = NodePredictions(
            cfg.node_pred_stem_channels, cfg.num_classes,
            cfg.reg_offset_dim, cfg.activation, cfg.norm_layer,
            cfg.num_groups,
        )

    def _node_heads(self, x, nm):
        return self.predict_node_fused(x, nm)

    def __call__(
        self,
        graph: RadarGraph,
        node2cluster: jnp.ndarray,
        num_clusters: int,
        cluster_mask: jnp.ndarray,
        extra_features: Optional[jnp.ndarray] = None,
    ) -> GNNOutputs:
        nm = graph.node_mask
        x = self.trunk(graph, extra_features)
        node_cls, node_off = self._node_heads(x, nm)
        edge_cls = self.predict_link(
            x, graph.und_senders, graph.und_receivers, nm, graph.und_mask
        )
        obj_cls = self.predict_class(
            x, node2cluster, num_clusters, nm, cluster_mask
        )
        return GNNOutputs(node_cls, node_off, edge_cls, obj_cls, x)
