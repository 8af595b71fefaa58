"""Static-shape padded graph containers.

The reference represents a frame graph as ragged numpy/torch arrays plus a
dense boolean adjacency matrix, and a *batch* as a python list of such graphs
(reference: modules/data_generator/datagen_gnn.py:143-190).  That is hostile
to XLA: every frame would trigger a recompile and nothing can be fused.

Here a graph is a fixed-capacity, masked struct-of-arrays pytree:

* nodes padded to ``num_nodes`` capacity with ``node_mask``;
* the directed message-passing edge set padded to ``num_edges`` capacity
  (capacity 2*k*N for a symmetrised kNN graph) with ``edge_mask``;
* a canonical *undirected* (upper-triangular, row-major ``(src < dst)``
  lexicographic) edge view used by the link-prediction head — mirroring the
  ``torch.nonzero(torch.triu(adj))`` enumeration contract of the reference
  (modules/neural_net/gnn/gnn_blocks.py:292-298 and
  modules/compute_groundtruth/compute_edge_labels.py:18-19);
* cluster membership as a per-node segment id (``node2cluster``) instead of
  the reference's python list of index tensors
  (modules/data_generator/datagen_gnn.py:15-45).

Batches are stacks of these along a leading axis, so data parallelism is a
plain NamedSharding of axis 0 and the model is ``vmap``-ed.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp


def _pytree_dataclass(cls):
    """Register a frozen dataclass as a jax pytree (arrays only, no aux)."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return tuple(getattr(obj, name) for name in fields), None

    def unflatten(_, children):
        return cls(*children)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_pytree_dataclass
class RadarGraph:
    """One padded radar frame graph (or a stacked batch of them).

    Shapes below are for a single graph; a batch prepends a leading axis B.

    Attributes:
      node_feat:     [N, F_n] float32 — input node features
                     (vr, rcs, t_norm, degree/10, range_conf, azi_conf);
                     reference modules/compute_features/graph_features.py:117.
      edge_feat:     [E, F_e] float32 — directed edge features
                     (dx/10, dy/10, dl/10, dvx, dvy, dvl, dt);
                     reference graph_features.py:147.
      senders:       [E] int32 — source node index of each directed edge
                     (reference adj_list[0]).
      receivers:     [E] int32 — target node index; messages aggregate here
                     (torch_geometric flow="source_to_target",
                     reference gnn_blocks.py:57).
      node_mask:     [N] bool — True for real nodes.
      edge_mask:     [E] bool — True for real directed edges.
      und_senders:   [Eu] int32 — undirected (triu) edge source, src < dst.
      und_receivers: [Eu] int32 — undirected edge destination.
      und_mask:      [Eu] bool  — True for real undirected edges.
      other_feat:    [N, 4] float32 — (px, py, vx, vy) in the current vehicle
                     frame; used to decode predicted cluster centers
                     (reference gnn_detector.py:166-168).
    """

    node_feat: jax.Array
    edge_feat: jax.Array
    senders: jax.Array
    receivers: jax.Array
    node_mask: jax.Array
    edge_mask: jax.Array
    und_senders: jax.Array
    und_receivers: jax.Array
    und_mask: jax.Array
    other_feat: jax.Array

    @property
    def num_nodes(self) -> int:
        return self.node_feat.shape[-2]

    @property
    def num_edges(self) -> int:
        return self.senders.shape[-1]

    @property
    def num_und_edges(self) -> int:
        return self.und_senders.shape[-1]

    def n_valid_nodes(self) -> jax.Array:
        return jnp.sum(self.node_mask, axis=-1)

    def n_valid_edges(self) -> jax.Array:
        return jnp.sum(self.edge_mask, axis=-1)


@_pytree_dataclass
class GraphLabels:
    """Padded ground-truth labels aligned with a RadarGraph.

    Attributes:
      node_class:    [N] int32 — per-node class id in the 7-class dynamic
                     taxonomy (reference compute_node_labels.py:70-86).
      node_offsets:  [N, 2] float32 — un-normalised (dx, dy) to the node's
                     track-mean (reference compute_node_labels.py:50-67).
      edge_class:    [Eu] int32 — 1 iff both endpoints share a non-empty
                     track id, in undirected-edge order (reference
                     compute_edge_labels.py:7-20).
      node2cluster:  [N] int32 — ground-truth cluster slot of each node
                     (track clusters first, then singleton clutter clusters;
                     reference datagen_gnn.py:15-45).  Padded nodes map to an
                     out-of-range slot so segment ops drop them.
      cluster_class: [C] int32 — class id of each cluster slot.
      cluster_mask:  [C] bool — True for real clusters.
    """

    node_class: jax.Array
    node_offsets: jax.Array
    edge_class: jax.Array
    node2cluster: jax.Array
    cluster_class: jax.Array
    cluster_mask: jax.Array

    @property
    def num_clusters(self) -> int:
        return self.cluster_class.shape[-1]


@_pytree_dataclass
class GraphBatch:
    """A stacked batch: every leaf of graph/labels has leading axis B."""

    graph: RadarGraph
    labels: Optional[Any]

    @property
    def batch_size(self) -> int:
        return self.graph.node_feat.shape[0]


def pad_axis(x: jnp.ndarray, size: int, axis: int = 0, fill=0):
    """Pad `x` along `axis` up to `size` with `fill` (numpy or jnp)."""
    pad = size - x.shape[axis]
    if pad < 0:
        raise ValueError(f"cannot pad axis {axis} of {x.shape} to {size}")
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)
