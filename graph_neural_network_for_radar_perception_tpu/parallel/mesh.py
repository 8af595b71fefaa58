"""Device mesh construction.

The reference has no distributed execution at all (SURVEY.md §2: zero hits
for any collective).  The TPU-native scaling design is a 2-D logical mesh:

* ``data``  — data parallelism over stacked frame graphs (batch axis 0);
* ``graph`` — edge partitioning within each graph: edge arrays sharded
  along E, partial segment-sums combined with psum over ICI
  (models/blocks.py ResidualGraphConvBlock).

Within a slice both axes ride ICI; across hosts the ``data`` axis should
map to DCN (jax.distributed standard practice).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_graph: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_graph
    assert n_data * n_graph <= len(devices), (
        f"need {n_data}x{n_graph} devices, have {len(devices)}"
    )
    arr = np.asarray(devices[: n_data * n_graph]).reshape(n_data, n_graph)
    return Mesh(arr, axis_names=("data", "graph"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """GraphBatch leaves: batch axis over 'data', replicated over 'graph'."""
    return NamedSharding(mesh, P("data"))


def edge_sharded_batch_specs(batch_template):
    """PartitionSpecs for shard_map over ('data','graph'): batch axis 0 over
    'data'; edge-indexed arrays additionally sharded over 'graph' on axis 1.

    Returns a pytree of PartitionSpec matching a GraphBatch.
    """
    import dataclasses

    from ..core.graph import GraphBatch, GraphLabels, RadarGraph

    edge_fields_graph = {
        "edge_feat", "senders", "receivers", "edge_mask",
        "und_senders", "und_receivers", "und_mask",
    }
    edge_fields_labels = {"edge_class"}

    def spec_for(cls, edge_fields):
        return cls(**{
            f.name: (P("data", "graph") if f.name in edge_fields else P("data"))
            for f in dataclasses.fields(cls)
        })

    return GraphBatch(
        graph=spec_for(RadarGraph, edge_fields_graph),
        labels=spec_for(GraphLabels, edge_fields_labels),
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
