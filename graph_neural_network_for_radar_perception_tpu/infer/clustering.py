"""DBSCAN-style clustering of predicted cluster centers.

The reference runs a numpy BFS on the host inside the model forward,
forcing a device→CPU→device round trip per frame
(modules/inference/clustering.py:43-93 invoked from
gnn_detector.py:164-187).  The TPU-native version is an iterative min-label
propagation over the thresholded adjacency matrix — a fixed-shape
``lax.while_loop`` that converges in graph-diameter steps, entirely on
device — plus a host BFS twin kept for parity tests.

Cluster-id semantics match the reference exactly: the reference's BFS
assigns ids in scan order of the first unclustered node; min-label
propagation roots each component at its minimum member index, and ranking
roots by index reproduces that same ordering.

Reference quirk reproduced: ``compute_adjacency_mat_from_predicted_offsets``
compares the SQUARED distance against eps (clustering.py:31-40), while the
predicted-links variant compares the true L2 norm (clustering.py:8-23).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_BIG = jnp.iinfo(jnp.int32).max // 2


def adjacency_from_centers(
    centers: jax.Array, mask: jax.Array, eps: float
) -> jax.Array:
    """[N,2] predicted centers → boolean adjacency: d² <= eps (sic),
    diagonal cleared (clustering.py:31-40)."""
    diff = centers[:, None, :] - centers[None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    adj = d2 <= eps
    adj = adj & ~jnp.eye(centers.shape[0], dtype=bool)
    return adj & (mask[:, None] & mask[None, :])


def adjacency_from_links(
    und_senders: jax.Array,
    und_receivers: jax.Array,
    und_mask: jax.Array,
    pred_edges: jax.Array,  # [Eu] int — argmax of link logits
    centers: jax.Array,     # [N, 2]
    mask: jax.Array,
    eps: float,
) -> jax.Array:
    """Adjacency from predicted links, dropping edges whose endpoint
    distance >= eps (clustering.py:8-23; true L2 here, not squared)."""
    n = centers.shape[0]
    dist = jnp.sqrt(
        jnp.sum(
            (centers[und_senders] - centers[und_receivers]) ** 2, axis=-1
        )
    )
    keep = und_mask & (pred_edges == 1) & (dist < eps)
    adj = jnp.zeros((n, n), dtype=bool)
    adj = adj.at[und_senders, und_receivers].max(keep)
    adj = adj.at[und_receivers, und_senders].max(keep)
    return adj & (mask[:, None] & mask[None, :])


@jax.jit
def connected_components(adj: jax.Array, mask: jax.Array):
    """Min-label propagation + pointer jumping over a boolean adjacency.

    Each round hooks every node to the minimum label among its
    neighbours, then compresses by jumping through the label ("label of
    my label"), so the propagation radius doubles per round — a FIXED
    ⌈log2 N⌉+2 trip count instead of a data-dependent while_loop.  The
    static bound matters on remote runtimes where a dynamic loop
    condition costs a host round-trip per iteration (docs/PERF.md:
    deploy latency 89 ms → sub-ms after this change).

    Returns:
      node2cluster: [N] int32 — compacted cluster id per valid node
                    (ids ordered like the reference BFS); invalid nodes get
                    num-clusters-slot N (void).
      num_clusters: int32 scalar.
    """
    n = adj.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    labels = jnp.where(mask, idx, _BIG)

    rounds = int(np.ceil(np.log2(max(n, 2)))) + 2
    for _ in range(rounds):
        nbr = jnp.where(adj, labels[None, :], _BIG)
        labels = jnp.minimum(labels, jnp.min(nbr, axis=-1))
        # pointer jumping: labels only ever point at same-component
        # members with smaller index, so label-chasing is exact.
        labels = jnp.minimum(labels, labels[jnp.clip(labels, 0, n - 1)])
        labels = jnp.minimum(labels, labels[jnp.clip(labels, 0, n - 1)])

    is_root = mask & (labels == idx)
    rank = jnp.cumsum(is_root.astype(jnp.int32)) - 1  # id at each root index
    safe_labels = jnp.clip(labels, 0, n - 1)
    node2cluster = jnp.where(mask, rank[safe_labels], n).astype(jnp.int32)
    return node2cluster, jnp.sum(is_root.astype(jnp.int32))


@partial(jax.jit, static_argnames=("from_links",))
def dbscan_on_device(
    centers,
    mask,
    eps,
    *,
    from_links: bool = False,
    und_senders=None,
    und_receivers=None,
    und_mask=None,
    pred_edges=None,
):
    """Full Simple_DBSCAN.cluster_nodes equivalent on device."""
    if from_links:
        adj = adjacency_from_links(
            und_senders, und_receivers, und_mask, pred_edges, centers, mask,
            eps,
        )
    else:
        adj = adjacency_from_centers(centers, mask, eps)
    return connected_components(adj, mask)


# ---------------------------------------------------------------------------
# Host twin with reference BFS semantics (for parity tests / CPU pipelines).
# ---------------------------------------------------------------------------
def dbscan_host(centers_np: np.ndarray, eps: float) -> np.ndarray:
    """Scan-order BFS clustering (clustering.py:43-93 semantics).
    Returns meas_to_cluster_id [N] int."""
    n = centers_np.shape[0]
    diff = centers_np[:, None, :] - centers_np[None, :, :]
    adj = np.sum(diff * diff, axis=-1) <= eps
    np.fill_diagonal(adj, False)

    ids = np.full(n, -1, dtype=np.int64)
    next_id = 0
    for m in range(n):
        if ids[m] != -1:
            continue
        frontier = [m]
        ids[m] = next_id
        while frontier:
            i = frontier.pop()
            nbrs = np.flatnonzero(adj[i] & (ids == -1))
            ids[nbrs] = next_id
            frontier.extend(nbrs.tolist())
        next_id += 1
    return ids
