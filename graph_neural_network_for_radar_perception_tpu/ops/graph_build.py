"""On-device, static-shape graph construction (kNN + ball query).

TPU-native replacement for the reference's per-sample numpy graph builder
(modules/compute_features/graph_features.py:11-114): dense pairwise squared-L2
matrix, ball query for node degree, kNN (symmetrised) for the adjacency, and
edge-list extraction.  Everything here is jit-able with fixed shapes:

* nodes are padded to N capacity with a boolean mask;
* the directed edge list has fixed capacity E (>= 2*k*N suffices for a
  symmetrised kNN graph) and row-major (receiver-major? no — row-major over
  the [N, N] adjacency, identical to ``np.where``) ordering, so it matches
  the reference's ``adj_list`` element-for-element on the valid prefix;
* the undirected (triu) edge list has fixed capacity EU and matches the
  reference's ``torch.nonzero(torch.triu(adj))`` enumeration
  (gnn_blocks.py:295-296) used by the link head and edge labels.

Stream compaction (boolean matrix → index list) is a cumsum + scatter, which
XLA handles well; the [N, N] intermediates are tiny (N <= a few thousand).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

_INF = 3.4e38


class GraphStructure(NamedTuple):
    senders: jax.Array  # [E] int32
    receivers: jax.Array  # [E] int32
    edge_mask: jax.Array  # [E] bool
    und_senders: jax.Array  # [EU] int32
    und_receivers: jax.Array  # [EU] int32
    und_mask: jax.Array  # [EU] bool
    degree: jax.Array  # [N] float32 — ball-query degree (graph_features.py:78)


def pairwise_sq_dist(points: jax.Array, mask: jax.Array) -> jax.Array:
    """[N,2], [N] → [N,N] squared L2; invalid pairs get +inf."""
    diff = points[:, None, :] - points[None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    valid = mask[:, None] & mask[None, :]
    return jnp.where(valid, d2, _INF)


def compact_nonzero(flag: jax.Array, capacity: int):
    """Row-major stream compaction of a boolean [N, M] matrix.

    Returns (rows, cols, mask) of shape [capacity]; ordering matches
    ``np.where(flag)``.  Entries beyond the true count are masked and point
    at (0, 0).
    """
    n, m = flag.shape
    flat = flag.reshape(-1)
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
    total = pos[-1] + 1
    idx = jnp.where(flat, pos, capacity)
    out = (
        jnp.zeros((capacity + 1,), dtype=jnp.int32)
        .at[idx]
        .set(jnp.arange(n * m, dtype=jnp.int32), mode="drop")[:capacity]
    )
    emask = jnp.arange(capacity, dtype=jnp.int32) < total
    rows = jnp.where(emask, out // m, 0)
    cols = jnp.where(emask, out % m, 0)
    return rows, cols, emask


def knn_adjacency_matrix(
    d2: jax.Array, mask: jax.Array, k: int
) -> jax.Array:
    """Symmetrised kNN boolean adjacency (reference compute_knn,
    graph_features.py:25-44): each valid node links to its k nearest valid
    neighbours (ties by lowest index, like argsort); the matrix is OR-ed with
    its transpose and the diagonal cleared.  When n_valid <= k, all valid
    pairs connect."""
    n = d2.shape[0]
    kk = min(k + 1, n)  # includes self (distance 0), dropped below
    _, nbr = jax.lax.top_k(-d2, kk)  # [N, kk], lowest distance first
    # Gathered distances: +inf means the neighbour slot is invalid
    # (fewer than kk valid nodes).
    nbr_d = jnp.take_along_axis(d2, nbr, axis=1)
    valid_slot = (nbr_d < _INF) & mask[:, None]
    adj = jnp.zeros((n, n), dtype=bool)
    row_ids = jnp.broadcast_to(jnp.arange(n)[:, None], (n, kk))
    safe_nbr = jnp.where(valid_slot, nbr, 0)
    adj = adj.at[row_ids, safe_nbr].max(valid_slot)
    adj = adj | adj.T
    adj = adj & ~jnp.eye(n, dtype=bool)
    return adj & (mask[:, None] & mask[None, :])


def ball_query_degree(d2: jax.Array, eps_sq: float) -> jax.Array:
    """Node degree from the ball query (reference compute_ball_query +
    degree row-sum, graph_features.py:11-22,78).  d2 already encodes the
    valid mask as +inf."""
    gated = d2 <= eps_sq
    gated = gated & ~jnp.eye(d2.shape[0], dtype=bool)
    return jnp.sum(gated, axis=-1).astype(jnp.float32)


@partial(
    jax.jit,
    static_argnames=("k", "edge_capacity", "und_capacity", "union_ball"),
)
def build_graph_structure(
    points: jax.Array,
    mask: jax.Array,
    *,
    k: int,
    eps_sq: float,
    edge_capacity: int,
    und_capacity: int,
    union_ball: bool = False,
) -> GraphStructure:
    """Full graph construction on device.

    union_ball=False reproduces ``compute_adjacency_information``
    (graph_features.py:58-84): adjacency = kNN only, degree = ball query.
    union_ball=True reproduces the _v2 variant (:87-114): adjacency =
    kNN | ball.
    """
    d2 = pairwise_sq_dist(points, mask)
    adj = knn_adjacency_matrix(d2, mask, k)
    ball = (d2 <= eps_sq) & ~jnp.eye(d2.shape[0], dtype=bool)
    degree = jnp.sum(ball, axis=-1).astype(jnp.float32)
    if union_ball:
        adj = adj | ball
    senders, receivers, edge_mask = compact_nonzero(adj, edge_capacity)
    triu = jnp.triu(adj, k=1)
    und_s, und_r, und_mask = compact_nonzero(triu, und_capacity)
    return GraphStructure(
        senders=senders,
        receivers=receivers,
        edge_mask=edge_mask,
        und_senders=und_s,
        und_receivers=und_r,
        und_mask=und_mask,
        degree=degree,
    )


def normalize_time(ts: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked min-max time normalisation (graph_features.py:47-55)."""
    big = jnp.where(mask, ts, _INF)
    small = jnp.where(mask, ts, -_INF)
    tmin = jnp.min(big)
    tmax = jnp.max(small)
    denom = jnp.where(tmax > tmin, tmax - tmin, 1.0)
    return jnp.where(mask, (ts - tmin) / denom, 0.0)


def compute_node_features_device(
    vr, rcs, ts, px, py, degree, mask,
    *,
    min_range: float, max_range: float,
    min_azimuth: float, max_azimuth: float,
    include_region_confidence: bool = True,
):
    """Device mirror of compute_node_features (graph_features.py:117-144)."""
    t_norm = normalize_time(ts, mask)
    deg = degree / 10.0
    feats = [vr, rcs, t_norm, deg]
    if include_region_confidence:
        r = jnp.sqrt(px**2 + py**2)
        th = jnp.abs(jnp.arctan2(py, px))
        range_conf = (r - max_range) / (min_range - max_range)
        azi_conf = (th - max_azimuth) / (min_azimuth - max_azimuth)
        feats += [range_conf, azi_conf]
    out = jnp.stack(feats, axis=-1)
    return jnp.where(mask[:, None], out, 0.0)


_US2SEC = 1e-6  # graph_features.py:7


def compute_edge_features_device(
    px, py, vx, vy, ts, senders, receivers, edge_mask
):
    """Device mirror of compute_edge_features (graph_features.py:147-164).

    Note the reference's quirk: dl is the norm of the already-/10-scaled
    (dx, dy), divided by 10 again — reproduced faithfully.
    """
    s, r = senders, receivers
    dx = (px[s] - px[r]) / 10.0
    dy = (py[s] - py[r]) / 10.0
    dl = jnp.sqrt(dx**2 + dy**2) / 10.0
    dvx = vx[s] - vx[r]
    dvy = vy[s] - vy[r]
    dvl = jnp.sqrt(dvx**2 + dvy**2)
    dt = (ts[s] - ts[r]) * _US2SEC
    out = jnp.stack([dx, dy, dl, dvx, dvy, dvl, dt], axis=-1)
    return jnp.where(edge_mask[:, None], out, 0.0)
