"""Owner-computes edge partitioning with halo exchange.

Third-generation graph-parallel training step (SURVEY.md §5
"graph-size parallelism"; no reference counterpart — the reference is
single-device).  Supersedes parallel/sharded.make_edge_sharded_train_step,
which all-reduces a full ``[N, D]`` aggregate every message-passing round
and replicates all node compute across the ``graph`` axis.

Layout
======

* Nodes are **spatially sorted** (:func:`spatial_sort_frame`) so that kNN
  sources of a node lie within a bounded index window of it — the 1-D
  analog of a domain decomposition.
* The ``graph`` mesh axis owns contiguous node ranges of N/G rows each.
* Edges are **destination-sorted and owner-assigned on the host**
  (:func:`build_halo_shards`): member g holds exactly the edges whose
  destination it owns, with window-local ``dst_loc``/``src_loc`` indices
  precomputed.  The build validates that every source lies within
  ``halo`` rows of the owner's range and raises otherwise (a contract,
  like the CSR kernel's — never silent truncation).

Per message-passing round each member then:

1. ppermutes its first/last ``halo`` feature rows to its two neighbours
   (communication ∝ halo/boundary nodes, NOT ∝ N — 2·halo·D floats per
   member per round vs the old psum's 2·(G−1)/G·N·D);
2. gathers sources from ``[halo ‖ owned ‖ halo]``, destinations from its
   owned rows, runs the message MLP on its E/G edge shard, and
   segment-sums into its owned N/G rows — no collective in the reduce;
3. runs the update MLP on owned rows only (node compute ÷ G).

Heads + loss run on one all-gathered ``[N, D]`` per forward (heads are
<5 % of trunk FLOPs); loss sums are taken on ``graph``-member 0 and
psummed over both axes so gradients through the all-gather are counted
exactly once.  Gradients match the single-device step
(tests/test_halo.py) because every operation is either local or a
linear collective with an exact transpose (ppermute ↔ reverse ppermute,
all_gather ↔ reduce-scatter).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config.config import GNNConfig
from ..core.graph import GraphBatch, _pytree_dataclass
from ..models.fast_path import _ffn, _head, _stack
from ..train.loss import graph_loss_sums, reduce_loss_sums, tree_sum
from ..train.steps import TrainState, all_finite, apply_if, make_optimizer

# ---------------------------------------------------------------------------
# Host-side layout
# ---------------------------------------------------------------------------


# spatial_sort_frame lives in the data layer now (data/ordering.py) so the
# input pipeline can apply it without importing the parallel stack; it is
# re-exported here because the halo layout is its other consumer.
from ..data.ordering import spatial_sort_frame  # noqa: E402,F401


@_pytree_dataclass
class HaloShards:
    """Owner-assigned edge shards for one padded graph (or a batch).

    Shapes for one graph (batch prepends B):
      dst_loc:  [G, Ec] int32 — destination − owner_lo, in [0, N/G);
                sentinel N/G for padded slots.
      src_loc:  [G, Ec] int32 — source − (owner_lo − halo), in
                [0, N/G + 2·halo); sentinel 0 for padded slots (masked).
      edge_feat:[G, Ec, F_e] raw directed edge features.
      mask:     [G, Ec] bool.
    """

    dst_loc: jax.Array
    src_loc: jax.Array
    edge_feat: jax.Array
    mask: jax.Array


def required_halo(graph, n_shards: int) -> int:
    """Smallest halo width (rows) the graph needs for `n_shards` owners."""
    m = np.asarray(graph.edge_mask)
    s = np.asarray(graph.senders)[m]
    r = np.asarray(graph.receivers)[m]
    nl = graph.num_nodes // n_shards
    lo = (r // nl) * nl
    return int(max(np.maximum(lo - s, s - (lo + nl - 1)).max(initial=0), 0))


def build_halo_shards(
    graph, n_shards: int, halo: int, edge_cap: Optional[int] = None
) -> HaloShards:
    """Owner-assign one padded RadarGraph's directed edges (host, numpy).

    Raises if a source falls outside the halo window (frame not
    spatially sorted / halo too small) or an owner's edge count exceeds
    `edge_cap` — loud contracts, mirroring pad_frame's CSR validation.
    """
    n = graph.num_nodes
    assert n % n_shards == 0, f"{n} nodes not divisible by {n_shards}"
    nl = n // n_shards

    m = np.asarray(graph.edge_mask)
    s = np.asarray(graph.senders)[m]
    r = np.asarray(graph.receivers)[m]
    ef = np.asarray(graph.edge_feat)[m]
    order = np.argsort(r, kind="stable")
    s, r, ef = s[order], r[order], ef[order]
    if edge_cap is None:
        counts = np.bincount(r // nl, minlength=n_shards)
        edge_cap = int(-(-int(counts.max(initial=1)) // 8) * 8)

    fe = ef.shape[-1]
    dst_loc = np.full((n_shards, edge_cap), nl, np.int32)
    src_loc = np.zeros((n_shards, edge_cap), np.int32)
    feats = np.zeros((n_shards, edge_cap, fe), np.float32)
    mask = np.zeros((n_shards, edge_cap), bool)
    owner = r // nl
    for g in range(n_shards):
        sel = owner == g
        cnt = int(sel.sum())
        if cnt > edge_cap:
            raise ValueError(
                f"owner {g} holds {cnt} edges > edge_cap {edge_cap}; "
                "raise edge_cap (skewed in-degree?)"
            )
        lo = g * nl
        sl = s[sel] - (lo - halo)
        if cnt and (sl.min() < 0 or sl.max() >= nl + 2 * halo):
            raise ValueError(
                f"source outside halo window on owner {g} "
                f"(need halo ≥ {required_halo(graph, n_shards)}, have {halo}); "
                "spatial_sort_frame the frame or widen the halo"
            )
        dst_loc[g, :cnt] = r[sel] - lo
        src_loc[g, :cnt] = sl
        feats[g, :cnt] = ef[sel]
        mask[g, :cnt] = True
    return HaloShards(dst_loc, src_loc, feats, mask)


def make_halo_batch(
    batch: GraphBatch, cfg: GNNConfig, n_shards: int, halo: int
) -> HaloShards:
    """Batched host build: HaloShards with leading batch axis."""
    edge_cap = halo_edge_cap(cfg, n_shards)
    per = [
        build_halo_shards(
            jax.tree.map(lambda x: np.asarray(x)[b], batch.graph),
            n_shards, halo, edge_cap,
        )
        for b in range(batch.batch_size)
    ]
    return HaloShards(
        dst_loc=np.stack([p.dst_loc for p in per]),
        src_loc=np.stack([p.src_loc for p in per]),
        edge_feat=np.stack([p.edge_feat for p in per]),
        mask=np.stack([p.mask for p in per]),
    )


def halo_edge_cap(cfg: GNNConfig, n_shards: int) -> int:
    """Static per-owner edge capacity: 1.5× the mean share of the edge
    capacity, rounded up to 8 (in-degree of symmetrised kNN is nearly
    uniform; build_halo_shards raises on overflow)."""
    mean = -(-cfg.max_edges // n_shards)
    return -(-3 * mean // 2) // 8 * 8 + 8


# ---------------------------------------------------------------------------
# Device-side forward
# ---------------------------------------------------------------------------


def _halo_exchange(x_local: jax.Array, halo: int, axis: str) -> jax.Array:
    """[nl, D] → [nl + 2·halo, D]: owned rows flanked by `halo` boundary
    rows from each side's neighbours.

    When halo exceeds the shard width nl, ⌈halo/nl⌉ hops pull whole
    blocks from farther members (comm stays ∝ halo).  Ends of the chain
    receive zeros (ppermute semantics), which build_halo_shards
    guarantees are never gathered."""
    g = jax.lax.axis_size(axis)
    nl = x_local.shape[0]
    hops = -(-halo // nl)
    left, right = [], []
    for hop in range(1, hops + 1):
        fwd = [(i, i + hop) for i in range(g - hop)]
        bwd = [(i + hop, i) for i in range(g - hop)]
        left.insert(0, jax.lax.ppermute(x_local, axis, fwd))
        right.append(jax.lax.ppermute(x_local, axis, bwd))
    from_left = jnp.concatenate(left, axis=0)[-halo:]
    from_right = jnp.concatenate(right, axis=0)[:halo]
    return jnp.concatenate([from_left, x_local, from_right], axis=0)


def halo_forward(
    params,
    graph,
    shard: HaloShards,
    node2cluster,
    num_clusters: int,
    cfg: GNNConfig,
    *,
    halo: int,
    axis: str = "graph",
):
    """Owner-computes forward for ONE graph inside shard_map.

    graph/labels arrive replicated over `axis`; `shard` holds only this
    member's owner-assigned edges ([Ec] shapes, the [G] axis consumed by
    the shard_map specs).  Returns GNNOutputs built from the all-gathered
    node embeddings (identical on every member).
    """
    g_idx = jax.lax.axis_index(axis)
    g_num = jax.lax.axis_size(axis)
    n = graph.num_nodes
    nl = n // g_num
    lo = g_idx * nl

    # Encode only the owned node rows.
    nf_local = jax.lax.dynamic_slice_in_dim(graph.node_feat, lo, nl, axis=0)
    x = _stack(
        params["encode_node_feat"]["MLPStack_0"], nf_local,
        first_unnormalized=True,
    )
    e = _stack(
        params["encode_edge_feat"]["MLPStack_0"], shard.edge_feat,
        first_unnormalized=True,
    )
    e = jnp.where(shard.mask[:, None], e, 0.0)

    dst = shard.dst_loc
    src = shard.src_loc
    for b in range(len(cfg.graph_convolution_stem_channels)):
        pb = params["pass_messages"][f"ResidualGraphConvBlock_{b}"]
        x_ext = _halo_exchange(x, halo, axis)
        xs = jnp.take(x_ext, src, axis=0)
        xd = jnp.take(x, jnp.minimum(dst, nl - 1), axis=0)
        msg = _stack(
            pb["MLPStack_0"], jnp.concatenate([xd, xs, e], axis=-1)
        )
        msg = jnp.where(shard.mask[:, None], msg, 0.0)
        agg = jax.ops.segment_sum(msg, dst, num_segments=nl + 1)[:nl]
        upd = _ffn(
            pb["MLPStack_1"]["FFNBlock_0"],
            jnp.concatenate([x, agg], axis=-1),
        )
        x = x + upd

    # One gather for the (cheap) heads; member 0's loss copy is the one
    # that counts (make_halo_train_step masks the rest), so cotangents
    # through this all_gather are exact.
    x_full = jax.lax.all_gather(x, axis, tiled=True)

    nm = graph.node_mask
    node_cls = _head(
        params["predict_node"]["TaskSpecificHead_0"],
        _stack(params["predict_node"]["MLPStack_0"], x_full),
    )
    node_off = _head(
        params["predict_offset"]["TaskSpecificHead_0"],
        _stack(params["predict_offset"]["MLPStack_0"], x_full),
    )
    xe = _ffn(params["predict_link"]["FFNBlock_0"], x_full)
    el = xe[graph.und_senders] + xe[graph.und_receivers]
    el = _stack(params["predict_link"]["MLPStack_0"], el)
    edge_cls = _head(params["predict_link"]["TaskSpecificHead_0"], el)

    xo = _stack(params["predict_class"]["MLPStack_0"], x_full)
    from ..ops.segment import masked_segment_max

    pooled = masked_segment_max(xo, node2cluster, num_clusters, nm)
    obj_cls = _head(params["predict_class"]["TaskSpecificHead_0"], pooled)

    from ..models.gnn import GNNOutputs

    return GNNOutputs(node_cls, node_off, edge_cls, obj_cls, x_full)


# ---------------------------------------------------------------------------
# Train step
# ---------------------------------------------------------------------------


def _halo_loss(cfg: GNNConfig, mesh: Mesh, halo: int):
    def local_loss(params, batch: GraphBatch, shards: HaloShards):
        # The 'graph'-sharded G axis (axis 1) is size 1 inside the map.
        shards = jax.tree.map(lambda x: x.squeeze(1), shards)

        def single(graph, labels, shard):
            outs = halo_forward(
                params, graph, shard, labels.node2cluster,
                cfg.max_clusters, cfg, halo=halo,
            )
            return graph_loss_sums(outs, graph, labels, cfg)

        sums = jax.vmap(single)(batch.graph, batch.labels, shards)
        sums = tree_sum(sums)
        # Only graph-member 0's loss copy contributes (heads run on the
        # replicated all-gathered x; counting every member would scale
        # gradients through the gather by G).
        keep = (jax.lax.axis_index("graph") == 0).astype(jnp.float32)
        sums = jax.tree.map(lambda v: v * keep, sums)
        sums = jax.tree.map(
            lambda v: jax.lax.psum(v, ("data", "graph")), sums
        )
        return reduce_loss_sums(sums, cfg)

    shard_specs = HaloShards(
        dst_loc=P("data", "graph"),
        src_loc=P("data", "graph"),
        edge_feat=P("data", "graph"),
        mask=P("data", "graph"),
    )

    def sharded(params, batch, shards):
        specs_b = jax.tree.map(lambda _: P("data"), batch)
        fn = shard_map(
            local_loss,
            mesh=mesh,
            in_specs=(P(), specs_b, shard_specs),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(params, batch, shards)

    return sharded


def make_halo_train_step(cfg: GNNConfig, mesh: Mesh, halo: int):
    """Full train step with owner-computes edge partitioning.

    The returned step takes (state, batch, shards); build shards with
    make_halo_batch (host) from spatially-sorted frames.  `place_batch`
    puts both on the mesh with the right shardings.
    """
    loss_fn = _halo_loss(cfg, mesh, halo)
    tx = make_optimizer(cfg)
    repl = NamedSharding(mesh, P())

    @partial(jax.jit, out_shardings=(repl, repl))
    def train_step(state: TrainState, batch: GraphBatch, shards: HaloShards):
        def lf(params):
            return loss_fn(params, batch, shards)

        (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(
            state.params
        )
        ok = all_finite(grads) & jnp.isfinite(loss)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params, opt_state = apply_if(
            ok, (params, opt_state), (state.params, state.opt_state)
        )
        metrics = dict(metrics, skipped=(~ok).astype(jnp.float32))
        return TrainState(params, opt_state, state.step + 1), metrics

    def place(batch: GraphBatch, shards: HaloShards):
        b = jax.tree.map(
            lambda x: jax.device_put(
                jnp.asarray(x), NamedSharding(mesh, P("data"))
            ),
            batch,
        )
        s = jax.tree.map(
            lambda x: jax.device_put(
                jnp.asarray(x), NamedSharding(mesh, P("data", "graph"))
            ),
            shards,
        )
        return b, s

    train_step.place = place
    return train_step
