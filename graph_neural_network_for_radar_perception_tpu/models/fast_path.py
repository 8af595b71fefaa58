"""Hand-scheduled fast forward consuming the flax parameter tree.

A functional twin of models/gnn.RadarGNN.__call__ for the shipped
configuration (channel_normalization + leakyrelu, no extra features) that
routes each message-passing round through the fused Pallas kernel
(ops/pallas/fused_mp.py) instead of the XLA gather→MLP→scatter chain.

Because it reads the exact same parameter pytree the flax model produces,
the two paths are interchangeable: train with either, serve with either,
import the reference checkpoint into both.  Fully jit/vmap/grad-compatible
(the kernel carries a custom VJP).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config.config import GNNConfig
from ..core.graph import RadarGraph
from ..ops.norms import channel_norm
from ..ops.pallas.fused_mp import fused_message_pass
from .blocks import LEAKY_SLOPE
from .gnn import GNNOutputs


def _act(x):
    return jax.nn.leaky_relu(x, negative_slope=LEAKY_SLOPE)


def _ffn(p, x, normed=True):
    d = p["Linear_0"]["Dense_0"]
    x = x @ d["kernel"] + d["bias"]
    if normed:
        n = p["ScalarNorm_0"]
        x = channel_norm(x, n["gamma"], n["beta"])
    return _act(x)


def _stack(p, x, first_unnormalized=False):
    for j in range(len(p)):
        x = _ffn(p[f"FFNBlock_{j}"], x, normed=not (j == 0 and first_unnormalized))
    return x


def _head(p, x):
    x = _ffn(p["FFNBlock_0"], x)
    d = p["Dense_0"]
    return x @ d["kernel"] + d["bias"]


def default_mp_impl(cfg: GNNConfig) -> str:
    """Pick the message-passing kernel for a config.

    Round-5 scan-slope truth (docs/PERF.md — the round 1-4 per-dispatch
    numbers were dispatch-stream artifacts and are retracted): at the
    shipped k=10 sparsity the plain XLA model path with one-hot MXU
    segment ops (ops/segment.py) is the outright winner (11.3 ms/step
    fwd+bwd vs 14.2 for onehot-Pallas + Pallas backward); at ~10x dense
    fanout the Pallas kernel with Pallas backward statistically ties it
    (43.5 vs 45.2 ms/step).  The fast path is therefore opt-in
    everywhere (`make_train_step(use_fast_path=True)`); "onehot" remains
    its default kernel.  "csr" (+ optional source windowing via
    cfg.csr_src_window + cfg.spatial_sort) stays opt-in for
    bounded-radius graph workloads — the window contract does not hold
    on kNN radar scenes (isolated points ⇒ unbounded-radius edges,
    PERF.md round 4)."""
    del cfg
    return "onehot"


def fast_forward(
    params,
    graph: RadarGraph,
    node2cluster: jnp.ndarray,
    num_clusters: int,
    cluster_mask: jnp.ndarray,
    cfg: GNNConfig,
    *,
    use_pallas: bool = True,
    edge_tile: Optional[int] = None,
    interpret: bool = False,
    mp_bf16: bool = False,
    pallas_backward: Optional[bool] = None,
    mp_impl: Optional[str] = None,  # "csr" | "onehot"
    window: Optional[int] = None,
    src_window: Optional[int] = None,
) -> GNNOutputs:
    # Tiling defaults come from cfg so pad_frame's host-side contract
    # validation and the kernel always agree (ADVICE round 3).
    edge_tile = cfg.csr_edge_tile if edge_tile is None else edge_tile
    window = cfg.csr_window if window is None else window
    src_window = cfg.csr_src_window if src_window is None else src_window
    assert cfg.norm_layer == "channel_normalization", (
        "fast path supports the shipped channel_normalization config"
    )
    assert cfg.num_blocks_to_compute_edge == 1
    if mp_impl is None:
        mp_impl = cfg.mp_impl or default_mp_impl(cfg)
    if pallas_backward is None:
        # Env default resolved at TRACE time (baked into the compiled
        # step); pass explicitly for per-call control.  Round-5
        # scan-slope truth: the Pallas backward is ~2.5x FASTER than the
        # XLA backward of the kernel forward (14.2 vs 35.3 ms/step,
        # docs/PERF.md), so it now defaults ON whenever the kernel path
        # is selected.
        from ..ops.pallas.fused_mp import use_pallas_backward

        pallas_backward = use_pallas_backward()
    n = graph.num_nodes
    # Sentinel-index padded edges so the kernel drops them without masks.
    senders = jnp.where(graph.edge_mask, graph.senders, n).astype(jnp.int32)
    receivers = jnp.where(graph.edge_mask, graph.receivers, n).astype(
        jnp.int32
    )

    x = _stack(
        params["encode_node_feat"]["MLPStack_0"], graph.node_feat,
        first_unnormalized=True,
    )
    guard = 0.0
    if mp_impl == "csr":
        # Reversed-enumeration trick (ops/pallas/csr_mp.py): walk each
        # directed edge (r→s) at the row-major position of (s→r), so the
        # destination list is the already-sorted senders array.  The raw
        # edge features of the reversed edges are an elementwise sign
        # flip; encoding the flipped features yields each directed edge's
        # encoding exactly once, just enumerated differently.
        from ..ops.pallas.csr_mp import (
            fused_message_pass_csr, reverse_edge_features,
            src_window_violations, window_span_violations,
        )

        # Runtime contract guard: edges outside their tile's node window
        # would be silently dropped by the kernel — poison the output
        # with NaN instead, so the train step's NaN skip fires and the
        # metric `skipped` surfaces it (cfg.mp_impl=="csr" additionally
        # validates at pad_frame time and raises early).
        n_viol = window_span_violations(senders, n, edge_tile, window)
        if src_window:
            n_viol = n_viol + src_window_violations(
                receivers, n, edge_tile, src_window
            )
        guard = jnp.where(n_viol > 0, jnp.nan, 0.0)

        edge_feat_in = reverse_edge_features(graph.edge_feat)
    else:
        edge_feat_in = graph.edge_feat
    e = _stack(
        params["encode_edge_feat"]["MLPStack_0"], edge_feat_in,
        first_unnormalized=True,
    )
    e = jnp.where(graph.edge_mask[:, None], e, 0.0) + guard

    for b in range(len(cfg.graph_convolution_stem_channels)):
        pb = params["pass_messages"][f"ResidualGraphConvBlock_{b}"]
        msg0 = pb["MLPStack_0"]["FFNBlock_0"]
        msg1 = pb["MLPStack_0"]["FFNBlock_1"]
        w1 = msg0["Linear_0"]["Dense_0"]["kernel"]
        b1 = msg0["Linear_0"]["Dense_0"]["bias"]
        w2 = msg1["Linear_0"]["Dense_0"]["kernel"]
        b2 = msg1["Linear_0"]["Dense_0"]["bias"]
        g1 = msg0["ScalarNorm_0"]["gamma"][0]
        be1 = msg0["ScalarNorm_0"]["beta"][0]
        g2 = msg1["ScalarNorm_0"]["gamma"][0]
        be2 = msg1["ScalarNorm_0"]["beta"][0]

        if mp_impl == "csr":
            # dst = senders (sorted), src = receivers: message for the
            # directed edge (receivers[p] → senders[p]) whose receiver is
            # senders[p]; w1 row order [x_recv ‖ x_send ‖ e] is unchanged.
            agg = fused_message_pass_csr(
                x, e, receivers, senders, w1, b1, w2, b2, g1, be1, g2, be2,
                LEAKY_SLOPE, edge_tile, window, interpret, mp_bf16,
                pallas_backward, src_window,
            )
        else:
            agg = fused_message_pass(
                x, e, senders, receivers, w1, b1, w2, b2, g1, be1, g2, be2,
                LEAKY_SLOPE, edge_tile, interpret, mp_bf16, pallas_backward,
            )
        upd = _ffn(
            pb["MLPStack_1"]["FFNBlock_0"],
            jnp.concatenate([x, agg], axis=-1),
        )
        x = x + upd

    nm = graph.node_mask
    node_cls = _head(
        params["predict_node"]["TaskSpecificHead_0"],
        _stack(params["predict_node"]["MLPStack_0"], x),
    )
    node_off = _head(
        params["predict_offset"]["TaskSpecificHead_0"],
        _stack(params["predict_offset"]["MLPStack_0"], x),
    )

    xe = _ffn(params["predict_link"]["FFNBlock_0"], x)
    from ..ops.segment import gather_nodes

    el = gather_nodes(xe, graph.und_senders) + gather_nodes(
        xe, graph.und_receivers
    )
    el = _stack(params["predict_link"]["MLPStack_0"], el)
    edge_cls = _head(params["predict_link"]["TaskSpecificHead_0"], el)

    xo = _stack(params["predict_class"]["MLPStack_0"], x)
    from ..ops.segment import masked_segment_max

    pooled = masked_segment_max(xo, node2cluster, num_clusters, nm)
    obj_cls = _head(params["predict_class"]["TaskSpecificHead_0"], pooled)

    return GNNOutputs(node_cls, node_off, edge_cls, obj_cls, x)
