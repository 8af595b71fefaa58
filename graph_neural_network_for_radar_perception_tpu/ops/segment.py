"""Segment scatter/gather primitives — the TPU-native replacement for
torch_geometric's C++/CUDA scatter backend.

The reference delegates edge aggregation to
``torch_geometric.nn.conv.MessagePassing`` with ``aggr='add'``
(modules/neural_net/gnn/gnn_blocks.py:57,106) and per-cluster max-pooling to a
python loop over clusters (gnn_blocks.py:378-389).  Here both become masked
segment reductions over static-shape padded arrays.

TPU lowering (round-5 measurement, docs/PERF.md): XLA's native gather and
scatter-add lower ~6-8x slower than an MXU one-hot matmul at radar-graph
shapes (E=10240, N=768, D=64: scatter 0.62 ms vs one-hot 0.08 ms per
batched call; gather 0.36 vs 0.08), and XLA autodiffs the one-hot matmul
into another fully-parallel matmul instead of a serial scatter.  So on
TPU `masked_segment_sum` and `gather_nodes` run as one-hot matmuls; CPU
(and any other backend) keeps the exact scatter/take path, which is both
faster there and bit-stable for the reference-parity test suite.  Set
SEGOP_IMPL=onehot|scatter to override (trace-time).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

_NEG_INF = -3.4e38  # large finite negative for masked max in f32

# bf16_3x matmul passes: f32-accurate gathers/scatter-sums on the MXU.
# A DEFAULT-precision (single bf16 pass) one-hot gather would round the
# gathered features to 8 mantissa bits — visible drift vs the CPU/exact
# path — while HIGHEST costs a further ~2x with no accuracy gain here.
# SEGOP_PRECISION=default opts bulk training into the single-pass mode
# (measured 8.9 vs 11.3 ms/step end-to-end, docs/PERF.md round 5).
_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}[os.environ.get("SEGOP_PRECISION", "high")]


def use_onehot_segops() -> bool:
    """Trace-time implementation switch (see module docstring)."""
    override = os.environ.get("SEGOP_IMPL", "")
    if override:
        return override == "onehot"
    return jax.default_backend() == "tpu"


def _onehot(
    segment_ids: jax.Array, num_segments: int, mask: jax.Array | None
) -> jax.Array:
    """[E] ids → [E, num_segments] f32 one-hot; masked rows are all-zero.

    The iota-compare fuses into the consuming dot's operand load on TPU —
    the [E, S] matrix is never materialised in HBM at these shapes."""
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (segment_ids.shape[0], num_segments), 1
    )
    oh = segment_ids[:, None] == iota
    if mask is not None:
        oh = oh & mask[:, None]
    return oh.astype(jnp.float32)


def masked_segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Sum `data[e]` into `out[segment_ids[e]]`, zeroing masked-out rows.

    data:        [E, D] (or [E])
    segment_ids: [E] int
    mask:        [E] bool or None
    returns      [num_segments, D]
    """
    if use_onehot_segops():
        oh = _onehot(segment_ids, num_segments, mask)
        if data.ndim == 1:
            return jnp.matmul(data, oh, precision=_PRECISION)
        return jnp.matmul(oh.T, data, precision=_PRECISION)
    if mask is not None:
        seg = jnp.where(mask, segment_ids, num_segments)  # drop into void slot
        return jax.ops.segment_sum(data, seg, num_segments=num_segments + 1)[
            :num_segments
        ]
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def masked_segment_max(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
    fill_value: float = 0.0,
) -> jax.Array:
    """Max-reduce `data` per segment; masked rows are ignored.

    Segments with no contributing rows get `fill_value` (the reference's
    per-cluster ``torch.max`` never sees an empty cluster, so the fill only
    lands on padded cluster slots that are masked downstream).
    """
    if mask is not None:
        seg = jnp.where(mask, segment_ids, num_segments)
        n = num_segments + 1
    else:
        seg = segment_ids
        n = num_segments
    if mask is not None:
        bmask = mask if data.ndim == 1 else mask[:, None]
        data = jnp.where(bmask, data, _NEG_INF)
    out = jax.ops.segment_max(data, seg, num_segments=n)[:num_segments]
    return jnp.where(out <= _NEG_INF / 2, fill_value, out)


def masked_segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Mean per segment over unmasked rows (empty segments → 0)."""
    total = masked_segment_sum(data, segment_ids, num_segments, mask)
    ones = jnp.ones(data.shape[:1], dtype=data.dtype)
    count = masked_segment_sum(ones, segment_ids, num_segments, mask)
    if data.ndim > 1:
        count = count[:, None]
    return total / jnp.maximum(count, 1.0)


def segment_softmax(
    logits: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Numerically-stable softmax within each segment (for GAT attention).

    logits: [E] or [E, H]; returns same shape.  Masked rows get weight 0.
    """
    seg_max = masked_segment_max(
        logits, segment_ids, num_segments, mask, fill_value=0.0
    )
    shifted = logits - seg_max[segment_ids]
    exp = jnp.exp(shifted)
    if mask is not None:
        bmask = mask if exp.ndim == 1 else mask[:, None]
        exp = jnp.where(bmask, exp, 0.0)
    denom = masked_segment_sum(exp, segment_ids, num_segments, mask)
    return exp / jnp.maximum(denom[segment_ids], 1e-16)


def gather_nodes(node_feat: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather node feature rows by edge endpoint index: [N,D], [E] → [E,D].

    TPU: one-hot matmul (out-of-range/sentinel indices yield zero rows,
    which every caller masks downstream); other backends: jnp.take.  The
    matmul's VJP w.r.t. node_feat is the transposed one-hot matmul — a
    fully-parallel MXU scatter-add, ~7x faster than XLA's native scatter
    at these shapes (docs/PERF.md round 5)."""
    if use_onehot_segops() and node_feat.ndim == 2:
        oh = _onehot(idx, node_feat.shape[0], None)
        return jnp.matmul(oh, node_feat, precision=_PRECISION)
    return jnp.take(node_feat, idx, axis=0)


@partial(jax.jit, static_argnames=("num_segments",))
def segment_count(segment_ids, num_segments, mask=None):
    ones = jnp.ones(segment_ids.shape, dtype=jnp.float32)
    return masked_segment_sum(ones, segment_ids, num_segments, mask)
