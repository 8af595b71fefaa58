"""Segment scatter/gather primitives — the TPU-native replacement for
torch_geometric's C++/CUDA scatter backend.

The reference delegates edge aggregation to
``torch_geometric.nn.conv.MessagePassing`` with ``aggr='add'``
(modules/neural_net/gnn/gnn_blocks.py:57,106) and per-cluster max-pooling to a
python loop over clusters (gnn_blocks.py:378-389).  Here both become masked
segment reductions over static-shape padded arrays, which XLA lowers to
efficient on-chip scatters; a Pallas CSR variant lives in ops/pallas.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_NEG_INF = -3.4e38  # large finite negative for masked max in f32


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
    """Gather node feature rows by edge endpoint index: [N,D], [E] → [E,D]."""
    return jnp.take(node_feat, idx, axis=0)


@partial(jax.jit, static_argnames=("num_segments",))
def segment_count(segment_ids, num_segments, mask=None):
    ones = jnp.ones(segment_ids.shape, dtype=jnp.float32)
    return masked_segment_sum(ones, segment_ids, num_segments, mask)
