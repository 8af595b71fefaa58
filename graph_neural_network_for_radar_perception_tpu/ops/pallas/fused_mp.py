"""Pallas TPU kernel: fused edge gather → message-MLP → scatter-add.

This is the project's "native kernel" replacing torch_geometric's C++/CUDA
scatter backend (SURVEY.md §2: the reference's only performance-critical
kernels live inside ``MessagePassing.propagate``, gnn_blocks.py:106-113).

One message-passing round computes, for every directed edge e=(s→r):

    m_e  = act(cnorm(W2 · act(cnorm(W1 · [x_r ‖ x_s ‖ ef_e] + b1)) + b2))
    agg_n = Σ_{e: r(e)=n} m_e

The XLA path materialises [E, 2D+De] and [E, H] intermediates in HBM and
issues separate gather/scatter ops.  The Pallas kernel instead:

* splits W1 into row blocks (W1r, W1s, W1e) so the endpoint gathers fuse
  into precomputed per-node partials xa = x·W1r, xb = x·W1s (computed once
  per round, outside);
* tiles the edge axis; per tile builds one-hot index matrices on the VPU
  and performs gather AND scatter as MXU matmuls (one-hot @ partials),
  keeping every [TE, ·] intermediate in VMEM;
* accumulates the output [N, D2] in VMEM across the sequential TPU grid,
  writing HBM exactly once.

Padded edges carry the sentinel index N, whose one-hot row is all-zero, so
they contribute nothing — no masking needed inside the kernel.

The op is wrapped in jax.custom_vjp; the backward pass uses the standard
XLA segment ops (a Pallas backward is a later optimisation).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..norms import EPS


def _cnorm_act(x, gamma, beta, slope):
    """channel_norm (Bessel std) + leaky relu, fused elementwise."""
    d = x.shape[-1]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.sum((x - mean) ** 2, axis=-1, keepdims=True) / max(d - 1, 1)
    x = gamma * ((x - mean) / (jnp.sqrt(var) + EPS)) + beta
    return jnp.where(x >= 0, x, slope * x)


def _kernel(
    senders_ref, receivers_ref, ef_ref, xa_ref, xb_ref,
    w1e_ref, b1_ref, w2_ref, b2_ref, scal_ref,
    out_ref,
):
    i = pl.program_id(0)
    n = xa_ref.shape[0]
    te = senders_ref.shape[0]  # senders/receivers arrive as [TE, 1] int32

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    g1 = scal_ref[0, 0]
    be1 = scal_ref[0, 1]
    g2 = scal_ref[0, 2]
    be2 = scal_ref[0, 3]
    slope = scal_ref[0, 4]

    iota_n = jax.lax.broadcasted_iota(jnp.int32, (te, n), 1)
    oh_s = (senders_ref[:] == iota_n).astype(jnp.float32)
    oh_r = (receivers_ref[:] == iota_n).astype(jnp.float32)

    m1 = (
        jnp.dot(oh_r, xa_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(oh_s, xb_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(ef_ref[:], w1e_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[:]
    )
    m1 = _cnorm_act(m1, g1, be1, slope)
    m2 = jnp.dot(m1, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
    m2 = _cnorm_act(m2, g2, be2, slope)
    out_ref[:] += jnp.dot(
        oh_r.T, m2, preferred_element_type=jnp.float32
    )


def _forward_impl(
    x, ef, senders, receivers,
    w1, b1, w2, b2, g1, be1, g2, be2,
    *, slope: float, edge_tile: int, interpret: bool,
):
    n, d = x.shape
    e, de = ef.shape
    h = w1.shape[1]
    d2 = w2.shape[1]

    # Pad the edge axis to a tile multiple; padded slots carry the
    # sentinel index n (zero one-hot row → no contribution).
    rem = (-e) % edge_tile
    if rem:
        ef = jnp.pad(ef, ((0, rem), (0, 0)))
        senders = jnp.pad(senders, (0, rem), constant_values=n)
        receivers = jnp.pad(receivers, (0, rem), constant_values=n)
        e = e + rem

    # Split W1 rows: [x_r ‖ x_s ‖ ef] ordering (gnn_blocks.py:112 —
    # message(x_i, x_j, edge_attr) concatenates receiver, sender, edge).
    w1r = w1[:d]
    w1s = w1[d : 2 * d]
    w1e = w1[2 * d :]
    xa = x @ w1r  # [N, H] per-node partials, computed once per round
    xb = x @ w1s

    num_tiles = pl.cdiv(e, edge_tile)
    scal = jnp.array(
        [[g1, be1, g2, be2, slope]], dtype=jnp.float32
    )

    grid_spec = pl.GridSpec(
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((edge_tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((edge_tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((edge_tile, de), lambda i: (i, 0)),
            pl.BlockSpec((n, h), lambda i: (0, 0)),
            pl.BlockSpec((n, h), lambda i: (0, 0)),
            pl.BlockSpec((de, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((h, d2), lambda i: (0, 0)),
            pl.BlockSpec((1, d2), lambda i: (0, 0)),
            pl.BlockSpec((1, 5), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((n, d2), lambda i: (0, 0)),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, d2), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * e * (3 * n * max(h, d2) + de * h + h * d2),
            bytes_accessed=4 * (e * (de + 2) + 2 * n * h + n * d2),
            transcendentals=0,
        ),
    )(
        senders.reshape(e, 1), receivers.reshape(e, 1), ef, xa, xb, w1e,
        b1.reshape(1, h), w2, b2.reshape(1, d2), scal,
    )


def _xla_reference(
    x, ef, senders, receivers, w1, b1, w2, b2, g1, be1, g2, be2,
    *, slope: float,
):
    """Unfused XLA implementation (also the backward-pass recipe)."""
    n = x.shape[0]
    safe_s = jnp.clip(senders, 0, n - 1)
    safe_r = jnp.clip(receivers, 0, n - 1)
    valid = (senders < n) & (receivers < n)
    inp = jnp.concatenate([x[safe_r], x[safe_s], ef], axis=-1)
    m1 = _cnorm_act(inp @ w1 + b1, g1, be1, slope)
    m2 = _cnorm_act(m1 @ w2 + b2, g2, be2, slope)
    m2 = jnp.where(valid[:, None], m2, 0.0)
    seg = jnp.where(valid, receivers, n)
    return jax.ops.segment_sum(m2, seg, num_segments=n + 1)[:n]


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(12, 13, 14)
)
def fused_message_pass(
    x, ef, senders, receivers, w1, b1, w2, b2, g1, be1, g2, be2,
    slope: float = 0.01, edge_tile: int = 512, interpret: bool = False,
):
    """agg[n] = Σ_{e: recv=n} msgMLP([x_recv ‖ x_send ‖ ef]).

    senders/receivers: int32 [E]; padded edges must carry sentinel N.
    w1: [(2D+De), H]; w2: [H, D2]; g/be: scalar norm affine pairs.
    """
    return _forward_impl(
        x, ef, senders, receivers, w1, b1, w2, b2, g1, be1, g2, be2,
        slope=slope, edge_tile=edge_tile, interpret=interpret,
    )


def _fwd(x, ef, senders, receivers, w1, b1, w2, b2, g1, be1, g2, be2,
         slope, edge_tile, interpret):
    out = _forward_impl(
        x, ef, senders, receivers, w1, b1, w2, b2, g1, be1, g2, be2,
        slope=slope, edge_tile=edge_tile, interpret=interpret,
    )
    return out, (x, ef, senders, receivers, w1, b1, w2, b2, g1, be1, g2, be2)


def _bwd(slope, edge_tile, interpret, res, g_out):
    (x, ef, senders, receivers, w1, b1, w2, b2, g1, be1, g2, be2) = res

    def f(x, ef, w1, b1, w2, b2, g1, be1, g2, be2):
        return _xla_reference(
            x, ef, senders, receivers, w1, b1, w2, b2, g1, be1, g2, be2,
            slope=slope,
        )

    _, vjp = jax.vjp(f, x, ef, w1, b1, w2, b2, g1, be1, g2, be2)
    dx, def_, dw1, db1, dw2, db2, dg1, dbe1, dg2, dbe2 = vjp(g_out)
    return (
        dx, def_, None, None, dw1, db1, dw2, db2, dg1, dbe1, dg2, dbe2,
    )


fused_message_pass.defvjp(_fwd, _bwd)
