"""Microbenchmark: dynamic row-gather strategies inside a Pallas TPU
kernel (docs/PERF.md round-4 'one honest attempt' plan: replace the
[TE, N] one-hot gather matmuls — the kernels' main overhead at sparse
fanout — with true dynamic row gathers, if Mosaic supports one that is
fast).

Variants, each gathering rows of a [N, D] VMEM table for [TE] indices:
  onehot   (TE,N) one-hot built on the VPU, gather = MXU matmul  (baseline)
  take     jnp.take(table, idx, axis=0) lowered by Mosaic
  loop     fori_loop of per-row dynamic slices (pl.ds)
plus the matching scatter-add transposes (onehot.T matmul vs loop of
accumulating stores).

Every variant is verified against the XLA gather before timing.  Timings
are relative (single program per variant, same process) — decisions are
confirmed end-to-end in the bench matrix, not here (docs/PERF.md trap:
trunk-only microbench programs can be unrepresentative).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_gather.py
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, D, TE, TILES = 768, 64, 512, 30  # ~matches one edge tile per grid step


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# --------------------------------------------------------------------------
# gather kernels: inputs idx [TILES*TE, 1] int32, table [N, D] f32
# output [TILES*TE, D]
# --------------------------------------------------------------------------


def _gather_onehot_kernel(idx_ref, tab_ref, out_ref):
    te = idx_ref.shape[0]
    n = tab_ref.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (te, n), 1)
    oh = (idx_ref[:] == iota).astype(jnp.float32)
    out_ref[:] = jnp.dot(oh, tab_ref[:], preferred_element_type=jnp.float32)


def _gather_take_kernel(idx_ref, tab_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:, 0], axis=0)


def _gather_loop_kernel(idx_ref, tab_ref, out_ref):
    te = idx_ref.shape[0]

    def body(i, _):
        out_ref[pl.ds(i, 1), :] = tab_ref[pl.ds(idx_ref[i, 0], 1), :]
        return 0

    jax.lax.fori_loop(0, te, body, 0)


def make_gather(kernel):
    grid_spec = pl.GridSpec(
        grid=(TILES,),
        in_specs=[
            pl.BlockSpec((TE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TE, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return jax.jit(
        lambda idx, tab: pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((TILES * TE, D), jnp.float32),
        )(idx, tab)
    )


# --------------------------------------------------------------------------
# scatter-add kernels: messages [TILES*TE, D] into [N, D] by idx
# --------------------------------------------------------------------------


def _scatter_onehot_kernel(idx_ref, msg_ref, out_ref):
    i = pl.program_id(0)
    te = idx_ref.shape[0]
    n = out_ref.shape[0]

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    iota = jax.lax.broadcasted_iota(jnp.int32, (te, n), 1)
    oh = (idx_ref[:] == iota).astype(jnp.float32)
    out_ref[:] += jnp.dot(oh.T, msg_ref[:],
                          preferred_element_type=jnp.float32)


def _scatter_loop_kernel(idx_ref, msg_ref, out_ref):
    i = pl.program_id(0)
    te = idx_ref.shape[0]

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(e, _):
        j = idx_ref[e, 0]
        out_ref[pl.ds(j, 1), :] = (
            out_ref[pl.ds(j, 1), :] + msg_ref[pl.ds(e, 1), :]
        )
        return 0

    jax.lax.fori_loop(0, te, body, 0)


def make_scatter(kernel):
    grid_spec = pl.GridSpec(
        grid=(TILES,),
        in_specs=[
            pl.BlockSpec((TE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TE, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, D), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return jax.jit(
        lambda idx, msg: pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((N, D), jnp.float32),
        )(idx, msg)
    )


def bench(fn, args, iters=100):
    out = fn(*args)
    jax.block_until_ready(out)
    # Chain through a data dependency so executions cannot overlap.
    t0 = time.perf_counter()
    carry = 0.0
    for _ in range(iters):
        out = fn(args[0], args[1] + carry)
        carry = 0.0 * out[0, 0]
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3, out


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    rng = np.random.default_rng(0)
    idx = rng.integers(0, N, (TILES * TE, 1)).astype(np.int32)
    tab = rng.normal(size=(N, D)).astype(np.float32)
    msg = rng.normal(size=(TILES * TE, D)).astype(np.float32)
    idx_j, tab_j, msg_j = map(jnp.asarray, (idx, tab, msg))

    want_g = np.asarray(tab)[idx[:, 0]]
    want_s = np.zeros((N, D), np.float32)
    np.add.at(want_s, idx[:, 0], msg)

    log(f"gather/scatter microbench: N={N} D={D} TE={TE} tiles={TILES} "
        f"({TILES * TE} rows) on {jax.default_backend()}")
    for name, kern in [
        ("gather_onehot", _gather_onehot_kernel),
        ("gather_take", _gather_take_kernel),
        ("gather_loop", _gather_loop_kernel),
    ]:
        try:
            fn = make_gather(kern)
            dt, out = bench(fn, (idx_j, tab_j))
            err = float(np.abs(np.asarray(out) - want_g).max())
            gbps = TILES * TE * D * 4 * 2 / (dt / 1e3) / 1e9
            log(f"{name}: {dt:.3f} ms ({gbps:.0f} GB/s eff) max|err|={err:.1e}")
        except Exception as ex:  # noqa: BLE001 — report unsupported lowerings
            log(f"{name}: FAILED — {type(ex).__name__}: {str(ex)[:200]}")

    for name, kern in [
        ("scatter_onehot", _scatter_onehot_kernel),
        ("scatter_loop", _scatter_loop_kernel),
    ]:
        try:
            fn = make_scatter(kern)
            dt, out = bench(fn, (idx_j, msg_j))
            err = float(np.abs(np.asarray(out) - want_s).max())
            log(f"{name}: {dt:.3f} ms max|err|={err:.1e}")
        except Exception as ex:  # noqa: BLE001
            log(f"{name}: FAILED — {type(ex).__name__}: {str(ex)[:200]}")


if __name__ == "__main__":
    main()
