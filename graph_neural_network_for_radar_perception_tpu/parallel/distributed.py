"""Multi-host orchestration: jax.distributed init, hybrid meshes, and
per-host batch feeding.

The reference is strictly single-process (SURVEY.md §2: zero hits for any
collective or multiprocessing); this subsystem is designed fresh for TPU
pod slices.  The recipe is the standard JAX one:

1. every process calls :func:`init_distributed` (coordinator address +
   process count + id) before touching devices;
2. a single logical ``('data', 'graph')`` mesh is laid out so the ``data``
   axis varies slowest over *processes* — gradient all-reduce over ``data``
   rides DCN between hosts, while the ``graph`` (edge-partitioning) axis
   stays inside a host on ICI;
3. each process builds only its own shard of every global batch
   (:func:`process_local_batch_slice`) and assembles global arrays with
   ``jax.make_array_from_process_local_data``
   (:func:`globalize_batch`) — no host ever materialises the full batch;
4. the jitted train step is identical to the single-process one: XLA's
   SPMD partitioner inserts the DCN/ICI collectives.

Correctness is testable without a pod: 2 CPU processes × 4 virtual
devices each (tests/test_multihost.py) must produce bit-comparable
metrics to one process with 8 devices.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    """Initialise the multi-process JAX runtime.

    On Cloud TPU all arguments are auto-detected from the metadata server
    and may be omitted; on CPU/GPU (and in tests) pass them explicitly.
    No-op when called for a single-process run (num_processes in (None, 1)
    and no coordinator given).
    """
    if coordinator_address is None and (num_processes or 1) == 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def make_multihost_mesh(n_graph: int = 1) -> Mesh:
    """2-D ('data', 'graph') mesh over all global devices.

    Device order: processes vary slowest along ``data``, so the boundary
    between hosts cuts only the ``data`` axis (gradient psum over DCN);
    the ``graph`` axis is always within one host's devices (halo/psum
    over ICI).  Requires local_device_count % n_graph == 0.
    """
    n_local = jax.local_device_count()
    n_proc = jax.process_count()
    assert n_local % n_graph == 0, (
        f"graph axis ({n_graph}) must divide local device count ({n_local})"
    )
    # jax.devices() is globally consistent and ordered by process index.
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    arr = np.asarray(devs).reshape(n_proc * (n_local // n_graph), n_graph)
    return Mesh(arr, axis_names=("data", "graph"))


def process_local_batch_slice(global_batch: int, mesh: Mesh) -> slice:
    """The slice of the global batch THIS process must build.

    The 'data' mesh axis is laid out process-major (make_multihost_mesh),
    so each process owns a contiguous chunk of the batch axis.
    """
    n_proc = jax.process_count()
    assert global_batch % n_proc == 0, (
        f"global batch {global_batch} must divide by process count {n_proc}"
    )
    per = global_batch // n_proc
    pid = jax.process_index()
    return slice(pid * per, (pid + 1) * per)


def globalize_batch(mesh: Mesh, local_batch, specs=None):
    """Assemble a global (distributed) batch from per-process local shards.

    ``local_batch`` is a pytree of host (numpy) arrays holding only this
    process's rows of the batch axis; ``specs`` is a matching pytree of
    PartitionSpec (default: axis 0 over 'data', everything else
    replicated).  Returns a pytree of global jax.Arrays usable by a jitted
    step exactly like a single-process batch.
    """
    if specs is None:
        specs = jax.tree.map(lambda _: P("data"), local_batch)

    def make(x, spec):
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(x)
        )

    return jax.tree.map(make, local_batch, specs)


def replicated_create_state(cfg, mesh: Mesh, seed: int = 0):
    """Create a TrainState as *global* fully-replicated arrays.

    In a multi-process runtime, arrays built eagerly by one process are
    process-local and cannot enter a pjit program over the global mesh;
    constructing the state inside jit with replicated out_shardings makes
    every leaf a global array owned by all processes at once.
    """
    from ..train.steps import create_train_state

    repl = NamedSharding(mesh, P())

    @partial(jax.jit, static_argnums=(), out_shardings=repl)
    def build(seed_arr):
        return create_train_state(cfg, jax.random.key(seed_arr[0]))

    return build(np.asarray([seed], np.uint32))


def assert_same_across_processes(tree, name: str = "tree") -> None:
    """Cheap cross-process consistency check: allgathers a host-side
    fingerprint of the tree and verifies every process holds the same
    value (guards against divergent params after a missed
    broadcast/restore).  Leaves must be process-addressable (replicated)."""
    from jax.experimental import multihost_utils

    fp = 0.0
    for i, x in enumerate(jax.tree.leaves(tree)):
        fp += float(np.sum(np.asarray(jax.device_get(x), np.float64))) * (
            i % 13 + 1
        )
    fps = multihost_utils.process_allgather(np.float64(fp))
    if not np.allclose(fps, fps[0], rtol=1e-9, atol=1e-12):
        raise AssertionError(
            f"{name} differs across processes: {np.asarray(fps)}"
        )


def multihost_train_setup(
    cfg,
    n_graph: int = 1,
    graph_partition: str = "edge",
    halo: int = 16,
) -> Tuple[Mesh, "object"]:
    """Mesh + sharded train step for a multi-host run.

    Returns (mesh, train_step); the step is the same pjit program as
    parallel/sharded.make_dp_train_step (n_graph == 1),
    make_edge_sharded_train_step (n_graph > 1, graph_partition='edge'),
    or halo.make_halo_train_step (graph_partition='halo' — the
    owner-computes flagship path; requires spatially-sorted frames and a
    static halo width) — multi-host changes only where the data comes
    from, not the compiled program.
    """
    from .halo import make_halo_train_step
    from .sharded import make_dp_train_step, make_edge_sharded_train_step

    mesh = make_multihost_mesh(n_graph=n_graph)
    if n_graph == 1:
        step = make_dp_train_step(cfg, mesh)
    elif graph_partition == "halo":
        step = make_halo_train_step(cfg, mesh, halo)
    else:
        step = make_edge_sharded_train_step(cfg, mesh)
    return mesh, step
