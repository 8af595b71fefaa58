"""Background-thread host→device input pipeline.

The reference builds every sample synchronously inside __getitem__ with
num_workers=0 and transfers tensors mid-preprocessing
(datagen_gnn.py:120-124, set_param_for_training_gnn.py:97-98) — the chip
starves while numpy runs.  Here a worker pool builds padded batches ahead
of the training loop and a prefetcher keeps `buffer_size` batches already
resident on device, so the next step's inputs are on-chip before the
current step retires.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax


class _Stop:
    pass


def threaded_batches(
    make_iterator: Callable[[], Iterator],
    *,
    num_workers: int = 2,
    queue_size: int = 4,
) -> Iterator:
    """Run `num_workers` independent batch iterators in threads, merging
    their outputs into one queue.  Each worker calls make_iterator() once
    (pass worker-seeded factories for determinism control)."""
    q: "queue.Queue" = queue.Queue(maxsize=queue_size)
    stop = threading.Event()

    def worker(idx: int):
        it = make_iterator()
        try:
            for item in it:
                if stop.is_set():
                    return
                q.put(item)
        finally:
            q.put(_Stop())

    threads = [
        threading.Thread(target=worker, args=(i,), daemon=True)
        for i in range(num_workers)
    ]
    for t in threads:
        t.start()

    finished = 0
    try:
        while finished < num_workers:
            item = q.get()
            if isinstance(item, _Stop):
                finished += 1
                continue
            yield item
    finally:
        stop.set()


def device_prefetch(
    batches: Iterator,
    *,
    buffer_size: int = 2,
    sharding: Optional[object] = None,
) -> Iterator:
    """Keep `buffer_size` batches already transferred to device (with the
    given sharding) ahead of the consumer — the standard JAX prefetch
    pattern replacing the reference's in-__getitem__ .to(device)."""
    import collections

    buf = collections.deque()

    def put(batch):
        if sharding is not None:
            return jax.tree.map(
                lambda x: jax.device_put(x, sharding), batch
            )
        return jax.tree.map(jax.device_put, batch)

    it = iter(batches)
    try:
        for _ in range(buffer_size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
