"""Device-feed prefetching.

The reference's training loop assembles each batch on the host, copies it to
the device, then runs the step — all serially (`/root/reference/train.py:
243-251`). On TPU the copy rides PCIe/the transport while the chip is idle.
This module overlaps the two: a daemon thread walks the loader iterator,
assembles batches (numpy gather or the native C++ window gather) and issues
``jax.device_put`` ahead of the consumer, keeping a bounded queue of batches
already resident (or in flight) on device. ``device_put`` is asynchronous, so
queue depth 2 is enough to hide both host assembly and H2D latency behind the
previous step's compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

_SENTINEL = object()


def prefetch_to_device(iterator: Iterable, size: int = 2,
                       sharding=None) -> Iterator:
    """Wrap a batch iterator so batches are transferred to device ``size``
    steps ahead of the consumer, on a background thread.

    ``sharding``: optional ``jax.sharding.Sharding`` for the batch arrays
    (multi-chip feed); ``None`` = default single-device placement. Elements
    of each batch tuple that are not numpy arrays pass through untouched.

    Exceptions raised by the producer (including by ``device_put``) are
    re-raised in the consumer.
    """
    import jax
    import numpy as np

    q: queue.Queue = queue.Queue(maxsize=max(1, size))

    def put(b):
        if isinstance(b, np.ndarray):
            return (jax.device_put(b, sharding) if sharding is not None
                    else jax.device_put(b))
        return b

    stop = threading.Event()

    def qput(item) -> bool:
        # bounded put that gives up when the consumer is gone — a consumer
        # abandoning the generator mid-epoch (early break, a training-loop
        # exception) must not park this thread on q.put forever with
        # device-resident batches pinned in the queue
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in iterator:
                if isinstance(batch, tuple):
                    ok = qput(tuple(put(b) for b in batch))
                else:
                    ok = qput(put(batch))
                if not ok:
                    return
            qput(_SENTINEL)
        except BaseException as e:           # propagate into the consumer
            qput(e)

    t = threading.Thread(target=producer, daemon=True,
                         name="gwnet-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()      # runs on exhaustion, exceptions, AND generator close
