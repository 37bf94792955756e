"""Double-buffered host -> device prefetch.

The reference overlaps input with compute via torch DataLoader worker
processes (`D-Fine/temporal_dfine.py:259-266`, num_workers=4 + pin_memory).
The TPU-native equivalent: a background thread producing host batches while
``jax.device_put`` transfers the *next* batch asynchronously (JAX transfers
are async; dispatching the put for batch k+1 before batch k's step retires
overlaps PCIe/ICI transfer with TPU compute), optionally sharded over a
mesh for data parallelism.
"""

from __future__ import annotations

import collections
import queue
import threading
from typing import Iterable, Iterator, Optional

import jax


def device_prefetch(iterable: Iterable, size: int = 2,
                    sharding: Optional[jax.sharding.Sharding] = None
                    ) -> Iterator:
    """Yield device-resident batches with ``size`` transfers in flight.

    Each batch (a pytree of numpy arrays) is placed with ``device_put``
    (async) before the previous one is consumed — classic double buffering
    when ``size=2``.
    """
    put = (lambda b: jax.device_put(b, sharding)) if sharding is not None \
        else jax.device_put
    buf = collections.deque()
    it = iter(iterable)
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield buf.popleft()


class ThreadedHostLoader:
    """Run a (re-iterable) host batch source on a background thread.

    Host-side analogue of DataLoader workers: parsing/augmentation runs off
    the main thread so the training loop never waits on numpy work.
    """

    _DONE = object()

    def __init__(self, source: Iterable, capacity: int = 4):
        self.source = source
        self.capacity = capacity

    def __iter__(self) -> Iterator:
        q: "queue.Queue" = queue.Queue(maxsize=self.capacity)
        err = []

        def _worker():
            try:
                for item in self.source:
                    q.put(item)
            except BaseException as e:  # surface worker errors on the consumer
                err.append(e)
            finally:
                q.put(self._DONE)

        t = threading.Thread(target=_worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is self._DONE:
                if err:
                    raise err[0]
                return
            yield item


def prefetch_to_device(source: Iterable, *, size: int = 2,
                       sharding: Optional[jax.sharding.Sharding] = None,
                       host_capacity: int = 4) -> Iterator:
    """Threaded host loading + double-buffered device transfer, composed."""
    return device_prefetch(ThreadedHostLoader(source, host_capacity), size,
                           sharding)
