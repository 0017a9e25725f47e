"""Background prefetch of training batches onto the device.

The reference leans on torch DataLoader workers (usually ``num_workers: 0``
with an in-RAM cache, bsi/data/h5image.py). Here the host-side gather
(fancy-index + augmentation) and the device transfer run on a background
thread a fixed depth ahead of the training loop, so the accelerator never
waits on input between steps. ``jax.device_put`` is async, so depth 2 is
enough to hide both the gather and the transfer.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator


class DevicePrefetcher:
    """Wrap a host batch iterator; yields device arrays ``depth`` ahead."""

    def __init__(self, host_iter: Iterator, put_fn: Callable, depth: int = 2):
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._host_iter = host_iter
        self._put_fn = put_fn
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self) -> None:
        try:
            for batch in self._host_iter:
                if self._stop.is_set():
                    return
                self._queue.put(self._put_fn(batch))
        except Exception as e:  # surface worker errors to the consumer
            self._queue.put(e)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if isinstance(item, Exception):
            raise item
        return item

    def close(self) -> None:
        self._stop.set()
        # unblock the worker if it is waiting to put
        try:
            self._queue.get_nowait()
        except queue.Empty:
            pass
