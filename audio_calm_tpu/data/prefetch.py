"""Background-thread batch prefetching.

The host has few cores and the reference leaned on 5 dataloader workers
(train_calm.py dataloader_num_workers); here a single daemon thread keeps a
small queue of ready batches so host-side loading (file IO, padding,
SpecAugment) overlaps device steps.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

_SENTINEL = object()


def prefetch(iterable: Iterable, buffer_size: int = 4) -> Iterator:
    """Wrap an iterator so items are produced in a background thread."""
    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    err: list = []

    def worker():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # surface producer errors to the consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
