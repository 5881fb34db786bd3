"""Background input prefetch.

The reference overlaps batch assembly with the train step via 4 torch
DataLoader workers (AFSD/thumos14/train.py:345). Here a daemon thread
assembles and device-places batch i+1 while step i runs on the TPU, with
a bounded queue for backpressure (double/triple buffering into HBM).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Optional

_SENTINEL = object()


def prefetch(iterable: Iterable[Any],
             transform: Optional[Callable[[Any], Any]] = None,
             depth: int = 2) -> Iterator[Any]:
    """Yield `transform(item)` for each item, computed `depth` items
    ahead on a background thread. The worker starts immediately (not on
    first next()), so the first batch assembles while the consumer is
    still compiling/warming. Worker exceptions re-raise at the consuming
    site; the thread is a daemon and dies with the interpreter."""
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))

    def worker():
        try:
            for item in iterable:
                q.put(transform(item) if transform is not None else item)
        except BaseException as e:  # noqa: BLE001 - re-raised on consumer
            q.put((_SENTINEL, e))
            return
        q.put((_SENTINEL, None))

    t = threading.Thread(target=worker, daemon=True,
                         name='opental-prefetch')
    t.start()

    def consume():
        while True:
            item = q.get()
            if isinstance(item, tuple) and len(item) == 2 \
                    and item[0] is _SENTINEL:
                if item[1] is not None:
                    raise item[1]
                return
            yield item

    return consume()
