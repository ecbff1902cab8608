"""Host -> device prefetch: overlap data transfer with device compute.

The reference overlaps host work with GPU compute via DataLoader worker
processes (``baseline.py:188-189``); on this single-core host the equivalent
lever is *asynchronous dispatch*: ``jax.device_put`` returns immediately, so
pushing the next batch while the current step runs hides the transfer. A
small ring of in-flight batches keeps the device queue fed.
"""

from __future__ import annotations

from collections import deque
from typing import Iterable, Iterator, Optional

import jax


def device_prefetch(iterator: Iterable, size: int = 2,
                    sharding: Optional[object] = None) -> Iterator:
    """Yield items from ``iterator`` with ``size`` batches already in flight.

    Items may be arrays or (nested) tuples/dicts of arrays; each leaf is
    ``device_put`` (optionally with a ``NamedSharding``) ahead of use.
    """
    put = (lambda a: jax.device_put(a, sharding)) if sharding is not None \
        else jax.device_put
    it = iter(iterator)
    buf: deque = deque()
    try:
        for _ in range(size):
            buf.append(jax.tree.map(put, next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(jax.tree.map(put, next(it)))
        except StopIteration:
            pass
        yield out
