"""Host input pipeline: background prefetch + per-host sharding.

The reference overlaps disk I/O with GPU compute via one producer pthread
and a 2-slot double buffer guarded by a mutex/condvar FULL-EMPTY pair
(``BPtrain.cc:15-54``, ``Interface.cc:14-79``).  The equivalent here is a
daemon thread feeding a bounded queue (numpy releases the GIL for the heavy
byte-swap/normalize work, so the overlap is real).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


class PrefetchIterator(Iterator[T]):
    """Iterate ``producers`` on a background thread, ``depth`` items ahead."""

    def __init__(self, producers: Iterable[Callable[[], T]] | Iterator[T],
                 depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: BaseException | None = None
        self._thread = threading.Thread(
            target=self._run, args=(iter(producers),), daemon=True)
        self._thread.start()

    def _run(self, it) -> None:
        try:
            for item in it:
                self._q.put(item() if callable(item) else item)
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            self._q.put(_SENTINEL)

    def __iter__(self):
        return self

    def __next__(self) -> T:
        item = self._q.get()
        if item is _SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def shard_for_host(n_items: int, process_index: int, process_count: int
                   ) -> slice:
    """Contiguous per-host shard of a global work list (DCN-side sharding).

    Multi-host DP: each host loads only its slice of the utterance/chunk
    list; device-side collectives (psum) see the global batch.
    """
    per = n_items // process_count
    extra = n_items % process_count
    lo = process_index * per + min(process_index, extra)
    hi = lo + per + (1 if process_index < extra else 0)
    return slice(lo, hi)
