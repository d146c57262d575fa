"""Bounded, order-preserving parallel read-ahead.

The reference's dataset packers fork across scp shards
(``tools_pfile/pfile_noisy.pl:28-36``); tpu_se's streaming builders keep
a single in-order writer and run the reads ahead on a thread pool instead
(numpy releases the GIL).  The window bound keeps memory at O(jobs)
items regardless of corpus size.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, TypeVar

T = TypeVar("T")
R = TypeVar("R")


def ordered_readahead(items: Iterable[T], fn: Callable[[T], R],
                      jobs: int) -> Iterator[R]:
    """Yield ``fn(item)`` in input order with up to ``2*jobs`` items being
    read ahead concurrently.  ``jobs <= 1`` degrades to a plain map."""
    items = list(items)
    if jobs <= 1:
        for it in items:
            yield fn(it)
        return
    with ThreadPoolExecutor(max_workers=jobs) as pool:
        window = 2 * jobs
        pending: dict[int, object] = {}
        try:
            for i in range(len(items)):
                for j in range(i, min(i + window, len(items))):
                    if j not in pending:
                        pending[j] = pool.submit(fn, items[j])
                yield pending.pop(i).result()
        finally:
            for fut in pending.values():
                fut.cancel()
