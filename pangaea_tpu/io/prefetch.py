"""Background-thread iterator prefetch.

The feature passes interleave host work (gzip inflate, FASTQ parse, numpy
packing) with device work (kernel dispatch). JAX dispatch is async, but
the host loop still serializes batch *construction* with device-result
syncs; running the producer in a daemon thread with a small queue
overlaps the two (the reference gets the same overlap from its
ThreadPool, count_kmer.cpp:203)."""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def prefetch(it: Iterable[T], depth: int = 2) -> Iterator[T]:
    q: queue.Queue = queue.Queue(maxsize=depth)
    err = []

    def worker():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:  # surfaced on the consumer side
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
