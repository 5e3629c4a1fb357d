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


def greedy_runs(it: Iterable[T], max_run: int, is_runnable,
                depth: int = 0) -> Iterator[T | list]:
    """Producer-thread iterator that groups CONSECUTIVE runnable items
    into lists of whatever is available *right now* (1..max_run), never
    blocking to grow a run.

    Used by the upload stage: fusing many batches into one host->device
    transfer amortizes per-call latency, but waiting for a fixed fusion
    count would serialize against the parser. Greedy runs adapt: when the
    parser is ahead, runs approach max_run (big fused transfers); when
    the parser is the bottleneck, runs shrink to 1 and the pipeline stays
    busy. Non-runnable items are yielded as-is, in order.
    """
    q: queue.Queue = queue.Queue(maxsize=depth or 2 * max_run)
    err: list = []

    def worker():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:
            err.append(e)
        finally:
            q.put(_SENTINEL)

    threading.Thread(target=worker, daemon=True).start()
    pending = None
    while True:
        item = q.get() if pending is None else pending
        pending = None
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        if not is_runnable(item):
            yield item
            continue
        run = [item]
        while len(run) < max_run:
            try:
                nxt = q.get_nowait()
            except queue.Empty:
                break
            if nxt is _SENTINEL or not is_runnable(nxt):
                pending = nxt
                break
            run.append(nxt)
        yield run
