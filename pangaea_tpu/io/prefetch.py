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


def _put_until(q: "queue.Queue", item, stop: "threading.Event") -> bool:
    """put() that gives up when the consumer abandoned the stream —
    an unconditional put would leave the producer thread blocked forever
    on the bounded queue, pinning the source iterator (and any file
    handles it owns) for the rest of the process."""
    while not stop.is_set():
        try:
            q.put(item, timeout=0.2)
            return True
        except queue.Full:
            continue
    return False


def prefetch(it: Iterable[T], depth: int = 2) -> Iterator[T]:
    q: queue.Queue = queue.Queue(maxsize=depth)
    err = []
    stop = threading.Event()

    def worker():
        try:
            for item in it:
                if not _put_until(q, item, stop):
                    return
        except BaseException as e:  # surfaced on the consumer side
            err.append(e)
        finally:
            _put_until(q, _SENTINEL, stop)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()


def fixed_runs(it: Iterable[T], max_run: int, is_runnable,
               depth: int = 0, ramp: bool = True) -> Iterator[T | list]:
    """Producer-thread iterator that groups CONSECUTIVE runnable items
    into fixed-size lists, with the source driven by a background thread
    so grouping overlaps the consumer.

    Used by the upload stage: fusing batches into one host->device
    transfer amortizes per-call latency. Run sizes are a pure function
    of STREAM POSITION — deliberately NOT "whatever is available now":
    availability-driven runs vary with thread timing, so every run of a
    new length mints fresh compiled shapes for the stacked transfer's
    per-batch slices, and on a remote/tunneled backend those compiles
    land inside the measured (warm-cached) region. With ``ramp`` the
    sizes double from 2 up to ``max_run`` (2, 4, 8, ..., max_run,
    max_run, ...): the first upload ships after two parsed batches
    instead of ``max_run``, so short streams overlap parse with
    transfer, while long streams still amortize at full fusion width.
    The shape set stays O(log max_run) + per-boundary tails.
    """
    q: queue.Queue = queue.Queue(maxsize=depth or 2 * max_run)
    err: list = []
    stop = threading.Event()

    def worker():
        try:
            for item in it:
                if not _put_until(q, item, stop):
                    return
        except BaseException as e:
            err.append(e)
        finally:
            _put_until(q, _SENTINEL, stop)

    threading.Thread(target=worker, daemon=True).start()
    run: list = []
    target = min(2, max_run) if ramp else max_run

    def bump():
        nonlocal target
        if ramp and target < max_run:
            target = min(max_run, target * 2)

    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if run:
                    yield run
                if err:
                    raise err[0]
                return
            if not is_runnable(item):
                if run:
                    yield run
                    run = []
                    bump()
                yield item
                continue
            run.append(item)
            if len(run) == target:
                yield run
                run = []
                bump()
    finally:
        stop.set()
