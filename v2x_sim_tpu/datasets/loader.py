"""Background-thread batch prefetcher.

The reference overlaps IO with compute via torch DataLoader worker
processes (SURVEY.md §3.2 boundary); here a single background thread +
bounded queue suffices because the heavy lifting (voxelize, target
assignment) already runs on-device and the host side is the native C++
reader / numpy scene generation, which release the GIL.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional


class Prefetcher:
    """Wraps a batch iterable; keeps `depth` batches ready ahead of time."""

    _DONE = object()

    def __init__(self, source: Iterable, depth: int = 2):
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._fill, args=(source,), daemon=True
        )
        self._thread.start()

    def _fill(self, source):
        try:
            for item in source:
                self._q.put(item)
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            self._q.put(self._DONE)

    def __iter__(self) -> Iterator:
        while True:
            item = self._q.get()
            if item is self._DONE:
                if self._err is not None:
                    raise self._err
                return
            yield item


def prefetch(source: Iterable, depth: int = 2) -> Iterator:
    """Iterate `source` with background prefetching."""
    return iter(Prefetcher(source, depth))


def device_prefetch(
    source: Iterable, stage: Callable, depth: int = 2
) -> Iterator:
    """Prefetch with an on-thread device stage: `stage(raw)` (typically
    `lambda raw: module.prepare_batch(to_dev(raw))`) runs inside the
    prefetch thread, so the host->device transfer AND the prepare
    dispatch for batch N+1 are enqueued while the main thread blocks on
    batch N's train step. jax dispatch is thread-safe and asynchronous;
    over the tunneled single-chip link the transfer is the dominant term
    of the disk pipeline (docs/PERF.md round-5 decomposition), and
    serializing it behind the step was most of the r4 train vs
    train_cached gap (84.7 vs 51.2 scenes/sec, BENCH_r04)."""
    return prefetch((stage(raw) for raw in source), depth)
