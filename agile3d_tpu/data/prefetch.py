"""Host-side batch prefetching — overlap CPU batch assembly with TPU steps.

The reference trains with a 2-worker pinned-memory DataLoader (reference
main.py:118-123); this repo's batch assembly (scan load -> quantize ->
5-level pyramid + kernel maps -> collate) is heavy host work (~1.5 s for a
337k-voxel scene, PERF.md) that round-2 epoch loops ran synchronously
BETWEEN device steps. The prefetcher runs that work on background threads
while the device executes step N, so the epoch is device-bound.

Threads, not processes: the hot parts (the C++ sorted-merge indexer in
sparse/csrc, numpy sorts/stacks) release the GIL, and threads avoid
pickling multi-hundred-MB pyramids across a process boundary.

Determinism: the prepare function receives everything it needs (including
a pre-drawn per-item seed — see engine/train.train_one_epoch); results are
delivered strictly in submission order, so trajectories are IDENTICAL for
every depth, including depth=0 (synchronous passthrough, no thread).
"""

from __future__ import annotations

import threading
from typing import Callable, Iterable, Iterator, Sequence, TypeVar

T = TypeVar("T")
R = TypeVar("R")


class _WorkerError:
    def __init__(self, exc: BaseException):
        self.exc = exc


class BatchPrefetcher:
    """Run ``fn(item)`` over ``items`` on background threads, yielding
    results in order with at most ``depth`` prepared-but-unconsumed
    results in flight.

    depth=0 degenerates to a synchronous map (no threads). workers > 1 is
    allowed but defaults to 1: dataset augmentation draws from a shared
    numpy Generator, and a single worker preserves the draw order exactly
    while still fully overlapping host work with device steps.
    """

    def __init__(self, fn: Callable[[T], R], items: Sequence[T],
                 depth: int = 2, workers: int = 1):
        self._fn = fn
        self._items = list(items)
        self._depth = max(0, depth)
        self._workers = max(1, min(workers, self._depth or 1))
        self._stop = False
        if self._depth > 0:
            self._sem = threading.Semaphore(self._depth)
            self._cv = threading.Condition()
            self._results: dict[int, object] = {}
            self._next_claim = 0
            self._threads = [
                threading.Thread(target=self._work, daemon=True,
                                 name=f"prefetch-{i}")
                for i in range(self._workers)
            ]
            for t in self._threads:
                t.start()

    def _work(self):
        while True:
            self._sem.acquire()
            with self._cv:
                if self._stop or self._next_claim >= len(self._items):
                    return
                i = self._next_claim
                self._next_claim += 1
            try:
                r: object = self._fn(self._items[i])
            except BaseException as e:  # delivered to the consumer
                r = _WorkerError(e)
            with self._cv:
                self._results[i] = r
                self._cv.notify_all()

    def __iter__(self) -> Iterator[R]:
        if self._depth == 0:
            for it in self._items:
                yield self._fn(it)
            return
        try:
            for i in range(len(self._items)):
                with self._cv:
                    while i not in self._results and not self._stop:
                        self._cv.wait(timeout=1.0)
                    if self._stop:
                        return
                    r = self._results.pop(i)
                self._sem.release()
                if isinstance(r, _WorkerError):
                    self.close()
                    raise r.exc
                yield r
        finally:
            self.close()

    def __len__(self) -> int:
        return len(self._items)

    def close(self):
        """Unblock and retire the workers (idempotent)."""
        if self._depth == 0 or self._stop:
            return
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        for _ in range(self._workers):
            self._sem.release()


def prefetch(fn: Callable[[T], R], items: Sequence[T], depth: int = 2,
             workers: int = 1) -> Iterable[R]:
    """Convenience wrapper: ordered prefetching iterable over ``items``."""
    return BatchPrefetcher(fn, items, depth=depth, workers=workers)
