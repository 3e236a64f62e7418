"""Host-side async batch prefetching.

TPU replacement for the reference's loader workers + CUDA-stream device
prefetch queue (``lib/datasets/make_dataset.py:122-128`` — 16 worker
processes, pinned memory; ``lib/train/trainers/trainer.py:64-135`` — depth
``cfg.device_prefetch=8``): ``workers`` threads build numpy batches ahead of
the training loop (cv2/PIL/numpy release the GIL on the hot decode/resize
ops, so threads give real parallelism for item construction), a single
stager thread applies ``device_put`` in index order, and XLA overlaps the
H2D copies with compute — no manual stream juggling needed (SURVEY.md
§2.10).  Staging stays single-threaded on purpose: the train loop's device
cache relies on one-writer semantics, and batch order must match
``indices`` exactly for multi-host determinism.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional


class Prefetcher:
    """Runs ``producer(i)`` for i in ``indices`` across ``workers`` threads,
    applies ``device_put`` in order on one stager thread, depth-bounded."""

    def __init__(self, producer: Callable[[int], dict], indices,
                 depth: int = 8, device_put: Optional[Callable] = None,
                 workers: int = 1):
        self.producer = producer
        self.indices = list(indices)
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self.device_put = device_put
        self.depth = depth
        self._err = None
        self._stop = False
        self._threads = []
        self._workers = max(1, int(workers))
        if self._workers == 1:
            self.thread = threading.Thread(target=self._run_serial,
                                           daemon=True)
            self.thread.start()
        else:
            self._cv = threading.Condition()
            self._claim = 0        # next index position a worker may take
            self._next = 0         # next position the stager will emit
            self._ready: dict = {}  # pos -> produced item
            for _ in range(self._workers):
                th = threading.Thread(target=self._produce_loop, daemon=True)
                th.start()
                self._threads.append(th)
            self.thread = threading.Thread(target=self._stage_loop,
                                           daemon=True)
            self.thread.start()
        self._threads.append(self.thread)

    # ---- single-worker path (original behavior) ----
    def _run_serial(self):
        try:
            for i in self.indices:
                if self._stop:
                    return
                b = self.producer(i)
                if self.device_put is not None:
                    b = self.device_put(b)
                self.q.put(b)
        except BaseException as e:  # surface worker errors to the consumer
            self._err = e
        finally:
            self.q.put(None)

    # ---- multi-worker path: parallel produce, ordered single-thread stage
    def _produce_loop(self):
        n = len(self.indices)
        while True:
            with self._cv:
                # bound the reassembly buffer: never run more than
                # depth positions ahead of what the stager has emitted
                while (self._claim - self._next >= self.depth
                       and self._err is None and not self._stop):
                    self._cv.wait()
                if self._err is not None or self._stop or self._claim >= n:
                    return
                pos = self._claim
                self._claim += 1
            try:
                item = self.producer(self.indices[pos])
            except BaseException as e:
                with self._cv:
                    if self._err is None:
                        self._err = e
                    self._cv.notify_all()
                return
            with self._cv:
                self._ready[pos] = item
                self._cv.notify_all()

    def _stage_loop(self):
        n = len(self.indices)
        try:
            while self._next < n and not self._stop:
                with self._cv:
                    while (self._next not in self._ready
                           and self._err is None and not self._stop):
                        self._cv.wait()
                    if self._err is not None or self._stop:
                        break
                    item = self._ready.pop(self._next)
                if self.device_put is not None:
                    item = self.device_put(item)
                self.q.put(item)
                with self._cv:
                    self._next += 1
                    self._cv.notify_all()
        except BaseException as e:
            with self._cv:
                if self._err is None:
                    self._err = e
                self._cv.notify_all()
        finally:
            self.q.put(None)

    def __iter__(self) -> Iterator[dict]:
        while True:
            item = self.q.get()
            if item is None:
                if self._err is not None:
                    raise self._err
                return
            yield item

    def close(self, timeout: float = 10.0) -> None:
        """Stop all threads and release queued batches.

        Call from the consumer's ``finally``: abandoning iteration early
        (train-step exception, max_iter break) otherwise leaves daemon
        threads blocked on ``q.put`` holding up to ``depth`` decoded
        batches — hundreds of MB at 1024^2 reference scale (ADVICE r4).
        Idempotent; safe after normal exhaustion too.
        """
        import time as _time
        self._stop = True
        if hasattr(self, "_cv"):
            with self._cv:
                self._cv.notify_all()
        # drain until the threads exit: a thread blocked on a full queue
        # needs its put() to complete before it can observe _stop
        deadline = _time.monotonic() + timeout
        while (any(th.is_alive() for th in self._threads)
               and _time.monotonic() < deadline):
            try:
                self.q.get(timeout=0.05)
            except queue.Empty:
                pass
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass
        if hasattr(self, "_ready"):
            self._ready.clear()
