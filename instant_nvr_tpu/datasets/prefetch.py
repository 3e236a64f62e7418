"""Host-side async batch prefetching.

TPU replacement for the reference's CUDA-stream device prefetch queue
(``lib/train/trainers/trainer.py:64-135``, depth ``cfg.device_prefetch=8``):
a worker thread prepares numpy batches ahead of the training loop and
``jax.device_put`` stages them; XLA overlaps the H2D copies with compute, so
no manual stream juggling is needed (SURVEY.md §2.10).
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional


class Prefetcher:
    """Runs ``producer(i)`` for i in ``indices`` on a thread, depth-bounded."""

    def __init__(self, producer: Callable[[int], dict], indices,
                 depth: int = 8, device_put: Optional[Callable] = None):
        self.producer = producer
        self.indices = list(indices)
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self.device_put = device_put
        self._err = None
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self):
        try:
            for i in self.indices:
                b = self.producer(i)
                if self.device_put is not None:
                    b = self.device_put(b)
                self.q.put(b)
        except BaseException as e:  # surface worker errors to the consumer
            self._err = e
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
