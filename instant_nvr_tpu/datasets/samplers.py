"""Index samplers for the training/eval loops.

Rebuild of ``lib/datasets/samplers.py``:
  - :class:`FrameSampler` — every k-th frame for test/val (samplers.py:134-148)
  - :class:`IterationBasedSampler` — fixed number of iterations per epoch
    with reshuffling (samplers.py:50-72)
  - :func:`shard_indices` — rank-sharded deterministic shuffle, the
    data-parallel DistributedSampler equivalent (samplers.py:75-131) keyed by
    ``jax.process_index`` instead of a torch rank.
"""
from __future__ import annotations

from typing import Iterator, List

import numpy as np


class FrameSampler:
    """Sample one view-set every ``interval`` frames."""

    def __init__(self, n_items: int, num_cams: int, interval: int):
        inds = np.arange(n_items).reshape(-1, num_cams)
        self.inds = inds[::interval].ravel().tolist()

    def __iter__(self) -> Iterator[int]:
        return iter(self.inds)

    def __len__(self) -> int:
        return len(self.inds)


class IterationBasedSampler:
    """Yields exactly ``num_iters`` indices per epoch, reshuffled per epoch."""

    def __init__(self, n_items: int, num_iters: int, seed: int = 0,
                 shuffle: bool = True):
        self.n = n_items
        self.num_iters = num_iters
        self.seed = seed
        self.shuffle = shuffle

    def epoch(self, epoch: int) -> List[int]:
        rng = np.random.default_rng(self.seed + epoch)
        out: List[int] = []
        while len(out) < self.num_iters:
            order = rng.permutation(self.n) if self.shuffle else np.arange(self.n)
            out.extend(order.tolist())
        return out[:self.num_iters]


def shard_indices(indices: List[int], process_index: int,
                  process_count: int, pad: bool = True) -> List[int]:
    """Contiguous per-process shard (multi-host data parallel).

    ``pad=True`` wraps the tail so every process gets the same count (like
    torch's DistributedSampler — right for lockstep training).  Eval passes
    ``pad=False``: uneven shards are fine there and wrap-padding would
    double-count the wrapped items in the merged metrics.
    """
    per = (len(indices) + process_count - 1) // process_count
    if pad:
        indices = list(indices) + \
            list(indices[: per * process_count - len(indices)])
    return indices[process_index * per:(process_index + 1) * per]
