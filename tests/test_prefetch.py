"""Prefetcher unit tests: ordering, staging hook, and error propagation.

The train loop stages device batches on the prefetch worker thread
(``train/loop.py stage``) — a staging failure must surface in the consumer,
not die silently on the daemon thread.
"""
import pytest

from instant_nvr_tpu.datasets.prefetch import Prefetcher


def test_order_and_staging_hook():
    staged = []

    def stage(x):
        staged.append(x)
        return x * 10

    pf = Prefetcher(lambda i: i + 1, range(20), depth=4, device_put=stage)
    out = list(pf)
    assert out == [(i + 1) * 10 for i in range(20)]
    assert staged == [i + 1 for i in range(20)]


def test_producer_error_surfaces():
    def produce(i):
        if i == 3:
            raise ValueError("boom-producer")
        return i

    pf = Prefetcher(produce, range(8), depth=2)
    with pytest.raises(ValueError, match="boom-producer"):
        list(pf)


def test_staging_error_surfaces():
    def stage(x):
        if x == 5:
            raise RuntimeError("boom-stage")
        return x

    pf = Prefetcher(lambda i: i, range(8), depth=2, device_put=stage)
    with pytest.raises(RuntimeError, match="boom-stage"):
        list(pf)
