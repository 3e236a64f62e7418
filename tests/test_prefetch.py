"""Prefetcher unit tests: ordering, staging hook, and error propagation.

The train loop stages device batches on the prefetch worker thread
(``train/loop.py stage``) — a staging failure must surface in the consumer,
not die silently on the daemon thread.
"""
import pytest

from instant_nvr_tpu.datasets.prefetch import Prefetcher


@pytest.mark.parametrize("workers", [1, 4])
def test_order_and_staging_hook(workers):
    staged = []

    def stage(x):
        staged.append(x)
        return x * 10

    pf = Prefetcher(lambda i: i + 1, range(20), depth=4, device_put=stage,
                    workers=workers)
    out = list(pf)
    assert out == [(i + 1) * 10 for i in range(20)]
    # staging order == index order even with parallel producers (the train
    # loop's device cache relies on one ordered stager)
    assert staged == [i + 1 for i in range(20)]


@pytest.mark.parametrize("workers", [1, 4])
def test_producer_error_surfaces(workers):
    def produce(i):
        if i == 3:
            raise ValueError("boom-producer")
        return i

    pf = Prefetcher(produce, range(8), depth=2, workers=workers)
    with pytest.raises(ValueError, match="boom-producer"):
        list(pf)


@pytest.mark.parametrize("workers", [1, 4])
def test_staging_error_surfaces(workers):
    def stage(x):
        if x == 5:
            raise RuntimeError("boom-stage")
        return x

    pf = Prefetcher(lambda i: i, range(8), depth=2, device_put=stage,
                    workers=workers)
    with pytest.raises(RuntimeError, match="boom-stage"):
        list(pf)


def test_parallel_producers_overlap():
    """With blocking producers, N workers complete ~N items concurrently."""
    import threading
    import time

    barrier = threading.Barrier(4, timeout=10)

    def produce(i):
        if i < 4:  # first 4 items must be in flight simultaneously
            barrier.wait()
        return i

    pf = Prefetcher(produce, range(8), depth=8, workers=4)
    t0 = time.time()
    assert list(pf) == list(range(8))
    assert time.time() - t0 < 10  # serial would deadlock on the barrier


def test_empty_indices():
    assert list(Prefetcher(lambda i: i, [], workers=4)) == []
    assert list(Prefetcher(lambda i: i, [], workers=1)) == []


def test_depth_bound_respected():
    """Producers never run more than depth+queue ahead of the consumer."""
    import time
    produced = []

    pf = Prefetcher(lambda i: produced.append(i) or i, range(64), depth=4,
                    workers=4)
    it = iter(pf)
    next(it)
    time.sleep(0.3)  # give workers time to run ahead if unbounded
    # reassembly buffer (depth) + output queue (depth) + in-flight slack
    assert len(produced) <= 4 + 4 + 4 + 1
    assert list(it) == list(range(1, 64))


def test_close_releases_threads_after_abandoned_iteration():
    """Abandoning iteration + close() must terminate producer/stager threads
    (otherwise they stay blocked on q.put holding decoded batches, ADVICE
    r4) — for both the serial and multi-worker paths."""
    import time

    for workers in (1, 4):
        pf = Prefetcher(lambda i: i, range(256), depth=4, workers=workers)
        it = iter(pf)
        assert next(it) == 0  # iteration started, then abandoned
        pf.close()
        deadline = time.time() + 5
        while any(t.is_alive() for t in pf._threads) and time.time() < deadline:
            time.sleep(0.02)
        assert not any(t.is_alive() for t in pf._threads), \
            f"threads alive after close (workers={workers})"
        assert pf.q.empty()
        pf.close()  # idempotent


def test_close_after_normal_exhaustion():
    pf = Prefetcher(lambda i: i, range(4), workers=2)
    assert list(pf) == [0, 1, 2, 3]
    pf.close()
