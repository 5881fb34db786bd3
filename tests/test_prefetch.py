"""data.prefetch: ordering, transform application, backpressure bound,
and exception propagation."""

import threading
import time

import pytest

from opental_tpu.data.prefetch import prefetch


def test_prefetch_order_and_transform():
    out = list(prefetch(range(20), lambda x: x * 2, depth=3))
    assert out == [x * 2 for x in range(20)]


def test_prefetch_overlaps_producer_with_consumer():
    events = []
    lock = threading.Lock()

    def produce():
        for i in range(4):
            with lock:
                events.append(('p', i))
            yield i

    it = prefetch(produce(), depth=2)
    deadline = time.time() + 10.0
    while time.time() < deadline:  # worker should run ahead on its own
        with lock:
            if len(events) >= 2:
                break
        time.sleep(0.01)
    with lock:
        assert len(events) >= 2  # ran ahead before any consumption
    assert list(it) == list(range(4))


def test_prefetch_propagates_exceptions():
    def gen():
        yield 1
        raise ValueError('boom')

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match='boom'):
        list(it)


def test_prefetch_transform_error_propagates():
    it = prefetch([1, 0], lambda x: 1 // x, depth=1)
    assert next(it) == 1
    with pytest.raises(ZeroDivisionError):
        list(it)
