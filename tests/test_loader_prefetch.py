"""host_prefetch / prefetch_to_device semantics (data/loader.py):
exception propagation and early-abandonment cleanup."""

import threading
import time

import pytest

from stjep_tpu.data.loader import host_prefetch, prefetch_to_device


def test_host_prefetch_order_and_completion():
    assert list(host_prefetch(iter(range(10)), size=2)) == list(range(10))


def test_host_prefetch_reraises_producer_exception():
    def bad():
        yield 1
        raise ValueError("boom")

    got = []
    with pytest.raises(ValueError, match="boom"):
        for x in host_prefetch(bad(), size=2):
            got.append(x)
    assert got == [1]


def test_host_prefetch_abandonment_stops_producer():
    """Breaking out of the stream must unblock and stop the producer thread
    instead of leaving it parked on a full queue holding batches."""
    produced = []

    def src():
        for i in range(1000):
            produced.append(i)
            yield i

    g = host_prefetch(src(), size=2)
    next(g)
    next(g)
    g.close()
    time.sleep(0.5)
    n0 = len(produced)
    time.sleep(0.3)
    assert len(produced) == n0  # producer stopped
    assert n0 < 1000


def test_prefetch_to_device_stages_and_reraises():
    import numpy as np

    batches = [{"x": np.ones((2, 2), np.float32) * i} for i in range(3)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 3
    assert float(out[2]["x"][0, 0]) == 2.0

    def bad():
        yield batches[0]
        raise RuntimeError("io fell over")

    with pytest.raises(RuntimeError, match="io fell over"):
        list(prefetch_to_device(bad(), size=2))
