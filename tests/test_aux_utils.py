"""Smoke tests for auxiliary subsystems: plotting, profiling, distributed."""

import os

import numpy as np

from stjep_tpu.utils.plotting import plot_alignment, plot_attention
from stjep_tpu.utils.profiling import StepTimer, memory_stats


def test_plot_alignment(tmp_path):
    path = str(tmp_path / "align.png")
    att = np.random.RandomState(0).rand(4, 5)
    plot_alignment(att, path, src=list("abcde"), hyp=list("wxyz"),
                   ref=list("abcd"))
    assert os.path.getsize(path) > 1000


def test_plot_attention(tmp_path):
    path = str(tmp_path / "att.png")
    att = np.random.RandomState(1).rand(6, 6)
    plot_attention(att, path, words=list("abcdef"), words_right=list("uvwxyz"))
    assert os.path.getsize(path) > 1000


def test_step_timer():
    t = StepTimer()
    for _ in range(3):
        t.start()
        t.stop(np.ones(3))
    s = t.summary()
    assert s["steps"] == 3 and s["mean_s"] >= 0


def test_memory_stats():
    s = memory_stats()
    assert s["host_rss_mb"] > 0


def test_distributed_single_process():
    from stjep_tpu.parallel.distributed import is_primary, local_batch_slice

    assert is_primary()
    sl = local_batch_slice(32)
    assert sl == slice(0, 32)
