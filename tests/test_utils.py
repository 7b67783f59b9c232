"""Metrics/timer utility tests."""

import time

from node2vec_tpu.utils import StepTimer, profiler_trace


def test_step_timer_collects_and_summarizes():
    t = StepTimer()
    for _ in range(3):
        with t.measure("step"):
            time.sleep(0.01)
    assert t.count("step") == 3
    assert t.total("step") >= 0.03
    assert t.mean("step") >= 0.01
    s = t.summary()
    assert s["step"]["count"] == 3

    # throughput excludes the first (compile) call
    tp = t.throughput("step", units_per_step=100)
    assert tp > 0
    assert t.throughput("missing", 1) == 0.0


def test_step_timer_exception_safe():
    t = StepTimer()
    try:
        with t.measure("boom"):
            raise RuntimeError("x")
    except RuntimeError:
        pass
    assert t.count("boom") == 1


def test_profiler_trace_noop_without_dir():
    with profiler_trace(None):
        pass  # must not require jax import or start a trace
