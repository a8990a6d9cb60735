"""Profiling helpers — the aux-subsystem parity for the reference's tracing
(SURVEY.md §5: cudaEvent timers in every launcher, autograd-profiler name
extraction, --ptxas-options=-v occupancy dumps).

TPU equivalents:
  * trace(): jax.profiler context writing a TensorBoard-loadable trace.
  * kernel_report(): measured time vs roofline for a callable, using the
    chained device timer (the cudaEvent analogue that works through an
    unreliable host link).
  * memory_summary(): device memory stats (when the backend exposes them).
"""
from __future__ import annotations

import contextlib
from typing import Callable, Optional

import jax

from lowbitdnn_project_tpu.bench.roofline import (
    KernelCost,
    detect_chip,
    roofline_pct,
    speed_of_light_s,
)
from lowbitdnn_project_tpu.utils.timing import chained_device_time


@contextlib.contextmanager
def trace(logdir: str = "/tmp/lowbit_trace"):
    """jax.profiler trace context (view with tensorboard --logdir)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def kernel_report(step: Callable, init, cost: KernelCost,
                  dtype: str = "int8", name: str = "kernel",
                  lo: int = 20, hi: int = 220) -> dict:
    """Measure a chained step and report time / TOPS / %roofline."""
    chip = detect_chip()
    t = chained_device_time(step, init, lo=lo, hi=hi)
    rep = {
        "name": name,
        "chip": chip.name,
        "time_us": round(t * 1e6, 2),
        "tops": round(cost.flops / t / 1e12, 1),
        "sol_us": round(speed_of_light_s(cost, chip, dtype) * 1e6, 2),
        "roofline_pct": round(roofline_pct(t, cost, chip, dtype), 1),
    }
    return rep


def memory_summary() -> Optional[dict]:
    try:
        dev = jax.devices()[0]
        stats = dev.memory_stats()
        return dict(stats) if stats else None
    except Exception:
        return None
