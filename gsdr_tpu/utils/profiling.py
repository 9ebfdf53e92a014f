"""Profiling helpers: traces + throughput reports.

The reference has no profiling facilities at all (SURVEY.md section 5:
vestigial commented-out printf hooks). Here:

  * ``trace(path)`` — context manager around jax.profiler for TensorBoard
    traces of jitted pipelines;
  * ``throughput_report(step, state, block, ...)`` — samples-per-second
    measurement built on the trustworthy scan-in-jit timer
    (gsdr_tpu.utils.timing) with a structured dict result, suitable for
    regression tracking.
"""

import contextlib

import jax

from gsdr_tpu.utils.timing import time_step


@contextlib.contextmanager
def trace(log_dir):
    """jax.profiler trace context: view with TensorBoard's profile plugin."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def throughput_report(step, state, block, samples_per_step, iters=10,
                      label="", strict=True):
    """Measure a streaming step; returns a structured result dict.

    strict=False reports a dispatch-inclusive throughput FLOOR (flagged
    ``timing_resolved: False``) instead of raising when the workload is
    too small to rise above dispatch-overhead noise at this iteration
    count — for smoke runs; regression tracking should stay strict."""
    try:
        sec = time_step(step, state, block, iters=iters)
        resolved = True
    except RuntimeError:
        if strict:
            raise
        sec = time_step(step, state, block, iters=iters, strict=False)
        resolved = False
    return {
        "label": label,
        "seconds_per_step": sec,
        "samples_per_second": samples_per_step / sec,
        "msamples_per_second": samples_per_step / sec / 1e6,
        "backend": jax.default_backend(),
        "iters": iters,
        "timing_resolved": resolved,
    }
