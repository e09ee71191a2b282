"""Profiling helpers.

The TPU analogue of the reference's per-dispatch GPU timestamps and
RenderDoc capture hooks (vulkan.c:2616-2637, beamformer_internal.h:205-222):
``jax.profiler`` traces capture per-op device timelines viewable in
TensorBoard/Perfetto, and :class:`..pipeline.executor.Beamformer` with
``profile=True`` gives per-stage wall times in the stats table.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/bf_trace"):
    """Capture a device trace around a code block::

        with profiling.trace("/tmp/trace"):
            bf.push_data_with_compute(raw)

    Open the result with TensorBoard's profile plugin or Perfetto.
    """
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in traces (the debug-label analogue of
    the reference's vk object labels, vulkan.c:654-656)."""
    import jax
    return jax.profiler.TraceAnnotation(name)
