"""Device-side timing via jax.profiler traces.

The tunneled TPU attach has a ~0.65 ms/call dispatch floor and a 25-40 ms
readback RTT, so wall-clock timing of sub-millisecond programs measures
the tunnel, not the device (PERFORMANCE.md round 4).  The profiler's
Chrome trace records true device-side XLA module/op durations — the TPU
analogue of the reference bracketing every dispatch with GPU timestamps
(vulkan.c:2616-2637, beamformer_core.c:1602-1628).

``device_time(fn, *args)`` runs one call under ``jax.profiler.trace`` and
returns the device busy time plus a per-op breakdown parsed from the
trace (no tensorflow/tensorboard dependency: the trace.json.gz is plain
Chrome trace JSON).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import tempfile
from dataclasses import dataclass

import jax


@dataclass
class DeviceProfile:
    """One traced call's device-side timing."""

    module_seconds: float      # sum of device XLA-module durations
    op_seconds: dict           # op name -> total seconds (device XLA Ops)

    @property
    def top_ops(self):
        return sorted(self.op_seconds.items(), key=lambda kv: -kv[1])


def _parse_trace(logdir: str) -> DeviceProfile:
    files = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        raise RuntimeError("profiler produced no trace.json.gz")
    data = json.load(gzip.open(max(files, key=os.path.getmtime)))
    events = data.get("traceEvents", [])

    # device pids: process_name metadata containing "device:"; thread ids
    # for the module/op lanes come from thread_name metadata
    device_pids = set()
    module_tids = {}
    op_tids = {}
    for e in events:
        if e.get("ph") != "M":
            continue
        name = (e.get("args") or {}).get("name", "")
        if e.get("name") == "process_name" and "device:" in name.lower():
            device_pids.add(e.get("pid"))
        elif e.get("name") == "thread_name":
            if name == "XLA Modules":
                module_tids.setdefault(e.get("pid"), set()).add(e.get("tid"))
            elif name == "XLA Ops":
                op_tids.setdefault(e.get("pid"), set()).add(e.get("tid"))

    module_us = 0.0
    op_us: dict = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        if e.get("tid") in module_tids.get(e.get("pid"), ()):
            module_us += e.get("dur", 0.0)
        elif e.get("tid") in op_tids.get(e.get("pid"), ()):
            op_us[e["name"]] = op_us.get(e["name"], 0.0) + e.get("dur", 0.0)
    return DeviceProfile(module_seconds=module_us * 1e-6,
                         op_seconds={k: v * 1e-6 for k, v in op_us.items()})


def device_time(fn, *args, warmup: int = 1, logdir: str | None = None,
                **kwargs) -> DeviceProfile:
    """Trace ONE call of ``fn(*args, **kwargs)`` and return its device
    profile.  ``warmup`` un-traced calls first keep compilation out of the
    trace.  Readback of the result is forced inside the trace window so
    asynchronously-enqueued device work is captured completely."""
    from .transfer import sync
    for _ in range(max(warmup, 0)):
        sync(fn(*args, **kwargs))
    tmp = logdir or tempfile.mkdtemp(prefix="bf_prof_")
    with jax.profiler.trace(tmp):
        sync(fn(*args, **kwargs))
    return _parse_trace(tmp)
