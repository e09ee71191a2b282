"""Device-side profiling: trace parsing and the executor integration
(utils/profiling.py — the reference's per-dispatch GPU timestamps,
vulkan.c:2616-2637; true device times need a real accelerator, so CPU
tests validate the parser against a synthetic trace and the zero-time
fallback)."""

import gzip
import json
import os

import numpy as np

from ogl_beamforming_tpu.params.enums import DataKind, ShaderKind
from ogl_beamforming_tpu.pipeline.executor import Beamformer
from ogl_beamforming_tpu.utils.profiling import (DeviceProfile, _parse_trace,
                                                 device_time)

from test_pipeline import _make_params


def _write_trace(tmpdir, events):
    d = os.path.join(tmpdir, "plugins", "profile", "2026_01_01_00_00_00")
    os.makedirs(d)
    with gzip.open(os.path.join(d, "vm.trace.json.gz"), "wt") as f:
        json.dump({"traceEvents": events}, f)


def test_parse_trace_sums_device_modules_and_ops(tmp_path):
    events = [
        # device process with module + op lanes (the axon TPU layout)
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "pid": 3, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        # host process must be ignored even with identically-named lanes
        {"ph": "M", "pid": 701, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 701, "tid": 9, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        {"ph": "X", "pid": 3, "tid": 2, "name": "jit_fn(1)", "dur": 100.0},
        {"ph": "X", "pid": 3, "tid": 2, "name": "jit_fn(2)", "dur": 50.0},
        {"ph": "X", "pid": 3, "tid": 3, "name": "run.1", "dur": 90.0},
        {"ph": "X", "pid": 3, "tid": 3, "name": "copy.1", "dur": 5.0},
        {"ph": "X", "pid": 3, "tid": 3, "name": "copy.1", "dur": 5.0},
        {"ph": "X", "pid": 701, "tid": 9, "name": "host_noise", "dur": 999.0},
    ]
    _write_trace(tmp_path, events)
    prof = _parse_trace(str(tmp_path))
    assert abs(prof.module_seconds - 150e-6) < 1e-12
    assert abs(prof.op_seconds["run.1"] - 90e-6) < 1e-12
    assert abs(prof.op_seconds["copy.1"] - 10e-6) < 1e-12  # aggregated
    assert "host_noise" not in prof.op_seconds
    assert prof.top_ops[0][0] == "run.1"


def test_device_time_runs_on_cpu(rng):
    """CPU traces carry no device lanes: device_time must still run the
    fn, parse the trace, and report zero device time (not crash)."""
    import jax
    import jax.numpy as jnp
    fn = jax.jit(lambda x: jnp.sum(x * 2.0))
    prof = device_time(fn, jnp.ones((64, 64)))
    assert isinstance(prof, DeviceProfile)
    assert prof.module_seconds == 0.0


def test_device_stage_timing_falls_back_on_cpu(rng):
    """stage_timing="device" must fall back to wall-clock calibration when
    traces carry no device lanes (CPU) — stats stay nonzero and per-stage
    distinct, exactly like the default mode."""
    c, a, s = 8, 4, 256
    bf = Beamformer(voxel_block=128, stage_timing="device")
    bf.push_parameters(_make_params(c, a, s))
    bf.push_pipeline([ShaderKind.Decode, ShaderKind.DAS], DataKind.Int16)
    raw = rng.integers(-512, 512, (c, a * s)).astype(np.int16)
    bf.push_data_with_compute(raw)
    row = (bf.stats._frame_index - 1) % 32
    times = [bf.stats.table.times[row, i] for i in range(2)]
    assert all(t > 0 for t in times)


def test_profile_device_stages_cpu_fallback(rng):
    """The executor method composes stages and returns one entry per
    pipeline stage (zero seconds on CPU), leaving compute unaffected."""
    c, a, s = 8, 4, 256
    bf = Beamformer(voxel_block=128)
    bf.push_parameters(_make_params(c, a, s))
    bf.push_pipeline([ShaderKind.Decode, ShaderKind.DAS], DataKind.Int16)
    rf = rng.integers(-512, 512, (c, a, s)).astype(np.int16)
    times = bf.profile_device_stages(rf, record=True)
    assert [k for k, _ in times] == [ShaderKind.Decode, ShaderKind.DAS]
    assert all(t == 0.0 for _, t in times)      # no device lanes on CPU
    row = (bf.stats._frame_index - 1) % 32
    assert bf.stats.table.times[row, 0] == 0.0
