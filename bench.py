"""Benchmark driver: decode + DAS throughput on the current device.

Reproduces the reference's measurement methodology (BASELINE.md):
  * decode sweep (tests/decode.c): ms/frame + GB/s per transmit count
  * end-to-end decode->DAS chain (tests/throughput.c): frames/s and the
    north-star voxels*channels/s

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` is the achieved fraction of BASELINE.md's target: 80% of the
device roofline for the bench config (the reference publishes no absolute
numbers — BASELINE.json.published is empty — so the roofline target is the
comparison point).

NOTE on timing: on tunneled TPU runtimes ``block_until_ready`` can return at
enqueue; every measurement forces a device readback (utils/transfer.sync).
"""

import argparse
import json
import os
import sys
import threading
import time

import numpy as np


def _progress(msg):
    """Liveness/progress to stderr (stdout stays the one JSON line)."""
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


# ---------------------------------------------------------------------------
# Unattended-run hardening (round-4 VERDICT #1: BENCH_r04.json was rc=124 /
# parsed=null — the driver's `python bench.py` hung at the first device
# touch and the official round record became a timeout).  Three layers:
#
#   1. A persistent on-disk XLA compilation cache (survives the remote
#      Pallas server's cache eviction — cold-cache reruns skip the
#      4-15 min Mosaic recompiles once any run has populated it).
#   2. A bounded link probe BEFORE the first compile: a dead/degraded
#      tunnel yields `{"error": ..., "vs_baseline": 0}` instead of a hang.
#   3. A watchdog that prints the best-known result JSON and exits when
#      the self-imposed wall-clock budget expires, so `timeout 600
#      python bench.py` always leaves one parseable line on stdout.
# ---------------------------------------------------------------------------

WATCHDOG_S = float(os.environ.get("BENCH_WATCHDOG_S", "520"))
# A fresh process pays the axon attach cost on its FIRST device touch —
# measured 80-120 s on a healthy tunnel (the probe is attach + readback,
# not just RTT), so the budget must sit well above it or healthy runs
# misreport as "link dead" (observed at 120 s).
LINK_PROBE_S = float(os.environ.get("BENCH_LINK_PROBE_S", "300"))

_STATE = {"stage": "init", "result": None, "emitted": False,
          "lock": threading.Lock()}


def _emit_and_exit(obj, code=0):
    """Print the one JSON line exactly once (watchdog/main race-safe) and
    hard-exit (os._exit: the main thread may be blocked in native code)."""
    with _STATE["lock"]:
        if _STATE["emitted"]:
            return
        _STATE["emitted"] = True
    sys.stdout.write(json.dumps(obj) + "\n")
    sys.stdout.flush()
    os._exit(code)


def _error_result(msg):
    return {"metric": "DAS voxels*channels/s (unavailable)", "value": 0,
            "unit": "voxel*channel/s", "vs_baseline": 0.0,
            "error": msg[:400]}


def _watchdog_fire():
    res = _STATE["result"]
    if res is None:
        res = _error_result(
            f"watchdog: {WATCHDOG_S:.0f}s budget exceeded at stage "
            f"'{_STATE['stage']}' before the headline completed")
    else:
        res = dict(res)
        res["watchdog_timeout_stage"] = _STATE["stage"]
    _progress(f"WATCHDOG fired at stage '{_STATE['stage']}' — emitting "
              "best-known result")
    _emit_and_exit(res, 0)


def _start_watchdog():
    t = threading.Timer(WATCHDOG_S, _watchdog_fire)
    t.daemon = True
    t.start()
    return t


def _setup_compile_cache():
    """Persistent XLA/Mosaic executable cache next to this file.  Safe on
    backends without executable serialization (JAX degrades to a warning)."""
    import jax
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    for key, val in (("jax_compilation_cache_dir", cache_dir),
                     ("jax_persistent_cache_min_entry_size_bytes", -1),
                     ("jax_persistent_cache_min_compile_time_secs", 0.0)):
        try:
            jax.config.update(key, val)
        except Exception:
            pass
    return cache_dir


def _probe_link(timeout_s=LINK_PROBE_S):
    """First device touch, bounded: returns RTT ms or None if the backend
    init / transfer did not complete inside ``timeout_s`` (dead tunnel)."""
    box = {}

    def work():
        try:
            box["rtt"] = link_rtt_ms()
        except Exception as e:          # noqa: BLE001 — report, don't hang
            box["err"] = f"{type(e).__name__}: {e}"

    th = threading.Thread(target=work, daemon=True)
    th.start()
    th.join(timeout_s)
    if "err" in box:
        return None, box["err"]
    if "rtt" not in box:
        return None, f"first device readback exceeded {timeout_s:.0f}s"
    return box["rtt"], None


def _timeit(fn, sync, warmup=2, iters=8):
    """Device-true per-call seconds via the slope methodology.

    One readback closes each batch, so wall(n) = n*t + overhead where
    overhead is the link RTT plus the dispatch tail; the difference
    wall(2n) - wall(n) cancels it exactly.  Round 4's published decode
    sweep amortized ONE ~28 ms readback over as few as 8 calls — 50-77%
    of every small-T point was the tunnel (VERDICT r4 weak #3).  The
    reference methodology averages *GPU* work, not link latency
    (tests/decode.c:239-250); the slope matches it.  Each batch size is
    measured twice and the minima differenced (window-noise guard)."""
    for _ in range(warmup):
        sync(fn())

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        sync(out)
        return time.perf_counter() - t0

    t1 = min(run(iters) for _ in range(2))
    t2 = min(run(2 * iters) for _ in range(2))
    return max(t2 - t1, 1e-9) / iters


# tests/decode.c:17-19 sweeps this exact transmit set, including the
# non-power-of-2 12/20-seed Kronecker orders (12,20,24,40,48,80,160,192)
# that run the XLA dot_general fallback instead of the fused Pallas kernel.
DECODE_SWEEP_FULL = (2, 4, 8, 12, 16, 20, 24, 32, 40, 48, 64, 80, 96, 128,
                     160, 192, 256)


def bench_decode(c=256, s=4096, transmits=(16, 64, 96, 256), iters=100):
    """tests/decode.c sweep: 4096 samples x 256 channels Int16.

    ``ms`` is the slope-methodology sustained wall time (RTT-free, but
    still carries the tunnel's per-call dispatch floor at small T where
    the device time is sub-millisecond); ``dev_ms`` is the true device
    busy time from a jax.profiler trace — the number comparable to the
    reference's GPU-timestamp averages (tests/decode.c:239-250) — and
    ``GB/s`` is computed from it."""
    import jax.numpy as jnp
    from ogl_beamforming_tpu.ops.decode import decode_hadamard, hadamard_matrix
    from ogl_beamforming_tpu.utils.profiling import device_time
    from ogl_beamforming_tpu.utils.transfer import sync

    results = {}
    for t in transmits:
        rf = jnp.asarray(
            np.random.randint(-2048, 2048, (c, t, s)).astype(np.int16))
        h = hadamard_matrix(t)
        dt = _timeit(lambda: decode_hadamard(rf, h), sync, warmup=4,
                     iters=max(8, iters * 16 // max(t, 16)))
        row = {"ms": dt * 1e3}
        try:
            dev = device_time(lambda: decode_hadamard(rf, h)).module_seconds
            row["dev_ms"] = dev * 1e3
        except Exception as e:          # profiler unavailable: fall back
            dev = dt
            row["dev_err"] = f"{type(e).__name__}: {e}"[:120]
        row["GB/s"] = s * t * c * 2 / dev / 1e9
        results[t] = row
    return {"per_transmit": results,
            "config": f"C={c} S={s} int16 Hadamard decode"}


def bench_das_chain(c=128, a=16, s=2048, nx=256, nz=512, iters=32,
                    voxel_block=32768):
    """Multi-transmit decode -> DAS chain (FORCES compounding)."""
    import jax.numpy as jnp
    from ogl_beamforming_tpu.params.enums import (AcquisitionKind, DataKind,
                                                  InterpolationMode,
                                                  ShaderKind)
    from ogl_beamforming_tpu.params.types import Parameters
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.pipeline.spec import PipelineSpec
    from ogl_beamforming_tpu.utils.transfer import sync
    from ogl_beamforming_tpu.utils.transforms import das_transform_2d_xz

    pitch = 0.3e-3
    p = Parameters(
        sample_count=s, channel_count=c, acquisition_count=a,
        sampling_frequency=20e6, demodulation_frequency=5e6,
        speed_of_sound=1500.0, f_number=0.5,
        acquisition_kind=AcquisitionKind.FORCES,
        interpolation_mode=InterpolationMode.Cubic,
        das_voxel_transform=das_transform_2d_xz([-0.06, 0.01], [0.06, 0.165]),
        xdc_element_pitch=np.array([pitch, pitch], np.float32),
        output_points=np.array([nx, nz, 1, 0], np.int32))
    plan = build_plan(
        p, PipelineSpec.from_shaders([ShaderKind.Decode, ShaderKind.DAS],
                                     DataKind.Int16),
        {}, voxel_block=voxel_block)
    rf = jnp.asarray(np.random.randint(-2048, 2048, (c, a, s)).astype(np.int16))
    dt = _timeit(lambda: plan(rf), sync, warmup=2, iters=iters)
    voxels = nx * nz
    return {
        "ms_per_frame": dt * 1e3,
        "fps": 1.0 / dt,
        "voxch_per_s": voxels * c / dt,
        "raw_GBps": c * a * s * 2 / dt / 1e9,
        "config": f"C={c} A={a} S={s} out={nx}x{nz} cubic int16",
    }


def bench_plane_wave(c=256, s=4096, nx=512, nz=1024, iters=32):
    """2D plane-wave DAS on the throughput.c output grid (BASELINE config 2:
    512x1024 voxels, lateral +-60 mm, axial 10-165 mm, f# = 0.5, cubic IQ).

    32-frame averages, matching the reference's stats window
    (tests/decode.c AVERAGE_SAMPLES; the tunneled runtime's ~30 ms readback
    RTT amortizes out of the sustained-throughput number).
    """
    import jax.numpy as jnp
    from ogl_beamforming_tpu.models.presets import plane_wave_2d
    from ogl_beamforming_tpu.params.enums import DataKind
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.utils.transfer import sync

    # The client-expressible IQ configuration: Float32Complex wire data
    # (interleaved I/Q scalars), decode_mode=NoDecode — the planner strips
    # the Decode stage and DAS runs complex baseband.  No manual static or
    # table surgery: the number below is plan(rf) end to end.
    p, pipe = plane_wave_2d(channel_count=c, sample_count=s,
                            output_points=(nx, nz),
                            data_kind=DataKind.Float32Complex)
    plan = build_plan(p, pipe, {})
    rf = jnp.asarray(np.random.randn(c, 1, 2 * s).astype(np.float32))
    dt = _timeit(lambda: plan(rf), sync, warmup=2, iters=iters)
    voxels = nx * nz
    return {
        "ms_per_frame": dt * 1e3,
        "fps": 1.0 / dt,
        "voxch_per_s": voxels * c / dt,
        "config": f"plane-wave C={c} S={s} out={nx}x{nz} cubic IQ",
    }


def bench_plane_wave_batched(B=4, c=256, s=4096, nx=512, nz=1024, iters=8):
    """Frame-batched headline: B frames per device program — the
    TPU-native throughput mode for offline datasets and frame averaging
    (the reference's sum.glsl / output_points.w path).  Default execution
    lax.maps the single-frame kernel (host dispatch/upload amortize over
    B); the geometry-sharing packed kernel is the fb_pack=1 autotune
    candidate (measured slower on v5e — experiments/frame_batch_ab.py).
    Reported per frame."""
    import jax.numpy as jnp
    from ogl_beamforming_tpu.models.presets import plane_wave_2d
    from ogl_beamforming_tpu.params.enums import DataKind
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.utils.transfer import sync

    p, pipe = plane_wave_2d(channel_count=c, sample_count=s,
                            output_points=(nx, nz),
                            data_kind=DataKind.Float32Complex)
    plan = build_plan(p, pipe, {}, frame_batch=B)
    rf = jnp.asarray(np.random.randn(B, c, 1, 2 * s).astype(np.float32))
    dt = _timeit(lambda: plan(rf), sync, warmup=2, iters=iters) / B
    voxels = nx * nz
    return {
        "ms_per_frame": dt * 1e3,
        "fps": 1.0 / dt,
        "voxch_per_s": voxels * c / dt,
        "config": f"plane-wave C={c} S={s} out={nx}x{nz} cubic IQ "
                  f"frame_batch={B}",
    }


def bench_demod_chain(c=128, a=16, s=2048, nx=256, nz=512, iters=32):
    """Full Demodulate -> Decode -> DAS chain on Int16 RF — the exact
    tests/throughput.c pipeline (:455-461) with a Kaiser baseband filter;
    the decode stage runs on complex baseband (fused Pallas via
    interleaved re|im planes)."""
    import jax.numpy as jnp
    from ogl_beamforming_tpu.models.presets import forces_compounding
    from ogl_beamforming_tpu.params.enums import (FilterKind, ShaderKind)
    from ogl_beamforming_tpu.params.types import (FilterParameters,
                                                  KaiserFilterParameters)
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.utils.filters import make_filter
    from ogl_beamforming_tpu.utils.transfer import sync

    p, pipe = forces_compounding(channel_count=c, transmit_count=a,
                                 sample_count=s, sampling_frequency=20e6,
                                 demodulation_frequency=5e6,
                                 output_points=(nx, nz), demodulate=True)
    fp = FilterParameters(kind=FilterKind.Kaiser, sampling_frequency=20e6,
                          kaiser=KaiserFilterParameters(2e6, 4.0, 16))
    plan = build_plan(p, pipe, {0: make_filter(fp)})
    rf = jnp.asarray(np.random.randint(-2048, 2048, (c, a, s))
                     .astype(np.int16))
    dt = _timeit(lambda: plan(rf), sync, warmup=2, iters=iters)
    voxels = nx * nz
    return {
        "ms_per_frame": dt * 1e3,
        "fps": 1.0 / dt,
        "voxch_per_s": voxels * c / dt,
        "raw_GBps": c * a * s * 2 / dt / 1e9,
        "config": f"demod->decode->DAS C={c} A={a} S={s} out={nx}x{nz}"
                  " cubic IQ int16",
    }


def bench_hercules(iters=3):
    """HERCULES 3D volume (96^3, 128 ch x 128 tx, linear)."""
    import jax.numpy as jnp
    from ogl_beamforming_tpu.models.presets import hercules_3d
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.utils.transfer import sync

    p, pipe = hercules_3d()
    plan = build_plan(p, pipe, {})
    rf = jnp.asarray(
        np.random.randint(-2048, 2048, (128, 128, 2048)).astype(np.int16))
    dt = _timeit(lambda: plan(rf), sync, warmup=1, iters=iters)
    return {"ms_per_frame": dt * 1e3,
            "voxch_per_s": 96 ** 3 * 128 / dt,
            "config": "HERCULES 96^3 C=A=128 linear int16"}


def bench_uforces_3d(iters=2):
    """3D volumetric sparse uFORCES with coherency weighting (BASELINE
    config 4): decode over 64 acquisitions, DAS over the 63 sparse
    transmits, 128^3 output."""
    import jax.numpy as jnp
    from ogl_beamforming_tpu.models.presets import uforces_volumetric
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.utils.transfer import sync

    p, pipe, sparse = uforces_volumetric()
    plan = build_plan(p, pipe, {}, sparse_elements=sparse)
    c, a, s = 256, 64, 2048
    rf = jnp.asarray(
        np.random.randint(-2048, 2048, (c, a, s)).astype(np.int16))
    dt = _timeit(lambda: plan(rf), sync, warmup=1, iters=iters)
    return {"ms_per_frame": dt * 1e3,
            "voxch_per_s": 128 ** 3 * c / dt,
            "config": "uFORCES 128^3 C=256 A=64 sparse + coherency"}


def bench_forces_big(iters=8):
    """FORCES compounding on the full 512x1024 grid (linear)."""
    import jax.numpy as jnp
    from ogl_beamforming_tpu.params.enums import (AcquisitionKind, DataKind,
                                                  InterpolationMode,
                                                  ShaderKind)
    from ogl_beamforming_tpu.params.types import Parameters
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.pipeline.spec import PipelineSpec
    from ogl_beamforming_tpu.utils.transfer import sync
    from ogl_beamforming_tpu.utils.transforms import das_transform_2d_xz

    pitch = 0.3e-3
    c, a, s, nx, nz = 256, 16, 2048, 512, 1024
    p = Parameters(
        sample_count=s, channel_count=c, acquisition_count=a,
        sampling_frequency=20e6, demodulation_frequency=5e6,
        speed_of_sound=1500.0, f_number=0.5,
        acquisition_kind=AcquisitionKind.FORCES,
        interpolation_mode=InterpolationMode.Linear,
        das_voxel_transform=das_transform_2d_xz([-0.06, 0.01], [0.06, 0.165]),
        xdc_element_pitch=np.array([pitch, pitch], np.float32),
        output_points=np.array([nx, nz, 1, 0], np.int32))
    plan = build_plan(p, PipelineSpec.from_shaders(
        [ShaderKind.Decode, ShaderKind.DAS], DataKind.Int16), {})
    rf = jnp.asarray(np.random.randint(-2048, 2048, (c, a, s))
                     .astype(np.int16))
    dt = _timeit(lambda: plan(rf), sync, warmup=1, iters=iters)
    return {"ms_per_frame": dt * 1e3,
            "voxch_per_s": nx * nz * c / dt,
            "config": f"FORCES C={c} A={a} S={s} out={nx}x{nz} linear"}


def roofline_voxch(c, a, s, nx, nz, fs=40e6, sos=1500.0,
                   axial_mm=(10.0, 165.0), taps=4, planes=2,
                   vpu_lanes=1024, clock=0.94e9,
                   cyc_per_gather_vreg=3.53):
    """DAS speed-of-light in voxels*channels/s for one v5e chip.

    Justification (measured numbers in PERFORMANCE.md):

    * The kernel is VPU-issue-bound, not HBM-bound: the whole RF frame
      (C*S*8 B ~ 8 MB) fits in VMEM and is read from HBM once (~20 us at
      819 GB/s), so an HBM roofline is vacuous — the binding resource is
      vector-op issue (BASELINE.md's HBM-roofline target is quoted against
      this bound because it *is* this device's memory-side limit for the
      op; both bounds are reported by --full).
    * Mosaic's only fast dynamic gather is ``take_along_axis`` within a
      128-lane row.  Rounds 1-3 charged 1 vreg (1024 lanes)/cycle on the
      strength of gather_micro.py — round 4 showed that figure was a
      harness artifact (its ``r & 3`` index stride let Mosaic CSE 64
      gathers into 4, and per-call times sat under the ~0.65 ms tunneled
      dispatch floor).  The slope-methodology re-measurement
      (experiments/gather_micro3.py, FMA control 0.435 cyc/vreg) puts the
      hardware floor at **4.02 cyc/vreg isolated, 3.53 paired** (two
      gathers sharing one index, the kernel's hermite structure) — and
      shows index/select/unpack/FMA work hides completely under gather
      issue, so no separate aux charge applies.  The bound charges
      ``taps * planes`` gathered vregs per active (voxel, channel) at the
      paired 3.53 cyc/vreg rate for the exact-f32 two-plane formulation —
      independent of voxel layout.  (Round 3's int16 re|im packing
      fetches both planes in one gather, so the *packed* kernel's own
      speed of light is 2x this bound; the roofline deliberately stays
      pinned to the round-2 exact-f32 form so ``vs_baseline`` is never
      inflated by reformulation.  Measured fractions > 1 would therefore
      be possible for a perfect packed kernel.)  Round-3 rows quoted
      vs_baseline against the disproven 1 cyc/vreg + 2x-aux accounting;
      multiply them by 1.77 to compare against round-4 rows.
    * Voxels beyond the last RF sample are skipped (activity pruning); the
      roofline only charges active voxels but the reported metric counts
      the full grid, exactly like the measured number does.

    The achievable fraction of this bound is set by how many RF chunks the
    tile layout must scan per needed tap: the round-2 axial-lanes layout
    scanned ~9.3 (the delay slope), the lateral-lanes layout ~3.7 (aperture
    curvature only; experiments/layout_stats.py) — layout work moves the
    measured number toward this roofline rather than moving the target.
    """
    z_data = s / fs * sos / 2.0                      # deepest sample (m)
    frac_active = min(max(
        (z_data - axial_mm[0] * 1e-3)
        / ((axial_mm[1] - axial_mm[0]) * 1e-3), 0.0), 1.0)
    lane_ops = (frac_active * nx * nz * c * a
                * taps * planes)                     # gathered lanes
    t = lane_ops * cyc_per_gather_vreg / (vpu_lanes * clock)
    return nx * nz * c * a / t


def numerics_canary():
    """Small FORCES cubic-IQ frame vs the NumPy golden oracle ON HARDWARE.

    Timing numbers are meaningless if the kernel is wrong, and toolchain
    updates have broken hardware numerics without touching the CPU test
    suite (mid-round-3: XLA started canonicalizing f32-bitcast packed
    words, 0.17 NRMSE).  Returns the NRMSE; main() zeroes vs_baseline if
    it exceeds the 1e-3 golden contract so a regression can never be
    recorded as throughput.
    """
    import dataclasses

    import jax

    from ogl_beamforming_tpu.ops import golden
    from ogl_beamforming_tpu.ops.das import das_jit, make_dynamic, make_static
    from ogl_beamforming_tpu.params.enums import (AcquisitionKind,
                                                  InterpolationMode)
    from ogl_beamforming_tpu.utils.transfer import to_host
    from ogl_beamforming_tpu.utils.transforms import das_transform_2d_xz

    rng = np.random.default_rng(7)
    c, a, s = 32, 8, 512
    pitch = 0.3e-3
    dp = golden.DasParams(
        acquisition_kind=AcquisitionKind.FORCES, acquisition_count=a,
        channel_count=c, sample_count=s, sampling_frequency=10e6,
        demodulation_frequency=5e6, speed_of_sound=1500.0,
        interpolation_mode=InterpolationMode.Cubic, f_number=0.8,
        voxel_transform=np.asarray(
            das_transform_2d_xz([0, 1e-3], [(c - 1) * pitch, 12e-3])),
        xdc_element_pitch=np.asarray([pitch, pitch], np.float32),
        output_points=(64, 128, 1))
    re = rng.standard_normal((c, a, s)).astype(np.float32)
    im = rng.standard_normal((c, a, s)).astype(np.float32)
    ref = golden.das(re + 1j * im, dp)
    st = dataclasses.replace(make_static(dp, iq=True), backend="pallas")
    rf = jax.jit(lambda x, y: jax.lax.complex(x, y))(re, im)
    out = to_host(das_jit(rf, make_dynamic(dp), st))
    return float(np.linalg.norm(out - ref) / np.linalg.norm(ref))


HEALTHY_RTT_MS = 80.0
"""Per-row link-health gate.  The healthy tunneled-attach readback RTT is
~30-45 ms; degraded windows inflate to 150 ms - 150 s (CLAUDE.md) and were
responsible for the round-3 forces_big 13.7-vs-18.4 ms ambiguity."""


def link_rtt_ms(samples: int = 3) -> float:
    """Measured device_put + readback round-trip (the timing noise floor)."""
    import jax
    probe = np.arange(8, dtype=np.float32)
    np.asarray(jax.device_put(probe))       # warm any lazy attach work
    t0 = time.perf_counter()
    for _ in range(samples):
        np.asarray(jax.device_put(probe))
    return (time.perf_counter() - t0) / samples * 1e3


def _run_row(fn, retries: int = 1):
    """Run one full-bench row with a link probe before it; re-run rows
    measured in a degraded window (VERDICT r3: rows from unhealthy windows
    were committed unflagged).  Annotates the row with its window health."""
    for attempt in range(retries + 1):
        rtt = link_rtt_ms()
        try:
            row = fn()
        except Exception as e:      # a broken row must not kill the run
            row = {"error": f"{type(e).__name__}: {e}"[:300]}
        row["rtt_ms"] = round(rtt, 1)
        row["window"] = "healthy" if rtt <= HEALTHY_RTT_MS else "degraded"
        if row["window"] == "healthy":
            return row
    row["window"] = "degraded"
    return row


def chain_canary():
    """Small Demodulate -> Decode -> DAS chain vs golden ON HARDWARE —
    guards the full-bench chain rows the DAS-only :func:`numerics_canary`
    cannot see (the demodulate/FIR/complex-decode stages have their own
    toolchain exposure; since the round-4 default flip the demod FIR is
    XLA tap-unrolled, with ops/demod_pallas.py the opt-in)."""
    from ogl_beamforming_tpu.models.presets import forces_compounding
    from ogl_beamforming_tpu.ops import golden
    from ogl_beamforming_tpu.params.enums import FilterKind
    from ogl_beamforming_tpu.params.types import (FilterParameters,
                                                  KaiserFilterParameters)
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.utils.filters import make_filter
    from ogl_beamforming_tpu.utils.hadamard import hadamard
    from ogl_beamforming_tpu.utils.transfer import to_host

    rng = np.random.default_rng(11)
    c, a, s = 16, 4, 512
    p, pipe = forces_compounding(channel_count=c, transmit_count=a,
                                 sample_count=s, sampling_frequency=20e6,
                                 demodulation_frequency=5e6,
                                 output_points=(32, 64), demodulate=True)
    fp = FilterParameters(kind=FilterKind.Kaiser, sampling_frequency=20e6,
                          kaiser=KaiserFilterParameters(2e6, 4.0, 16))
    f = make_filter(fp)
    plan = build_plan(p, pipe, {0: f})
    rf = rng.integers(-1024, 1024, (c, a, s)).astype(np.int16)
    out = to_host(plan(rf))

    iq = golden.demodulate(rf, f.taps, 5e6, 20e6, 1, False)
    dec = golden.decode_hadamard(iq, hadamard(a))
    from ogl_beamforming_tpu.ops.golden import DasParams
    from ogl_beamforming_tpu.params.enums import (AcquisitionKind,
                                                  InterpolationMode)
    dp = DasParams(
        acquisition_kind=AcquisitionKind.FORCES, acquisition_count=a,
        channel_count=c, sample_count=s // 2, sampling_frequency=10e6,
        demodulation_frequency=5e6,
        speed_of_sound=float(p.speed_of_sound),
        time_offset=float(p.time_offset) + f.time_delay,
        interpolation_mode=InterpolationMode.Cubic,
        f_number=float(p.f_number),
        voxel_transform=np.asarray(p.das_voxel_transform),
        xdc_element_pitch=np.asarray(p.xdc_element_pitch),
        output_points=(32, 64, 1))
    ref = golden.das(dec.astype(np.complex64), dp)
    return float(np.linalg.norm(out - ref) / np.linalg.norm(ref))


FULL_ROWS = (
    ("plane_wave", bench_plane_wave),
    ("plane_wave_batched", bench_plane_wave_batched),
    ("decode_sweep", lambda: bench_decode(transmits=DECODE_SWEEP_FULL,
                                          iters=64)),
    ("das_chain", bench_das_chain),
    ("demod_chain", bench_demod_chain),
    ("hercules_3d", bench_hercules),
    ("forces_big", bench_forces_big),
    ("uforces_3d", bench_uforces_3d),
)


def _row_ms(row):
    """One scalar ms per row for spread/ranking (decode sweep: total ms)."""
    if not isinstance(row, dict):
        return None
    if "ms_per_frame" in row:
        return row["ms_per_frame"]
    if "per_transmit" in row:
        return sum(x["ms"] for x in row["per_transmit"].values())
    return None


def _row_spread(runs, name):
    """Max relative spread of the row's headline ms across runs."""
    vals = [_row_ms(r.get(name)) for r in runs]
    if any(v is None for v in vals):
        return None
    lo, hi = min(vals), max(vals)
    return (hi - lo) / lo if lo > 0 else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="also run the decode sweep and per-family rows")
    ap.add_argument("--runs", type=int, default=1,
                    help="repeat the --full rows N times and report per-row "
                         "spread (reproducibility protocol: 3 consecutive "
                         "runs with <=10%% spread)")
    ap.add_argument("--out", default=None,
                    help="also write the result JSON to this path, updated "
                         "incrementally after every row so a mid-run tunnel "
                         "degradation or timeout still leaves the completed "
                         "rows on disk")
    args = ap.parse_args()

    def checkpoint(obj):
        if args.out:
            with open(args.out, "w") as f:
                json.dump(obj, f, indent=1)

    _start_watchdog()
    _STATE["stage"] = "compile-cache setup"
    cache_dir = _setup_compile_cache()
    _progress(f"compile cache at {cache_dir} "
              f"(watchdog {WATCHDOG_S:.0f}s)")

    # Link-health context: sustained numbers amortize the readback RTT,
    # but a degraded attach (RTT >> 30 ms healthy baseline) inflates
    # everything — record it so results are interpretable.  Bounded: a
    # dead tunnel becomes an error JSON, never a hang (BENCH_r04 rc=124).
    _STATE["stage"] = "link probe (first device touch)"
    rtt_ms, err = _probe_link()
    if rtt_ms is None:
        _emit_and_exit(_error_result(f"link dead: {err}"))
    _progress(f"link rtt {rtt_ms:.1f} ms")

    _STATE["stage"] = "numerics canary (compile + run)"
    canary = numerics_canary()
    _progress(f"canary nrmse {canary:.2e}")
    _STATE["stage"] = "headline plane-wave (compile + run)"
    pw = bench_plane_wave()
    _progress(f"headline {pw['ms_per_frame']:.2f} ms/frame")
    target = 0.8 * roofline_voxch(256, 1, 4096, 512, 1024)
    result = {
        "metric": "DAS voxels*channels/s (" + pw["config"] + ")",
        "value": round(pw["voxch_per_s"], 1),
        "unit": "voxel*channel/s",
        "vs_baseline": round(pw["voxch_per_s"] / target, 6),
        "link_rtt_ms": round(rtt_ms, 1),
        "canary_nrmse": round(canary, 8),
    }
    if canary > 1e-3:       # numerics broken: throughput is meaningless
        result["vs_baseline"] = 0.0
        result["canary_fail"] = True
    _STATE["result"] = result
    if args.full:
        _STATE["stage"] = "chain canary"
        try:
            ch_nrmse = chain_canary()
        except Exception as e:
            ch_nrmse = float("inf")
            result["chain_canary_error"] = f"{type(e).__name__}: {e}"[:300]
        result["chain_canary_nrmse"] = (round(ch_nrmse, 8)
                                        if np.isfinite(ch_nrmse) else "inf")
        if not ch_nrmse < 1e-3:
            result["chain_canary_fail"] = True
        checkpoint(result)

        # One snapshot schema for interim AND final writes (advisor r4):
        # top-level merged best rows + the full "runs" list, always.
        def snapshot(partial):
            obj = {**result, **_best_rows(partial), "runs": partial}
            if len(partial) > 1:
                obj["row_spread"] = {
                    name: round(s, 4)
                    for name, fn in FULL_ROWS
                    if (s := _row_spread(partial, name)) is not None}
            return obj

        runs = []
        for i in range(max(1, args.runs)):
            run = {}
            for name, fn in FULL_ROWS:
                _STATE["stage"] = f"full row {name} (run {i + 1})"
                run[name] = _run_row(fn)
                ms = _row_ms(run[name])
                _progress(f"run {i + 1}/{args.runs} {name}: "
                          f"{'err' if ms is None else f'{ms:.2f} ms'} "
                          f"({run[name]['window']}, "
                          f"rtt {run[name]['rtt_ms']} ms)")
                snap = snapshot(runs + [run])
                checkpoint(snap)
                _STATE["result"] = snap
            runs.append(run)
        result = snapshot(runs)
    _STATE["stage"] = "done"
    checkpoint(result)
    _emit_and_exit(result)


def _best_rows(runs):
    """Per-row minima across runs, preferring healthy-window measurements.
    Tolerates partial runs (interim snapshots mid-run)."""
    best = {}
    for name, _ in FULL_ROWS:
        rows = [r[name] for r in runs if name in r]
        if not rows:
            continue
        healthy = [r for r in rows if r.get("window") == "healthy"]
        pool = healthy or rows
        best[name] = min(
            pool, key=lambda r: _row_ms(r) or float("inf"))
    return best


if __name__ == "__main__":
    main()
