"""Round-3 family benchmarks after the u-form refactor.

Measures: headline plane-wave (sustained 32-frame), HERCULES 3D 96^3,
decode->DAS chain, FORCES big, uFORCES 3D — the PERFORMANCE.md table —
plus exact_apod A/B on HERCULES (isolates the u-form win) and a knob
mini-sweep for HERCULES (group now that per-pair cost changed).
"""
import dataclasses
import json
import time

import numpy as np


def _timeit(fn, sync, warmup=2, iters=8):
    for _ in range(warmup):
        sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from ogl_beamforming_tpu.models import presets
    from ogl_beamforming_tpu.ops import das_pallas
    from ogl_beamforming_tpu.ops.das import das_jit, make_dynamic, make_static
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.utils.transfer import sync

    rng = np.random.default_rng(3)

    def clear():
        das_pallas.ABLATE.clear()
        das_pallas._das_call.cache_clear()
        das_jit.clear_cache()

    # -- headline plane-wave, 32-frame sustained ------------------------
    c, s, nx, nz = 256, 4096, 512, 1024
    p, pipe = presets.plane_wave_2d(channel_count=c, sample_count=s,
                                    output_points=(nx, nz))
    plan = build_plan(p, pipe, {})
    sd = next(sd for sd in plan.descriptor.stages if sd.das is not None)
    st = dataclasses.replace(sd.das, iq=True)
    dyn = plan.dyn["das"]
    re = rng.standard_normal((c, 1, s)).astype(np.float32)
    im = rng.standard_normal((c, 1, s)).astype(np.float32)
    rf = jax.jit(lambda a, b: jax.lax.complex(a, b))(jnp.asarray(re),
                                                     jnp.asarray(im))
    clear()
    ms = _timeit(lambda: das_jit(rf, dyn, st), sync, iters=32)
    print(json.dumps({"headline_ms": round(ms, 2)}), flush=True)

    # -- HERCULES 3D 96^3 C=A=128 linear --------------------------------
    from ogl_beamforming_tpu.ops import golden
    from ogl_beamforming_tpu.params.enums import (AcquisitionKind,
                                                  InterpolationMode,
                                                  pack_tx_rx_orientation,
                                                  RCAOrientation)
    from ogl_beamforming_tpu.utils.transforms import das_transform_3d
    hc, ha, hs, hn = 128, 128, 4096, 96
    pitch = 0.3e-3
    ap = (hc - 1) * pitch
    hp = golden.DasParams(
        acquisition_kind=AcquisitionKind.HERCULES, acquisition_count=ha,
        channel_count=hc, sample_count=hs, sampling_frequency=40e6,
        demodulation_frequency=0.0, speed_of_sound=1500.0,
        time_offset=0.0, f_number=1.0,
        voxel_transform=das_transform_3d([0, 0, 5e-3], [ap, ap, 60e-3]),
        xdc_element_pitch=np.array([pitch, pitch], np.float32),
        output_points=(hn, hn, hn),
        transmit_receive_orientation=pack_tx_rx_orientation(
            RCAOrientation.Rows, RCAOrientation.Columns),
        transmit_angle=0.0, focus_depth=np.inf,
        interpolation_mode=InterpolationMode.Linear)
    hst = make_static(hp, iq=False)
    hdyn = make_dynamic(hp)
    hrf = jnp.asarray(rng.standard_normal((hc, ha, hs)).astype(np.float32))

    for name, knobs in [("herc_default", {}),
                        ("herc_exact_apod", {"exact_apod": 1}),
                        ("herc_g2", {"group": 2}),
                        ("herc_g4", {"group": 4}),
                        ("herc_ts32", {"tile_sub": 32}),
                        ("herc_cb16", {"ch_block": 16})]:
        clear()
        das_pallas.ABLATE.update(knobs)
        try:
            ms = _timeit(lambda: das_jit(hrf, hdyn, hst), sync,
                         warmup=1, iters=4)
            print(json.dumps({name: round(ms, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({name: str(e)[:200]}), flush=True)
    clear()


if __name__ == "__main__":
    main()
