"""Hardware A/B: pair-packed packed-IQ planes (pair_iq) vs the hermite
default on the headline config, plus a compiled-path numerics check.

pair_iq folds both Hermite gather positions into word k (value pairs +
slope pairs), so one index/compare/clip/select set serves all 4 gathers
of a (pair, chunk) — the chunk loop is issue-bound, so the saved ops
should show directly.  Costs 2x RF planes (4 int32) = 2x per-step DMA.
"""
import json
import time


def main():
    import dataclasses

    import numpy as np
    import jax

    from ogl_beamforming_tpu.models.presets import plane_wave_2d
    from ogl_beamforming_tpu.ops import das_pallas
    from ogl_beamforming_tpu.ops.das import das_jit
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.utils.transfer import sync, to_host

    def measure(name, knobs, st, dyn, rf, iters=32, ref=None):
        das_pallas.ABLATE.clear()
        das_pallas.ABLATE.update(knobs)
        das_pallas._das_call.cache_clear()
        das_jit.clear_cache()
        try:
            for _ in range(3):
                sync(das_jit(rf, dyn, st))
            t0 = time.perf_counter()
            for _ in range(iters):
                out = das_jit(rf, dyn, st)
            sync(out)
            ms = (time.perf_counter() - t0) / iters * 1e3
            row = {name: round(ms, 2)}
            if ref is not None:
                o = to_host(das_jit(rf, dyn, st))
                row["nrmse"] = float(np.linalg.norm(o - ref)
                                     / np.linalg.norm(ref))
            print(json.dumps(row), flush=True)
        except Exception as e:
            print(json.dumps({name: str(e)[:300]}), flush=True)

    c, s = 256, 4096
    p, pipe = plane_wave_2d(channel_count=c, sample_count=s,
                            output_points=(512, 1024))
    plan = build_plan(p, pipe, {})
    sd = next(sd for sd in plan.descriptor.stages if sd.das is not None)
    st = dataclasses.replace(sd.das, iq=True)
    dyn = plan.dyn["das"]
    rng = np.random.default_rng(3)
    re = rng.standard_normal((c, 1, s)).astype(np.float32)
    im = rng.standard_normal((c, 1, s)).astype(np.float32)
    rf = jax.jit(lambda a, b: jax.lax.complex(a, b))(re, im)

    # cross-kernel numerics: pair_iq vs the hermite default ON HARDWARE
    # (both int16-quantized; expect ~1e-5 between them; golden-oracle
    # checks live in tests + the bench canary)
    measure("default_hermite", {}, st, dyn, rf)
    ref = to_host(das_jit(rf, dyn, st))
    measure("pair_iq", {"pair_iq": 1}, st, dyn, rf, ref=ref)
    measure("pair_iq_cb16", {"pair_iq": 1, "ch_block": 16}, st, dyn, rf)
    measure("pair_iq_group2", {"pair_iq": 1, "group": 2}, st, dyn, rf)
    das_pallas.ABLATE.clear()
    das_pallas._das_call.cache_clear()


if __name__ == "__main__":
    main()
