"""Layout A/B on the FORCES configs (chain + big) — lat_lanes on/off."""
import dataclasses, json, time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from ogl_beamforming_tpu.params.enums import (AcquisitionKind, DataKind,
                                                  InterpolationMode,
                                                  ShaderKind)
    from ogl_beamforming_tpu.params.types import Parameters
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.pipeline.spec import PipelineSpec
    from ogl_beamforming_tpu.ops import das_pallas
    from ogl_beamforming_tpu.ops.das import das_jit
    from ogl_beamforming_tpu.utils.transfer import sync, to_host
    from ogl_beamforming_tpu.utils.transforms import das_transform_2d_xz

    def chain_plan(c, a, s, nx, nz, interp=InterpolationMode.Cubic,
                   shaders=(ShaderKind.Decode, ShaderKind.DAS)):
        pitch = 0.3e-3
        p = Parameters(
            sample_count=s, channel_count=c, acquisition_count=a,
            sampling_frequency=20e6, demodulation_frequency=5e6,
            speed_of_sound=1500.0, f_number=0.5,
            acquisition_kind=AcquisitionKind.FORCES,
            interpolation_mode=interp,
            das_voxel_transform=das_transform_2d_xz([-0.06, 0.01],
                                                    [0.06, 0.165]),
            xdc_element_pitch=np.array([pitch, pitch], np.float32),
            output_points=np.array([nx, nz, 1, 0], np.int32))
        return build_plan(p, PipelineSpec.from_shaders(list(shaders),
                                                       DataKind.Int16), {})

    def timeit(fn, warmup=2, iters=16):
        for _ in range(warmup): sync(fn())
        t0 = time.perf_counter()
        for _ in range(iters): out = fn()
        sync(out)
        return (time.perf_counter() - t0) / iters * 1e3

    cases = [
        ("chain C=128 A=16 S=2048 256x512 cubic",
         lambda: chain_plan(128, 16, 2048, 256, 512),
         np.random.randint(-2048, 2048, (128, 16, 2048)).astype(np.int16)),
        ("forces-big C=256 A=16 S=2048 512x1024 linear",
         lambda: chain_plan(256, 16, 2048, 512, 1024,
                            interp=InterpolationMode.Linear),
         np.random.randint(-2048, 2048, (256, 16, 2048)).astype(np.int16)),
    ]
    for label, make_plan, rf_np in cases:
        rf = jnp.asarray(rf_np)
        ref_out = None
        for name, knobs in [("axial", {"lat_lanes": 0}), ("lateral", {})]:
            from ogl_beamforming_tpu.pipeline.plan import clear_plan_cache
            das_pallas.ABLATE.clear(); das_pallas.ABLATE.update(knobs)
            das_pallas._das_call.cache_clear(); das_jit.clear_cache()
            clear_plan_cache()
            plan = make_plan()
            t0 = time.perf_counter()
            try:
                ms = timeit(lambda: plan(rf))
                out = np.abs(to_host(plan(rf)))
                if ref_out is None: ref_out, err = out, 0.0
                else:
                    err = float(np.linalg.norm(out - ref_out)
                                / max(np.linalg.norm(ref_out), 1e-9))
                print(json.dumps({label + " | " + name:
                                  {"ms": round(ms, 2),
                                   "compile_s": round(time.perf_counter()-t0, 1),
                                   "nrmse": round(err, 8)}}), flush=True)
            except Exception as e:
                print(json.dumps({label + " | " + name: str(e)[:300]}),
                      flush=True)
    das_pallas.ABLATE.clear(); das_pallas._das_call.cache_clear()

if __name__ == "__main__":
    main()
