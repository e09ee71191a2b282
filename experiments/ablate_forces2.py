"""FORCES chain: predicate-share sweep (branch-region amortization)."""
import json, time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from ogl_beamforming_tpu.params.enums import (AcquisitionKind, DataKind,
                                                  InterpolationMode,
                                                  ShaderKind)
    from ogl_beamforming_tpu.params.types import Parameters
    from ogl_beamforming_tpu.pipeline.plan import (build_plan,
                                                   clear_plan_cache)
    from ogl_beamforming_tpu.pipeline.spec import PipelineSpec
    from ogl_beamforming_tpu.ops import das_pallas
    from ogl_beamforming_tpu.ops.das import das_jit
    from ogl_beamforming_tpu.utils.transfer import sync, to_host
    from ogl_beamforming_tpu.utils.transforms import das_transform_2d_xz

    pitch = 0.3e-3
    def make_plan():
        p = Parameters(
            sample_count=2048, channel_count=128, acquisition_count=16,
            sampling_frequency=20e6, demodulation_frequency=5e6,
            speed_of_sound=1500.0, f_number=0.5,
            acquisition_kind=AcquisitionKind.FORCES,
            interpolation_mode=InterpolationMode.Cubic,
            das_voxel_transform=das_transform_2d_xz([-0.06, 0.01],
                                                    [0.06, 0.165]),
            xdc_element_pitch=np.array([pitch, pitch], np.float32),
            output_points=np.array([256, 512, 1, 0], np.int32))
        return build_plan(p, PipelineSpec.from_shaders(
            [ShaderKind.Decode, ShaderKind.DAS], DataKind.Int16), {})

    rf = jnp.asarray(np.random.randint(-2048, 2048, (128, 16, 2048))
                     .astype(np.int16))

    def timeit(fn, warmup=2, iters=16):
        for _ in range(warmup): sync(fn())
        t0 = time.perf_counter()
        for _ in range(iters): out = fn()
        sync(out)
        return (time.perf_counter() - t0) / iters * 1e3

    ref = None
    for name, knobs in [("default_share8", {}),
                        ("share16", {"pred_share": 16}),
                        ("share32", {"pred_share": 32}),
                        ("g1", {"group": 1}),
                        ("g2", {"group": 2})]:
        das_pallas.ABLATE.clear(); das_pallas.ABLATE.update(knobs)
        das_pallas._das_call.cache_clear(); das_jit.clear_cache()
        clear_plan_cache()
        plan = make_plan()
        t0 = time.perf_counter()
        try:
            ms = timeit(lambda: plan(rf))
            out = np.abs(to_host(plan(rf)))
            if ref is None: ref, err = out, 0.0
            else:
                err = float(np.linalg.norm(out - ref)
                            / max(np.linalg.norm(ref), 1e-9))
            print(json.dumps({name: {"ms": round(ms, 2),
                                     "compile_s": round(time.perf_counter()-t0, 1),
                                     "nrmse": round(err, 9)}}), flush=True)
        except Exception as e:
            print(json.dumps({name: str(e)[:250]}), flush=True)
    das_pallas.ABLATE.clear(); das_pallas._das_call.cache_clear()

if __name__ == "__main__":
    main()
