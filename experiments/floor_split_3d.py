"""Floor decomposition for the 3D volume families (VERDICT r3 #3).

Runs the nested ablation split (full / no_gather / no_chunk_loop /
no_unit) on HERCULES 96^3 (C=A=128 linear) and uFORCES 128^3 (C=256,
63 sparse tx + coherency) — the same methodology floor_split.py applied
to the headline, so each family gets a floor table:
gathers / chunk-loop-non-gather / per-pair prep / fixed.

Run on hardware: PYTHONPATH=/root/repo:$PYTHONPATH python
experiments/floor_split_3d.py [hercules|uforces] | tee /tmp/floor3d.log
"""
import json
import sys
import time

import numpy as np


def split(name, plan_builder, rf_shape, iters=3):
    import jax.numpy as jnp
    from ogl_beamforming_tpu.ops import das_pallas
    from ogl_beamforming_tpu.ops.das import das_jit
    from ogl_beamforming_tpu.utils.transfer import sync

    plan = plan_builder()
    rf = jnp.asarray(
        np.random.randint(-2048, 2048, rf_shape).astype(np.int16))

    def measure(tag, knobs):
        das_pallas.ABLATE.clear()
        das_pallas.ABLATE.update(knobs)
        das_pallas._das_call.cache_clear()
        das_jit.clear_cache()
        from ogl_beamforming_tpu.pipeline.plan import clear_plan_cache
        clear_plan_cache()
        p = plan_builder()
        try:
            for _ in range(1):
                sync(p(rf))
            t0 = time.perf_counter()
            for _ in range(iters):
                out = p(rf)
            sync(out)
            ms = (time.perf_counter() - t0) / iters * 1e3
            print(json.dumps({f"{name}.{tag}": round(ms, 1)}), flush=True)
            return ms
        except Exception as e:
            print(json.dumps({f"{name}.{tag}": str(e)[:200]}), flush=True)
            return None

    full = measure("full", {})
    ng = measure("no_gather", {"no_gather": 1})
    ncl = measure("no_chunk_loop", {"no_chunk_loop": 1})
    nu = measure("no_unit", {"no_unit": 1})
    # rf_pin kills the per-step RF block refetch (timing-only, numerics
    # garbage): no_unit - no_unit+rf_pin = the HBM refetch traffic share
    # of "fixed"; the remainder is grid/bookkeeping overhead.
    measure("no_unit_rf_pin", {"no_unit": 1, "rf_pin": 1})
    measure("full_rf_pin", {"rf_pin": 1})
    das_pallas.ABLATE.clear()
    das_pallas._das_call.cache_clear()
    das_jit.clear_cache()
    if None not in (full, ng, ncl, nu):
        print(json.dumps({name: {
            "full": round(full, 1),
            "gathers": round(full - ng, 1),
            "chunk_nongather": round(ng - ncl, 1),
            "pair_prep": round(ncl - nu, 1),
            "fixed": round(nu, 1)}}), flush=True)


def hercules_plan():
    from ogl_beamforming_tpu.models.presets import hercules_3d
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    p, pipe = hercules_3d()
    return build_plan(p, pipe, {})


def uforces_plan():
    from ogl_beamforming_tpu.models.presets import uforces_volumetric
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    p, pipe, sparse = uforces_volumetric()
    return build_plan(p, pipe, {}, sparse_elements=sparse)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("hercules", "both"):
        split("hercules_96", hercules_plan, (128, 128, 2048))
    if which in ("uforces", "both"):
        split("uforces_128", uforces_plan, (256, 64, 2048), iters=2)


if __name__ == "__main__":
    main()
