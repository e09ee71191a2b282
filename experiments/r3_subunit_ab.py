"""Round-3 sub-unit bounds A/B: ch_sub (per-subgroup chunk bounds nested
inside the big channel step) + the single-op AND index wrap, on the
headline and the two multi-transmit families.

Span prediction (experiments/chblock_span_stats.py): ch_block=32 union
bounds execute ~15% more chunk work than 8-channel bounds on the
headline; ch_sub recovers it without giving up the 32-wide amortization.
"""
import json
import time


def main():
    import dataclasses

    import numpy as np
    import jax

    from ogl_beamforming_tpu.models.presets import (forces_compounding,
                                                    hercules_3d,
                                                    plane_wave_2d)
    from ogl_beamforming_tpu.ops import das_pallas
    from ogl_beamforming_tpu.ops.das import das_jit
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from ogl_beamforming_tpu.utils.transfer import sync

    # tunnel-health gate
    probe = np.arange(8, dtype=np.float32)
    np.asarray(jax.device_put(probe))
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(jax.device_put(probe))
    rtt = (time.perf_counter() - t0) / 3 * 1e3
    print(f"tunnel RTT {rtt:.1f} ms", flush=True)
    if rtt > 80:
        raise SystemExit("degraded tunnel — refusing to measure")

    def measure(name, knobs, st, dyn, rf, iters=32, warmup=3):
        das_pallas.ABLATE.clear()
        das_pallas.ABLATE.update(knobs)
        das_pallas._das_call.cache_clear()
        das_jit.clear_cache()
        try:
            dyn = dict(dyn)      # deployment config: tables precomputed
            dyn["das_tables"] = das_pallas.das_activity_tables(dyn, st)
            for _ in range(warmup):
                sync(das_jit(rf, dyn, st))
            t0 = time.perf_counter()
            for _ in range(iters):
                out = das_jit(rf, dyn, st)
            sync(out)
            ms = (time.perf_counter() - t0) / iters * 1e3
            print(json.dumps({name: round(ms, 2)}), flush=True)
        except Exception as e:
            print(json.dumps({name: str(e)[:300]}), flush=True)

    rng = np.random.default_rng(3)

    # headline: plane-wave 512x1024 C=256 cubic IQ
    c, s = 256, 4096
    p, pipe = plane_wave_2d(channel_count=c, sample_count=s,
                            output_points=(512, 1024))
    plan = build_plan(p, pipe, {})
    st = dataclasses.replace(
        next(sd for sd in plan.descriptor.stages if sd.das is not None).das,
        iq=True)
    dyn = plan.dyn["das"]
    re = rng.standard_normal((c, 1, s)).astype(np.float32)
    im = rng.standard_normal((c, 1, s)).astype(np.float32)
    rf = jax.jit(lambda a, b: jax.lax.complex(a, b))(re, im)
    for name, knobs in [
        ("hl_default(and-wrap+tables)", {}),
        ("hl_ch_sub8", {"ch_sub": 8}),
        ("hl_ch_sub16", {"ch_sub": 16}),
        ("hl_ch_sub8_rh2", {"ch_sub": 8, "row_halves": 2}),
        ("hl_ch_sub16_rh2", {"ch_sub": 16, "row_halves": 2}),
        ("hl_cb16_sub8", {"ch_block": 16, "ch_sub": 8}),
        ("hl_ts32_rh4_sub8", {"tile_sub": 32, "row_halves": 4,
                              "ch_sub": 8}),
    ]:
        measure(name, knobs, st, dyn, rf)

    # isolate the per-frame activity-table cost at each granularity (it
    # runs inside the frame jit; ch_sub multiplies its unit axis)
    import jax.numpy as jnp
    from experiments.layout_stats import rca_tables, scalars_for
    sc = scalars_for(dyn, das_pallas)
    t0a, t1a = rca_tables(dyn)
    vtj = jnp.asarray(dyn["voxel_transform"])
    xdj = jnp.asarray(dyn["xdc_transform"])
    for cb, halves, label in [(32, 1, "act_cb32"), (8, 1, "act_sub8"),
                              (16, 1, "act_sub16"),
                              (8, 2, "act_sub8_rh2")]:
        n_cb = -(-st.local_channels // cb)
        fn = jax.jit(lambda s_, a_, b_, v_, x_, cb=cb, n_cb=n_cb,
                     halves=halves: das_pallas._tile_activity(
                         st, s_, a_, b_, v_, x_, n_grid=st.acquisition_count,
                         n_cb=n_cb, ch_block=cb, halves=halves))
        sync(fn(sc, t0a, t1a, vtj, xdj)[0])
        t0 = time.perf_counter()
        for _ in range(32):
            out = fn(sc, t0a, t1a, vtj, xdj)
        sync(out[0])
        print(json.dumps({label: round((time.perf_counter() - t0)
                                       / 32 * 1e3, 3)}), flush=True)

    # FORCES big grid (linear)
    p, pipe = forces_compounding(channel_count=256, transmit_count=16,
                                 sample_count=2048,
                                 output_points=(512, 1024),
                                 demodulate=False)
    plan = build_plan(p, pipe, {})
    st = dataclasses.replace(
        next(sd for sd in plan.descriptor.stages if sd.das is not None).das,
        iq=False)
    rfb = np.asarray(
        rng.standard_normal((256, 16, 2048)).astype(np.float32))
    for name, knobs in [
        ("fb_default", {}),
        ("fb_ch_sub4", {"ch_sub": 4}),
        ("fb_txb8_ch_sub4", {"tx_block": 8, "ch_sub": 4}),
    ]:
        measure(name, knobs, st, plan.dyn["das"], rfb, iters=8, warmup=1)

    # HERCULES 3D 96^3
    p, pipe = hercules_3d(channel_count=128, acquisition_count=128,
                          sample_count=4096, output_points=(96, 96, 96))
    plan = build_plan(p, pipe, {})
    st = dataclasses.replace(
        next(sd for sd in plan.descriptor.stages if sd.das is not None).das,
        iq=False)
    rfh = np.asarray(
        rng.standard_normal((128, 128, 4096)).astype(np.float32))
    for name, knobs in [
        ("hc_default", {}),
        ("hc_ch_sub4", {"ch_sub": 4}),
    ]:
        measure(name, knobs, st, plan.dyn["das"], rfh, iters=3, warmup=1)

    das_pallas.ABLATE.clear()


if __name__ == "__main__":
    main()
