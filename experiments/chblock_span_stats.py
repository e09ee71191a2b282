"""Executed-chunk totals vs channel-block bound granularity (headline).

ch_block=32 won on amortization but its per-(tile, unit) chunk bounds
union 32 channels' rx delays — this sizes how much gather work sub-unit
(channel-halves) bounds could recover, entirely from _tile_activity
tables (no kernel run)."""
import dataclasses
import json

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ogl_beamforming_tpu.models.presets import plane_wave_2d
    from ogl_beamforming_tpu.ops import das_pallas as dp
    from ogl_beamforming_tpu.pipeline.plan import build_plan
    from experiments.layout_stats import rca_tables, scalars_for

    c, s, nx, nz = 256, 4096, 512, 1024
    p, pipe = plane_wave_2d(channel_count=c, sample_count=s,
                            output_points=(nx, nz))
    plan = build_plan(p, pipe, {})
    sd = next(sd for sd in plan.descriptor.stages if sd.das is not None)
    st = dataclasses.replace(sd.das, iq=True)
    dyn = dict(plan.dyn["das"])
    sc = scalars_for(dyn, dp)
    t0, t1 = rca_tables(dyn)

    for cb, halves in [(8, 1), (16, 1), (32, 1), (32, 2), (16, 2)]:
        n_cb = -(-st.local_channels // cb)
        fn = jax.jit(lambda s_, a_, b_, v_, x_, cb=cb, n_cb=n_cb,
                     halves=halves: dp._tile_activity(
                         st, s_, a_, b_, v_, x_,
                         n_grid=st.acquisition_count, n_cb=n_cb,
                         ch_block=cb, halves=halves))
        act, qlo, qhi, *_ = fn(sc, t0, t1,
                               jnp.asarray(dyn["voxel_transform"]),
                               jnp.asarray(dyn["xdc_transform"]))
        qlo = np.asarray(qlo).reshape(-1, n_cb, halves)
        qhi = np.asarray(qhi).reshape(-1, n_cb, halves)
        # executed chunks for the *union* region (what the chunk loop
        # branches on) and for the nested per-half regions (what each
        # half actually gathers)
        u_lo = qlo.min(axis=2)
        u_hi = qhi.max(axis=2)
        union_span = np.maximum(0, u_hi - u_lo + 1)
        half_span = np.maximum(0, qhi - qlo + 1)
        # per-pair gather work ~ sum over units of span * cb (each unit
        # serves cb channels); halves do half the rows' work each
        work_union = union_span.sum() * cb
        work_half = half_span.sum() * cb / halves
        print(json.dumps({
            "ch_block": cb, "row_halves": halves,
            "mean_union_span": round(float(
                union_span[union_span > 0].mean()), 2),
            "chunk_work_per_channel": int(work_union / st.local_channels),
            "half_weighted_work": int(work_half / st.local_channels),
        }), flush=True)


if __name__ == "__main__":
    main()
