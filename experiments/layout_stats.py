"""Predict DAS gather work from _tile_activity chunk bounds (no kernel).

Compares the executed-chunk totals of the current 2D layout (axial y on
vector lanes) against a transposed layout (lateral x on lanes, simulated by
swapping the voxel-transform columns + output_points), plus per-channel
bounds tightness.  Gather vregs ~ sum over active (tile, unit) of
(qhi - qlo + 1) * pairs * taps * planes * (tile_rows * 128 / 1024).
"""
import dataclasses
import json

import numpy as np


def rca_tables(dyn):
    import jax.numpy as jnp
    orient = dyn["orientations"].astype(jnp.float32)
    t0 = jnp.stack([orient, dyn["focal_vectors"][:, 0]], axis=-1).reshape(-1)
    t1 = dyn["focal_vectors"][:, 1]
    return t0, t1


def scalars_for(dyn, dp):
    import jax.numpy as jnp
    sc = np.zeros(dp._N_SCALARS, np.float32)
    sc[dp._SC_FS] = dyn["sampling_frequency"]
    sc[dp._SC_SOS] = dyn["speed_of_sound"]
    sc[dp._SC_T0] = dyn["time_offset"]
    sc[dp._SC_FNUM] = dyn["f_number"]
    sc[dp._SC_PX] = dyn["xdc_element_pitch"][0]
    sc[dp._SC_PY] = dyn["xdc_element_pitch"][1]
    sc[dp._SC_FDEMOD] = dyn["demodulation_frequency"]
    return jnp.asarray(sc)


def chunk_stats(st, dyn, dp, ch_block=8, label=""):
    import jax
    import jax.numpy as jnp
    sc = scalars_for(dyn, dp)
    t0, t1 = rca_tables(dyn)
    n_cb = -(-st.local_channels // ch_block)
    fn = jax.jit(lambda s_, a_, b_, v_, x_: dp._tile_activity(
        st, s_, a_, b_, v_, x_, n_grid=st.acquisition_count,
        n_cb=n_cb, ch_block=ch_block))
    act, qlo, qhi, *_ = fn(sc, t0, t1, jnp.asarray(dyn["voxel_transform"]),
                       jnp.asarray(dyn["xdc_transform"]))
    act = np.asarray(act)
    qlo = np.asarray(qlo).reshape(-1, n_cb)
    qhi = np.asarray(qhi).reshape(-1, n_cb)
    span = np.maximum(0, qhi - qlo + 1)
    ts = dp._tile_rows(st)
    # executed chunks summed over (tile, unit); each unit covers ch_block
    # pairs, each pair's chunk costs taps*planes*(ts*128/1024) gather vregs
    total_unit_chunks = span.sum()
    vregs = total_unit_chunks * ch_block * 4 * 2 * (ts * 128 / 1024)
    return {
        "label": label,
        "tiles": int(act.size), "active_tiles": int((act > 0).sum()),
        "mean_span_active": float(span[span > 0].mean()),
        "unit_chunks": int(total_unit_chunks),
        "gather_vregs_M": round(vregs / 1e6, 2),
        "pred_ms_at_0.94GHz": round(vregs / 0.94e9 * 1e3, 2),
    }


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from ogl_beamforming_tpu.models.presets import plane_wave_2d
    from ogl_beamforming_tpu.ops import das_pallas as dp
    from ogl_beamforming_tpu.pipeline.plan import build_plan

    c, s, nx, nz = 256, 4096, 512, 1024
    p, pipe = plane_wave_2d(channel_count=c, sample_count=s,
                            output_points=(nx, nz))
    plan = build_plan(p, pipe, {})
    sd = next(sd for sd in plan.descriptor.stages if sd.das is not None)
    st = dataclasses.replace(sd.das, iq=True)
    dyn = dict(plan.dyn["das"])

    print(json.dumps(chunk_stats(st, dyn, dp, label="axial-lanes (current)")),
          flush=True)
    print(json.dumps(chunk_stats(st, dyn, dp, ch_block=1,
                                 label="axial-lanes per-channel bounds")),
          flush=True)

    # Transposed: swap voxel-transform columns 0<->1 and output_points —
    # identical world geometry, x index now advances along what was y.
    vt = np.asarray(dyn["voxel_transform"]).copy()
    vt[:, [0, 1]] = vt[:, [1, 0]]
    dyn2 = dict(dyn)
    dyn2["voxel_transform"] = vt
    st2 = dataclasses.replace(st, output_points=(st.output_points[1],
                                                 st.output_points[0], 1))
    print(json.dumps(chunk_stats(st2, dyn2, dp,
                                 label="lateral-lanes (transposed)")),
          flush=True)
    print(json.dumps(chunk_stats(st2, dyn2, dp, ch_block=1,
                                 label="lateral-lanes per-channel bounds")),
          flush=True)

    # margin sensitivity on the winner
    for m in (2.0, 0.0):
        dp.ABLATE["margin"] = m
        print(json.dumps(chunk_stats(st2, dyn2, dp,
                                     label=f"lateral-lanes margin={m}")),
              flush=True)
    dp.ABLATE.clear()


if __name__ == "__main__":
    main()
