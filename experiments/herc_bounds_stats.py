"""Predict HERCULES executed-chunk totals with per-(tile, acq-block) bounds.

Current kernel: per-(tile, ch-unit) bounds, unioned over ALL acquisitions.
Candidate: additionally intersect with per-(tile, acq-block) bounds
(unioned over channels) — each acq has one tx element, so the per-acq delay
interval is much tighter than the all-acq union.
"""
import dataclasses, json
import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from ogl_beamforming_tpu.models.presets import hercules_3d
    from ogl_beamforming_tpu.ops import das_pallas as dp
    from ogl_beamforming_tpu.pipeline.plan import build_plan

    c = a = 128
    n = 96
    p, pipe = hercules_3d()
    plan = build_plan(p, pipe, {})
    sd = next(sd for sd in plan.descriptor.stages if sd.das is not None)
    st = sd.das
    dyn = dict(plan.dyn["das"])

    sc = np.zeros(dp._N_SCALARS, np.float32)
    sc[dp._SC_FS] = dyn["sampling_frequency"]
    sc[dp._SC_SOS] = dyn["speed_of_sound"]
    sc[dp._SC_T0] = dyn["time_offset"]
    sc[dp._SC_FNUM] = dyn["f_number"]
    sc[dp._SC_PX] = dyn["xdc_element_pitch"][0]
    sc[dp._SC_PY] = dyn["xdc_element_pitch"][1]
    orient = np.asarray(dyn["orientations"], np.float32)
    sc[dp._SC_TX_O] = np.floor(orient[0] / 16)
    rx_o = int(orient[0]) & 0xF
    sc[dp._SC_RX_FLAG] = 1.0 if rx_o == 2 else 0.0
    sc[dp._SC_FDEMOD] = dyn["demodulation_frequency"]
    sc[dp._SC_TX_ANGLE] = dyn["focal_vectors"][0, 0]
    sc[dp._SC_TX_DEPTH] = dyn["focal_vectors"][0, 1]
    t0_arr = np.arange(a, dtype=np.float32)          # tx element indices
    t1_arr = np.ones(a, np.float32)
    t1_arr[0] = 1.0 / np.sqrt(a)

    ch_block = 8
    n_cb = c // ch_block
    fn = jax.jit(lambda s_, t0_, t1_, v_, x_: dp._tile_activity(
        st, s_, t0_, t1_, v_, x_, n_grid=a, n_cb=n_cb, ch_block=ch_block))
    act, qlo, qhi, *_ = fn(jnp.asarray(sc), jnp.asarray(t0_arr),
                       jnp.asarray(t1_arr),
                       jnp.asarray(dyn["voxel_transform"]),
                       jnp.asarray(dyn["xdc_transform"]))
    qlo = np.asarray(qlo).reshape(-1, n_cb)
    qhi = np.asarray(qhi).reshape(-1, n_cb)
    span = np.maximum(0, qhi - qlo + 1)
    n_blocks = a // 4
    # current: every acq-block scans the ch-unit union span
    cur = span.sum() * ch_block * n_blocks * 4
    print(json.dumps({"current_unit_chunks_x_pairs": int(cur),
                      "mean_span": float(span[span > 0].mean())}),
          flush=True)

    # candidate: per-(tile, acq-block-of-4) bounds via the same machinery —
    # reuse _tile_activity with a single acq block at a time by passing a
    # t0 slice, then intersect with the per-ch-unit bounds.
    tot = 0
    spans_b = []
    for b in range(n_blocks):
        fnb = jax.jit(lambda s_, t0_, t1_, v_, x_: dp._tile_activity(
            st, s_, t0_, t1_, v_, x_, n_grid=4, n_cb=n_cb,
            ch_block=ch_block))
        _, qlo_b, qhi_b, *_b = fnb(jnp.asarray(sc),
                              jnp.asarray(t0_arr[4 * b:4 * b + 4]),
                              jnp.asarray(t1_arr[4 * b:4 * b + 4]),
                              jnp.asarray(dyn["voxel_transform"]),
                              jnp.asarray(dyn["xdc_transform"]))
        qlo_b = np.asarray(qlo_b).reshape(-1, n_cb)
        qhi_b = np.asarray(qhi_b).reshape(-1, n_cb)
        lo = np.maximum(qlo, qlo_b)
        hi = np.minimum(qhi, qhi_b)
        sp = np.maximum(0, hi - lo + 1)
        spans_b.append(sp[sp > 0].mean() if (sp > 0).any() else 0.0)
        tot += sp.sum() * ch_block * 4
    print(json.dumps({"per_block_unit_chunks_x_pairs": int(tot),
                      "ratio": round(float(tot) / cur, 3),
                      "mean_span_blocks": round(float(np.mean(spans_b)), 2)}),
          flush=True)


if __name__ == "__main__":
    main()
