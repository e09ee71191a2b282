"""Executed-gather audit of the two bench chains' DAS stage (CPU only).

chain_floor_split.py measured the gather component by ablation
(decode chain 2.36 ms, demod chain 4.70 ms on v5e).  This script
*predicts* those components from first principles: it walks the exact
prefetched chunk-bound tables the kernel intersects per
(tile, channel-unit, transmit-block) step (das_activity_tables — the
same tables the hardware run prefetches), counts executed chunk scans,
converts to gathered (8,128) vregs, and charges the measured
3.53 cyc/vreg paired-gather rate (experiments/gather_micro3.py).

If prediction ~= ablation measurement, the gather component runs at its
*executed* floor and the only gather lever left is scanning fewer
chunks; a large measured excess would instead indicate issue-rate loss
inside the chunk loop.

Run anywhere (forces CPU): PYTHONPATH=/root/repo python
experiments/chain_chunk_stats.py
"""
import dataclasses
import json

import numpy as np


def executed_stats(plan, label, measured_ms=None):
    import jax.numpy as jnp  # noqa: F401  (device arrays -> np below)
    from ogl_beamforming_tpu.ops import das_pallas as dp

    sd = next(sd for sd in plan.descriptor.stages if sd.das is not None)
    st = dp.das_table_static(sd.das)
    dyn = dict(plan.dyn["das"])

    act, qlo, qhi, qblo, qbhi = (np.asarray(t)
                                 for t in dp.das_activity_tables(dyn, st))

    n_grid = st.acquisition_count
    tx_block = min(dp._knob(st, "tx_block", dp._TXB.get(st.family, 4)),
                   n_grid)
    cb_default = (32 if st.family == "rca" and dp._pack_iq(st)
                  else 16 if st.family == "rca" else 8)
    ch_block = min(dp._knob(st, "ch_block", cb_default), st.local_channels)
    bounds_cb = dp._ch_sub(st, ch_block)
    halves = dp._row_halves(st)
    n_blocks = -(-n_grid // tx_block)
    ts = dp._tile_rows(st)
    n_tiles = act.size

    qlo = qlo.reshape(n_tiles, -1, halves)
    qhi = qhi.reshape(n_tiles, -1, halves)
    if n_blocks > 1:
        qblo = qblo.reshape(n_tiles, n_blocks)
        qbhi = qbhi.reshape(n_tiles, n_blocks)
    else:
        qblo = np.full((n_tiles, 1), qlo.min())
        qbhi = np.full((n_tiles, 1), qhi.max())

    # Intersected span per (tile, bounds-unit, half, tx-block): the
    # kernel's shared predicate region scans this span once per step and
    # every (channel, transmit) pair of the step pays its gathers in it.
    lo = np.maximum(qlo[:, :, :, None], qblo[:, None, None, :])
    hi = np.minimum(qhi[:, :, :, None], qbhi[:, None, None, :])
    span = np.maximum(0, hi - lo + 1)                # chunk scans

    # Gathers per scanned chunk per (channel, transmit) pair per
    # vreg-row of the tile half: cubic packed-IQ fetches 4 int32 words
    # (one per tap); real pack_pairs fetches 2 (taps share words).
    from ogl_beamforming_tpu.params.enums import InterpolationMode
    taps = 4 if st.interpolation_mode == InterpolationMode.Cubic else 2
    if st.iq:
        g_per = taps if dp._pack_iq(st) else taps * 2
    else:
        g_per = taps // 2 if dp._knob(st, "pack_pairs", 1) else taps
    pairs_per_bounds_unit = bounds_cb
    vregs_per_half = ts // halves * 128 / 1024.0

    executed_vregs = (span.sum() * pairs_per_bounds_unit * tx_block
                      * g_per * vregs_per_half)
    rate = 3.53                                      # cyc/vreg, paired
    pred_ms = executed_vregs * rate / 0.94e9 * 1e3
    out = {
        "label": label, "family": st.family, "iq": bool(st.iq),
        "tiles": int(n_tiles), "active_tiles": int((act > 0).sum()),
        "ch_block": ch_block, "bounds_cb": bounds_cb,
        "tx_block": tx_block, "halves": halves, "tile_rows": ts,
        "gathers_per_pair_chunk_vreg": g_per,
        "executed_chunk_scans": int(span.sum()),
        "executed_gather_vregs_M": round(executed_vregs / 1e6, 2),
        "predicted_gather_ms_at_3.53": round(pred_ms, 2),
    }
    if measured_ms is not None:
        out["measured_ablation_ms"] = measured_ms
        out["measured_over_predicted"] = round(measured_ms / pred_ms, 2)
    print(json.dumps(out), flush=True)
    return out


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from experiments.chain_floor_split import (decode_chain_plan,
                                               demod_chain_plan)

    executed_stats(decode_chain_plan(), "decode_chain (real RF)",
                   measured_ms=2.36)
    executed_stats(demod_chain_plan(), "demod_chain (IQ)", measured_ms=4.70)

    # 3D volumes at their *currently shipped* tuned knobs (hercules
    # tile_sub=16, uforces tx_block=32 — the round-4 follow-up sweep
    # winners): the predicted gather component is the executed-gather
    # floor the measured volume times should be compared against.
    # (floor_split_3d.py's measured ablations — HERCULES 86.4 ms,
    # uFORCES 267.1 ms — were taken at the round-3 knobs, so they are
    # context here, not a same-config ratio.)
    from ogl_beamforming_tpu.models import presets
    from ogl_beamforming_tpu.pipeline.plan import build_plan

    p, pipe = presets.hercules_3d()
    executed_stats(build_plan(p, pipe, {}), "hercules_3d 96^3 (shipped)")

    p, pipe, sparse = presets.uforces_volumetric()
    executed_stats(build_plan(p, pipe, {}, sparse_elements=sparse),
                   "uforces_3d 128^3 (shipped)")


if __name__ == "__main__":
    main()
