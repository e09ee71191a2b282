"""Pallas TPU delay-and-sum kernel.

The performance-critical replacement for the XLA-gather DAS in ops/das.py
(XLA lowers per-voxel gathers to serialized loops on TPU — measured ~100x
off roofline).  This kernel exploits the one dynamic-gather shape Mosaic
supports natively — ``take_along_axis`` within a 128-lane row — by chunking
each RF line into 128-sample rows and looping only over the chunk range a
voxel tile actually touches:

  * Voxels are tiled (8, 128) = 1024 per tile (f32 native tile), world
    positions computed in-kernel from iotas + the voxel transform (VPU, no
    HBM traffic).
  * Grid = (voxel_tiles, channels); the output block index map ignores the
    channel dim, so Mosaic keeps the accumulator tile resident in VMEM
    across the whole channel loop (the reference's channel-chunk
    accumulation, beamformer_core.c:1577-1587, without round trips).
  * Per (channel, transmit): fractional delays for the tile (VPU), then for
    each 128-sample chunk ``q`` in [qmin, qmax] of the RF line: broadcast the
    chunk across sublanes, one lane-gather per interpolation tap, masked
    accumulate.  ``qmin/qmax`` are computed from the tile's delay extrema so
    the loop runs ~(tile delay span)/128 + 1 iterations instead of S/128.
  * IQ data is carried as separate re/im f32 planes (TPU has no native
    complex); the phase rotation exp(+j 2 pi f_d idx / fs) (das.glsl:51-59)
    is applied per gathered sample.

Geometry math mirrors das.glsl exactly; numerics are validated against
ops/golden.py like the XLA path (tests/test_das_pallas.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params.enums import AcquisitionKind, InterpolationMode
from .das import DasStatic, make_dynamic, make_static  # noqa: F401 (re-export)

TILE_SUB = 8      # sublanes per voxel tile
TILE_LANE = 128   # lanes per voxel tile
TILE = TILE_SUB * TILE_LANE
CHUNK = 128       # RF line chunk width (= lane count, gather domain)

_TWO_PI = np.float32(2.0 * np.pi)


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# In-kernel helpers
# ---------------------------------------------------------------------------

def _n_z_tiles(st: DasStatic) -> int:
    return _cdiv(st.output_points[2], TILE_LANE)


def _n_row_tiles(st: DasStatic) -> int:
    nx, ny, _ = st.output_points
    return _cdiv(nx * ny, TILE_SUB)


def _tile_world_points(st: DasStatic, tile_idx, vt):
    """World xyz for this tile's voxels, each (TILE_SUB, TILE_LANE).

    Tiles are (8 image rows x 128 depth voxels): sublane = consecutive image
    rows (x/y raster), lane = consecutive z.  Keeping a tile *depth-local*
    bounds its delay spread, so the chunk loop in _gather_chunk_accum runs
    ~(tile delay span)/128 + 1 iterations instead of sample_count/128 — the
    VMEM-locality move that replaces the reference GPU's per-thread caching.
    """
    nx, ny, nz = st.output_points
    zt = _n_z_tiles(st)
    row_tile = tile_idx // zt
    z_tile = tile_idx % zt
    row = (row_tile * TILE_SUB
           + jax.lax.broadcasted_iota(jnp.int32, (TILE_SUB, TILE_LANE), 0))
    iz = (z_tile * TILE_LANE
          + jax.lax.broadcasted_iota(jnp.int32, (TILE_SUB, TILE_LANE), 1))
    iy = row % ny
    ix = row // ny
    denom_x = np.float32(max(nx - 1, 1))
    denom_y = np.float32(max(ny - 1, 1))
    denom_z = np.float32(max(nz - 1, 1))
    px = ix.astype(jnp.float32) / denom_x
    py = iy.astype(jnp.float32) / denom_y
    pz = iz.astype(jnp.float32) / denom_z
    x = vt[0, 0] * px + vt[0, 1] * py + vt[0, 2] * pz + vt[0, 3]
    y = vt[1, 0] * px + vt[1, 1] * py + vt[1, 2] * pz + vt[1, 3]
    z = vt[2, 0] * px + vt[2, 1] * py + vt[2, 2] * pz + vt[2, 3]
    in_range = (row < nx * ny) & (iz < nz)
    return x, y, z, in_range


def _interp_weights(st: DasStatic, t):
    """Tap offsets + weights for the static interpolation mode.

    Returns a list of (offset, weight(t)) pairs; offsets are relative to
    floor(index).  Matches das.glsl:64-122 (Catmull-Rom C=0.5 for cubic).
    """
    mode = st.interpolation_mode
    one = jnp.float32(1.0)
    if mode == InterpolationMode.Nearest:
        # round(index) = floor(index + 0.5); handled by caller re-flooring.
        return [(0, one)]
    if mode == InterpolationMode.Linear:
        return [(0, 1.0 - t), (1, t)]
    t2 = t * t
    t3 = t2 * t
    h00 = 2 * t3 - 3 * t2 + 1
    h01 = -2 * t3 + 3 * t2
    h10 = t3 - 2 * t2 + t
    h11 = t3 - t2
    # value = h00*P1 + h01*P2 + h10*0.5*(P2-P0) + h11*0.5*(P3-P1)
    w_m1 = -0.5 * h10
    w_0 = h00 - 0.5 * h11
    w_p1 = h01 + 0.5 * h10
    w_p2 = 0.5 * h11
    return [(-1, w_m1), (0, w_0), (1, w_p1), (2, w_p2)]


def _valid_mask(st: DasStatic, index, k):
    """Reference validity windows (das.glsl:101-119)."""
    s = st.sample_count
    mode = st.interpolation_mode
    if mode == InterpolationMode.Nearest:
        return (k >= 0) & (jnp.floor(index + 0.5) < s)
    if mode == InterpolationMode.Linear:
        return (k >= 0) & (k < s - 1)
    return (k > 0) & (k < s - 2)


def _gather_chunk_accum(st, rf_ref, a_idx, k, taps, mask_apod,
                        qmin, qmax, phase_re, phase_im, acc_re, acc_im):
    """Loop RF chunks q in [qmin, qmax]; for each interpolation tap do a
    lane-gather from the broadcast chunk and accumulate.

    ``rf_ref``: (A, S) or (2, A, S) (re/im planes) VMEM block ref.
    ``k``: (8,128) int32 floor indices.  ``taps``: [(offset, weight)].
    ``phase_*``: rotation factors or None.  Returns updated accumulators.
    """
    iq = st.iq
    s = st.sample_count

    def body(q, carry):
        acc_re, acc_im = carry
        # RF lines are flattened (A*S,) per channel; sample s of transmit a
        # lives at a*S + s.  S and q*CHUNK are multiples of 128 so the load
        # offset is provably lane-aligned (Mosaic requirement).
        base = pl.multiple_of(a_idx * s + q * CHUNK, CHUNK)
        if iq:
            chunk_re = rf_ref[0, 0:1, pl.ds(base, CHUNK)]
            chunk_im = rf_ref[0, 1:2, pl.ds(base, CHUNK)]
            src_re = jnp.broadcast_to(chunk_re.reshape(1, CHUNK),
                                      (TILE_SUB, CHUNK))
            src_im = jnp.broadcast_to(chunk_im.reshape(1, CHUNK),
                                      (TILE_SUB, CHUNK))
        else:
            chunk = rf_ref[0, 0:1, pl.ds(base, CHUNK)]
            src_re = jnp.broadcast_to(chunk.reshape(1, CHUNK),
                                      (TILE_SUB, CHUNK))
            src_im = None
        for off, w in taps:
            r = k + off - q * CHUNK
            sel = (r >= 0) & (r < CHUNK)
            rc = jnp.clip(r, 0, CHUNK - 1)
            g_re = jnp.take_along_axis(src_re, rc, axis=-1)
            wsel = jnp.where(sel, mask_apod * w, 0.0)
            if iq:
                g_im = jnp.take_along_axis(src_im, rc, axis=-1)
                # rotate: (g_re + j g_im) * (phase_re + j phase_im)
                acc_re = acc_re + wsel * (g_re * phase_re - g_im * phase_im)
                acc_im = acc_im + wsel * (g_re * phase_im + g_im * phase_re)
            else:
                acc_re = acc_re + wsel * g_re
        return acc_re, acc_im

    return jax.lax.fori_loop(qmin, qmax + 1, body, (acc_re, acc_im))


def _accumulate_sample(st, rf_ref, a_idx, index, mask_apod, dyn_refs,
                       acc_re, acc_im, acc_in):
    """Full sample_rf + accumulate for one (channel, transmit) over the tile:
    validity, interpolation taps, IQ rotation, coherency accumulation."""
    iq = st.iq
    if st.interpolation_mode == InterpolationMode.Nearest:
        k = jnp.floor(index + 0.5).astype(jnp.int32)
        kf = jnp.floor(index).astype(jnp.int32)
        valid = (kf >= 0) & (k < st.sample_count)
        t = None
        taps = [(0, jnp.float32(1.0))]
        k_gather = k
    else:
        kf32 = jnp.floor(index)
        k_gather = kf32.astype(jnp.int32)
        valid = _valid_mask(st, index, k_gather)
        t = index - kf32
        taps = _interp_weights(st, t)

    mask = mask_apod * valid.astype(jnp.float32)

    # Chunk range actually touched by this tile (+ tap margins).
    min_off = min(off for off, _ in taps)
    max_off = max(off for off, _ in taps)
    k_lo = jnp.min(jnp.where(valid, k_gather, st.sample_count)) + min_off
    k_hi = jnp.max(jnp.where(valid, k_gather, 0)) + max_off
    qmin = jnp.clip(k_lo // CHUNK, 0, (st.sample_count - 1) // CHUNK)
    qmax = jnp.clip(k_hi // CHUNK, 0, (st.sample_count - 1) // CHUNK)

    if iq:
        arg = (_TWO_PI * dyn_refs["demodulation_frequency"]
               * index / dyn_refs["sampling_frequency"])
        phase_re = jnp.cos(arg)
        phase_im = jnp.sin(arg)
    else:
        phase_re = phase_im = None

    c_re = jnp.zeros_like(index)
    c_im = jnp.zeros_like(index)
    c_re, c_im = _gather_chunk_accum(
        st, rf_ref, a_idx, k_gather, taps, mask, qmin, qmax,
        phase_re, phase_im, c_re, c_im)

    acc_re = acc_re + c_re
    if iq:
        acc_im = acc_im + c_im
        if st.coherency_weighting:
            acc_in = acc_in + jnp.sqrt(c_re * c_re + c_im * c_im)
    elif st.coherency_weighting:
        acc_in = acc_in + jnp.abs(c_re)
    return acc_re, acc_im, acc_in


# ---------------------------------------------------------------------------
# Family kernels
#
# All share the grid layout (voxel_tiles, channels) with the accumulator
# block resident across the channel loop, SMEM scalar-prefetched geometry
# tables, and the chunked lane-gather accumulate above.  They differ only in
# the delay/apodization math, mirroring das.glsl's dispatch (das.glsl:368-400).
# ---------------------------------------------------------------------------

_N_SCALARS = 12
_SC_FS, _SC_SOS, _SC_T0, _SC_FNUM, _SC_PX, _SC_PY, _SC_FDEMOD, \
    _SC_RX_FLAG, _SC_TX_O, _SC_TX_ANGLE, _SC_TX_DEPTH, _SC_CH0 = range(_N_SCALARS)


def _finish(st, ch, acc_re, acc_im, acc_in,
            out_re_ref, out_im_ref, out_in_ref):
    @pl.when(ch == 0)
    def _():
        out_re_ref[:] = jnp.zeros_like(out_re_ref)
        if st.iq:
            out_im_ref[:] = jnp.zeros_like(out_im_ref)
        if st.coherency_weighting:
            out_in_ref[:] = jnp.zeros_like(out_in_ref)

    out_re_ref[:] += acc_re
    if st.iq:
        out_im_ref[:] += acc_im
    if st.coherency_weighting:
        out_in_ref[:] += acc_in


def _forces_kernel(st: DasStatic, scalars_ref, tx_x_ref, tx_w_ref, tx_acq_ref,
                   vt_ref, xdc_ref, rf_ref,
                   out_re_ref, out_im_ref, out_in_ref):
    """FORCES / UFORCES / READI-FORCES (das.glsl:286-366).

    SMEM tables: tx_x (element x positions, sparse/READI-resolved on host,
    flattened group-major for READI), tx_w (per-element weight: 1 or the
    READI Hadamard row entry, das.glsl:349-350); tx_acq unused (kept for a
    uniform call signature).  The rf acquisition index is always the inner
    loop variable — deriving load addresses from SMEM table values defeats
    Mosaic's alignment analysis and serializes the vector loads.
    The voxel transform is already XDC-premultiplied (beamformer_core.c:760).
    """
    tile = pl.program_id(0)
    ch = pl.program_id(1)

    fs = scalars_ref[_SC_FS]
    sos = scalars_ref[_SC_SOS]
    t0 = scalars_ref[_SC_T0]
    fnum = scalars_ref[_SC_FNUM]
    px = scalars_ref[_SC_PX]
    py = scalars_ref[_SC_PY]
    fdemod = scalars_ref[_SC_FDEMOD]

    x, y, z, in_range = _tile_world_points(st, tile, vt_ref)

    z2 = z * z
    ty = y - py * np.float32(st.channel_count / 2.0)
    t_yz2 = ty * ty + z2

    chf = ch.astype(jnp.float32) + scalars_ref[_SC_CH0]
    rx_dx = x - chf * px
    a_arg = jnp.abs(fnum * rx_dx / z)
    rx_mask = (a_arg < 0.5) & in_range
    ca = jnp.cos(np.float32(np.pi) * jnp.where(rx_mask, a_arg, 0.0))
    apod = jnp.where(rx_mask, ca * ca, 0.0)
    rx_index = (jnp.sqrt(rx_dx * rx_dx + z2) / sos + t0) * fs

    fs_over_c = fs / sos
    dyn_refs = {"demodulation_frequency": fdemod, "sampling_frequency": fs}

    zero = jnp.zeros((TILE_SUB, TILE_LANE), jnp.float32)
    groups = max(st.readi_group_count, 1) if st.readi_group_count > 1 else 1
    n_events = tx_x_ref.shape[0] // groups

    def group_body(g, carry):
        def tx_body(e, carry):
            acc_re, acc_im, acc_in = carry
            i = g * n_events + e
            tx_dx = x - tx_x_ref[i]
            tx_index = jnp.sqrt(t_yz2 + tx_dx * tx_dx) * fs_over_c
            index = rx_index + tx_index
            return _accumulate_sample(st, rf_ref, e, index,
                                      apod * tx_w_ref[i], dyn_refs,
                                      acc_re, acc_im, acc_in)
        return jax.lax.fori_loop(0, n_events, tx_body, carry)

    acc_re, acc_im, acc_in = jax.lax.fori_loop(
        0, groups, group_body, (zero, zero, zero))
    _finish(st, ch, acc_re, acc_im, acc_in,
            out_re_ref, out_im_ref, out_in_ref)


def _rca_tx_distance_tile(x, y, z, tx_o, angle_deg, depth):
    """Plane/cylindrical transmit distance over a tile (das.glsl:158-200);
    tx_o/angle/depth are traced scalars."""
    tx_rows = tx_o == np.float32(1.0)          # RCAOrientation.Rows
    lat = jnp.where(tx_rows, y, x)
    angle = jnp.radians(angle_deg)
    plane = lat * jnp.sin(angle) + z * jnp.cos(angle)
    inf_depth = jnp.isinf(depth)
    safe_depth = jnp.where(inf_depth, 0.0, depth)
    f_lat = safe_depth * jnp.sin(angle)
    f_z = safe_depth * jnp.cos(angle)
    cyl = jnp.sqrt((lat - f_lat) ** 2 + (z - f_z) ** 2)
    dist = jnp.where(inf_depth, plane, cyl)
    return jnp.where(tx_o == np.float32(0.0), 0.0, dist)


def _hercules_kernel(st: DasStatic, scalars_ref, tx_ch_ref, tx_w_ref,
                     tx_acq_ref, vt_ref, xdc_ref, rf_ref,
                     out_re_ref, out_im_ref, out_in_ref):
    """HERCULES / UHERCULES / HERO-PA (das.glsl:231-284).

    SMEM: tx_ch (transmit element indices, sparse-resolved), tx_w (the
    first-transmit 1/sqrt(N) weight baked per element, das.glsl:271-273),
    tx_acq.  Scalars carry acquisition-0 orientation + focal vector; the
    rx-columns flag selects which axis rx vs tx elements vary along.
    """
    tile = pl.program_id(0)
    ch = pl.program_id(1)

    fs = scalars_ref[_SC_FS]
    sos = scalars_ref[_SC_SOS]
    t0 = scalars_ref[_SC_T0]
    fnum = scalars_ref[_SC_FNUM]
    px = scalars_ref[_SC_PX]
    py = scalars_ref[_SC_PY]
    fdemod = scalars_ref[_SC_FDEMOD]
    rx_cols = scalars_ref[_SC_RX_FLAG]         # 1.0 when receive on columns

    wx, wy, wz, in_range = _tile_world_points(st, tile, vt_ref)
    xw = xdc_ref[0, 0] * wx + xdc_ref[0, 1] * wy + xdc_ref[0, 2] * wz + xdc_ref[0, 3]
    yw = xdc_ref[1, 0] * wx + xdc_ref[1, 1] * wy + xdc_ref[1, 2] * wz + xdc_ref[1, 3]
    zw = xdc_ref[2, 0] * wx + xdc_ref[2, 1] * wy + xdc_ref[2, 2] * wz + xdc_ref[2, 3]

    tx_index0 = (_rca_tx_distance_tile(wx, wy, wz, scalars_ref[_SC_TX_O],
                                       scalars_ref[_SC_TX_ANGLE],
                                       scalars_ref[_SC_TX_DEPTH]) / sos + t0) * fs

    z2 = zw * zw
    fnum_over_z = jnp.abs(fnum / zw)
    apod_test = 0.25 / (fnum_over_z * fnum_over_z)
    chf = ch.astype(jnp.float32) + scalars_ref[_SC_CH0]
    rx_d2 = jnp.where(rx_cols > 0.5,
                      (xw - chf * px) ** 2, (yw - chf * py) ** 2)
    fs_over_c = fs / sos
    dyn_refs = {"demodulation_frequency": fdemod, "sampling_frequency": fs}
    zero = jnp.zeros((TILE_SUB, TILE_LANE), jnp.float32)

    def tx_body(i, carry):
        acc_re, acc_im, acc_in = carry
        tx_chf = tx_ch_ref[i]
        tx_d2 = jnp.where(rx_cols > 0.5,
                          (yw - tx_chf * py) ** 2, (xw - tx_chf * px) ** 2)
        d2 = rx_d2 + tx_d2
        mask = (d2 < apod_test) & in_range
        ca = jnp.cos(np.float32(np.pi)
                     * jnp.where(mask, fnum_over_z * jnp.sqrt(d2), 0.0))
        apod = jnp.where(mask, ca * ca, 0.0) * tx_w_ref[i]
        index = tx_index0 + jnp.sqrt(z2 + d2) * fs_over_c
        # rf acquisition index == loop index (sparse only remaps element
        # positions, not acquisitions) — keeps load addresses loop-derived.
        return _accumulate_sample(st, rf_ref, i, index, apod,
                                  dyn_refs, acc_re, acc_im, acc_in)

    acc_re, acc_im, acc_in = jax.lax.fori_loop(
        0, tx_ch_ref.shape[0], tx_body, (zero, zero, zero))
    _finish(st, ch, acc_re, acc_im, acc_in,
            out_re_ref, out_im_ref, out_in_ref)


def _rca_kernel(st: DasStatic, scalars_ref, orient_ref, angle_ref, depth_ref,
                vt_ref, xdc_ref, rf_ref,
                out_re_ref, out_im_ref, out_in_ref):
    """Flash / RCA_TPW / RCA_VLS (das.glsl:202-229).

    SMEM per-acquisition tables: orient (packed tx<<4|rx as float pairs:
    stored as two floats tx_o, rx_o interleaved is avoided — orient_ref
    stores tx_o*16+rx_o), angle (degrees), depth (meters, inf = plane wave).
    """
    tile = pl.program_id(0)
    ch = pl.program_id(1)

    fs = scalars_ref[_SC_FS]
    sos = scalars_ref[_SC_SOS]
    t0 = scalars_ref[_SC_T0]
    fnum = scalars_ref[_SC_FNUM]
    px = scalars_ref[_SC_PX]
    py = scalars_ref[_SC_PY]
    fdemod = scalars_ref[_SC_FDEMOD]

    wx, wy, wz, in_range = _tile_world_points(st, tile, vt_ref)
    xw = xdc_ref[0, 0] * wx + xdc_ref[0, 1] * wy + xdc_ref[0, 2] * wz + xdc_ref[0, 3]
    yw = xdc_ref[1, 0] * wx + xdc_ref[1, 1] * wy + xdc_ref[1, 2] * wz + xdc_ref[1, 3]
    zw = xdc_ref[2, 0] * wx + xdc_ref[2, 1] * wy + xdc_ref[2, 2] * wz + xdc_ref[2, 3]

    chf = ch.astype(jnp.float32) + scalars_ref[_SC_CH0]
    dyn_refs = {"demodulation_frequency": fdemod, "sampling_frequency": fs}
    zero = jnp.zeros((TILE_SUB, TILE_LANE), jnp.float32)

    def acq_body(a_i, carry):
        acc_re, acc_im, acc_in = carry
        packed = orient_ref[a_i]
        tx_o = jnp.floor(packed / 16.0)
        rx_o = packed - tx_o * 16.0
        rx_rows = rx_o == np.float32(1.0)
        # receive projection (das.glsl:209-218)
        lat = jnp.where(rx_rows, yw, xw)
        rx_lat = jnp.where(rx_rows, chf * py, chf * px)
        recv_lat = lat - rx_lat
        a_arg = jnp.abs(fnum * recv_lat / jnp.abs(zw))
        mask = (a_arg < 0.5) & in_range
        ca = jnp.cos(np.float32(np.pi) * jnp.where(mask, a_arg, 0.0))
        apod = jnp.where(mask, ca * ca, 0.0)
        tx_dist = _rca_tx_distance_tile(wx, wy, wz, tx_o, angle_ref[a_i],
                                        depth_ref[a_i])
        rlen = jnp.sqrt(recv_lat * recv_lat + zw * zw)
        index = ((tx_dist + rlen) / sos + t0) * fs
        return _accumulate_sample(st, rf_ref, a_i, index, apod, dyn_refs,
                                  acc_re, acc_im, acc_in)

    acc_re, acc_im, acc_in = jax.lax.fori_loop(
        0, st.acquisition_count, acq_body, (zero, zero, zero))
    _finish(st, ch, acc_re, acc_im, acc_in,
            out_re_ref, out_im_ref, out_in_ref)


_KERNELS = {"forces": _forces_kernel, "hercules": _hercules_kernel,
            "rca": _rca_kernel}


@functools.lru_cache(maxsize=64)
def _das_call(st: DasStatic, n_tx: int, interpret: bool):
    """Build the jitted pallas_call wrapper for a static configuration."""
    nx, ny, nz = st.output_points
    zt = _n_z_tiles(st)
    rt = _n_row_tiles(st)
    n_tiles = rt * zt
    s = st.sample_count
    n_acq = st.acquisition_count - (int(st.sparse)
                                    if st.family != "rca" else 0)

    rf_block = (1, 2, n_acq * s) if st.iq else (1, 1, n_acq * s)
    kernel = functools.partial(_KERNELS[st.family], st)

    # Output lives directly in padded image-raster layout (rows, z).
    out_shapes = [jax.ShapeDtypeStruct((rt * TILE_SUB, zt * TILE_LANE),
                                       jnp.float32)] * 3
    # Index maps ignore the channel grid dim -> the accumulator block stays
    # resident in VMEM across the channel loop.
    out_spec = pl.BlockSpec((TILE_SUB, TILE_LANE),
                            lambda i, c, *_: (i // zt, i % zt),
                            memory_space=pltpu.VMEM)

    def rf_index(i, c, *_):
        return (c, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,    # scalars + three geometry tables (SMEM)
        grid=(n_tiles, st.local_channels),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # voxel transform (4,4)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # xdc transform (4,4)
            pl.BlockSpec(rf_block, rf_index,
                         memory_space=pltpu.VMEM),   # this channel's RF
        ],
        out_specs=[out_spec] * 3,
    )

    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )

    sparse = int(st.sparse) if st.family != "rca" else 0

    def run(scalars, t0_arr, t1_arr, t2_arr, vt, xdc, rf):
        # Complex handling stays inside jit: some TPU runtimes cannot execute
        # eager complex ops or transfer complex arrays.
        c = rf.shape[0]
        rf_used = rf[:, sparse:, :].reshape(c, -1)
        if st.iq:
            rf_planes = jnp.stack(
                [jnp.real(rf_used), jnp.imag(rf_used)], axis=1)
        else:
            rf_planes = rf_used.astype(jnp.float32)[:, None, :]
        out_re, out_im, out_in = fn(scalars, t0_arr, t1_arr, t2_arr,
                                    vt, xdc, rf_planes)

        def trim(o):
            return o[:nx * ny, :nz].reshape(nx, ny, nz)
        res = (jax.lax.complex(trim(out_re), trim(out_im))
               if st.iq else trim(out_re))
        if st.coherency_weighting:
            return res, trim(out_in)
        return res

    return jax.jit(run)


def das_pallas(rf, dyn: dict, st: DasStatic, interpret: bool = False):
    """Pallas DAS dispatch for all acquisition families.  ``rf``: (C, A, S).

    Matches :func:`..ops.golden.das`/:func:`..ops.das.das`.
    """
    family = st.family
    a = st.acquisition_count
    sparse = int(st.sparse)

    scalars = jnp.zeros(_N_SCALARS, jnp.float32)
    vals = {
        _SC_FS: dyn["sampling_frequency"],
        _SC_SOS: dyn["speed_of_sound"],
        _SC_T0: dyn["time_offset"],
        _SC_FNUM: dyn["f_number"],
        _SC_PX: dyn["xdc_element_pitch"][0],
        _SC_PY: dyn["xdc_element_pitch"][1],
        _SC_FDEMOD: dyn["demodulation_frequency"],
        _SC_CH0: dyn.get("channel_offset", 0),
    }

    if family == "rca":
        orient = dyn["orientations"].astype(jnp.float32)
        t0_arr, t1_arr = orient, dyn["focal_vectors"][:, 0]
        t2_arr = dyn["focal_vectors"][:, 1]
        n_tx = a
    else:
        # acquisition-0 orientation/focal scalars (HERCULES uses them)
        vals[_SC_TX_O] = jnp.floor(dyn["orientations"][0] / 16).astype(jnp.float32)
        rx_o = (dyn["orientations"][0] & 0xF).astype(jnp.float32)
        vals[_SC_RX_FLAG] = (rx_o == 2).astype(jnp.float32)  # Columns
        vals[_SC_TX_ANGLE] = dyn["focal_vectors"][0, 0]
        vals[_SC_TX_DEPTH] = dyn["focal_vectors"][0, 1]

        readi = st.readi_group_count if st.readi_group_count > 1 else 0
        if readi:
            g = st.readi_group_count
            elements = jnp.arange(g * a, dtype=jnp.float32)
            tx_w = jnp.repeat(dyn["hadamard_row"][:g], a)
            tx_acq = jnp.tile(jnp.arange(a, dtype=jnp.int32), g)
            tx_ch = elements
            n_tx = g * a
        else:
            n = a - sparse
            if st.sparse:
                tx_ch = dyn["sparse_elements"][:n].astype(jnp.float32)
            else:
                tx_ch = jnp.arange(sparse, a, dtype=jnp.float32)
            tx_acq = jnp.arange(n, dtype=jnp.int32)
            tx_w = jnp.ones(n, jnp.float32)
            if family == "hercules" and not st.sparse:
                # first-transmit 1/sqrt(N) weight (das.glsl:271-273)
                tx_w = tx_w.at[0].set(np.float32(1.0 / np.sqrt(a)))
            n_tx = n

        if family == "forces":
            t0_arr = tx_ch * dyn["xdc_element_pitch"][0]
        else:
            t0_arr = tx_ch
        t1_arr, t2_arr = tx_w, tx_acq

    for k_, v_ in vals.items():
        scalars = scalars.at[k_].set(jnp.asarray(v_, jnp.float32))

    fn = _das_call(st, n_tx, interpret)
    return fn(scalars, t0_arr, t1_arr, t2_arr,
              dyn["voxel_transform"], dyn["xdc_transform"], rf)


# Backwards-compatible alias
def das_forces_pallas(rf, dyn, st, interpret: bool = False):
    return das_pallas(rf, dyn, st, interpret)
