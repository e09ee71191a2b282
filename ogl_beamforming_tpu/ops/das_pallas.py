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

def _tile_world_points(st: DasStatic, tile_idx, vt):
    """World xyz for this tile's voxels, each (TILE_SUB, TILE_LANE).

    Voxel linear index v = tile_idx*TILE + sub*TILE_LANE + lane unravels
    C-order over (nx, ny, nz) — identical to ops/das.py._world_points.
    """
    nx, ny, nz = st.output_points
    v = (tile_idx * TILE
         + jax.lax.broadcasted_iota(jnp.int32, (TILE_SUB, TILE_LANE), 0)
         * TILE_LANE
         + jax.lax.broadcasted_iota(jnp.int32, (TILE_SUB, TILE_LANE), 1))
    iz = v % nz
    ixy = v // nz
    iy = ixy % ny
    ix = ixy // ny
    denom_x = np.float32(max(nx - 1, 1))
    denom_y = np.float32(max(ny - 1, 1))
    denom_z = np.float32(max(nz - 1, 1))
    px = ix.astype(jnp.float32) / denom_x
    py = iy.astype(jnp.float32) / denom_y
    pz = iz.astype(jnp.float32) / denom_z
    x = vt[0, 0] * px + vt[0, 1] * py + vt[0, 2] * pz + vt[0, 3]
    y = vt[1, 0] * px + vt[1, 1] * py + vt[1, 2] * pz + vt[1, 3]
    z = vt[2, 0] * px + vt[2, 1] * py + vt[2, 2] * pz + vt[2, 3]
    in_range = v < nx * ny * nz
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
# FORCES kernel
# ---------------------------------------------------------------------------

def _forces_kernel(st: DasStatic, scalars_ref, txdx_ref, vt_ref,
                   rf_ref, out_re_ref, out_im_ref, out_in_ref):
    """One (voxel-tile, channel) grid step of FORCES/UFORCES DAS
    (das.glsl:286-319).

    scalars_ref, txdx_ref (SMEM, scalar-prefetched): [fs, c, t0, fnum, px,
    py, fd] and the (n_tx,) transmit element x positions (already resolved
    through sparse_elements on host — traced, not baked).
    vt_ref (VMEM): (4, 4) voxel transform (already xdc-premultiplied).
    """
    tile = pl.program_id(0)
    ch = pl.program_id(1)

    fs = scalars_ref[0]
    sos = scalars_ref[1]
    t0 = scalars_ref[2]
    fnum = scalars_ref[3]
    px = scalars_ref[4]
    py = scalars_ref[5]
    fdemod = scalars_ref[6]

    x, y, z, in_range = _tile_world_points(st, tile, vt_ref)

    z2 = z * z
    ty = y - py * np.float32(st.channel_count / 2.0)
    t_yz2 = ty * ty + z2

    chf = ch.astype(jnp.float32)
    rx_dx = x - chf * px
    a_arg = jnp.abs(fnum * rx_dx / z)
    rx_mask = (a_arg < 0.5) & in_range
    apod_arg = jnp.where(rx_mask, a_arg, 0.0)
    ca = jnp.cos(np.float32(np.pi) * apod_arg)
    apod = jnp.where(rx_mask, ca * ca, 0.0)
    rx_index = (jnp.sqrt(rx_dx * rx_dx + z2) / sos + t0) * fs

    fs_over_c = fs / sos
    n_tx = txdx_ref.shape[0]

    dyn_refs = {"demodulation_frequency": fdemod, "sampling_frequency": fs}

    acc_re = jnp.zeros((TILE_SUB, TILE_LANE), jnp.float32)
    acc_im = jnp.zeros((TILE_SUB, TILE_LANE), jnp.float32)
    acc_in = jnp.zeros((TILE_SUB, TILE_LANE), jnp.float32)

    def tx_body(a_i, carry):
        acc_re, acc_im, acc_in = carry
        tx_x = txdx_ref[a_i]
        tx_dx = x - tx_x
        tx_index = jnp.sqrt(t_yz2 + tx_dx * tx_dx) * fs_over_c
        index = rx_index + tx_index
        return _accumulate_sample(st, rf_ref, a_i, index, apod, dyn_refs,
                                  acc_re, acc_im, acc_in)

    acc_re, acc_im, acc_in = jax.lax.fori_loop(
        0, n_tx, tx_body, (acc_re, acc_im, acc_in))

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


@functools.lru_cache(maxsize=64)
def _forces_call(st: DasStatic, n_tx: int, interpret: bool):
    nx, ny, nz = st.output_points
    v = nx * ny * nz
    n_tiles = _cdiv(v, TILE)
    s = st.sample_count

    rf_block = (1, 2, n_tx * s) if st.iq else (1, 1, n_tx * s)

    kernel = functools.partial(_forces_kernel, st)

    out_shapes = [jax.ShapeDtypeStruct((n_tiles * TILE_SUB, TILE_LANE),
                                       jnp.float32)] * 3
    # NOTE: index maps ignore the channel grid dim -> Mosaic keeps the
    # accumulator block resident in VMEM across the channel loop.
    out_spec = pl.BlockSpec((TILE_SUB, TILE_LANE),
                            lambda i, c, *_: (i, 0),
                            memory_space=pltpu.VMEM)

    def rf_index(i, c, *_):
        return (c,) + (0,) * (len(rf_block) - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,            # scalars + tx positions in SMEM
        grid=(n_tiles, st.channel_count),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # voxel transform (4,4)
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

    def run(scalars, tx_x, vt, rf):
        out_re, out_im, out_in = fn(scalars, tx_x, vt, rf)
        def trim(o):
            return o.reshape(-1)[:v].reshape(nx, ny, nz)
        res = (trim(out_re) + 1j * trim(out_im)).astype(jnp.complex64) \
            if st.iq else trim(out_re)
        if st.coherency_weighting:
            return res, trim(out_in)
        return res

    return jax.jit(run)


def das_forces_pallas(rf, dyn: dict, st: DasStatic, interpret: bool = False):
    """FORCES/UFORCES DAS via the Pallas kernel.  ``rf``: (C, A, S)."""
    sparse = int(st.sparse)
    n_tx = st.acquisition_count - sparse
    px = dyn["xdc_element_pitch"][0]
    if st.sparse:
        tx_ch = dyn["sparse_elements"][:n_tx].astype(jnp.float32)
    else:
        tx_ch = jnp.arange(sparse, st.acquisition_count, dtype=jnp.float32)
    tx_x = tx_ch * px

    scalars = jnp.stack([
        dyn["sampling_frequency"], dyn["speed_of_sound"], dyn["time_offset"],
        dyn["f_number"], dyn["xdc_element_pitch"][0],
        dyn["xdc_element_pitch"][1], dyn["demodulation_frequency"],
    ]).astype(jnp.float32)

    c = rf.shape[0]
    rf_used = rf[:, sparse:, :].reshape(c, -1)        # (C, A'*S) flat lines
    if st.iq:
        rf_planes = jnp.stack([jnp.real(rf_used), jnp.imag(rf_used)],
                              axis=1)  # (C, 2, A'*S)
    else:
        rf_planes = rf_used.astype(jnp.float32)[:, None, :]  # (C, 1, A'*S)

    fn = _forces_call(st, n_tx, interpret)
    return fn(scalars, tx_x, dyn["voxel_transform"], rf_planes)
