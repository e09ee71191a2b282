"""Pallas TPU delay-and-sum kernels.

The performance-critical replacement for the XLA-gather DAS in ops/das.py
(XLA lowers per-voxel gathers to serialized loops on TPU; measured ~100x off
roofline).  Design, driven by what Mosaic executes fast:

  * Voxels are tiled (16 rows x 128 lane positions) with the *lateral*
    axis on lanes (2D: x, 3D: y): a lateral lane axis pays only aperture
    curvature inside the f-number cone (~2-4 RF chunks per tile) where an
    axial one pays the full delay slope (~8-10 chunks) — each tile's delay
    spread bounds which of the RF line's 128-sample chunks contribute.
  * Grid = (voxel_tiles, channels-or-units, transmits): channel AND
    transmit are grid dims, so every RF access in the kernel body has a
    *static* address — dynamic-offset VMEM loads inside fori_loops were the
    single biggest Mosaic cost we measured (~1.7us per iteration vs ~2ns
    for static-address vector ops).  The output block's index map ignores
    (c, a), keeping the accumulator tile resident in VMEM across the whole
    channel x transmit accumulation (the reference's channel-chunk loop,
    beamformer_core.c:1577-1587, without HBM round trips).
  * Per-tile *activity flags* and (RCA) per-(tile, channel-unit) RF-chunk
    bounds are precomputed vectorized on device and scalar-prefetched
    (_tile_activity): tiles whose delay span misses the samples skip all
    work, and every chunk predicate is a pure scalar read — no
    vector->scalar reduction stall on the scalar core.
  * The chunk loop is a *python* loop with a ``pl.when`` skip per chunk
    against those bounds; one predicate region is shared by every
    (channel, transmit) pair of the grid step (each pair has its own
    scratch accumulator plane), so branch overhead is amortized
    ch_block x tx_block wide and exact per-chunk skipping is free.
  * One lane-gather (``take_along_axis`` within a 128-wide row — the one
    dynamic gather Mosaic lowers natively) per interpolation tap.  The
    v5e lane-gather hardware floor is **4.02 cyc per (8,128) vreg
    isolated / 3.53 paired** (two gathers sharing one index — the
    hermite structure; slope methodology, experiments/gather_micro3.py);
    index/compare/unpack/FMA work hides completely under gather issue.
    Gathers are ~73% of the 5.6 ms headline and the chunk loop sustains
    2.5-2.65 cyc/vreg in situ — AT the hardware floor (PERFORMANCE.md).
  * IQ data is carried as separate re/im f32 planes; the phase rotation
    exp(+j 2 pi f_d idx / fs) (das.glsl:51-59) is applied once per
    (tile, channel, transmit) after tap accumulation.
  * ``tile_grp``: TG consecutive row-tiles can share one grid step's
    (channel x transmit) RF block sweep (:func:`_tile_grp`) — the
    per-step RF re-fetch is the dominant *fixed* cost of the 3D volume
    families (round-4 floor decomposition), and TG divides it while
    keeping per-tile activity/bound/predicate granularity.

Family-specific geometry (FORCES das.glsl:286-366, HERCULES :231-284,
RCA :202-229) lives in small delay functions; the gather/accumulate
machinery is shared.  Numerics are validated against ops/golden.py
(tests/test_das_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params.enums import InterpolationMode
from .das import DasStatic, make_dynamic, make_static  # noqa: F401

TILE_SUB = 16    # image rows per voxel tile (A/B'd 8 vs 16: 16 is ~30% faster)
TILE_LANE = 128  # axial voxels per tile (= lane count)
CHUNK = 128


def _tile_rows(st) -> int:
    """Image rows per voxel tile (16 best for every family once predicates
    are shared and bounds prefetched; PERFORMANCE.md round-2 sweeps)."""
    return _knob(st, "tile_sub", TILE_SUB)

# Bench-only kernel-structure knobs (experiments/ablate_das.py).  Read at
# trace time; callers must clear _das_call's lru_cache after changing them.
ABLATE: dict = {}

# Per-configuration tuned knobs installed by :func:`autotune_das`, consulted
# between ABLATE (explicit override) and the measured family defaults.
TUNED: dict = {}

_SHIPPED_TUNED_LOADED = False


def _load_shipped_tuned():
    """Load the committed per-preset tuned table (data/tuned_v5e.json,
    produced by tools/pretune.py on a v5e chip) once, lazily, without
    overriding entries the user already installed.  First-run performance
    then equals post-autotune performance (VERDICT r2 #9)."""
    global _SHIPPED_TUNED_LOADED
    if _SHIPPED_TUNED_LOADED:
        return
    _SHIPPED_TUNED_LOADED = True
    import json
    import os
    path = os.path.join(os.path.dirname(__file__), "..", "data",
                        "tuned_v5e.json")
    try:
        with open(path) as f:
            rows = json.load(f)
    except OSError:
        return
    for row in rows:
        k = row["key"]
        key = (k[0], k[1], k[2], k[3], k[4], k[5], tuple(k[6]))
        TUNED.setdefault(key, row["knobs"])


def _tune_key(st):
    key = (st.family, int(st.interpolation_mode), st.iq,
           st.acquisition_count, st.local_channels, st.sample_count,
           tuple(st.output_points))
    # Batched configs tune separately (VMEM/register pressure differs);
    # appended only when batched so shipped single-frame tables keep
    # matching their original keys.
    if st.frame_batch > 1:
        key = key + (("fb", st.frame_batch),)
    return key


def _knob(st, name, default):
    if name in ABLATE:
        return ABLATE[name]
    _load_shipped_tuned()
    t = TUNED.get(_tune_key(st))
    if t is not None and name in t:
        return t[name]
    return default

_N_SCALARS = 13
_SC_FS, _SC_SOS, _SC_T0, _SC_FNUM, _SC_PX, _SC_PY, _SC_FDEMOD, \
    _SC_RX_FLAG, _SC_TX_O, _SC_TX_ANGLE, _SC_TX_DEPTH, _SC_CH0, _SC_X0 = \
    range(_N_SCALARS)


def _cdiv(a, b):
    return -(-a // b)


def _lat_lanes(st: DasStatic) -> bool:
    """2D layouts put lateral x on vector lanes by default (same lesson as
    3D volumes): an axial lane axis pays the delay *slope* over 128 voxels
    (~8 samples/voxel -> 9-10 RF chunks scanned per tile on the BASELINE
    plane-wave grid); a lateral lane axis pays only aperture curvature
    inside the f-number cone (measured executed-chunk total 0.53x,
    experiments/layout_stats.py)."""
    return bool(_knob(st, "lat_lanes", st.output_points[2] == 1))


def _axes(st: DasStatic):
    """(row_count, lane_count) of the kernel voxel layout.

    2D (nz == 1): lanes = **x (lateral)**, rows = y (axial) by default
    (:func:`_lat_lanes`; the ``lat_lanes=0`` knob restores axial lanes).
    3D: lanes = **y (lateral)**, rows = (x, z) pairs.  An axial lane axis
    pays the delay *slope* (~10+ samples/voxel -> ~10 RF chunks scanned per
    tile); a lateral lane axis only pays aperture curvature (<= 1-2 chunks
    at typical f-numbers), measured ~2x on HERCULES volumes."""
    nx, ny, nz = st.output_points
    if nz > 1:
        return nx * nz, ny
    if _lat_lanes(st):
        return ny, nx
    return nx, ny


def _n_z_tiles(st: DasStatic) -> int:
    return _cdiv(_axes(st)[1], TILE_LANE)


def _n_row_tiles(st: DasStatic) -> int:
    return _cdiv(_axes(st)[0], _tile_rows(st))


def _tile_world_points(st: DasStatic, tile_idx, vt, x_off=None):
    """World xyz for this tile's voxels, each (TILE_SUB, TILE_LANE)
    (das.glsl:368-376 voxel -> world).  ``x_off`` shifts the x index when
    this kernel computes a slab of a larger grid (voxel sharding)."""
    nx, ny, nz = st.output_points
    gnx, gny, gnz = st.global_points or (nx, ny, nz)
    n_rows, n_lanes = _axes(st)
    zt = _n_z_tiles(st)
    row_tile = tile_idx // zt
    z_tile = tile_idx % zt
    ts = _tile_rows(st)
    row = (row_tile * ts
           + jax.lax.broadcasted_iota(jnp.int32, (ts, TILE_LANE), 0))
    lane = (z_tile * TILE_LANE
            + jax.lax.broadcasted_iota(jnp.int32, (ts, TILE_LANE), 1))
    if nz > 1:
        iy = lane
        iz = row % nz
        ix = row // nz
    elif _lat_lanes(st):
        iz = jnp.zeros_like(lane)
        iy = row
        ix = lane
    else:
        iz = jnp.zeros_like(lane)
        iy = lane
        ix = row
    pxv = ix.astype(jnp.float32)
    if x_off is not None:
        pxv = pxv + x_off
    px = pxv / np.float32(max(gnx - 1, 1))
    py = iy.astype(jnp.float32) / np.float32(max(gny - 1, 1))
    pz = iz.astype(jnp.float32) / np.float32(max(gnz - 1, 1))
    x = vt[0, 0] * px + vt[0, 1] * py + vt[0, 2] * pz + vt[0, 3]
    y = vt[1, 0] * px + vt[1, 1] * py + vt[1, 2] * pz + vt[1, 3]
    z = vt[2, 0] * px + vt[2, 1] * py + vt[2, 2] * pz + vt[2, 3]
    if n_rows % ts == 0 and n_lanes % TILE_LANE == 0:
        in_range = None          # grid divides the tiles: statically full
    else:
        in_range = (row < n_rows) & (lane < n_lanes)
    return x, y, z, in_range


def _apply_m4_tile(m, x, y, z):
    return (m[0, 0] * x + m[0, 1] * y + m[0, 2] * z + m[0, 3],
            m[1, 0] * x + m[1, 1] * y + m[1, 2] * z + m[1, 3],
            m[2, 0] * x + m[2, 1] * y + m[2, 2] * z + m[2, 3])


def _apodize(mask, arg):
    """cos^2 apodization with compute-and-mask (das.glsl:136-150)."""
    a = jnp.where(mask, arg, 0.0)
    ca = jnp.cos(np.float32(np.pi) * a)
    return jnp.where(mask, ca * ca, 0.0)


def _cos_pi_sqrt_u(u):
    """cos(pi * sqrt(u)) as an even Taylor polynomial in u = a^2 — exact to
    ~2.4e-6 over u in [0, 0.25) (the masked apodization domain), measured
    ~1 ms cheaper than the transcendental on the headline config."""
    return (np.float32(1.0) + u * (np.float32(-4.9348022)
            + u * (np.float32(4.0587121) + u * (np.float32(-1.3352627)
            + u * (np.float32(0.23533063)
            + u * np.float32(-0.025806891))))))


def _sincos_2pi(x):
    """(sin, cos) of 2*pi*x with one shared range reduction; ``x`` in
    cycles.  Taylor on the reduced interval y in [-pi, pi] (max error
    ~5e-7) costs ~20 VPU ops for BOTH values, vs ~1 ms of independent
    transcendentals per frame on the headline config (ablation r3)."""
    y = np.float32(2 * np.pi) * (x - jnp.round(x))
    y2 = y * y
    c = (np.float32(1.0) + y2 * (np.float32(-0.5)
         + y2 * (np.float32(1 / 24) + y2 * (np.float32(-1 / 720)
         + y2 * (np.float32(1 / 40320) + y2 * (np.float32(-1 / 3628800)
         + y2 * (np.float32(1 / 479001600)
         + y2 * np.float32(-1 / 87178291200))))))))
    s = y * (np.float32(1.0) + y2 * (np.float32(-1 / 6)
         + y2 * (np.float32(1 / 120) + y2 * (np.float32(-1 / 5040)
         + y2 * (np.float32(1 / 362880) + y2 * (np.float32(-1 / 39916800)
         + y2 * np.float32(1 / 6227020800)))))))
    return s, c


def _apodize_u(mask, u):
    """cos^2 apodization straight from u = arg^2.

    The u-form removes the per-pair abs/divide/sqrt feeding the cosine:
    every family's apodization argument is fnum * distance / z, so
    u = fnum^2 * distance^2 * (1/z^2) with (fnum/z)^2 cached per tile —
    the masked test a < 0.5 becomes u < 0.25.  For HERCULES this also
    eliminates the per-pair sqrt(d2) (the radial 2D window,
    das.glsl:262-268), the formulation change that breaks its
    elementwise-compute floor.  ``exact_apod`` restores the transcendental
    for A/B."""
    u = jnp.where(mask, u, 0.0)
    if ABLATE.get("exact_apod"):
        ca = jnp.cos(np.float32(np.pi) * jnp.sqrt(u))
    else:
        ca = _cos_pi_sqrt_u(u)
    return jnp.where(mask, ca * ca, 0.0)


def _interp_weights(st: DasStatic, t):
    """Tap (offset, weight) pairs relative to floor(index)
    (das.glsl:64-122; Catmull-Rom C=0.5 for cubic)."""
    mode = st.interpolation_mode
    if mode == InterpolationMode.Nearest:
        return [(0, jnp.float32(1.0))]
    if mode == InterpolationMode.Linear:
        if _pack_pairs(st) or _pair_iq(st):
            # (position, hi-weight, lo-weight): word k = (p_k, p_{k+1})
            return [(0, 1.0 - t, t)]
        return [(0, 1.0 - t), (1, t)]
    t2 = t * t
    t3 = t2 * t
    h00 = 2 * t3 - 3 * t2 + 1
    h01 = -2 * t3 + 3 * t2
    h10 = t3 - 2 * t2 + t
    h11 = t3 - t2
    if _pair_iq(st):
        # single position: (value-hi, value-lo, slope-hi, slope-lo)
        # weights for the pair-packed value and slope planes at word k.
        return [(0, h00, h01, h10, h11)]
    if _hermite(st):
        # (position, value-weight, slope-weight): the slope plane holds
        # m_k = (p_{k+1} - p_{k-1})/2, so this equals the 4-tap
        # Catmull-Rom expansion below exactly.
        return [(0, h00, h10), (1, h01, h11)]
    if _pack_pairs(st):
        # word k-1 = (p_{k-1}, p_k), word k+1 = (p_{k+1}, p_{k+2})
        return [(-1, -0.5 * h10, h00 - 0.5 * h11),
                (1, h01 + 0.5 * h10, 0.5 * h11)]
    return [(-1, -0.5 * h10), (0, h00 - 0.5 * h11),
            (1, h01 + 0.5 * h10), (2, 0.5 * h11)]


# ---------------------------------------------------------------------------
# Family delay functions: (index, apod, mask) for one (tile, channel, acq)
# ---------------------------------------------------------------------------

def _rca_tx_distance_tile(x, y, z, tx_o, angle_deg, depth):
    """Plane/cylindrical transmit distance (das.glsl:158-200)."""
    tx_rows = tx_o == np.float32(1.0)
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


def _forces_rx_terms(st, sc, ch, world, f2z=None):
    """Per-(tile, channel) receive terms of FORCES (das.glsl:296-306):
    cached in scratch across the transmit loop.  ``f2z``: optional cached
    (fnum/z)^2 tile plane (u-form apodization, no per-pair divide)."""
    x, y, z, in_range = world
    fs, sos, t0, fnum = sc[_SC_FS], sc[_SC_SOS], sc[_SC_T0], sc[_SC_FNUM]
    px = sc[_SC_PX]
    z2 = z * z
    if f2z is None:
        f2z = fnum * fnum / z2
    chf = ch.astype(jnp.float32) + sc[_SC_CH0]
    rx_dx = x - chf * px
    u = rx_dx * rx_dx * f2z
    mask = (u < 0.25) if in_range is None else ((u < 0.25) & in_range)
    apod_base = _apodize_u(mask, u)
    rx_index = (jnp.sqrt(rx_dx * rx_dx + z2) / sos + t0) * fs
    return rx_index, apod_base, mask


def _forces_tx_index(st, sc, t0_ref, acq, world):
    """Per-(tile, acquisition) transmit term of FORCES — channel-free, so
    the kernel caches it in scratch at ch == 0 (like the RCA tx planes)."""
    x, y, z, _ = world
    fs, sos, py = sc[_SC_FS], sc[_SC_SOS], sc[_SC_PY]
    ty = y - py * np.float32(st.channel_count / 2.0)
    tx_dx = x - t0_ref[acq]                          # element x position
    return jnp.sqrt(ty * ty + z * z + tx_dx * tx_dx) * (fs / sos)


def _forces_delay(st, sc, t0_ref, t1_ref, xdc_ref, ch, acq, world,
                  rx_cache=None, tx_cache=None):
    """FORCES/UFORCES/READI (das.glsl:286-366): separable rx/tx distances;
    voxel transform already XDC-premultiplied (beamformer_core.c:760)."""
    if rx_cache is None:
        rx_index, apod_base, mask = _forces_rx_terms(st, sc, ch, world)
    else:
        rx_index, apod_base, mask = rx_cache
    apod = apod_base * t1_ref[acq]                   # READI weight or 1
    if tx_cache is None:
        tx_index = _forces_tx_index(st, sc, t0_ref, acq, world)
    else:
        tx_index = tx_cache
    return rx_index + tx_index, apod, mask


def _hercules_tile_terms(st, sc, xdc_ref, world):
    """Per-tile terms of HERCULES (das.glsl:238-245): XDC-space coordinates,
    acquisition-0 transmit index, (fnum/z)^2 — cached in scratch."""
    wx, wy, wz, _ = world
    fs, sos, t0, fnum = sc[_SC_FS], sc[_SC_SOS], sc[_SC_T0], sc[_SC_FNUM]
    xw, yw, zw = _apply_m4_tile(xdc_ref, wx, wy, wz)
    tx_index0 = (_rca_tx_distance_tile(
        wx, wy, wz, sc[_SC_TX_O], sc[_SC_TX_ANGLE], sc[_SC_TX_DEPTH])
        / sos + t0) * fs
    foz2 = (fnum * fnum) / (zw * zw)
    return xw, yw, zw, tx_index0, foz2


def _hercules_rx_d2(st, sc, ch, xw, yw):
    """Per-(tile, channel) receive distance^2 (das.glsl:252-258)."""
    rx_cols = sc[_SC_RX_FLAG]
    chf = ch.astype(jnp.float32) + sc[_SC_CH0]
    return jnp.where(rx_cols > 0.5, (xw - chf * sc[_SC_PX]) ** 2,
                     (yw - chf * sc[_SC_PY]) ** 2)


def _hercules_tx_d2(sc, t0_ref, acq, xw, yw):
    """Per-(tile, acquisition) transmit distance^2 — channel-free, cached
    in scratch at ch == 0 like the other families' transmit planes."""
    tx_chf = t0_ref[acq]
    return jnp.where(sc[_SC_RX_FLAG] > 0.5,
                     (yw - tx_chf * sc[_SC_PY]) ** 2,
                     (xw - tx_chf * sc[_SC_PX]) ** 2)


def _hercules_delay(st, sc, t0_ref, t1_ref, xdc_ref, ch, acq, world,
                    rx_cache=None, tx_cache=None):
    """HERCULES family (das.glsl:231-284): 2D apodization over the rx/tx
    element grid, shared acquisition-0 transmit."""
    _, _, _, in_range = world
    fs, sos = sc[_SC_FS], sc[_SC_SOS]
    if rx_cache is None:
        xw, yw, zw, tx_index0, foz2 = _hercules_tile_terms(
            st, sc, xdc_ref, world)
        rx_d2 = _hercules_rx_d2(st, sc, ch, xw, yw)
    else:
        xw, yw, zw, tx_index0, foz2, rx_d2 = rx_cache
    z2 = zw * zw
    if tx_cache is None:
        tx_d2 = _hercules_tx_d2(sc, t0_ref, acq, xw, yw)
    else:
        tx_d2 = tx_cache
    d2 = rx_d2 + tx_d2
    # u-form: mask d2 < 0.25/foz2 <=> u < 0.25; apodize without the
    # per-pair sqrt(d2), divide, or cosine (das.glsl:262-268)
    u = foz2 * d2
    mask = (u < 0.25) if in_range is None else ((u < 0.25) & in_range)
    apod = _apodize_u(mask, u) * t1_ref[acq]
    index = tx_index0 + jnp.sqrt(z2 + d2) * (fs / sos)
    return index, apod, mask


def _rca_acq_tx_dist(sc, t0_ref, t1_ref, acq, world):
    """Per-(tile, acquisition) transmit *index* part for the RCA family —
    (tx_dist / sos + t0) * fs, channel-independent, so the kernel caches it
    in scratch at ch == 0 and each pair pays one fma for the full index."""
    wx, wy, wz, _ = world
    packed = t0_ref[2 * acq]
    tx_o = jnp.floor(packed / 16.0)
    dist = _rca_tx_distance_tile(wx, wy, wz, tx_o, t0_ref[2 * acq + 1],
                                 t1_ref[acq])
    return (dist / sc[_SC_SOS] + sc[_SC_T0]) * sc[_SC_FS]


def _rca_delay(st, sc, t0_ref, t1_ref, xdc_ref, ch, acq, world,
               rx_cache=None, tx_cache=None):
    """Flash/TPW/VLS (das.glsl:202-229): per-acquisition orientation +
    focal vector.  t0_ref interleaves [tx*16+rx, angle_degrees] per
    acquisition; t1_ref holds focal depths (inf = plane wave).
    ``rx_cache``: XDC-space voxel coords (pure tile terms, scratch-cached);
    ``tx_cache``: the per-acquisition transmit-distance plane."""
    wx, wy, wz, in_range = world
    fs, sos, t0, fnum = sc[_SC_FS], sc[_SC_SOS], sc[_SC_T0], sc[_SC_FNUM]
    px, py = sc[_SC_PX], sc[_SC_PY]
    if rx_cache is None:
        xw, yw, zw = _apply_m4_tile(xdc_ref, wx, wy, wz)
        f2z = (fnum * fnum) / (zw * zw)
    else:
        xw, yw, zw, f2z = rx_cache
    packed = t0_ref[2 * acq]
    tx_o = jnp.floor(packed / 16.0)
    rx_o = packed - tx_o * 16.0
    rx_rows = rx_o == np.float32(1.0)
    lat = jnp.where(rx_rows, yw, xw)
    chf = ch.astype(jnp.float32) + sc[_SC_CH0]
    rx_lat = jnp.where(rx_rows, chf * py, chf * px)
    recv_lat = lat - rx_lat
    r2 = recv_lat * recv_lat
    # u-form apodization: no per-pair abs/divide/cosine (das.glsl:136-150)
    u = r2 * f2z
    mask = (u < 0.25) if in_range is None else ((u < 0.25) & in_range)
    apod = _apodize_u(mask, u)
    if tx_cache is None:
        tx_part = (_rca_tx_distance_tile(
            wx, wy, wz, tx_o, t0_ref[2 * acq + 1], t1_ref[acq])
            / sos + t0) * fs
    else:
        tx_part = tx_cache
    rlen = jnp.sqrt(r2 + zw * zw)
    index = tx_part + rlen * (fs / sos)
    return index, apod, mask


_DELAY = {"forces": _forces_delay, "hercules": _hercules_delay,
          "rca": _rca_delay}


# ---------------------------------------------------------------------------
# Shared kernel
# ---------------------------------------------------------------------------

def _fb_mxu(st: DasStatic) -> bool:
    """Frame-batched DAS on the MXU via one-hot-matmul interpolation
    (``fb_mxu=1``, opt-in): the only formulation that sidesteps the v5e
    lane-gather hardware floor (4.02 cyc/vreg isolated, 3.53 paired —
    PERFORMANCE.md round 4, experiments/gather_micro3.py).  Instead of
    gathering taps, each (pair, chunk, voxel row) builds a banded
    (CHUNK, LANE) weight matrix from iota compares — zero gathers — and
    contracts the *frame batch* against it on the MXU:
    ``out[B, lane] += RF[B, chunk] @ W[chunk, lane]`` (the cooperative-
    matrix move of the reference's decode.glsl:76-117 applied to
    das.glsl:64-122's sampling; W is keyed by per-(voxel, channel,
    transmit) sample indices, so only frames can share it).  The W build
    cost is frame-independent, so the formulation pays at cine-loop batch
    sizes (microbench crossover ~B=32; 8.9x/unit at B=128,
    experiments/onehot_micro2.py) — live per-frame imaging stays on the
    proven gather kernel.  Requires B % 16 == 0 (bf16 sublane tiling of
    the plane-major RF block) and no coherency weighting (the incoherent
    |pair-sum| term needs per-pair accumulators this path deliberately
    avoids — rotation is applied per chunk and summed straight into the
    output block, linearity makes that exact)."""
    return (bool(_knob(st, "fb_mxu", 0)) and st.frame_batch > 1
            and st.frame_batch % 16 == 0
            and not st.coherency_weighting)


def _pack_iq(st: DasStatic) -> bool:
    """IQ RF as one int16-pair word per sample (re<<16 | im&0xFFFF, scaled
    to each (channel, acquisition) line's peak, carried as int32 — f32
    bitcasts get NaN-canonicalized/denormal-flushed by XLA value ops):
    ONE lane-gather per interpolation tap instead of two.  Gathers are 55%
    of the headline kernel (floor_split r3) and issue at ~3.2 cyc/vreg —
    the unpack (2 shifts + 2 converts) rides the superscalar VPU slots that
    are otherwise idle during gathers.  Quantization error is ~3e-5 NRMSE
    (int16 against the line peak), well inside the 1e-3 golden contract;
    ``pack_iq=0`` restores exact f32 planes."""
    return bool(_knob(st, "pack_iq", 1)) and st.iq and not _fb_mxu(st)


def _hermite(st: DasStatic) -> bool:
    """Hermite-form cubic over packed-IQ words: a second packed plane
    carries the central-difference slope m_k = (p_{k+1} - p_{k-1})/2, so
    Catmull-Rom interpolation (mathematically identical, das.glsl:64-122)
    needs 2 gather *positions* (k, k+1; value+slope words share one
    index/mask computation) instead of 4 taps.  Gather count stays 4 —
    already tap-minimal for int16 cubic IQ — but the per-position index/
    compare/clip ops halve; the chunk loop is instruction-issue-bound
    (row-halves cut predicted vreg work 15% for a measured 0%), so
    instruction count is the lever.  Costs a second RF plane (2x VMEM
    block + hidden DMA; same footprint as unpacked IQ).  Default on:
    5.98 vs 6.21 ms best-non-hermite on the headline (two-pass pretune);
    ``hermite=0`` restores the 4-tap form."""
    return (bool(_knob(st, "hermite", 1)) and _pack_iq(st) and
            not _pair_iq(st)
            and st.interpolation_mode == InterpolationMode.Cubic)


def _pack_pairs(st: DasStatic) -> bool:
    """Real (non-IQ) RF as int16 sample pairs: word k = (p_k << 16) |
    (p_{k+1} & 0xFFFF) against the line peak, carried as int32.
    Every gather position then yields two consecutive taps — linear
    interpolation needs ONE lane-gather per voxel (was 2), cubic two
    (was 4) — with one index/compare/clip per position.  2x the int16
    bytes = same VMEM block size as the unpacked f32 plane.  Same
    quantization budget as packed IQ (~3e-5 NRMSE vs the line peak);
    ``pack_pairs=0`` restores exact f32.  Default on since round 3's
    post-toolchain retune: it won every real-RF family in a healthy
    window (forces chain 10.4->7.3, forces big 20.2->15.0, HERCULES 3D
    1642->392, uFORCES 3D 932->649 ms before tx_block pairing)."""
    return (bool(_knob(st, "pack_pairs", 1)) and not st.iq
            and not _fb_mxu(st)
            and st.interpolation_mode in (InterpolationMode.Linear,
                                          InterpolationMode.Cubic))


def _pair_iq(st: DasStatic) -> bool:
    """Packed-IQ planes as consecutive-sample *pairs*: plane words at k are
    (re_k, re_{k+1}) / (im_k, im_{k+1}) int16 pairs — and, for cubic, two
    more planes carry the Hermite slope pairs (mre_k, mre_{k+1}) /
    (mim_k, mim_{k+1}).  Every quantity the Hermite form gathers from
    positions k and k+1 is then reachable from position k alone, so ONE
    index/compare/clip/select computation serves all gathers of a
    (pair, chunk) — linear: 2 gathers + 1 index set (was 2 + 2), cubic:
    4 gathers + 1 index set (was 4 + 2).  Same int16-vs-line-peak
    quantities as ``pack_iq``/``hermite`` (slopes obey |m| <= peak), so
    numerics are unchanged (1.1e-7 vs hermite on hardware).  Hardware A/B
    (experiments/pair_iq_ab.py): dead-even with the hermite default on the
    headline (5.79 vs 5.79 ms) — the chunk loop is *gather*-issue-bound,
    not op-issue-bound, so the saved index/select ops buy nothing and the
    2x RF planes cost extra pack prep.  Stays opt-in (``pair_iq=1``);
    autotune candidates cover it in case other configs differ."""
    return (bool(_knob(st, "pair_iq", 0)) and _pack_iq(st)
            and st.frame_batch == 1
            and st.interpolation_mode in (InterpolationMode.Linear,
                                          InterpolationMode.Cubic))


def _mxu_planes(st: DasStatic) -> int:
    """RF planes per frame for the fb_mxu layout: bf16 (hi, lo) pairs per
    component — an exact split of the f32 samples (hi = bf16 round, lo =
    the bf16-representable remainder; combined relative error ~2^-17,
    tighter than the gather path's int16 line-peak quantization)."""
    return 4 if st.iq else 2


def _block_geometry(st: DasStatic, n_grid: int):
    """Resolved (tx_block, ch_block) for this configuration — the single
    source of truth shared by :func:`_das_call` and
    :func:`das_activity_tables` (the bound tables must be keyed to the
    same granularity the kernel reads them at).

    fb_mxu blocks are VMEM-budgeted: the RF block carries ``B *
    _mxu_planes`` bf16 rows per (channel, transmit), so the channel block
    is chosen as the largest power-of-two-free count that keeps the block
    under ``mxu_rf_mb`` MB (default 4 — double-buffered against the
    ~16 MB/core budget alongside the (ts, B, LANE) output blocks)."""
    tx_block = min(_knob(st, "tx_block", _TXB.get(st.family, 4)), n_grid)
    if _fb_mxu(st):
        s_pad = _cdiv(st.sample_count, CHUNK) * CHUNK
        budget = int(_knob(st, "mxu_rf_mb", 4)) << 20
        # One channel's RF rows alone can blow the budget at cine batch
        # sizes (B=128 IQ, S=4096: 16 MB at tx_block=4) — shrink the
        # transmit block too, not just the channel block, so the block
        # always fits VMEM (advisor r4, medium).
        per_tx = st.frame_batch * _mxu_planes(st) * s_pad * 2
        tx_block = max(1, min(tx_block, budget // max(per_tx, 1)))
        per_ch = tx_block * per_tx
        cb_default = max(1, min(8, budget // max(per_ch, 1)))
    else:
        cb_default = (32 if st.family == "rca" and _pack_iq(st)
                      else 16 if st.family == "rca" else 8)
    ch_block = min(_knob(st, "ch_block", cb_default), st.local_channels)
    return tx_block, ch_block


def _das_kernel(st: DasStatic, tx_block: int, ch_block: int, n_cb: int,
                n_blocks: int, tg: int,
                scalars_ref, t0_ref, t1_ref, act_ref, qlo_ref, qhi_ref,
                qblo_ref, qbhi_ref, lsc_ref,
                vt_ref, xdc_ref, rf_ref, out_re_ref,
                out_im_ref, out_in_ref, acc_re_ref, acc_im_ref, world_ref,
                herc_ref, txc_ref):
    """One (voxel-tile-group, channel, transmit-block) grid step:
    ``tx_block`` transmits are processed per step to amortize world-point/
    output traffic and grid overhead, and ``tg`` consecutive row-tiles
    share the step's RF block fetch (:func:`_tile_grp`; tg == 1 is the
    proven single-tile step with unchanged scratch shapes).

    ``act_ref`` (scalar prefetch) holds a per-tile activity flag computed by
    :func:`_tile_activity`; tiles whose delay range misses the RF samples (or
    whose voxels sit entirely outside the f-number cone) skip all delay math
    and accumulation — on the BASELINE plane-wave config over half the
    image depth lies beyond the last sample and this alone recovers ~30%.

    For the RCA family the grid is (tiles, blocks, channels) — channels
    innermost — so the channel-independent transmit-distance planes of the
    current block are cached in ``txc_ref`` at ch == 0 with *static* scratch
    indices (dynamic-offset VMEM access is the costliest Mosaic pattern we
    measured)."""
    grp = pl.program_id(0)
    blk = pl.program_id(1)
    ch = pl.program_id(2)
    iq = st.iq
    ts = _tile_rows(st)
    zt = _n_z_tiles(st)
    mxu = _fb_mxu(st)
    B = st.frame_batch

    first = (ch == 0) & (blk == 0)

    if tg == 1:
        tile = grp
        out_v = (out_re_ref, out_im_ref, out_in_ref)
        world_v, herc_v, txc_v = world_ref, herc_ref, txc_ref
        zero = first
    else:
        # The group is the INNERMOST grid dim: consecutive (blk, ch)
        # steps sweep g with an unchanged RF block index, so the pipeline
        # skips the re-fetch (the same consecutive-identical-index rule
        # the inactive-tile collapse exploits) — RF HBM traffic divides
        # by tg with NO kernel-body growth.  (The first implementation
        # unrolled the group as an in-step python loop; the tg-times
        # bigger body measured 3x SLOWER on HERCULES 96^3 — 1007 vs
        # 335 ms, flat in tg — so the grid-dim form replaced it.)
        # Group grp covers row-tiles (grp//zt)*tg .. +tg-1 at z-tile
        # grp%zt; tile indices stay row_tile*zt + z_tile, so the
        # per-tile activity/bound tables keep their layout.  Per-tile
        # caches live at g-offset rows of shared scratch: dynamic
        # *sublane* slices at 8-aligned offsets are the Mosaic-native
        # dynamic access (leading-dim scratch indexing is not).
        g = pl.program_id(3)
        tile = (grp // zt) * (tg * zt) + g * zt + (grp % zt)
        rows = pl.ds(pl.multiple_of(g * ts, 8), ts)
        if B > 1 and not mxu:     # (B, tg*ts, LANE): rows on axis 1
            out_v = (out_re_ref.at[:, rows], out_im_ref.at[:, rows],
                     out_in_ref.at[:, rows])
        else:   # (tg*ts, LANE) or mxu (tg*ts, B, LANE): rows axis 0
            out_v = (out_re_ref.at[rows], out_im_ref.at[rows],
                     out_in_ref.at[rows])
        world_v = world_ref.at[:, rows]
        herc_v = herc_ref.at[:, rows]
        txc_v = txc_ref.at[:, rows]
        zero = first & (g == 0)

    @pl.when(zero)
    def _():
        out_re_ref[:] = jnp.zeros_like(out_re_ref)
        if iq:
            out_im_ref[:] = jnp.zeros_like(out_im_ref)
        if st.coherency_weighting:
            out_in_ref[:] = jnp.zeros_like(out_in_ref)

    _das_grp_tile(st, tx_block, ch_block, n_cb, n_blocks, tile, blk,
                  ch, first, scalars_ref, t0_ref, t1_ref, act_ref,
                  qlo_ref, qhi_ref, qblo_ref, qbhi_ref, lsc_ref,
                  vt_ref, xdc_ref, rf_ref, out_v, acc_re_ref,
                  acc_im_ref, world_v, herc_v, txc_v)


def _das_grp_tile(st, tx_block, ch_block, n_cb, n_blocks, tile, blk, ch,
                  first, scalars_ref, t0_ref, t1_ref, act_ref, qlo_ref,
                  qhi_ref, qblo_ref, qbhi_ref, lsc_ref, vt_ref, xdc_ref,
                  rf_ref, out_v, acc_re_ref, acc_im_ref, world_ref,
                  herc_ref, txc_ref):
    """Bounds read + activity gate + tile step for ONE tile of the grid
    step's group (the whole step when ``tile_grp`` == 1)."""
    if not ABLATE.get("no_bounds"):
        # Prefetched conservative chunk bounds, one per (channel subgroup,
        # row group) of this (tile, ch-unit): pure scalar reads, no
        # vector->scalar reduction stall.  Inactive units encode (nq, -1)
        # so all chunk groups predicate false.  ``n_cb`` counts *subunit*
        # bound rows (_ch_sub granularity); the step covers n_sub of them.
        H = _row_halves(st)
        n_sub = ch_block // _ch_sub(st, ch_block)
        if n_blocks > 1 and not ABLATE.get("no_blk_bounds"):
            # Per-(tile, acquisition-block) bounds to intersect with: the
            # ch-unit bounds union over ALL transmits, but each block's
            # transmit elements cover a narrow delay interval (measured
            # 0.61x executed chunks on HERCULES 3D,
            # experiments/herc_bounds_stats.py).
            blo = qblo_ref[tile * n_blocks + blk]
            bhi = qbhi_ref[tile * n_blocks + blk]
        else:
            blo = bhi = None
        qmin, qmax = [], []            # [subgroup][row group]
        for sg in range(n_sub):
            smin, smax = [], []
            u = tile * n_cb + ch * n_sub + sg
            for h in range(H):
                # tables are logically (units, H) but passed flattened:
                # 2-D SMEM operands are lane-padded x128 by the compiler
                # (a (2048, 1) table would burn 1 MB of the 1 MB budget)
                lo, hi = qlo_ref[u * H + h], qhi_ref[u * H + h]
                if blo is not None:
                    lo = jnp.maximum(lo, blo)
                    hi = jnp.minimum(hi, bhi)
                smin.append(lo)
                smax.append(hi)
            qmin.append(smin)
            qmax.append(smax)
    else:
        qmin = qmax = None

    @pl.when(act_ref[tile] > 0)
    def _active_body():
        _das_tile_step(st, tx_block, ch_block, n_blocks * tx_block,
                       tile, ch, blk, first,
                       qmin, qmax,
                       scalars_ref, t0_ref, t1_ref, lsc_ref, vt_ref,
                       xdc_ref, rf_ref,
                       out_v[0], out_v[1], out_v[2], acc_re_ref,
                       acc_im_ref, world_ref, herc_ref, txc_ref)


def _das_tile_step(st, tx_block, ch_block, a_pad, tile, ch, blk, first,
                   qb_lo, qb_hi,
                   scalars_ref,
                   t0_ref, t1_ref, lsc_ref, vt_ref, xdc_ref, rf_ref,
                   out_re_ref,
                   out_im_ref, out_in_ref, acc_re_ref, acc_im_ref, world_ref,
                   herc_ref, txc_ref):
    s = st.sample_count
    nq = _cdiv(s, CHUNK)
    iq = st.iq

    # World points are a pure function of the tile: compute them once when a
    # new tile begins (scratch persists across the channel x transmit loop).
    @pl.when(first)
    def _():
        wx, wy, wz, win = _tile_world_points(st, tile, vt_ref,
                                             scalars_ref[_SC_X0])
        world_ref[0] = wx
        world_ref[1] = wy
        world_ref[2] = wz
        if win is not None:
            world_ref[3] = win.astype(jnp.float32)
        if st.family == "forces":
            # (fnum/z)^2 tile plane for the u-form apodization
            fnum = scalars_ref[_SC_FNUM]
            world_ref[4] = (fnum * fnum) / (wz * wz)

    n_rows, n_lanes = _axes(st)
    full = (n_rows % _tile_rows(st) == 0 and n_lanes % TILE_LANE == 0)
    world = (world_ref[0], world_ref[1], world_ref[2],
             None if full else (world_ref[3] > 0.5))
    world_f2z = world_ref[4] if st.family == "forces" else None

    # Receive terms are a pure function of (tile, channel): cache them in
    # scratch when a new channel begins (the transmit-block dim is innermost
    # for these families).
    rx_cache = None
    tx_cached = False
    if st.family == "forces":
        # Channels innermost (like rca): cache this block's channel-free
        # transmit planes once; rx terms are computed per channel inside
        # the unit (lazily per distinct channel of each predicate batch).
        @pl.when(ch == 0)
        def _():
            for j in range(tx_block):
                txc_ref[j] = _forces_tx_index(
                    st, scalars_ref, t0_ref, blk * tx_block + j, world)
        tx_cached = True
    elif st.family == "hercules":
        # tile-level terms at tile start; channel-free tx planes per block
        @pl.when(first)
        def _():
            xw, yw, zw, tx_index0, fnum_over_z = _hercules_tile_terms(
                st, scalars_ref, xdc_ref, world)
            herc_ref[0] = xw
            herc_ref[1] = yw
            herc_ref[2] = zw
            herc_ref[3] = tx_index0
            herc_ref[4] = fnum_over_z

        @pl.when(ch == 0)
        def _():
            for j in range(tx_block):
                txc_ref[j] = _hercules_tx_d2(
                    scalars_ref, t0_ref, blk * tx_block + j,
                    herc_ref[0], herc_ref[1])
        rx_cache = (herc_ref[0], herc_ref[1], herc_ref[2], herc_ref[3],
                    herc_ref[4])
        tx_cached = True
    else:  # rca: XDC coords are pure tile terms; tx distance per (tile, acq)
        @pl.when(first)
        def _():
            xw, yw, zw = _apply_m4_tile(xdc_ref, world[0], world[1],
                                        world[2])
            herc_ref[0] = xw
            herc_ref[1] = yw
            herc_ref[2] = zw
            fnum = scalars_ref[_SC_FNUM]
            herc_ref[3] = (fnum * fnum) / (zw * zw)
        rx_cache = (herc_ref[0], herc_ref[1], herc_ref[2], herc_ref[3])

        # Channels are innermost: cache this block's transmit planes once.
        @pl.when(ch == 0)
        def _():
            for j in range(tx_block):
                txc_ref[j] = _rca_acq_tx_dist(
                    scalars_ref, t0_ref, t1_ref, blk * tx_block + j, world)
        tx_cached = True

    if qb_lo is not None:
        # Chunk bounds are prefetched per (tile, ch-subgroup, row-group);
        # skip the whole unit (delay math included) when the union over
        # every subgroup x row-group is empty.
        flat_lo = [b for sg in qb_lo for b in sg]
        flat_hi = [b for sg in qb_hi for b in sg]
        u_lo, u_hi = flat_lo[0], flat_hi[0]
        for h in range(1, len(flat_lo)):
            u_lo = jnp.minimum(u_lo, flat_lo[h])
            u_hi = jnp.maximum(u_hi, flat_hi[h])

        @pl.when(u_lo <= u_hi)
        def _():
            _das_unit_compute(st, tx_block, ch_block, a_pad, ch, blk,
                              qb_lo, qb_hi,
                              scalars_ref, t0_ref, t1_ref, lsc_ref, xdc_ref,
                              rf_ref,
                              out_re_ref, out_im_ref, out_in_ref, acc_re_ref,
                              acc_im_ref, world, world_f2z, rx_cache,
                              tx_cached, txc_ref)
    else:
        _das_unit_compute(st, tx_block, ch_block, a_pad, ch, blk, None, None,
                          scalars_ref, t0_ref, t1_ref, lsc_ref, xdc_ref,
                          rf_ref,
                          out_re_ref, out_im_ref, out_in_ref, acc_re_ref,
                          acc_im_ref, world, world_f2z, rx_cache, tx_cached,
                          txc_ref)


def _das_unit_compute(st, tx_block, ch_block, a_pad, ch, blk, qb_lo, qb_hi,
                      scalars_ref, t0_ref, t1_ref, lsc_ref, xdc_ref, rf_ref,
                      out_re_ref, out_im_ref, out_in_ref, acc_re_ref,
                      acc_im_ref, world, world_f2z, rx_cache, tx_cached,
                      txc_ref):
    s = st.sample_count
    nq = _cdiv(s, CHUNK)
    iq = st.iq
    ts = _tile_rows(st)
    B = st.frame_batch
    mxu = _fb_mxu(st)
    if mxu:
        # The MXU path accumulates straight into the (ts, B, LANE) output
        # blocks per (pair, chunk, row); no per-frame unit sums exist.
        sum_re = sum_im = sum_in = None
        if ABLATE.get("no_unit"):
            return
    else:
        # Per-frame unit sums (B == 1 keeps the original single-plane
        # shape; batched units hold one pair per frame — geometry work is
        # shared, only gathers/accumulation scale with B).
        sum_re = [jnp.zeros((ts, TILE_LANE), jnp.float32) for _ in range(B)]
        sum_im = [jnp.zeros((ts, TILE_LANE), jnp.float32) for _ in range(B)]
        sum_in = [jnp.zeros((ts, TILE_LANE), jnp.float32) for _ in range(B)]
    if ABLATE.get("no_unit"):      # floor ablation: grid+world+output only
        for fb in range(B):
            osel = (slice(None),) if B == 1 else (fb,)
            out_re_ref[osel] += sum_re[fb]
            if iq:
                out_im_ref[osel] += sum_im[fb]
            if st.coherency_weighting:
                out_in_ref[osel] += sum_in[fb]
        return

    # ch_block channels per grid step: amortizes per-step fixed costs
    # (grid bookkeeping, output/accumulator traffic, branch overhead) over
    # several channels; every family's scratch caches are channel-
    # independent so they share.  The prefetched chunk bounds are
    # conservative for every pair of the step, so ``pred_share`` pairs
    # share one chunk-group predicate region (fewer scalar-core branches);
    # each shared pair gets its own accumulator plane in scratch.
    pairs = [(i, j) for i in range(ch_block) for j in range(tx_block)]
    ch_sub = _ch_sub(st, ch_block)
    if qb_lo is not None:
        # Predicate batches must not straddle bound subgroups (pairs are
        # i-major, so subgroup sg owns the contiguous slice
        # [sg*ch_sub*tx_block, (sg+1)*ch_sub*tx_block)).
        share = min(_pred_share(st, ch_block * tx_block), len(pairs),
                    ch_sub * tx_block)
        while (ch_sub * tx_block) % share:
            share -= 1
    else:
        share = 1
    # Chunk predication granularity: with prefetched (and, multi-transmit,
    # per-block-intersected) bounds plus whole-step predicate sharing, exact
    # per-chunk skipping is essentially free — group=1 everywhere
    # (re-measured: forces-big 57.8 -> 27.6 ms, HERCULES 1013 -> 856 ms,
    # chain 17.3 -> 14.4 ms; the old per-family groups predated the block
    # bounds).
    group = min(nq, _knob(st, "group", 1))

    for b0 in range(0, len(pairs), share):
        batch = pairs[b0:b0 + share]
        preps = []
        any_active = None
        if qb_lo is not None:
            sg = batch[0][0] // ch_sub     # this batch's bound subgroup
            h_bounds = list(zip(qb_lo[sg], qb_hi[sg]))
            qmin, qmax = h_bounds[0]       # union over row groups
            for hlo, hhi in h_bounds[1:]:
                qmin = jnp.minimum(qmin, hlo)
                qmax = jnp.maximum(qmax, hhi)
        else:
            h_bounds = None
            qmin = qmax = None
        rx_by_i = {}          # forces: rx terms shared by a channel's pairs
        for slot, (i, j) in enumerate(batch):
            chv = ch * ch_block + i if ch_block > 1 else ch
            acq = blk * tx_block + j
            if st.family == "forces" and tx_cached:
                if i not in rx_by_i:
                    rx_by_i[i] = _forces_rx_terms(st, scalars_ref, chv,
                                                  world, f2z=world_f2z)
                rx_c = rx_by_i[i]
            elif st.family == "hercules" and tx_cached:
                if i not in rx_by_i:
                    rx_by_i[i] = _hercules_rx_d2(
                        st, scalars_ref, chv, rx_cache[0], rx_cache[1])
                rx_c = rx_cache + (rx_by_i[i],)
            else:
                rx_c = rx_cache
            index, apod, mask = _DELAY[st.family](
                st, scalars_ref, t0_ref, t1_ref, xdc_ref, chv, acq, world,
                rx_cache=rx_c,
                tx_cache=txc_ref[j] if tx_cached else None)

            if st.interpolation_mode == InterpolationMode.Nearest:
                k = jnp.floor(index + 0.5).astype(jnp.int32)
                valid = (jnp.floor(index) >= 0) & (k < s)
                taps = [(0, jnp.float32(1.0))]
            else:
                kf = jnp.floor(index)
                k = kf.astype(jnp.int32)
                t = index - kf
                if st.interpolation_mode == InterpolationMode.Linear:
                    valid = (k >= 0) & (k < s - 1)
                else:
                    valid = (k > 0) & (k < s - 2)
                taps = _interp_weights(st, t)

            w_mask = apod * valid.astype(jnp.float32)
            if (_pack_iq(st) or _pack_pairs(st)) and B == 1:
                # fold the line's int16 dequant scale into the pair weight
                # (lsc is (C, A) flattened 1-D: 2-D SMEM gets lane-padded).
                # Batched units instead scale each frame's accumulator at
                # flush time (scale is per (pair, frame); weights stay
                # shared across frames).
                w_mask = w_mask * lsc_ref[chv * a_pad + acq]
            if qb_lo is None:   # share == 1: in-kernel reduction bounds
                min_off = min(tp[0] for tp in taps)
                max_off = max(tp[0] for tp in taps)
                active = valid & mask
                k_lo = jnp.min(jnp.where(active, k, s)) + min_off
                k_hi = jnp.max(jnp.where(active, k, 0)) + max_off
                qmin = jnp.clip(k_lo // CHUNK, 0, nq - 1)
                qmax = jnp.clip(k_hi // CHUNK, 0, nq - 1)
                any_active = jnp.any(active)
            # Per-tap weight planes hoisted out of the chunk loop
            # (w_mask * w is chunk-invariant).  Hermite entries carry
            # (position, value-weight, slope-weight).
            tap_w = [(tp[0],) + tuple(w_mask * w for w in tp[1:])
                     for tp in taps]
            if mxu:
                # Rotation phase planes are frame-independent and applied
                # per (pair, chunk, row) right after the matmul (linearity
                # over the chunk sum makes per-chunk rotation exact).
                if iq and not ABLATE.get("no_rotation"):
                    if ABLATE.get("exact_rot"):
                        arg = (np.float32(2 * np.pi)
                               * scalars_ref[_SC_FDEMOD]
                               * index / scalars_ref[_SC_FS])
                        ph = (jnp.cos(arg), jnp.sin(arg))
                    else:
                        cycles = (scalars_ref[_SC_FDEMOD]
                                  / scalars_ref[_SC_FS]) * index
                        ph_im, ph_re = _sincos_2pi(cycles)
                        ph = (ph_re, ph_im)
                else:
                    ph = None
                preps.append((slot, i, j, k, tap_w, ph))
                continue
            if B == 1:
                acc_re_ref[slot] = jnp.zeros((ts, TILE_LANE), jnp.float32)
                if iq:
                    acc_im_ref[slot] = jnp.zeros((ts, TILE_LANE),
                                                 jnp.float32)
            else:
                acc_re_ref[:, slot] = jnp.zeros((B, ts, TILE_LANE),
                                                jnp.float32)
                if iq:
                    acc_im_ref[:, slot] = jnp.zeros((B, ts, TILE_LANE),
                                                    jnp.float32)
            preps.append((slot, i, j, k, tap_w, index))

        # Static chunk loop, predicated per *group* of chunks: branches run
        # on the scalar core, so group them and share each predicate region
        # across the batch.
        def chunk_body(sub, hgt, g0, g1):
            """Gather/accumulate chunks [g0, g1) into acc rows ``sub``."""
            for slot, i, j, k, tap_w, _ in preps:
                a_re = acc_re_ref[slot, sub]
                a_im = acc_im_ref[slot, sub] if iq else None
                k_s = k[sub]
                tw = [(tp[0],) + tuple(w[sub] for w in tp[1:])
                      for tp in tap_w]
                for q in range(g0, g1):
                    base = q * CHUNK
                    if _pair_iq(st):
                        # pair-packed planes (re/im value pairs; cubic
                        # adds slope pairs): ONE index/compare/clip/select
                        # set serves every gather of the (pair, chunk).
                        n_pl = (4 if st.interpolation_mode
                                == InterpolationMode.Cubic else 2)
                        srcs = [jnp.broadcast_to(
                            rf_ref[i, j, p:p + 1,
                                   base:base + CHUNK].reshape(1, CHUNK),
                            (hgt, CHUNK)) for p in range(n_pl)]
                        for tp in tw:
                            r = k_s + tp[0] - base
                            sel = r.astype(jnp.uint32) < CHUNK
                            rc = r if ABLATE.get("noclip") else \
                                r & (CHUNK - 1)
                            vs = []
                            for p in range(n_pl):
                                v = srcs[p] if ABLATE.get("no_gather") \
                                    else jnp.take_along_axis(srcs[p], rc,
                                                             axis=-1)
                                vs.append(jnp.where(sel, v, 0))
                            w = tp[1:]
                            a_re = (a_re
                                    + w[0] * (vs[0] >> 16).astype(
                                        jnp.float32)
                                    + w[1] * ((vs[0] << 16) >> 16).astype(
                                        jnp.float32))
                            a_im = (a_im
                                    + w[0] * (vs[1] >> 16).astype(
                                        jnp.float32)
                                    + w[1] * ((vs[1] << 16) >> 16).astype(
                                        jnp.float32))
                            if n_pl == 4:
                                a_re = (a_re
                                        + w[2] * (vs[2] >> 16).astype(
                                            jnp.float32)
                                        + w[3] * ((vs[2] << 16)
                                                  >> 16).astype(
                                            jnp.float32))
                                a_im = (a_im
                                        + w[2] * (vs[3] >> 16).astype(
                                            jnp.float32)
                                        + w[3] * ((vs[3] << 16)
                                                  >> 16).astype(
                                            jnp.float32))
                        continue
                    if _hermite(st):
                        # two packed int32 planes (value, slope) share each
                        # position's index/compare/clip/mask ops.
                        src_p = jnp.broadcast_to(
                            rf_ref[i, j, 0:1, base:base + CHUNK].reshape(
                                1, CHUNK), (hgt, CHUNK))
                        src_m = jnp.broadcast_to(
                            rf_ref[i, j, 1:2, base:base + CHUNK].reshape(
                                1, CHUNK), (hgt, CHUNK))
                        for off, wp, wm in tw:
                            r = k_s + off - base
                            sel = r.astype(jnp.uint32) < CHUNK
                            rc = r if ABLATE.get("noclip") else \
                                r & (CHUNK - 1)
                            wps = jnp.where(sel, wp, 0.0)
                            wms = jnp.where(sel, wm, 0.0)
                            vp = src_p if ABLATE.get("no_gather") else \
                                jnp.take_along_axis(src_p, rc, axis=-1)
                            vm = src_m if ABLATE.get("no_gather") else \
                                jnp.take_along_axis(src_m, rc, axis=-1)
                            a_re = (a_re
                                    + wps * (vp >> 16).astype(jnp.float32)
                                    + wms * (vm >> 16).astype(jnp.float32))
                            a_im = (a_im
                                    + wps * ((vp << 16) >> 16).astype(
                                        jnp.float32)
                                    + wms * ((vm << 16) >> 16).astype(
                                        jnp.float32))
                        continue
                    if _pack_pairs(st):
                        # one plane of (p_k, p_{k+1}) int16-pair words:
                        # each gather yields two consecutive taps.
                        src_pk = jnp.broadcast_to(
                            rf_ref[i, j, 0:1, base:base + CHUNK].reshape(
                                1, CHUNK), (hgt, CHUNK))
                        for off, w_hi, w_lo in tw:
                            r = k_s + off - base
                            sel = r.astype(jnp.uint32) < CHUNK
                            rc = r if ABLATE.get("noclip") else \
                                r & (CHUNK - 1)
                            whi = jnp.where(sel, w_hi, 0.0)
                            wlo = jnp.where(sel, w_lo, 0.0)
                            v = src_pk if ABLATE.get("no_gather") else \
                                jnp.take_along_axis(src_pk, rc, axis=-1)
                            a_re = (a_re
                                    + whi * (v >> 16).astype(jnp.float32)
                                    + wlo * ((v << 16) >> 16).astype(
                                        jnp.float32))
                        continue
                    if _pack_iq(st):
                        # one plane of int32 int16-pair words: ONE gather
                        # per tap; unpack = 2 shifts + 2 converts on
                        # otherwise-idle VPU slots.
                        src_pk = jnp.broadcast_to(
                            rf_ref[i, j, 0:1, base:base + CHUNK].reshape(
                                1, CHUNK), (hgt, CHUNK))
                        for off, wt in tw:
                            r = k_s + off - base
                            sel = r.astype(jnp.uint32) < CHUNK
                            rc = r if ABLATE.get("noclip") else \
                                r & (CHUNK - 1)
                            wsel = jnp.where(sel, wt, 0.0)
                            v = src_pk if ABLATE.get("no_gather") else \
                                jnp.take_along_axis(src_pk, rc, axis=-1)
                            a_re = a_re + wsel * (
                                v >> 16).astype(jnp.float32)
                            a_im = a_im + wsel * (
                                (v << 16) >> 16).astype(jnp.float32)
                        continue
                    # block layout (CB, TB, planes, S): 0=re, 1=im
                    src_re = jnp.broadcast_to(
                        rf_ref[i, j, 0:1, base:base + CHUNK].reshape(
                            1, CHUNK), (hgt, CHUNK))
                    if iq:
                        src_im = jnp.broadcast_to(
                            rf_ref[i, j, 1:2, base:base + CHUNK].reshape(
                                1, CHUNK), (hgt, CHUNK))
                    for off, wt in tw:
                        r = k_s + off - base
                        # one unsigned compare: negative r wraps high
                        sel = r.astype(jnp.uint32) < CHUNK
                        # single-op legal-index wrap (CHUNK is a power of
                        # two; sel discards wrapped values) vs clip's 2 ops
                        rc = r if ABLATE.get("noclip") else \
                            r & (CHUNK - 1)
                        wsel = jnp.where(sel, wt, 0.0)
                        if ABLATE.get("no_gather"):
                            a_re = a_re + wsel * src_re
                            if iq:
                                a_im = a_im + wsel * src_im
                            continue
                        a_re = a_re + wsel * jnp.take_along_axis(
                            src_re, rc, axis=-1)
                        if iq:
                            a_im = a_im + wsel * jnp.take_along_axis(
                                src_im, rc, axis=-1)
                acc_re_ref[slot, sub] = a_re
                if iq:
                    acc_im_ref[slot, sub] = a_im

        def chunk_body_batched(sub, hgt, g0, g1):
            """Batched gather/accumulate: per-tap index/compare/clip state
            and weights are computed ONCE per (pair, chunk) and shared by
            all B frames — only the plane gathers and FMAs scale with B.
            The per-(pair, frame) int16 dequant scale is applied at flush
            (weights are frame-independent here)."""
            n_pl = (2 if _hermite(st) or (iq and not _pack_iq(st)) else 1)
            for slot, i, j, k, tap_w, _ in preps:
                k_s = k[sub]
                tw = [(tp[0],) + tuple(w[sub] for w in tp[1:])
                      for tp in tap_w]
                for q in range(g0, g1):
                    base = q * CHUNK
                    taps_state = []
                    for tp in tw:
                        r = k_s + tp[0] - base
                        sel = r.astype(jnp.uint32) < CHUNK
                        rc = r & (CHUNK - 1)
                        wsels = tuple(jnp.where(sel, w, 0.0)
                                      for w in tp[1:])
                        taps_state.append((rc, wsels))
                    for fb in range(B):
                        srcs = [jnp.broadcast_to(
                            rf_ref[i, j, fb * n_pl + p:fb * n_pl + p + 1,
                                   base:base + CHUNK].reshape(1, CHUNK),
                            (hgt, CHUNK)) for p in range(n_pl)]
                        a_re = acc_re_ref[fb, slot, sub]
                        a_im = acc_im_ref[fb, slot, sub] if iq else None
                        for rc, wsels in taps_state:
                            if _hermite(st):
                                vp = jnp.take_along_axis(srcs[0], rc,
                                                         axis=-1)
                                vm = jnp.take_along_axis(srcs[1], rc,
                                                         axis=-1)
                                wps, wms = wsels
                                a_re = (a_re
                                        + wps * (vp >> 16).astype(
                                            jnp.float32)
                                        + wms * (vm >> 16).astype(
                                            jnp.float32))
                                a_im = (a_im
                                        + wps * ((vp << 16) >> 16).astype(
                                            jnp.float32)
                                        + wms * ((vm << 16) >> 16).astype(
                                            jnp.float32))
                            elif _pack_iq(st):
                                v = jnp.take_along_axis(srcs[0], rc,
                                                        axis=-1)
                                (wt,) = wsels
                                a_re = a_re + wt * (v >> 16).astype(
                                    jnp.float32)
                                a_im = a_im + wt * ((v << 16) >> 16).astype(
                                    jnp.float32)
                            elif _pack_pairs(st):
                                v = jnp.take_along_axis(srcs[0], rc,
                                                        axis=-1)
                                w_hi, w_lo = wsels
                                a_re = (a_re
                                        + w_hi * (v >> 16).astype(
                                            jnp.float32)
                                        + w_lo * ((v << 16) >> 16).astype(
                                            jnp.float32))
                            elif iq:
                                (wt,) = wsels
                                a_re = a_re + wt * jnp.take_along_axis(
                                    srcs[0], rc, axis=-1)
                                a_im = a_im + wt * jnp.take_along_axis(
                                    srcs[1], rc, axis=-1)
                            else:
                                (wt,) = wsels
                                a_re = a_re + wt * jnp.take_along_axis(
                                    srcs[0], rc, axis=-1)
                        acc_re_ref[fb, slot, sub] = a_re
                        if iq:
                            acc_im_ref[fb, slot, sub] = a_im

        def chunk_body_mxu(sub, hgt, g0, g1):
            """One-hot MXU interpolation (fb_mxu): zero gathers.  Per
            (pair, chunk, voxel row) build a banded (CHUNK, LANE) weight
            matrix W from iota compares — W[s, v] = sum_t w_t[v] *
            (s == k[v] + t - base), with the apodized tap weights folded
            in — and contract the frame batch on the MXU:
            ``out[B, lane] += RF[B, chunk] @ W``.  Taps outside this chunk
            simply never match (the adjacent chunk's W picks them up —
            same split the gather path's per-chunk `sel` mask performs).
            RF planes are exact bf16 (hi, lo) splits; ``mxu_exact`` (on by
            default) adds the RF_hi @ W_lo cross term so the weights keep
            f32-grade precision (the dropped RF_lo @ W_lo term is
            < 2^-18 relative).  Rotation (frame-shared phase planes from
            prep) applies right here, per chunk — linear over the chunk
            sum — so no per-pair accumulator slots or flush exist."""
            row0 = sub.start or 0
            exact = bool(_knob(st, "mxu_exact", 1))
            n_comp = 2 if iq else 1
            dn = (((1,), (0,)), ((), ()))
            f32 = jnp.float32
            iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, TILE_LANE),
                                            0)
            for slot, i, j, k, tap_w, ph in preps:
                k_s = k[sub]
                tw = [(tp[0],) + tuple(w[sub] for w in tp[1:])
                      for tp in tap_w]
                phr = ph[0][sub] if ph is not None else None
                phi = ph[1][sub] if ph is not None else None
                for q in range(g0, g1):
                    base = q * CHUNK
                    parts = []
                    for comp in range(n_comp):
                        p0 = 2 * comp * B
                        parts.append((rf_ref[i, j, p0:p0 + B,
                                             base:base + CHUNK],
                                      rf_ref[i, j, p0 + B:p0 + 2 * B,
                                             base:base + CHUNK]))
                    for r in range(hgt):
                        kk = k_s[r:r + 1, :] - base
                        wf = jnp.zeros((CHUNK, TILE_LANE), f32)
                        for tp in tw:
                            wf = wf + jnp.where(iota == kk + tp[0],
                                                tp[1][r:r + 1, :], 0.0)
                        whi = wf.astype(jnp.bfloat16)
                        wlo = ((wf - whi.astype(f32)).astype(jnp.bfloat16)
                               if exact else None)
                        mm = []
                        for hi, lo in parts:
                            m = (jax.lax.dot_general(
                                     hi, whi, dn, preferred_element_type=f32)
                                 + jax.lax.dot_general(
                                     lo, whi, dn,
                                     preferred_element_type=f32))
                            if exact:
                                m = m + jax.lax.dot_general(
                                    hi, wlo, dn, preferred_element_type=f32)
                            mm.append(m)
                        rr = row0 + r
                        if ph is not None:
                            pr = phr[r:r + 1, :]
                            pi_ = phi[r:r + 1, :]
                            out_re_ref[rr] += mm[0] * pr - mm[1] * pi_
                            out_im_ref[rr] += mm[0] * pi_ + mm[1] * pr
                        elif iq:
                            out_re_ref[rr] += mm[0]
                            out_im_ref[rr] += mm[1]
                        else:
                            out_re_ref[rr] += mm[0]

        body = (chunk_body_mxu if mxu
                else chunk_body if B == 1 else chunk_body_batched)

        n_h = len(h_bounds) if h_bounds is not None else 1
        hs = ts // n_h
        for g0 in range(0, nq, group) if not ABLATE.get("no_chunk_loop") \
                else ():
            g1 = min(g0 + group, nq)
            cond = (g1 - 1 >= qmin) & (g0 <= qmax)
            if any_active is not None:
                cond = any_active & cond
            if ABLATE.get("no_pred"):
                cond = (ch >= 0)

            @pl.when(cond)
            def _(g0=g0, g1=g1):
                if n_h == 1:
                    body(slice(None), ts, g0, g1)
                else:
                    # Nested per-row-group regions: the outer (union)
                    # branch count stays as before; inner branches only
                    # run on executed chunks, and a chunk touched by one
                    # row group does half the gather/accumulate work.
                    for h in range(n_h):
                        hlo, hhi = h_bounds[h]

                        @pl.when((g1 - 1 >= hlo) & (g0 <= hhi))
                        def _(h=h, g0=g0, g1=g1):
                            body(slice(h * hs, (h + 1) * hs), hs,
                                 g0, g1)

        if mxu:
            continue               # accumulated in-body; no flush
        scaled = (_pack_iq(st) or _pack_pairs(st)) and B > 1
        for slot, i, j, k, tap_w, index in preps:
            if iq and not ABLATE.get("no_rotation"):
                # rotate the (tile, c, a) contribution once
                # (das.glsl:51-59); phase planes are frame-independent.
                if ABLATE.get("exact_rot"):
                    arg = (np.float32(2 * np.pi) * scalars_ref[_SC_FDEMOD]
                           * index / scalars_ref[_SC_FS])
                    ph_re = jnp.cos(arg)
                    ph_im = jnp.sin(arg)
                else:
                    cycles = (scalars_ref[_SC_FDEMOD]
                              / scalars_ref[_SC_FS]) * index
                    ph_im, ph_re = _sincos_2pi(cycles)
            else:
                ph_re = ph_im = None
            if scaled:
                chv = ch * ch_block + i if ch_block > 1 else ch
                acq = blk * tx_block + j
            for fb in range(B):
                asel = (slot,) if B == 1 else (fb, slot)
                a_re = acc_re_ref[asel]
                a_im = acc_im_ref[asel] if iq else None
                if scaled:
                    # per-(pair, frame) int16 dequant scale, deferred from
                    # the (shared) tap weights
                    s_l = lsc_ref[(chv * a_pad + acq) * B + fb]
                    a_re = a_re * s_l
                    if iq:
                        a_im = a_im * s_l
                if ph_re is not None:
                    rot_re = a_re * ph_re - a_im * ph_im
                    rot_im = a_re * ph_im + a_im * ph_re
                    sum_re[fb] = sum_re[fb] + rot_re
                    sum_im[fb] = sum_im[fb] + rot_im
                    if st.coherency_weighting:
                        sum_in[fb] = sum_in[fb] + jnp.sqrt(
                            rot_re * rot_re + rot_im * rot_im)
                elif iq:
                    sum_re[fb] = sum_re[fb] + a_re
                    sum_im[fb] = sum_im[fb] + a_im
                else:
                    sum_re[fb] = sum_re[fb] + a_re
                    if st.coherency_weighting:
                        sum_in[fb] = sum_in[fb] + jnp.abs(a_re)

    if mxu:
        return
    for fb in range(B):
        osel = (slice(None),) if B == 1 else (fb,)
        out_re_ref[osel] += sum_re[fb]
        if iq:
            out_im_ref[osel] += sum_im[fb]
        if st.coherency_weighting:
            out_in_ref[osel] += sum_in[fb]


# Measured r3 defaults.  forces stays at 4: tx_block=8 wins on the big
# 512x1024 grid (16.3 -> 13.7 ms) but loses on the 256x512 chain config
# (13.5 -> 14.9 ms) — the autotune candidates cover 8, and the shipped
# tuned tables pick it up per preset.
_TXB = {"hercules": 16, "forces": 4, "rca": 4}


def _pred_share(st, default: int = 8) -> int:
    """Pairs sharing one chunk-group predicate region.  Default: the whole
    grid step (ch_block x tx_block pairs) — one scalar branch serves every
    gather of the step (capped at 128: HERCULES measured monotone 32 -> 64
    -> 128 = 543 -> 519 -> 507 ms; beyond 128 unmeasured)."""
    return max(1, int(_knob(st, "pred_share", min(default, 128))))


def _row_halves(st) -> int:
    """Axial sub-tile bound granularity: the chunk-bound tables carry H
    row-groups per (tile, channel-unit); the kernel nests per-group
    predicate regions inside the union region, so a chunk touched by only
    one row half does half the gather/accumulate work.  The row axis pays
    the delay *slope* (~1 chunk per 16 rows on the BASELINE grid), which
    the union bounds charge to every executed chunk.  H must keep the row
    slice sublane-aligned ((ts/H) % 8 == 0).  Default 2 for HERCULES only
    (measured 505 -> 478 ms on the 96^3 volume; headline/forces neutral —
    their per-half bounds quantize to the same chunks, so the nesting only
    adds branches); the autotune candidates cover both settings."""
    ts = _tile_rows(st)
    default = 2 if (st.family == "hercules" and ts % 16 == 0) else 1
    h = int(_knob(st, "row_halves", default))
    while h > 1 and (ts % h != 0 or (ts // h) % 8 != 0):
        h -= 1
    return max(1, h)


def _tile_grp(st) -> int:
    """Row-tiles sharing each grid step's (channel x transmit) RF sweep.

    The round-4 floor decomposition showed both 3D volume families are
    fixed-cost-bound, and the dominant fixed term is per-step RF re-fetch:
    the block sweep streams the ENTIRE RF array once per voxel tile
    (HERCULES 96^3: 576 tiles x 128 MB ~= 90 ms of the 116.7 ms fixed
    component at 819 GB/s).  ``tile_grp = TG`` makes TG consecutive
    row-tiles one grid step — the RF block is fetched once and swept over
    all TG tiles — dividing that HBM traffic by TG while keeping 16-row
    activity/bound/predicate granularity (each tile of the group keeps its
    own flags, chunk bounds, and predicate regions).  Costs TG x the
    world/tile-term/tx-plane scratch and a TG-times-taller output block.
    Clamped to a divisor of the row-tile count (the output BlockSpec needs
    uniform blocks).  Default 1 (the proven single-tile step); volume
    autotune candidates cover it."""
    rt = _n_row_tiles(st)
    tg = max(1, int(_knob(st, "tile_grp", 1)))
    tg = min(tg, rt)
    while rt % tg:
        tg -= 1
    return tg


def _ch_sub(st, ch_block: int) -> int:
    """Channel granularity of the chunk-bound tables.  Default = ch_block
    (one bounds row per grid step, round-2 behavior).  Smaller values keep
    the big step's amortization but give each ch_sub-channel subgroup its
    own predicate regions and bounds, so a chunk needed by only part of
    the step's channel span skips the rest's gather work — the 32-channel
    union bounds execute ~15% more chunks than 8-channel bounds on the
    headline (experiments/chblock_span_stats.py).  Must divide ch_block;
    autotune candidates cover it per family."""
    cs = int(_knob(st, "ch_sub", ch_block))
    cs = max(1, min(cs, ch_block))
    while ch_block % cs:
        cs -= 1
    return cs


_ACT_MARGIN = np.float32(8.0)   # samples of slack on the activity bounds


def _act_margin():
    return np.float32(ABLATE.get("margin", _ACT_MARGIN))


def _tile_activity(st: DasStatic, scalars, t0_arr, t1_arr, vt, xdc,
                   n_grid: int, n_cb: int = 1, ch_block: int = 1,
                   tx_block: int = 4, halves: int = 1):
    """Per-tile activity flags + per-(tile, channel-unit) and
    per-(tile, acquisition-block) chunk bounds.

    Returns ``(act, qlo, qhi, qblo, qbhi)``: ``act`` is (n_tiles,) int32 —
    1 if any (voxel, channel, acq) of the tile can contribute (delay-index
    interval overlaps [0, S) and some channel's f-number cone contains it).
    ``qlo``/``qhi`` are (n_tiles * n_cb,) int32 conservative RF-chunk
    bounds per (tile, channel-unit) — prefetched so the kernel's chunk
    predicates are pure scalar reads instead of vector->scalar reductions
    (which stall the scalar core on the vector pipeline).  ``qblo``/``qbhi``
    are (n_tiles * n_blocks,) bounds per (tile, transmit-block) — the
    ch-unit bounds union over all transmits, so multi-transmit configs
    intersect both tables in-kernel (0.61x executed chunks on HERCULES 3D).
    Inactive units encode (nq, -1) so every group predicate is false.
    A conservative over-approximation throughout (false positives only cost
    time; the kernel's own masks stay authoritative).

    Runs vectorized over the full voxel grid inside the jit wrapper, so it
    tracks the *traced* sampling frequency / speed of sound — unlike a
    static bound, changing them at runtime can never produce wrong zeros.
    """
    rt, zt = _n_row_tiles(st), _n_z_tiles(st)
    if ABLATE.get("no_bounds"):       # round-1 behavior (A/B harness)
        return (jnp.ones(rt * zt, jnp.int32),
                jnp.zeros((1, 1), jnp.int32), jnp.zeros((1, 1), jnp.int32),
                jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32))
    n_rows, n_lanes = _axes(st)
    nx, ny, nz = st.output_points
    gnx, gny, gnz = st.global_points or (nx, ny, nz)
    ts = _tile_rows(st)
    row = jnp.arange(rt * ts, dtype=jnp.int32)[:, None]
    lane = jnp.arange(zt * TILE_LANE, dtype=jnp.int32)[None, :]
    if nz > 1:
        iy, iz, ix = lane, row % nz, row // nz
    elif _lat_lanes(st):
        iz, iy, ix = jnp.zeros_like(lane), row, lane
    else:
        iz, iy, ix = jnp.zeros_like(lane), lane, row
    pxn = (ix.astype(jnp.float32) + scalars[_SC_X0]) / np.float32(
        max(gnx - 1, 1))
    pyn = iy.astype(jnp.float32) / np.float32(max(gny - 1, 1))
    pzn = iz.astype(jnp.float32) / np.float32(max(gnz - 1, 1))
    x = vt[0, 0] * pxn + vt[0, 1] * pyn + vt[0, 2] * pzn + vt[0, 3]
    y = vt[1, 0] * pxn + vt[1, 1] * pyn + vt[1, 2] * pzn + vt[1, 3]
    z = vt[2, 0] * pxn + vt[2, 1] * pyn + vt[2, 2] * pzn + vt[2, 3]
    in_range = (row < n_rows) & (lane < n_lanes)

    fs, sos, t0 = scalars[_SC_FS], scalars[_SC_SOS], scalars[_SC_T0]
    fnum = scalars[_SC_FNUM]
    pxp, pyp = scalars[_SC_PX], scalars[_SC_PY]
    ch0 = scalars[_SC_CH0]
    chn = ch0 + np.float32(st.local_channels - 1)
    s_hi = np.float32(st.sample_count) + _ACT_MARGIN
    s_lo = -_ACT_MARGIN

    def interval_dist(lat, lo, hi):
        dmin = jnp.maximum(0.0, jnp.maximum(lo - lat, lat - hi))
        dmax = jnp.maximum(jnp.abs(lat - lo), jnp.abs(lat - hi))
        return dmin, dmax

    nq = _cdiv(st.sample_count, CHUNK)
    n_blocks = _cdiv(n_grid, tx_block)
    ts_q = _tile_rows(st)

    def quant(kmin_t, kmax_t):
        on = jnp.isfinite(kmax_t)
        ql = jnp.where(on, jnp.clip(jnp.floor(
            (kmin_t - _act_margin()) / CHUNK), 0, nq - 1),
            np.float32(nq)).astype(jnp.int32)
        qh = jnp.where(on, jnp.clip(jnp.floor(
            (kmax_t + _act_margin()) / CHUNK), 0, nq - 1),
            np.float32(-1)).astype(jnp.int32)
        return ql, qh

    def unit_tables(kmin, kmax):
        """(n_cb, rows, lanes) index intervals -> activity flags +
        per-(tile, ch-unit, row-group) chunk bounds in prefetch layout
        ``[tile * n_cb + cu, h]`` (2-D so different (granularity, halves)
        splits can never alias to the same shape — the precomputed-table
        path validates shape at trace time)."""
        km = kmin.reshape(n_cb, rt, halves, ts_q // halves, zt,
                          TILE_LANE).min(axis=(3, 5))
        kM = kmax.reshape(n_cb, rt, halves, ts_q // halves, zt,
                          TILE_LANE).max(axis=(3, 5))
        ql, qh = quant(km, kM)
        on = jnp.isfinite(kM)
        act = on.any(axis=(0, 2))
        return (act.reshape(-1).astype(jnp.int32),
                ql.transpose(1, 3, 0, 2).reshape(-1, halves),
                qh.transpose(1, 3, 0, 2).reshape(-1, halves))

    def block_tables(per_block_intervals):
        """Stack per-(tile, transmit-block) bounds into the prefetch
        layout ``[tile * n_blocks + b]`` from (imin, imax, ok) tuples."""
        if n_blocks <= 1:
            return jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32)
        qblo_l, qbhi_l = [], []
        for imin_b, imax_b, ok_b in per_block_intervals:
            kb_min = jnp.where(ok_b, imin_b, np.inf).reshape(
                rt, ts_q, zt, TILE_LANE).min(axis=(1, 3))
            kb_max = jnp.where(ok_b, imax_b, -np.inf).reshape(
                rt, ts_q, zt, TILE_LANE).max(axis=(1, 3))
            qbl, qbh = quant(kb_min, kb_max)
            qblo_l.append(qbl)
            qbhi_l.append(qbh)
        return (jnp.stack(qblo_l, axis=-1).reshape(-1),
                jnp.stack(qbhi_l, axis=-1).reshape(-1))

    if st.family == "hercules":
        # Per-(tile, channel-unit) bounds: rx over the unit's element
        # interval, tx over the full element range (shared acq-0 transmit).
        xw = xdc[0, 0] * x + xdc[0, 1] * y + xdc[0, 2] * z + xdc[0, 3]
        yw = xdc[1, 0] * x + xdc[1, 1] * y + xdc[1, 2] * z + xdc[1, 3]
        zw = xdc[2, 0] * x + xdc[2, 1] * y + xdc[2, 2] * z + xdc[2, 3]
        rx_cols = scalars[_SC_RX_FLAG] > 0.5
        lat_rx = jnp.where(rx_cols, xw, yw)
        p_rx = jnp.where(rx_cols, pxp, pyp)
        lat_tx = jnp.where(rx_cols, yw, xw)
        p_tx = jnp.where(rx_cols, pyp, pxp)
        cuf = jnp.arange(n_cb, dtype=jnp.float32)[:, None, None]
        c0 = ch0 + cuf * np.float32(ch_block)
        c1 = jnp.minimum(c0 + np.float32(ch_block - 1), chn)
        rlo = jnp.minimum(c0 * p_rx, c1 * p_rx)
        rhi = jnp.maximum(c0 * p_rx, c1 * p_rx)
        e = t0_arr[:n_grid]
        elo, ehi = jnp.min(e) * p_tx, jnp.max(e) * p_tx
        rxmin, rxmax = interval_dist(lat_rx, rlo, rhi)   # (n_cb, ...)
        txmin, txmax = interval_dist(lat_tx, jnp.minimum(elo, ehi),
                                     jnp.maximum(elo, ehi))
        d2min = rxmin * rxmin + txmin * txmin
        d2max = rxmax * rxmax + txmax * txmax
        zw2 = zw * zw
        cone = jnp.where(fnum > 0,
                         d2min * (fnum * fnum) < 0.25 * zw2, True)
        txd = _rca_tx_distance_tile(x, y, z, scalars[_SC_TX_O],
                                    scalars[_SC_TX_ANGLE],
                                    scalars[_SC_TX_DEPTH])
        tx_index0 = (txd / sos + t0) * fs
        imin = tx_index0 + jnp.sqrt(zw2 + d2min) * (fs / sos)
        imax = tx_index0 + jnp.sqrt(zw2 + d2max) * (fs / sos)
        ok = cone & in_range & (imax >= s_lo) & (imin <= s_hi)
        act, qlo, qhi = unit_tables(jnp.where(ok, imin, np.inf),
                                    jnp.where(ok, imax, -np.inf))

        # per-(tile, transmit-block): full-channel rx interval + the
        # block's transmit-element interval
        def herc_blocks():
            rfmin, rfmax = interval_dist(
                lat_rx, jnp.minimum(ch0 * p_rx, chn * p_rx),
                jnp.maximum(ch0 * p_rx, chn * p_rx))
            for b in range(n_blocks):
                eb = t0_arr[b * tx_block:min((b + 1) * tx_block, n_grid)]
                eblo = jnp.min(eb) * p_tx
                ebhi = jnp.max(eb) * p_tx
                tbmin, tbmax = interval_dist(lat_tx,
                                             jnp.minimum(eblo, ebhi),
                                             jnp.maximum(eblo, ebhi))
                d2min_b = rfmin * rfmin + tbmin * tbmin
                d2max_b = rfmax * rfmax + tbmax * tbmax
                cone_b = jnp.where(fnum > 0,
                                   d2min_b * (fnum * fnum) < 0.25 * zw2,
                                   True)
                imin_b = tx_index0 + jnp.sqrt(zw2 + d2min_b) * (fs / sos)
                imax_b = tx_index0 + jnp.sqrt(zw2 + d2max_b) * (fs / sos)
                ok_b = (cone_b & in_range & (imax_b >= s_lo)
                        & (imin_b <= s_hi))
                yield imin_b, imax_b, ok_b
        qblo, qbhi = block_tables(herc_blocks())
        return act, qlo, qhi, qblo, qbhi

    if st.family == "forces":
        # Per-(tile, 8-channel-unit) bounds: rx distance over the unit's
        # channel interval, tx over the full element range (all acqs).
        cuf = jnp.arange(n_cb, dtype=jnp.float32)[:, None, None]
        c0 = ch0 + cuf * np.float32(ch_block)
        c1 = jnp.minimum(c0 + np.float32(ch_block - 1), chn)
        lo = jnp.minimum(c0 * pxp, c1 * pxp)
        hi = jnp.maximum(c0 * pxp, c1 * pxp)
        dmin, dmax = interval_dist(x, lo, hi)       # (n_cb, rows, lanes)
        cone = jnp.abs(fnum * dmin / z) < 0.5
        z2 = z * z
        rx_min = (jnp.sqrt(dmin * dmin + z2) / sos + t0) * fs
        rx_max = (jnp.sqrt(dmax * dmax + z2) / sos + t0) * fs
        ty = y - pyp * np.float32(st.channel_count / 2.0)
        e = t0_arr[:n_grid]             # element x positions
        elo, ehi = jnp.min(e), jnp.max(e)
        tdmin, tdmax = interval_dist(x, jnp.minimum(elo, ehi),
                                     jnp.maximum(elo, ehi))
        base2 = ty * ty + z2
        tx_min = jnp.sqrt(base2 + tdmin * tdmin) * (fs / sos)
        tx_max = jnp.sqrt(base2 + tdmax * tdmax) * (fs / sos)
        imin = rx_min + tx_min
        imax = rx_max + tx_max
        ok = cone & in_range & (imax >= s_lo) & (imin <= s_hi)
        act, qlo, qhi = unit_tables(jnp.where(ok, imin, np.inf),
                                    jnp.where(ok, imax, -np.inf))

        # per-(tile, transmit-block): rx over the full channel interval
        # (separable index = rx + tx), tx over the block's element range
        def forces_blocks():
            dfmin, dfmax = interval_dist(
                x, jnp.minimum(ch0 * pxp, chn * pxp),
                jnp.maximum(ch0 * pxp, chn * pxp))
            cone_f = jnp.abs(fnum * dfmin / z) < 0.5
            rx_min_f = (jnp.sqrt(dfmin * dfmin + z2) / sos + t0) * fs
            rx_max_f = (jnp.sqrt(dfmax * dfmax + z2) / sos + t0) * fs
            for b in range(n_blocks):
                eb = t0_arr[b * tx_block:min((b + 1) * tx_block, n_grid)]
                eblo, ebhi = jnp.min(eb), jnp.max(eb)
                tdbmin, tdbmax = interval_dist(x, jnp.minimum(eblo, ebhi),
                                               jnp.maximum(eblo, ebhi))
                tx_min_b = jnp.sqrt(base2 + tdbmin * tdbmin) * (fs / sos)
                tx_max_b = jnp.sqrt(base2 + tdbmax * tdbmax) * (fs / sos)
                imin_b = rx_min_f + tx_min_b
                imax_b = rx_max_f + tx_max_b
                ok_b = (cone_f & in_range & (imax_b >= s_lo)
                        & (imin_b <= s_hi))
                yield imin_b, imax_b, ok_b
        qblo, qbhi = block_tables(forces_blocks())
        return act, qlo, qhi, qblo, qbhi
    else:   # rca — also computes per-(tile, channel-unit) chunk bounds
        xw = xdc[0, 0] * x + xdc[0, 1] * y + xdc[0, 2] * z + xdc[0, 3]
        yw = xdc[1, 0] * x + xdc[1, 1] * y + xdc[1, 2] * z + xdc[1, 3]
        zw = xdc[2, 0] * x + xdc[2, 1] * y + xdc[2, 2] * z + xdc[2, 3]
        # channel-unit intervals (n_cb, 1, 1): unit cu covers channels
        # [ch0 + cu*cb, ch0 + cu*cb + cb - 1] (clamped)
        cuf = jnp.arange(n_cb, dtype=jnp.float32)[:, None, None]
        c0 = ch0 + cuf * np.float32(ch_block)
        c1 = jnp.minimum(c0 + np.float32(ch_block - 1), chn)
        kmin = jnp.full((n_cb,) + x.shape, np.inf, jnp.float32)
        kmax = jnp.full((n_cb,) + x.shape, -np.inf, jnp.float32)
        kminb = [None] * n_blocks          # per-(tile, transmit-block)
        kmaxb = [None] * n_blocks
        okb_any = [None] * n_blocks
        azw = jnp.abs(zw)
        zw2 = zw * zw
        for a in range(n_grid):
            packed = t0_arr[2 * a]
            tx_o = jnp.floor(packed / 16.0)
            rx_rows = (packed - tx_o * 16.0) == np.float32(1.0)
            lat = jnp.where(rx_rows, yw, xw)
            p = jnp.where(rx_rows, pyp, pxp)
            lo = jnp.minimum(c0 * p, c1 * p)
            hi = jnp.maximum(c0 * p, c1 * p)
            dmin, dmax = interval_dist(lat, lo, hi)
            cone = fnum * dmin / azw < 0.5
            rmin = jnp.sqrt(dmin * dmin + zw2)
            rmax = jnp.sqrt(dmax * dmax + zw2)
            txd = _rca_tx_distance_tile(x, y, z, tx_o, t0_arr[2 * a + 1],
                                        t1_arr[a])
            imin = ((txd + rmin) / sos + t0) * fs
            imax = ((txd + rmax) / sos + t0) * fs
            ok = cone & in_range & (imax >= s_lo) & (imin <= s_hi)
            kmin = jnp.minimum(kmin, jnp.where(ok, imin, np.inf))
            kmax = jnp.maximum(kmax, jnp.where(ok, imax, -np.inf))
            if n_blocks > 1:
                # block union over this acq, channels unioned (cu axis 0)
                b = a // tx_block
                imin_f = imin.min(axis=0)
                imax_f = imax.max(axis=0)
                ok_f = ok.any(axis=0)
                km = jnp.where(ok_f, imin_f, np.inf)
                kM = jnp.where(ok_f, imax_f, -np.inf)
                kminb[b] = km if kminb[b] is None else jnp.minimum(
                    kminb[b], km)
                kmaxb[b] = kM if kmaxb[b] is None else jnp.maximum(
                    kmaxb[b], kM)
                okb_any[b] = ok_f if okb_any[b] is None else (okb_any[b]
                                                              | ok_f)
        act, qlo, qhi = unit_tables(kmin, kmax)
        qblo, qbhi = block_tables(
            (kminb[b], kmaxb[b], okb_any[b]) for b in range(n_blocks)
        ) if n_blocks > 1 else (jnp.zeros(1, jnp.int32),
                                jnp.zeros(1, jnp.int32))
        return act, qlo, qhi, qblo, qbhi


@functools.lru_cache(maxsize=64)
def _das_call(st: DasStatic, n_acq_grid: int, n_rf_acq: int, interpret: bool):
    """Build the jitted pallas_call wrapper for a static configuration.

    ``n_acq_grid``: transmit grid extent (G*A for READI); ``n_rf_acq``: rf
    acquisitions actually fed to the kernel (A - sparse skip).
    """
    nx, ny, nz = st.output_points
    zt = _n_z_tiles(st)
    rt = _n_row_tiles(st)
    n_tiles = rt * zt
    s = st.sample_count
    s_pad = _cdiv(s, CHUNK) * CHUNK
    a = n_rf_acq

    # Transmit blocking: transmits per grid step (amortizes world points,
    # output traffic, and grid overhead).  With whole-step predicate
    # sharing, bigger blocks keep winning on multi-transmit configs (r3:
    # HERCULES 96^3 856 -> 507 ms at 16, FORCES-big 16.3 -> 13.7 ms at 8).
    # Several channels per grid step (each family's cached terms are
    # channel-independent); the bound-table units coincide with the blocks.
    # RCA takes 16 with the lateral-lanes layout (11.1 -> 10.4 ms headline;
    # the old 8 limit was register pressure under the axial layout) and 32
    # when packed-IQ halves the per-gather register footprint (6.48 ->
    # 6.10 ms; 32 with tile_sub=32 blows up to 18 ms, so only ch scales);
    # HERCULES/FORCES measured best at 8.  fb_mxu blocks are VMEM-budgeted
    # (see _block_geometry).
    tx_block, ch_block = _block_geometry(st, n_acq_grid)
    n_blocks = _cdiv(n_acq_grid, tx_block)
    a_pad = n_blocks * tx_block
    n_ch_grid = _cdiv(st.local_channels, ch_block)
    c_pad = n_ch_grid * ch_block
    # Bound tables at _ch_sub granularity (default = ch_block): n_sub
    # subgroup rows per grid step, indexed (tile*n_cb + ch*n_sub + sg).
    bounds_cb = _ch_sub(st, ch_block)
    n_cb_bounds = n_ch_grid * (ch_block // bounds_cb)

    # NOTE: last two block dims must equal the array dims (or be (8,128)
    # multiples): layout is (C, A, planes, S) with block (CB, TB, planes, S).
    mxu = _fb_mxu(st)
    packed = _pack_iq(st)
    hermite = _hermite(st)
    pairs_packed = _pack_pairs(st)
    pair_planes = _pair_iq(st)
    if mxu:
        # bf16 (hi, lo) planes per component, plane-major x frames so each
        # (comp, part) slice is a contiguous (B, S) MXU operand.
        n_planes = _mxu_planes(st)
    elif pair_planes:
        n_planes = (4 if st.interpolation_mode == InterpolationMode.Cubic
                    else 2)
    else:
        n_planes = (2 if (st.iq and not packed) or hermite else 1)
    B = st.frame_batch
    rf_block = (ch_block, tx_block, B * n_planes, s_pad)
    tg = _tile_grp(st)
    n_groups = (rt // tg) * zt
    kernel = functools.partial(_das_kernel, st, tx_block, ch_block,
                               n_cb_bounds, n_blocks, tg)

    ts = _tile_rows(st)
    if mxu:
        # Frames on the sublane axis of the *output* so the per-(pair,
        # chunk, row) accumulate is a contiguous (B, LANE) read-modify-
        # write (a (B, rows, lanes) layout would make it B strided
        # single-sublane updates); `trim` transposes back.
        out_shapes = [jax.ShapeDtypeStruct((rt * ts, B, zt * TILE_LANE),
                                           jnp.float32)] * 3
    elif B == 1:
        out_shapes = [jax.ShapeDtypeStruct((rt * ts, zt * TILE_LANE),
                                           jnp.float32)] * 3
    else:
        out_shapes = [jax.ShapeDtypeStruct((B, rt * ts, zt * TILE_LANE),
                                           jnp.float32)] * 3

    # rf is laid out per *grid* transmit index (READI duplication resolved
    # on host), so the block index is simply the transmit-block number.
    # Inactive tiles never read RF: collapse their block index to the
    # previous fetch target so the pipeline skips the HBM->VMEM copy
    # (consecutive identical block indices are not re-fetched).
    # Channels innermost so per-(tile, block) transmit planes cached at
    # ch == 0 stay valid for the whole channel sweep.
    grid = ((n_groups, n_blocks, n_ch_grid) if tg == 1
            else (n_groups, n_blocks, n_ch_grid, tg))
    if mxu:
        out_spec = pl.BlockSpec((tg * ts, B, TILE_LANE),
                                lambda i, b, c, *_: (i // zt, 0, i % zt),
                                memory_space=pltpu.VMEM)
    elif B == 1:
        out_spec = pl.BlockSpec((tg * ts, TILE_LANE),
                                lambda i, b, c, *_: (i // zt, i % zt),
                                memory_space=pltpu.VMEM)
    else:
        out_spec = pl.BlockSpec((B, tg * ts, TILE_LANE),
                                lambda i, b, c, *_: (0, i // zt, i % zt),
                                memory_space=pltpu.VMEM)

    if tg == 1:
        def rf_index(i, b, c, scalars, t0, t1, act, *_):
            if ABLATE.get("rf_pin"):  # timing-only: no per-step RF refetch
                return (0, 0, 0, 0)
            on = act[i] > 0
            return (jnp.where(on, c, 0), jnp.where(on, b, 0), 0, 0)
    else:
        def rf_index(i, b, c, g, scalars, t0, t1, act, *_):
            if ABLATE.get("rf_pin"):
                return (0, 0, 0, 0)
            # group-level any-active: a per-tile collapse would break the
            # consecutive-identical-index run that makes the g sweep
            # fetch-free, so the whole group shares one fetch decision.
            base = (i // zt) * (tg * zt) + (i % zt)
            on = act[base] > 0
            for gg in range(1, tg):
                on = on | (act[base + gg * zt] > 0)
            return (jnp.where(on, c, 0), jnp.where(on, b, 0), 0, 0)

    # shared-predicate batches need one accumulator slot per pair (batches
    # are additionally capped at one _ch_sub bound subgroup)
    n_slots = min(_pred_share(st, ch_block * tx_block),
                  ch_block * tx_block, bounds_cb * tx_block)
    while (bounds_cb * tx_block) % n_slots:
        n_slots -= 1
    if mxu:
        # No per-pair accumulators: the MXU path rotates each (pair,
        # chunk, row) matmul result immediately (rotation is linear over
        # the chunk sum) and accumulates straight into the output block.
        # The two minimal (8, LANE) buffers are never read or written —
        # placeholders so the shared kernel signature keeps its arity
        # (8 KB total).
        acc_shapes = [pltpu.VMEM((8, TILE_LANE), jnp.float32)] * 2
    else:
        acc_shapes = [
            pltpu.VMEM((n_slots, ts, TILE_LANE) if B == 1
                       else (B, n_slots, ts, TILE_LANE), jnp.float32),
            pltpu.VMEM((n_slots, ts, TILE_LANE) if B == 1
                       else (B, n_slots, ts, TILE_LANE), jnp.float32),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,    # scalars, geometry tables, tile flags,
                                  # per-(tile, ch-unit) + per-(tile,
                                  # tx-block) chunk bounds, line scales
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # voxel transform (4,4)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # xdc transform (4,4)
            pl.BlockSpec(rf_block, rf_index,
                         memory_space=pltpu.VMEM),   # one (c, a) RF line
        ],
        out_specs=[out_spec] * 3,
        scratch_shapes=acc_shapes + [
            # tile_grp: per-tile caches stack along the row (sublane)
            # axis — each tile of the group owns rows [g*ts, (g+1)*ts)
            pltpu.VMEM((5, tg * ts, TILE_LANE), jnp.float32),  # world+f2z
            pltpu.VMEM((5, tg * ts, TILE_LANE), jnp.float32),  # tile terms
            pltpu.VMEM((tx_block, tg * ts, TILE_LANE), jnp.float32),  # tx
        ],
    )

    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(grid)),
    )

    sparse = int(st.sparse) if st.family != "rca" else 0

    g_repeat = st.readi_group_count if st.readi_group_count > 1 else 1

    def pack_one(rf_used):
        """Pack ONE frame's (C, A_grid, S) RF into kernel planes.

        Returns ``(rf_planes (C, A, n_planes, S), lsc (C, A))``.  Batched
        configurations vmap this over the frame axis and interleave the
        per-frame planes frame-major along the plane dim (plane-major for
        fb_mxu, whose matmul operands are contiguous (B, S) slices)."""
        if mxu:
            # Exact bf16 (hi, lo) split of the f32 samples per component:
            # hi rounds to bf16, lo (the remainder, <= half a bf16 ulp)
            # is itself bf16-representable to ~2^-17 combined relative
            # error.  No quantization scale — lsc stays 1.
            if st.iq:
                comps = [jnp.real(rf_used).astype(jnp.float32),
                         jnp.imag(rf_used).astype(jnp.float32)]
            else:
                comps = [rf_used.astype(jnp.float32)]
            planes = []
            for carr in comps:
                hi = carr.astype(jnp.bfloat16)
                lo = (carr - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                planes += [hi, lo]
            rf_planes = jnp.stack(planes, axis=2)
            lsc = jnp.ones(rf_planes.shape[:2], jnp.float32)
            return rf_planes, lsc
        if st.iq and packed:
            # int16-pair packing: re<<16 | im&0xFFFF against the line peak.
            # The packed planes stay int32 end-to-end: carrying them
            # bitcast-as-f32 through XLA lets any value-semantic op
            # (concatenate, select, ...) canonicalize NaN patterns / flush
            # denormals — measured on this toolchain: concat of bitcast
            # words corrupts them (0.17 NRMSE), int ops never do.
            rf_re = jnp.real(rf_used)
            rf_im = jnp.imag(rf_used)
            peak = jnp.maximum(jnp.max(jnp.abs(rf_re), axis=-1),
                               jnp.max(jnp.abs(rf_im), axis=-1))
            qz = jnp.where(peak > 0, np.float32(32767.0) / peak, 0.0)
            lsc = jnp.where(peak > 0, peak / np.float32(32767.0), 0.0)
            ri = jnp.round(rf_re * qz[..., None]).astype(jnp.int32)
            ii = jnp.round(rf_im * qz[..., None]).astype(jnp.int32)
            if pair_planes:
                # consecutive-sample pairs per plane (see _pair_iq); the
                # trailing word's low half pads to 0 (cubic's valid mask
                # keeps k < S-2, so it is never a real tap).
                def pair(v):
                    nxt = jnp.pad(v[..., 1:], ((0, 0), (0, 0), (0, 1)))
                    return (v << 16) | (nxt & np.int32(0xFFFF))

                planes = [pair(ri), pair(ii)]
                if n_planes == 4:
                    m_re = jnp.pad(
                        (rf_re[..., 2:] - rf_re[..., :-2]) * 0.5,
                        ((0, 0), (0, 0), (1, 1)))
                    m_im = jnp.pad(
                        (rf_im[..., 2:] - rf_im[..., :-2]) * 0.5,
                        ((0, 0), (0, 0), (1, 1)))
                    mr = jnp.round(m_re * qz[..., None]).astype(jnp.int32)
                    mi = jnp.round(m_im * qz[..., None]).astype(jnp.int32)
                    planes += [pair(mr), pair(mi)]
                rf_planes = jnp.stack(planes, axis=2)
            else:
                words = (ri << 16) | (ii & np.int32(0xFFFF))
                rf_planes = words[:, :, None, :]
            if hermite:
                # plane 1: central-difference slope words, same line
                # scale.  |m| <= peak so the int16 range holds; edge
                # samples get m=0 (cubic's valid mask excludes them).
                m_re = jnp.pad((rf_re[..., 2:] - rf_re[..., :-2]) * 0.5,
                               ((0, 0), (0, 0), (1, 1)))
                m_im = jnp.pad((rf_im[..., 2:] - rf_im[..., :-2]) * 0.5,
                               ((0, 0), (0, 0), (1, 1)))
                mr = jnp.round(m_re * qz[..., None]).astype(jnp.int32)
                mi = jnp.round(m_im * qz[..., None]).astype(jnp.int32)
                words_m = (mr << 16) | (mi & np.int32(0xFFFF))
                rf_planes = jnp.concatenate(
                    [rf_planes, words_m[:, :, None, :]], axis=2)
        elif st.iq:
            rf_planes = jnp.stack(
                [jnp.real(rf_used), jnp.imag(rf_used)], axis=2)
            lsc = jnp.ones(rf_planes.shape[:2], jnp.float32)
        elif pairs_packed:
            # real RF as (p_k, p_{k+1}) int16-pair words (see _pack_pairs);
            # int32 end-to-end like the packed-IQ planes above
            rf32 = rf_used.astype(jnp.float32)
            peak = jnp.max(jnp.abs(rf32), axis=-1)
            qz = jnp.where(peak > 0, np.float32(32767.0) / peak, 0.0)
            lsc = jnp.where(peak > 0, peak / np.float32(32767.0), 0.0)
            pi = jnp.round(rf32 * qz[..., None]).astype(jnp.int32)
            nxt = jnp.pad(pi[..., 1:], ((0, 0), (0, 0), (0, 1)))
            rf_planes = ((pi << 16) | (nxt & np.int32(0xFFFF)))[:, :, None, :]
        else:
            rf_planes = rf_used.astype(jnp.float32)[:, :, None, :]
            lsc = jnp.ones(rf_planes.shape[:2], jnp.float32)
        return rf_planes, lsc

    def run(scalars, t0_arr, t1_arr, vt, xdc, rf, tables=None):
        # Complex handling stays inside jit: some TPU runtimes cannot
        # execute eager complex ops or transfer complex arrays.
        if B == 1:
            rf_used = rf[:, sparse:, :]
            if g_repeat > 1:
                # READI: grid transmit index e maps to rf acquisition
                # e % A — materialize the tiled layout so block specs
                # stay trivial.
                rf_used = jnp.tile(rf_used, (1, g_repeat, 1))
            rf_planes, lsc = pack_one(rf_used)
        else:
            rf_used = rf[:, :, sparse:, :]
            if g_repeat > 1:
                rf_used = jnp.tile(rf_used, (1, 1, g_repeat, 1))
            planes_b, lsc_b = jax.vmap(pack_one)(rf_used)
            bb, cc, aa, pp, ss = planes_b.shape
            if mxu:
                # (B, C, A, P, S) -> (C, A, P*B, S): PLANE-major (kernel
                # slices plane p's frames as rows [p*B, (p+1)*B)).
                rf_planes = planes_b.transpose(1, 2, 3, 0, 4).reshape(
                    cc, aa, pp * bb, ss)
            else:
                # frame-major plane interleave (kernel reads plane
                # fb*n_planes + p); lsc flattens (C, A, B) so index
                # (chv*a_pad + acq)*B + fb works.
                rf_planes = planes_b.transpose(1, 2, 0, 3, 4).reshape(
                    cc, aa, bb * pp, ss)
            lsc = lsc_b.transpose(1, 2, 0)
        pad_a = a_pad - rf_planes.shape[1]
        pad_c = c_pad - rf_planes.shape[0]
        if s_pad != s or pad_a or pad_c:
            # Zero-padded channels/transmits gather zeros -> contribute 0.
            rf_planes = jnp.pad(
                rf_planes, ((0, pad_c), (0, pad_a), (0, 0), (0, s_pad - s)))
        if pad_a or pad_c:
            lsc = jnp.pad(lsc, ((0, pad_c), (0, pad_a))
                          + ((0, 0),) * (lsc.ndim - 2))
        # Precomputed tables (das_activity_tables, refreshed on parameter
        # pushes) skip the in-frame table compute; a trace-time shape
        # mismatch (stale knob granularity, e.g. an ABLATE sweep without a
        # refresh) falls back to computing them in-frame — always correct,
        # just slower.
        want_q = (n_tiles * n_cb_bounds, _row_halves(st))
        want_b = (n_tiles * n_blocks if n_blocks > 1 else 1,)
        if (tables is not None and not ABLATE.get("no_bounds")
                and tables[1].shape == want_q
                and tables[3].shape == want_b):
            act, qlo, qhi, qblo, qbhi = tables
        else:
            act, qlo, qhi, qblo, qbhi = _tile_activity(
                st, scalars, t0_arr, t1_arr, vt, xdc, n_acq_grid,
                n_cb=n_cb_bounds, ch_block=bounds_cb, tx_block=tx_block,
                halves=_row_halves(st))
        # Scalar-prefetch operands must be 1-D: the TPU compiler lane-pads
        # 2-D SMEM arrays x128 (a (2048, 1) bound table would take 1 MB of
        # the 1 MB SMEM budget).  Tables stay 2-D at the API level so the
        # shape check above still distinguishes granularity splits.
        out_re, out_im, out_in = fn(scalars, t0_arr, t1_arr, act,
                                    qlo.reshape(-1), qhi.reshape(-1),
                                    qblo, qbhi, lsc.reshape(-1),
                                    vt, xdc, rf_planes)
        n_rows, n_lanes = _axes(st)

        def trim(o):
            if mxu:
                # (rows, B, lanes) kernel layout -> (B, rows, lanes)
                o = o.transpose(1, 0, 2)
            if B > 1:
                o = o[:, :n_rows, :n_lanes]
                if nz > 1:      # rows = (x, z), lanes = y
                    return o.reshape(B, nx, nz, ny).transpose(0, 1, 3, 2)
                if _lat_lanes(st):  # rows = y (axial), lanes = x (lateral)
                    return o.transpose(0, 2, 1).reshape(B, nx, ny, nz)
                return o.reshape(B, nx, ny, nz)
            o = o[:n_rows, :n_lanes]
            if nz > 1:      # rows = (x, z), lanes = y
                return o.reshape(nx, nz, ny).transpose(0, 2, 1)
            if _lat_lanes(st):  # rows = y (axial), lanes = x (lateral)
                return o.T.reshape(nx, ny, nz)
            return o.reshape(nx, ny, nz)
        res = (jax.lax.complex(trim(out_re), trim(out_im))
               if st.iq else trim(out_re))
        if st.coherency_weighting:
            return res, trim(out_in)
        return res

    return jax.jit(run)


def _prep_scalars(dyn: dict, st: DasStatic):
    """Scalar vector + per-transmit geometry tables from the traced
    parameter dict.  Returns ``(scalars, t0_arr, t1_arr, n_grid, n_rf)``
    (shared by the frame path and :func:`das_activity_tables`)."""
    family = st.family
    a = st.acquisition_count
    sparse = int(st.sparse) if family != "rca" else 0

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
        _SC_X0: dyn.get("x_offset", 0),
    }

    if family == "rca":
        orient = dyn["orientations"].astype(jnp.float32)
        t0_arr = jnp.stack([orient, dyn["focal_vectors"][:, 0]],
                           axis=-1).reshape(-1)     # interleaved (2A,)
        t1_arr = dyn["focal_vectors"][:, 1]
        n_grid = a
        n_rf = a
    else:
        vals[_SC_TX_O] = jnp.floor(
            dyn["orientations"][0] / 16).astype(jnp.float32)
        rx_o = (dyn["orientations"][0] & 0xF).astype(jnp.float32)
        vals[_SC_RX_FLAG] = (rx_o == 2).astype(jnp.float32)   # Columns
        vals[_SC_TX_ANGLE] = dyn["focal_vectors"][0, 0]
        vals[_SC_TX_DEPTH] = dyn["focal_vectors"][0, 1]

        if st.readi_group_count > 1:
            g = st.readi_group_count
            elements = jnp.arange(g * a, dtype=jnp.float32)
            t1_arr = jnp.repeat(dyn["hadamard_row"][:g], a)
            tx_ch = elements
            n_grid = g * a
            n_rf = a
        else:
            n = a - sparse
            if st.sparse:
                tx_ch = dyn["sparse_elements"][:n].astype(jnp.float32)
            else:
                tx_ch = jnp.arange(sparse, a, dtype=jnp.float32)
            t1_arr = jnp.ones(n, jnp.float32)
            if family == "hercules" and not st.sparse:
                # first-transmit 1/sqrt(N) weight (das.glsl:271-273)
                t1_arr = t1_arr.at[0].set(np.float32(1.0 / np.sqrt(a)))
            n_grid = n
            n_rf = n

        if family == "forces":
            t0_arr = tx_ch * dyn["xdc_element_pitch"][0]
        else:
            t0_arr = tx_ch

    for k_, v_ in vals.items():
        scalars = scalars.at[k_].set(jnp.asarray(v_, jnp.float32))

    # Pad per-transmit tables to the blocked grid extent with zero weights
    # (padded transmits contribute nothing).
    tx_block = min(_knob(st, "tx_block", _TXB.get(st.family, 4)), n_grid)
    a_pad = _cdiv(n_grid, tx_block) * tx_block
    extra = a_pad - n_grid
    if extra:
        if family == "rca":
            t0_arr = jnp.concatenate(
                [t0_arr, jnp.zeros(2 * extra, jnp.float32)])
            t1_arr = jnp.concatenate(
                [t1_arr, jnp.full(extra, jnp.inf, jnp.float32)])
        else:
            t0_arr = jnp.concatenate([t0_arr, jnp.zeros(extra, jnp.float32)])
            t1_arr = jnp.concatenate([t1_arr, jnp.zeros(extra, jnp.float32)])

    return scalars, t0_arr, t1_arr, n_grid, n_rf


def das_pallas(rf, dyn: dict, st: DasStatic, interpret: bool = False):
    """Pallas DAS dispatch for all acquisition families.  ``rf``: (C, A, S),
    or (B, C, A, S) with ``st.frame_batch == B > 1`` (returns (B, ...)
    volumes; the per-pair geometry/delay work is shared across frames).

    Matches :func:`..ops.golden.das` / :func:`..ops.das.das`.  When
    ``dyn['das_tables']`` is present (see :func:`das_activity_tables`) the
    precomputed activity/chunk-bound tables are used instead of computing
    them inside the frame — the executor refreshes them on every parameter
    push, mirroring the reference's plan-commit-time dispatch layout work
    (beamformer_core.c:1008-1120).

    Batched frames run the proven single-frame kernel sequentially under
    ``lax.map`` by default (one device program; host dispatch and upload
    amortize across the batch).  The geometry-sharing packed kernel —
    one index/weight computation gathering all B planes — is behind the
    ``fb_pack`` knob: the v5e hardware A/B (experiments/frame_batch_ab.py)
    measured it at 12.4-13.9 ms/frame vs 5.8 mapped on the headline — the
    B-times accumulator scratch and RF block blow VMEM/register budgets
    past what the shared geometry saves.  The ``fb_mxu`` knob instead runs
    the one-hot MXU kernel (zero gathers — banded weight matrices from
    iota compares, contracted against the frame batch; see :func:`_fb_mxu`)
    for offline cine-loop batch sizes.  Autotune sweeps all three forms.
    """
    st1 = das_table_static(st)
    if st1 is not st:
        return jax.lax.map(
            lambda f: das_pallas(f, dyn, st1, interpret), rf)
    scalars, t0_arr, t1_arr, n_grid, n_rf = _prep_scalars(dyn, st)
    fn = _das_call(st, n_grid, n_rf, interpret)
    return fn(scalars, t0_arr, t1_arr,
              dyn["voxel_transform"], dyn["xdc_transform"], rf,
              dyn.get("das_tables"))


def das_table_static(st: DasStatic) -> DasStatic:
    """The static configuration :func:`das_activity_tables` must be keyed to
    for ``st`` to *use* the tables.

    Single source of truth for the batched-dispatch rule: frame-batched
    launches without ``fb_pack`` run the single-frame kernel under
    ``lax.map``, whose trace checks table shapes against the
    ``frame_batch=1`` knob key — tables keyed to the batched static would
    be silently discarded and recomputed in-frame B times per launch.
    Used by the dispatcher, ``build_plan``, ``bench.py`` and
    :func:`autotune_das`.
    """
    if (st.frame_batch > 1 and not _knob(st, "fb_pack", 0)
            and not _fb_mxu(st)):
        import dataclasses as _dc
        return _dc.replace(st, frame_batch=1)
    return st


def das_activity_tables(dyn: dict, st: DasStatic):
    """Precompute the per-tile activity flags and prefetched chunk-bound
    tables for this (static config, traced parameters) pair.

    The tables are pure functions of the traced geometry (f-number, speed
    of sound, transforms, ...) — they only change when parameters change,
    not per frame, so steady-state frames can skip the in-jit table
    compute (~0.1-1 ms depending on grid/units).  Pass the result as
    ``dyn['das_tables']``; anything that edits traced das parameters must
    refresh it (build_plan does).  Shapes are checked against the current
    knob configuration at trace time — a stale-granularity table is
    ignored and recomputed in-frame (correct, just slower), so knob
    sweeps without a refresh stay valid.  The bound tables are 2-D
    (units, row-groups) precisely so different granularity splits can
    never alias to the same shape."""
    scalars, t0_arr, t1_arr, n_grid, n_rf = _prep_scalars(dyn, st)
    tx_block, ch_block = _block_geometry(st, n_grid)
    bounds_cb = _ch_sub(st, ch_block)
    n_cb_bounds = _cdiv(st.local_channels, ch_block) * (ch_block // bounds_cb)
    fn = jax.jit(functools.partial(
        _tile_activity, st, n_grid=n_grid, n_cb=n_cb_bounds,
        ch_block=bounds_cb, tx_block=tx_block, halves=_row_halves(st)))
    return tuple(fn(scalars, t0_arr, t1_arr,
                    jnp.asarray(dyn["voxel_transform"]),
                    jnp.asarray(dyn["xdc_transform"])))


# Backwards-compatible alias
def das_forces_pallas(rf, dyn, st, interpret: bool = False):
    return das_pallas(rf, dyn, st, interpret)


# ---------------------------------------------------------------------------
# Per-configuration autotune
# ---------------------------------------------------------------------------

def _default_candidates(st: DasStatic):
    if st.frame_batch > 1:
        # Default {} is lax.map over the single-frame kernel (the v5e
        # winner vs fb_pack: 5.8 vs 12.4+ ms/frame packed).  fb_pack=1
        # candidates cover the geometry-sharing packed gather kernel;
        # fb_mxu=1 the one-hot MXU kernel (pays at cine batch sizes,
        # B >= 32 — mxu candidates only join when the batch qualifies).
        mxu_ok = st.frame_batch % 16 == 0 and not st.coherency_weighting
        # mxu_exact=0 is NOT a candidate: bf16-degraded weights measure
        # 1.78e-3 NRMSE on cubic IQ — outside the 1e-3 golden contract
        # (tests/test_das_pallas.py::test_frame_batch_mxu_inexact_weights).
        mxu_c = ([{"fb_mxu": 1},
                  {"fb_mxu": 1, "mxu_rf_mb": 2},
                  {"fb_mxu": 1, "mxu_rf_mb": 8},
                  {"fb_mxu": 1, "tile_sub": 8}] if mxu_ok else [])
        if st.family == "rca":
            return [{}, {"fb_pack": 1}, {"fb_pack": 1, "ch_block": 16},
                    {"fb_pack": 1, "ch_block": 8},
                    {"fb_pack": 1, "ch_block": 8, "pred_share": 8},
                    {"fb_pack": 1, "tile_sub": 32},
                    {"fb_pack": 1, "hermite": 0}] + mxu_c
        return [{}, {"fb_pack": 1}, {"fb_pack": 1, "ch_block": 4},
                {"fb_pack": 1, "ch_block": 16}, {"fb_pack": 1, "tx_block": 8},
                {"fb_pack": 1, "tx_block": 8, "ch_block": 4},
                {"fb_pack": 1, "pred_share": 8},
                {"fb_pack": 1, "pack_pairs": 0}] + mxu_c + (
                    [{"fb_mxu": 1, "tx_block": 2},
                     {"fb_mxu": 1, "tx_block": 8}] if mxu_ok else [])
    if st.family == "rca":
        return [{}, {"group": 2}, {"ch_block": 8, "pred_share": 8},
                {"ch_block": 16}, {"ch_block": 32},
                {"lat_lanes": 0}, {"tile_sub": 32}, {"row_halves": 2},
                {"hermite": 0}, {"hermite": 1, "ch_block": 16},
                {"ch_sub": 8}, {"ch_sub": 16}, {"ch_sub": 8, "row_halves": 2}]
    # Round-4 floor decomposition (PERFORMANCE.md): the 3D volumes spend
    # ~1/3 of their time in fixed per-grid-step cost — bigger channel/
    # transmit blocks (fewer steps) are the closing lever there, where
    # 2D configs measured best at small blocks.  Over-VMEM candidates
    # fail to compile and are skipped by autotune.
    volume = sum(d > 1 for d in st.output_points) == 3
    if st.family == "hercules":
        return [{}, {"group": 2}, {"pred_share": 8}, {"ch_block": 16},
                {"tile_sub": 16}, {"tx_block": 8}, {"row_halves": 1},
                {"pack_pairs": 0}, {"pack_pairs": 0, "tx_block": 8},
                {"pair_iq": 1}, {"ch_sub": 4}] + ([
                    {"ch_block": 32}, {"tx_block": 32},
                    {"ch_block": 16, "tx_block": 32},
                    {"ch_block": 32, "tx_block": 32},
                    {"ch_block": 16, "tile_sub": 32},
                    {"tile_sub": 16, "tx_block": 8},
                    {"tile_sub": 16, "ch_sub": 4},
                    {"tile_sub": 8},
                    # round-5: tile-grouped RF sweeps (the fixed-cost lever)
                    {"tile_grp": 4}, {"tile_grp": 8},
                    {"tile_grp": 8, "ch_block": 16}] if volume else [])
    return [{}, {"group": 2}, {"pred_share": 8}, {"ch_block": 16},
            {"tile_sub": 32}, {"tx_block": 8},
            {"tx_block": 8, "pred_share": 64}, {"row_halves": 2},
            {"pack_pairs": 0}, {"pack_pairs": 0, "tx_block": 8},
            {"pair_iq": 1}, {"pair_iq": 1, "ch_block": 16},
            {"ch_sub": 4}] + ([
                {"tx_block": 16}, {"tx_block": 32}, {"ch_block": 32},
                {"ch_block": 16, "tx_block": 16},
                {"tx_block": 16, "pred_share": 64},
                # round-4 uforces follow-up: tx_block response was monotone
                # 8 -> 16 -> 32 (563/535/524 ms), so probe past it and its
                # combos (A=63 pads to one 64-transmit block)
                {"tx_block": 64}, {"ch_block": 16, "tx_block": 32},
                {"tx_block": 32, "pred_share": 64},
                {"tx_block": 32, "tile_sub": 32},
                # round-5: tile-grouped RF sweeps (the fixed-cost lever)
                {"tile_grp": 4, "tx_block": 32},
                {"tile_grp": 8, "tx_block": 32}] if volume else []) + ([
                    # IQ baseband (demod-chain DAS): rotation/packing
                    # structure knobs the real-RF sweep never exercises
                    {"pack_iq": 0}, {"hermite": 0},
                    {"hermite": 0, "ch_block": 16},
                    {"ch_block": 16, "tx_block": 8}] if st.iq else [])


def autotune_das(rf, dyn: dict, st: DasStatic, candidates=None,
                 iters: int = 4, warmup: int = 1, save_path=None,
                 passes: int = 2, verbose: bool = False):
    """Measure knob combinations for this configuration on the current
    device and install the fastest in :data:`TUNED` (used by every later
    trace of the same descriptor).  The reference tunes its dispatch
    layouts per-GPU at build time (build.c); here the knob space is the
    Mosaic kernel structure, so tuning is a runtime measurement.

    Returns ``(best_knobs, {repr(knobs): seconds})``.  Clears the DAS jit
    caches while running — intended as an explicit setup step, not a
    hot-path call.  ``save_path`` persists the whole TUNED table as JSON
    (reload with :func:`load_tuned`).

    ``passes`` runs the whole candidate sweep that many times and ranks
    per-candidate *minima*: the tunneled dev attach degrades for minutes
    at a time (3.5x inflation observed mid-sweep), and a single pass in
    such a window pins whichever candidate happened to run while the
    tunnel was healthy.
    """
    import time as _time

    from ..utils.transfer import sync
    from .das import das_jit

    if candidates is None:
        candidates = _default_candidates(st)
    key = _tune_key(st)
    results = {}
    for _ in range(max(1, passes)):
        for knobs in candidates:
            if results.get(repr(knobs), "miss") is None:
                continue           # failed to compile on an earlier pass
            TUNED[key] = dict(knobs)
            _das_call.cache_clear()
            das_jit.clear_cache()
            try:
                # measure the deployment configuration: tables precomputed
                # under this candidate's knobs and keyed to the form that
                # will actually run (build_plan does the same)
                dyn_c = dict(dyn)
                dyn_c["das_tables"] = das_activity_tables(
                    dyn_c, das_table_static(st))
                for _ in range(warmup):
                    sync(das_jit(rf, dyn_c, st))
                t0 = _time.perf_counter()
                for _ in range(iters):
                    out = das_jit(rf, dyn_c, st)
                sync(out)
                dt = (_time.perf_counter() - t0) / iters
            except Exception as e:     # a candidate may not compile
                TUNED.pop(key, None)
                results[repr(knobs)] = None
                if verbose:
                    print(f"[autotune] {knobs}: FAIL "
                          f"{type(e).__name__}: {str(e)[:200]}", flush=True)
                continue
            prev = results.get(repr(knobs))
            results[repr(knobs)] = dt if prev is None or not isinstance(
                prev, float) else min(prev, dt)
            if verbose:
                # per-candidate progress: cold Mosaic compiles run minutes
                # each on the tunneled attach, and a timed-out sweep that
                # printed nothing loses everything it measured (round 5).
                print(f"[autotune] {knobs}: {dt * 1e3:.3f} ms", flush=True)
    best = None
    best_t = np.inf
    for knobs in candidates:
        dt = results.get(repr(knobs))
        if isinstance(dt, float) and dt < best_t:
            best_t, best = dt, dict(knobs)
    TUNED[key] = best or {}
    _das_call.cache_clear()
    das_jit.clear_cache()
    if save_path is not None:
        save_tuned(save_path)
    return best or {}, results


def save_tuned(path):
    """Persist :data:`TUNED` as JSON (descriptor keys stringified)."""
    import json
    with open(path, "w") as f:
        json.dump([{"key": list(k), "knobs": v} for k, v in TUNED.items()],
                  f, indent=1)


def load_tuned(path):
    """Load a :func:`save_tuned` table; later plans pick the entries up."""
    import json

    from .das import das_jit
    with open(path) as f:
        for row in json.load(f):
            k = row["key"]
            TUNED[(k[0], k[1], k[2], k[3], k[4], k[5], tuple(k[6]))] = \
                row["knobs"]
    _das_call.cache_clear()
    das_jit.clear_cache()    # already-traced configs must re-trace
