"""Fused Pallas demodulate kernel (SURVEY §7.4, filter.glsl:57-118).

One kernel does what the reference's ``Demodulate`` shader mode does with
workgroup shared memory (filter.glsl:66-111): implicit-IQ pairing of
consecutive RF samples, baseband rotation by ``exp(-j 2 pi f_d n /
(fs/2))`` with the sqrt(2) scale, and the tap-unrolled FIR — in a single
pass over VMEM-resident rows.

**Measured verdict (round 4): NOT the default.**  Per-op device traces
(experiments/demod_device_split.py) put this kernel at 0.482 ms vs
0.196 ms for the XLA tap-unrolled path on the demod-chain stage shape
(C=128 A=16 S=2048, 16 taps) — XLA fuses the shift-FMA chain into one
elementwise kernel near HBM rate, while this kernel's grid/windowing
overhead does not amortize at 16 taps.  The ~1.8 ms "XLA stage cost" that
motivated it was a wall-clock reading under the tunnel's ~0.65 ms
dispatch floor.  Kept as the ``filtering.DEMOD_PALLAS = True`` opt-in and
as the fusion vehicle for any future longer-tap / multi-stage variant.

TPU mapping (the same lessons as ops/das_pallas.py / ops/decode.py):

* The (channel, acquisition) row pair collapses onto sublanes; samples go
  on lanes.  The grid is 1-D over row blocks — every load address is
  static, nothing is gathered.
* The I/Q pair (two adjacent int16 samples) is ONE int32 word — the RF is
  bitcast outside the kernel so each pair costs a single aligned load and
  a 2-shift unpack on the superscalar VPU slots (the packed-IQ move from
  das_pallas, applied at the other end of the chain).
* Rotation phasors are precomputed per padded sample index outside the
  kernel (they depend on traced f_demod/fs but not on the data) and ride
  in as two (1, M) rows broadcast across the block.
* The FIR is an unrolled loop of L static lane-shifted slices — the VMEM
  ring of ``D*block + L - 1`` samples from filter.glsl:66-111 becomes "the
  whole padded row is VMEM-resident", because a 2048-sample row is 8
  vregs, not a workgroup budget.
* Taps arrive via scalar prefetch (SMEM): each tap multiply is a pure
  scalar read, no vector->scalar stall (CLAUDE.md Mosaic facts).

Scope: int16 interleaved RF, real taps, decimation_rate == 1 (the
standard Kaiser-LPF demodulation the presets configure).  f32 input,
complex (chirp-matched) taps, and extra decimation fall back to the XLA
path in ops/filtering.py — those variants change the FIR, not the
pairing, and are off the hot loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(taps_ref, words_ref, cos_ref, sin_ref, out_re_ref, out_im_ref,
            *, length: int, n_out: int):
    w = words_ref[...]
    # unpack the (q<<16)|i pair word (little-endian int16 pairs)
    i_f = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(w, 16), 16).astype(jnp.float32)
    q_f = jax.lax.shift_right_arithmetic(w, 16).astype(jnp.float32)
    c = cos_ref[...]        # (1, M) — sqrt(2)-scaled cos(w n)
    s = sin_ref[...]        # (1, M) — sqrt(2)-scaled sin(w n)
    # (i - j q) * (cos - j sin) * scale   (golden.demodulate:104-113)
    re = i_f * c - q_f * s
    im = -(q_f * c) - i_f * s
    acc_re = taps_ref[0] * re[:, 0:n_out]
    acc_im = taps_ref[0] * im[:, 0:n_out]
    for j in range(1, length):
        h = taps_ref[j]
        acc_re = acc_re + h * re[:, j:j + n_out]
        acc_im = acc_im + h * im[:, j:j + n_out]
    out_re_ref[...] = acc_re
    out_im_ref[...] = acc_im


@functools.lru_cache(maxsize=64)
def _call(rows: int, m: int, length: int, n_out: int, row_block: int,
          interpret: bool):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,            # taps (L,) f32
        grid=(rows // row_block,),
        in_specs=[
            pl.BlockSpec((row_block, m), lambda i, _: (i, 0)),  # pair words
            pl.BlockSpec((1, m), lambda i, _: (0, 0)),          # cos
            pl.BlockSpec((1, m), lambda i, _: (0, 0)),          # sin
        ],
        out_specs=[
            pl.BlockSpec((row_block, n_out), lambda i, _: (i, 0)),
            pl.BlockSpec((row_block, n_out), lambda i, _: (i, 0)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, length=length, n_out=n_out),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((rows, n_out), jnp.float32),
                   jax.ShapeDtypeStruct((rows, n_out), jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )


def _pick_row_block(rows: int, want: int = 64) -> int:
    """Rows per grid step: biggest power-of-two divisor <= ``want`` —
    fewer grid steps amortize per-step overhead; the blocks stay well
    under VMEM (64 x ~2k samples x 4 B x 5 arrays ~ 2.5 MB)."""
    for rb in (want, 32, 16, 8, 4, 2, 1):
        if rb <= want and rows % rb == 0:
            return rb
    return 1


def _fir_kernel(taps_ref, *refs, length: int, n_out: int, cx_x: bool,
                cx_h: bool):
    """Generalized tap-unrolled FIR: the reference filter shader's
    ComplexFilter mode (filter.glsl:114-118 with complex_mul) plus the
    plain real mode, selected by trace-time flags.  ``taps_ref`` holds
    [h_re | h_im] (im half only when cx_h)."""
    xr_ref = refs[0]
    xi_ref = refs[1] if cx_x else None
    out_refs = refs[1 + cx_x:]
    xr = xr_ref[...]
    xi = xi_ref[...] if cx_x else None
    acc_re = acc_im = None

    def add(a, t):
        return t if a is None else a + t

    for j in range(length):
        hr = taps_ref[j]
        sr = xr[:, j:j + n_out]
        acc_re = add(acc_re, hr * sr)
        si = xi[:, j:j + n_out] if cx_x else None
        if cx_x:
            acc_im = add(acc_im, hr * si)
        if cx_h:
            hi = taps_ref[length + j]
            acc_im = add(acc_im, hi * sr)
            if cx_x:
                acc_re = acc_re - hi * si
    out_refs[0][...] = acc_re
    if cx_x or cx_h:
        out_refs[1][...] = acc_im


@functools.lru_cache(maxsize=64)
def _fir_call(rows: int, m: int, length: int, n_out: int, row_block: int,
              cx_x: bool, cx_h: bool, interpret: bool):
    n_in = 1 + cx_x
    n_out_arrays = 1 + (cx_x or cx_h)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,            # [h_re | h_im] f32
        grid=(rows // row_block,),
        in_specs=[pl.BlockSpec((row_block, m), lambda i, _: (i, 0))] * n_in,
        out_specs=[pl.BlockSpec((row_block, n_out),
                                lambda i, _: (i, 0))] * n_out_arrays,
    )
    return pl.pallas_call(
        functools.partial(_fir_kernel, length=length, n_out=n_out,
                          cx_x=cx_x, cx_h=cx_h),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((rows, n_out), jnp.float32)
                   ] * n_out_arrays,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )


def fir_pallas(x: jax.Array, taps: jax.Array, *,
               interpret: bool = False) -> jax.Array:
    """Unit-stride FIR along the last axis, real or complex data/taps,
    identical alignment to :func:`..ops.filtering.fir_filter` with
    ``decimation_rate=1`` (L-1 left zeros).  The Filter-stage counterpart
    of :func:`demodulate_pallas`."""
    cx_x = jnp.iscomplexobj(x)
    cx_h = jnp.iscomplexobj(taps)
    length = taps.shape[0]
    s = x.shape[-1]
    lead = x.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    m = s + length - 1

    def prep(comp):
        return jnp.pad(comp.astype(jnp.float32).reshape(rows, s),
                       ((0, 0), (length - 1, 0)))

    ins = [prep(x.real), prep(x.imag)] if cx_x else [prep(x)]
    h = taps.astype(jnp.complex64 if cx_h else jnp.float32)
    hcat = (jnp.concatenate([h.real.astype(jnp.float32),
                             h.imag.astype(jnp.float32)])
            if cx_h else h.astype(jnp.float32))

    rb = _pick_row_block(rows)
    outs = _fir_call(rows, m, length, s, rb, cx_x, cx_h, interpret)(
        hcat, *ins)
    if cx_x or cx_h:
        return jax.lax.complex(outs[0], outs[1]).reshape(lead + (s,))
    return outs[0].reshape(lead + (s,))


def demodulate_pallas(rf: jax.Array, taps: jax.Array,
                      demodulation_frequency, sampling_frequency,
                      *, interpret: bool = False) -> jax.Array:
    """Fused pairing + rotation + FIR for int16 RF, real taps, D == 1.

    ``rf``: (..., S) int16.  Returns complex64 (..., S // 2), identical to
    :func:`..ops.golden.demodulate` with ``decimation_rate=1,
    complex_filter=False``.
    """
    assert rf.dtype == jnp.int16 and not jnp.iscomplexobj(taps)
    length = taps.shape[0]
    s_pairs = rf.shape[-1] // 2
    lead = rf.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    m = s_pairs + length - 1

    x = rf[..., : 2 * s_pairs].reshape(rows, 2 * s_pairs)
    # L-1 zero PAIRS on the left = the conv path's (L-1) left pad
    xp = jnp.pad(x, ((0, 0), (2 * (length - 1), 0)))
    words = jax.lax.bitcast_convert_type(
        xp.reshape(rows, m, 2), jnp.int32)

    # rotation phasor per PADDED pair index: column k is pair n = k-(L-1);
    # the pad region multiplies zeros, any phase is fine there.
    n = jnp.arange(m, dtype=jnp.float32) - jnp.float32(length - 1)
    # frequencies are traced (plan.dyn): asarray, not the np scalar ctor
    fd = jnp.asarray(demodulation_frequency, jnp.float32)
    fs = jnp.asarray(sampling_frequency, jnp.float32)
    arg = (2 * jnp.pi * fd / (fs / 2.0)) * n
    scale = jnp.float32(np.sqrt(2.0))
    cosr = (scale * jnp.cos(arg)).reshape(1, m)
    sinr = (scale * jnp.sin(arg)).reshape(1, m)

    rb = _pick_row_block(rows)
    re, im = _call(rows, m, length, s_pairs, rb, interpret)(
        taps.astype(jnp.float32), words, cosr, sinr)
    return jax.lax.complex(re, im).reshape(lead + (s_pairs,))
