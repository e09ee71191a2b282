"""Hadamard decode on TPU.

The reference's fastest decode path is a cooperative-matrix (tensor-core)
matmul (decode.glsl:76-117); on TPU decode *is* a plain MXU matmul over the
acquisition axis — ``out[c, t, s] = sum_j H[t, j] rf[c, j, s] / T`` — so the
default implementation is a single ``dot_general`` the XLA compiler tiles
onto the 128x128 systolic array.  A Pallas variant fuses the int16->float
conversion and the 1/T scale for the bandwidth-bound small-T cases.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.hadamard import hadamard as _hadamard_host


def hadamard_matrix(order: int, dtype=jnp.float32) -> jax.Array:
    """Device Hadamard matrix H (row-major, untransposed)."""
    return jnp.asarray(_hadamard_host(order), dtype=dtype)


@partial(jax.jit, static_argnames=("precision",))
def decode_hadamard(rf: jax.Array, hadamard: jax.Array,
                    precision: str = "high") -> jax.Array:
    """Decode ``rf`` (C, A, S) with ``hadamard`` (A, A).

    Matches :func:`ogl_beamforming_tpu.ops.golden.decode_hadamard`
    (decode.glsl:120-150).  Complex input decodes re/im with the same matmul.
    Accumulation is always f32 (``preferred_element_type``), mirroring the
    reference's f16-storage/f32-accumulate coop-matrix path.  The default
    ``high`` precision (3-pass bf16 on the MXU) keeps int16-range inputs at
    ~1e-7 relative error (verified on hardware) at ~2x the throughput of
    ``highest``.
    """
    if precision == "high" and _use_pallas_decode(rf):
        return decode_hadamard_pallas(rf, hadamard)

    a = rf.shape[1]
    scale = jnp.float32(1.0 / a)

    def mm(x):
        # (C, A, S) x (A, A) contracting axis 1 with H[t, j] -> (C, S, A)
        y = jax.lax.dot_general(
            x, hadamard,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision[precision.upper()],
        )  # (C, S, A_out)
        return y.transpose(0, 2, 1) * scale

    if jnp.iscomplexobj(rf):
        return (mm(rf.real.astype(jnp.float32))
                + 1j * mm(rf.imag.astype(jnp.float32))).astype(jnp.complex64)
    return mm(rf.astype(jnp.float32))


def decode_hadamard_ref(rf, hadamard):
    """Unjitted version for composition inside larger jitted pipelines."""
    return decode_hadamard.__wrapped__(rf, hadamard, precision="high")


# ---------------------------------------------------------------------------
# Fused Pallas decode: int16 -> split-bf16 MXU matmul, direct (C, A, S) out
# ---------------------------------------------------------------------------
#
# The XLA path materializes an f32 copy of the input, the (C, S, A) matmul
# result, AND a transposed (C, A, S) output — ~6 GB of HBM traffic for the
# T=256 sweep point (0.54 GB of input).  This kernel reads int16, splits it
# into two bf16 planes (hi + lo is *exact* for int16 range: hi rounds to 8
# mantissa bits, the residual |lo| <= 2^7 is integer-exact in bf16), runs two
# MXU passes against the (+-1-exact) bf16 Hadamard, and writes (C, A, S)
# f32 directly with the 1/T scale folded in — the TPU equivalent of the
# reference's one-pass coop-matrix decode (decode.glsl:76-117).

def _decode_kernel(scale, h_ref, rf_ref, out_ref):
    x = rf_ref[0].astype(jnp.float32)                 # (A, BS)
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    h = h_ref[:]                                      # (A, A) bf16
    dn = (((1,), (0,)), ((), ()))
    acc = jax.lax.dot_general(h, hi, dn, preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot_general(h, lo, dn,
                                    preferred_element_type=jnp.float32)
    out_ref[0] = acc * np.float32(scale)


def _decode_kernel_cb(scale, cb, h_ref, rf_ref, out_ref):
    """Channel-blocked variant: ``cb`` channels per grid step (amortizes
    grid/bookkeeping overhead for small transmit counts)."""
    h = h_ref[:]
    dn = (((1,), (0,)), ((), ()))
    for i in range(cb):
        x = rf_ref[i].astype(jnp.float32)
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(h, hi, dn,
                                  preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(h, lo, dn,
                                        preferred_element_type=jnp.float32)
        out_ref[i] = acc * np.float32(scale)


def _decode_kernel_pipe(scale, cb, h_ref, rf_ref, out_ref):
    """Software-pipelined variant: the VPU hi/lo split of channel i+1 is
    emitted before channel i's MXU passes, giving Mosaic's scheduler an
    explicit window to overlap the two units (the split is ~0.5 ms of pure
    VPU work at the T=96 sweep point — serialized with the MXU it pushes
    the kernel off its HBM bound).  Also serves f32 input (complex frames
    bitcast to interleaved re|im planes): the hi+lo bf16 split covers 16
    mantissa bits, ~2e-5 relative — well inside the 1e-3 contract."""
    h = h_ref[:]
    dn = (((1,), (0,)), ((), ()))

    def split(i):
        x = rf_ref[i].astype(jnp.float32)
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    nxt = split(0)
    for i in range(cb):
        hi, lo = nxt
        if i + 1 < cb:
            nxt = split(i + 1)
        acc = jax.lax.dot_general(h, hi, dn,
                                  preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(h, lo, dn,
                                        preferred_element_type=jnp.float32)
        out_ref[i] = acc * np.float32(scale)


def _decode_kernel_i8(scale, cb, h_ref, rf_ref, out_ref):
    """int8 two-pass variant: int16 x = 256*hi8 + (lo8 + 128) with
    hi8 = x >> 8, lo8 = (x & 255) - 128 — both int8-exact; the +-1 Hadamard
    is int8, so both MXU passes are int8 x int8 -> int32 (2x the bf16 MAC
    rate on v5e) and the reassembly 256*P_hi + P_lo + 128*rowsum(H) is
    integer-exact for the whole int16 range."""
    h = h_ref[:]                                      # (A, A) int8
    rs = jnp.sum(h.astype(jnp.int32), axis=1, keepdims=True) * 128
    dn = (((1,), (0,)), ((), ()))
    for i in range(cb):
        # int16 shift/mask ops crash Mosaic (measured); widen to int32
        x = rf_ref[i].astype(jnp.int32)               # (A, BS)
        hi = (x >> 8).astype(jnp.int8)
        lo = ((x & 255) - 128).astype(jnp.int8)
        p_hi = jax.lax.dot_general(h, hi, dn,
                                   preferred_element_type=jnp.int32)
        p_lo = jax.lax.dot_general(h, lo, dn,
                                   preferred_element_type=jnp.int32)
        acc = p_hi * 256 + p_lo + rs
        out_ref[i] = acc.astype(jnp.float32) * np.float32(scale)


# Kernel-structure knobs for experiments/ablate_decode.py (bs, cb, i8);
# trace-time like das_pallas.ABLATE — clear _decode_call between changes.
DECODE_ABLATE: dict = {}

# Per-shape tuned knobs installed by :func:`autotune_decode`, consulted
# between DECODE_ABLATE (explicit override) and the measured defaults.
# Keyed by the (C, A, S) input shape.
DECODE_TUNED: dict = {}

_DECODE_SHIPPED_LOADED = False


def _load_shipped_decode_tuned():
    """Load the committed per-shape decode table (data/decode_tuned_v5e.json,
    produced by tools/pretune.py on a v5e chip) once, lazily, without
    overriding entries the user already installed."""
    global _DECODE_SHIPPED_LOADED
    if _DECODE_SHIPPED_LOADED:
        return
    _DECODE_SHIPPED_LOADED = True
    import json
    import os
    path = os.path.join(os.path.dirname(__file__), "..", "data",
                        "decode_tuned_v5e.json")
    try:
        with open(path) as f:
            rows = json.load(f)
    except OSError:
        return
    for row in rows:
        DECODE_TUNED.setdefault(tuple(row["key"]), row["knobs"])


def save_decode_tuned(path: str) -> None:
    """Persist :data:`DECODE_TUNED` as JSON (reload via the shipped-table
    path or :func:`load_decode_tuned`)."""
    import json
    rows = [{"key": list(k), "knobs": v} for k, v in DECODE_TUNED.items()]
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)


def load_decode_tuned(path: str) -> None:
    import json
    with open(path) as f:
        rows = json.load(f)
    for row in rows:
        DECODE_TUNED[tuple(row["key"])] = row["knobs"]
    _decode_call.cache_clear()


@functools.lru_cache(maxsize=32)
def _decode_call(c: int, a: int, s: int, interpret: bool, knobs=(),
                 f32_in: bool = False, true_a: int | None = None):
    """``a`` is the (sublane-aligned) kernel order; ``true_a`` the real
    transmit count when the caller zero-padded a 12/20-seed order up to a
    multiple of 8 — the 1/T normalization must use the true order."""
    scale_a = true_a or a
    knobs = dict(knobs)
    # Large sample blocks + channel blocking keep the grid small: the sweep
    # shapes are bandwidth-bound and per-step overhead dominated at small A.
    bs = knobs.get("bs") or min(2048, -(-s // 512) * 512)
    s_pad = -(-s // bs) * bs
    # cap the VMEM block footprint: cb*a*bs elements live as i16 in, f32,
    # two bf16 planes and f32 out (double-buffered) — ~786k elements is the
    # largest measured-safe block on v5e; within it, more channels per step
    # amortize per-step overhead (T=16 sweep point: 2.08 -> 0.95 ms)
    cb = knobs.get("cb") or min(16, max(1, 786432 // (a * bs)))
    while cb > 1 and c % cb:
        cb -= 1
    # int8 two-pass wins where per-step MXU work is small relative to the
    # VPU split overhead (T=16: 0.95 -> 0.64 ms); bf16 split measured
    # faster for T >= 64.  f32 input (bitcast complex frames) has no exact
    # int8 decomposition: always the bf16-split path.
    i8 = knobs.get("i8")
    if i8 is None:
        i8 = a <= 32
    i8 = bool(i8) and not f32_in
    if i8:
        body = _decode_kernel_i8
    elif knobs.get("pipe", 1) and cb > 1:
        body = _decode_kernel_pipe
    else:
        body = _decode_kernel_cb
    kernel = partial(body, 1.0 / scale_a, cb)
    fn = pl.pallas_call(
        kernel,
        grid=(c // cb, s_pad // bs),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),    # H (A, A) bf16
            pl.BlockSpec((cb, a, bs), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cb, a, bs), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, a, s_pad), jnp.float32),
        interpret=interpret,
    )

    h_dtype = jnp.int8 if i8 else jnp.bfloat16

    def run(rf, h):
        if s_pad != s:
            rf = jnp.pad(rf, ((0, 0), (0, 0), (0, s_pad - s)))
        out = fn(h.astype(h_dtype), rf)
        return out[:, :, :s] if s_pad != s else out

    return run


def decode_hadamard_pallas(rf: jax.Array, hadamard: jax.Array,
                           interpret: bool = False) -> jax.Array:
    """Fused decode (see module notes).  ``rf``: (C, A, S) int16, f32, or
    complex64 (demodulate-first pipelines; decoded as interleaved re|im
    f32 planes — the contraction is over A, so interleaving commutes).

    Bitwise-exact for int16-range inputs (split-bf16 products are exact and
    accumulate in f32), ~2e-5 relative for f32/complex; matches
    golden.decode_hadamard and avoids the XLA path's materialized
    transpose (direct (C, A, S) blocked output)."""
    cplx = jnp.iscomplexobj(rf)
    if cplx:
        # interleave re|im on the sample axis (XLA fuses this into the
        # kernel's input copy; the contraction over A commutes with it)
        rf = jnp.stack([jnp.real(rf), jnp.imag(rf)], axis=-1)
        rf = rf.reshape(rf.shape[0], rf.shape[1], -1)       # (C, A, 2S)
    c, a, s = rf.shape
    _load_shipped_decode_tuned()
    knobs = dict(DECODE_TUNED.get((c, a, s), ()))
    knobs.update(DECODE_ABLATE)          # explicit overrides win
    f32_in = rf.dtype != jnp.int16
    # 12/20-seed orders (A % 8 != 0) zero-pad up to the sublane multiple:
    # padded H columns are zero so padded acquisitions contribute exactly
    # nothing (also exact under the int8 decomposition — the correction
    # rowsum only sees real H entries); padded output rows are sliced off.
    a_pad = -(-a // 8) * 8
    true_a = a if a_pad != a else None
    if a_pad != a:
        rf = jnp.pad(rf, ((0, 0), (0, a_pad - a), (0, 0)))
        hadamard = jnp.pad(hadamard, ((0, a_pad - a), (0, a_pad - a)))
    out = _decode_call(c, a_pad, s, interpret, tuple(sorted(knobs.items())),
                       f32_in, true_a)(rf, hadamard)
    if a_pad != a:
        out = out[:, :a]
    if cplx:
        out = out.reshape(c, a, s // 2, 2)
        out = jax.lax.complex(out[..., 0], out[..., 1])
    return out


def _use_pallas_decode(rf) -> bool:
    # int16 raw, f32, or complex64 (demod-first) input on real TPU.
    # Non-sublane-aligned orders (12, 20) zero-pad inside
    # decode_hadamard_pallas rather than falling back to the XLA matmul.
    return (rf.dtype in (jnp.int16, jnp.float32, jnp.complex64)
            and jax.default_backend() == "tpu")


def autotune_decode(rf, hadamard, candidates=None, iters: int = 50,
                    warmup: int = 4, passes: int = 2, save_path=None):
    """Measure decode kernel knob combinations for this shape on the
    current device and install the fastest in :data:`DECODE_TUNED` keyed
    by the (C, A, S) shape (mirrors :func:`..ops.das_pallas.autotune_das`;
    used by every later :func:`decode_hadamard_pallas` of the same shape).
    ``passes`` sweeps the candidate list that many times and ranks
    per-candidate *minima* — one pass in a degraded-tunnel window pins
    whichever candidate happened to run while the tunnel was healthy.
    ``save_path`` persists the whole table via :func:`save_decode_tuned`.
    Returns ``(best_knobs, {repr(knobs): seconds})``.
    """
    import time as _time

    from ..utils.transfer import sync

    if candidates is None:
        candidates = [{}, {"i8": 1}, {"i8": 0}, {"cb": 8}, {"cb": 16},
                      {"i8": 1, "cb": 16}, {"bs": 1024}, {"bs": 4096},
                      {"i8": 0, "bs": 1024}, {"pipe": 0}]
    results = {}
    saved = dict(DECODE_ABLATE)
    # key by the shape decode_hadamard_pallas LOOKS UP: complex frames
    # interleave re|im on the sample axis before the tuned-knob fetch
    key = tuple(rf.shape[:-1]) + (
        rf.shape[-1] * (2 if jnp.iscomplexobj(rf) else 1),)
    _load_shipped_decode_tuned()
    prev_tuned = DECODE_TUNED.pop(key, None)  # candidates must run pure
    try:
        for _ in range(max(1, passes)):
            for knobs in candidates:
                DECODE_ABLATE.clear()
                DECODE_ABLATE.update(knobs)
                _decode_call.cache_clear()
                try:
                    for _ in range(warmup):
                        sync(decode_hadamard_pallas(rf, hadamard))
                    t0 = _time.perf_counter()
                    for _ in range(iters):
                        out = decode_hadamard_pallas(rf, hadamard)
                    sync(out)
                    dt = (_time.perf_counter() - t0) / iters
                except Exception:          # a candidate may not compile
                    results.setdefault(repr(knobs), None)
                    continue
                prev = results.get(repr(knobs))
                results[repr(knobs)] = dt if prev is None else min(prev, dt)
        timed = [(t, eval(k)) for k, t in results.items() if t is not None]
        best = min(timed)[1] if timed else {}
    finally:
        DECODE_ABLATE.clear()
        DECODE_ABLATE.update(saved)
        if prev_tuned is not None:
            DECODE_TUNED[key] = prev_tuned
        _decode_call.cache_clear()
    if timed:
        DECODE_TUNED[key] = best
    if save_path:
        save_decode_tuned(save_path)
    return best, results
