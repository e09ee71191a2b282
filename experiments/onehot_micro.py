"""Formulation-change A/B (VERDICT r3 #1): can MXU one-hot-matmul
interpolation beat the VPU lane-gather path?

The cooperative-matrix move (reference decode.glsl:76-117 applies it to
Hadamard decode) recast for DAS sampling (das.glsl:64-122): instead of
gathering RF[k_v + t] per voxel, build a banded weight matrix
W[s, v] = sum_t w_t[v] * (s == k[v] + t) from iota comparisons (no
gathers at all) and compute out[b, v] += RF[b, s] @ W[s, v] on the MXU.
The M dimension must be frame batch B — per-frame W-build cost falls as
1/B while the gather path is flat, so there is a crossover B.

Measures, per (chunk=128 samples x 128-lane voxel row):
  A) gather_hermite: the headline kernel's bundle — 2 positions x
     (index ops + 2 packed-int32 gathers + unpack + 4 FMA), 16-row tile
  B) onehot_mxu(B): 4-tap W build (4 compare-selects on (128,128) iota)
     + (B,128)@(128,128) bf16 matmul, for B in {8, 32, 128}

Reports us per unit and the implied per-frame cost; the A/B verdict is
the measured crossover vs the frame-batch VMEM limits already measured
(experiments/frame_batch_ab.py: packed frame batching loses at B>=2).

Run on hardware: PYTHONPATH=/root/repo:$PYTHONPATH python
experiments/onehot_micro.py | tee /tmp/onehot_micro.log
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ogl_beamforming_tpu.utils.transfer import sync

    ROWS, LANE, STEPS = 16, 128, 256
    UNITS = 16      # (tile, chunk) units processed per grid step

    # ---------------- A: gather path (headline hermite bundle) -----------
    def gather_kernel(src_ref, src2_ref, idx_ref, w_ref, out_ref):
        idx = idx_ref[:]
        w = w_ref[:]
        acc = jnp.zeros((ROWS, LANE), jnp.float32)
        accs = [acc] * 4
        for u in range(UNITS):
            src = jnp.broadcast_to(src_ref[0:1, :], (ROWS, LANE))
            src2 = jnp.broadcast_to(src2_ref[0:1, :], (ROWS, LANE))
            for pos in range(2):          # cubic hermite: 2 positions
                rr = idx + (pos + (u & 3))
                sel = rr.astype(jnp.uint32) < LANE
                rc = rr & (LANE - 1)
                wp = jnp.where(sel, w, 0.0)
                wm = jnp.where(sel, w * 0.5, 0.0)
                vp = jnp.take_along_axis(src, rc, axis=-1)
                vm = jnp.take_along_axis(src2, rc, axis=-1)
                a = (u * 2 + pos) & 3
                accs[a] = (accs[a]
                           + wp * (vp >> 16).astype(jnp.float32)
                           + wm * (vm >> 16).astype(jnp.float32)
                           + wp * ((vp << 16) >> 16).astype(jnp.float32)
                           + wm * ((vm << 16) >> 16).astype(jnp.float32))
        out_ref[:] = accs[0] + accs[1] + accs[2] + accs[3]

    # ---------------- B: one-hot + MXU path -------------------------------
    def make_onehot(B):
        def kernel(rf_ref, k_ref, w_ref, out_ref):
            k = k_ref[0:1, :]                       # (1, LANE) voxel indices
            iota = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
            acc = jnp.zeros((B, LANE), jnp.float32)
            for u in range(UNITS):
                wmat = jnp.zeros((LANE, LANE), jnp.float32)
                for t in range(4):                  # 4 cubic taps
                    wt = w_ref[t:t + 1, :]          # (1, LANE) tap weights
                    kk = k + (t + (u & 3))
                    wmat = wmat + jnp.where(iota == kk, wt, 0.0)
                acc = acc + jax.lax.dot_general(
                    rf_ref[:].astype(jnp.bfloat16),
                    wmat.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            out_ref[:] = acc

        return pl.pallas_call(
            kernel,
            grid=(STEPS,),
            in_specs=[pl.BlockSpec((B, LANE), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((8, LANE), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((8, LANE), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((B, LANE), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, LANE), jnp.float32),
        )

    rng = np.random.default_rng(7)
    idx = jnp.asarray(rng.integers(1, LANE - 8, (ROWS, LANE), np.int32))
    w = jnp.asarray(rng.standard_normal((ROWS, LANE)).astype(np.float32))
    src = jnp.asarray(
        rng.integers(-2 ** 30, 2 ** 30, (ROWS, LANE)).astype(np.int32))
    src2 = jnp.asarray(
        rng.integers(-2 ** 30, 2 ** 30, (ROWS, LANE)).astype(np.int32))

    gfn = jax.jit(pl.pallas_call(
        gather_kernel,
        grid=(STEPS,),
        in_specs=[pl.BlockSpec((ROWS, LANE), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((ROWS, LANE), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, LANE), jnp.float32),
    ))

    def timeit(fn, *args, iters=20):
        sync(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / iters

    n_units = STEPS * UNITS
    dt = timeit(gfn, src, src2, idx, w)
    # gather path: one unit covers a (16,128) voxel tile = 16 voxel rows
    per_rowchunk_g = dt / (n_units * ROWS) * 1e9
    print(json.dumps({"variant": "gather_hermite",
                      "us": round(dt * 1e6, 1),
                      "ns_per_voxelrow_chunk": round(per_rowchunk_g, 1)}),
          flush=True)

    kvox = jnp.asarray(rng.integers(1, LANE - 8, (8, LANE), np.int32))
    wt4 = jnp.asarray(rng.standard_normal((8, LANE)).astype(np.float32))
    for B in (8, 32, 128):
        rf = jnp.asarray(rng.standard_normal((B, LANE)).astype(np.float32))
        try:
            fn = jax.jit(make_onehot(B))
            dt = timeit(fn, rf, kvox, wt4)
            # one-hot: one unit covers ONE voxel row for B frames
            per_rowchunk = dt / n_units * 1e9 / B     # per frame
            print(json.dumps({"variant": f"onehot_mxu_B{B}",
                              "us": round(dt * 1e6, 1),
                              "ns_per_voxelrow_chunk_per_frame":
                                  round(per_rowchunk, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": f"onehot_mxu_B{B}",
                              "err": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
