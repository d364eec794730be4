"""Per-stage marginal cost of the fused FTP device program (round 5).

The roofline table shows the fused 640x480 program at ~46 ms of device
time with ~0.06 GFLOP and ~50 MB of traffic — bounded by neither
compute nor bandwidth. This driver finds where the time actually goes:
each stage of `_ftp_cloud_fused` is timed by BATCH SLOPE (vmapped over
B frames; per-frame marginal = (T(8)-T(2))/6, so dispatch and fixed
costs cancel), with varying device-resident inputs and a small
readback.

Stages: projector mapping (+cubic-resampled virtual reference), row-FFT
band-pass phase, 2-D unwrap (two cumsum scans), dense epipolar
triangulation (iterative undistort inverse over the full grid), and the
whole fused program for cross-checking the sum.

Prints one JSON line.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), file=sys.stderr, flush=True)

    from simplestereo_tpu.active import ftp as F

    H, W = 480, 640
    rng = np.random.default_rng(0)

    def batch_slope(make_inputs, fn, b1=2, b2=8, n=5):
        """Per-frame marginal seconds. The stage output is reduced to a
        SCALAR on device (a full readback would scale with B and pollute
        the slope with link time); inputs vary per call so no transport
        result-cache can serve a repeat, and the scalar's bytes cannot
        exist before the stage computed."""
        red = jax.jit(lambda *a: sum(
            jnp.sum(jnp.abs(leaf.astype(jnp.float32)))
            for leaf in jax.tree_util.tree_leaves(fn(*a))))
        res = {}
        for B in (b1, b2):
            ins = [make_inputs(B, i) for i in range(n)]
            np.asarray(red(*ins[0]))  # compile + warm
            ts = []
            for x in ins[1:]:
                t0 = time.perf_counter()
                np.asarray(red(*x))
                ts.append(time.perf_counter() - t0)
            res[B] = float(np.median(ts))
        return (res[b2] - res[b1]) / (b2 - b1)

    out = {}

    # shared geometry (values realistic-ish; shapes are what matter)
    K2 = jnp.asarray(np.array([[700.0, 0, 319.5], [0, 700.0, 239.5],
                               [0, 0, 1]]), jnp.float32)
    dist2 = jnp.zeros(14, jnp.float32).at[0].set(0.05)
    M = jnp.asarray(np.linalg.inv(np.asarray(K2)), jnp.float32)
    T = jnp.asarray(np.array([-200.0, 5.0, 30.0]), jnp.float32)
    fringe_gray = jnp.asarray(
        rng.random((H, W), np.float32) * 100 + 100)

    # 1. projector mapping + virtual reference — the 2-D cubic gather
    # form vs the round-5 row-invariant 1-D fast path (bit-exact on
    # hardware for row-constant fringes; /tmp-verified + test_warp.py)
    def mk_map(B, i):
        return (jnp.asarray(2600.0 + 10 * i
                            + np.arange(B, dtype=np.float32)),)

    for tag, inv in (("mapping_2d_ms", False), ("mapping_rowinv_ms",
                                                True)):
        map_v = jax.jit(jax.vmap(
            lambda z, _inv=inv: F._projector_mapping_device(
                z, M, T, K2, dist2, fringe_gray, res=(W, H),
                row_inv=_inv)))
        out[tag] = round(batch_slope(mk_map, map_v) * 1e3, 2)
    out["mapping_ms"] = out["mapping_rowinv_ms"]

    # 2. row-FFT band-pass phase
    phase_v = jax.jit(jax.vmap(F._phase_pipeline))

    def mk_phase(B, i):
        o = jnp.asarray(rng.random((B, H, W), np.float32))
        r = jnp.asarray(rng.random((B, H, W), np.float32))
        fmn = jnp.full((B, H), 0.03, jnp.float32)
        fmx = jnp.full((B, H), 0.12, jnp.float32)
        return o, r, fmn, fmx

    out["phase_fft_ms"] = round(batch_slope(mk_phase, phase_v) * 1e3, 2)

    # 3. 2-D unwrap
    unwrap_v = jax.jit(jax.vmap(F._unwrap2d))

    def mk_unwrap(B, i):
        return (jnp.asarray(rng.random((B, H, W), np.float32) * 6 - 3),)

    out["unwrap_ms"] = round(batch_slope(mk_unwrap, unwrap_v) * 1e3, 2)

    # 4. dense triangulation (iterative undistort inverse on the grid)
    Rect1 = jnp.eye(3, dtype=jnp.float32)
    Rect2 = jnp.eye(3, dtype=jnp.float32)
    R_inv3 = jnp.eye(3, dtype=jnp.float32)
    ep = jnp.asarray(np.array([5000.0, 240.0]), jnp.float32)

    dense_v = jax.jit(jax.vmap(
        lambda pc, pu, k: F._dense_cloud_device(
            pc, pu, k, ep, jnp.float32(1 / 16.0), K2, dist2, Rect1,
            Rect2, R_inv3, jnp.float32(200.0), roi=(0, 0, W, H))))

    def mk_dense(B, i):
        pc = jnp.asarray(
            rng.random((B, H, W, 2), np.float32) * 500 + 50)
        pu = jnp.asarray(rng.random((B, H, W), np.float32) * 20)
        k = jnp.full((B,), 3.0, jnp.float32)
        return pc, pu, k

    out["dense_tri_ms"] = round(batch_slope(mk_dense, dense_v) * 1e3, 2)

    out["stage_sum_ms"] = round(
        out["mapping_ms"] + out["phase_fft_ms"] + out["unwrap_ms"]
        + out["dense_tri_ms"], 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
