"""Probe (real TPU): where does the MI iteration actually spend time?

verify_r4a/probe_mi_fast showed coarse-stepping the kernel aggregation
saves almost nothing (102 -> 93 ms), so the per-iteration cost must be
in the XLA glue. Times each jitted piece by the chained-calls method
(k = 1/2/4/8 calls on varying inputs, one final readback; slope =
per-call compute+dispatch) and microbenches the joint-histogram
strategies (scatter-add vs one-hot matmul).

Prints one JSON line.
"""
import functools
import json
import sys
import time

import numpy as np


def _slope(ks, ts):
    ks = np.asarray(ks, float)
    ts = np.asarray(ts, float)
    A = np.stack([ks, np.ones_like(ks)], 1)
    sol, *_ = np.linalg.lstsq(A, ts, rcond=None)
    return float(sol[0]), float(sol[1])


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), file=sys.stderr, flush=True)

    from simplestereo_tpu.imgio import imread
    from simplestereo_tpu.passive.gsw import (_mi_cost_table,
                                              _quantize_gray)
    from simplestereo_tpu.passive.gsw_pallas import (
        _gsw_pass_pallas, _mi_volume, _pack_planes, _pick_tile_h,
        _mi_ref_planes)

    res = "/root/reference/examples/res/tsukuba/"
    left = imread(res + "tsukuba_l.png")
    right = imread(res + "tsukuba_r.png")
    H, W = left.shape[:2]
    bins, min_disp, max_disp, win = 24, 4, 14, 23
    D = max_disp - min_disp + 1
    tile_h = _pick_tile_h(H, W, win, D, ext_vol=True)

    q1 = _quantize_gray(jnp.asarray(left), bins).block_until_ready()
    q2 = _quantize_gray(jnp.asarray(right), bins).block_until_ready()
    # 16 distinct inputs: every timed call below must see a FRESH input —
    # the tunnel caches per-(program, input) results, so reusing an input
    # across chains makes later calls free and the slopes negative.
    disps = [jnp.asarray(np.random.default_rng(i).integers(
        min_disp, max_disp + 1, (H, W), np.int32)) for i in range(16)]
    for d in disps:
        d.block_until_ready()

    out = {}

    def chain(name, fn, inputs):
        fn(inputs[-1])  # warm/compile (input reserved for warm only)
        ks, ts = [], []
        nxt = 0
        for k in (1, 2, 4, 8):
            t0 = time.perf_counter()
            last = None
            for _ in range(k):
                last = fn(inputs[nxt])
                nxt += 1
            np.asarray(last)
            ts.append(time.perf_counter() - t0)
            ks.append(k)
        s, icept = _slope(ks, ts)
        out[f"{name}_ms"] = round(s * 1e3, 2)
        out[f"{name}_intercept_ms"] = round(icept * 1e3, 1)
        out[f"{name}_chain_s"] = [round(t, 4) for t in ts]

    # Every probed fn returns an (H, W) data-dependent digest so the
    # final full readback cannot early-ack nor let XLA DCE the work.
    def digest_table(t):
        return t[q1, jnp.clip(q2, 0, bins - 1)]  # full-map gather from t

    # 1. joint-histogram table (scatter-add form, as shipped)
    tblj = jax.jit(lambda d: digest_table(
        _mi_cost_table(q1, q2, d, d >= 0, bins=bins)))
    chain("table_scatter", tblj, disps)

    # 2. full volume build (table + D gathers + masks)
    vol = jax.jit(functools.partial(_mi_volume, min_disp=min_disp,
                                    max_disp=max_disp, bins=bins))
    volsum = jax.jit(lambda d: vol(q1, q2, d).sum(0))
    chain("volume", volsum, disps)

    # 3. volume + pack to slab layout
    @jax.jit
    def volpack(d):
        return _pack_planes(vol(q1, q2, d), win, tile_h, H, W, 0.0)

    volpacksum = jax.jit(lambda d: volpack(d).sum(0))
    chain("volume_pack", volpacksum, disps)

    # 4. kernel aggregation alone on a prebuilt plane slab (ext_vol)
    rp = _mi_ref_planes(jnp.asarray(left).astype(jnp.float32), win,
                        tile_h, H, W)
    planes = [jnp.concatenate([rp, volpack(d)]).block_until_ready()
              for d in disps]
    kw = dict(H=H, W=W, win_size=win, min_disp=min_disp,
              max_disp=max_disp, gamma=12.5, f_max=0.0, interpret=False,
              tile_h=tile_h, ext_vol=True)
    chain("kernel_ext_vol", lambda p: _gsw_pass_pallas(p, **kw), planes)

    # 5. histogram microbench: scatter-add vs one-hot matmul
    def hist_scatter(d):
        xs = jnp.arange(W)[None, :]
        xm = jnp.clip(xs - d, 0, W - 1)
        q2m = jnp.take_along_axis(q2, xm, axis=1)
        ok = (d >= 0) & (xs - d >= 0) & (xs - d <= W - 1)
        flat = jnp.where(ok, q1 * bins + q2m, bins * bins)
        return jnp.zeros((bins * bins + 1,), jnp.float32).at[
            flat.reshape(-1)].add(1.0)[:-1].reshape(bins, bins)

    def hist_matmul(d):
        xs = jnp.arange(W)[None, :]
        xm = jnp.clip(xs - d, 0, W - 1)
        q2m = jnp.take_along_axis(q2, xm, axis=1)
        ok = (d >= 0) & (xs - d >= 0) & (xs - d <= W - 1)
        e1 = jax.nn.one_hot(q1.reshape(-1), bins, dtype=jnp.float32)
        e2 = jax.nn.one_hot(q2m.reshape(-1), bins, dtype=jnp.float32)
        e1 = e1 * ok.reshape(-1, 1)
        return e1.T @ e2

    hs = jax.jit(lambda d: digest_table(hist_scatter(d)))
    hm = jax.jit(lambda d: digest_table(hist_matmul(d)))
    chain("hist_scatter", hs, disps)
    chain("hist_matmul", hm, disps)
    a = np.asarray(jax.jit(hist_scatter)(disps[0]))
    b = np.asarray(jax.jit(hist_matmul)(disps[0]))
    out["hist_equal"] = bool(np.array_equal(a, b))

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
