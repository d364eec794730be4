"""Round-3 verification driver C (real TPU, real data).

GSW Pallas kernel vs the fused-XLA path on Tsukuba, at the tuned
operating point (win=23, minD=4, maxD=14, gamma=12.5, fMax=20,
consistent). Checks:

1. Hardware parity Pallas vs XLA (expect ~1% scattered near-tie flips
   from TPU exp/sqrt ulp differences, like ASW — report mismatch rate
   and the max |cost-gap| proxy via bad2 agreement);
2. bad-2.0 (nonocc) of both engines;
3. Warm timing, varying inputs, full readback, 1/2/4-call linearity,
   for: XLA single, Pallas single, Pallas batch-8.

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

    from simplestereo_tpu.imgio import imread
    from simplestereo_tpu.evaluation import evaluate_disparity, tsukuba_scale
    from simplestereo_tpu.passive.gsw import gsw_disparity
    from simplestereo_tpu.passive.gsw_pallas import gsw_disparity_pallas_batch

    res = "/root/reference/examples/res/tsukuba/"
    left = imread(res + "tsukuba_l.png")
    right = imread(res + "tsukuba_r.png")
    gt = imread(res + "groundtruth.png", grayscale=True)
    nonocc = imread(res + "nonocc.png", grayscale=True)
    H, W = left.shape[:2]

    kw = dict(win_size=23, min_disp=4, max_disp=14, gamma=12.5,
              f_max=20.0, consistent=True)
    D = kw["max_disp"] - kw["min_disp"] + 1

    def bad2(d):
        return round(evaluate_disparity(
            d, gt, nonocc > 0, bad_thresholds=(2.0,), disp_scale=1.0,
            gt_scale=tsukuba_scale)["bad2"], 4)

    out = {}

    # parity + quality
    t0 = time.time()
    d_x = np.asarray(gsw_disparity(left, right, engine="xla", **kw))
    print(f"xla compile+run {time.time()-t0:.1f}s", file=sys.stderr,
          flush=True)
    t0 = time.time()
    d_p = np.asarray(gsw_disparity(left, right, engine="pallas", **kw))
    print(f"pallas compile+run {time.time()-t0:.1f}s", file=sys.stderr,
          flush=True)
    out["mismatch_rate"] = round(float((d_x != d_p).mean()), 5)
    out["bad2_xla"] = bad2(d_x)
    out["bad2_pallas"] = bad2(d_p)

    rightd = jnp.asarray(right)
    lefts = [jnp.asarray(np.roll(left, i, axis=0)) for i in range(8)]
    for x in lefts:
        x.block_until_ready()

    def timeit(fn, n_lin=(1, 2, 4)):
        ts = []
        for x in lefts:
            t0 = time.perf_counter()
            np.asarray(fn(x))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        # linearity check: k sequential calls should scale ~k
        lin = []
        for k in n_lin:
            t0 = time.perf_counter()
            for i in range(k):
                np.asarray(fn(lefts[i]))
            lin.append(round((time.perf_counter() - t0) / k, 4))
        return med, lin

    for tag, eng in (("xla", "xla"), ("pallas", "pallas")):
        np.asarray(gsw_disparity(lefts[0], rightd, engine=eng, **kw))
        med, lin = timeit(lambda x, e=eng: gsw_disparity(x, rightd,
                                                         engine=e, **kw))
        out[f"{tag}_ms"] = round(med * 1e3, 1)
        out[f"{tag}_mpixdisp_per_s"] = round(H * W * D / med / 1e6, 2)
        out[f"{tag}_linearity_s_per_call"] = lin

    # batch-8 (one launch, both directions on the grid)
    B = 8
    s2 = jnp.asarray(np.stack([right] * B))
    stacks = []
    for i in range(4):
        s = jnp.asarray(np.stack(
            [np.roll(left, i * B + j, axis=0) for j in range(B)]))
        s.block_until_ready()
        stacks.append(s)
    bkw = dict(win_size=23, min_disp=4, max_disp=14, gamma=12.5,
               f_max=20.0, consistent=True)
    np.asarray(gsw_disparity_pallas_batch(stacks[0], s2, **bkw))
    ts = []
    for s1 in stacks:
        t0 = time.perf_counter()
        np.asarray(gsw_disparity_pallas_batch(s1, s2, **bkw))
        ts.append(time.perf_counter() - t0)
    dtb = float(np.median(ts)) / B
    out["pallas_batch8_mpixdisp_per_s"] = round(H * W * D / dtb / 1e6, 2)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
