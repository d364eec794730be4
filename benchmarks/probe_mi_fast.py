"""Probe (real TPU): MI coarse-step schedule — speed vs quality.

Decides the production default for ``coarse_step`` (intermediate MI
iterations on the subsampled window walk): times the consistent MI
pipeline on Tsukuba at the tuned point for coarse_step 1/2/3 and scores
bad-2.0 on the plain pair and under the gamma-0.5 radiometric mismatch.
Also probes the batch-8 anomaly (verify_r4a measured batch8 SLOWER than
8x single): per-iteration slope via mi_iterations 1 vs 3.

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
    from simplestereo_tpu.passive.gsw_pallas import (
        gsw_mi_disparity_pallas, gsw_mi_disparity_pallas_batch)

    res = "/root/reference/examples/res/tsukuba/"
    left = imread(res + "tsukuba_l.png")
    right = imread(res + "tsukuba_r.png")
    gt = imread(res + "groundtruth.png", grayscale=True)
    nonocc = imread(res + "nonocc.png", grayscale=True)
    H, W = left.shape[:2]

    right_g = np.clip(
        255.0 * (right.astype(np.float64) / 255.0) ** 0.5, 0, 255
    ).astype(np.uint8)

    kw = dict(win_size=23, min_disp=4, max_disp=14, gamma=12.5,
              bins=24, mi_iterations=3, consistent=True)
    D = kw["max_disp"] - kw["min_disp"] + 1

    def bad2(d):
        return round(evaluate_disparity(
            d, gt, nonocc > 0, bad_thresholds=(2.0,), disp_scale=1.0,
            gt_scale=tsukuba_scale)["bad2"], 4)

    out = {}
    rightd = jnp.asarray(right)
    lefts = [jnp.asarray(np.roll(left, i, axis=0)) for i in range(8)]
    for x in lefts:
        x.block_until_ready()

    for cs in (1, 2, 3):
        t0 = time.time()
        d = np.asarray(gsw_mi_disparity_pallas(left, right,
                                               coarse_step=cs, **kw))
        print(f"cs={cs} compile+run {time.time()-t0:.1f}s",
              file=sys.stderr, flush=True)
        out[f"cs{cs}_bad2_plain"] = bad2(d)
        dg = np.asarray(gsw_mi_disparity_pallas(left, right_g,
                                                coarse_step=cs, **kw))
        out[f"cs{cs}_bad2_gamma05"] = bad2(dg)
        ts = []
        for x in lefts:
            t0 = time.perf_counter()
            np.asarray(gsw_mi_disparity_pallas(x, rightd,
                                               coarse_step=cs, **kw))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        out[f"cs{cs}_ms"] = round(med * 1e3, 1)
        out[f"cs{cs}_mpixdisp_per_s"] = round(H * W * D / med / 1e6, 2)

    # batch-8 anomaly: per-iteration slope
    B = 8
    s2 = jnp.asarray(np.stack([right] * B))
    stacks = []
    for i in range(4):
        s = jnp.asarray(np.stack(
            [np.roll(left, i * B + j, axis=0) for j in range(B)]))
        s.block_until_ready()
        stacks.append(s)
    for it in (1, 3):
        bkw = dict(kw, mi_iterations=it)
        np.asarray(gsw_mi_disparity_pallas_batch(stacks[0], s2, **bkw))
        ts = []
        for s1 in stacks:
            t0 = time.perf_counter()
            np.asarray(gsw_mi_disparity_pallas_batch(s1, s2, **bkw))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        out[f"batch8_it{it}_ms"] = round(med * 1e3, 1)
        out[f"batch8_it{it}_mpixdisp_per_s"] = round(
            B * H * W * D / med / 1e6, 2)

    # batch-8 with the winning-looking schedule (cs=2)
    bkw = dict(kw, mi_iterations=3)
    np.asarray(gsw_mi_disparity_pallas_batch(stacks[0], s2, coarse_step=2,
                                             **bkw))
    ts = []
    for s1 in stacks:
        t0 = time.perf_counter()
        np.asarray(gsw_mi_disparity_pallas_batch(s1, s2, coarse_step=2,
                                                 **bkw))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    out["batch8_cs2_mpixdisp_per_s"] = round(B * H * W * D / med / 1e6, 2)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
