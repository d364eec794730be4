"""Round-4 verification driver A (real TPU, real data).

GSW mutual-information cost on the Pallas kernel (VERDICT r3 item 4:
"kernel it or kill it" — target >= 2x MI throughput at equal bad-2.0
under the gamma-mismatch test). Runs the Tsukuba pair at the round-3
MI operating point (win=23, minD=4, maxD=14, gamma=12.5, bins=24,
mi_iterations=3, consistent):

1. Pallas-vs-XLA MI agreement on the real chip (MI costs are sums of
   arbitrary table floats, so hardware near-tie flips can occur —
   report the rate; quality is the binding check);
2. bad-2.0 (nonocc) for both engines on the plain pair AND under the
   gamma-0.5 radiometric mismatch (verify_r3b.py methodology);
3. Warm timing, varying inputs, full readback, 1/2/4-call linearity,
   XLA vs Pallas (r3 XLA baseline: 182 ms / 6.67 Mpix*disp/s);
4. Batch-8 MI throughput (one launch per MI iteration for the stack).

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
    from simplestereo_tpu.passive.gsw_pallas import (
        gsw_mi_disparity_pallas_batch)

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
              cost_method="mi", bins=24, mi_iterations=3, consistent=True)
    D = kw["max_disp"] - kw["min_disp"] + 1

    def bad2(d):
        return round(evaluate_disparity(
            d, gt, nonocc > 0, bad_thresholds=(2.0,), disp_scale=1.0,
            gt_scale=tsukuba_scale)["bad2"], 4)

    out = {}

    # quality + agreement, plain pair and gamma-0.5 mismatch
    for tag, r in (("plain", right), ("gamma05", right_g)):
        t0 = time.time()
        d_x = np.asarray(gsw_disparity(left, r, engine="xla", **kw))
        print(f"[{tag}] xla {time.time()-t0:.1f}s", file=sys.stderr,
              flush=True)
        t0 = time.time()
        d_p = np.asarray(gsw_disparity(left, r, engine="pallas", **kw))
        print(f"[{tag}] pallas {time.time()-t0:.1f}s", file=sys.stderr,
              flush=True)
        out[f"mi_mismatch_rate_{tag}"] = round(float((d_x != d_p).mean()), 5)
        out[f"mi_bad2_xla_{tag}"] = bad2(d_x)
        out[f"mi_bad2_pallas_{tag}"] = bad2(d_p)

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
        out[f"mi_{tag}_ms"] = round(med * 1e3, 1)
        out[f"mi_{tag}_mpixdisp_per_s"] = round(H * W * D / med / 1e6, 2)
        out[f"mi_{tag}_linearity_s_per_call"] = lin
    out["mi_speedup"] = round(out["mi_xla_ms"] / out["mi_pallas_ms"], 2)

    # batch-8 (one launch per MI iteration for the whole stack)
    B = 8
    s2 = jnp.asarray(np.stack([right] * B))
    stacks = []
    for i in range(4):
        s = jnp.asarray(np.stack(
            [np.roll(left, i * B + j, axis=0) for j in range(B)]))
        s.block_until_ready()
        stacks.append(s)
    bkw = dict(win_size=23, min_disp=4, max_disp=14, gamma=12.5,
               bins=24, mi_iterations=3, consistent=True)
    np.asarray(gsw_mi_disparity_pallas_batch(stacks[0], s2, **bkw))
    ts = []
    for s1 in stacks:
        t0 = time.perf_counter()
        np.asarray(gsw_mi_disparity_pallas_batch(s1, s2, **bkw))
        ts.append(time.perf_counter() - t0)
    dtb = float(np.median(ts)) / B
    out["mi_pallas_batch8_mpixdisp_per_s"] = round(H * W * D / dtb / 1e6, 2)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
