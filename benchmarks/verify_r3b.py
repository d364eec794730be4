"""Round-3 verification driver B (real TPU, real data).

GSW mutual-information cost on *real* images (VERDICT r2 item 2: the MI
cost was only validated on a synthetic radiometric inversion). Runs on
the Tsukuba pair (/root/reference/examples/res/tsukuba/):

1. MI cost on the unmodified pair — quality should be in the same class
   as the SD (capped color-difference) cost;
2. MI cost with a gamma-0.5 radiometric distortion applied to the right
   image (a realistic exposure/response mismatch) — SD collapses, MI
   should hold;
3. SD cost on both, for the comparison rows.

Prints one JSON line with bad-2.0 (non-occluded) for each cell plus
warm per-frame time for the MI path.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax  # noqa: F401  (backend probe via first device op)
    import jax.numpy as jnp  # noqa: F401

    from simplestereo_tpu.imgio import imread
    from simplestereo_tpu.evaluation import evaluate_disparity, tsukuba_scale
    from simplestereo_tpu.passive.gsw import gsw_disparity

    res = "/root/reference/examples/res/tsukuba/"
    left = imread(res + "tsukuba_l.png")
    right = imread(res + "tsukuba_r.png")
    gt = imread(res + "groundtruth.png", grayscale=True)
    nonocc = imread(res + "nonocc.png", grayscale=True)

    # gamma-0.5 response mismatch on the right image (real nonlinear
    # radiometric distortion; keeps full dynamic range)
    right_g = np.clip(
        255.0 * (right.astype(np.float64) / 255.0) ** 0.5, 0, 255
    ).astype(np.uint8)

    def bad2(disp):
        return round(evaluate_disparity(
            disp, gt, nonocc > 0, bad_thresholds=(2.0,),
            disp_scale=1.0, gt_scale=tsukuba_scale)["bad2"], 4)

    kw = dict(win_size=23, min_disp=4, max_disp=14, gamma=12.5,
              consistent=True)
    out = {}

    for tag, r in (("plain", right), ("gamma05", right_g)):
        d_sd = np.asarray(gsw_disparity(left, r, f_max=20.0,
                                        cost_method="sd", **kw))
        out[f"gsw_sd_bad2_{tag}"] = bad2(d_sd)
        t0 = time.time()
        d_mi = np.asarray(gsw_disparity(left, r, cost_method="mi",
                                        bins=24, mi_iterations=3, **kw))
        out[f"gsw_mi_bad2_{tag}"] = bad2(d_mi)
        print(f"[{tag}] sd={out[f'gsw_sd_bad2_{tag}']} "
              f"mi={out[f'gsw_mi_bad2_{tag}']} "
              f"(mi compile+run {time.time() - t0:.1f}s)",
              file=sys.stderr, flush=True)

    # warm MI timing, varying inputs
    ts = []
    for i in range(4):
        l2 = np.roll(left, i + 1, axis=0)
        r2 = np.roll(right, i + 1, axis=0)
        t0 = time.time()
        np.asarray(gsw_disparity(l2, r2, cost_method="mi", bins=24,
                                 mi_iterations=3, **kw))
        ts.append(time.time() - t0)
    out["gsw_mi_warm_ms"] = round(float(np.median(ts)) * 1e3, 1)
    H, W = left.shape[:2]
    D = kw["max_disp"] - kw["min_disp"] + 1
    out["gsw_mi_mpixdisp_per_s"] = round(
        H * W * D / float(np.median(ts)) / 1e6, 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
