"""Round-5 verification driver A: the GSW SD/MI decision rule
(VERDICT r4 item 7).

Regenerates the measurements behind ``costMethod="auto"``
(:func:`simplestereo_tpu.passive.gsw.radiometric_divergence` and the
decision table in :func:`gsw_disparity`'s docstring): for a ladder of
radiometric transforms of the Tsukuba right image, the histogram-EMD
probe value and the bad-2.0 (nonocc) of the SD and MI costs at the tuned
operating point (win=23, D=11, gamma=12.5, consistent), plus the probe
value of the matched 720p lawn pair. The published threshold
(MI_AUTO_THRESHOLD = 5.0) must separate every SD-winning row from every
MI-winning row.

Quality is engine-independent (the Pallas kernel is bit-exact vs XLA for
SD; MI differs only in ulp near-ties), so the table runs on the CPU
backend by default — pass --tpu to run on the hardware kernels instead.

Prints one JSON line.
"""
import json
import sys

import numpy as np


def main():
    import jax

    if "--tpu" not in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    print("devices:", jax.devices(), file=sys.stderr, flush=True)

    from simplestereo_tpu.imgio import imread
    from simplestereo_tpu.evaluation import evaluate_disparity, \
        tsukuba_scale
    from simplestereo_tpu.passive.gsw import (
        MI_AUTO_THRESHOLD, gsw_disparity, radiometric_divergence,
        resolve_cost_method)

    res = "/root/reference/examples/res/tsukuba/"
    left = imread(res + "tsukuba_l.png")
    right = imread(res + "tsukuba_r.png")
    gt = imread(res + "groundtruth.png", grayscale=True)
    nonocc = imread(res + "nonocc.png", grayscale=True)

    def bad2(d):
        return round(evaluate_disparity(
            np.asarray(d), gt, nonocc > 0, bad_thresholds=(2.0,),
            gt_scale=tsukuba_scale)["bad2"], 4)

    def g(img, gam):
        return np.clip(255.0 * (img / 255.0) ** gam, 0, 255) \
            .astype(np.uint8)

    kw = dict(win_size=23, min_disp=4, max_disp=14, gamma=12.5,
              f_max=20.0, consistent=True)
    mkw = dict(win_size=23, min_disp=4, max_disp=14, gamma=12.5,
               cost_method="mi", bins=24, mi_iterations=3,
               consistent=True)

    cases = {
        "plain": right,
        "bright+2": np.clip(right.astype(int) + 2, 0, 255)
        .astype(np.uint8),
        "bright+4": np.clip(right.astype(int) + 4, 0, 255)
        .astype(np.uint8),
        "bright+6": np.clip(right.astype(int) + 6, 0, 255)
        .astype(np.uint8),
        "bright+8": np.clip(right.astype(int) + 8, 0, 255)
        .astype(np.uint8),
        "contrast0.85": np.clip(right * 0.85, 0, 255).astype(np.uint8),
        "gamma08": g(right, 0.8),
        "gamma05": g(right, 0.5),
    }
    out = {"threshold": MI_AUTO_THRESHOLD, "rows": {}}
    rule_ok = True
    for name, r in cases.items():
        e = radiometric_divergence(left, r)
        bs = bad2(gsw_disparity(left, r, **kw))
        bm = bad2(gsw_disparity(left, r, **mkw))
        picked = resolve_cost_method(left, r, "auto")
        winner = "sd" if bs <= bm else "mi"
        # the rule is allowed to miss only where the two costs are
        # within 1.5 points of each other (the crossover plateau)
        if picked != winner and abs(bs - bm) > 0.015:
            rule_ok = False
        out["rows"][name] = {"emd": round(e, 2), "sd_bad2": bs,
                             "mi_bad2": bm, "auto_picks": picked,
                             "winner": winner}

    lawn_l = imread("/root/reference/examples/res/2/lawn_L.png")
    lawn_r = imread("/root/reference/examples/res/2/lawn_R.png")
    out["lawn_plain_emd"] = round(radiometric_divergence(lawn_l, lawn_r),
                                  2)
    out["rule_consistent_with_quality"] = rule_ok
    print(json.dumps(out))
    return 0 if rule_ok else 1


if __name__ == "__main__":
    sys.exit(main())
