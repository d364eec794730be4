"""Tune the quality_disparity preset on Tsukuba (real TPU).

Sweeps the ASW-leg composition: integer vs subpixel winner, WLS lambda.
The ASW kernel compiles once per subpixel setting; the WLS filter is a
cheap XLA program. Prints one JSON line with every operating point.
"""
import json
import sys

import numpy as np


def main():
    import jax.numpy as jnp

    from simplestereo_tpu.imgio import imread
    from simplestereo_tpu.evaluation import evaluate_disparity, tsukuba_scale
    from simplestereo_tpu.passive.asw_pallas import asw_disparity
    from simplestereo_tpu.passive.wls import wls_filter_disparity

    res = "/root/reference/examples/res/tsukuba/"
    left = imread(res + "tsukuba_l.png")
    right = imread(res + "tsukuba_r.png")
    gt = imread(res + "groundtruth.png", grayscale=True)
    nonocc = imread(res + "nonocc.png", grayscale=True) > 0
    guide = np.asarray(left).mean(-1).astype(np.float32)

    def ev(d):
        r = evaluate_disparity(np.asarray(d), gt, nonocc,
                               bad_thresholds=(1.0, 2.0),
                               gt_scale=tsukuba_scale)
        return {k: round(float(r[k]), 4)
                for k in ("bad1", "bad2", "avgerr", "rms")}

    kw = dict(win_size=35, min_disp=4, max_disp=14, gamma_c=15.0,
              gamma_p=17.5, consistent=True)
    out = {}
    for sub in (False, True):
        tag = "sub" if sub else "int"
        d = np.asarray(asw_disparity(jnp.asarray(left), jnp.asarray(right),
                                     subpixel=sub, **kw))
        out[f"asw_{tag}"] = ev(d)
        for lam in (0.5, 1.0, 2.0, 4.0, 8.0, 16.0):
            for sc in (2.0, 4.0, 8.0):
                f = wls_filter_disparity(d.astype(np.float32), guide,
                                         lambda_=lam, sigma_color=sc)
                out[f"asw_{tag}_wls{lam}_sc{sc}"] = ev(f)
        print(f"done {tag}", file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
