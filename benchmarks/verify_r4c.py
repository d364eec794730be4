"""Round-4 verification driver C (real TPU, real data).

Refresh the README's large-frame one-off rows on the round-4 code —
the flagship full-resolution configurations whose recorded numbers date
from round 2:

1. 720p ASW, win 35, 11 candidates, consistent (README: ~225 ms / 45
   Mpix*disp/s, wide-strip walk) — on the reference's lawn pair
   (res/2/, 1280x720), bench timing discipline (varying device-resident
   inputs, full readback, median + IQR of 4);
2. 720p SGM, 128 candidates, Pallas streaming-scan aggregation
   (README: 167 ms / 705 Mpix*disp/s).

Prints one JSON line.
"""
import json
import sys
import time

import numpy as np


def _timed(fn, inputs):
    """inputs[0] is compile/warm-only — never re-timed (the tunnel can
    serve a repeated (program, input) pair from cache)."""
    np.asarray(fn(inputs[0]))
    ts = []
    for x in inputs[1:]:
        t0 = time.perf_counter()
        np.asarray(fn(x))
        ts.append(time.perf_counter() - t0)
    q1, q3 = np.percentile(ts, [25, 75])
    return float(np.median(ts)), float(q3 - q1)


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), file=sys.stderr, flush=True)

    from simplestereo_tpu.imgio import imread

    res = "/root/reference/examples/res/2/"
    left = imread(res + "lawn_L.png")
    right = imread(res + "lawn_R.png")
    H, W = left.shape[:2]
    out = {"frame": [W, H]}

    rightd = jnp.asarray(right)
    lefts = [jnp.asarray(np.roll(left, i, axis=0)) for i in range(5)]
    for x in lefts:
        x.block_until_ready()

    # 1. 720p ASW win35 D=11 consistent (the wide-strip walk path)
    from simplestereo_tpu.passive.asw_pallas import asw_disparity

    kw = dict(win_size=35, min_disp=4, max_disp=14, gamma_c=15.0,
              gamma_p=17.5, consistent=True)
    t0 = time.perf_counter()
    med, iqr = _timed(lambda x: asw_disparity(x, rightd, **kw), lefts)
    out["asw720_compile_plus_run_s"] = round(time.perf_counter() - t0, 1)
    out["asw720_ms"] = round(med * 1e3, 1)
    out["asw720_iqr_ms"] = round(iqr * 1e3, 1)
    out["asw720_mpixdisp_per_s"] = round(H * W * 11 / med / 1e6, 1)

    # 2. 720p SGM 128 candidates, Pallas aggregation
    from simplestereo_tpu.passive.sgm import _sgm_disparity

    skw = dict(min_disp=0, num_disp=128, block_size=3, P1=36.0, P2=144.0,
               paths=8, prefilter_cap=15.0, uniqueness=0.0,
               disp12_max_diff=-1, subpixel=True, aggregator="pallas")
    med, iqr = _timed(lambda x: _sgm_disparity(x, rightd, **skw), lefts)
    out["sgm720_ms"] = round(med * 1e3, 1)
    out["sgm720_iqr_ms"] = round(iqr * 1e3, 1)
    out["sgm720_mpixdisp_per_s"] = round(H * W * 128 / med / 1e6, 1)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
