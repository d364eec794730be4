"""Round-3 verification driver A (real TPU, real data).

Exercises the surfaces changed this session:
- StereoSGM on Tsukuba (box_sum direct-adds rewrite in the hot path)
- StereoGSW on Tsukuba (Gauss-Seidel chamfer restructure)
- StereoFTP.getCloud (preamble/_dense_cloud_rows refactor) on the
  test-geometry synthetic plane scene
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    # backend probe
    d = jax.devices()
    print("devices:", d, flush=True)

    from simplestereo_tpu.imgio import imread
    from simplestereo_tpu.evaluation import evaluate_disparity, tsukuba_scale

    res = "/root/reference/examples/res/tsukuba/"
    left = imread(res + "tsukuba_l.png")
    right = imread(res + "tsukuba_r.png")
    gt = imread(res + "groundtruth.png", grayscale=True)
    nonocc = imread(res + "nonocc.png", grayscale=True)

    def bad2(disp, disp_scale=1.0):
        return round(evaluate_disparity(
            disp, gt, nonocc > 0, bad_thresholds=(2.0,),
            disp_scale=disp_scale, gt_scale=tsukuba_scale)["bad2"], 4)

    # ---- SGM (census operating point, same as bench.py) ----
    from simplestereo_tpu.passive import StereoSGM
    sgm = StereoSGM(numDisparities=16, blockSize=3, P1=120, P2=480,
                    costMethod="census", censusWindow=7,
                    uniquenessRatio=0, aggregator="pallas")
    t0 = time.time()
    dsg = np.asarray(sgm.compute(left, right))
    print(f"SGM compile+run {time.time()-t0:.1f}s "
          f"bad2={bad2(dsg, 1/16.0)}", flush=True)

    # ---- GSW (closed-form weights; tuned quality point) ----
    from simplestereo_tpu.passive import StereoGSW
    gsw = StereoGSW(winSize=23, maxDisparity=16, gamma=12.5, fMax=20,
                    consistent=True)
    t0 = time.time()
    dg = np.asarray(gsw.compute(left, right))
    t1 = time.time()
    print(f"GSW compile+run {t1-t0:.1f}s bad2={bad2(dg)}", flush=True)
    # warm timing with varying inputs
    ts = []
    for i in range(4):
        l2 = np.roll(left, i + 1, axis=0)
        r2 = np.roll(right, i + 1, axis=0)
        t0 = time.time()
        _ = np.asarray(gsw.compute(l2, r2))
        ts.append(time.time() - t0)
    print(f"GSW warm per-frame: {['%.3f' % t for t in ts]}", flush=True)
    # legacy defaults point for cross-round comparability
    gsw2 = StereoGSW(winSize=11, maxDisparity=16)
    t0 = time.time()
    dg2 = np.asarray(gsw2.compute(left, right))
    print(f"GSW(win11 defaults) compile+run {time.time()-t0:.1f}s "
          f"bad2={bad2(dg2)}", flush=True)
    ts = []
    for i in range(4):
        l2 = np.roll(left, i + 1, axis=0)
        r2 = np.roll(right, i + 1, axis=0)
        t0 = time.time()
        _ = np.asarray(gsw2.compute(l2, r2))
        ts.append(time.time() - t0)
    print(f"GSW(win11) warm per-frame: {['%.3f' % t for t in ts]}",
          flush=True)

    # ---- FTP (refactored getCloud path) on synthetic plane scene ----
    sys.path.insert(0, "/root/repo")
    from tests.test_active import _make_rig, _proj_coords_for_plane
    from simplestereo_tpu.active import buildFringe, StereoFTP
    from simplestereo_tpu import warp

    rig = _make_rig()
    period = 16.0
    fringe = buildFringe(period, dims=tuple(rig.res2), stripeColor="red")
    z0 = 520.0
    mapu, mapv, _ = _proj_coords_for_plane(rig, z0)
    cam = np.asarray(warp.remap(
        jnp.asarray(fringe), jnp.asarray(mapu, jnp.float32),
        jnp.asarray(mapv, jnp.float32), interpolation="linear"))
    ftp = StereoFTP(rig, fringe, period)
    cloud = ftp.getCloud(cam)
    center = cloud[20:-20, 20:-20, 2]
    center = center[np.isfinite(center)]
    err = abs(np.median(center) - z0)
    print(f"FTP plane: median z err {err:.2f} ({err/z0*100:.2f}% of z0)",
          flush=True)
    assert err < 0.02 * z0, "FTP plane recovery failed"
    print("VERIFY-A OK", flush=True)


if __name__ == "__main__":
    main()
