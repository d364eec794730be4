"""FTP getCloud stage breakdown on real TPU (VERDICT r3 item 2).

The r03 headline `ftp_cloud_640x480_ms: 376` conflates pipeline cost
with environment cost (tunnel dispatch ~20-25 ms/call, ~26 MB/s host
link). This driver separates the stages:

- ``prep``          : host preamble `_cloud_prep` — upload + undistort
                      dispatch, device stripe centroids + (H,) readback,
                      host f64 stripe triangulation + carrier frequency;
- ``host_ctrl``     : the pure-numpy control plane alone (triangulate +
                      `_calculateCameraFrequency`), timed directly;
- ``fused``         : the one-dispatch device pipeline, split into
                      per-call compute+dispatch (slope) and readback
                      (intercept) by timing k = 1/2/4/8 chained calls on
                      VARYING inputs with a single final full readback —
                      T(k) = k*(compute + dispatch) + readback, robust
                      against the tunnel's early-ack lies;
- ``readback_f32``  : np.asarray of a device-resident (480, 640, 3) f32
                      (the cloud), measured on varying arrays;
- ``readback_f16``  : same at f16 (sizes the halved-link win);
- ``total``         : full getCloud (the bench.py number).

Prints one JSON line.
"""
import json
import sys
import time

import numpy as np


def _fit_slope_intercept(ks, ts):
    ks = np.asarray(ks, float)
    ts = np.asarray(ts, float)
    A = np.stack([ks, np.ones_like(ks)], 1)
    sol, *_ = np.linalg.lstsq(A, ts, rcond=None)
    return float(sol[0]), float(sol[1])


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), file=sys.stderr, flush=True)

    from simplestereo_tpu import StereoRig, warp
    from simplestereo_tpu.active import buildFringe, StereoFTP
    from simplestereo_tpu.active.ftp import _ftp_cloud_fused
    from simplestereo_tpu.geometry.npgeom import rodrigues_to_matrix
    from simplestereo_tpu.geometry.distortion import pad_dist_coeffs

    res = (640, 480)
    Kf = np.array([[700.0, 0, 319.5], [0, 700.0, 239.5], [0, 0, 1]])
    Rf = rodrigues_to_matrix(np.array([0.0, -0.05, 0.0]))
    Tf = np.array([[-200.0], [5.0], [30.0]])
    rig = StereoRig(res, res, Kf, Kf, None, None, Rf, Tf)
    fringe = buildFringe(16.0, dims=res, stripeColor="red")
    z0 = 2600.0
    gxf, gyf = np.meshgrid(np.arange(res[0], dtype=float),
                           np.arange(res[1], dtype=float))
    rays = np.stack([gxf, gyf, np.ones_like(gxf)], -1) @ np.linalg.inv(Kf).T
    q = (z0 * rays @ Rf.T + Tf.ravel()) @ Kf.T
    cam = np.asarray(warp.remap(
        jnp.asarray(fringe),
        jnp.asarray(q[..., 0] / q[..., 2], jnp.float32),
        jnp.asarray(q[..., 1] / q[..., 2], jnp.float32),
        interpolation="linear"))
    ftp = StereoFTP(rig, fringe, 16.0)
    rngf = np.random.default_rng(0)
    cams = [np.clip(cam.astype(np.int16)
                    + rngf.integers(-2, 3, cam.shape), 0, 255)
            .astype(np.uint8) for _ in range(16)]

    out = {}

    # warm everything once
    ftp.getCloud(cams[0])

    # ---- total ------------------------------------------------------------
    ts = []
    for cm in cams[:8]:
        t0 = time.perf_counter()
        ftp.getCloud(cm)
        ts.append(time.perf_counter() - t0)
    out["total_ms"] = round(float(np.median(ts)) * 1e3, 1)

    # ---- prep (host preamble incl. undistort + stripe) --------------------
    preps = []
    ts = []
    for cm in cams[:8]:
        t0 = time.perf_counter()
        preps.append(ftp._cloud_prep(cm, 0.5, None))
        ts.append(time.perf_counter() - t0)
    out["prep_ms"] = round(float(np.median(ts)) * 1e3, 1)

    # ---- host control plane alone -----------------------------------------
    from simplestereo_tpu.active.stripe import findCentralStripe
    prep0 = preps[0]
    img_u = warp.undistort_image(cams[0], rig.intrinsic1, rig.distCoeffs1)
    stripe_cam = findCentralStripe(img_u, "red", 0.5).reshape(-1, 2)
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        sw = ftp._triangulate(stripe_cam.copy(), ftp.stripeCentralPeak,
                              (0, 0, res[0], res[1]))
        ftp._calculateCameraFrequency(sw)
        ts.append(time.perf_counter() - t0)
    out["host_ctrl_ms"] = round(float(np.median(ts)) * 1e3, 2)

    # ---- fused pipeline: slope/intercept over k chained calls -------------
    rigM = prep0["rigM"]
    fc, radius = prep0["fc"], prep0["radius"]
    roi = prep0["roi"]
    fused_args = lambda imgd: (  # noqa: E731
        imgd, jnp.float32(prep0["z_plane"]),
        jnp.asarray(rigM, jnp.float32),
        jnp.asarray(np.asarray(rig.T, np.float64).ravel(), jnp.float32),
        jnp.asarray(rig.intrinsic2, jnp.float32),
        jnp.asarray(pad_dist_coeffs(rig.distCoeffs2)),
        jnp.asarray(ftp.fringe, jnp.float32),
        jnp.asarray(fc - radius, jnp.float32),
        jnp.asarray(fc + radius, jnp.float32),
        jnp.asarray(prep0["stripe_idx"], jnp.int32),
        jnp.float32(ftp.stripeCentralPeak), jnp.float32(ftp.fp),
        jnp.asarray(ftp.ep, jnp.float32),
        jnp.asarray(ftp.Rectify1, jnp.float32),
        jnp.asarray(ftp.Rectify2, jnp.float32),
        jnp.asarray(ftp.R_inv[:3, :3], jnp.float32),
        jnp.float32(rig.getBaseline()))
    kwf = dict(res=tuple(rig.res1), roi=tuple(int(v) for v in roi),
               gray_mode="max", debug=False)

    # Device-resident varying undistorted frames. Every timed call gets a
    # FRESH input: the tunnel caches per-(program, input) results, so
    # reusing an input across chains corrupts the slope fit.
    imgs_d = [jnp.asarray(np.asarray(warp.undistort_image(
        cm, rig.intrinsic1, rig.distCoeffs1))) for cm in cams]
    for x in imgs_d:
        x.block_until_ready()
    np.asarray(_ftp_cloud_fused(*fused_args(imgs_d[15]), **kwf))  # warm

    ks, tks = [], []
    nxt = 0
    for k in (1, 2, 4, 8):
        t0 = time.perf_counter()
        last = None
        for _ in range(k):
            last = _ftp_cloud_fused(*fused_args(imgs_d[nxt]), **kwf)
            nxt += 1
        np.asarray(last)
        tks.append(time.perf_counter() - t0)
        ks.append(k)
    slope, intercept = _fit_slope_intercept(ks, tks)
    out["fused_chain_s"] = [round(t, 4) for t in tks]
    out["fused_per_call_ms"] = round(slope * 1e3, 1)       # compute+dispatch
    out["fused_intercept_ms"] = round(intercept * 1e3, 1)  # ~readback

    # ---- raw cloud readback (f32 and f16) ----------------------------------
    mk = jax.jit(lambda s: jnp.full((480, 640, 3), s, jnp.float32))
    arrs = [mk(jnp.float32(i)).block_until_ready() for i in range(8)]
    ts = []
    for a in arrs:
        t0 = time.perf_counter()
        np.asarray(a)
        ts.append(time.perf_counter() - t0)
    out["readback_f32_ms"] = round(float(np.median(ts)) * 1e3, 1)

    mk16 = jax.jit(lambda s: jnp.full((480, 640, 3), s, jnp.float16))
    arrs = [mk16(jnp.float32(i)).block_until_ready() for i in range(8)]
    ts = []
    for a in arrs:
        t0 = time.perf_counter()
        np.asarray(a)
        ts.append(time.perf_counter() - t0)
    out["readback_f16_ms"] = round(float(np.median(ts)) * 1e3, 1)

    # ---- upload cost (camera frame) ----------------------------------------
    ts = []
    for cm in cams[:8]:
        t0 = time.perf_counter()
        jnp.asarray(cm).block_until_ready()
        ts.append(time.perf_counter() - t0)
    out["upload_uint8_ms"] = round(float(np.median(ts)) * 1e3, 1)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
