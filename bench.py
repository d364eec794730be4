"""Benchmark: ASW dense matching on Tsukuba (the reference's headline task).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpix*disp/s", "vs_baseline": N}

Methodology: median wall-clock of single calls with *varying* inputs and
full host readback (defeats async early-acks and any transport-level
result caching), on the fused one-dispatch consistent pipeline.

Robustness (round 3): the axon TPU backend can transiently fail to
initialize ("Unable to initialize backend 'axon'"), and a failed init is
cached for the life of the process. bench.py therefore runs as a
parent/child pair: the parent re-execs this file as a child process and
retries (fresh interpreter, so no cached failed backend) with backoff;
the child probes the backend first (rc=42 on init failure so the parent
knows to retry) and wraps every metric stage in try/except so a late
failure still emits a partial JSON line instead of a bare traceback.

Baseline: the reference C++ thread-pool ASW at 384x288, 11 candidates,
winSize=35, consistent — BASELINE.md's conservative figure of
1.33 Mpix*disp/s ("<1 s on 4 CPU threads",
/root/reference/simplestereo/passive.py:53-56) is kept as vs_baseline
for cross-round continuity. Measured directly on THIS host (the
reference _passive.cpp built standalone, 4 CPU threads, identical
example-010 parameters): 14.5 s/frame = 0.084 Mpix*disp/s, i.e. the
real same-machine speedup is ~16x larger than vs_baseline reports.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

_CHILD_ENV = "SSTPU_BENCH_CHILD"
_RC_BACKEND = 42  # child exit code meaning "backend init failed, retry me"
_MAX_ATTEMPTS = int(os.environ.get("SSTPU_BENCH_ATTEMPTS", "10"))
_BACKOFF_S = float(os.environ.get("SSTPU_BENCH_BACKOFF_S", "60"))


def _parent():
    """Re-exec this file as a child; retry on backend-init failures."""
    last_out, last_err = "", ""
    for attempt in range(1, _MAX_ATTEMPTS + 1):
        env = dict(os.environ, **{_CHILD_ENV: "1"})
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True)
        last_out, last_err = proc.stdout, proc.stderr
        # Forward the child's JSON line (last non-empty stdout line).
        lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
        if proc.returncode == 0 and lines:
            print(lines[-1])
            return 0
        if proc.returncode != _RC_BACKEND:
            # Real (non-init) failure: the child already tried to emit a
            # partial line; forward whatever it printed, then fail loudly.
            sys.stderr.write(proc.stderr[-4000:])
            if lines:
                print(lines[-1])
                return 0
            break
        sys.stderr.write(
            f"[bench] attempt {attempt}/{_MAX_ATTEMPTS}: TPU backend init "
            f"failed; retrying in {_BACKOFF_S:.0f}s\n")
        if attempt < _MAX_ATTEMPTS:
            time.sleep(_BACKOFF_S)
    # All attempts failed: still print ONE JSON line so the round has a
    # machine-readable artifact, and exit nonzero.
    print(json.dumps({
        "metric": "asw_tsukuba_consistent_throughput",
        "value": None, "unit": "Mpix*disp/s", "vs_baseline": None,
        "error": "TPU backend unavailable after retries",
        "stderr_tail": (last_err or last_out)[-500:],
    }))
    return 1


def _child():
    # Backend probe first: a fresh process either gets a live backend or
    # exits rc=42 so the parent retries with a fresh interpreter.
    try:
        import jax
        import jax.numpy as jnp
        jnp.zeros((8,), jnp.float32).block_until_ready()
    except Exception as e:
        sys.stderr.write(f"[bench child] backend probe failed: {e!r}\n")
        return _RC_BACKEND

    from simplestereo_tpu.imgio import imread

    d = "/root/reference/examples/res/tsukuba/"
    try:
        left = imread(d + "tsukuba_l.png")
        right = imread(d + "tsukuba_r.png")
        gt = imread(d + "groundtruth.png", grayscale=True)
        nonocc = imread(d + "nonocc.png", grayscale=True)
    except Exception:
        rng = np.random.default_rng(0)
        left = rng.integers(0, 256, (288, 384, 3), np.uint8)
        right = np.roll(left, -5, axis=1)
        gt = nonocc = None

    kw = dict(win_size=35, min_disp=4, max_disp=14, gamma_c=15.0,
              gamma_p=17.5, consistent=True)
    H, W = left.shape[:2]
    D = kw["max_disp"] - kw["min_disp"] + 1

    from simplestereo_tpu.evaluation import evaluate_disparity, tsukuba_scale

    def bad2(disp_map, disp_scale=1.0):
        return round(evaluate_disparity(
            disp_map, gt, nonocc > 0, bad_thresholds=(2.0,),
            disp_scale=disp_scale, gt_scale=tsukuba_scale)["bad2"], 4)

    extra = {}
    errors = []
    mpixdisp = None

    rightd = jnp.asarray(right)
    # distinct device-resident inputs per iteration
    lefts = [jnp.asarray(np.roll(left, i, axis=0)) for i in range(8)]
    for x in lefts:
        x.block_until_ready()

    # ---- headline: fused consistent ASW, single frame -------------------
    try:
        from simplestereo_tpu.passive.asw_pallas import asw_disparity

        np.asarray(asw_disparity(lefts[0], rightd, **kw))  # compile
        times = []
        for x in lefts:
            t0 = time.perf_counter()
            np.asarray(asw_disparity(x, rightd, **kw))
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        mpixdisp = H * W * D / dt / 1e6
        if gt is not None:
            disp0 = np.asarray(asw_disparity(jnp.asarray(left), rightd, **kw))
            extra["bad2_nonocc"] = bad2(disp0)
    except Exception as e:
        errors.append(f"asw: {e!r}")

    # ---- ASW step=2 (the mode the reference proposed, never implemented)
    try:
        from simplestereo_tpu.passive.asw_pallas import asw_disparity

        np.asarray(asw_disparity(lefts[0], rightd, step=2, **kw))  # compile
        times = []
        for x in lefts:
            t0 = time.perf_counter()
            np.asarray(asw_disparity(x, rightd, step=2, **kw))
            times.append(time.perf_counter() - t0)
        dt2 = float(np.median(times))
        extra["asw_step2_mpixdisp_per_s"] = round(H * W * D / dt2 / 1e6, 2)
        if gt is not None:
            d2 = np.asarray(asw_disparity(jnp.asarray(left), rightd, step=2,
                                          **kw))
            extra["asw_step2_bad2_nonocc"] = bad2(d2)
    except Exception as e:
        errors.append(f"asw_step2: {e!r}")

    # ---- batched ASW (frame axis folded into the Pallas kernel grid) ----
    try:
        from simplestereo_tpu.passive.asw_pallas import asw_disparity_batch

        # Device-resident varying inputs (the tunnel's ~26 MB/s host link
        # would otherwise dominate; outputs are still fully read back).
        B = 8
        s2d = jnp.asarray(np.stack([right] * B))
        stacks = []
        for i in range(4):
            s = jnp.asarray(np.stack(
                [np.roll(left, i * B + j, axis=0) for j in range(B)]))
            s.block_until_ready()
            stacks.append(s)
        np.asarray(asw_disparity_batch(stacks[0], s2d, **kw))  # compile
        times = []
        for s1v in stacks:
            t0 = time.perf_counter()
            np.asarray(asw_disparity_batch(s1v, s2d, **kw))
            times.append(time.perf_counter() - t0)
        dtb = float(np.median(times)) / B
        extra["asw_batch8_mpixdisp_per_s"] = round(H * W * D / dtb / 1e6, 2)
    except Exception as e:
        errors.append(f"asw_batch8: {e!r}")

    # ---- SGM (replaces the reference's cv2.StereoSGBM delegation) -------
    try:
        from simplestereo_tpu.passive.sgm import StereoSGM

        # Tuned Tsukuba operating point (census cost, uniqueness test off
        # keeps the nonocc evaluation dense): bad-2.0 2.7% (the tuned BT
        # point P1=36 P2=144 pfcap=15 scores 3.1%).
        sgm = StereoSGM(minDisparity=0, numDisparities=16, blockSize=3,
                        P1=120, P2=480, uniquenessRatio=0,
                        costMethod="census", censusWindow=7)
        sgm.compute(left, rightd)  # compile
        times = []
        for x in lefts:
            t0 = time.perf_counter()
            np.asarray(sgm.compute(x, rightd))
            times.append(time.perf_counter() - t0)
        dts = float(np.median(times))
        extra["sgm_mpixdisp_per_s"] = round(H * W * 16 / dts / 1e6, 2)
        if gt is not None:
            dsg = sgm.compute(left, rightd)
            extra["sgm_bad2_nonocc"] = bad2(dsg, disp_scale=1 / 16.0)
    except Exception as e:
        errors.append(f"sgm: {e!r}")

    # ---- batched SGM ------------------------------------------------------
    try:
        from simplestereo_tpu.passive.sgm import _sgm_disparity_batch

        B = 8
        s2d = jnp.asarray(np.stack([np.asarray(right)] * B))
        stacks = []
        for i in range(4):
            s = jnp.asarray(np.stack(
                [np.roll(left, i * B + j, axis=0) for j in range(B)]))
            s.block_until_ready()
            stacks.append(s)
        bkw = dict(min_disp=0, num_disp=16, block_size=3, P1=36.0,
                   P2=144.0, paths=8, prefilter_cap=15.0, uniqueness=0.0,
                   disp12_max_diff=-1, subpixel=True, aggregator="pallas")
        np.asarray(_sgm_disparity_batch(stacks[0], s2d, **bkw))  # compile
        times = []
        for s1v in stacks:
            t0 = time.perf_counter()
            np.asarray(_sgm_disparity_batch(s1v, s2d, **bkw))
            times.append(time.perf_counter() - t0)
        dtsb = float(np.median(times)) / B
        extra["sgm_batch8_mpixdisp_per_s"] = round(
            H * W * 16 / dtsb / 1e6, 2)
    except Exception as e:
        errors.append(f"sgm_batch8: {e!r}")

    # ---- GSW (closed-form weights + Pallas kernel, round 3) -------------
    # The reference's chamfer recursion provably collapses to the direct
    # color distance (gsw.py:_gsw_weights); on TPU the engine="auto"
    # default routes to the Pallas kernel (gsw_pallas.py — bit-exact vs
    # the XLA path on hardware, 2.4x faster). Tuned Tsukuba quality
    # point: win=23, gamma=12.5, fMax=20, consistent -> bad-2.0 2.4%
    # (round-2 defaults scored 7.4%).
    try:
        from simplestereo_tpu.passive.gsw import gsw_disparity

        gkw = dict(win_size=23, min_disp=4, max_disp=14, gamma=12.5,
                   f_max=20.0, iterations=1, consistent=True)
        np.asarray(gsw_disparity(lefts[0], rightd, **gkw))  # compile
        times = []
        for x in lefts:
            t0 = time.perf_counter()
            np.asarray(gsw_disparity(x, rightd, **gkw))
            times.append(time.perf_counter() - t0)
        dtg = float(np.median(times))
        extra["gsw_mpixdisp_per_s"] = round(H * W * D / dtg / 1e6, 2)
        if gt is not None:
            dg = np.asarray(gsw_disparity(jnp.asarray(left), rightd, **gkw))
            extra["gsw_bad2_nonocc"] = bad2(dg)
    except Exception as e:
        errors.append(f"gsw: {e!r}")

    # ---- batched GSW (Pallas kernel; both matching directions of every
    # frame ride the kernel's frame-grid axis in ONE launch) ------------
    try:
        from simplestereo_tpu.passive.gsw_pallas import (
            gsw_disparity_pallas_batch)

        B = 8
        s2d = jnp.asarray(np.stack([right] * B))
        stacks = []
        for i in range(4):
            s = jnp.asarray(np.stack(
                [np.roll(left, i * B + j, axis=0) for j in range(B)]))
            s.block_until_ready()
            stacks.append(s)
        gbkw = dict(win_size=23, min_disp=4, max_disp=14, gamma=12.5,
                    f_max=20.0, consistent=True)
        np.asarray(gsw_disparity_pallas_batch(stacks[0], s2d, **gbkw))
        times = []
        for s1v in stacks:
            t0 = time.perf_counter()
            np.asarray(gsw_disparity_pallas_batch(s1v, s2d, **gbkw))
            times.append(time.perf_counter() - t0)
        dtgb = float(np.median(times)) / B
        extra["gsw_batch8_mpixdisp_per_s"] = round(H * W * D / dtgb / 1e6, 2)
    except Exception as e:
        errors.append(f"gsw_batch8: {e!r}")

    # ---- FTP structured-light cloud (BASELINE.json config #5) ----------
    try:
        from simplestereo_tpu import StereoRig, warp
        from simplestereo_tpu.active import buildFringe, StereoFTP
        from simplestereo_tpu.geometry.npgeom import rodrigues_to_matrix

        res = (640, 480)
        Kf = np.array([[700.0, 0, 319.5], [0, 700.0, 239.5], [0, 0, 1]])
        Rf = rodrigues_to_matrix(np.array([0.0, -0.05, 0.0]))
        Tf = np.array([[-200.0], [5.0], [30.0]])
        rig = StereoRig(res, res, Kf, Kf, None, None, Rf, Tf)
        fringe = buildFringe(16.0, dims=res, stripeColor="red")
        z0 = 2600.0
        gxf, gyf = np.meshgrid(np.arange(res[0], dtype=float),
                               np.arange(res[1], dtype=float))
        rays = np.stack([gxf, gyf, np.ones_like(gxf)], -1) \
            @ np.linalg.inv(Kf).T
        q = (z0 * rays @ Rf.T + Tf.ravel()) @ Kf.T
        cam = np.asarray(warp.remap(
            jnp.asarray(fringe),
            jnp.asarray(q[..., 0] / q[..., 2], jnp.float32),
            jnp.asarray(q[..., 1] / q[..., 2], jnp.float32),
            interpolation="linear"))
        ftp = StereoFTP(rig, fringe, 16.0)
        rngf = np.random.default_rng(0)
        # distinct inputs per call (±2-gray sensor noise; full host
        # pipeline incl. stripe estimation runs every call)
        cams = [np.clip(cam.astype(np.int16)
                        + rngf.integers(-2, 3, cam.shape), 0, 255)
                .astype(np.uint8) for _ in range(4)]
        ftp.getCloud(cams[0])  # compile
        times = []
        for cm in cams:
            t0 = time.perf_counter()
            cl = ftp.getCloud(cm)
            times.append(time.perf_counter() - t0)
        dtf = float(np.median(times))
        extra["ftp_cloud_640x480_ms"] = round(dtf * 1e3, 1)
        extra["ftp_cloud_mpix_per_s"] = round(
            res[0] * res[1] / dtf / 1e6, 2)
        cz = cl[40:-40, 40:-40, 2]
        cz = cz[np.isfinite(cz)]
        extra["ftp_plane_median_z_err_pct"] = round(
            abs(float(np.median(cz)) - z0) / z0 * 100, 4)
    except Exception as e:
        errors.append(f"ftp: {e!r}")

    baseline = 1.33  # Mpix*disp/s (reference, 4 CPU threads)
    out = {
        "metric": "asw_tsukuba_consistent_throughput",
        "value": round(mpixdisp, 2) if mpixdisp is not None else None,
        "unit": "Mpix*disp/s",
        "vs_baseline": (round(mpixdisp / baseline, 2)
                        if mpixdisp is not None else None),
        **extra,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    return 0


def main():
    if os.environ.get(_CHILD_ENV):
        return _child()
    return _parent()


if __name__ == "__main__":
    sys.exit(main())
