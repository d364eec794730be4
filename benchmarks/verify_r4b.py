"""Round-4 verification driver B (real TPU, real data).

This session's surface changes, driven end-to-end on the reference's
committed stereoFTP rig (res/stereoFTP/: 1920x1080 camera, 1280x720
projector, real calibration):

1. ``StereoFTP.getCloudBatch`` vs per-frame ``getCloud`` parity at full
   rig resolution (B=2 synthetic plane captures at different depths,
   example-103 construction) + plane-z accuracy for every frame;
2. ``out_dtype=np.float16`` batch path: on-device cast, z agreement
   within f16 quantization of the f64 path;
3. ``StereoFTP_Mapping.getCloudBatch`` must raise TypeError (the classic
   no-virtual-reference pipeline must not silently run the base fused
   pipeline);
4. rough per-frame timing, batch vs single (varying inputs, full
   readback — verification, not bench).

Prints one JSON line.
"""
import json
import sys
import time

import numpy as np


def _plane_capture(rig, fringe, z0):
    import jax.numpy as jnp
    from simplestereo_tpu import warp

    K1 = np.asarray(rig.intrinsic1, float)
    K2 = np.asarray(rig.intrinsic2, float)
    R = np.asarray(rig.R, float)
    T = np.asarray(rig.T, float).ravel()
    w, h = rig.res1
    xs, ys = np.meshgrid(np.arange(w, dtype=float),
                         np.arange(h, dtype=float))
    rays = np.stack([xs, ys, np.ones_like(xs)], -1) @ np.linalg.inv(K1).T
    q = (z0 * rays @ R.T + T) @ K2.T
    return np.asarray(warp.remap(
        jnp.asarray(fringe),
        jnp.asarray(q[..., 0] / q[..., 2], jnp.float32),
        jnp.asarray(q[..., 1] / q[..., 2], jnp.float32),
        interpolation="linear"))


def main():
    import jax

    print("devices:", jax.devices(), file=sys.stderr, flush=True)

    import simplestereo_tpu as ss
    from simplestereo_tpu.imgio import imread

    res = "/root/reference/examples/res/stereoFTP/"
    rig = ss.StereoRig.fromFile(res + "stereoRig.json")
    fringe = imread(res + "fringe8.png")
    ftp = ss.active.StereoFTP(rig, fringe, period=8)
    w, h = rig.res1

    depths = [1500.0, 1600.0]
    caps = [_plane_capture(rig, fringe, z) for z in depths]
    stack = np.stack(caps)
    out = {"rig_res": [w, h]}

    # 1. batch vs single parity + plane accuracy
    t0 = time.perf_counter()
    batch = ftp.getCloudBatch(stack)
    out["batch_first_call_s"] = round(time.perf_counter() - t0, 1)
    assert batch.shape == (2, h, w, 3), batch.shape
    dz_max, zerr = [], []
    for b, z in enumerate(depths):
        single = ftp.getCloud(caps[b])
        both = np.isfinite(single[..., 2]) & np.isfinite(batch[b, ..., 2])
        assert both.mean() > 0.9, both.mean()
        dz_max.append(float(
            np.abs(single[..., 2] - batch[b, ..., 2])[both].max()))
        cz = batch[b, h // 4: -h // 4, w // 4: -w // 4, 2]
        cz = cz[np.isfinite(cz)]
        zerr.append(round(abs(float(np.median(cz)) - z) / z * 100, 3))
    out["batch_vs_single_dz_max"] = [round(d, 5) for d in dz_max]
    out["plane_z_err_pct"] = zerr
    assert max(dz_max) < 1e-2, dz_max

    # 2. f16 on-device cast
    b16 = ftp.getCloudBatch(stack, out_dtype=np.float16)
    assert b16.dtype == np.float16, b16.dtype
    both = np.isfinite(batch[..., 2]) & np.isfinite(
        b16[..., 2].astype(np.float64))
    # RELATIVE gate: f16 quantization is 1 ulp = 2^-11 relative; the
    # cloud contains large-z off-plane points (z ~ 3e4 near disparity 0)
    # where the absolute ulp is ~16, so an absolute gate is meaningless.
    rel = (np.abs(batch[..., 2] - b16[..., 2].astype(np.float64))
           / np.maximum(np.abs(batch[..., 2]), 1.0))[both]
    out["f16_dz_rel_max"] = round(float(rel.max()), 6)
    assert rel.max() <= 2.0 ** -10, rel.max()  # 2 f16 ulps

    # 3. Mapping rejection
    mapping = ss.active.StereoFTP_Mapping(rig, fringe, period=8)
    try:
        mapping.getCloudBatch(stack)
        raise AssertionError("Mapping.getCloudBatch did not raise")
    except TypeError:
        out["mapping_batch_raises"] = True

    # 4. rough timing, varying inputs, full readback
    rng = np.random.default_rng(0)

    def jitter(c):
        return np.clip(c.astype(np.int16) + rng.integers(-2, 3, c.shape),
                       0, 255).astype(np.uint8)

    stacks = [np.stack([jitter(c) for c in caps]) for _ in range(3)]
    ftp.getCloudBatch(stacks[0])  # warm
    ts = []
    for s in stacks:
        t0 = time.perf_counter()
        ftp.getCloudBatch(s)
        ts.append(time.perf_counter() - t0)
    out["batch_ms_per_frame"] = round(float(np.median(ts)) / 2 * 1e3, 1)
    singles = [jitter(caps[0]) for _ in range(3)]
    ftp.getCloud(singles[0])
    ts = []
    for im in singles:
        t0 = time.perf_counter()
        ftp.getCloud(im)
        ts.append(time.perf_counter() - t0)
    out["single_ms_per_frame"] = round(float(np.median(ts)) * 1e3, 1)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
