"""Real-TPU smoke suite (SST_TEST_TPU=1 only).

CPU/interpret runs CANNOT catch Mosaic lowering and hardware-semantics
failures (vmap-over-pallas_call, tpu.dynamic_rotate amount rules, bf16-pass
matmul precision) — see CLAUDE.md. This suite jits the load-bearing program
shapes on the real chip with tiny shapes so a round's TPUCHECK artifact can
certify them.

Run: SST_TEST_TPU=1 python -m pytest tests/test_tpu_smoke.py -q
(expect several minutes: remote compiles serialize).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("SST_TEST_TPU"),
    reason="real-TPU smoke suite (set SST_TEST_TPU=1)")


@pytest.fixture(scope="module")
def tpu_ok():
    import jax
    if jax.default_backend() == "cpu":
        pytest.skip("no TPU backend")
    return True


def test_asw_small_consistent(tpu_ok, rng):
    """Pallas kernel, consistent mode, unrolled-D path on hardware."""
    from simplestereo_tpu.passive import asw_disparity
    img1 = rng.integers(0, 256, (24, 48, 3), np.uint8)
    img2 = np.roll(img1, -3, axis=1)
    d = np.asarray(asw_disparity(img1, img2, win_size=9, max_disp=6,
                                 consistent=True))
    inner = d[8:-8, 12:-12]
    assert (inner == 3).mean() > 0.9


def test_asw_batched_grid_lowers_and_matches(tpu_ok, rng):
    """The batched kernel (frame axis in the Pallas grid) must LOWER and
    run on real hardware — the old vmap-over-pallas_call shape did not
    (ANY-memspace operand can't take a squeezed batch dim; interpret mode
    hides it). Must be bit-identical to per-frame runs."""
    from simplestereo_tpu.passive import asw_disparity, asw_disparity_batch
    imgs1 = rng.integers(0, 256, (2, 24, 48, 3), np.uint8)
    imgs2 = np.roll(imgs1, -3, axis=2)
    kw = dict(win_size=9, max_disp=6, consistent=True)
    batch = np.asarray(asw_disparity_batch(imgs1, imgs2, **kw))
    for i in range(2):
        np.testing.assert_array_equal(
            batch[i], np.asarray(asw_disparity(imgs1[i], imgs2[i], **kw)))


def test_sharded_batched_program_on_one_device_mesh(tpu_ok, rng):
    """The EXACT dryrun_multichip program shape (shard_map over a mesh,
    halo ppermute, batched Pallas grid) jitted on a 1-device mesh on the
    real chip — this is the shape that reproduces the round-1 vmap
    lowering failure when it regresses."""
    import jax
    import jax.numpy as jnp
    from simplestereo_tpu import parallel

    mesh = parallel.make_mesh({"rows": 1, "batch": 1},
                              devices=jax.devices()[:1])
    imgs1 = rng.integers(0, 256, (2, 16, 32, 3), np.uint8)
    imgs2 = np.roll(imgs1, -2, axis=2)
    tiled = np.asarray(parallel.tiled_asw_disparity_batch(
        imgs1, imgs2, mesh, win_size=5, max_disp=4, consistent=True))
    from simplestereo_tpu.passive import asw_disparity
    for i in range(2):
        single = np.asarray(asw_disparity(
            imgs1[i], imgs2[i], win_size=5, max_disp=4, consistent=True))
        assert (tiled[i] == single).mean() > 0.995


def test_ftp_tiny_frame(tpu_ok):
    """FTP fused pipeline end-to-end on hardware (catches bf16-pass
    matmul precision loss in the projector mapping — geometry paths must
    pin HIGHEST precision)."""
    import jax.numpy as jnp
    import simplestereo_tpu as ss
    from simplestereo_tpu.active import StereoFTP, buildFringe
    from simplestereo_tpu import warp
    from simplestereo_tpu.geometry.npgeom import rodrigues_to_matrix

    CAM = PROJ = (128, 96)
    K = np.array([[140., 0, 63.5], [0, 140., 47.5], [0, 0, 1]])
    R = rodrigues_to_matrix(np.array([0.0, -0.05, 0.0]))
    T = np.array([[-40.], [1.0], [6.0]])
    rig = ss.StereoRig(CAM, PROJ, K, K, None, None, R, T)

    period = 16.0
    fringe = buildFringe(period, dims=PROJ, stripeColor="green")
    z0 = 520.0
    w, h = CAM
    xs, ys = np.meshgrid(np.arange(w) + 0.0, np.arange(h) + 0.0)
    p = np.stack([xs, ys, np.ones_like(xs)], -1)
    rays = p @ np.linalg.inv(K).T
    P = z0 * rays
    q = (P @ R.T + T.ravel()) @ K.T
    mapu, mapv = q[..., 0] / q[..., 2], q[..., 1] / q[..., 2]
    cam = np.asarray(warp.remap(
        jnp.asarray(fringe), jnp.asarray(mapu, np.float32),
        jnp.asarray(mapv, np.float32), interpolation="linear"))

    ftp = StereoFTP(rig, fringe, period, stripeColor="green")
    cloud = ftp.getCloud(cam)
    z = cloud[20:-20, 20:-20, 2]
    ok = np.isfinite(z)
    assert ok.mean() > 0.9
    assert abs(np.median(z[ok]) - z0) < 0.03 * z0


def test_rectify_device_remap(tpu_ok, ref_res):
    """Rectification maps + device remap on hardware, golden rig."""
    import simplestereo_tpu as ss
    from simplestereo_tpu import rectification
    from simplestereo_tpu.imgio import imread
    rig = ss.StereoRig.fromFile(str(ref_res / "2" / "rig.json"))
    rect = rectification.directRectify(rig)
    rect.computeRectificationMaps()
    imgL = imread(str(ref_res / "2" / "lawn_L.png"))
    imgR = imread(str(ref_res / "2" / "lawn_R.png"))
    rL, rR = rect.rectifyImages(imgL, imgR)
    assert rL.shape == imgL.shape and np.asarray(rL).any()


def test_sgm_pallas_aggregation_on_hardware(tpu_ok, rng):
    """The streaming SGM scan kernels (double-buffered DMA, dynamic
    leading-index loads) must lower and match the lax.scan aggregation
    on the real chip."""
    from simplestereo_tpu.passive import StereoSGM
    img1 = rng.integers(0, 256, (32, 48, 3), np.uint8)
    img2 = np.roll(img1, -3, axis=1)
    m = StereoSGM(minDisparity=0, numDisparities=8, blockSize=3)
    a = m.compute(img1, img2, aggregator="scan")
    b = m.compute(img1, img2, aggregator="pallas")
    assert (a == b).mean() > 0.999
    batch = m.computeBatch(np.stack([img1, img1]), np.stack([img2, img2]))
    assert (batch[0] == b).mean() > 0.999


def test_asw_consistent_negative_mindisp_large_d(tpu_ok, rng):
    """Consistent mode with minDisparity < 0 on the D>16 fori path: the
    costR lane rotate uses lax.rem(w_acc - d, w_acc) to stay inside the
    hardware-validated [0, lanes] dynamic_rotate range — interpret mode
    cannot catch a mis-rotation there, only this run can."""
    from simplestereo_tpu.passive import asw_disparity
    img1 = rng.integers(0, 256, (20, 40, 3), np.uint8)
    img2 = np.roll(img1, 2, axis=1)   # true disparity -2
    d = np.asarray(asw_disparity(img1, img2, win_size=5, min_disp=-3,
                                 max_disp=16, consistent=True))
    inner = d[6:-6, 8:-8]
    assert (inner == -2).mean() > 0.9


def test_sgm_census_cost_on_hardware(tpu_ok, rng):
    """Census cost (uint32 bit-packing + lax.population_count) must lower
    and recover a known shift on the real chip."""
    from simplestereo_tpu.passive import StereoSGM
    img1 = rng.integers(0, 256, (32, 48, 3), np.uint8)
    img2 = np.roll(img1, -3, axis=1)
    m = StereoSGM(minDisparity=0, numDisparities=8, blockSize=3,
                  P1=56, P2=224, costMethod="census", censusWindow=7)
    d = np.asarray(m.compute(img1, img2))
    inner = np.round(d[8:-8, 12:-12] / 16.0)
    assert (inner == 3).mean() > 0.9


def test_asw_wide_strip_walk_on_hardware(tpu_ok, rng):
    """The wide-strip disparity walk (one static slice per candidate
    when max_disp <= pad — the headline win=35 configuration's path)
    must lower and match on hardware, consistent + subpixel."""
    from simplestereo_tpu.passive import asw_disparity
    img1 = rng.integers(0, 256, (24, 48, 3), np.uint8)
    img2 = np.roll(img1, -3, axis=1)
    kw = dict(win_size=11, min_disp=0, max_disp=4, consistent=True)
    d = np.asarray(asw_disparity(img1, img2, **kw))
    assert (d[8:-8, 12:-12] == 3).mean() > 0.9
    s = np.asarray(asw_disparity(img1, img2, subpixel=True, **kw))
    assert np.abs(s - d).max() <= 0.5 + 1e-6


def test_wls_filter_on_hardware(tpu_ok, rng):
    """The WLS tridiagonal lax.scan solves must lower and fill a
    zero-confidence block from its neighborhood on the real chip."""
    from simplestereo_tpu.passive import wls_filter_disparity
    d = np.full((24, 40), 6.0 * 16, np.float32)
    d[10:14, 16:24] = -16.0
    out = wls_filter_disparity(d, np.zeros((24, 40)), lambda_=64.0,
                               invalid=-16, disp_scale=1 / 16.0)
    assert np.abs(out - 6.0).max() < 0.2


def test_asw_subpixel_on_hardware(tpu_ok, rng):
    """Subpixel output path (one-hot neighbor-cost extraction + extra f32
    kernel output) must lower and bound deltas on the real chip."""
    from simplestereo_tpu.passive import asw_disparity
    img1 = rng.integers(0, 256, (24, 48, 3), np.uint8)
    img2 = np.roll(img1, -3, axis=1)
    # max_disp=6 covers the unrolled path, 20 the D>16 fori one-hot path
    # (dynamically-indexed ref reads inside fori — the pattern class
    # CLAUDE.md says must be probed on hardware, interpret mode hides it)
    for maxd in (6, 20):
        kw = dict(win_size=9, max_disp=maxd, consistent=True)
        di = np.asarray(asw_disparity(img1, img2, **kw))
        ds = np.asarray(asw_disparity(img1, img2, subpixel=True, **kw))
        assert ds.dtype == np.float32
        assert np.abs(ds - di).max() <= 0.5 + 1e-6
        inner = ds[8:-8, 12:-12]
        assert (np.abs(inner - 3) <= 0.5).mean() > 0.9


def test_asw_context_mode_on_hardware(tpu_ok, rng):
    """Round 3: context mode (halo rows are window sources only) changed
    the kernel's row layout (pad_top=0); interpret mode cannot certify
    the Mosaic lowering. Context output must equal the middle rows of
    the full-frame run bit-exactly."""
    from simplestereo_tpu.passive import asw_disparity
    win = 9
    pad = win // 2
    img1 = rng.integers(0, 256, (32 + 2 * pad, 48, 3), np.uint8)
    img2 = np.roll(img1, -3, axis=1)
    kw = dict(win_size=win, max_disp=6, consistent=True)
    full = np.asarray(asw_disparity(img1, img2, **kw))
    import jax.numpy as jnp
    rv = jnp.ones((img1.shape[0],), bool)
    ctx = np.asarray(asw_disparity(img1, img2, row_valid=rv, context=True,
                                   **kw))
    np.testing.assert_array_equal(ctx, full[pad:-pad])


def test_gsw_closed_form_on_hardware(tpu_ok, rng):
    """Round 3: GSW's closed-form weights + stacked mul-reduce cost on
    the real chip (exp underflow semantics, big stacked reduces)."""
    from simplestereo_tpu.passive import StereoGSW
    img1 = rng.integers(0, 256, (24, 48, 3), np.uint8)
    img2 = np.roll(img1, -3, axis=1)
    m = StereoGSW(winSize=7, maxDisparity=6, gamma=12.5, fMax=20,
                  consistent=True)
    d = m.compute(img1, img2)
    inner = d[6:-6, 10:-10]
    assert (inner == 3).mean() > 0.9


def test_gsw_pallas_vs_xla_on_hardware(tpu_ok, rng):
    """Round 3: the GSW Pallas kernel (engine='auto' default on TPU) vs
    the fused-XLA path on the real chip — bit-exact (GSW's unnormalized
    integer-separated costs don't hit exp/sqrt near-ties the way ASW's
    normalized costs do; full-frame Tsukuba parity in
    benchmarks/verify_r3c.py measured mismatch 0.0)."""
    from simplestereo_tpu.passive.gsw import gsw_disparity
    img1 = rng.integers(0, 256, (24, 48, 3), np.uint8)
    img2 = np.roll(img1, -3, axis=1)
    kw = dict(win_size=7, max_disp=6, min_disp=-2, gamma=12.5, f_max=20.0,
              consistent=True)
    a = np.asarray(gsw_disparity(img1, img2, engine="xla", **kw))
    b = np.asarray(gsw_disparity(img1, img2, engine="pallas", **kw))
    np.testing.assert_array_equal(a, b)


def test_gsw_mi_pallas_on_hardware(tpu_ok, rng):
    """Round 4: the MI cost on the kernel (ext_vol path — pre-built
    table-lookup volume DMA'd inside the slab, window walk unchanged)
    must lower and track the XLA MI form on the real chip. MI costs are
    sums of arbitrary table floats, so hardware exp/sqrt ulp flips CAN
    occur (unlike SD's integer-separated costs) — gate at 1%."""
    from simplestereo_tpu.passive.gsw import gsw_disparity
    img1 = rng.integers(0, 256, (24, 48, 3), np.uint8)
    img2 = np.roll(img1, -3, axis=1)
    kw = dict(win_size=7, max_disp=6, min_disp=-2, gamma=12.5,
              cost_method="mi", bins=8, mi_iterations=2, consistent=True)
    a = np.asarray(gsw_disparity(img1, img2, engine="xla", **kw))
    b = np.asarray(gsw_disparity(img1, img2, engine="pallas", **kw))
    assert (a != b).mean() <= 0.01, (a != b).mean()


def test_gsw_pallas_batch_on_hardware(tpu_ok, rng):
    """Batched GSW lowers on real TPU (frame axis + both consistent-mode
    directions on the kernel grid — never vmap-of-pallas) and matches
    per-frame results."""
    from simplestereo_tpu.passive.gsw import StereoGSW
    imgs1 = rng.integers(0, 256, (2, 16, 40, 3), np.uint8)
    imgs2 = np.stack([np.roll(a, -2, axis=1) for a in imgs1])
    m = StereoGSW(winSize=5, maxDisparity=4, consistent=True)
    db = m.computeBatch(imgs1, imgs2)
    for i in range(2):
        np.testing.assert_array_equal(db[i], m.compute(imgs1[i], imgs2[i]))


def _tiny_ftp_scene():
    import jax.numpy as jnp
    import simplestereo_tpu as ss
    from simplestereo_tpu.active import StereoFTP, buildFringe
    from simplestereo_tpu import warp
    from simplestereo_tpu.geometry.npgeom import rodrigues_to_matrix

    CAM = PROJ = (128, 96)
    K = np.array([[140., 0, 63.5], [0, 140., 47.5], [0, 0, 1]])
    R = rodrigues_to_matrix(np.array([0.0, -0.05, 0.0]))
    T = np.array([[-40.], [1.0], [6.0]])
    rig = ss.StereoRig(CAM, PROJ, K, K, None, None, R, T)
    period = 16.0
    fringe = buildFringe(period, dims=PROJ, stripeColor="green")
    z0 = 520.0
    w, h = CAM
    xs, ys = np.meshgrid(np.arange(w) + 0.0, np.arange(h) + 0.0)
    rays = np.stack([xs, ys, np.ones_like(xs)], -1) @ np.linalg.inv(K).T
    q = (z0 * rays @ R.T + T.ravel()) @ K.T
    cam = np.asarray(warp.remap(
        jnp.asarray(fringe), jnp.asarray(q[..., 0] / q[..., 2], np.float32),
        jnp.asarray(q[..., 1] / q[..., 2], np.float32),
        interpolation="linear"))
    ftp = StereoFTP(rig, fringe, period, stripeColor="green")
    return rig, ftp, cam, z0


def test_ftp_cloud_batch_on_hardware(tpu_ok):
    """Round 4: getCloudBatch (vmapped fused pipeline, 2 device programs
    per stack) and the out_dtype=f16 on-device cast must lower and match
    the per-frame path on the real chip."""
    _, ftp, cam, z0 = _tiny_ftp_scene()
    imgs = np.stack([cam, np.roll(cam, 1, axis=0)])
    batch = ftp.getCloudBatch(imgs)
    single = ftp.getCloud(cam)
    both = np.isfinite(single[..., 2]) & np.isfinite(batch[0, ..., 2])
    assert both.mean() > 0.9
    assert np.abs(single[..., 2] - batch[0, ..., 2])[both].max() < 1e-2

    b16 = ftp.getCloudBatch(imgs, out_dtype=np.float16)
    assert b16.dtype == np.float16
    both = np.isfinite(batch[..., 2]) & np.isfinite(
        b16[..., 2].astype(np.float64))
    d16 = np.abs(batch[..., 2] - b16[..., 2].astype(np.float64))[both]
    assert d16.max() <= 1.0, d16.max()  # 2 f16 ulps at z ~ 520


def test_graycode_cloud_fused_on_hardware(tpu_ok):
    """Round 4: the fused Gray-code decode + dense epipolar triangulation
    device program (graycode._graycode_cloud_device) recovers a known
    plane on the real chip — catches bf16-pass matmul precision loss in
    the new device triangulation (it must pin HIGHEST)."""
    import jax.numpy as jnp
    import simplestereo_tpu as ss
    from simplestereo_tpu.active import GrayCode
    from simplestereo_tpu.active.patterns import graycode_patterns
    from simplestereo_tpu import warp
    from simplestereo_tpu.geometry.npgeom import rodrigues_to_matrix

    CAM = PROJ = (128, 96)
    K = np.array([[140., 0, 63.5], [0, 140., 47.5], [0, 0, 1]])
    R = rodrigues_to_matrix(np.array([0.0, -0.05, 0.0]))
    T = np.array([[-40.], [1.0], [6.0]])
    rig = ss.StereoRig(CAM, PROJ, K, K, None, None, R, T)
    gc = GrayCode(rig)
    pats, _, _ = graycode_patterns(PROJ)

    z0 = 520.0
    w, h = CAM
    xs, ys = np.meshgrid(np.arange(w) + 0.0, np.arange(h) + 0.0)
    rays = np.stack([xs, ys, np.ones_like(xs)], -1) @ np.linalg.inv(K).T
    q = (z0 * rays @ R.T + T.ravel()) @ K.T
    mapu = jnp.asarray(q[..., 0] / q[..., 2], np.float32)
    mapv = jnp.asarray(q[..., 1] / q[..., 2], np.float32)
    caps = [np.asarray(warp.remap(jnp.asarray(p), mapu, mapv,
                                  interpolation="linear"))
            for p in pats]
    cloud = gc.getCloud(caps).reshape(-1, 3)
    z = cloud[np.isfinite(cloud[:, 2]), 2]
    assert len(z) > 0.5 * w * h
    assert abs(np.median(z) - z0) < 0.03 * z0


def test_gsw_normalize_pallas_on_hardware(tpu_ok, rng):
    """Round 4: the in-kernel normalize denominator (wsum per column
    offset + per-(offset, d) lane-validity MAC) must lower and track the
    XLA form on the real chip. Normalized costs are float ratios, so
    hardware exp/sqrt ulp flips CAN occur — gate at 1%."""
    from simplestereo_tpu.passive.gsw import gsw_disparity
    img1 = rng.integers(0, 256, (24, 48, 3), np.uint8)
    img2 = np.roll(img1, -3, axis=1)
    kw = dict(win_size=7, max_disp=6, min_disp=-2, gamma=10.0,
              f_max=60.0, consistent=True, normalize=True)
    a = np.asarray(gsw_disparity(img1, img2, engine="xla", **kw))
    b = np.asarray(gsw_disparity(img1, img2, engine="pallas", **kw))
    assert (a != b).mean() <= 0.01, (a != b).mean()


# --------------------------------------------------------------------------
# Round 5 (VERDICT r4 item 4): the FTP variants and the phase-shift
# pro-cam calibration run their own device code, and the
# f32-matmul-precision bug class is invisible on CPU (CLAUDE.md — it was
# caught on the base FTP path only by real-TPU e2e). One hardware e2e
# each, with z-err / pose gates.
# --------------------------------------------------------------------------

def test_ftp_anaglyph_on_hardware(tpu_ok):
    """StereoFTPAnaglyph (normalized B-R grayscale, reference
    active.py:844-1128) recovers a known plane on the real chip."""
    import jax.numpy as jnp
    import simplestereo_tpu as ss
    from simplestereo_tpu.active import StereoFTPAnaglyph, \
        buildAnaglyphFringe
    from simplestereo_tpu import warp
    from simplestereo_tpu.geometry.npgeom import rodrigues_to_matrix

    CAM = PROJ = (128, 96)
    K = np.array([[140., 0, 63.5], [0, 140., 47.5], [0, 0, 1]])
    R = rodrigues_to_matrix(np.array([0.0, -0.05, 0.0]))
    T = np.array([[-40.], [1.0], [6.0]])
    rig = ss.StereoRig(CAM, PROJ, K, K, None, None, R, T)
    period, z0 = 16.0, 520.0
    fringe = buildAnaglyphFringe(period, dims=PROJ)
    w, h = CAM
    xs, ys = np.meshgrid(np.arange(w) + 0.0, np.arange(h) + 0.0)
    rays = np.stack([xs, ys, np.ones_like(xs)], -1) @ np.linalg.inv(K).T
    q = (z0 * rays @ R.T + T.ravel()) @ K.T
    cam = np.asarray(warp.remap(
        jnp.asarray(fringe), jnp.asarray(q[..., 0] / q[..., 2], np.float32),
        jnp.asarray(q[..., 1] / q[..., 2], np.float32),
        interpolation="linear"))
    ftp = StereoFTPAnaglyph(rig, fringe, period, stripeColor="green")
    cloud = ftp.getCloud(cam)
    z = cloud[20:-20, 20:-20, 2]
    z = z[np.isfinite(z)]
    assert len(z) > 0.8 * (h - 40) * (w - 40)
    assert abs(np.median(z) - z0) < 0.03 * z0


def test_ftp_mapping_on_hardware(tpu_ok):
    """StereoFTP_Mapping (classic FTP, no virtual reference — reference
    active.py:1266-1450) on the real chip; its own absolute-phase +
    projector-x math must inherit the HIGHEST-precision pins."""
    from simplestereo_tpu.active import StereoFTP_Mapping

    rig, _, cam, z0 = _tiny_ftp_scene()
    from simplestereo_tpu.active import buildFringe
    fringe = buildFringe(16.0, dims=(128, 96), stripeColor="green")
    ftp = StereoFTP_Mapping(rig, fringe, 16.0, stripeColor="green")
    cloud = ftp.getCloud(cam)
    z = cloud[30:-30, 30:-30, 2]
    z = z[np.isfinite(z)]
    assert len(z) > 0
    # classic FTP (no virtual reference) is cruder; accept 10% (same
    # gate as the CPU e2e)
    assert abs(np.median(z) - z0) < 0.1 * z0


def test_ftp_phase_only_on_hardware(tpu_ok):
    """StereoFTP_PhaseOnly (reference active.py:1703-2074): phase maps
    on the real chip — object == reference plane gives ~constant
    difference phase."""
    from simplestereo_tpu.active import StereoFTP_PhaseOnly

    rig, _, cam, z0 = _tiny_ftp_scene()
    from simplestereo_tpu.active import buildFringe
    fringe = buildFringe(16.0, dims=(128, 96), stripeColor="green")
    ftp = StereoFTP_PhaseOnly(rig, fringe, 16.0, stripeColor="green")
    phase = ftp.getPhase(cam)
    assert phase.shape == (96, 128)
    inner = phase[20:-20, 20:-20]
    assert np.isfinite(inner).mean() > 0.9
    assert np.nanstd(inner) < 0.5


def test_phaseshift_procam_on_hardware(tpu_ok):
    """phaseShift camera-projector calibration (reference
    calibration.py:617-782) end-to-end on the real chip: synthetic
    4-step captures, heterodyne unwrap, chessboard detection and the LM
    bundle adjustment must recover the ground-truth projector pose."""
    import test_procam as tp

    periods = [[256.0, 32.0], [192.0, 24.0]]
    from simplestereo_tpu.calibration.procam import phaseShift

    rig = phaseShift(periods, tp.PROJ_RES, tp._phaseshift_sets(periods),
                     chessboardSize=tp.CB, squareSize=tp.SQ)
    tp._check_rig(rig)


def test_remap_row_invariant_bitexact_on_hardware(tpu_ok, rng):
    """Round 5: the FTP virtual-reference fast path
    (warp.remap_row_invariant) vs the 2-D cubic remap on the real chip
    for row-constant images. Gate at f32-ulp level: the two programs
    share the source-level accumulation order but XLA fusion may
    reassociate differently (measured: exact 0.0 on the real fringe
    values, 1-2 ulps — rel 2e-7 — on random values)."""
    import jax
    import jax.numpy as jnp
    from simplestereo_tpu import warp

    row = (rng.random(160) * 200 + 10).astype(np.float32)
    img = jnp.asarray(np.tile(row[None, :], (120, 1)))
    mapx = jnp.asarray(rng.uniform(-6, 166, (96, 128)), jnp.float32)
    mapy = jnp.asarray(rng.uniform(-6, 126, (96, 128)), jnp.float32)
    for interp in ("nearest", "linear", "cubic"):
        a = np.asarray(jax.jit(lambda i=interp: warp.remap(
            img, mapx, mapy, interpolation=i))())
        b = np.asarray(jax.jit(lambda i=interp: warp.remap_row_invariant(
            img, mapx, mapy, interpolation=i))())
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-4)


def test_ftp_fast_path_cloud_matches_2d_on_hardware(tpu_ok):
    """Round 5: StereoFTP with the row-invariant virtual reference must
    produce the same cloud as the forced 2-D gather path on hardware."""
    _, ftp, cam, z0 = _tiny_ftp_scene()
    assert ftp._fringe_row_inv
    fast = ftp.getCloud(cam)
    ftp2d = type(ftp)(ftp.stereoRig, ftp.fringe, 1.0 / ftp.fp,
                      stripeColor="green")
    ftp2d._fringe_row_inv = False
    slow = ftp2d.getCloud(cam)
    both = np.isfinite(fast[..., 2]) & np.isfinite(slow[..., 2])
    assert both.mean() > 0.95
    assert np.abs(fast[..., 2] - slow[..., 2])[both].max() < 1e-2
