"""Pallas GSW kernel vs the fused-XLA oracle (bit-exact, interpreter
mode on CPU), plus the engine dispatch surface.

The kernel (passive/gsw_pallas.py) replaces the XLA form on TPU for the
plain "sd" cost; these tests pin its semantics to the oracle the C++
golden fixture already validates (parity chain: _passive.cpp fixture ->
gsw._gsw_pass -> gsw_pallas)."""

import numpy as np
import pytest

import jax

from simplestereo_tpu.passive.gsw import StereoGSW, gsw_disparity
from simplestereo_tpu.passive.gsw_pallas import (gsw_disparity_pallas,
                                                 gsw_disparity_pallas_batch)


def _pair(rng, h, w, shift=-2):
    img1 = rng.integers(0, 256, (h, w, 3), np.uint8)
    return img1, np.roll(img1, shift, axis=1)


CASES = [
    # (h, w, win, min_disp, max_disp, consistent, step)
    (20, 40, 5, 0, 4, False, 1),
    (24, 52, 7, 2, 9, True, 1),
    (17, 33, 5, -3, 4, True, 1),     # negative minDisparity (marker path)
    (9, 17, 1, 0, 3, True, 1),       # win=1 degenerate window
    (12, 20, 9, 2, 2, False, 1),     # single-candidate range (D=1)
    (16, 140, 7, 0, 5, True, 1),     # W past one lane tile (w_acc=256)
    (16, 48, 3, 0, 20, False, 1),    # D>16: fori volume/accumulate path
    (16, 48, 3, -2, 19, True, 1),    # D>16 + consistent + negative minD
    (24, 52, 9, 2, 9, True, 2),      # subsampled window lattice (step)
    (17, 33, 5, -3, 4, True, 3),     # step + negative minDisparity
    (16, 48, 5, 0, 20, True, 2),     # step + D>16 fori path
]


@pytest.mark.parametrize("h,w,win,mind,maxd,cons,step", CASES)
def test_pallas_matches_xla_oracle(rng, h, w, win, mind, maxd, cons, step):
    img1, img2 = _pair(rng, h, w)
    kw = dict(win_size=win, min_disp=mind, max_disp=maxd, gamma=10.0,
              f_max=60.0, consistent=cons, step=step)
    a = np.asarray(gsw_disparity(img1, img2, engine="xla", **kw))
    b = np.asarray(gsw_disparity(img1, img2, engine="pallas", **kw))
    np.testing.assert_array_equal(a, b)


def test_pallas_batch_matches_single(rng):
    imgs1 = rng.integers(0, 256, (3, 16, 40, 3), np.uint8)
    imgs2 = np.stack([np.roll(a, -2, axis=1) for a in imgs1])
    for cons in (False, True):
        b = np.asarray(gsw_disparity_pallas_batch(
            imgs1, imgs2, win_size=5, max_disp=4, consistent=cons))
        for i in range(3):
            s = np.asarray(gsw_disparity_pallas(
                imgs1[i], imgs2[i], win_size=5, max_disp=4,
                consistent=cons))
            np.testing.assert_array_equal(b[i], s)


def test_pallas_sentinel_extended_float_rows(rng):
    """The sharded tiled path (parallel/gsw.py) feeds float images whose
    global-boundary halo rows carry a 1e9 sentinel; the kernel must
    treat them exactly like the XLA path (weight underflow to 0)."""
    img1 = rng.integers(0, 256, (16, 40, 3), np.uint8).astype(np.float32)
    img2 = np.roll(img1, -3, axis=1)
    pad = np.full((2, 40, 3), 1e9, np.float32)
    i1 = np.concatenate([pad, img1, pad])
    i2 = np.concatenate([pad, img2, pad])
    kw = dict(win_size=5, max_disp=4, consistent=True)
    a = np.asarray(gsw_disparity(i1, i2, engine="xla", **kw))
    b = np.asarray(gsw_disparity(i1, i2, engine="pallas", **kw))
    np.testing.assert_array_equal(a, b)


def test_engine_dispatch_and_validation(rng):
    img1, img2 = _pair(rng, 12, 24)
    with pytest.raises(ValueError):
        gsw_disparity(img1, img2, engine="nope")
    with pytest.raises(ValueError):
        gsw_disparity(img1, img2, step=0)
    with pytest.raises(ValueError):
        gsw_disparity(img1, img2, step=2, cost_method="mi")
    with pytest.raises(ValueError):
        # 0 would return the bootstrap on XLA and one refinement on the
        # kernel — both engines must reject it
        gsw_disparity(img1, img2, cost_method="mi", mi_iterations=0)
    with pytest.raises(ValueError):
        from simplestereo_tpu.passive.gsw_pallas import (
            gsw_mi_disparity_pallas)
        gsw_mi_disparity_pallas(img1, img2, win_size=5, max_disp=4,
                                mi_iterations=0, interpret=True)
    with pytest.raises(ValueError):
        StereoGSW(engine="nope")
    # 'auto' off-TPU stays on XLA; the class routes engine through
    m = StereoGSW(winSize=5, maxDisparity=4, engine="pallas")
    d = m.compute(img1, img2)
    assert d.shape == img1.shape[:2] and d.dtype == np.int16
    # batched class path (grid batching, never vmap-of-pallas)
    db = StereoGSW(winSize=5, maxDisparity=4, engine="pallas").computeBatch(
        np.stack([img1, img1]), np.stack([img2, img2]))
    np.testing.assert_array_equal(db[0], d)
    np.testing.assert_array_equal(db[1], d)


# --------------------------------------------------------------------------
# normalize (ASW-style weighted mean) on the kernel (round 4)
# --------------------------------------------------------------------------

NORM_CASES = [
    # (h, w, win, min_disp, max_disp, consistent, step)
    (20, 40, 5, 0, 4, False, 1),
    (24, 52, 7, 2, 9, True, 1),
    (17, 33, 5, -3, 4, True, 1),     # negative minDisparity (marker path)
    (16, 48, 3, 0, 20, False, 1),    # D>16: fori den-accumulate path
    (24, 52, 9, 2, 9, True, 2),      # subsampled window lattice (step)
    (16, 140, 7, 0, 5, True, 1),     # W past one lane tile (w_acc=256)
]


@pytest.mark.parametrize("h,w,win,mind,maxd,cons,step", NORM_CASES)
def test_pallas_normalize_matches_xla(rng, h, w, win, mind, maxd, cons,
                                      step):
    """Normalized costs are RATIOS of float sums (unlike the
    integer-separated 'sd' sums), so the kernel's different accumulation
    grouping can flip exact ties — gate at a small mismatch fraction
    instead of bit-parity (ASW-style caveat, CLAUDE.md)."""
    img1, img2 = _pair(rng, h, w)
    kw = dict(win_size=win, min_disp=mind, max_disp=maxd, gamma=10.0,
              f_max=60.0, consistent=cons, step=step, normalize=True)
    a = np.asarray(gsw_disparity(img1, img2, engine="xla", **kw))
    b = np.asarray(gsw_disparity(img1, img2, engine="pallas", **kw))
    assert (a != b).mean() <= 0.005, (a != b).mean()


def test_pallas_normalize_changes_borders_only(rng):
    """normalize rescales the window cost by the summed weight of the
    candidate-VALID pixels; away from the candidate-validity boundary
    the denominator is d-independent, so the argmin — and the disparity
    — can only change near the left border band."""
    img1, img2 = _pair(rng, 20, 60)
    kw = dict(win_size=7, min_disp=0, max_disp=5, gamma=10.0, f_max=60.0)
    plain = np.asarray(gsw_disparity(img1, img2, engine="pallas", **kw))
    norm = np.asarray(gsw_disparity(img1, img2, engine="pallas",
                                    normalize=True, **kw))
    band = 5 + 7 // 2  # max_disp + pad
    np.testing.assert_array_equal(plain[:, band:], norm[:, band:])
    assert (plain[:, :band] != norm[:, :band]).any()  # it does something


def test_pallas_normalize_batch_matches_single(rng):
    imgs1 = rng.integers(0, 256, (3, 16, 40, 3), np.uint8)
    imgs2 = np.stack([np.roll(a, -2, axis=1) for a in imgs1])
    for cons in (False, True):
        b = np.asarray(gsw_disparity_pallas_batch(
            imgs1, imgs2, win_size=5, max_disp=4, consistent=cons,
            normalize=True))
        for i in range(3):
            s = np.asarray(gsw_disparity_pallas(
                imgs1[i], imgs2[i], win_size=5, max_disp=4,
                consistent=cons, normalize=True))
            np.testing.assert_array_equal(b[i], s)


def test_normalize_class_batch_routes_to_kernel(rng, monkeypatch):
    import simplestereo_tpu.passive.gsw_pallas as gp
    called = {}
    orig = gp.gsw_disparity_pallas_batch

    def spy(*a, **k):
        called["normalize"] = k.get("normalize")
        return orig(*a, **k)

    monkeypatch.setattr(gp, "gsw_disparity_pallas_batch", spy)
    img1, img2 = _pair(rng, 12, 24)
    m = StereoGSW(winSize=5, maxDisparity=4, engine="pallas",
                  normalize=True)
    m.computeBatch(np.stack([img1]), np.stack([img2]))
    assert called["normalize"] is True


# --------------------------------------------------------------------------
# Mutual-information cost on the kernel (ext_vol path, round 4)
# --------------------------------------------------------------------------

MI_CASES = [
    # (h, w, win, min_disp, max_disp, consistent)
    (20, 40, 5, 0, 4, False),
    (24, 52, 7, 2, 9, True),
    (17, 33, 5, -3, 4, True),        # negative minDisparity (marker path)
    (16, 48, 3, 0, 20, False),       # D>16: fori roll path with ext_vol
]


@pytest.mark.parametrize("h,w,win,mind,maxd,cons", MI_CASES)
def test_mi_pallas_matches_xla_oracle(rng, h, w, win, mind, maxd, cons):
    """The MI cost on the kernel (pre-built table-lookup volume +
    ext_vol window walk) against the fused-XLA MI form: same random
    bootstrap key, so the refinement trajectories coincide up to float
    near-ties. Unlike SD's integer-separated color costs, MI costs are
    sums of arbitrary table floats and CAN tie to the last ulp (measured:
    a 1.2e-7 cost gap on an 800-px frame); the two engines accumulate
    window offsets in different orders, so a tiny flip rate is intrinsic,
    not a bug — gate it at 0.5%."""
    img1, img2 = _pair(rng, h, w)
    kw = dict(win_size=win, min_disp=mind, max_disp=maxd, gamma=10.0,
              cost_method="mi", bins=8, mi_iterations=2, consistent=cons)
    a = np.asarray(gsw_disparity(img1, img2, engine="xla", **kw))
    b = np.asarray(gsw_disparity(img1, img2, engine="pallas", **kw))
    assert (a != b).mean() <= 0.005, (a != b).mean()


def test_mi_coarse_step_schedule(rng):
    """coarse_step > 1 subsamples only the INTERMEDIATE iterations'
    window walk (histogram estimation); the final aggregation is exact.
    The result must stay close to the exact schedule (the global joint
    histogram is insensitive to per-pixel matching noise), and
    mi_iterations=1 must be schedule-invariant (no intermediates)."""
    from simplestereo_tpu.passive.gsw_pallas import gsw_mi_disparity_pallas

    img1, img2 = _pair(rng, 20, 44)
    kw = dict(win_size=7, max_disp=5, bins=8, consistent=True)
    a = np.asarray(gsw_mi_disparity_pallas(img1, img2, mi_iterations=3,
                                           coarse_step=1, **kw))
    b = np.asarray(gsw_mi_disparity_pallas(img1, img2, mi_iterations=3,
                                           coarse_step=2, **kw))
    assert (a != b).mean() <= 0.02, (a != b).mean()
    c = np.asarray(gsw_mi_disparity_pallas(img1, img2, mi_iterations=1,
                                           coarse_step=1, **kw))
    d = np.asarray(gsw_mi_disparity_pallas(img1, img2, mi_iterations=1,
                                           coarse_step=3, **kw))
    np.testing.assert_array_equal(c, d)


def test_mi_pallas_batch_matches_single(rng):
    from simplestereo_tpu.passive.gsw_pallas import (
        gsw_mi_disparity_pallas, gsw_mi_disparity_pallas_batch)

    imgs1 = rng.integers(0, 256, (3, 16, 40, 3), np.uint8)
    imgs2 = np.stack([np.roll(a, -2, axis=1) for a in imgs1])
    for cons in (False, True):
        b = np.asarray(gsw_mi_disparity_pallas_batch(
            imgs1, imgs2, win_size=5, max_disp=4, bins=8,
            consistent=cons))
        for i in range(3):
            s = np.asarray(gsw_mi_disparity_pallas(
                imgs1[i], imgs2[i], win_size=5, max_disp=4, bins=8,
                consistent=cons))
            np.testing.assert_array_equal(b[i], s)


def test_mi_class_batch_routes_to_kernel(rng, monkeypatch):
    """StereoGSW(costMethod='mi').computeBatch on the pallas engine must
    ride the MI grid-batch path and match per-frame compute."""
    img1, img2 = _pair(rng, 14, 30)
    m = StereoGSW(winSize=5, maxDisparity=4, costMethod="mi", bins=8,
                  engine="pallas", consistent=True)
    d = m.compute(img1, img2)
    db = m.computeBatch(np.stack([img1, img1]), np.stack([img2, img2]))
    np.testing.assert_array_equal(db[0], d)
    np.testing.assert_array_equal(db[1], d)


def test_auto_engine_off_tpu_is_xla(rng):
    """On CPU, engine='auto' must produce the XLA path's result (which
    is also what the virtual-mesh sharded tests certify)."""
    assert jax.default_backend() != "tpu"
    img1, img2 = _pair(rng, 10, 20)
    a = np.asarray(gsw_disparity(img1, img2, win_size=5, max_disp=4))
    b = np.asarray(gsw_disparity(img1, img2, engine="xla", win_size=5,
                                 max_disp=4))
    np.testing.assert_array_equal(a, b)


# --------------------------------------------------------------------------
# costMethod="auto": the SD/MI decision rule (round 5, VERDICT r4 item 7)
# --------------------------------------------------------------------------

class TestCostMethodAuto:
    def test_probe_separates_matched_from_mismatched(self, tsukuba):
        """The validated anchors: a real matched pair scores well under
        the threshold; a gamma-0.5 right image scores far over it."""
        from simplestereo_tpu.passive.gsw import (
            MI_AUTO_THRESHOLD, radiometric_divergence)

        left, right = tsukuba["left"], tsukuba["right"]
        plain = radiometric_divergence(left, right)
        assert plain < MI_AUTO_THRESHOLD / 2, plain
        g05 = np.clip(255.0 * (right / 255.0) ** 0.5, 0, 255) \
            .astype(np.uint8)
        mm = radiometric_divergence(left, g05)
        assert mm > 2 * MI_AUTO_THRESHOLD, mm

    def test_resolve_passthrough_and_auto(self, tsukuba):
        from simplestereo_tpu.passive.gsw import resolve_cost_method

        left, right = tsukuba["left"], tsukuba["right"]
        assert resolve_cost_method(left, right, "sd") == "sd"
        assert resolve_cost_method(left, right, "mi") == "mi"
        assert resolve_cost_method(left, right, "auto") == "sd"
        g05 = np.clip(255.0 * (right / 255.0) ** 0.5, 0, 255) \
            .astype(np.uint8)
        assert resolve_cost_method(left, g05, "auto") == "mi"

    def test_compute_auto_records_choice_and_runs(self, rng):
        """End-to-end: auto resolves per pair, records lastCostMethod,
        and the chosen pipeline actually recovers the shift."""
        from simplestereo_tpu.passive import StereoGSW

        img1 = rng.integers(0, 256, (16, 40, 3), np.uint8)
        img2 = np.roll(img1, -2, axis=1)
        m = StereoGSW(winSize=5, maxDisparity=4, gamma=10.0, fMax=60.0,
                      costMethod="auto", bins=8, miIterations=2,
                      consistent=True, engine="xla")
        d = m.compute(img1, img2)
        assert m.lastCostMethod == "sd"
        assert (d[4:-4, 6:-6] == 2).mean() > 0.9

        g05 = np.clip(255.0 * (img2 / 255.0) ** 0.5, 0, 255) \
            .astype(np.uint8)
        m.compute(img1, g05)
        assert m.lastCostMethod == "mi"

    def test_compute_batch_auto_resolves_once(self, rng):
        from simplestereo_tpu.passive import StereoGSW

        imgs1 = rng.integers(0, 256, (2, 12, 32, 3), np.uint8)
        imgs2 = np.roll(imgs1, -2, axis=2)
        m = StereoGSW(winSize=5, maxDisparity=4, costMethod="auto",
                      bins=8, engine="xla")
        m.computeBatch(imgs1, imgs2)
        assert m.lastCostMethod == "sd"

    def test_invalid_cost_method_rejected(self):
        from simplestereo_tpu.passive import StereoGSW

        with pytest.raises(ValueError, match="costMethod"):
            StereoGSW(costMethod="nope")

    def test_auto_batch_probe_matches_single_frame_probe(self):
        """Review regression: the batch probe must histogram per-pixel
        GRAY means exactly like the single-frame probe — an all-green vs
        all-gray pair has identical gray distributions (EMD 0) and must
        resolve 'sd' from both entry points."""
        from simplestereo_tpu.passive.gsw import (
            radiometric_divergence, resolve_cost_method)

        g = np.zeros((12, 24, 3), np.uint8)
        g[..., 1] = 255  # pure green, gray mean 85
        h = np.full((12, 24, 3), 85, np.uint8)  # gray, same mean
        assert radiometric_divergence(g, h) < 4.0
        assert radiometric_divergence(g[None], h[None]) \
            == radiometric_divergence(g, h)
        assert resolve_cost_method(g[None], h[None], "auto") == "sd"

    def test_auto_with_step_never_resolves_mi(self, rng):
        """Review regression: auto + step>1 must fall back to 'sd' even
        on a radiometrically mismatched pair (resolving 'mi' there was a
        data-dependent ValueError mid-capture)."""
        from simplestereo_tpu.passive import StereoGSW

        img1 = rng.integers(0, 256, (16, 40, 3), np.uint8)
        img2 = np.clip(255.0 * (np.roll(img1, -2, axis=1) / 255.0) ** 0.5,
                       0, 255).astype(np.uint8)
        m = StereoGSW(winSize=5, maxDisparity=4, costMethod="auto",
                      step=2, engine="xla")
        m.compute(img1, img2)  # must not raise
        assert m.lastCostMethod == "sd"
        with pytest.raises(ValueError, match="step"):  # explicit mi still rejected
            from simplestereo_tpu.passive.gsw import gsw_disparity
            gsw_disparity(img1, img2, win_size=5, max_disp=4,
                          cost_method="mi", step=2, engine="xla")
