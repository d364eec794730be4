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
    # 'pallas' rejects the XLA-only modes instead of silently falling back
    with pytest.raises(ValueError):
        gsw_disparity(img1, img2, engine="pallas", cost_method="mi")
    with pytest.raises(ValueError):
        gsw_disparity(img1, img2, engine="pallas", normalize=True)
    with pytest.raises(ValueError):
        gsw_disparity(img1, img2, engine="nope")
    with pytest.raises(ValueError):
        gsw_disparity(img1, img2, step=0)
    with pytest.raises(ValueError):
        gsw_disparity(img1, img2, step=2, cost_method="mi")
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


def test_auto_engine_off_tpu_is_xla(rng):
    """On CPU, engine='auto' must produce the XLA path's result (which
    is also what the virtual-mesh sharded tests certify)."""
    assert jax.default_backend() != "tpu"
    img1, img2 = _pair(rng, 10, 20)
    a = np.asarray(gsw_disparity(img1, img2, win_size=5, max_disp=4))
    b = np.asarray(gsw_disparity(img1, img2, engine="xla", win_size=5,
                                 max_disp=4))
    np.testing.assert_array_equal(a, b)
