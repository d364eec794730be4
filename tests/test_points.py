"""Point cloud I/O: native C++ serializer vs Python fallback parity."""

import os

import numpy as np
import pytest

from simplestereo_tpu import points
import simplestereo_tpu.native as native


@pytest.mark.parametrize("mode", ["plain", "bgr", "gray_int", "gray_float"])
def test_ply_native_matches_python(tmp_path, rng, mode):
    pts = rng.normal(size=(12, 9, 3))
    kw = {}
    ncols = 3
    if mode == "bgr":
        kw["referenceImage"] = rng.integers(
            0, 256, (12, 9, 3), np.uint8)
        ncols = 6
    elif mode == "gray_int":
        kw["referenceImage"] = rng.integers(0, 256, (12, 9), np.uint8)
        ncols = 4
    elif mode == "gray_float":
        kw["referenceImage"] = rng.random((12, 9)).astype(np.float32)
        ncols = 4

    p_native = str(tmp_path / "n.ply")
    p_python = str(tmp_path / "p.ply")
    assert native.get_ply() is not None, "native _ply failed to build"
    points.exportPLY(pts, p_native, **kw)
    real = native.get_ply
    native.get_ply = lambda: None
    try:
        points.exportPLY(pts, p_python, **kw)
        back_py = points.importPLY(p_python, *range(ncols))
    finally:
        native.get_ply = real
    back_nat = points.importPLY(p_native, *range(ncols))
    np.testing.assert_allclose(back_nat, back_py, atol=1e-12)
    np.testing.assert_allclose(back_nat[:, :3], pts.reshape(-1, 3),
                               atol=1e-5)
