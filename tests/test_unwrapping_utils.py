"""Phase unwrapping (np.unwrap parity + IIR) and host utilities."""

import numpy as np
import pytest

import simplestereo_tpu as ss
from simplestereo_tpu import unwrapping


class TestUnwrap:
    def test_matches_numpy_1d(self, rng):
        phi = np.cumsum(rng.normal(0, 0.8, 200))
        wrapped = np.angle(np.exp(1j * phi))
        ours = np.asarray(unwrapping.unwrap(wrapped[None, :], axis=1))[0]
        theirs = np.unwrap(wrapped)
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_axis0(self, rng):
        phi = np.cumsum(rng.normal(0, 0.8, (100, 3)), axis=0)
        wrapped = np.angle(np.exp(1j * phi))
        ours = np.asarray(unwrapping.unwrap(wrapped, axis=0))
        np.testing.assert_allclose(ours, np.unwrap(wrapped, axis=0),
                                   atol=1e-5)

    def test_unwrap2d_ramp(self):
        H, W = 32, 64
        xs, ys = np.meshgrid(np.arange(W), np.arange(H))
        phi = 0.3 * xs + 0.2 * ys
        wrapped = np.angle(np.exp(1j * phi))
        out = np.asarray(unwrapping.unwrap2D(wrapped))
        # gradient recovered everywhere (absolute offset is arbitrary)
        np.testing.assert_allclose(np.diff(out, axis=1), 0.3, atol=1e-4)
        np.testing.assert_allclose(np.diff(out, axis=0), 0.2, atol=1e-4)


class TestIIR:
    def test_recovers_smooth_ramp(self):
        """Estrada 2011 IIR unwrap on a noiseless phase ramp."""
        H, W = 24, 48
        xs, ys = np.meshgrid(np.arange(W), np.arange(H))
        phi = 0.25 * xs + 0.1 * ys
        wrapped = np.angle(np.exp(1j * phi))
        out = np.asarray(unwrapping.infiniteImpulseResponse(wrapped, 1.0))
        d = out - phi
        assert np.abs(d - d.mean()).max() < 1e-3

    def test_idempotent_call(self):
        """The reference warns 'if called twice, it may not work'
        (unwrapping.py:38-39) — ours must be a pure function."""
        rng = np.random.default_rng(0)
        phi = np.cumsum(rng.normal(0, 0.3, (10, 20)), axis=1)
        wrapped = np.angle(np.exp(1j * phi))
        a = np.asarray(unwrapping.infiniteImpulseResponse(wrapped, 0.5))
        b = np.asarray(unwrapping.infiniteImpulseResponse(wrapped, 0.5))
        np.testing.assert_array_equal(a, b)

    def test_bad_tau(self):
        with pytest.raises(ValueError):
            unwrapping.infiniteImpulseResponse(np.zeros((4, 4)), -1.0)


class TestCapture:
    def test_file_sequence(self, tmp_path, rng):
        from simplestereo_tpu.imgio import imwrite
        paths = []
        for i in range(3):
            p = tmp_path / f"{i}.png"
            imwrite(str(p), rng.integers(0, 255, (8, 10, 3), np.uint8))
            paths.append(str(p))
        import time
        with ss.utils.Capture(paths) as cap:
            for _ in range(50):
                f = cap.get()
                if f is not None:
                    break
                time.sleep(0.01)
        assert f is not None and f.shape == (8, 10, 3)
        assert cap.getResolution() in (None, (10, 8))

    def test_callable_source(self):
        import itertools
        import time
        counter = itertools.count()
        src = lambda: np.full((4, 4), next(counter), np.uint8)
        cap = ss.utils.Capture(src)
        cap.start()
        time.sleep(0.05)
        f1 = cap.get()
        cap.stop()
        assert f1 is not None


def test_move_extrinsic_origin(rng):
    from simplestereo_tpu.calibration import ba
    R1 = ba._rodrigues(rng.normal(0, 0.5, 3))
    R2 = ba._rodrigues(rng.normal(0, 0.5, 3))
    t1 = rng.normal(0, 10, 3)
    t2 = rng.normal(0, 10, 3)
    R, t = ss.utils.moveExtrinsicOriginToFirstCamera(R1, R2, t1, t2)
    # a world point must land at the same camera-2 coords either way
    X = rng.normal(0, 5, 3)
    x1 = R1 @ X + t1
    np.testing.assert_allclose(R @ x1 + t.ravel(), R2 @ X + t2, atol=1e-9)


def test_draw_epipolar_lines_returns_copies(rig2, rng):
    img1 = rng.integers(0, 255, (720, 1280, 3), np.uint8)
    img2 = rng.integers(0, 255, (720, 1280, 3), np.uint8)
    img1.setflags(write=False)
    F = np.asarray(rig2.getFundamentalMatrix())
    o1, o2 = ss.utils.drawCorrespondingEpipolarLines(
        img1, img2, F, x1=[(640, 360)])
    assert (o1 != img1).any() or (o2 != img2).any()


def test_profiling_throughput_and_memory(tmp_path):
    import numpy as np
    import jax.numpy as jnp
    from simplestereo_tpu import profiling

    meter = profiling.Throughput("warp", unit="Mpix")
    for i in range(3):
        with meter.measure(0.5):
            np.asarray(jnp.arange(16) * i)
    rep = meter.report()
    assert rep["samples"] == 3 and rep["median_s"] > 0
    assert "Mpix_per_s" in rep

    mem = profiling.device_memory()
    assert len(mem) >= 1

    with profiling.annotate("test-region"):
        pass

    with profiling.trace(tmp_path):
        np.asarray(jnp.ones(8) + 1)
    import os
    assert any(os.scandir(tmp_path))
