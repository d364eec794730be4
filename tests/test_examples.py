"""Example scripts (L5 application layer) run end-to-end headless.

Each reference example was ported to a runnable script with reference
resource paths as defaults; this smoke suite executes the cheap ones in
a scratch cwd so the application layer cannot rot. The heavy matchers
(008/009: full-frame matching on the 2/ suite) and the calibration BA
examples (001/003) are exercised by their own dedicated tests instead.
"""

import os
import runpy
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")

CHEAP = [
    "004a_undistort_images.py",
    "004b_draw_epipolar_lines.py",
    "005_rectify_rig.py",
    "007_use_raw_camera_data.py",
    "102_cam_proj_capture.py",
]
SLOW = [
    "202_streaming_pipeline.py",
    "006_rectify_images.py",       # 720p remap compile
    "010_stereo_matching_tsukuba.py",   # ASW+SGM on Tsukuba (interpret)
    "011_build_3d_point_cloud.py",
    "101_structured_light_rig.py",
    "103_stereo_ftp.py",
    "201_multichip_tiled_matching.py",
]


def _run(name, tmp_path, monkeypatch):
    if not os.path.exists("/root/reference/examples/res"):
        pytest.skip("reference resources not available")
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", [name])
    runpy.run_path(os.path.join(EXAMPLES, name), run_name="__main__")


@pytest.mark.parametrize("name", CHEAP)
def test_example_runs(name, tmp_path, monkeypatch):
    _run(name, tmp_path, monkeypatch)


@pytest.mark.slow
@pytest.mark.parametrize("name", SLOW)
def test_example_runs_slow(name, tmp_path, monkeypatch):
    _run(name, tmp_path, monkeypatch)
