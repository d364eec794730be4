"""Test configuration.

Tests run on a virtual 8-device CPU mesh: multi-chip sharding logic is
validated without TPU hardware (the standard JAX recipe), and CPU avoids
per-op tunnel latency for the small shapes used in unit tests.
Set SST_TEST_TPU=1 to run the suite against the real device instead.
"""

import os

if not os.environ.get("SST_TEST_TPU"):
    # NOTE: this environment's sitecustomize registers the TPU (axon) PJRT
    # plugin at interpreter startup, so JAX_PLATFORMS env vars set here are
    # too late — jax.config.update after import is the reliable override.
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import pathlib

import numpy as np
import pytest

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def ref_res():
    """Path to the reference repo's example resources (golden data)."""
    p = REFERENCE / "examples" / "res"
    if not p.exists():
        pytest.skip("reference resources not available")
    return p


@pytest.fixture(scope="session")
def rig2(ref_res):
    import simplestereo_tpu as ss
    return ss.StereoRig.fromFile(str(ref_res / "2" / "rig.json"))


@pytest.fixture(scope="session")
def tsukuba(ref_res):
    from simplestereo_tpu.imgio import imread
    d = ref_res / "tsukuba"
    return {
        "left": imread(str(d / "tsukuba_l.png")),
        "right": imread(str(d / "tsukuba_r.png")),
        "gt": imread(str(d / "groundtruth.png"), grayscale=True),
        "nonocc": imread(str(d / "nonocc.png"), grayscale=True),
        "golden_asw": imread(str(d / "disparityASW.png"), grayscale=True),
    }


@pytest.fixture()
def rng():
    # Function-scoped on purpose: a shared session stream makes each
    # test's data depend on which tests ran before it (adding a test
    # silently reshuffles every later test's inputs).
    return np.random.default_rng(42)


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules.

    The XLA CPU compiler aborts/segfaults (SIGSEGV/SIGABRT inside
    backend_compile) when a full-suite run accumulates ~250 live
    compiled programs and then compiles another large one — whichever
    test compiles late in the run dies, deterministically. Dropping the
    executable caches at module boundaries keeps the live-program count
    bounded; modules re-compile their own programs anyway (cross-module
    jit reuse is rare here)."""
    yield
    import jax

    jax.clear_caches()
