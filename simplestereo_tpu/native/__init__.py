"""
native
======

C++ runtime extensions. Mirrors the reference's native layer policy
(C++ built by setuptools, /root/reference/setup.py:35-48) for host-side
runtime work the Python interpreter dominates; device compute stays in
Pallas/XLA.

Extensions are built on demand (or via ``pip install -e .``); every
consumer has a pure-Python fallback, so an unbuilt tree stays fully
functional.
"""

import os
import subprocess
import sysconfig

_DIR = os.path.dirname(os.path.abspath(__file__))


def _try_build():
    """Best-effort in-tree build of the _ply extension with g++."""
    src = os.path.join(_DIR, "_ply.cpp")
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(_DIR, "_ply" + suffix)
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return True
    include = sysconfig.get_paths()["include"]
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++14",
           f"-I{include}", src, "-o", out]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_ply():
    """Return the native _ply module, building it if needed, else None."""
    try:
        from . import _ply  # noqa: F401
        return _ply
    except ImportError:
        pass
    if _try_build():
        try:
            from . import _ply
            return _ply
        except ImportError:
            return None
    return None
