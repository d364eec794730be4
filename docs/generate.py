"""Generate Markdown API reference from the package docstrings.

The reference ships Sphinx/numpydoc HTML documentation
(/root/reference/sphinx-documentation-generator, README.md:98-111); this
project keeps the docs toolchain dependency-free: every public module,
class and function docstring is rendered to ``docs/api/<module>.md``.

Usage: python docs/generate.py
"""

import importlib
import inspect
import pathlib
import sys

OUT = pathlib.Path(__file__).parent / "api"

MODULES = [
    "simplestereo_tpu",
    "simplestereo_tpu.rigs",
    "simplestereo_tpu.calibration",
    "simplestereo_tpu.calibration.chessboard",
    "simplestereo_tpu.calibration.ba",
    "simplestereo_tpu.calibration.procam",
    "simplestereo_tpu.calibration.sharded",
    "simplestereo_tpu.rectification",
    "simplestereo_tpu.warp",
    "simplestereo_tpu.passive",
    "simplestereo_tpu.passive.asw_pallas",
    "simplestereo_tpu.passive.asw_ref",
    "simplestereo_tpu.passive.sgm",
    "simplestereo_tpu.passive.sgm_pallas",
    "simplestereo_tpu.passive.gsw",
    "simplestereo_tpu.passive.postfilter",
    "simplestereo_tpu.passive.wls",
    "simplestereo_tpu.passive.lab",
    "simplestereo_tpu.active",
    "simplestereo_tpu.active.patterns",
    "simplestereo_tpu.active.graycode",
    "simplestereo_tpu.active.ftp",
    "simplestereo_tpu.active.stripe",
    "simplestereo_tpu.unwrapping",
    "simplestereo_tpu.points",
    "simplestereo_tpu.parallel",
    "simplestereo_tpu.v4l2",
    "simplestereo_tpu.profiling",
    "simplestereo_tpu.evaluation",
    "simplestereo_tpu.geometry.projection",
    "simplestereo_tpu.geometry.distortion",
    "simplestereo_tpu.geometry.npgeom",
    "simplestereo_tpu.geometry.rotations",
    "simplestereo_tpu.utils",
    "simplestereo_tpu.imgio",
]


def _doc(obj):
    d = inspect.getdoc(obj)
    return d.strip() if d else ""


def _sig(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _public_members(mod):
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in vars(mod) if not n.startswith("_")]
    out = []
    for n in names:
        obj = getattr(mod, n, None)
        if obj is None or inspect.ismodule(obj):
            continue
        if (inspect.isclass(obj) or inspect.isfunction(obj)
                or callable(obj)):
            home = getattr(obj, "__module__", mod.__name__)
            if home and not home.startswith("simplestereo_tpu"):
                continue
            out.append((n, obj))
    return out


def render_module(name):
    mod = importlib.import_module(name)
    lines = [f"# `{name}`", ""]
    if _doc(mod):
        lines += [_doc(mod), ""]
    for n, obj in _public_members(mod):
        if inspect.isclass(obj):
            lines += [f"## class `{n}{_sig(obj)}`", ""]
            if _doc(obj):
                lines += [_doc(obj), ""]
            for mn, m in inspect.getmembers(obj, inspect.isfunction):
                if mn.startswith("_") and mn != "__init__":
                    continue
                if mn == "__init__":
                    continue
                if m.__qualname__.split(".")[0] != obj.__name__:
                    continue  # inherited
                lines += [f"### `{n}.{mn}{_sig(m)}`", ""]
                if _doc(m):
                    lines += [_doc(m), ""]
        else:
            lines += [f"## `{n}{_sig(obj)}`", ""]
            if _doc(obj):
                lines += [_doc(obj), ""]
    return "\n".join(lines) + "\n"


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    index = ["# simplestereo_tpu API reference", ""]
    for name in MODULES:
        try:
            text = render_module(name)
        except Exception as e:  # pragma: no cover
            print(f"skip {name}: {e}", file=sys.stderr)
            continue
        fn = name.replace(".", "_") + ".md"
        (OUT / fn).write_text(text)
        mod = importlib.import_module(name)
        summary = ""
        short = name.rsplit(".", 1)[-1]
        for ln in _doc(mod).splitlines():
            ln = ln.strip()
            if ln and ln != short and not set(ln) <= {"=", "-"}:
                summary = ln
                break
        index.append(f"- [`{name}`]({fn}) — {summary}")
    (OUT / "index.md").write_text("\n".join(index) + "\n")
    print(f"wrote {len(MODULES)} module pages to {OUT}")


if __name__ == "__main__":
    main()
