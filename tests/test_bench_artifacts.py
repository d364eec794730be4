"""The bench artifact pipeline (round 5, VERDICT r4 items 1-2).

bench.py prints a compact line (the driver's BENCH_r{N}.json `parsed`)
and writes the full payload to benchmarks/BENCH_full_r{N}.json;
update_readme_perf.py regenerates README perf rows from the newest full
sidecar. These tests pin the artifact-selection logic — round-number
(not lexicographic) ordering, current-round exclusion for deltas, and
the full-sidecar preference — which broke the "single source of perf
truth" pipeline in round 4 (BENCH_r04.json parsed: null)."""

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def bench():
    return _load("bench_mod", os.path.join(REPO, "bench.py"))


@pytest.fixture(scope="module")
def readme_perf():
    return _load("readme_perf_mod",
                 os.path.join(REPO, "benchmarks", "update_readme_perf.py"))


def test_round_no_numeric_ordering(bench):
    assert bench._round_no("BENCH_r9.json") == 9
    assert bench._round_no("BENCH_r10.json") == 10
    assert bench._round_no("benchmarks/BENCH_full_r07.json") == 7
    assert bench._round_no("unrelated.json") == -1


def _fake_repo(tmp_path, rounds_driver=(), rounds_full=(),
               parsed_rounds=()):
    (tmp_path / "benchmarks").mkdir()
    for r in rounds_driver:
        payload = {"n": 1, "rc": 0, "tail": "x",
                   "parsed": ({"value": float(r), "sgm_mpixdisp_per_s": 1.0}
                              if r in parsed_rounds else None)}
        (tmp_path / f"BENCH_r{r:02d}.json").write_text(
            json.dumps(payload))
    for r in rounds_full:
        (tmp_path / "benchmarks" / f"BENCH_full_r{r:02d}.json").write_text(
            json.dumps({"value": 100.0 + r, "sgm_mpixdisp_per_s": 2.0}))
    return tmp_path


def test_prior_parsed_prefers_newest_full_and_excludes_current(
        bench, tmp_path, monkeypatch):
    # driver artifacts r1..r4 (r4 unparseable, like the real round 4),
    # full sidecars r3 and r5 (r5 = this round's own builder run)
    _fake_repo(tmp_path, rounds_driver=(1, 2, 3, 4),
               rounds_full=(3, 5), parsed_rounds=(1, 2, 3))
    monkeypatch.setattr(bench, "_HERE", str(tmp_path))
    assert bench._this_round() == 5
    name, prior = bench._prior_parsed()
    # newest PRIOR round with a payload: the r3 full sidecar (r5's own
    # sidecar excluded, r4 has parsed: null)
    assert name == "BENCH_full_r03.json"
    assert prior["value"] == 103.0


def test_prior_parsed_falls_back_to_driver_parsed(bench, tmp_path,
                                                  monkeypatch):
    _fake_repo(tmp_path, rounds_driver=(9, 10), rounds_full=(),
               parsed_rounds=(9, 10))
    monkeypatch.setattr(bench, "_HERE", str(tmp_path))
    name, prior = bench._prior_parsed()
    assert name == "BENCH_r10.json"  # numeric, not lexicographic
    assert prior["value"] == 10.0


def test_latest_artifact_prefers_full_sidecar(readme_perf, tmp_path,
                                              monkeypatch):
    _fake_repo(tmp_path, rounds_driver=(3, 4), rounds_full=(4, 10),
               parsed_rounds=(3,))
    monkeypatch.chdir(tmp_path)
    assert readme_perf.latest_artifact() == os.path.join(
        "benchmarks", "BENCH_full_r10.json")


def test_latest_artifact_skips_unusable_driver_files(readme_perf,
                                                     tmp_path,
                                                     monkeypatch):
    _fake_repo(tmp_path, rounds_driver=(3, 4), rounds_full=(),
               parsed_rounds=(3,))
    monkeypatch.chdir(tmp_path)
    # r4 has parsed: null -> r3 is the newest usable
    assert readme_perf.latest_artifact() == "BENCH_r03.json"


def test_real_compact_line_under_driver_cap(bench):
    """The actual current-round sidecar, if present, must correspond to
    a compact line the driver can capture whole (tail = 2000 chars)."""
    full = os.path.join(REPO, "benchmarks")
    cands = [f for f in os.listdir(full) if f.startswith("BENCH_full_r")]
    if not cands:
        pytest.skip("no full sidecar yet")
    # reconstruct the compact line the way bench does and check the cap
    # (numeric round sort — lexicographic ranks r09 over r10)
    latest = sorted(cands, key=bench._round_no)[-1]
    d = json.load(open(os.path.join(full, latest)))
    stats = d.get("stats", {})
    compact = {
        "metric": d.get("metric"), "value": d.get("value"),
        "s": {k: [s["ms"], s["iqr_ms"]] for k, s in stats.items()},
        "lk": {k: [s["up_mb"], s["rd_mb"]] + s["link_mbps"][0]
               + s["link_mbps"][1] for k, s in stats.items()
               if s.get("up_mb", 0) + s.get("rd_mb", 0) >= 1.0},
        "load_flags": d.get("load_flags"),
        "link_flags": d.get("link_flags"),
    }
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) < bench._LINE_CAP
