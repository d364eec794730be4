"""Benchmark: ASW dense matching on Tsukuba (the reference's headline task).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpix*disp/s", "vs_baseline": N, ...}

Methodology: median wall-clock of single calls with *varying* inputs and
full host readback (defeats async early-acks and any transport-level
result caching), on the fused one-dispatch consistent pipeline.

Artifact layout (round 5, VERDICT r4 item 1 — the driver captures only
the LAST ~2000 chars of stdout, which truncated the r02/r04 lines into
unparseable tails): the printed line is now a COMPACT summary kept under
~1.9 kB (headline + per-stage [ms, iqr] + link/byte diagnosis for the
link-heavy stages + flags), and the FULL payload (all stats, sentinel
series, byte counts, compute/link splits, deltas vs prior rounds) is
written to ``benchmarks/BENCH_full_r{N}.json`` — the ``detail`` key of
the printed line names it.

Self-diagnosis instrumentation (each timed stage):
- ``sentinel_ms``: tunnel DISPATCH latency (median of 3 dispatches of a
  fixed tiny jit with full readback) measured before/after the stage;
  >20% pre/post skew lands the stage in ``load_flags``.
- ``link_mbps``: bulk LINK throughput — a ~4 MB varying-content upload
  and a ~4 MB varying device-buffer readback timed before/after the
  stage (dispatch-corrected). Dispatch latency is blind to bulk-link
  throughput, which is what actually moves the link-heavy stages (the
  r04 driver's ``graycode_cloud`` 940 ms vs the builder's 409 ms on
  identical code — ~16 MB of per-call traffic on a link that swings
  2-3x). >25% pre/post skew, or a stage-mean readback rate below 2/3 of
  the run median, lands the stage in ``link_flags``.
- ``up_mb`` / ``rd_mb``: bytes moved per call (host-side input size /
  returned output size), and ``est_link_ms`` / ``est_compute_ms``: the
  measured link rate applied to those byte counts — the per-stage
  compute/link split (methodology: benchmarks/ftp_breakdown.py, now
  recorded for every stage in the artifact itself).

720p stages (round 5, VERDICT r4 item 3): the flagship production-size
rows (720p ASW win=35 D=11 consistent; 720p SGM D=128 Pallas) on the
reference's lawn pair — previously builder-run only
(benchmarks/verify_r4c.py). Cold remote compiles for the 720p kernels
can take minutes, so every stage checks an elapsed-time budget
(``SSTPU_BENCH_BUDGET_S``, default 3000 s) and is skipped — and listed
in ``skipped`` — once it is exhausted; set ``SSTPU_BENCH_720P=0`` to
skip the 720p stages outright.

Robustness (round 3): the axon TPU backend can transiently fail to
initialize ("Unable to initialize backend 'axon'"), and a failed init is
cached for the life of the process. bench.py therefore runs as a
parent/child pair: the parent re-execs this file as a child process and
retries (fresh interpreter, so no cached failed backend) with backoff;
the child probes the backend first (rc=42 on init failure so the parent
knows to retry) and wraps every metric stage in try/except so a late
failure still emits a partial JSON line instead of a bare traceback.

Baseline: the reference C++ thread-pool ASW at 384x288, 11 candidates,
winSize=35, consistent — BASELINE.md's conservative figure of
1.33 Mpix*disp/s ("<1 s on 4 CPU threads",
/root/reference/simplestereo/passive.py:53-56) is kept as vs_baseline
for cross-round continuity. Measured directly on THIS host (the
reference _passive.cpp built standalone, 4 CPU threads, identical
example-010 parameters): 14.5 s/frame = 0.084 Mpix*disp/s, i.e. the
real same-machine speedup is ~16x larger than vs_baseline reports.
"""

import glob
import json
import os
import re
import subprocess
import sys
import time

import numpy as np

_CHILD_ENV = "SSTPU_BENCH_CHILD"
_RC_BACKEND = 42  # child exit code meaning "backend init failed, retry me"
_MAX_ATTEMPTS = int(os.environ.get("SSTPU_BENCH_ATTEMPTS", "10"))
_BACKOFF_S = float(os.environ.get("SSTPU_BENCH_BACKOFF_S", "60"))
_N_TIMED = 9  # inputs per stage: 1 warm-only + 8 timed (dispersion >= 8)
_BUDGET_S = float(os.environ.get("SSTPU_BENCH_BUDGET_S", "3000"))
_RUN_720P = os.environ.get("SSTPU_BENCH_720P", "1") != "0"
_LINE_CAP = 1900  # driver tail capture is 2000 chars (BENCH_r04.json)
_HERE = os.path.dirname(os.path.abspath(__file__))


def _parent():
    """Re-exec this file as a child; retry on backend-init failures."""
    last_out, last_err = "", ""
    for attempt in range(1, _MAX_ATTEMPTS + 1):
        env = dict(os.environ, **{_CHILD_ENV: "1"})
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True)
        last_out, last_err = proc.stdout, proc.stderr
        # Forward the child's JSON line (last non-empty stdout line).
        lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
        if proc.returncode == 0 and lines:
            print(lines[-1])
            return 0
        if proc.returncode != _RC_BACKEND:
            # Real (non-init) failure: the child already tried to emit a
            # partial line; forward whatever it printed, then fail loudly.
            sys.stderr.write(proc.stderr[-4000:])
            if lines:
                print(lines[-1])
                return 0
            break
        sys.stderr.write(
            f"[bench] attempt {attempt}/{_MAX_ATTEMPTS}: TPU backend init "
            f"failed; retrying in {_BACKOFF_S:.0f}s\n")
        if attempt < _MAX_ATTEMPTS:
            time.sleep(_BACKOFF_S)
    # All attempts failed: still print ONE JSON line so the round has a
    # machine-readable artifact, and exit nonzero.
    print(json.dumps({
        "metric": "asw_tsukuba_consistent_throughput",
        "value": None, "unit": "Mpix*disp/s", "vs_baseline": None,
        "error": "TPU backend unavailable after retries",
        "stderr_tail": (last_err or last_out)[-500:],
    }))
    return 1


def _round_no(path):
    m = re.search(r"BENCH(?:_full)?_r(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else -1


def _this_round():
    """Infer the current round: driver artifacts exist for PRIOR rounds
    only while bench runs (BENCH_r{N}.json is written after)."""
    prior = [_round_no(f) for f in glob.glob(os.path.join(
        _HERE, "BENCH_r*.json"))]
    return max(prior, default=0) + 1


def _prior_parsed():
    """Newest PRIOR-round artifact with a full payload, for
    deltas_vs_prior. Prefers the full sidecars
    (benchmarks/BENCH_full_r*.json, round 5+), falls back to driver
    BENCH_r*.json with a parsed line. Sorted by ROUND NUMBER, not
    lexicographically (r9 must not outrank r10); the current round's own
    sidecar (a builder validation run of the same code) is excluded so
    deltas always compare across rounds."""
    this_round = _this_round()
    cands = sorted(
        (f for f in
         glob.glob(os.path.join(_HERE, "benchmarks", "BENCH_full_r*.json"))
         + glob.glob(os.path.join(_HERE, "BENCH_r*.json"))
         if _round_no(f) < this_round),
        key=_round_no, reverse=True)
    for f in cands:
        try:
            d = json.load(open(f))
        except Exception:
            continue
        if "BENCH_full" in os.path.basename(f):
            return os.path.basename(f), d
        if d.get("parsed"):
            return os.path.basename(f), d["parsed"]
    return None, None


def _child():
    # Backend probe first: a fresh process either gets a live backend or
    # exits rc=42 so the parent retries with a fresh interpreter.
    try:
        import jax
        if os.environ.get("SSTPU_BENCH_CPU"):
            # harness smoke-testing only: run the whole bench machinery
            # on the CPU backend (numbers are meaningless; the env's
            # JAX_PLATFORMS var is ignored because the axon plugin
            # registers first — config.update is the reliable override)
            jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        jnp.zeros((8,), jnp.float32).block_until_ready()
    except Exception as e:
        sys.stderr.write(f"[bench child] backend probe failed: {e!r}\n")
        return _RC_BACKEND

    from simplestereo_tpu.imgio import imread

    t_start = time.time()

    d = "/root/reference/examples/res/tsukuba/"
    try:
        left = imread(d + "tsukuba_l.png")
        right = imread(d + "tsukuba_r.png")
        gt = imread(d + "groundtruth.png", grayscale=True)
        nonocc = imread(d + "nonocc.png", grayscale=True)
    except Exception:
        rng = np.random.default_rng(0)
        left = rng.integers(0, 256, (288, 384, 3), np.uint8)
        right = np.roll(left, -5, axis=1)
        gt = nonocc = None

    kw = dict(win_size=35, min_disp=4, max_disp=14, gamma_c=15.0,
              gamma_p=17.5, consistent=True)
    H, W = left.shape[:2]
    D = kw["max_disp"] - kw["min_disp"] + 1

    from simplestereo_tpu.evaluation import evaluate_disparity, tsukuba_scale

    def bad2(disp_map, disp_scale=1.0):
        return round(evaluate_disparity(
            disp_map, gt, nonocc > 0, bad_thresholds=(2.0,),
            disp_scale=disp_scale, gt_scale=tsukuba_scale)["bad2"], 4)

    extra = {}
    errors = []
    stats = {}
    load_flags = []
    skipped = []
    mpixdisp = None

    # ---- probes: dispatch latency + bulk link throughput ----------------
    # Dispatch: a fixed tiny jit with full readback (what concurrent
    # host/tunnel load inflates). Link: ~4 MB varying-content transfers
    # each way (what tunnel-throughput swings move — the quantity the
    # dispatch sentinel is blind to; r04's graycode_cloud 940-vs-409 ms).
    _sent_x = jnp.arange(2048, dtype=jnp.float32)
    _sent_f = jax.jit(lambda v: v * 1.0000001 + 0.5)
    np.asarray(_sent_f(_sent_x))  # compile outside any timed window

    _LINK_N = 4_000_000  # bytes per direction
    _up_buf = np.random.default_rng(7).integers(
        0, 256, _LINK_N, np.uint8)
    _sum_f = jax.jit(lambda v: jnp.sum(v, dtype=jnp.int32))
    _inc_f = jax.jit(lambda v: v + np.uint8(1))
    _dn_pool = [jax.device_put(np.random.default_rng(100 + i).integers(
        0, 256, _LINK_N, np.uint8)) for i in range(4)]
    for _a in _dn_pool:
        _a.block_until_ready()
    np.asarray(_sum_f(_dn_pool[0]))  # compile
    _dn_pool[0] = _inc_f(_dn_pool[0])  # compile inc
    _probe_state = {"n": 0}

    def probe():
        """One combined probe: dispatch ms + [up, down] MB/s."""
        i = _probe_state["n"]
        _probe_state["n"] += 1
        ds = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(_sent_f(_sent_x))
            ds.append(time.perf_counter() - t0)
        d_s = float(np.median(ds))
        # upload: mutate a few bytes so no transport cache can serve it
        _up_buf[:8] = np.frombuffer(
            np.int64(i).tobytes(), np.uint8)
        t0 = time.perf_counter()
        x = jax.device_put(_up_buf)
        np.asarray(_sum_f(x))  # forces the upload to have completed
        t_up = time.perf_counter() - t0
        # download: cycle the pool AND increment after use so repeated
        # (buffer, contents) pairs never repeat
        j = i % len(_dn_pool)
        t0 = time.perf_counter()
        np.asarray(_dn_pool[j])
        t_dn = time.perf_counter() - t0
        _dn_pool[j] = _inc_f(_dn_pool[j])
        up = _LINK_N / max(t_up - d_s, 1e-4) / 1e6
        dn = _LINK_N / max(t_dn - d_s, 1e-4) / 1e6
        return {"disp_ms": round(d_s * 1e3, 2),
                "mbps": [round(up, 1), round(dn, 1)]}

    def _nbytes(x):
        try:
            if isinstance(x, np.ndarray):
                return x.nbytes
            if isinstance(x, (list, tuple)):
                return sum(_nbytes(v) for v in x)
            if isinstance(x, np.generic):
                return x.nbytes
        except Exception:
            pass
        return 0

    def guard(name):
        """True (and records the skip) once the time budget is gone."""
        if time.time() - t_start > _BUDGET_S:
            skipped.append(name)
            return True
        return False

    def timed(name, fn, inputs, up_mb=None):
        """Compile on inputs[0] (warm-only — NEVER re-timed: the tunnel
        can serve a repeated (program, input) pair from cache, which
        would bias the sample), then one full-readback timed call per
        REMAINING input. Records per-stage stats incl. dispatch + link
        sentinels and byte counts; returns the median seconds.

        up_mb: host->device MB per call; defaults to the input size when
        inputs are host numpy arrays (device-resident inputs upload 0).

        Probes are taken FRESH immediately before and after the timed
        window (an earlier draft reused the previous stage's post-probe
        as this stage's pre — stale across the untimed accuracy
        evaluations and input-stack building that run between stages;
        review finding)."""
        pre = probe()
        out0 = np.asarray(fn(inputs[0]))  # compile+warm (never timed)
        ts = []
        for x in inputs[1:]:
            t0 = time.perf_counter()
            np.asarray(fn(x))
            ts.append(time.perf_counter() - t0)
        post = probe()
        med = float(np.median(ts))
        q1, q3 = np.percentile(ts, [25, 75])
        if up_mb is None:
            up_mb = _nbytes(inputs[1]) / 1e6
        rd_mb = _nbytes(out0) / 1e6
        # compute/link split from the measured rates + byte counts
        up_r = (pre["mbps"][0] + post["mbps"][0]) / 2
        dn_r = (pre["mbps"][1] + post["mbps"][1]) / 2
        link_ms = (up_mb / max(up_r, 1e-6) + rd_mb / max(dn_r, 1e-6)) * 1e3
        stats[name] = {
            "ms": round(med * 1e3, 2), "n": len(ts),
            "iqr_ms": round(float(q3 - q1) * 1e3, 2),
            "sentinel_ms": [pre["disp_ms"], post["disp_ms"]],
            "link_mbps": [pre["mbps"], post["mbps"]],
            "up_mb": round(up_mb, 2), "rd_mb": round(rd_mb, 2),
            "est_link_ms": round(link_ms, 1),
            "est_compute_ms": round(max(med * 1e3 - link_ms, 0.0), 1),
        }
        if abs(post["disp_ms"] - pre["disp_ms"]) / max(
                min(pre["disp_ms"], post["disp_ms"]), 1e-9) > 0.2:
            load_flags.append(name)
        return med

    rightd = jnp.asarray(right)
    # distinct device-resident inputs per iteration
    lefts = [jnp.asarray(np.roll(left, i, axis=0)) for i in range(_N_TIMED)]
    for x in lefts:
        x.block_until_ready()

    def batch_stacks(B=8):
        """_N_TIMED distinct device-resident (B, H, W, 3) stacks."""
        stacks = []
        for i in range(_N_TIMED):
            s = jnp.asarray(np.stack(
                [np.roll(left, i * B + j, axis=0) for j in range(B)]))
            s.block_until_ready()
            stacks.append(s)
        return stacks

    # ---- headline: fused consistent ASW, single frame -------------------
    try:
        from simplestereo_tpu.passive.asw_pallas import asw_disparity

        dt = timed("asw", lambda x: asw_disparity(x, rightd, **kw), lefts)
        mpixdisp = H * W * D / dt / 1e6
        if gt is not None:
            disp0 = np.asarray(asw_disparity(jnp.asarray(left), rightd, **kw))
            extra["bad2_nonocc"] = bad2(disp0)
    except Exception as e:
        errors.append(f"asw: {e!r}")

    # ---- ASW step=2 (the mode the reference proposed, never implemented)
    try:
        if not guard("asw_step2"):
            from simplestereo_tpu.passive.asw_pallas import asw_disparity

            dt2 = timed("asw_step2",
                        lambda x: asw_disparity(x, rightd, step=2, **kw),
                        lefts)
            extra["asw_step2_mpixdisp_per_s"] = round(
                H * W * D / dt2 / 1e6, 2)
            if gt is not None:
                d2 = np.asarray(asw_disparity(jnp.asarray(left), rightd,
                                              step=2, **kw))
                extra["asw_step2_bad2_nonocc"] = bad2(d2)
    except Exception as e:
        errors.append(f"asw_step2: {e!r}")

    # ---- batched ASW (frame axis folded into the Pallas kernel grid) ----
    try:
        if not guard("asw_batch8"):
            from simplestereo_tpu.passive.asw_pallas import (
                asw_disparity_batch)

            # Device-resident varying inputs (the tunnel's host link
            # would otherwise dominate; outputs are fully read back).
            B = 8
            s2d = jnp.asarray(np.stack([right] * B))
            dtb = timed("asw_batch8",
                        lambda s: asw_disparity_batch(s, s2d, **kw),
                        batch_stacks(B)) / B
            extra["asw_batch8_mpixdisp_per_s"] = round(
                H * W * D / dtb / 1e6, 2)
    except Exception as e:
        errors.append(f"asw_batch8: {e!r}")

    # ---- SGM (replaces the reference's cv2.StereoSGBM delegation) -------
    try:
        if not guard("sgm"):
            from simplestereo_tpu.passive.sgm import StereoSGM

            # Tuned Tsukuba operating point (census cost, uniqueness off
            # keeps the nonocc evaluation dense): bad-2.0 2.7%.
            sgm = StereoSGM(minDisparity=0, numDisparities=16, blockSize=3,
                            P1=120, P2=480, uniquenessRatio=0,
                            costMethod="census", censusWindow=7)
            dts = timed("sgm", lambda x: sgm.compute(x, rightd), lefts)
            extra["sgm_mpixdisp_per_s"] = round(H * W * 16 / dts / 1e6, 2)
            if gt is not None:
                dsg = sgm.compute(left, rightd)
                extra["sgm_bad2_nonocc"] = bad2(dsg, disp_scale=1 / 16.0)
    except Exception as e:
        errors.append(f"sgm: {e!r}")

    # ---- SGM, r01-continuity point (BT cost) -----------------------------
    # Rounds 1-2 timed THIS config (bad-2.0 3.55%); round 3 moved the
    # tuned point to census-7 above, which costs more per pixel — keeping
    # both separates operating-point moves from real regressions.
    try:
        if not guard("sgm_bt"):
            from simplestereo_tpu.passive.sgm import StereoSGM

            sgm_bt = StereoSGM(minDisparity=0, numDisparities=16,
                               blockSize=3, P1=36, P2=144, preFilterCap=15,
                               uniquenessRatio=0)
            dtsb = timed("sgm_bt", lambda x: sgm_bt.compute(x, rightd),
                         lefts)
            extra["sgm_bt_mpixdisp_per_s"] = round(
                H * W * 16 / dtsb / 1e6, 2)
            if gt is not None:
                extra["sgm_bt_bad2_nonocc"] = bad2(
                    sgm_bt.compute(left, rightd), disp_scale=1 / 16.0)
    except Exception as e:
        errors.append(f"sgm_bt: {e!r}")

    # ---- batched SGM ------------------------------------------------------
    try:
        if not guard("sgm_batch8"):
            from simplestereo_tpu.passive.sgm import _sgm_disparity_batch

            B = 8
            s2d = jnp.asarray(np.stack([np.asarray(right)] * B))
            bkw = dict(min_disp=0, num_disp=16, block_size=3, P1=36.0,
                       P2=144.0, paths=8, prefilter_cap=15.0,
                       uniqueness=0.0, disp12_max_diff=-1, subpixel=True,
                       aggregator="pallas")
            dtsb = timed("sgm_batch8",
                         lambda s: _sgm_disparity_batch(s, s2d, **bkw),
                         batch_stacks(B)) / B
            extra["sgm_batch8_mpixdisp_per_s"] = round(
                H * W * 16 / dtsb / 1e6, 2)
    except Exception as e:
        errors.append(f"sgm_batch8: {e!r}")

    # ---- 720p production-size rows (round 5, VERDICT r4 item 3) ---------
    # The frame size the reference refuses to run at full resolution
    # (examples/009:31-34 downsamples 4x before ASW). Real lawn pair,
    # 5 inputs (1 warm + 4 timed) — the kernels' compile cost dominates
    # this stage's wall clock, the calls themselves are ~150-250 ms.
    lawn_l = lawn_r = None
    try:
        if _RUN_720P and not guard("asw_720p"):
            lawn_l = imread("/root/reference/examples/res/2/lawn_L.png")
            lawn_r = imread("/root/reference/examples/res/2/lawn_R.png")
            H7, W7 = lawn_l.shape[:2]
            lawn_rd = jnp.asarray(lawn_r)
            lawn_ls = [jnp.asarray(np.roll(lawn_l, i, axis=0))
                       for i in range(5)]
            for x in lawn_ls:
                x.block_until_ready()
            from simplestereo_tpu.passive.asw_pallas import asw_disparity

            dt7 = timed("asw_720p",
                        lambda x: asw_disparity(x, lawn_rd, **kw), lawn_ls)
            extra["asw_720p_ms"] = round(dt7 * 1e3, 1)
            extra["asw_720p_mpixdisp_per_s"] = round(
                H7 * W7 * D / dt7 / 1e6, 1)
    except Exception as e:
        errors.append(f"asw_720p: {e!r}")

    try:
        if _RUN_720P and not guard("sgm_720p"):
            if lawn_l is None:
                # the asw_720p stage failed or was budget-skipped before
                # the lawn pair loaded; say so instead of silently
                # dropping the flagship row from the record
                raise RuntimeError(
                    "lawn pair unavailable (asw_720p failed/skipped)")
            from simplestereo_tpu.passive.sgm import _sgm_disparity

            skw = dict(min_disp=0, num_disp=128, block_size=3, P1=36.0,
                       P2=144.0, paths=8, prefilter_cap=15.0,
                       uniqueness=0.0, disp12_max_diff=-1, subpixel=True,
                       aggregator="pallas")
            dt7s = timed("sgm_720p",
                         lambda x: _sgm_disparity(x, lawn_rd, **skw),
                         lawn_ls)
            extra["sgm_720p_ms"] = round(dt7s * 1e3, 1)
            extra["sgm_720p_mpixdisp_per_s"] = round(
                H7 * W7 * 128 / dt7s / 1e6, 1)
    except Exception as e:
        errors.append(f"sgm_720p: {e!r}")

    # ---- GSW (closed-form weights + Pallas kernel, round 3) -------------
    # The reference's chamfer recursion provably collapses to the direct
    # color distance (gsw.py:_gsw_weights); on TPU the engine="auto"
    # default routes to the Pallas kernel (gsw_pallas.py — bit-exact vs
    # the XLA path on hardware, 2.4x faster). Tuned Tsukuba quality
    # point: win=23, gamma=12.5, fMax=20, consistent -> bad-2.0 2.4%
    # (round-2 defaults scored 7.4%).
    try:
        if not guard("gsw"):
            from simplestereo_tpu.passive.gsw import gsw_disparity

            gkw = dict(win_size=23, min_disp=4, max_disp=14, gamma=12.5,
                       f_max=20.0, iterations=1, consistent=True)
            dtg = timed("gsw", lambda x: gsw_disparity(x, rightd, **gkw),
                        lefts)
            extra["gsw_mpixdisp_per_s"] = round(H * W * D / dtg / 1e6, 2)
            if gt is not None:
                dg = np.asarray(gsw_disparity(jnp.asarray(left), rightd,
                                              **gkw))
                extra["gsw_bad2_nonocc"] = bad2(dg)
    except Exception as e:
        errors.append(f"gsw: {e!r}")

    # ---- batched GSW (Pallas kernel; both matching directions of every
    # frame ride the kernel's frame-grid axis in ONE launch) ------------
    try:
        if not guard("gsw_batch8"):
            from simplestereo_tpu.passive.gsw_pallas import (
                gsw_disparity_pallas_batch)

            B = 8
            s2d = jnp.asarray(np.stack([right] * B))
            gbkw = dict(win_size=23, min_disp=4, max_disp=14, gamma=12.5,
                        f_max=20.0, consistent=True)
            dtgb = timed("gsw_batch8",
                         lambda s: gsw_disparity_pallas_batch(s, s2d,
                                                              **gbkw),
                         batch_stacks(B)) / B
            extra["gsw_batch8_mpixdisp_per_s"] = round(
                H * W * D / dtgb / 1e6, 2)
    except Exception as e:
        errors.append(f"gsw_batch8: {e!r}")

    # ---- GSW mutual-information cost (round 4: on the Pallas kernel) ----
    # The reference's unimplemented TODO (_passive.cpp:506-508); the
    # repo's radiometric-robust dense matcher. Whole refinement (3 MI
    # iterations x both matching directions) is one device program.
    try:
        if not guard("gsw_mi"):
            from simplestereo_tpu.passive.gsw import gsw_disparity

            mkw = dict(win_size=23, min_disp=4, max_disp=14, gamma=12.5,
                       cost_method="mi", bins=24, mi_iterations=3,
                       consistent=True)
            dtm = timed("gsw_mi",
                        lambda x: gsw_disparity(x, rightd, **mkw), lefts)
            extra["gsw_mi_mpixdisp_per_s"] = round(H * W * D / dtm / 1e6, 2)
            if gt is not None:
                dm = np.asarray(gsw_disparity(jnp.asarray(left), rightd,
                                              **mkw))
                extra["gsw_mi_bad2_nonocc"] = bad2(dm)
    except Exception as e:
        errors.append(f"gsw_mi: {e!r}")

    # ---- quality preset (VERDICT r3 item 7: benched composite point) ----
    # The SGM leg is the differentiated composition (census + LR/uniq +
    # WLS confidence-weighted fill -> dense); the ASW leg equals the
    # headline consistent ASW already timed above.
    try:
        if not guard("quality_sgm"):
            from simplestereo_tpu.passive import quality_disparity

            nright = np.asarray(right)
            nlefts = [np.roll(left, i, axis=0) for i in range(_N_TIMED)]
            dtq = timed("quality_sgm",
                        lambda x: quality_disparity(x, nright, 0, 15,
                                                    matcher="sgm"), nlefts)
            extra["quality_sgm_ms"] = round(dtq * 1e3, 1)
            if gt is not None:
                dq = quality_disparity(left, right, 0, 15, matcher="sgm")
                ev = evaluate_disparity(
                    dq, gt, nonocc > 0, bad_thresholds=(2.0,),
                    gt_scale=tsukuba_scale)
                extra["quality_sgm_bad2_nonocc"] = round(ev["bad2"], 4)
                extra["quality_sgm_avgerr_px"] = round(ev["avgerr"], 3)
    except Exception as e:
        errors.append(f"quality: {e!r}")

    # ---- FTP structured-light cloud (BASELINE.json config #5) ----------
    try:
        if not guard("ftp_cloud"):
            from simplestereo_tpu import StereoRig, warp
            from simplestereo_tpu.active import buildFringe, StereoFTP
            from simplestereo_tpu.geometry.npgeom import rodrigues_to_matrix

            res = (640, 480)
            Kf = np.array([[700.0, 0, 319.5], [0, 700.0, 239.5],
                           [0, 0, 1]])
            Rf = rodrigues_to_matrix(np.array([0.0, -0.05, 0.0]))
            Tf = np.array([[-200.0], [5.0], [30.0]])
            rig = StereoRig(res, res, Kf, Kf, None, None, Rf, Tf)
            fringe = buildFringe(16.0, dims=res, stripeColor="red")
            z0 = 2600.0
            gxf, gyf = np.meshgrid(np.arange(res[0], dtype=float),
                                   np.arange(res[1], dtype=float))
            rays = np.stack([gxf, gyf, np.ones_like(gxf)], -1) \
                @ np.linalg.inv(Kf).T
            q = (z0 * rays @ Rf.T + Tf.ravel()) @ Kf.T
            cam = np.asarray(warp.remap(
                jnp.asarray(fringe),
                jnp.asarray(q[..., 0] / q[..., 2], jnp.float32),
                jnp.asarray(q[..., 1] / q[..., 2], jnp.float32),
                interpolation="linear"))
            ftp = StereoFTP(rig, fringe, 16.0)
            rngf = np.random.default_rng(0)
            # distinct inputs per call (±2-gray sensor noise; full host
            # pipeline incl. stripe estimation runs every call)
            cams = [np.clip(cam.astype(np.int16)
                            + rngf.integers(-2, 3, cam.shape), 0, 255)
                    .astype(np.uint8) for _ in range(_N_TIMED)]
            cl_holder = []

            def ftp_call(cm):
                cl_holder.append(ftp.getCloud(cm))
                return cl_holder[-1]

            dtf = timed("ftp_cloud", ftp_call, cams)
            cl = cl_holder[-1]
            extra["ftp_cloud_640x480_ms"] = round(dtf * 1e3, 1)
            extra["ftp_cloud_mpix_per_s"] = round(
                res[0] * res[1] / dtf / 1e6, 2)
            cz = cl[40:-40, 40:-40, 2]
            cz = cz[np.isfinite(cz)]
            extra["ftp_plane_median_z_err_pct"] = round(
                abs(float(np.median(cz)) - z0) / z0 * 100, 4)
    except Exception as e:
        errors.append(f"ftp: {e!r}")

    # ---- FTP batched scanning (round 4: getCloudBatch) ------------------
    # Throughput form of getCloud: the dense work of a (B, H, W, 3)
    # capture stack is two device programs regardless of B, so per-frame
    # dispatch latency (the dominant single-frame cost on this link) is
    # paid once per batch. 1 warm + 4 timed calls (each moves ~37 MB
    # over the tunnel) keep the stage's wall-clock bounded; n is
    # recorded.
    try:
        if not guard("ftp_cloud_batch8"):
            Bf = 8
            stacks_f = [np.stack([np.clip(cam.astype(np.int16)
                                          + rngf.integers(-2, 3, cam.shape),
                                          0, 255).astype(np.uint8)
                                  for _ in range(Bf)]) for _ in range(5)]
            cb_holder = []

            def ftp_batch_call(st):
                cb_holder.append(ftp.getCloudBatch(st))
                return cb_holder[-1]

            dtfb = timed("ftp_cloud_batch8", ftp_batch_call, stacks_f) / Bf
            extra["ftp_cloud_batch8_ms_per_frame"] = round(dtfb * 1e3, 1)
            extra["ftp_cloud_batch8_mpix_per_s"] = round(
                res[0] * res[1] / dtfb / 1e6, 2)
    except Exception as e:
        errors.append(f"ftp_batch: {e!r}")

    # ---- Gray-code structured light (round 4: VERDICT r3 item 6) --------
    # The other structured-light pipeline — the repo's largest speedup
    # over the reference (vectorized decode vs active.py:1221-1226's
    # per-pixel Python loop over cv2 getProjPixel). Link-heavy: every
    # getCloud call uploads an ~11.7 MB pattern stack and reads back a
    # ~4 MB dense cloud + ~7 MB gathered points — the up_mb/rd_mb +
    # link sentinel fields exist to make THIS stage's swings
    # attributable (r04: driver 940 ms vs builder 409 ms, identical
    # code, IQR 431 — bulk link throughput, not compute).
    try:
        if not guard("graycode_decode"):
            from simplestereo_tpu import StereoRig
            from simplestereo_tpu.active import GrayCode
            from simplestereo_tpu.active.graycode import decode_graycode
            from simplestereo_tpu.active.patterns import graycode_patterns
            from simplestereo_tpu.geometry.npgeom import rodrigues_to_matrix

            res = (640, 480)
            proj = (640, 480)
            Kg = np.array([[700.0, 0, 319.5], [0, 700.0, 239.5],
                           [0, 0, 1]])
            Rg = rodrigues_to_matrix(np.array([0.0, -0.05, 0.0]))
            Tg = np.array([[-200.0], [5.0], [30.0]])
            grig = StereoRig(res, proj, Kg, Kg, None, None, Rg, Tg)
            gc = GrayCode(grig)
            pats, _, _ = graycode_patterns(proj)  # (2*(nx+ny), h, w) uint8
            nP = pats.shape[0]

            # Decode throughput: jitted decode on device-resident varying
            # stacks, full readback of (px, py, valid).
            rngg = np.random.default_rng(1)
            stacks = []
            for i in range(_N_TIMED):
                s = jnp.asarray(np.clip(
                    pats.astype(np.int16)
                    + rngg.integers(-2, 3, pats.shape),
                    0, 255).astype(np.uint8))
                s.block_until_ready()
                stacks.append(s)

            def dec(s):
                px, py, ok = decode_graycode(s, nx=gc.nx, ny=gc.ny)
                return np.stack([np.asarray(px), np.asarray(py),
                                 np.asarray(ok)])

            dtd = timed("graycode_decode", dec, stacks)
            extra["graycode_decode_mpix_per_s"] = round(
                nP * res[0] * res[1] / dtd / 1e6, 1)

            # Full getCloud on a synthetic plane capture (patterns
            # remapped through the same plane homography as the FTP
            # stage), host pipeline included.
            gxf, gyf = np.meshgrid(np.arange(res[0], dtype=float),
                                   np.arange(res[1], dtype=float))
            rays = np.stack([gxf, gyf, np.ones_like(gxf)], -1) \
                @ np.linalg.inv(Kg).T
            z0g = 2600.0
            qg = (z0g * rays @ Rg.T + Tg.ravel()) @ Kg.T
            mx = jnp.asarray(qg[..., 0] / qg[..., 2], jnp.float32)
            my = jnp.asarray(qg[..., 1] / qg[..., 2], jnp.float32)
            from simplestereo_tpu import warp as _warp
            cap0 = np.stack([np.asarray(_warp.remap(jnp.asarray(p), mx, my,
                                                    interpolation="linear"))
                             for p in pats])
            caps = [np.clip(cap0.astype(np.int16)
                            + rngg.integers(-2, 3, cap0.shape), 0, 255)
                    .astype(np.uint8) for _ in range(_N_TIMED)]

            cloud_holder = []

            def gc_call(cp):
                cloud_holder.append(gc.getCloud(list(cp)))
                return cloud_holder[-1]

            if not guard("graycode_cloud"):
                dtc = timed("graycode_cloud", gc_call, caps)
                extra["graycode_cloud_640x480_ms"] = round(dtc * 1e3, 1)
    except Exception as e:
        errors.append(f"graycode: {e!r}")

    # ---- link_flags: stages whose surrounding bulk-link rate skewed -----
    link_flags = []
    all_dn = [p[1] for s in stats.values() for p in s["link_mbps"]]
    med_dn = float(np.median(all_dn)) if all_dn else 0.0
    for name, s in stats.items():
        (pu, pd), (ou, od) = s["link_mbps"]
        skew = (abs(ou - pu) / max(min(pu, ou), 1e-9) > 0.25
                or abs(od - pd) / max(min(pd, od), 1e-9) > 0.25)
        depressed = med_dn > 0 and (pd + od) / 2 < med_dn * 2 / 3
        if skew or depressed:
            link_flags.append(name)

    baseline = 1.33  # Mpix*disp/s (reference, 4 CPU threads)
    rnd = _this_round()
    detail_rel = f"benchmarks/BENCH_full_r{rnd:02d}.json"
    full = {
        "metric": "asw_tsukuba_consistent_throughput",
        "value": round(mpixdisp, 2) if mpixdisp is not None else None,
        "unit": "Mpix*disp/s",
        "vs_baseline": (round(mpixdisp / baseline, 2)
                        if mpixdisp is not None else None),
        **extra,
        "stats": stats,
        "load_flags": load_flags,
        "link_flags": link_flags,
        "skipped": skipped,
        "elapsed_s": round(time.time() - t_start, 1),
    }
    prior_name, prior = _prior_parsed()
    if prior:
        deltas = {}
        for k, v in full.items():
            pv = prior.get(k)
            if (isinstance(v, (int, float)) and not isinstance(v, bool)
                    and isinstance(pv, (int, float)) and pv):
                deltas[k] = {"prior": pv, "now": v,
                             "ratio": round(v / pv, 3)}
        full["deltas_vs_prior"] = {"artifact": prior_name, "keys": deltas}
    if errors:
        full["errors"] = errors
    try:
        with open(os.path.join(_HERE, detail_rel), "w") as f:
            json.dump(full, f, indent=1)
    except Exception as e:
        errors.append(f"detail_write: {e!r}")

    # ---- compact printed line (the driver's artifact; <= ~1.9 kB) -------
    # s: {stage: [ms, iqr_ms]}; lk (stages moving >= 1 MB/call):
    # {stage: [up_mb, rd_mb, pre_up, pre_dn, post_up, post_dn]}.
    compact = {
        "metric": full["metric"], "value": full["value"],
        "unit": full["unit"], "vs_baseline": full["vs_baseline"],
        "bad2_nonocc": extra.get("bad2_nonocc"),
        "s": {k: [s["ms"], s["iqr_ms"]] for k, s in stats.items()},
        "lk": {k: [s["up_mb"], s["rd_mb"],
                   s["link_mbps"][0][0], s["link_mbps"][0][1],
                   s["link_mbps"][1][0], s["link_mbps"][1][1]]
               for k, s in stats.items()
               if s["up_mb"] + s["rd_mb"] >= 1.0},
        "disp_ms": ([round(min(s["sentinel_ms"][0] for s in
                               stats.values()), 1),
                     round(max(s["sentinel_ms"][1] for s in
                               stats.values()), 1)] if stats else None),
        "link_mbps_median": (round(med_dn, 1) if all_dn else None),
        "load_flags": load_flags, "link_flags": link_flags,
        "skipped": skipped, "errors_n": len(errors),
        "detail": detail_rel,
    }
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > _LINE_CAP:  # degrade gracefully, never truncate JSON
        compact.pop("lk", None)
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > _LINE_CAP:
        compact["s"] = {k: v[0] for k, v in compact["s"].items()}
        line = json.dumps(compact, separators=(",", ":"))
    print(line)
    return 0


def main():
    if os.environ.get(_CHILD_ENV):
        return _child()
    return _parent()


if __name__ == "__main__":
    sys.exit(main())
