"""Speed-of-light (roofline) anchor for the dense kernels (round 5,
VERDICT r4 item 6/weak + next-round item 2).

Every prior perf claim compares against the reference CPU or prior
rounds; this script anchors the kernels against the CHIP instead:

1. Measures the device's achievable peaks with microbenchmarks —
   VPU f32 FMA rate, HBM streaming bandwidth, MXU bf16 matmul rate —
   using the k-chaining slope method (time a program that applies the
   op K and 2K times; the slope isolates on-device rate from dispatch
   latency and link time, both of which this environment's tunnel
   inflates and swings).
2. Times the production kernels by BATCH slope (per-frame marginal time
   between batch sizes B1 < B2 — fixed dispatch/readback costs cancel),
   converts the analytic per-frame work counts into achieved rates, and
   reports achieved/peak with the limiting resource.

Work accounting (per output pixel; MAC = multiply-accumulate = 2 FLOPs):

- ASW (win, D, consistent): the num/den accumulation is 3 MACs per
  (window offset, candidate) = 3*win^2*D MACs — the O(win^2*D) chain
  CLAUDE.md records as intrinsic (no MXU contraction exists: the
  three-way product e1*e2_d*tad_d is elementwise in the pixel, see the
  ASW MXU/bf16 negative result). Weight construction adds ~2*win^2
  exp/sqrt-bearing ops; TAD volume ~win*D*3. Consistent mode is the
  same single pass (cost symmetry).
- GSW (win, D, consistent): 2 MACs per (offset, candidate) per
  direction (num accumulation; no den), x2 directions for consistent;
  weights ~win^2 exp ops per direction.
- SGM (D, paths): cost volume + 8 directional scans, ~5 FLOPs per
  (pixel, candidate, path) of add/min plus WTA — but the volume is
  streamed to/from HBM between scan passes, so the bound to compare is
  HBM bytes: ~(paths+2) reads + ~paths writes of the f32 (H, W, D)
  volume.
- FTP fused program: per-row FFTs are ~5*N*log2(N) FLOPs/row — a
  compute load in the tens of MFLOPs, with ~50 MB of HBM traffic; its
  measured time is set by neither (per-op dispatch/serialization of the
  many small stages dominate) — reported for honesty.

Usage: python benchmarks/roofline.py  (real TPU; prints one JSON line).
SCALING.md's "Speed of light" table is generated from this output.
"""

import json
import sys
import time

import numpy as np


def _slope(run, ks=(1, 5), reps=3):
    """Marginal seconds per unit k: median-of-reps timings at a small
    and a large k (each run fresh-input, full readback of a small
    result); the difference cancels dispatch latency, which through
    this environment's tunnel is 20-45 ms and noisy — ks must be far
    enough apart that the work difference dominates it."""
    med = {}
    for k in ks:
        run(k)  # warm/compile for this k
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run(k)
            ts.append(time.perf_counter() - t0)
        med[k] = float(np.median(ts))
    return (med[ks[-1]] - med[ks[0]]) / (ks[-1] - ks[0])


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    out = {}

    # ---- 1a. VPU f32 FMA rate -------------------------------------------
    # A depth-32 in-register FMA chain per element per iteration: XLA
    # fuses the body into ONE pass over the array (load, 16 FMAs,
    # store), so VMEM traffic is 8 B per 32 FLOPs and the ALUs bind.
    # (Variants that moved the array once per FMA measured 0.8-1.25
    # TFLOP/s — VMEM-bandwidth-bound at ~3-4 TB/s, not the ALU rate.
    # Element-to-element the chain pipelines, so in-element dependency
    # depth costs nothing.)
    N = 1024 * 1024  # 4 MB f32, VMEM-resident
    DEPTH = 32
    FL_PER_ITER = 2 * DEPTH * N

    @partial(jax.jit, static_argnames=("k",))
    def vpu_prog(x, k):
        consts = [(1.0 + 1e-6 * (i + 1), 1e-3 * (i + 1))
                  for i in range(DEPTH)]

        def body(_, v):
            for a, b in consts:
                v = v * a + b
            return v
        return jax.lax.fori_loop(0, k, body, x)[:8].sum()

    xs = [jnp.asarray(np.random.default_rng(i).random(N, np.float32))
          for i in range(8)]
    for a in xs:
        a.block_until_ready()
    it = iter(np.random.permutation(len(xs)).tolist() * 8)

    def vpu_run(k):
        np.asarray(vpu_prog(xs[next(it)], k * 4096))

    s = _slope(vpu_run)
    out["vpu_f32_tflops"] = round(FL_PER_ITER * 4096 / s / 1e12, 2)

    # ---- 1b. HBM streaming bandwidth ------------------------------------
    # x = x + 1 over a 512 MB array — 4x any VMEM, so every iteration
    # streams the full array from HBM and back (a 64 MB variant measured
    # 4.2 TB/s: VMEM-resident, not HBM). The fori body compiles once —
    # no cross-iteration fusion.
    M = 128 * 1024 * 1024  # 512 MB f32
    BYTES_PER_ITER = 2 * 4 * M

    @partial(jax.jit, static_argnames=("k",))
    def hbm_prog(x, k):
        def body(_, v):
            return v + 1.0
        return jax.lax.fori_loop(0, k, body, x)[:8].sum()

    hs = [jnp.asarray(np.random.default_rng(10 + i).random(M, np.float32))
          for i in range(2)]
    for a in hs:
        a.block_until_ready()
    hit = iter(np.random.permutation(len(hs)).tolist() * 32)

    def hbm_run(k):
        np.asarray(hbm_prog(hs[next(hit)], k * 16))

    s = _slope(hbm_run)
    out["hbm_gbps"] = round(BYTES_PER_ITER * 16 / s / 1e9, 1)

    # ---- 1c. MXU bf16 matmul rate ---------------------------------------
    K_DIM = 2048
    FL_PER_MM = 2 * K_DIM ** 3

    @partial(jax.jit, static_argnames=("k",))
    def mxu_prog(a, b, k):
        def body(_, c):
            return ((c @ b) * 0.001).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, k, body, a)[:2, :2] \
            .astype(jnp.float32).sum()

    ms_ = [jnp.asarray(np.random.default_rng(20 + i).random(
        (K_DIM, K_DIM), np.float32), jnp.bfloat16) for i in range(4)]
    bmat = jnp.asarray(np.random.default_rng(30).random(
        (K_DIM, K_DIM), np.float32) * 0.01, jnp.bfloat16)
    for a in ms_:
        a.block_until_ready()
    bmat.block_until_ready()
    mit = iter(np.random.permutation(len(ms_)).tolist() * 16)

    def mxu_run(k):
        np.asarray(mxu_prog(ms_[next(mit)], bmat, k * 64))

    s = _slope(mxu_run)
    out["mxu_bf16_tflops"] = round(FL_PER_MM * 64 / s / 1e12, 1)

    # ---- 2. kernels: per-frame marginal by batch slope ------------------
    from simplestereo_tpu.imgio import imread

    res = "/root/reference/examples/res/tsukuba/"
    left = imread(res + "tsukuba_l.png")
    right = imread(res + "tsukuba_r.png")
    H, W = left.shape[:2]
    rng = np.random.default_rng(0)

    def stacks(B, n=6):
        s1 = [np.stack([np.roll(left, i * B + j, axis=0)
                        for j in range(B)]) for i in range(n)]
        s2 = np.stack([right] * B)
        return ([jnp.asarray(x) for x in s1], jnp.asarray(s2))

    def batch_slope(fn, b1=2, b2=8):
        """Per-frame marginal seconds between batch sizes (fixed
        dispatch + per-call overheads cancel; varying inputs)."""
        res_ = {}
        for B in (b1, b2):
            ss_, s2 = stacks(B)
            np.asarray(fn(ss_[0], s2))  # compile + warm
            ts = []
            for x in ss_[1:]:
                t0 = time.perf_counter()
                np.asarray(fn(x, s2))
                ts.append(time.perf_counter() - t0)
            res_[B] = float(np.median(ts))
        return (res_[b2] - res_[b1]) / (b2 - b1)

    # ASW: win=35, D=11, consistent (headline operating point)
    win, D = 35, 11
    from simplestereo_tpu.passive.asw_pallas import asw_disparity_batch

    kw = dict(win_size=win, min_disp=4, max_disp=14, gamma_c=15.0,
              gamma_p=17.5, consistent=True)
    t_f = batch_slope(lambda a, b: asw_disparity_batch(a, b, **kw))
    macs = H * W * (3 * win * win * D + 2 * win * win + 3 * win * D)
    out["asw_frame_ms"] = round(t_f * 1e3, 2)
    out["asw_gmacs"] = round(macs / 1e9, 2)
    out["asw_achieved_tflops"] = round(2 * macs / t_f / 1e12, 2)
    out["asw_pct_vpu_peak"] = round(
        100 * 2 * macs / t_f / 1e12 / out["vpu_f32_tflops"], 1)

    # GSW: win=23, D=11, consistent (tuned point)
    gwin = 23
    from simplestereo_tpu.passive.gsw_pallas import gsw_disparity_pallas_batch

    gkw = dict(win_size=gwin, min_disp=4, max_disp=14, gamma=12.5,
               f_max=20.0, consistent=True)
    t_g = batch_slope(lambda a, b: gsw_disparity_pallas_batch(a, b, **gkw))
    gmacs = 2 * H * W * (2 * gwin * gwin * D + gwin * gwin)
    out["gsw_frame_ms"] = round(t_g * 1e3, 2)
    out["gsw_gmacs"] = round(gmacs / 1e9, 2)
    out["gsw_achieved_tflops"] = round(2 * gmacs / t_g / 1e12, 2)
    out["gsw_pct_vpu_peak"] = round(
        100 * 2 * gmacs / t_g / 1e12 / out["vpu_f32_tflops"], 1)

    # SGM: D=16, 8 paths, Pallas aggregation — HBM-bound accounting
    from simplestereo_tpu.passive.sgm import _sgm_disparity_batch

    skw = dict(min_disp=0, num_disp=16, block_size=3, P1=36.0, P2=144.0,
               paths=8, prefilter_cap=15.0, uniqueness=0.0,
               disp12_max_diff=-1, subpixel=True, aggregator="pallas")
    t_s = batch_slope(lambda a, b: _sgm_disparity_batch(a, b, **skw))
    vol = H * W * 16 * 4  # f32 cost volume bytes
    # cost write + per-path read of the volume + aggregate accumulate
    # (read+write) + WTA read: ~(1 + 8 + 2*8 + 1) volume passes is the
    # upper bound; the streaming kernels fuse aggregation into the scan,
    # ~(1 write + 8 reads + 8 writes + 1 read) = 18 passes is the
    # as-built count.
    sgm_bytes = 18 * vol
    out["sgm_frame_ms"] = round(t_s * 1e3, 2)
    out["sgm_hbm_mb"] = round(sgm_bytes / 1e6, 1)
    out["sgm_achieved_gbps"] = round(sgm_bytes / t_s / 1e9, 1)
    out["sgm_pct_hbm_peak"] = round(
        100 * sgm_bytes / t_s / 1e9 / out["hbm_gbps"], 1)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
