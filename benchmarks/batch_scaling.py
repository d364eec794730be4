"""Single-chip frame-batch scaling of the batched matcher pipelines.

Measures per-frame throughput of StereoASW/StereoSGM batched programs at
B = 1, 2, 4, 8 on the real chip (Tsukuba, headline parameters), with
device-resident varying inputs and full output readback — the evidence
behind the "frame axis on the kernel grid amortizes dispatch" design.

Usage: python benchmarks/batch_scaling.py  (writes JSON lines to stdout)
"""

import json
import sys
import time

import numpy as np


def main():
    import jax.numpy as jnp
    sys.path.insert(0, "/root/repo")
    from simplestereo_tpu.imgio import imread
    from simplestereo_tpu.passive.asw_pallas import asw_disparity_batch
    from simplestereo_tpu.passive.sgm import _sgm_disparity_batch

    d = "/root/reference/examples/res/tsukuba/"
    left = imread(d + "tsukuba_l.png")
    right = imread(d + "tsukuba_r.png")
    H, W = left.shape[:2]

    def bench(fn, B, n_iters=4):
        s2 = jnp.asarray(np.stack([right] * B))
        stacks = []
        for i in range(n_iters):
            s = jnp.asarray(np.stack(
                [np.roll(left, i * B + j + 1, axis=0) for j in range(B)]))
            s.block_until_ready()
            stacks.append(s)
        np.asarray(fn(stacks[0], s2))  # compile
        times = []
        for s1 in stacks:
            t0 = time.perf_counter()
            np.asarray(fn(s1, s2))
            times.append(time.perf_counter() - t0)
        return float(np.median(times)) / B

    asw_kw = dict(win_size=35, min_disp=4, max_disp=14, gamma_c=15.0,
                  gamma_p=17.5, consistent=True)
    sgm_kw = dict(min_disp=0, num_disp=16, block_size=3, P1=36.0, P2=144.0,
                  paths=8, prefilter_cap=15.0, uniqueness=0.0,
                  disp12_max_diff=-1, subpixel=True, aggregator="pallas")

    for B in (1, 2, 4, 8):
        dt = bench(lambda a, b: asw_disparity_batch(a, b, **asw_kw), B)
        print(json.dumps({
            "matcher": "asw", "batch": B, "ms_per_frame": round(dt * 1e3, 2),
            "mpixdisp_per_s": round(H * W * 11 / dt / 1e6, 2)}), flush=True)
    for B in (1, 2, 4, 8):
        dt = bench(lambda a, b: _sgm_disparity_batch(a, b, **sgm_kw), B)
        print(json.dumps({
            "matcher": "sgm", "batch": B, "ms_per_frame": round(dt * 1e3, 2),
            "mpixdisp_per_s": round(H * W * 16 / dt / 1e6, 2)}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
