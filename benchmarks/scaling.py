"""Multi-device scaling report for the tiled dense-matching pipeline.

SURVEY.md §5/§8 deliverable: scaling behavior of the row-tiled ASW
matcher (shard_map + ppermute halo exchange) at 1 / 2 / 4 / 8 devices.

Only one real TPU chip is reachable from this environment, and wall-clock
on a *virtual* CPU device mesh is not meaningful (all virtual devices
share one host threadpool; an N-device run contends with itself).
Likewise XLA cost_analysis of the interpreter-mode Pallas program
over-counts multi-band grids. The harness therefore reports what CAN be
established honestly without a pod:

1. **Bit-parity across mesh sizes** (virtual CPU mesh) — the sharded
   program produces the same disparity map at every N: the ppermute halo
   exchange is semantically exact, so multi-chip output == single-chip.
2. **Strong-scaling efficiency on the real chip** (``--tpu``) — each
   shard of the N-way row-sharded program is an (H/N + 2*halo)-row kernel
   invocation; timing exactly those shapes on the single real chip gives
   per-shard step time T_shard(N), and efficiency = T(1) / (N * T_shard(N)).
   This measures the true halo-redundancy overhead of the design on real
   hardware; the only unmeasured term is the ppermute itself, bounded in
   the halo analysis below.
3. **Halo traffic vs ICI bandwidth** — bytes exchanged per step per shard
   vs per-shard compute: O(winSize*W) bytes against O(H/N*W*win^2*D)
   window FLOPs, <<1% of a step on ICI-class links (100+ GB/s) even at
   H/N = 2*halo.

Usage:
  python benchmarks/scaling.py                 # parity (virtual CPU mesh)
  python benchmarks/scaling.py --tpu           # strong scaling, real chip
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def _parity_report(args, report):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from simplestereo_tpu import parallel

    rng = np.random.default_rng(0)
    H, W = args.height, args.width
    img1 = rng.integers(0, 256, (H, W, 3), np.uint8)
    img2 = np.roll(img1, -5, axis=1)
    kw = dict(win_size=args.win, min_disp=args.min_disp,
              max_disp=args.max_disp, gamma_c=15.0, gamma_p=17.5,
              consistent=True)

    ref_out = None
    for n in args.devices:
        if H % n:
            continue
        mesh = parallel.make_mesh({"rows": n}, devices=jax.devices()[:n])
        out = np.asarray(parallel.tiled_asw_disparity(img1, img2, mesh, **kw))
        if ref_out is None:
            ref_out = out
        parity = bool((out == ref_out).all())
        report["points"].append({"devices": n, "bit_parity_vs_1dev": parity})
        print(f"devices={n:2d}  parity={parity}", file=sys.stderr)


def _tpu_strong_scaling(args, report):
    """Time the per-shard kernel shapes of each mesh size on the real chip.

    Round 3: shards run in *context* mode (the form tiled_asw_disparity
    now uses) — the 2*halo neighbor rows feed boundary windows as sources
    only, no disparity is computed for them. The pre-round-3 form
    recomputed and discarded those rows (68% dispatch-corrected
    efficiency at 720p/N=8); context mode removes that redundancy.
    """
    import jax.numpy as jnp
    from simplestereo_tpu.passive.asw_pallas import asw_disparity

    halo = args.win // 2
    H, W = args.height, args.width
    rng = np.random.default_rng(0)
    base1 = rng.integers(0, 256, (H + 2 * halo, W, 3), np.uint8)
    base2 = np.roll(base1, -5, axis=1)
    kw = dict(win_size=args.win, min_disp=args.min_disp,
              max_disp=args.max_disp, gamma_c=15.0, gamma_p=17.5,
              consistent=True)

    t1 = None
    for n in args.devices:
        if H % n:
            continue
        if n == 1:
            rows, ctx, rv = H, False, None
        else:
            rows = H // n + 2 * halo
            ctx = True
            # interior-shard validity: both halos are real neighbor rows
            rv = jnp.ones((rows,), bool)
        # distinct inputs per timed call (axon tunnel can early-ack repeats)
        imgs = [jnp.asarray(np.roll(base1[:rows], i + 1, axis=0))
                for i in range(5)]
        tgt = jnp.asarray(base2[:rows])
        for x in imgs:
            x.block_until_ready()
        np.asarray(asw_disparity(imgs[0], tgt, row_valid=rv, context=ctx,
                                 **kw))  # compile
        times = []
        for x in imgs:
            t0 = time.perf_counter()
            np.asarray(asw_disparity(x, tgt, row_valid=rv, context=ctx,
                                     **kw))
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        if t1 is None:
            t1 = dt
        eff = t1 / (n * dt)
        report["points"].append({
            "devices": n, "shard_rows": rows, "context": ctx,
            "per_shard_ms": round(dt * 1e3, 2),
            "strong_scaling_efficiency": round(eff, 3)})
        print(f"devices={n:2d}  shard {rows:4d} rows  {dt * 1e3:8.2f} ms  "
              f"eff={eff:.1%}", file=sys.stderr)


def _tpu_aggregate(args, report):
    """All N shards as ONE dispatch (VERDICT r3 item 5).

    The per-shard table above pays the ~20-25 ms tunnel dispatch once
    PER SHARD, so its N=8 efficiency needed an estimated dispatch
    correction. Here the N shard programs (context mode, same shapes the
    mesh would run) are stacked on the batched kernel's frame-grid axis
    and timed as a single dispatch: T_agg(N) is the total chip time of
    the N-shard step with per-call overhead paid ONCE — the quantity a
    real pod overlaps across devices. Aggregate efficiency =
    T(1) / T_agg(N): halo + band-quantization overhead only, measured,
    no estimated delta. Also asserts shard-assembly bit-parity vs the
    single-frame kernel on the real chip.
    """
    import jax.numpy as jnp
    from simplestereo_tpu.passive.asw_pallas import (asw_disparity,
                                                     asw_disparity_batch)

    halo = args.win // 2
    H, W = args.height, args.width
    rng = np.random.default_rng(0)
    kw = dict(win_size=args.win, min_disp=args.min_disp,
              max_disp=args.max_disp, gamma_c=15.0, gamma_p=17.5,
              consistent=True)

    frames = [rng.integers(0, 256, (H, W, 3), np.uint8) for _ in range(5)]
    tgts = [np.roll(f, -5, axis=1) for f in frames]

    # single-frame baseline
    f1 = [jnp.asarray(f) for f in frames]
    t1d = [jnp.asarray(t) for t in tgts]
    for x in f1 + t1d:
        x.block_until_ready()
    np.asarray(asw_disparity(f1[0], t1d[0], **kw))
    times = []
    for x, t in zip(f1, t1d):
        t0 = time.perf_counter()
        np.asarray(asw_disparity(x, t, **kw))
        times.append(time.perf_counter() - t0)
    t1 = float(np.median(times))
    report["points"].append({"devices": 1, "one_dispatch_ms":
                             round(t1 * 1e3, 2),
                             "aggregate_efficiency": 1.0})
    print(f"single frame: {t1 * 1e3:8.2f} ms", file=sys.stderr)

    def shard_stack(frame):
        """(N, rows, W, 3) context-mode shard stack of one frame
        (halo rows replicated from neighbors; edge shards mirror the
        kernel's sentinel handling via row_valid)."""
        pad = np.pad(frame, ((halo, halo), (0, 0), (0, 0)))
        sh = H // n
        stack = np.stack([pad[i * sh: i * sh + sh + 2 * halo]
                          for i in range(n)])
        rv = np.ones((n, sh + 2 * halo), bool)
        rv[0, :halo] = False
        rv[-1, sh + halo:] = False
        return stack, rv

    for n in args.devices:
        if n == 1 or H % n:
            continue
        stacks = [shard_stack(f) for f in frames]
        tstacks = [shard_stack(t)[0] for t in tgts]
        rv = jnp.asarray(stacks[0][1])
        s1 = [jnp.asarray(s[0]) for s in stacks]
        s2 = [jnp.asarray(t) for t in tstacks]
        for x in s1 + s2:
            x.block_until_ready()
        np.asarray(asw_disparity_batch(s1[0], s2[0], row_valid=rv,
                                       context=True, **kw))
        times = []
        for a, b in zip(s1, s2):
            t0 = time.perf_counter()
            np.asarray(asw_disparity_batch(a, b, row_valid=rv,
                                           context=True, **kw))
            times.append(time.perf_counter() - t0)
        tagg = float(np.median(times))
        eff = t1 / tagg

        # shard-assembly bit-parity vs the single-frame kernel
        out = np.asarray(asw_disparity_batch(s1[0], s2[0], row_valid=rv,
                                             context=True, **kw))
        assembled = np.concatenate([out[i] for i in range(n)], axis=0)
        single = np.asarray(asw_disparity(f1[0], t1d[0], **kw))
        parity = bool((assembled == single).all())

        report["points"].append({
            "devices": n, "shard_rows": H // n + 2 * halo,
            "one_dispatch_ms": round(tagg * 1e3, 2),
            "aggregate_efficiency": round(eff, 3),
            "bit_parity_vs_single": parity})
        print(f"devices={n:2d}  N-shard single dispatch {tagg * 1e3:8.2f}"
              f" ms  agg_eff={eff:.1%}  parity={parity}",
              file=sys.stderr)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--win", type=int, default=35)
    p.add_argument("--max-disp", type=int, default=14)
    p.add_argument("--min-disp", type=int, default=4)
    p.add_argument("--height", type=int, default=288)
    p.add_argument("--width", type=int, default=384)
    p.add_argument("--tpu", action="store_true",
                   help="strong-scaling timing of shard shapes on the "
                        "real chip (default: parity on virtual CPU mesh)")
    p.add_argument("--tpu-aggregate", action="store_true",
                   help="time all N shards as ONE dispatch on the real "
                        "chip (measured aggregate efficiency, no "
                        "dispatch-correction estimate)")
    p.add_argument("--json", type=str, default=None)
    args = p.parse_args(argv)

    halo = args.win // 2
    report = {
        "task": f"tiled ASW {args.height}x{args.width}, win={args.win}, "
                f"D={args.max_disp - args.min_disp + 1}, consistent",
        "method": ("per-shard strong-scaling timing on the real chip"
                   if args.tpu else
                   "bit-parity across mesh sizes (virtual CPU mesh)"),
        "points": [],
        "halo_analysis": {
            "halo_rows_each_side": halo,
            "halo_bytes_per_step_per_shard":
                2 * halo * args.width * 3 * 2 * 4,
            "note": "ppermute exchange is O(winSize*W) bytes vs "
                    "O(H/N*W*win^2*D) window FLOPs per shard; <<1% of a "
                    "step on ICI-class links even at H/N = 2*halo",
        },
    }

    if args.tpu_aggregate:
        report["method"] = ("all-N-shards-in-one-dispatch timing on the "
                            "real chip (aggregate efficiency, measured)")
        _tpu_aggregate(args, report)
    elif args.tpu:
        _tpu_strong_scaling(args, report)
    else:
        # virtual mesh must be requested before jax initializes
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        _parity_report(args, report)

    print(json.dumps(report))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
