"""
asw_pallas
==========

Production Pallas/TPU kernel for the Adaptive Support-Weight matcher.

Replaces the reference's C++ thread-pool kernel
(/root/reference/simplestereo/_passive.cpp: workerASW :16-105,
workerASWconsistent :108-289, computeASW :293-400) with a TPU-first design:

- **Grid over row bands.** The reference drains a ``SafeQueue`` of row
  indices with ``std::thread``s; here a 1-D Pallas grid assigns each program
  a band of ``tile_h`` output rows (chosen per shape by
  :func:`_pick_tile_h` to amortize the halo work under a VMEM budget).
  Input planes stay in HBM and each program DMAs its
  (tile_h + winSize-1)-row halo slab into VMEM once, so HBM traffic is
  O(image), not O(image * window).
- **Validity by sentinel padding, not branches.** The reference skips
  out-of-image window pixels with ``if`` tests. Out-of-image Lab samples
  are padded with a large sentinel so their support weight
  ``exp(-||dLab||/gammaC)`` underflows to exactly 0 — the same exclusion,
  branch-free and fully vectorized on the VPU.
- **Lane-rotation window walk.** Mosaic cannot vector-load at dynamic
  sublane offsets, so the window loop is structured as: dynamic *lane*
  rotation (``pltpu.roll``) over the column offset j in a ``fori_loop``,
  with the row offset i as a static unroll (static sublane slices).
  Rolled-in wrap values land either on sentinel-weighted (w=0) window
  pixels or on masked-out disparity candidates, so no masking ops are
  needed in the hot loop.
- **Weight factorization.** w = exp(-(dl1+dl2)/gC) = exp(-dl1/gC) *
  exp(-dl2/gC): the target-image factor is computed once per window offset
  and reused for every disparity candidate via a static lane rotation, so
  the inner disparity loop is pure multiply-accumulate.
- **Tie-break parity**: first-minimum argmin over the ascending disparity
  axis == the reference's reverse-d scan with strict '<' (smallest d wins).

The consistent (left-right checked) variant costs ONE kernel pass, not
two: the ASW cost is symmetric in the image pair — cost_R(x, d) =
cost_L(x+d, d), window-validity masks included — so the right-reference
map the reference computes with a second full scan
(_passive.cpp:191-253) is an extra per-d lane shift + argmin over the
cost volume already in VMEM. Invalidation and occlusion fill are cheap
O(H*W) jnp post-passes
(see :func:`simplestereo_tpu.passive.asw_ref.occlusion_fill`).

On non-TPU backends the kernel runs in Pallas interpreter mode, which is
how the unit tests validate it bit-for-bit against the pure-jnp oracle.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lab import bgr_to_lab
from .asw_ref import occlusion_fill

TAD_CAP = 40.0
LAB_SENTINEL = 1.0e6  # exp(-sentinel/gammaC) underflows to exactly 0.0
# Scratch budget for the tile-height choice; the kernel's hard
# vmem_limit is 100 MB, and large-D configs (e.g. 720p, D=90) are
# budget-bound: 76 MB admits a 16-row band there (tile 8 costs ~25%).
_VMEM_BUDGET = 76 * 1024 * 1024
# Above this disparity count the kernel switches from fully-unrolled
# disparity loops to fori_loops with incrementally-rolled carries: same
# per-element work, O(1) IR (Mosaic compile time scales with unrolled
# statement count — D=90 at 720p compiled for 24 min unrolled).
_D_UNROLL = 16
# Mosaic unrolls vector ops over 8x128 native tiles, so compile time and
# instruction count scale with tile_h * w_acc, and past a width-dependent
# band height the kernel slows down again. Measured win=35 kernel passes:
#   W=384:  tile 16/32/64/96 -> 81.9/61.9/57.4/89.4 ms (compile 16..202s)
#   W=1280: tile 16/24/32/48 -> 270/368/218/213 ms     (compile 106..466s)
# Sweet spots: ~64 rows at narrow widths, ~32 rows at 1280; tile 24 (an
# odd sublane-tile count) regressed badly, so candidates above 16 rows
# stick to multiples of 16.
def _max_tile_rows(w_acc):
    if w_acc <= 512:
        return 64
    if w_acc <= 896:
        return 48
    return 32


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _pick_tile_h(H, W, win_size, D):
    """Choose the per-program output band height.

    Each program processes a (tile_h + winSize-1)-row slab to produce
    tile_h output rows; the plane rolls and the TAD volume are O(slab),
    so small tiles waste up to slab/tile ~ 3.5x work on halo rows
    (win=35, tile=16). Pick the tile minimizing the modeled cost
    n_bands * (0.45*slab_rows + 0.55*tile) subject to a VMEM scratch
    budget; ties prefer the larger tile (fewer grid steps).
    """
    pad = win_size // 2
    w_acc, w_slab = _layout(W, win_size)
    h8 = _round_up(max(H, 8), 8)
    t_cap = _max_tile_rows(w_acc)
    best = None
    for t in (8, 16, 32, 48, 64):
        if t > min(h8, t_cap):
            break
        slab = _round_up(t + 2 * pad, 8)
        # rolled-TAD scratch doubles the volume on the large-D fori path
        n_tad = D if D <= _D_UNROLL else 2 * D
        # wide-strip walk intermediates (ctr_w channels + dsq, width
        # w_acc + D - 1) and the subpixel csub blocks (3, t, w_acc);
        # counted unconditionally to keep the budget conservative.
        wide = 4 * t * (w_acc + D - 1)
        csub = 3 * t * w_acc
        vmem = ((12 + n_tad) * slab * w_slab
                + (2 * D + 1) * t * w_acc + wide + csub) * 4
        if vmem > _VMEM_BUDGET:
            break
        n = -(-H // t)
        cost = n * (0.45 * slab + 0.55 * t)
        if best is None or cost <= best[0] + 1e-9:
            best = (cost, t)
    if best is None:  # extreme W: fall back to the smallest band
        return 8
    return best[1]


def _roll_const(a, d):
    """Circular lane roll by a *constant* shift, as concatenated static
    slices. Mosaic lowers ``pltpu.roll`` to ``tpu.dynamic_rotate`` even
    for constant shifts, which benchmarks ~4x slower than the static
    relayout this form produces; keep ``pltpu.roll`` only for genuinely
    dynamic shifts. Negative ``d`` rolls left."""
    d %= a.shape[-1]
    if d == 0:
        return a
    return jnp.concatenate([a[..., -d:], a[..., :-d]], axis=-1)


def _layout(W, win_size):
    """(accumulator width, slab width), both 128-aligned."""
    pad = win_size // 2
    w_acc = _round_up(W, 128)
    w_slab = _round_up(w_acc + 2 * pad, 128)
    return w_acc, w_slab


def _slab_rows(win_size, tile_h):
    # DMA slice row counts must be 8-aligned (HBM sublane tiling).
    return _round_up(tile_h + 2 * (win_size // 2), 8)


def _asw_kernel(prox_ref, planes_hbm, *refs, pad, w_acc, w_slab, min_disp,
                max_disp, gamma_c, win_size, tile_h, step, width,
                consistent, batched, subpixel):
    """One program = one band of ``tile_h`` output rows.

    prox_ref : (win, win) f32 in SMEM — exp(-2*sqrt(di^2+dj^2)/gammaP).
    planes_hbm : (12, Hp, w_slab) f32 in HBM/ANY —
        [0:3] Lab(ref), [3:6] Lab(tgt), [6:9] BGR(ref), [9:12] BGR(tgt);
        Lab planes sentinel-padded, BGR zero-padded. Slab column c maps to
        accumulator lane c - pad; accumulator lane l maps to image column l.
        When ``batched`` the array carries a leading frame axis
        (B, 12, Hp, w_slab) and the grid is (B, n_bands): frame data
        parallelism lives IN the kernel grid, never as a vmap around the
        pallas_call (which fails to lower on real TPU — the ANY-memspace
        operand cannot take a squeezed batch dim).
    disp_ref : (tile_h, w_acc) i32 output block — left-reference map
        ((1, tile_h, w_acc) when batched).
    dispr_ref : (tile_h, w_acc) i32 output block — right-reference map,
        derived from the SAME cost volume (see the symmetry note below);
        only present when ``consistent`` (the non-consistent path skips
        the whole costR tail).
    """
    refs = list(refs)
    disp_ref = refs.pop(0)
    dispr_ref = refs.pop(0) if consistent else None
    csub_ref = refs.pop(0) if subpixel else None
    slab, tad, tadr, num, den, sem = refs
    D = max_disp - min_disp + 1
    th = tile_h
    b = pl.program_id(1) if batched else pl.program_id(0)
    if batched:
        src = planes_hbm.at[pl.program_id(0), :,
                            pl.ds(b * th, _slab_rows(win_size, th)), :]
    else:
        src = planes_hbm.at[:, pl.ds(b * th, _slab_rows(win_size, th)), :]

    cp = pltpu.make_async_copy(src, slab, sem)
    cp.start()
    cp.wait()

    # TAD volume over the whole slab (halo rows included):
    # tad[dd](r, c) = min(40, SAD(ref(r, c), tgt(r, c - d))).
    sr = _slab_rows(win_size, th)
    if D <= _D_UNROLL:
        for dd in range(D):
            d = min_disp + dd
            sad = jnp.zeros((sr, w_slab), jnp.float32)
            for c in range(3):
                sad = sad + jnp.abs(slab[6 + c]
                                    - _roll_const(slab[9 + c], d))
            tad[dd] = jnp.minimum(sad, TAD_CAP)
    else:
        # Large D: fori with an incrementally rolled carry — same math,
        # O(1) IR instead of O(D) (Mosaic compile time scales with
        # unrolled statement count; D=90 unrolled compiled for 24 min).
        def tad_body(dd, tgt_rolled):
            sad = jnp.zeros((sr, w_slab), jnp.float32)
            for c in range(3):
                sad = sad + jnp.abs(slab[6 + c] - tgt_rolled[c])
            tad[dd] = jnp.minimum(sad, TAD_CAP)
            return [_roll_const(t, 1) for t in tgt_rolled]
        init = [_roll_const(slab[9 + c], min_disp) for c in range(3)]
        jax.lax.fori_loop(0, D, tad_body, init)

    zeros = jnp.zeros((D, th, w_acc), jnp.float32)
    num[...] = zeros
    den[...] = zeros

    inv_gc = 1.0 / gamma_c

    # Center (unshifted) Lab slices, hoisted out of the window loop.
    ctr = [slab[c, pad:pad + th, pad:pad + w_acc] for c in range(6)]

    # Wide-strip disparity walk (unrolled-D path only): the target
    # similarity e2 is evaluated once over w_acc + D - 1 columns and each
    # candidate takes a STATIC contiguous slice — one relayout per d
    # instead of a two-slice concat roll, on identical values (the extra
    # strip columns live in the slab's halo/sentinel region, which
    # requires the candidate range to fit inside the halo: |d| <= pad).
    wide_ok = (D <= _D_UNROLL and 0 <= max_disp <= pad
               and -min_disp <= pad)
    if wide_ok:
        wlo = pad - max_disp
        wide_w = w_acc + D - 1
        ctr_w = [slab[3 + c, pad:pad + th, wlo:wlo + wide_w]
                 for c in range(3)]

    # Window-offset lattice: every pixel at step=1 (reference semantics);
    # at step>1 offsets o with o % step == 0, anchored at the center
    # (the subsampled scan the reference suggested, passive.py:43-46).
    half_j = pad // step
    n_j = 2 * half_j + 1
    i_offsets = range(pad % step, win_size, step)

    def col_body(m, _):
        j = (m - half_j) * step + pad
        shift = pad - j  # rolled[c] = plane[c + (j - pad)]
        rolled = [pltpu.roll(slab[c], shift, axis=1) for c in range(6)]
        if D <= _D_UNROLL:
            tad_j = [pltpu.roll(tad[dd], shift, axis=1) for dd in range(D)]
        else:
            def roll_tad(dd, _):
                tadr[dd] = pltpu.roll(tad[dd], shift, axis=1)
                return 0
            jax.lax.fori_loop(0, D, roll_tad, 0)

        for i in i_offsets:  # static: sublane slices must be static
            def lab_sim(base):
                dsq = jnp.zeros((th, w_acc), jnp.float32)
                for c in range(3):
                    dlt = (rolled[base + c][i:i + th, pad:pad + w_acc]
                           - ctr[base + c])
                    dsq = dsq + dlt * dlt
                return jnp.exp(-jnp.sqrt(dsq) * inv_gc)

            prox2 = prox_ref[i, j]
            e1 = lab_sim(0) * prox2

            if wide_ok:
                dsq = jnp.zeros((th, wide_w), jnp.float32)
                for c in range(3):
                    dlt = (rolled[3 + c][i:i + th, wlo:wlo + wide_w]
                           - ctr_w[c])
                    dsq = dsq + dlt * dlt
                e2w = jnp.exp(-jnp.sqrt(dsq) * inv_gc)
                for dd in range(D):
                    off = max_disp - (min_disp + dd)
                    w = e1 * e2w[:, off:off + w_acc]
                    t = tad_j[dd][i:i + th, pad:pad + w_acc]
                    num[dd] = num[dd] + w * t
                    den[dd] = den[dd] + w
            elif D <= _D_UNROLL:
                e2 = lab_sim(3)
                for dd in range(D):
                    d = min_disp + dd
                    w = e1 * _roll_const(e2, d)
                    t = tad_j[dd][i:i + th, pad:pad + w_acc]
                    num[dd] = num[dd] + w * t
                    den[dd] = den[dd] + w
            else:
                # fori over disparities with an incrementally rolled
                # carry: roll-by-1 is a static relayout, so per-step cost
                # matches the unrolled roll-by-d — only the IR shrinks.
                e2 = lab_sim(3)

                def dd_body(dd, e2r):
                    w = e1 * e2r
                    t = tadr[dd][i:i + th, pad:pad + w_acc]
                    num[dd] = num[dd] + w * t
                    den[dd] = den[dd] + w
                    return _roll_const(e2r, 1)
                jax.lax.fori_loop(0, D, dd_body, _roll_const(e2, min_disp))
        return 0

    jax.lax.fori_loop(0, n_j, col_body, 0)

    # den >= 1 always (the center window pixel has weight exp(0)=1), so the
    # division is safe even on fully-padded rows/columns.
    cost = num[...] / den[...]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (D, th, w_acc), 2)
    dcand = jax.lax.broadcasted_iota(jnp.int32, (D, th, w_acc), 0) + min_disp
    def store(ref, val):
        ref[...] = val[None] if batched else val  # batched block: (1, th, w)

    cost = jnp.where(lanes >= dcand, cost, jnp.inf)   # x - d >= 0
    best = jnp.argmin(cost, axis=0).astype(jnp.int32)
    store(disp_ref, best + min_disp)

    if subpixel:
        # Neighbor costs of the winner for the quadratic sub-pixel fit,
        # extracted by one-hot selection (dynamic sublane indexing of a
        # value is not lowerable; the one-hot sum is D cheap vector ops).
        c0 = jnp.min(cost, axis=0)
        if D <= _D_UNROLL:
            cm = jnp.zeros((th, w_acc), jnp.float32)
            cp = jnp.zeros((th, w_acc), jnp.float32)
            for dd in range(D):
                cm = cm + jnp.where(best == dd + 1, cost[dd], 0.0)
                cp = cp + jnp.where(best == dd - 1, cost[dd], 0.0)
        else:
            num[...] = cost  # scratch: make cost readable at traced dd

            def sub_body(dd, carry):
                cm, cp = carry
                cd = num[dd]  # scratch block is (D, tile_h, w_acc)
                cm = cm + jnp.where(best == dd + 1, cd, 0.0)
                cp = cp + jnp.where(best == dd - 1, cd, 0.0)
                return (cm, cp)

            cm, cp = jax.lax.fori_loop(
                0, D, sub_body,
                (jnp.zeros((th, w_acc), jnp.float32),
                 jnp.zeros((th, w_acc), jnp.float32)))
        store(csub_ref, jnp.stack([cm, c0, cp]))

    if not consistent:
        return  # non-consistent path: no right-reference map needed

    # Right-reference map from the SAME volume. The ASW cost is symmetric
    # in the pair: the weight product w1(x+d)*w2(x) and the truncated SAD
    # |I1(x+d+off) - I2(x+off)| of the right-reference match (x, d) are
    # exactly the left-reference terms at column x+d (window-validity
    # masks included: both reduce to x+dj >= 0 AND x+d+dj <= W-1). Hence
    # cost_R(x, d) = cost_L(x+d, d) bit-for-bit, and the reference's
    # second full scan (_passive.cpp:191-253) collapses to a per-d lane
    # shift of the volume already in VMEM.
    if D <= _D_UNROLL:
        costR = jnp.stack(
            [_roll_const(cost[dd], -(min_disp + dd)) for dd in range(D)])
    else:
        if not subpixel:         # the subpixel branch already stored it
            num[...] = cost      # reuse scratch: masked cost volume
        def right_body(dd, _):
            # Rotate amount must be kept in [0, lanes]: NEGATIVE traced
            # amounts mis-rotate by an extra lane tile (128) on real
            # hardware when the operand is a dynamically-indexed ref
            # (interpret mode hides this; probed 2026-08-17). w_acc - d is
            # the canonical nonnegative left-shift-by-d; lax.rem keeps it
            # in range when min_disp < 0 would push it above w_acc (an
            # amount equal to the lane count rotates correctly, and so
            # does rem's 0).
            amt = jax.lax.rem(w_acc - (min_disp + dd), w_acc)
            den[dd] = pltpu.roll(num[dd], amt, axis=1)
            return 0
        jax.lax.fori_loop(0, D, right_body, 0)
        costR = den[...]
    costR = jnp.where(lanes <= (width - 1) - dcand, costR, jnp.inf)
    store(dispr_ref, jnp.argmin(costR, axis=0).astype(jnp.int32) + min_disp)


@functools.partial(
    jax.jit,
    static_argnames=("H", "W", "win_size", "min_disp", "max_disp",
                     "gamma_c", "gamma_p", "interpret", "tile_h", "step",
                     "consistent", "subpixel"))
def _asw_pass(planes, *, H, W, win_size, min_disp, max_disp, gamma_c, gamma_p,
              interpret, tile_h, step=1, consistent=True, subpixel=False):
    """Left-reference matching pass. planes: (12, Hp, w_slab) f32 padded,
    or (B, 12, Hp, w_slab) for a frame batch — the batch rides a leading
    grid axis inside the SAME kernel (one launch for the whole batch; no
    vmap around the pallas_call, which cannot lower on real TPU).

    Returns (dispL, dispR, csub): dispR is None unless ``consistent``
    (the right-reference tail — per-d lane rolls + a second argmin — is
    skipped entirely where it would be discarded); csub is None unless
    ``subpixel`` (then (3, H, W) [c(best-1), c(best), c(best+1)] for the
    quadratic sub-pixel fit).
    """
    batched = planes.ndim == 4
    pad = win_size // 2
    D = max_disp - min_disp + 1
    w_acc, w_slab = _layout(W, win_size)
    n_bands = -(-H // tile_h)

    offs = jnp.arange(win_size, dtype=jnp.float32) - pad
    dist = jnp.sqrt(offs[:, None] ** 2 + offs[None, :] ** 2)
    prox2 = jnp.exp(-2.0 * dist / gamma_p)

    kernel = functools.partial(
        _asw_kernel, pad=pad, w_acc=w_acc, w_slab=w_slab,
        min_disp=min_disp, max_disp=max_disp,
        gamma_c=float(gamma_c), win_size=win_size, tile_h=tile_h,
        step=step, width=W, consistent=consistent, batched=batched,
        subpixel=subpixel)

    if batched:
        B = planes.shape[0]
        grid = (B, n_bands)
        out_spec = pl.BlockSpec(
            (1, tile_h, w_acc), lambda bi, b: (bi, b, 0),
            memory_space=pltpu.VMEM)
        out_struct = jax.ShapeDtypeStruct(
            (B, n_bands * tile_h, w_acc), jnp.int32)
        sub_spec = pl.BlockSpec(
            (1, 3, tile_h, w_acc), lambda bi, b: (bi, 0, b, 0),
            memory_space=pltpu.VMEM)
        sub_struct = jax.ShapeDtypeStruct(
            (B, 3, n_bands * tile_h, w_acc), jnp.float32)
        frames = B
    else:
        grid = (n_bands,)
        out_spec = pl.BlockSpec(
            (tile_h, w_acc), lambda b: (b, 0), memory_space=pltpu.VMEM)
        out_struct = jax.ShapeDtypeStruct(
            (n_bands * tile_h, w_acc), jnp.int32)
        sub_spec = pl.BlockSpec(
            (3, tile_h, w_acc), lambda b: (0, b, 0),
            memory_space=pltpu.VMEM)
        sub_struct = jax.ShapeDtypeStruct(
            (3, n_bands * tile_h, w_acc), jnp.float32)
        frames = 1
    out_specs = [out_spec] + ([out_spec] if consistent else []) \
        + ([sub_spec] if subpixel else [])
    out_shapes = [out_struct] + ([out_struct] if consistent else []) \
        + ([sub_struct] if subpixel else [])
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((12, _slab_rows(win_size, tile_h), w_slab),
                       jnp.float32),
            pltpu.VMEM((D, _slab_rows(win_size, tile_h), w_slab),
                       jnp.float32),
            # per-column rolled TAD, used only on the large-D fori path
            pltpu.VMEM(((D, _slab_rows(win_size, tile_h), w_slab)
                        if D > _D_UNROLL else (1, 8, 128)), jnp.float32),
            pltpu.VMEM((D, tile_h, w_acc), jnp.float32),
            pltpu.VMEM((D, tile_h, w_acc), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=frames * H * w_acc * (win_size // step) ** 2 * (20 + 4 * D),
            bytes_accessed=planes.size * 4,
            transcendentals=frames * H * w_acc
            * (win_size // step) ** 2 * 3),
        interpret=interpret,
    )(prox2, planes)
    out = list(out)
    dispL = out.pop(0)[..., :H, :W]
    dispR = out.pop(0)[..., :H, :W] if consistent else None
    csub = out.pop(0)[..., :H, :W] if subpixel else None
    return dispL, dispR, csub


def _build_planes(img1, img2, win_size, w_acc, w_slab, tile_h,
                  row_valid=None, context=False):
    """Stack sentinel-padded Lab + zero-padded BGR planes, (12, Hp, w_slab).

    row_valid : optional (H,) bool — rows marked False are treated exactly
        like out-of-image rows (sentinel Lab / zero BGR). Used by
        :mod:`simplestereo_tpu.parallel` so that halo rows received at the
        *global* image boundary of a sharded run keep single-device
        semantics.
    context : bool
        When True the input's first and last ``win_size // 2`` rows are
        context only: they replace the sentinel top padding (the kernel
        reads them as window sources) and no disparity is produced for
        them. Output height is then ``H - 2 * (win_size // 2)``. This is
        how the sharded row-tiling path avoids recomputing its halo rows'
        disparities just to discard them.
    """
    pad = win_size // 2
    H, W = img1.shape[:2]
    h_out = H - 2 * pad if context else H
    n_bands = -(-h_out // tile_h)
    h_slab = (n_bands - 1) * tile_h + _slab_rows(win_size, tile_h)
    pad_top = 0 if context else pad

    f1 = img1.astype(jnp.float32)
    f2 = img2.astype(jnp.float32)
    lab1 = bgr_to_lab(img1)
    lab2 = bgr_to_lab(img2)

    def pack(arr, fill):
        # (H, W, 3) -> (3, h_slab, w_slab); slab col c = image col c - pad
        a = jnp.transpose(arr, (2, 0, 1))
        if row_valid is not None:
            a = jnp.where(row_valid[None, :, None], a, fill)
        return jnp.pad(
            a, ((0, 0), (pad_top, h_slab - H - pad_top),
                (pad, w_slab - W - pad)),
            constant_values=fill)

    return jnp.concatenate([
        pack(lab1, LAB_SENTINEL), pack(lab2, LAB_SENTINEL),
        pack(f1, 0.0), pack(f2, 0.0)], axis=0)


def _auto_interpret():
    return jax.default_backend() != "tpu"


def _finish(dispL, dispR, csub, *, W, min_disp, max_disp, consistent,
            subpixel):
    """Post-kernel passes on one frame: empty-range semantics, LR check
    (_passive.cpp:191-253), occlusion fill (_passive.cpp:258-285) and the
    optional quadratic sub-pixel refinement. Pure jnp — safe to vmap
    over a frame batch."""
    H = dispL.shape[0]
    raw = dispL  # kernel argmin map, before the empty-range substitution
    xs = jnp.arange(W)
    # Empty candidate range (x < min_disp): the reference outputs the pixel's
    # own column index (dBest stays 0 -> disparity x - 0).
    dispL = jnp.where(xs[None, :] < min_disp, xs[None, :], dispL)

    if consistent:
        # Empty range on the right pass: dBest stays 0 there too, which
        # in right-image coordinates means matched left col 0, disp -x.
        xs_f = xs[None, :]
        dispR = jnp.where((W - 1 - xs_f) < min_disp, -xs_f, dispR)

        # Invalidate left pixels whose right-pass match disagrees; fill.
        # The reference's -1 marker collides with legal disparities when
        # min_disp < 0, so the marker becomes min_disp - 1 there (matches
        # the oracle; reference semantics assume minDisparity >= 0).
        marker = -1 if min_disp >= 0 else min_disp - 1
        L = jnp.clip(xs_f + dispR, 0, W - 1)
        agree = jnp.take_along_axis(dispL, L, axis=1) == dispR
        disagree = jnp.zeros((H, W), bool)
        disagree = jax.vmap(lambda f, l, a: f.at[l].max(~a))(
            disagree, L, agree)
        dispI = jnp.where(disagree, marker, dispL)
        out_i = occlusion_fill(dispI, invalid=marker).astype(jnp.int16)
    else:
        out_i = dispL.astype(jnp.int16)

    if not subpixel:
        return out_i

    # Equiangular (V-shaped) fit through the winner's cost neighborhood —
    # the correct sub-pixel model for SAD-class costs, whose profile is
    # piecewise LINEAR in d near the minimum (a parabola fit biases
    # fractional shifts toward integers); the reference's ASW is
    # integer-only. Only pixels whose final value still equals the kernel
    # argmin are refined (consistency fills and empty-range substitutions
    # stay integer).
    cm, c0, cp = csub[0], csub[1], csub[2]
    interior = (raw > min_disp) & (raw < max_disp)
    finite = jnp.isfinite(cm) & jnp.isfinite(cp) & jnp.isfinite(c0)
    denom = jnp.maximum(cm, cp) - c0
    delta = jnp.where(interior & finite & (denom > 1e-6),
                      (cm - cp) / (2.0 * denom), 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    # The invalid marker (-1, or min_disp - 1 when min_disp < 0) is
    # strictly below every legal raw argmin, so marker pixels never
    # satisfy out_i == raw and stay exactly integer.
    refine = out_i == raw
    return out_i.astype(jnp.float32) + jnp.where(refine, delta, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("win_size", "max_disp", "min_disp", "gamma_c",
                     "gamma_p", "consistent", "interpret", "step",
                     "subpixel", "context"))
def _asw_disparity_jit(img1, img2, row_valid, *, win_size, max_disp,
                       min_disp, gamma_c, gamma_p, consistent, interpret,
                       step, subpixel=False, context=False):
    """Whole (optionally consistent) pipeline as ONE device program —
    plane prep, kernel pass(es), LR check and occlusion fill fused into a
    single dispatch so host-device round-trip latency is paid once."""
    H, W = img1.shape[:2]
    h_out = H - 2 * (win_size // 2) if context else H
    w_acc, w_slab = _layout(W, win_size)
    tile_h = _pick_tile_h(h_out, W, win_size, max_disp - min_disp + 1)

    kw = dict(win_size=win_size, min_disp=min_disp, max_disp=max_disp,
              gamma_c=gamma_c, gamma_p=gamma_p, interpret=interpret,
              tile_h=tile_h, step=step, consistent=consistent,
              subpixel=subpixel)

    planesL = _build_planes(img1, img2, win_size, w_acc, w_slab, tile_h,
                            row_valid, context=context)
    # ONE kernel pass yields both matching directions: the right-reference
    # cost volume is a per-d lane shift of the left one (see the symmetry
    # note in _asw_kernel), so consistent mode no longer pays a second
    # full scan.
    dispL, dispR, csub = _asw_pass(planesL, H=h_out, W=W, **kw)
    return _finish(dispL, dispR, csub, W=W, min_disp=min_disp,
                   max_disp=max_disp, consistent=consistent,
                   subpixel=subpixel)


@functools.partial(
    jax.jit,
    static_argnames=("win_size", "max_disp", "min_disp", "gamma_c",
                     "gamma_p", "consistent", "interpret", "step",
                     "subpixel", "context"))
def _asw_disparity_batch_jit(imgs1, imgs2, row_valid, *, win_size, max_disp,
                             min_disp, gamma_c, gamma_p, consistent,
                             interpret, step, subpixel=False, context=False):
    """Batched pipeline: ONE kernel launch for the whole frame stack.

    Plane prep and the post passes are pure jnp and vmap cleanly; only the
    pallas_call must not be vmapped (ANY-memspace operands cannot take a
    squeezed batch dim on real TPU), so the batch is folded into the
    kernel grid instead (see ``_asw_pass``)."""
    B, H, W = imgs1.shape[:3]
    h_out = H - 2 * (win_size // 2) if context else H
    w_acc, w_slab = _layout(W, win_size)
    tile_h = _pick_tile_h(h_out, W, win_size, max_disp - min_disp + 1)

    kw = dict(win_size=win_size, min_disp=min_disp, max_disp=max_disp,
              gamma_c=gamma_c, gamma_p=gamma_p, interpret=interpret,
              tile_h=tile_h, step=step, consistent=consistent,
              subpixel=subpixel)

    def build(a, b, rv):
        return _build_planes(a, b, win_size, w_acc, w_slab, tile_h, rv,
                             context=context)

    if row_valid is None:
        planes = jax.vmap(lambda a, b: build(a, b, None))(imgs1, imgs2)
    else:
        planes = jax.vmap(build)(imgs1, imgs2, row_valid)

    dispL, dispR, csub = _asw_pass(planes, H=h_out, W=W, **kw)
    post = functools.partial(_finish, W=W, min_disp=min_disp,
                             max_disp=max_disp, consistent=consistent,
                             subpixel=subpixel)
    args = [dispL]
    in_axes = [0]
    args.append(dispR if consistent else None)
    in_axes.append(0 if consistent else None)
    args.append(csub if subpixel else None)
    in_axes.append(0 if subpixel else None)
    return jax.vmap(post, in_axes=tuple(in_axes))(*args)


def asw_disparity(img1, img2, win_size=35, max_disp=16, min_disp=0,
                  gamma_c=5.0, gamma_p=17.5, consistent=False,
                  interpret=None, row_valid=None, step=1, subpixel=False,
                  context=False):
    """ASW disparity map on TPU (Pallas production path).

    Parameters mirror the reference ``StereoASW``
    (/root/reference/simplestereo/passive.py:59-69); semantics are
    validated against
    :func:`simplestereo_tpu.passive.asw_ref.asw_disparity_ref`.

    subpixel : bool
        Equiangular sub-pixel refinement of the winner from its cost
        neighborhood (a capability beyond the reference's integer-only
        ASW; the V-shaped fit matches the SAD-class cost profile).
        Returns float32 then. A synthetic half-pixel shift is recovered
        to ~0.1 px; note that against INTEGER ground truth (e.g.
        Middlebury's x16-quantized maps at whole-pixel scenes) fractional
        output cannot improve badX metrics — its value shows on scenes
        with true fractional disparity.
    context : bool
        The input's first and last ``win_size // 2`` rows are window
        *sources* only — no disparity is computed for them, and the
        output has ``H - 2 * (win_size // 2)`` rows. Used by the sharded
        row-tiling path (:mod:`simplestereo_tpu.parallel`): the exchanged
        halo rows feed the boundary windows without the shard recomputing
        (and discarding) their disparities.

    Returns
    -------
    jnp.ndarray
        (H, W) int16 disparity; -1 never appears (consistent mode fills
        occlusions like the reference). float32 when ``subpixel``.
    """
    if interpret is None:
        interpret = _auto_interpret()
    return _asw_disparity_jit(
        jnp.asarray(img1), jnp.asarray(img2), row_valid,
        win_size=win_size, max_disp=max_disp, min_disp=min_disp,
        gamma_c=float(gamma_c), gamma_p=float(gamma_p),
        consistent=bool(consistent), interpret=bool(interpret),
        step=int(step), subpixel=bool(subpixel), context=bool(context))


def asw_disparity_batch(imgs1, imgs2, win_size=35, max_disp=16, min_disp=0,
                        gamma_c=5.0, gamma_p=17.5, consistent=False,
                        interpret=None, row_valid=None, step=1,
                        subpixel=False, context=False):
    """Batched :func:`asw_disparity`: (B, H, W, 3) pairs -> (B, H, W)
    int16 (float32 when ``subpixel``).

    The whole stack runs as ONE kernel launch — the frame axis is a
    leading Pallas grid dimension, so per-call dispatch latency (~20 ms
    through the TPU tunnel) is paid once per batch instead of once per
    frame, and the program shape contains no vmap around the pallas_call
    (the form that fails to lower on real TPU). Bit-identical to
    per-frame :func:`asw_disparity`.

    row_valid : optional (B, H) bool — per-frame row validity (used by the
        sharded row-tiling path in :mod:`simplestereo_tpu.parallel`).
    context : bool — first/last ``win_size // 2`` rows are window sources
        only (see :func:`asw_disparity`).
    """
    if interpret is None:
        interpret = _auto_interpret()
    return _asw_disparity_batch_jit(
        jnp.asarray(imgs1), jnp.asarray(imgs2), row_valid,
        win_size=win_size, max_disp=max_disp, min_disp=min_disp,
        gamma_c=float(gamma_c), gamma_p=float(gamma_p),
        consistent=bool(consistent), interpret=bool(interpret),
        step=int(step), subpixel=bool(subpixel), context=bool(context))
