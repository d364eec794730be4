"""
gsw_pallas
==========

Production Pallas/TPU kernel for the Geodesic Support-Weight matcher.

Replaces the pure-XLA :func:`simplestereo_tpu.passive.gsw._gsw_pass`
(itself the TPU rewrite of the reference's C++ thread-pool kernel,
/root/reference/simplestereo/_passive.cpp workerGSW :408-700 /
computeGSW :703-774) on the hot path. The XLA form materializes the
(win^2, H, W) support-weight stack and one (win^2, H, W) shifted cost
map per disparity candidate in HBM — ~234 MB of traffic per frame at
win=23 on Tsukuba — so it is bandwidth-bound. This kernel keeps
everything in VMEM, computing weights on the fly per window offset,
exactly like the ASW kernel whose machinery it reuses
(:mod:`simplestereo_tpu.passive.asw_pallas`):

- **Grid over row bands**, input planes DMA'd once per program as a
  (tile_h + winSize-1)-row halo slab: HBM traffic is O(image).
- **Validity by sentinel padding**: out-of-image reference samples carry
  a 1e6 sentinel so the closed-form support weight
  ``exp(-||dBGR||_2 / gamma)`` underflows to exactly 0 — branch-free
  exclusion, same trick as ASW's Lab planes. (The closed form is the
  provably-converged value of the reference's chamfer recursion; see
  ``gsw._gsw_weights``.)
- **Capped-cost volume with the candidate-validity mask folded in**:
  GSW weights come from the reference image only (unlike ASW there is
  no target-side weight factor to zero out-of-range target samples), so
  ``vol[d](r, c) = min(fMax, ||BGR1(r,c) - BGR2(r,c-d)||_2)`` is masked
  to 0 where column ``c - d`` leaves the image, once at volume build
  time — the window walk stays pure multiply-accumulate.
- **Lane-rotation window walk**: dynamic lane rotation over the column
  offset j (amounts tied to the outer ``fori`` variable — the pattern
  probed safe on hardware), static sublane slices over the row offset i.
- **Consistent mode rides the batch grid**: GSW has no left-right cost
  symmetry (the ASW shortcut does not apply — weights are one-sided), so
  the right-reference pass is a second, mirrored matching problem. Both
  directions are stacked on the kernel's leading frame-grid axis and run
  in ONE launch; the LR check + occlusion fill are the same cheap jnp
  post-passes as ASW's.

Cost semantics match ``gsw._gsw_pass`` (the oracle the unit tests
compare against bit-for-bit in interpreter mode): unnormalized weighted
sum, first-minimum (smallest-d) tie-break, empty candidate ranges return
the pixel's own column. Round 4 moved the remaining extensions onto the
kernel too: ``cost_method="mi"`` rides the ``ext_vol`` path (pre-built
table-lookup volume, window walk unchanged) and ``normalize`` adds an
in-kernel denominator accumulator (one wsum per column offset + a
per-(offset, d) lane-validity MAC; normalized costs are float ratios,
so expect rare near-tie argmin flips vs XLA, not bit-parity).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .asw_pallas import (_D_UNROLL, _VMEM_BUDGET, _auto_interpret, _layout,
                         _max_tile_rows, _roll_const, _round_up, _slab_rows)
from .asw_ref import occlusion_fill

BGR_SENTINEL = 1.0e6  # exp(-sentinel/gamma) underflows to exactly 0.0


def _pick_tile_h(H, W, win_size, D, ext_vol=False, normalize=False):
    """Band height under the VMEM scratch budget (GSW's model: input
    planes + the capped-cost volume (doubled on the large-D fori path,
    which keeps a rolled copy) + the D accumulator blocks). ``ext_vol``:
    the cost volume arrives pre-built inside the input slab (3 ref
    planes + D cost planes) instead of being built from 6 BGR planes."""
    pad = win_size // 2
    w_acc, w_slab = _layout(W, win_size)
    h8 = _round_up(max(H, 8), 8)
    t_cap = _max_tile_rows(w_acc)
    best = None
    for t in (8, 16, 32, 48, 64):
        if t > min(h8, t_cap):
            break
        slab = _round_up(t + 2 * pad, 8)
        if ext_vol:
            n_planes = (3 + D) + (D if D > _D_UNROLL else 0)
        else:
            n_planes = 6 + (D if D <= _D_UNROLL else 2 * D)
        n_acc = 2 * D if normalize else D  # num (+ den)
        vmem = (n_planes * slab * w_slab + n_acc * t * w_acc) * 4
        if vmem > _VMEM_BUDGET:
            break
        n = -(-H // t)
        cost = n * (0.45 * slab + 0.55 * t)
        if best is None or cost <= best[0] + 1e-9:
            best = (cost, t)
    if best is None:
        return 8
    return best[1]


def _gsw_kernel(planes_hbm, *refs, pad, w_acc, w_slab, min_disp, max_disp,
                gamma, f_max, win_size, tile_h, width, batched, step,
                ext_vol=False, normalize=False):
    """One program = one band of ``tile_h`` output rows.

    planes_hbm : (6, Hp, w_slab) f32 in HBM/ANY — [0:3] BGR(ref) with the
        1e6 sentinel in out-of-image positions, [3:6] BGR(tgt)
        zero-padded (every out-of-range target read is masked in the
        volume, so its fill value never matters). Slab column c maps to
        image column c - pad. ``batched``: leading frame axis, grid
        (B, n_bands). ``ext_vol``: planes_hbm is (3 + D, Hp, w_slab) —
        BGR(ref) + a PRE-BUILT zero-masked cost volume (the MI path:
        per-pixel table-lookup costs are cheap XLA work; only the window
        aggregation needs the kernel) — the in-kernel volume build is
        skipped and vol reads come straight from the slab.
    disp_ref : (tile_h, w_acc) i32 output block — kernel argmin map.
    """
    refs = list(refs)
    disp_ref = refs.pop(0)
    slab, vol, volr, num, den, sem = refs
    D = max_disp - min_disp + 1
    th = tile_h
    b = pl.program_id(1) if batched else pl.program_id(0)
    sr = _slab_rows(win_size, th)
    if batched:
        src = planes_hbm.at[pl.program_id(0), :, pl.ds(b * th, sr), :]
    else:
        src = planes_hbm.at[:, pl.ds(b * th, sr), :]

    cp = pltpu.make_async_copy(src, slab, sem)
    cp.start()
    cp.wait()

    if ext_vol:
        def vol_read(dd):
            return slab[3 + dd]
    else:
        def vol_read(dd):
            return vol[dd]

        # Capped-cost volume over the whole slab, candidate validity
        # folded in: vol[dd](r, c) = min(fMax, ||ref(r,c) - tgt(r,c-d)||)
        # if 0 <= (c - pad) - d <= width - 1 else 0. The mask also covers
        # the circular-roll wrap columns (always outside
        # [pad + d, pad + W-1 + d]).
        lane = jax.lax.broadcasted_iota(jnp.int32, (sr, w_slab), 1) - pad

        def build_vol(dd, d, tgt):
            dsq = jnp.zeros((sr, w_slab), jnp.float32)
            for c in range(3):
                dlt = slab[c] - tgt[c]
                dsq = dsq + dlt * dlt
            m = jnp.minimum(jnp.sqrt(dsq), f_max)
            ok = (lane >= d) & (lane <= width - 1 + d)
            vol[dd] = jnp.where(ok, m, 0.0)

        if D <= _D_UNROLL:
            for dd in range(D):
                d = min_disp + dd
                build_vol(dd, d,
                          [_roll_const(slab[3 + c], d) for c in range(3)])
        else:
            # Large D: fori with an incrementally rolled carry — O(1) IR.
            def vol_body(dd, tgt_rolled):
                build_vol(dd, min_disp + dd, tgt_rolled)
                return [_roll_const(t, 1) for t in tgt_rolled]
            init = [_roll_const(slab[3 + c], min_disp) for c in range(3)]
            jax.lax.fori_loop(0, D, vol_body, init)

    num[...] = jnp.zeros((D, th, w_acc), jnp.float32)
    if normalize:
        den[...] = jnp.zeros((D, th, w_acc), jnp.float32)
        # lane c holds image column c (the accumulator block starts at
        # the image's left edge); candidate validity of a window pixel
        # at column offset dj for disparity d is 0 <= c + dj - d <= W-1
        lane_acc = jax.lax.broadcasted_iota(jnp.int32, (th, w_acc), 1)
    inv_g = 1.0 / gamma
    ctr = [slab[c, pad:pad + th, pad:pad + w_acc] for c in range(3)]

    # Window-offset lattice anchored at the center (ASW's `step` mode):
    # offsets o with (o - pad) % step == 0.
    half_j = pad // step
    n_j = 2 * half_j + 1
    i_offsets = range(pad % step, win_size, step)

    def col_body(m, _):
        j = (m - half_j) * step + pad
        shift = pad - j  # negative amounts tied to the OUTER fori var
        rolled = [pltpu.roll(slab[c], shift, axis=1) for c in range(3)]
        if D <= _D_UNROLL:
            vol_j = [pltpu.roll(vol_read(dd), shift, axis=1)
                     for dd in range(D)]
        else:
            def roll_vol(dd, _):
                volr[dd] = pltpu.roll(vol_read(dd), shift, axis=1)
                return 0
            jax.lax.fori_loop(0, D, roll_vol, 0)

        wsum = jnp.zeros((th, w_acc), jnp.float32)
        for i in i_offsets:  # static: sublane slices must be static
            dsq = jnp.zeros((th, w_acc), jnp.float32)
            for c in range(3):
                dlt = rolled[c][i:i + th, pad:pad + w_acc] - ctr[c]
                dsq = dsq + dlt * dlt
            w = jnp.exp(-jnp.sqrt(dsq) * inv_g)
            if normalize:
                wsum = wsum + w

            if D <= _D_UNROLL:
                for dd in range(D):
                    num[dd] = num[dd] + w * vol_j[dd][i:i + th,
                                                      pad:pad + w_acc]
            else:
                def dd_body(dd, _):
                    num[dd] = num[dd] + w * volr[dd][i:i + th,
                                                     pad:pad + w_acc]
                    return 0
                jax.lax.fori_loop(0, D, dd_body, 0)

        if normalize:
            # Denominator: summed weight of the VALID window pixels
            # (gsw._gsw_pass's w*Vs term). Row validity is already in w
            # (out-of-image rows/cols hit the BGR sentinel -> w == 0
            # exactly), so only the d-dependent column validity of this
            # column offset dj = j - pad remains — a per-lane compare,
            # shared by all row offsets (wsum amortizes the i loop).
            dj = j - pad
            if D <= _D_UNROLL:
                for dd in range(D):
                    d = min_disp + dd
                    mask = ((lane_acc + dj >= d)
                            & (lane_acc + dj <= width - 1 + d))
                    den[dd] = den[dd] + wsum * mask.astype(jnp.float32)
            else:
                def den_body(dd, _):
                    d = min_disp + dd
                    mask = ((lane_acc + dj >= d)
                            & (lane_acc + dj <= width - 1 + d))
                    den[dd] = den[dd] + wsum * mask.astype(jnp.float32)
                    return 0
                jax.lax.fori_loop(0, D, den_body, 0)
        return 0

    jax.lax.fori_loop(0, n_j, col_body, 0)

    cost = num[...]
    if normalize:
        cost = cost / jnp.maximum(den[...], 1e-12)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (D, th, w_acc), 2)
    dcand = jax.lax.broadcasted_iota(jnp.int32, (D, th, w_acc), 0) + min_disp
    ok = (lanes >= dcand) & (lanes <= (width - 1) + dcand)
    cost = jnp.where(ok, cost, jnp.inf)
    best = jnp.argmin(cost, axis=0).astype(jnp.int32) + min_disp
    disp_ref[...] = best[None] if batched else best


@functools.partial(
    jax.jit,
    static_argnames=("H", "W", "win_size", "min_disp", "max_disp", "gamma",
                     "f_max", "interpret", "tile_h", "step", "ext_vol",
                     "normalize"))
def _gsw_pass_pallas(planes, *, H, W, win_size, min_disp, max_disp, gamma,
                     f_max, interpret, tile_h, step=1, ext_vol=False,
                     normalize=False):
    """One matching direction. planes: (6, Hp, w_slab) f32 padded, or
    (B, 6, Hp, w_slab) — the batch rides a leading grid axis in the same
    launch (never vmap around a pallas_call: it cannot lower on TPU).
    ``ext_vol``: planes carry (3 + D) planes — BGR(ref) + a pre-built
    cost volume (the MI path)."""
    batched = planes.ndim == 4
    pad = win_size // 2
    D = max_disp - min_disp + 1
    w_acc, w_slab = _layout(W, win_size)
    n_bands = -(-H // tile_h)
    sr = _slab_rows(win_size, tile_h)
    n_planes = (3 + D) if ext_vol else 6

    kernel = functools.partial(
        _gsw_kernel, pad=pad, w_acc=w_acc, w_slab=w_slab,
        min_disp=min_disp, max_disp=max_disp, gamma=float(gamma),
        f_max=float(f_max), win_size=win_size, tile_h=tile_h, width=W,
        batched=batched, step=step, ext_vol=ext_vol, normalize=normalize)

    if batched:
        B = planes.shape[0]
        grid = (B, n_bands)
        out_spec = pl.BlockSpec((1, tile_h, w_acc), lambda bi, b: (bi, b, 0),
                                memory_space=pltpu.VMEM)
        out_struct = jax.ShapeDtypeStruct((B, n_bands * tile_h, w_acc),
                                          jnp.int32)
        frames = B
    else:
        grid = (n_bands,)
        out_spec = pl.BlockSpec((tile_h, w_acc), lambda b: (b, 0),
                                memory_space=pltpu.VMEM)
        out_struct = jax.ShapeDtypeStruct((n_bands * tile_h, w_acc),
                                          jnp.int32)
        frames = 1

    disp = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_spec,
        out_shape=out_struct,
        scratch_shapes=[
            pltpu.VMEM((n_planes, sr, w_slab), jnp.float32),
            pltpu.VMEM(((1, 8, 128) if ext_vol else (D, sr, w_slab)),
                       jnp.float32),
            pltpu.VMEM(((D, sr, w_slab) if D > _D_UNROLL else (1, 8, 128)),
                       jnp.float32),
            pltpu.VMEM((D, tile_h, w_acc), jnp.float32),
            pltpu.VMEM(((D, tile_h, w_acc) if normalize else (1, 8, 128)),
                       jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=frames * H * w_acc * (win_size // step) ** 2 * (10 + 2 * D),
            bytes_accessed=planes.size * 4,
            transcendentals=frames * H * w_acc * (win_size // step) ** 2),
        interpret=interpret,
    )(planes)
    return disp[..., :H, :W]


def _build_planes(img1, img2, win_size, tile_h):
    """(6, Hp, w_slab) f32: sentinel-padded BGR(ref) + zero-padded
    BGR(tgt). Accepts uint8 or float input (the sharded tiled path feeds
    sentinel-extended float rows)."""
    pad = win_size // 2
    H, W = img1.shape[:2]
    w_acc, w_slab = _layout(W, win_size)
    n_bands = -(-H // tile_h)
    h_slab = (n_bands - 1) * tile_h + _slab_rows(win_size, tile_h)

    def pack(arr, fill):
        a = jnp.transpose(arr.astype(jnp.float32), (2, 0, 1))
        return jnp.pad(a, ((0, 0), (pad, h_slab - H - pad),
                           (pad, w_slab - W - pad)), constant_values=fill)

    return jnp.concatenate([pack(img1, BGR_SENTINEL), pack(img2, 0.0)],
                           axis=0)


def _pack_planes(chw, win_size, tile_h, H, W, fill):
    """(C, H, W) f32 -> (C, Hp, w_slab) padded with ``fill`` (the slab
    layout of :func:`_build_planes`, channel-leading input)."""
    pad = win_size // 2
    w_acc, w_slab = _layout(W, win_size)
    n_bands = -(-H // tile_h)
    h_slab = (n_bands - 1) * tile_h + _slab_rows(win_size, tile_h)
    return jnp.pad(chw.astype(jnp.float32),
                   ((0, 0), (pad, h_slab - H - pad),
                    (pad, w_slab - W - pad)), constant_values=fill)


def _mi_volume(q1, q2, disp_prev, *, min_disp, max_disp, bins):
    """Pre-built MI cost volume (D, H, W), zero-masked where the
    candidate column leaves the image — the per-pixel table-lookup half
    of the XLA :func:`simplestereo_tpu.passive.gsw._gsw_mi_step`; the
    window aggregation half runs in the Pallas kernel (``ext_vol``).
    One-hot selection form (see ``gsw._mi_cost_maps``): bit-identical to
    the gather form, ~4x cheaper on TPU, batches under vmap."""
    from .gsw import _mi_cost_maps, _mi_cost_table

    table = _mi_cost_table(q1, q2, disp_prev, disp_prev >= 0, bins=bins)
    return jnp.stack(_mi_cost_maps(q1, q2, table, min_disp=min_disp,
                                   max_disp=max_disp, bins=bins))


def _empty_range(disp, W, min_disp):
    """Empty candidate range (x < min_disp): the pixel's own column
    (reference semantics, matches gsw._gsw_pass)."""
    xs = jnp.arange(W)[None, :]
    return jnp.where(xs < min_disp, xs, disp)


def _lr_finish(dispL, dispR, *, W, min_disp):
    """LR invalidation + occlusion fill (shared with the XLA path's
    semantics in gsw.gsw_disparity)."""
    xs_f = jnp.arange(W)[None, :]
    dispR = jnp.where((W - 1 - xs_f) < min_disp, -xs_f, dispR)
    L = jnp.clip(xs_f + dispR, 0, W - 1)
    agree = jnp.take_along_axis(dispL, L, axis=1) == dispR
    disagree = jnp.zeros(dispL.shape, bool)
    disagree = jax.vmap(lambda f, l, a: f.at[l].max(~a))(disagree, L, agree)
    marker = -1 if min_disp >= 0 else min_disp - 1
    dispI = jnp.where(disagree, marker, dispL)
    return occlusion_fill(dispI, invalid=marker).astype(jnp.int16)


@functools.partial(
    jax.jit,
    static_argnames=("win_size", "max_disp", "min_disp", "gamma", "f_max",
                     "consistent", "interpret", "step", "normalize"))
def _gsw_disparity_jit(img1, img2, *, win_size, max_disp, min_disp, gamma,
                       f_max, consistent, interpret, step=1,
                       normalize=False):
    """Whole (optionally consistent) pipeline as ONE device program.

    Consistent mode stacks the left-reference and the mirrored
    right-reference problem on the kernel's frame-grid axis: one launch
    computes both directions (GSW has no ASW-style cost symmetry — the
    support weights are one-sided)."""
    H, W = img1.shape[:2]
    tile_h = _pick_tile_h(H, W, win_size, max_disp - min_disp + 1,
                          normalize=normalize)
    kw = dict(H=H, W=W, win_size=win_size, min_disp=min_disp,
              max_disp=max_disp, gamma=gamma, f_max=f_max,
              interpret=interpret, tile_h=tile_h, step=step,
              normalize=normalize)

    if not consistent:
        planes = _build_planes(img1, img2, win_size, tile_h)
        disp = _gsw_pass_pallas(planes, **kw)
        return _empty_range(disp, W, min_disp).astype(jnp.int16)

    planes = jnp.stack([
        _build_planes(img1, img2, win_size, tile_h),
        _build_planes(img2[:, ::-1], img1[:, ::-1], win_size, tile_h)])
    disp2 = _gsw_pass_pallas(planes, **kw)
    dispL = _empty_range(disp2[0], W, min_disp)
    dispR = _empty_range(disp2[1], W, min_disp)[:, ::-1]
    return _lr_finish(dispL, dispR, W=W, min_disp=min_disp)


@functools.partial(
    jax.jit,
    static_argnames=("win_size", "max_disp", "min_disp", "gamma", "f_max",
                     "consistent", "interpret", "step", "normalize"))
def _gsw_disparity_batch_jit(imgs1, imgs2, *, win_size, max_disp, min_disp,
                             gamma, f_max, consistent, interpret, step=1,
                             normalize=False):
    """Batched pipeline: ONE kernel launch for the whole frame stack
    (both matching directions included when ``consistent``)."""
    B, H, W = imgs1.shape[:3]
    tile_h = _pick_tile_h(H, W, win_size, max_disp - min_disp + 1,
                          normalize=normalize)
    kw = dict(H=H, W=W, win_size=win_size, min_disp=min_disp,
              max_disp=max_disp, gamma=gamma, f_max=f_max,
              interpret=interpret, tile_h=tile_h, step=step,
              normalize=normalize)

    build = jax.vmap(
        lambda a, b: _build_planes(a, b, win_size, tile_h))
    planesL = build(imgs1, imgs2)
    if not consistent:
        disp = _gsw_pass_pallas(planesL, **kw)
        return jax.vmap(
            lambda d: _empty_range(d, W, min_disp))(disp).astype(jnp.int16)

    planesR = build(imgs2[:, :, ::-1], imgs1[:, :, ::-1])
    disp2 = _gsw_pass_pallas(jnp.concatenate([planesL, planesR]), **kw)
    er = jax.vmap(lambda d: _empty_range(d, W, min_disp))
    dispL = er(disp2[:B])
    dispR = er(disp2[B:])[:, :, ::-1]
    return jax.vmap(
        functools.partial(_lr_finish, W=W, min_disp=min_disp))(dispL, dispR)


def gsw_disparity_pallas(img1, img2, win_size=11, max_disp=16, min_disp=0,
                         gamma=10.0, f_max=120.0, consistent=False,
                         interpret=None, step=1, normalize=False):
    """GSW disparity on TPU (Pallas production path, "sd" cost).

    Semantics are validated bit-for-bit (interpreter mode) against the
    XLA oracle :func:`simplestereo_tpu.passive.gsw._gsw_pass`; parameters
    mirror the reference StereoGSW (passive.py:133-145). ``iterations``
    does not appear: the chamfer recursion's converged value is the
    closed-form weight (see gsw._gsw_weights), in the reference too.

    ``normalize`` (round 4, beyond-reference): ASW-style weighted-mean
    cost — the denominator sums the weights of the candidate-valid
    window pixels; in-kernel it is one wsum accumulation per column
    offset plus a per-(offset, d) lane-validity MAC (out-of-image window
    pixels already carry w == 0 via the BGR sentinel). Normalized costs
    are RATIOS of float sums, so unlike the integer-separated "sd"
    costs they can near-tie; expect rare argmin flips vs the XLA form
    (same caveat as ASW, CLAUDE.md), not bit-parity.
    """
    if interpret is None:
        interpret = _auto_interpret()
    return _gsw_disparity_jit(
        jnp.asarray(img1), jnp.asarray(img2), win_size=int(win_size),
        max_disp=int(max_disp), min_disp=int(min_disp), gamma=float(gamma),
        f_max=float(f_max), consistent=bool(consistent),
        interpret=bool(interpret), step=int(step),
        normalize=bool(normalize))


def gsw_disparity_pallas_batch(imgs1, imgs2, win_size=11, max_disp=16,
                               min_disp=0, gamma=10.0, f_max=120.0,
                               consistent=False, interpret=None, step=1,
                               normalize=False):
    """Batched :func:`gsw_disparity_pallas`: (B, H, W, 3) -> (B, H, W)
    int16, one kernel launch for the stack."""
    if interpret is None:
        interpret = _auto_interpret()
    return _gsw_disparity_batch_jit(
        jnp.asarray(imgs1), jnp.asarray(imgs2), win_size=int(win_size),
        max_disp=int(max_disp), min_disp=int(min_disp), gamma=float(gamma),
        f_max=float(f_max), consistent=bool(consistent),
        normalize=bool(normalize),
        interpret=bool(interpret), step=int(step))


# --------------------------------------------------------------------------
# Mutual-information cost on the kernel (round 4)
# --------------------------------------------------------------------------
# The MI cost (the reference's unimplemented TODO, _passive.cpp:506-508)
# splits cleanly: the per-pixel cost is a (bins x bins) table lookup built
# from a GLOBAL joint histogram of the previous matching — O(H*W) gathers
# and one scatter-add, cheap XLA work — while the O(win^2 * D) window
# aggregation is exactly the SD kernel's walk with the volume swapped.
# So the kernel takes the pre-built volume (``ext_vol``) and the whole MI
# refinement (every iteration, both matching directions stacked on the
# frame-grid axis) fuses into ONE device program.

def _mi_ref_planes(img, win_size, tile_h, H, W):
    chw = jnp.transpose(img.astype(jnp.float32), (2, 0, 1))
    return _pack_planes(chw, win_size, tile_h, H, W, BGR_SENTINEL)


def _mi_iter_steps(mi_iterations, coarse_step):
    """Per-iteration window-walk strides: intermediate matchings only
    feed the GLOBAL joint histogram (an intensity statistic, not
    geometry), so they tolerate the kernel's subsampled-window ``step``
    mode; the final aggregation is always exact (step=1)."""
    if mi_iterations < 1:
        # the XLA engine runs zero iterations here (returns the random
        # bootstrap) — reject rather than silently diverge
        raise ValueError("mi_iterations must be >= 1!")
    return [coarse_step] * (mi_iterations - 1) + [1]


@functools.partial(
    jax.jit,
    static_argnames=("win_size", "max_disp", "min_disp", "gamma", "bins",
                     "mi_iterations", "consistent", "interpret",
                     "coarse_step"))
def _gsw_mi_disparity_jit(img1, img2, *, win_size, max_disp, min_disp,
                          gamma, bins, mi_iterations, consistent,
                          interpret, coarse_step=1):
    from .gsw import _quantize_gray

    H, W = img1.shape[:2]
    D = max_disp - min_disp + 1
    tile_h = _pick_tile_h(H, W, win_size, D, ext_vol=True)
    kw = dict(H=H, W=W, win_size=win_size, min_disp=min_disp,
              max_disp=max_disp, gamma=gamma, f_max=0.0,
              interpret=interpret, tile_h=tile_h, ext_vol=True)
    mkw = dict(min_disp=min_disp, max_disp=max_disp, bins=bins)
    xs = jnp.arange(W)[None, :]

    q1 = _quantize_gray(img1, bins)
    q2 = _quantize_gray(img2, bins)
    # Random bootstrap (Hirschmuller 2008 §2.1) — same key as the XLA
    # path (gsw.gsw_disparity) for exact cross-engine parity.
    disp0 = jax.random.randint(
        jax.random.PRNGKey(0), (H, W), min_disp, max_disp + 1,
        dtype=jnp.int32)
    steps = _mi_iter_steps(mi_iterations, coarse_step)

    def pack_vol(vol):
        return _pack_planes(vol, win_size, tile_h, H, W, 0.0)

    if not consistent:
        rp = _mi_ref_planes(img1, win_size, tile_h, H, W)
        disp = disp0
        for st in steps:
            planes = jnp.concatenate(
                [rp, pack_vol(_mi_volume(q1, q2, disp, **mkw))])
            disp = jnp.where(xs < min_disp, xs,
                             _gsw_pass_pallas(planes, step=st, **kw))
        return disp.astype(jnp.int16)

    # Consistent: both matching directions' refinements ride the kernel's
    # frame-grid axis — one launch per MI iteration.
    q1R, q2R = q2[:, ::-1], q1[:, ::-1]
    rpL = _mi_ref_planes(img1, win_size, tile_h, H, W)
    rpR = _mi_ref_planes(img2[:, ::-1], win_size, tile_h, H, W)
    dispL = dispR = disp0
    for st in steps:
        planes = jnp.stack([
            jnp.concatenate([rpL, pack_vol(_mi_volume(q1, q2, dispL,
                                                      **mkw))]),
            jnp.concatenate([rpR, pack_vol(_mi_volume(q1R, q2R, dispR,
                                                      **mkw))])])
        disp2 = _gsw_pass_pallas(planes, step=st, **kw)
        dispL = jnp.where(xs < min_disp, xs, disp2[0])
        dispR = jnp.where(xs < min_disp, xs, disp2[1])
    return _lr_finish(dispL, dispR[:, ::-1], W=W, min_disp=min_disp)


def gsw_mi_disparity_pallas(img1, img2, win_size=11, max_disp=16,
                            min_disp=0, gamma=10.0, bins=20,
                            mi_iterations=2, consistent=False,
                            interpret=None, coarse_step=1):
    """GSW disparity with the mutual-information cost on the Pallas
    kernel (TPU production path for ``cost_method="mi"``).

    Semantics match the XLA form (:func:`gsw.gsw_disparity` with
    ``cost_method="mi"``): same random bootstrap, per-iteration global
    joint-histogram table, geodesic-weight aggregation, smallest-d
    tie-break. The whole refinement is one device program.

    ``coarse_step`` > 1 subsamples the window walk of the INTERMEDIATE
    MI iterations only (the final aggregation is always exact): those
    matchings exist solely to estimate the global joint histogram, which
    is insensitive to per-pixel matching noise, so the full-resolution
    aggregation runs once instead of ``mi_iterations`` times."""
    if interpret is None:
        interpret = _auto_interpret()
    return _gsw_mi_disparity_jit(
        jnp.asarray(img1), jnp.asarray(img2), win_size=int(win_size),
        max_disp=int(max_disp), min_disp=int(min_disp), gamma=float(gamma),
        bins=int(bins), mi_iterations=int(mi_iterations),
        consistent=bool(consistent), interpret=bool(interpret),
        coarse_step=int(coarse_step))


@functools.partial(
    jax.jit,
    static_argnames=("win_size", "max_disp", "min_disp", "gamma", "bins",
                     "mi_iterations", "consistent", "interpret",
                     "coarse_step"))
def _gsw_mi_batch_jit(imgs1, imgs2, *, win_size, max_disp, min_disp,
                      gamma, bins, mi_iterations, consistent, interpret,
                      coarse_step=1):
    from .gsw import _quantize_gray

    B, H, W = imgs1.shape[:3]
    D = max_disp - min_disp + 1
    tile_h = _pick_tile_h(H, W, win_size, D, ext_vol=True)
    kw = dict(H=H, W=W, win_size=win_size, min_disp=min_disp,
              max_disp=max_disp, gamma=gamma, f_max=0.0,
              interpret=interpret, tile_h=tile_h, ext_vol=True)
    mkw = dict(min_disp=min_disp, max_disp=max_disp, bins=bins)
    xs = jnp.arange(W)[None, :]
    steps = _mi_iter_steps(mi_iterations, coarse_step)

    q1 = jax.vmap(lambda a: _quantize_gray(a, bins))(imgs1)
    q2 = jax.vmap(lambda a: _quantize_gray(a, bins))(imgs2)
    disp0 = jax.random.randint(
        jax.random.PRNGKey(0), (H, W), min_disp, max_disp + 1,
        dtype=jnp.int32)

    ref = jax.vmap(lambda a: _mi_ref_planes(a, win_size, tile_h, H, W))
    vmi = jax.vmap(lambda a, b, d: _mi_volume(a, b, d, **mkw))
    vpk = jax.vmap(lambda v: _pack_planes(v, win_size, tile_h, H, W, 0.0))
    er = jax.vmap(lambda d: jnp.where(xs < min_disp, xs, d))

    if not consistent:
        rp = ref(imgs1)
        disp = jnp.broadcast_to(disp0, (B, H, W))
        for st in steps:
            planes = jnp.concatenate([rp, vpk(vmi(q1, q2, disp))], axis=1)
            disp = er(_gsw_pass_pallas(planes, step=st, **kw))
        return disp.astype(jnp.int16)

    q1R, q2R = q2[:, :, ::-1], q1[:, :, ::-1]
    rp = jnp.concatenate([ref(imgs1), ref(imgs2[:, :, ::-1])])
    dispLR = jnp.broadcast_to(disp0, (2 * B, H, W))
    qa = jnp.concatenate([q1, q1R])
    qb = jnp.concatenate([q2, q2R])
    for st in steps:
        planes = jnp.concatenate([rp, vpk(vmi(qa, qb, dispLR))], axis=1)
        dispLR = er(_gsw_pass_pallas(planes, step=st, **kw))
    dispL = dispLR[:B]
    dispR = dispLR[B:][:, :, ::-1]
    return jax.vmap(
        functools.partial(_lr_finish, W=W, min_disp=min_disp))(dispL, dispR)


def gsw_mi_disparity_pallas_batch(imgs1, imgs2, win_size=11, max_disp=16,
                                  min_disp=0, gamma=10.0, bins=20,
                                  mi_iterations=2, consistent=False,
                                  interpret=None, coarse_step=1):
    """Batched :func:`gsw_mi_disparity_pallas`: (B, H, W, 3) stacks,
    one kernel launch per MI iteration for the whole stack (both
    matching directions included when ``consistent``)."""
    if interpret is None:
        interpret = _auto_interpret()
    return _gsw_mi_batch_jit(
        jnp.asarray(imgs1), jnp.asarray(imgs2), win_size=int(win_size),
        max_disp=int(max_disp), min_disp=int(min_disp), gamma=float(gamma),
        bins=int(bins), mi_iterations=int(mi_iterations),
        consistent=bool(consistent), interpret=bool(interpret),
        coarse_step=int(coarse_step))
