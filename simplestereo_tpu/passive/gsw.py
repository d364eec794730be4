"""
gsw
===

Geodesic Support-Weight matcher (Hosni et al. 2009, as approximated by the
reference).

Parity target: /root/reference/simplestereo/_passive.cpp workerGSW
:408-700 / computeGSW :703-774 and passive.py:99-158. The reference
labels this matcher "*Incomplete* ... Not optimized. Do not use in
production"; this implementation reproduces its published semantics
(device-resident, vectorized over the image) with the reference's border
quirks cleaned up:

- per-pixel support weights from an iterated two-pass (forward/backward)
  window-geodesic approximation: each window pixel takes the minimum over
  the corresponding half-window of (weight + direct BGR distance), run
  ``iterations`` times, then w = exp(-dist/gamma);
- matching cost = sum over the window of w * min(fMax, ||dBGR||_2),
  *unnormalized* and using left-image weights only (unlike ASW);
- tie-break toward the smallest disparity; empty candidate ranges return
  the pixel's own column; ``consistent`` mode applies the same
  left-right invalidation + occlusion fill as ASW.

The reference's mutual-information cost is an unimplemented TODO there
(_passive.cpp:506-508) and is not provided here either.

Complexity is O(H*W*win^4*iterations) for the weights — inherently the
reference's design; use :class:`StereoASW` or :class:`StereoSGM` for
production work.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .asw_ref import occlusion_fill


def _color_dist(a, b):
    return jnp.sqrt(((a - b) ** 2).sum(-1))


@functools.partial(
    jax.jit, static_argnames=("win_size", "iterations", "gamma"))
def _gsw_weights(img, win_size, iterations, gamma):
    """Support weights (tot, H, W) via the iterated half-window minimum."""
    H, W = img.shape[:2]
    pad = win_size // 2
    tot = win_size * win_size
    center = (tot - 1) // 2
    imgp = jnp.pad(img.astype(jnp.float32),
                   ((pad, pad), (pad, pad), (0, 0)),
                   constant_values=jnp.inf)

    def window(i):
        oy = i // win_size
        ox = i % win_size
        return jax.lax.dynamic_slice(imgp, (oy, ox, 0), (H, W, 3))

    # dist(i, k) map; inf-padded pixels produce inf distances -> excluded
    def dist(i, k):
        d = _color_dist(window(i), window(k))
        return jnp.where(jnp.isfinite(d), d, jnp.inf)

    w = jnp.full((tot, H, W), jnp.inf, jnp.float32)
    w = w.at[center].set(0.0)

    def one_iteration(_, w):
        # forward pass: scan i ascending, min over the upper half-window
        def fwd(i, w):
            def body_k(k, best):
                return jnp.minimum(best, w[k] + dist(i, k))
            best = jax.lax.fori_loop(
                0, center + 1, body_k,
                jnp.full((H, W), jnp.inf, jnp.float32))
            return w.at[i].set(best)
        w = jax.lax.fori_loop(0, tot, fwd, w)
        # backward pass: scan i descending, min over the lower half-window
        def bwd(t, w):
            i = tot - 1 - t
            def body_k(k, best):
                return jnp.minimum(best, w[k] + dist(i, k))
            best = jax.lax.fori_loop(
                center, tot, body_k,
                jnp.full((H, W), jnp.inf, jnp.float32))
            return w.at[i].set(best)
        return jax.lax.fori_loop(0, tot, bwd, w)

    w = jax.lax.fori_loop(0, iterations, one_iteration, w)
    return jnp.exp(-w / gamma)


@functools.partial(
    jax.jit,
    static_argnames=("win_size", "min_disp", "max_disp", "gamma", "f_max",
                     "iterations"))
def _gsw_pass(img1, img2, *, win_size, min_disp, max_disp, gamma, f_max,
              iterations):
    H, W = img1.shape[:2]
    pad = win_size // 2
    tot = win_size * win_size
    D = max_disp - min_disp + 1

    w = _gsw_weights(img1, win_size, iterations, gamma)

    f1 = img1.astype(jnp.float32)
    f2 = img2.astype(jnp.float32)

    def capdist(d):
        """min(fMax, ||left(y,x) - right(y,x-d)||), zero where invalid."""
        sh = jnp.pad(f2, ((0, 0), (d, 0), (0, 0)))[:, :W]
        m = jnp.minimum(_color_dist(f1, sh), f_max)
        xs = jnp.arange(W)[None, :]
        return jnp.where(xs - d >= 0, m, 0.0)

    # Build cost volume: loop disparities (python, D small) and window
    # offsets (fori with dynamic slices).
    costs = []
    for dd in range(D):
        d = min_disp + dd
        M = capdist(d)
        Mp = jnp.pad(M, ((pad, pad), (pad, pad)))

        def body(i, acc):
            oy = i // win_size
            ox = i % win_size
            m = jax.lax.dynamic_slice(Mp, (oy, ox), (H, W))
            return acc + w[i] * m

        c = jax.lax.fori_loop(0, tot, body, jnp.zeros((H, W), jnp.float32))
        xs = jnp.arange(W)[None, :]
        costs.append(jnp.where(xs - d >= 0, c, jnp.inf))
    cost = jnp.stack(costs, -1)
    xs = jnp.arange(W)
    disp = jnp.argmin(cost, axis=-1).astype(jnp.int32) + min_disp
    disp = jnp.where(xs[None, :] < min_disp, xs[None, :], disp)
    return disp


def gsw_disparity(img1, img2, win_size=11, max_disp=16, min_disp=0,
                  gamma=10.0, f_max=120.0, iterations=3,
                  consistent=False):
    """GSW disparity (parameters mirror the reference StereoGSW,
    passive.py:133-145)."""
    img1 = jnp.asarray(img1)
    img2 = jnp.asarray(img2)
    H, W = img1.shape[:2]
    xs = jnp.arange(W)
    kw = dict(win_size=win_size, min_disp=min_disp, max_disp=max_disp,
              gamma=float(gamma), f_max=float(f_max),
              iterations=iterations)
    dispL = _gsw_pass(img1, img2, **kw)
    if not consistent:
        return dispL.astype(jnp.int16)
    dispRf = _gsw_pass(img2[:, ::-1], img1[:, ::-1], **kw)
    dispR = dispRf[:, ::-1]
    xs_f = xs[None, :]
    dispR = jnp.where((W - 1 - xs_f) < min_disp, -xs_f, dispR)
    L = jnp.clip(xs_f + dispR, 0, W - 1)
    agree = jnp.take_along_axis(dispL, L, axis=1) == dispR
    disagree = jnp.zeros((H, W), bool)
    disagree = jax.vmap(lambda f, l, a: f.at[l].max(~a))(disagree, L, agree)
    dispI = jnp.where(disagree, -1, dispL)
    return occlusion_fill(dispI).astype(jnp.int16)


class StereoGSW:
    """Geodesic Support-Weight matcher (API parity: passive.py:99-158).

    .. note::
        Like the reference's version, this matcher is provided for
        completeness; prefer :class:`StereoASW` / :class:`StereoSGM`.
    """

    def __init__(self, winSize=11, maxDisparity=16, minDisparity=0,
                 gamma=10, fMax=120, iterations=3, bins=20,
                 consistent=False):
        if winSize <= 0 or winSize % 2 == 0:
            raise ValueError("winSize must be a positive odd number!")
        self.winSize = winSize
        self.maxDisparity = maxDisparity
        self.minDisparity = minDisparity
        self.gamma = gamma
        self.fMax = fMax
        self.iterations = iterations
        self.bins = bins  # kept for API parity (mutual information TODO)
        self.consistent = consistent

    def compute(self, img1, img2):
        img1 = np.ascontiguousarray(img1)
        img2 = np.ascontiguousarray(img2)
        if img1.ndim != 3 or img1.shape[2] != 3 or img1.shape != img2.shape:
            raise ValueError(
                "Images must be 3-channel BGR with identical shapes!")
        return np.asarray(gsw_disparity(
            img1, img2, win_size=self.winSize,
            max_disp=self.maxDisparity, min_disp=self.minDisparity,
            gamma=float(self.gamma), f_max=float(self.fMax),
            iterations=self.iterations, consistent=self.consistent))
