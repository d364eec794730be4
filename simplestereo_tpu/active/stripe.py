"""
stripe
======

Subpixel colored-stripe localization (parity:
/root/reference/simplestereo/active.py:272-345) and illuminated-region
detection (cleaned-up :func:`computeROI`, active.py:1611-1695 — the
reference marks its version "not suitable for production").
"""

import functools

import numpy as np

_CHANNEL = {"b": 0, "blue": 0, "g": 1, "green": 1, "r": 2, "red": 2}


@functools.lru_cache(maxsize=1)
def _jax():
    import jax
    import jax.numpy as jnp
    return jax, jnp


@functools.lru_cache(maxsize=1)
def _stripe_centroids_jit():
    jax, jnp = _jax()

    @functools.partial(jax.jit, static_argnames=("c",))
    def run(img, thr, c):
        img = img.astype(jnp.float32)
        ch = img[:, :, c]
        others = jnp.min(
            jnp.stack([img[:, :, i] for i in range(3) if i != c]), axis=0)
        fringe = jnp.clip(ch - others, 0.0, None)
        fringe = jnp.where(fringe < thr, 0.0, fringe)
        den = fringe.sum(axis=1)
        num = (fringe * jnp.arange(img.shape[1], dtype=jnp.float32)).sum(1)
        return num / den  # NaN rows where den == 0

    return run


def _stripe_centroids_device(image, channel, thr):
    """Per-row stripe centroids on device (NaN where no stripe).

    Device twin of the numpy math in :func:`findCentralStripe`, used when
    the caller's image is already device-resident (e.g. the FTP pipeline)
    so the full frame never crosses back to the host.
    """
    _, jnp = _jax()
    return _stripe_centroids_jit()(image, jnp.float32(thr), channel)


def findCentralStripe(image, color="r", sensitivity=0.5,
                      interpolation="linear"):
    """Find the colored stripe's subpixel x-center on every row.

    Per-row intensity-weighted centroid after thresholding at
    sensitivity * dtype_max; rows with no stripe are filled by
    linear interpolation/extrapolation over y (the reference uses
    scipy.interp1d with fill_value="extrapolate").

    Returns (H, 2) array of (x, y) with y at pixel centers (0.5, 1.5, ...)
    or None if the stripe is nowhere visible.
    """
    if not 0 <= sensitivity <= 1:
        raise ValueError("Threshold must be in the interval [0,1]!")
    if color not in _CHANNEL:
        raise ValueError("Color value not permitted!")
    c = _CHANNEL[color]
    is_device = type(image).__module__.split(".")[0] in ("jax", "jaxlib")
    if not is_device:
        image = np.asarray(image)
    h, w = image.shape[:2]
    dt = np.dtype(str(image.dtype))
    max_value = np.iinfo(dt).max if dt.kind in "iu" else 1.0

    if is_device:
        # Device-resident image: centroid math on device, only the (H,)
        # vector crosses to the host for the NaN fill below.
        x = np.asarray(_stripe_centroids_device(
            image, c, max_value * sensitivity), np.float64)
    else:
        # Excess-color weighting, not the raw channel: the reference
        # thresholds image[:, :, c] directly (active.py:308-320), which
        # also passes the neutral (white) fringe ridges that contain the
        # stripe color. Subtracting the *minimum* of the other channels
        # removes the neutral-light component while keeping overlaid
        # stripes (anaglyph: G sits on top of the R carrier) intact.
        ch = image[:, :, c].astype(np.float64)
        others = np.min(
            np.delete(image.astype(np.float64), c, axis=2), axis=2)
        fringe = np.clip(ch - others, 0.0, None)
        fringe[fringe < max_value * sensitivity] = 0

        i = np.arange(w)[None, :]
        den = fringe.sum(axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            x = (fringe * i).sum(axis=1) / den

    return _centroids_to_stripe(x, h, interpolation)


def _centroids_to_stripe(x, h, interpolation="linear"):
    """Host tail of :func:`findCentralStripe`: fill NaN rows of the
    per-row centroid vector ``x`` by interpolation/extrapolation and
    attach pixel-center y coordinates. None when no row has a stripe."""
    if np.isnan(x).all():
        return None

    y = np.arange(0.5, h, 1.0)
    mask = ~np.isnan(x)
    if interpolation != "linear":
        from scipy.interpolate import interp1d
        f = interp1d(y[mask], x[mask], kind=interpolation,
                     fill_value="extrapolate")
        x = f(y)
    else:
        x = _interp_extrap(y, y[mask], x[mask])
    return np.vstack((x, y)).T


def _interp_extrap(xq, xp, fp):
    """np.interp with linear extrapolation at both ends."""
    out = np.interp(xq, xp, fp)
    if len(xp) >= 2:
        s0 = (fp[1] - fp[0]) / (xp[1] - xp[0])
        s1 = (fp[-1] - fp[-2]) / (xp[-1] - xp[-2])
        lo = xq < xp[0]
        hi = xq > xp[-1]
        out[lo] = fp[0] + s0 * (xq[lo] - xp[0])
        out[hi] = fp[-1] + s1 * (xq[hi] - xp[-1])
    return out


def computeROI(img, blackThreshold=10, extraMargin=0, whiteThreshold=None,
               coverage=0.95):
    """Find the illuminated region of interest as (x, y, width, height).

    Redesigned version of the reference's computeROI (active.py:1611-1695,
    self-described as "to rewrite completely"): threshold, keep the
    largest connected bright component, then shrink the bounding box one
    border at a time until every border row/column is at least
    ``coverage`` inside the component. ``extraMargin`` keeps the
    reference's final safety shrink (active.py:1689-1692): the returned
    rectangle is reduced by that many pixels on every side.
    """
    from scipy.ndimage import label

    img = np.asarray(img)
    if img.ndim == 3:
        g = img.mean(axis=2)
    else:
        g = img.astype(np.float64)
    mask = g > blackThreshold
    if whiteThreshold is not None:
        mask &= g < whiteThreshold
    if not mask.any():
        return (0, 0, img.shape[1], img.shape[0])
    lab, n = label(mask)
    if n > 1:
        counts = np.bincount(lab.ravel())
        counts[0] = 0
        mask = lab == counts.argmax()

    ys, xs = np.nonzero(mask)
    x0, x1 = xs.min(), xs.max() + 1
    y0, y1 = ys.min(), ys.max() + 1
    for _ in range(mask.shape[0] + mask.shape[1]):
        sub = mask[y0:y1, x0:x1]
        fr = [sub[0].mean(), sub[-1].mean(), sub[:, 0].mean(),
              sub[:, -1].mean()]
        worst = int(np.argmin(fr))
        if fr[worst] >= coverage or (y1 - y0) <= 2 or (x1 - x0) <= 2:
            break
        if worst == 0:
            y0 += 1
        elif worst == 1:
            y1 -= 1
        elif worst == 2:
            x0 += 1
        else:
            x1 -= 1
    # Clamp the safety margin so the returned rectangle never collapses
    # to non-positive width/height (a margin >= half the detected box
    # would otherwise produce an empty crop downstream).
    m = max(0, int(extraMargin))
    m = min(m, (int(x1 - x0) - 1) // 2, (int(y1 - y0) - 1) // 2)
    return (int(x0) + m, int(y0) + m, int(x1 - x0) - 2 * m,
            int(y1 - y0) - 2 * m)
