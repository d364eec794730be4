"""
lab
===

BGR -> CIELab conversion with the reference's exact constants.

The reference converts with its own sRGB->XYZ->Lab code (D65, 2-degree
observer), NOT OpenCV's — see
/root/reference/simplestereo/headers/colorconversion.hpp:18-70. Matching
these constants is required for disparity parity of the ASW matcher, whose
color weights are exponentials of Lab distances.
"""

import jax.numpy as jnp


def bgr_to_lab(img):
    """Convert a BGR image to CIELab (reference-parity constants).

    Parameters
    ----------
    img : jnp.ndarray
        (..., 3) BGR, uint8 or float in [0, 255].

    Returns
    -------
    jnp.ndarray
        (..., 3) float32 L, a, b (L in [0, 100]).
    """
    img = jnp.asarray(img)
    x = img.astype(jnp.float32) / 255.0
    b, g, r = x[..., 0], x[..., 1], x[..., 2]

    def srgb_inv_gamma(c):
        return jnp.where(c > 0.04045, ((c + 0.055) / 1.055) ** 2.4, c / 12.92)

    r = srgb_inv_gamma(r) * 100.0
    g = srgb_inv_gamma(g) * 100.0
    b = srgb_inv_gamma(b) * 100.0

    # D65 / 2-degree observer matrix (colorconversion.hpp:40-42).
    X = r * 0.4124 + g * 0.3576 + b * 0.1805
    Y = r * 0.2126 + g * 0.7152 + b * 0.0722
    Z = b * 0.9505 + r * 0.0193 + g * 0.1192

    X = X / 95.047
    Y = Y / 100.0
    Z = Z / 108.883

    def f(t):
        return jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)

    fx, fy, fz = f(X), f(Y), f(Z)
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    bb = 200.0 * (fy - fz)
    return jnp.stack([L, a, bb], axis=-1)
