"""
unwrapping
==========

Phase unwrapping algorithms.

Parity target: /root/reference/simplestereo/unwrapping.py and the C++
extension _unwrapping.cpp (Estrada, Servin, Quiroga 2011 — "Noise robust
linear dynamic system for phase unwrapping and smoothing").

The reference's IIR unwrapper is an inherently sequential raster recursion
written in C++. Here it is expressed as nested ``lax.scan``s (rows outer,
columns inner): the carry holds the previous unwrapped row, because the
causal 3x3 neighborhood only ever touches the previous row and the
in-scan-direction predecessor. The reference's known defect — float32
values written into a float64 output (the "called twice may not work" bug,
unwrapping.py:38-39 / _unwrapping.cpp:112) — is fixed: precision follows
the input dtype.
"""

import jax
import jax.numpy as jnp
import numpy as np


def wrap_to_pi(angle):
    """Wrap angles to [-pi, pi) — the W operator of Estrada et al."""
    a = jnp.mod(angle + jnp.pi, 2 * jnp.pi)
    return jnp.where(a >= 0, a - jnp.pi, a + jnp.pi)


def unwrap(phase, axis=-1):
    """1D unwrap along an axis (numpy.unwrap equivalent, jittable)."""
    return jnp.unwrap(jnp.asarray(phase), axis=axis)


def unwrap2D(phase):
    """Simple separable 2D unwrap: along x then along y.

    This is the default unwrapping the reference FTP pipeline applies
    (active.py:739-743: ``np.unwrap`` axis=1 then axis=0).
    """
    p = jnp.asarray(phase)
    p = jnp.unwrap(p, axis=1)
    return jnp.unwrap(p, axis=0)


def _shift_right(row, dtype):
    """Values of the x-1 neighbor at each x (x=0 has none)."""
    return jnp.concatenate([jnp.zeros(1, dtype), row[:-1]])


def _shift_left(row, dtype):
    """Values of the x+1 neighbor at each x (x=W-1 has none)."""
    return jnp.concatenate([row[1:], jnp.zeros(1, dtype)])


def _iir_row_pass(cur_phase, tau, nm1=None, n0=None, np1=None, reverse=False):
    """One sequential pass over a row of the Estrada recursion.

    For each pixel x (in scan order), the output is the mean over the
    already-visited causal neighbors n of ``u_n + tau * W(phi_x - u_n)``,
    or ``phi_x`` itself when no neighbor is visited.

    Neighbor sources (each ``None`` or a row of values, element-aligned so
    entry x holds the neighbor's value for pixel x):

    - ``nm1``: static values of the x-1 neighbor (masked out at x=0);
      in forward mode this slot is *replaced* by the scan carry (the just
      computed u_{x-1}).
    - ``n0``: static values of the pixel's own previous estimate.
    - ``np1``: static values of the x+1 neighbor (masked out at x=W-1);
      in reverse mode this slot is replaced by the scan carry.

    The summation order (nm1, n0, np1) matches the reference's 3x3
    neighbor iteration order for float-association parity.
    """
    W = cur_phase.shape[0]
    dtype = cur_phase.dtype
    idx = jnp.arange(W)

    def pack(src, border_mask):
        if src is None:
            return jnp.zeros(W, dtype), jnp.zeros(W, bool)
        vals, valid = src
        return vals, jnp.broadcast_to(jnp.asarray(valid), (W,)) & border_mask

    not_first = idx > 0
    not_last = idx < W - 1
    a_vals, a_valid = pack(nm1, not_first)
    b_vals, b_valid = pack(n0, jnp.ones(W, bool))
    c_vals, c_valid = pack(np1, not_last)

    if not reverse:
        a_valid = jnp.zeros(W, bool)  # replaced by carry
        carry_mask = not_first
    else:
        c_valid = jnp.zeros(W, bool)  # replaced by carry
        carry_mask = not_last

    def contrib(u, phi):
        return u + tau * wrap_to_pi(phi - u)

    def step(carry, xs):
        u_prev, has_prev = carry
        phi, a, b, c, va, vb, vc, cm = xs
        total = jnp.asarray(0.0, dtype)
        count = jnp.asarray(0.0, dtype)
        # Slot order: x-1 neighbor, self, x+1 neighbor. `reverse` is static,
        # so the carry substitution resolves at trace time.
        if not reverse:
            av, avalid, cv, cvalid = u_prev, has_prev & cm, c, vc
        else:
            av, avalid, cv, cvalid = a, va, u_prev, has_prev & cm
        for val, valid in ((av, avalid), (b, vb), (cv, cvalid)):
            total = total + jnp.where(valid, contrib(val, phi), 0.0)
            count = count + jnp.where(valid, 1.0, 0.0)
        out = jnp.where(count > 0, total / jnp.maximum(count, 1.0), phi)
        return (out, jnp.asarray(True)), out

    xs = (cur_phase, a_vals, b_vals, c_vals, a_valid, b_valid, c_valid,
          carry_mask)
    (_, _), out = jax.lax.scan(
        step, (jnp.asarray(0.0, dtype), jnp.asarray(False)), xs,
        reverse=reverse,
    )
    return out


def _main_row_pass(prev_row, phi_row, tau):
    """Standard main-scan row: previous row (3 taps) + left carry."""
    dtype = phi_row.dtype
    return _iir_row_pass(
        phi_row, tau,
        nm1=(_shift_right(prev_row, dtype), True),
        n0=(prev_row, True),
        np1=(_shift_left(prev_row, dtype), True),
    )


@jax.jit
def _iir_unwrap(phase, tau):
    W = phase.shape[1]
    dtype = phase.dtype

    # Row-0 transient removal. Forward: only the left-neighbor chain exists.
    fwd = _iir_row_pass(phase[0], tau)
    # Backward refinement: every row-0 pixel is now flagged visited, so the
    # causal set is {x-1: forward value, x: forward value, x+1: carry}.
    bwd = _iir_row_pass(
        phase[0], tau,
        nm1=(_shift_right(fwd, dtype), True),
        n0=(fwd, True),
        reverse=True,
    )
    # The reference's backward loop stops before x=0 (x > 0).
    row0 = fwd.at[1:].set(bwd[1:])

    # Main raster scan revisits row 0 with causal set
    # {x-1: carry, x: transient value, x+1: transient value}.
    row0_final = _iir_row_pass(
        phase[0], tau,
        n0=(row0, True),
        np1=(_shift_left(row0, dtype), True),
    )

    def row_step(prev_row, phi_row):
        out = _main_row_pass(prev_row, phi_row, tau)
        return out, out

    _, rest = jax.lax.scan(row_step, row0_final, phase[1:])
    return jnp.concatenate([row0_final[None], rest], axis=0)


def infiniteImpulseResponse(phase, tau):
    """Noise-robust IIR phase unwrapping (Estrada et al. 2011).

    Parameters
    ----------
    phase : array
        2D wrapped phase map (radians).
    tau : float
        Noise-rejection parameter in [0, 1]: smaller tau smooths more.

    Returns
    -------
    numpy.ndarray
        Unwrapped (and smoothed) phase, same shape/dtype.

    Notes
    -----
    Matches the recursion structure of the reference extension
    (_unwrapping.cpp:52-158): row 0 is unwrapped forward then backward to
    remove the transient, then a full raster scan estimates each pixel as
    the mean of causal-neighbor predictions ``u_n + tau * W(phi - u_n)``.
    """
    if not (0 <= tau <= 1):
        raise ValueError("Wrong tau value!")
    phase = jnp.asarray(phase)
    if phase.ndim != 2:
        raise ValueError("Wrong phase dimensions!")
    return np.asarray(_iir_unwrap(phase, jnp.asarray(tau, phase.dtype)))
