"""Hardware probe: ``tpu.dynamic_rotate`` amount semantics on real TPU.

Mosaic's interpret mode and real hardware DISAGREE on one pattern, which
silently corrupted the ASW consistent-mode roll until caught end-to-end
(see CLAUDE.md "Mosaic/Pallas facts"): a NEGATIVE rotate amount that
depends on the same ``fori_loop`` induction variable as a
dynamically-indexed ref operand (``roll(num[dd], -dd)``) mis-rotates by
an extra lane tile (-128). Nonnegative amounts — including an amount
equal to the lane count — rotate correctly, as do negative amounts tied
to an *outer* loop variable (the ASW window walk relies on that).

Run on a real TPU after any Mosaic/jaxlib upgrade:

    python benchmarks/probe_dynamic_rotate.py

Exit code 0 iff hardware behavior still matches the rules the ASW kernel
(simplestereo_tpu/passive/asw_pallas.py) was built around: "pos" and
"rem" forms exact, "neg" expected-broken (a "neg" PASS would mean the
bug was fixed upstream and the workaround note can be dropped).
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 384   # three 128-lane tiles: cross-tile rotate logic is what breaks
D = 17
TH = 8


def make(mode):
    def kern(x_ref, o_ref, num, den):
        num[...] = x_ref[...]

        def body(dd, _):
            if mode == "pos":      # the ASW kernel's form: w_acc - d
                s = W - dd
            elif mode == "neg":    # known-broken on hw as of 2026-08
                s = -dd
            elif mode == "rem":    # normalized into [0, W)
                s = jax.lax.rem(W - dd, W)
            den[dd] = pltpu.roll(num[dd], s, axis=1)
            return 0

        jax.lax.fori_loop(0, D, body, 0)
        o_ref[...] = den[...]

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((D, TH, W), jnp.float32),
            scratch_shapes=[pltpu.VMEM((D, TH, W), jnp.float32),
                            pltpu.VMEM((D, TH, W), jnp.float32)],
        )(x)

    return run


def main():
    if jax.default_backend() != "tpu":
        print("needs a real TPU (interpret mode hides the bug); aborting")
        return 1
    x = (jnp.tile(jnp.arange(W, dtype=jnp.float32)[None, None, :],
                  (D, TH, 1))
         + 1000 * jnp.arange(D, dtype=jnp.float32)[:, None, None])
    xn = np.asarray(x)
    expect = np.stack([np.roll(xn[dd], -dd, axis=1) for dd in range(D)])
    status = 0
    for mode, want_exact in (("pos", True), ("neg", False), ("rem", True)):
        out = np.asarray(make(mode)(x))
        exact = bool(np.array_equal(out, expect))
        flag = "ok" if exact == want_exact else "CHANGED"
        if exact != want_exact:
            status = 1
        print(f"{mode}: exact={exact} (expected {want_exact}) [{flag}]")
    return status


if __name__ == "__main__":
    sys.exit(main())
