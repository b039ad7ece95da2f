"""Probe: which conv formulations make XLA reverse ACTIVATION-shaped
tensors in the weight-gradient, and does an explicit dW construction
avoid it?

Round-5 context: the shipped train step's last non-conv residue is
~17.4 ms/iter of `reverse` ops (profile, BASELINE.md). diag_reverse_ops
shows the big ones are dy/x-shaped (e.g. bf16[16,181,278,278]) feeding
the encoder convs' dW fusions — XLA repays our trace-time filter flip
(ops/modulated_conv.py conv2d, flip_weight=False) somewhere in the dW
lowering. This lowers small isolated cases on the REAL TPU toolchain and
counts reverses by shape class, then times them.

Run: python scripts/probe_conv_dw_reverse.py
"""

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from _chip_util import start_watchdog, tiny_probe

_DN = ("NCHW", "OIHW", "NCHW")


def count_reverses(txt):
    """(activation_reverses, filter_reverses) by rank-4 shape heuristic:
    filter-shaped = trailing dims <= 16."""
    act, filt = 0, 0
    for line in txt.splitlines():
        m = re.search(r"= \S*\[([0-9,]+)\][^ ]* reverse\(", line.strip())
        if not m:
            continue
        dims = [int(v) for v in m.group(1).split(",")]
        if len(dims) == 4 and dims[2] <= 16 and dims[3] <= 16:
            filt += 1
        else:
            act += 1
    return act, filt


def bench(fn, args, n=20):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].sum())  # sync (axon: host fetch)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].sum())
    return (time.time() - t0) / n * 1e3


def main():
    tiny_probe()
    # encoder_4-ish geometry, scaled down spatially to keep compiles fast
    N, CI, CO, H = 8, 128, 181, 150
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, CI, H, H), jnp.bfloat16)
    w = jnp.asarray(rng.randn(CO, CI, 3, 3), jnp.float32)
    dy = jnp.asarray(rng.randn(N, CO, H, H), jnp.bfloat16)

    def conv(x, w, flip):
        wc = w[:, :, ::-1, ::-1] if flip else w
        return lax.conv_general_dilated(
            x, wc.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=_DN)

    def loss_flip(x, w):
        return jnp.sum(conv(x, w, True).astype(jnp.float32) ** 2)

    def loss_noflip(x, w):
        return jnp.sum(conv(x, w, False).astype(jnp.float32) ** 2)

    # explicit dW: dW[o,i,kh,kw] = sum_n,s x[n,i,s+k-1] dy[n,o,s]
    # expressed as a conv with batch<->feature swapped on both operands —
    # jax's own transpose-wrt-rhs formulation, but emitted by US so we can
    # vary it. "fwd-form": lhs=x (I as batch), rhs=dy (O as out-channels).
    def dw_explicit(x, dy, flip):
        dn = lax.ConvDimensionNumbers(
            lhs_spec=(1, 0, 2, 3),   # x: [N,I,H,W] -> batch=I, feature=N
            rhs_spec=(1, 0, 2, 3),   # dy: [N,O,H,W] -> out=O, in=N
            out_spec=(1, 0, 2, 3))   # out: [I,O,kh,kw] -> [O,I,kh,kw]
        dw = lax.conv_general_dilated(
            x, dy, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=dn)
        if flip:
            dw = dw[:, :, ::-1, ::-1]
        return dw

    cases = {
        "grad_flip(jax autodiff, flip_weight=False path)":
            jax.jit(jax.grad(loss_flip, argnums=1)),
        "grad_noflip(jax autodiff, flip_weight=True path)":
            jax.jit(jax.grad(loss_noflip, argnums=1)),
        "dw_explicit_flip": jax.jit(lambda x, dy: dw_explicit(x, dy, True)),
        "dw_explicit_noflip":
            jax.jit(lambda x, dy: dw_explicit(x, dy, False)),
    }
    wd = start_watchdog(1500, "dW probe compiles")
    for name, fn in cases.items():
        args = (x, w) if name.startswith("grad") else (x, dy)
        txt = fn.lower(*args).compile().as_text()
        act, filt = count_reverses(txt)
        ms = bench(fn, args)
        print(f"{name:48s} act-rev={act} filt-rev={filt} {ms:7.2f} ms",
              flush=True)
    wd.cancel()

    # correctness: explicit dW == autodiff dW
    g = jax.jit(jax.grad(loss_flip, argnums=1))(x, w)
    # d/dw sum(y^2) = dW(x, 2y)
    y = jax.jit(lambda x, w: conv(x, w, True))(x, w)
    e = jax.jit(lambda x, dy: dw_explicit(x, dy, True))(x, 2 * y)
    err = float(jnp.max(jnp.abs(g - e)) / (jnp.max(jnp.abs(g)) + 1e-30))
    print(f"explicit-vs-autodiff dW max rel err: {err:.2e}")


if __name__ == "__main__":
    main()
