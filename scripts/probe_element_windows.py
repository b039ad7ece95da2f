"""Probe: pl.Element block dims on Mosaic TPU — overlapping input windows
with unaligned minor-dim offsets and implicit zero padding.

Mosaic's 8/128 rule applies to Element blocks too (last two block dims must
be 8/128-divisible or equal to the array dims), so the usable geometry for
the filtered_lrelu_mxu wrapper is: W window widened to a 128 multiple
(over-reading into the neighbour tile — exact once the banded tap matrix is
zero-padded past the true window), H = full array dim. If this compiles and
matches, the wrapper can feed overlapping W-tiles straight from HBM (auto
double-buffered) instead of materializing a [N, C, n_tw, hx, wxw] gathered
copy in XLA (~20 ms/iter of the bf16 forward: the 'copy' + gather
loop-fusion buckets in scripts/profile_forward.py).

Run: python scripts/probe_element_windows.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl


def main():
    C, H, W = 8, 64, 512
    wxw, n_t = 128, 4

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(C, H, W), jnp.float32)
    xn = np.asarray(x)

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    # Case 1: overlapping windows, aligned-ish stride 64, in bounds.
    sw = 64
    out = pl.pallas_call(
        kern,
        grid=(n_t,),
        in_specs=[pl.BlockSpec(
            (pl.Element(C), pl.Element(H), pl.Element(wxw)),
            lambda t: (0, 0, t * sw))],
        out_specs=pl.BlockSpec((None, C, H, wxw), lambda t: (t, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_t, C, H, wxw), jnp.float32),
    )(x)
    ref = np.stack([xn[:, :, t * sw:t * sw + wxw] for t in range(n_t)]) * 2.0
    err = np.abs(np.asarray(out) - ref).max()
    print(f"case 1 (overlap, stride 64): max err {err:.2e}",
          "OK" if err == 0 else "FAIL", flush=True)

    # Case 2: unaligned stride 48 (the real kernel's s values are 16/32/48).
    sw = 48
    out = pl.pallas_call(
        kern,
        grid=(n_t,),
        in_specs=[pl.BlockSpec(
            (pl.Element(C), pl.Element(H), pl.Element(wxw)),
            lambda t: (0, 0, t * sw))],
        out_specs=pl.BlockSpec((None, C, H, wxw), lambda t: (t, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_t, C, H, wxw), jnp.float32),
    )(x)
    ref = np.stack([xn[:, :, t * sw:t * sw + wxw] for t in range(n_t)]) * 2.0
    err = np.abs(np.asarray(out) - ref).max()
    print(f"case 2 (overlap, stride 48): max err {err:.2e}",
          "OK" if err == 0 else "FAIL", flush=True)

    # Case 3: implicit zero padding — window offsets dip below 0 and past W.
    pad_lo, pad_hi = 16, 80
    n_t3 = 5
    sw = 112
    out = pl.pallas_call(
        kern,
        grid=(n_t3,),
        in_specs=[pl.BlockSpec(
            (pl.Element(C), pl.Element(H),
             pl.Element(wxw, padding=(pad_lo, pad_hi))),
            lambda t: (0, 0, t * sw - pad_lo))],
        out_specs=pl.BlockSpec((None, C, H, wxw), lambda t: (t, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_t3, C, H, wxw), jnp.float32),
    )(x)
    xp = np.pad(xn, ((0, 0), (0, 0), (pad_lo, pad_hi)))
    ref = np.stack([xp[:, :, t * sw:t * sw + wxw]
                    for t in range(n_t3)]) * 2.0
    err = np.abs(np.asarray(out) - ref).max()
    print(f"case 3 (implicit zero pad): max err {err:.2e}",
          "OK" if err == 0 else "FAIL", flush=True)

    # Case 4: channel-dim Element padding (c_pad > C) — replaces the XLA
    # channel pad. C sits outside the last-two dims so any block size goes.
    c_pad = 16
    out = pl.pallas_call(
        kern,
        grid=(2,),
        in_specs=[pl.BlockSpec(
            (pl.Element(c_pad, padding=(0, c_pad - C)), pl.Element(H),
             pl.Element(wxw)),
            lambda t: (0, 0, t * wxw))],
        out_specs=pl.BlockSpec((None, c_pad, H, wxw), lambda t: (t, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, c_pad, H, wxw), jnp.float32),
    )(x)
    xp = np.pad(xn, ((0, c_pad - C), (0, 0), (0, 0)))
    ref = np.stack([xp[:, :, t * wxw:(t + 1) * wxw] for t in range(2)]) * 2.0
    err = np.abs(np.asarray(out) - ref).max()
    print(f"case 4 (channel pad): max err {err:.2e}",
          "OK" if err == 0 else "FAIL", flush=True)


if __name__ == "__main__":
    main()
