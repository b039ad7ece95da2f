"""Probe: do int8-stored 2x-rate FIR intermediates actually cut HBM time?

VERDICT r3 item 3 — the C>=128 FIR bucket (~80 ms of the forward) runs at
~450 GB/s, which probe_stream_diag showed is ~92% of this chip's practical
streaming ceiling (~490 GB/s, XLA elementwise == aligned Pallas). The only
remaining lever there is BYTES. This probe answers the gating question
before any product code: when the separable FIR chain's intermediates are
stored as int8 (quantize fused into the producing conv's epilogue, dequant
into the consumer's prologue — IF XLA fuses them), does wall time drop
toward the byte ratio (18 -> 10 units, 1.8x), or does XLA materialize the
converts as separate passes and erase the win?

Variants per layer shape (batch 16, bf16 compute):
  bf16    : the current composition (upfirdn W,H + lrelu/clamp + down W,H)
  int8    : same chain with int8 storage at the three crossings
            (post-upW, post-upH+act, post-downW), static scales
  int8act : int8 storage ONLY at the biggest crossing (post-act, 4 units),
            scale = clamp/127 (exact static bound — no calibration needed)

Fidelity: PSNR of each int8 variant vs the bf16 chain on the same input
(static scales calibrated from one warmup batch at 99.99%).

Run on TPU: python scripts/probe_int8_fir.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from afcm_tpu.ops.filter_design import design_lowpass_filter
from afcm_tpu.ops.upfirdn2d import _depthwise_conv
from afcm_tpu.utils.profiling import host_sync as sync

LAYERS = [  # (name, C, size) — the unrouted up2/down2 bucket
    ("C128@276", 128, 276),
    ("C181@276", 181, 276),
    ("C256@148", 256, 148),
    ("C512@84 ", 512, 84),
    ("C512@52 ", 512, 52),
]

GAIN, SLOPE, CLAMP = float(np.sqrt(2)), 0.2, 256.0


def timeit(fn, *args, iters=30):
    f = jax.jit(fn)
    out = f(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    sync(out)
    return (time.time() - t0) / iters, out


def q8(y, scale):
    """Quantize to int8 with a static scale (round-to-nearest, clip)."""
    return jnp.clip(jnp.round(y.astype(jnp.float32) * scale),
                    -127, 127).astype(jnp.int8)


def dq8(q, scale, dtype):
    return (q.astype(jnp.float32) * (1.0 / scale)).astype(dtype)


def build_chain(fu, fd, pad, quant):
    """quant: set of crossings in {'upw','act','dnw'} stored as int8.
    Scales are baked static (python floats set by calibrate())."""
    scales = {}

    def chain(x, b):
        y = x + b[None, :, None, None]
        y = _depthwise_conv(y, fu * 2, up=2, down=1, pad=(pad[0], pad[1]),
                            axis=3)
        if "upw" in quant:
            y = dq8(q8(y, scales["upw"]), scales["upw"], x.dtype)
        y = _depthwise_conv(y, fu * 2, up=2, down=1, pad=(pad[2], pad[3]),
                            axis=2)
        y = jnp.where(y > 0, y, y * SLOPE) * GAIN
        y = jnp.clip(y, -CLAMP, CLAMP)
        if "act" in quant:
            y = dq8(q8(y, scales["act"]), scales["act"], x.dtype)
        y = _depthwise_conv(y, fd, up=1, down=2, pad=(0, 0), axis=3)
        if "dnw" in quant:
            y = dq8(q8(y, scales["dnw"]), scales["dnw"], x.dtype)
        y = _depthwise_conv(y, fd, up=1, down=2, pad=(0, 0), axis=2)
        return y

    return chain, scales


def calibrate(fu, fd, pad, x, b):
    """99.99%-ile |y| at each crossing on one batch -> static scales."""
    out = {}
    y = x.astype(jnp.float32) + b.astype(jnp.float32)[None, :, None, None]
    y = _depthwise_conv(y, fu * 2, up=2, down=1, pad=(pad[0], pad[1]), axis=3)
    out["upw"] = 127.0 / max(1e-6, float(np.percentile(
        np.abs(np.asarray(y)), 99.99)))
    y = _depthwise_conv(y, fu * 2, up=2, down=1, pad=(pad[2], pad[3]), axis=2)
    y = jnp.clip(jnp.where(y > 0, y, y * SLOPE) * GAIN, -CLAMP, CLAMP)
    out["act"] = 127.0 / CLAMP   # exact static bound from the clamp
    y = _depthwise_conv(y, fd, up=1, down=2, pad=(0, 0), axis=3)
    out["dnw"] = 127.0 / max(1e-6, float(np.percentile(
        np.abs(np.asarray(y)), 99.99)))
    return out


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    batch = 16
    print(f"{'layer':9s} | {'bf16':>7s} {'int8':>7s} {'ratio':>5s} "
          f"{'PSNR':>5s} | {'int8act':>7s} {'ratio':>5s} {'PSNR':>5s}",
          flush=True)
    for name, c, size in LAYERS:
        fu = np.asarray(design_lowpass_filter(
            12, cutoff=size / 4, width=size / 2, fs=size * 2), np.float32)
        fd = np.asarray(design_lowpass_filter(
            12, cutoff=size / 4, width=size / 2, fs=size * 2), np.float32)
        pad = (9, 8, 9, 8)
        x = jnp.asarray(rng.randn(batch, c, size, size), jnp.bfloat16)
        b = jnp.asarray(rng.randn(c) * 0.1, jnp.bfloat16)

        cal = calibrate(fu, fd, pad, x, b)
        results = {}
        for tag, quant in (("bf16", frozenset()),
                           ("int8", frozenset({"upw", "act", "dnw"})),
                           ("int8act", frozenset({"act"}))):
            chain, scales = build_chain(fu, fd, pad, quant)
            scales.update(cal)
            t, out = timeit(chain, x, b)
            results[tag] = (t, np.asarray(out, np.float32))
        tb, yb = results["bf16"]
        line = f"{name} | {tb*1e3:7.2f}"
        for tag in ("int8", "int8act"):
            t, y = results[tag]
            err = np.mean((y - yb) ** 2)
            dr = float(yb.max() - yb.min())
            psnr = 10 * np.log10(dr * dr / max(err, 1e-12))
            line += (f" {t*1e3:7.2f} {tb/t:5.2f} {psnr:5.1f}"
                     if tag == "int8" else
                     f" | {t*1e3:7.2f} {tb/t:5.2f} {psnr:5.1f}")
        print(line, flush=True)
    print("\nratio = bf16_ms / variant_ms (>1 means int8 wins). If ratios "
          "sit near 1.0 the converts did not fuse into the convs and the "
          "bytes lever is closed; if near 1.5-1.8 the product knob is worth "
          "building.", flush=True)


if __name__ == "__main__":
    main()
