"""Mosaic stream probe — the real bandwidth roofline for the C>=128 FIR bucket.

VERDICT r3 item 2: "bandwidth-bound at ~450 GB/s" was asserted from the XLA
depthwise conv emitter's achieved rate, never demonstrated to be the access
pattern's floor. This probe measures what a Pallas kernel can actually stream
at the exact unrouted-layer shapes, with NO tap math:

  copy  : y[C,H,W]  = x[C,H,W]                  (rd 1x, wr 1x)  — pure stream
  wr4x  : y[4C,H,W] = 4 scaled stores of x      (rd 1x, wr 4x)  — the up-FIR
                                                  write pattern (2x-rate out)
  rd4x  : y[C,H,W]  = reduce of x[4C,H,W]       (rd 4x, wr 1x)  — the down-FIR
                                                  read pattern (2x-rate in)
  chain : y[C,H,W]  = f(x) via a 4x VMEM temp   (rd 1x, wr 1x)  — the fused
                                                  chain's minimal HBM traffic

The 4x factors are folded into the CHANNEL dim so every store/load is
lane-aligned: a fused up->act->down kernel keeps its 2x-rate intermediate in
VMEM, so its HBM side is exactly "blocks of x in, blocks of y out" — which is
what these kernels bound. (A real kernel's in-VMEM layout may pad the odd
widths 276->384 lanes; that is VPU-side relayout, not HBM traffic.)

Two artifacts of this tunnel are handled explicitly:
  * isolated dispatches cost ~0.65 ms (docs/performance.md) — every shape is
    replicated in C until the per-iter device time dominates the floor;
  * GB/s is reported for LOGICAL bytes.

The `xla` column times the CURRENT emitter at the same (replicated) shape:
the full filtered_lrelu XLA composition (up2-FIR -> lrelu -> down2-FIR,
separable 12-tap), with its minimal-traffic GB/s (rd x + wr y only) for a
like-for-like comparison against `chain`.

Run on TPU:  python scripts/probe_fir_roofline.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from afcm_tpu.utils.profiling import host_sync as sync

# (name, C_total = batch16 * C * rep, H, W) — the unrouted up2/down2 FIR
# layers (bench_flrelu_bigc.LAYERS) at batch 16, N folded into C, replicated
# `rep`x so the streaming time dominates the ~0.65 ms dispatch floor.
SHAPES = [
    ("C128@276", 128, 276, 276, 4),
    ("C256@148", 256, 148, 148, 8),
    ("C512@84 ", 512, 84, 84, 12),
    ("C512@52 ", 512, 52, 52, 32),
    ("C128@256", 128, 256, 256, 5),   # lane-aligned control
]

DT = jnp.bfloat16
_VMEM = 8 * 1024 * 1024


def _blocks(c, h, w):
    """(cb, bh): bh=h unless a multiple-of-8 divisor exists; cb sized so the
    4x-rate end of the working set stays under the VMEM budget."""
    bh = h
    for cand in (64, 32, 16, 8):
        if h % cand == 0:
            bh = cand
            break
    cb = 32
    while cb > 1 and (6 * cb * bh * w * 2) > _VMEM:
        cb //= 2
    while c % cb:
        cb //= 2
    return cb, bh


def build_copy(c, h, w):
    cb, bh = _blocks(c, h, w)

    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    return pl.pallas_call(
        k, grid=(c // cb, h // bh),
        in_specs=[pl.BlockSpec((cb, bh, w), lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((cb, bh, w), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((c, h, w), DT)), (c * h * w * 2) * 2


def build_wr4x(c, h, w):
    cb, bh = _blocks(c, h, w)

    def k(x_ref, o_ref):
        x = x_ref[...]
        o_ref[0 * cb:1 * cb] = x
        o_ref[1 * cb:2 * cb] = x * 0.5
        o_ref[2 * cb:3 * cb] = x * 0.25
        o_ref[3 * cb:4 * cb] = x * 0.125

    return pl.pallas_call(
        k, grid=(c // cb, h // bh),
        in_specs=[pl.BlockSpec((cb, bh, w), lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((4 * cb, bh, w), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((4 * c, h, w), DT)), \
        (c * h * w * 2) * 5


def build_rd4x(c, h, w):
    cb, bh = _blocks(c, h, w)

    def k(x_ref, o_ref):
        a = x_ref[0 * cb:1 * cb]
        b = x_ref[1 * cb:2 * cb]
        d = x_ref[2 * cb:3 * cb]
        e = x_ref[3 * cb:4 * cb]
        o_ref[...] = ((a + b) + (d + e)).astype(DT)

    return pl.pallas_call(
        k, grid=(c // cb, h // bh),
        in_specs=[pl.BlockSpec((4 * cb, bh, w), lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((cb, bh, w), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((c, h, w), DT)), \
        (c * h * w * 2) * 5, (4 * c, h, w)


def build_chain(c, h, w):
    """read x, blow up to a 4x VMEM temp, lrelu, reduce back, write y — the
    fused up->act->down chain's HBM traffic with placeholder (aligned) math."""
    cb, bh = _blocks(c, h, w)

    def k(x_ref, o_ref, t_ref):
        x = x_ref[...]
        t_ref[0 * cb:1 * cb] = x
        t_ref[1 * cb:2 * cb] = x * 0.5
        t_ref[2 * cb:3 * cb] = x * 0.25
        t_ref[3 * cb:4 * cb] = x * 0.125
        t = t_ref[...]
        t = jnp.where(t > 0, t, 0.2 * t)
        o_ref[...] = ((t[0 * cb:1 * cb] + t[1 * cb:2 * cb]) +
                      (t[2 * cb:3 * cb] + t[3 * cb:4 * cb])).astype(DT)

    return pl.pallas_call(
        k, grid=(c // cb, h // bh),
        in_specs=[pl.BlockSpec((cb, bh, w), lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((cb, bh, w), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((c, h, w), DT),
        scratch_shapes=[pltpu.VMEM((4 * cb, bh, w), DT)]), \
        (c * h * w * 2) * 2


def timeit(fn, x, iters=30):
    f = jax.jit(fn)
    out = f(x)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(x)
    sync(out)
    return (time.time() - t0) / iters


def xla_updown(c, h, w):
    """The current emitter at the same shape: the full filtered_lrelu XLA
    composition (separable 12-tap up2-FIR -> lrelu -> down2-FIR) — what the
    80 ms bucket actually runs, at the replicated channel count."""
    from afcm_tpu.ops.filtered_lrelu import filtered_lrelu
    from afcm_tpu.ops.filter_design import design_lowpass_filter
    fu = design_lowpass_filter(12, cutoff=h / 4, width=h / 2, fs=h * 2)
    fd = design_lowpass_filter(12, cutoff=h / 4, width=h / 2, fs=h * 2)
    x4 = jnp.zeros((16, c // 16, h, w), DT)

    def f(x):
        return filtered_lrelu(x, fu=fu, fd=fd, up=2, down=2,
                              padding=(9, 8, 9, 8), gain=float(np.sqrt(2)),
                              slope=0.2, clamp=256.0, impl="xla")

    t = timeit(f, x4)
    y = jax.eval_shape(f, x4)
    bytes_min = (x4.size + int(np.prod(y.shape))) * 2
    return t, bytes_min


def main():
    print("backend:", jax.default_backend(), "dtype:", DT.__name__, flush=True)
    rng = np.random.RandomState(0)
    print(f"{'shape':10s} {'rep':>3s} | {'copy':>6s} {'wr4x':>6s} "
          f"{'rd4x':>6s} {'chain':>6s} | {'xla ms':>7s} {'xla GB/s':>8s}",
          flush=True)
    for name, c0, h, w, rep in SHAPES:
        c = 16 * c0 * rep
        x = jnp.asarray(rng.randn(c, h, w), DT)
        call, nb = build_copy(c, h, w)
        t_copy = timeit(call, x)
        print(f"  {name} copy  {nb / t_copy / 1e9:6.0f} GB/s "
              f"({t_copy * 1e3:.2f} ms)", flush=True)
        call, nb_u = build_wr4x(c, h, w)
        t_up = timeit(call, x)
        print(f"  {name} wr4x  {nb_u / t_up / 1e9:6.0f} GB/s "
              f"({t_up * 1e3:.2f} ms)", flush=True)
        call, nb_d, shp4 = build_rd4x(c, h, w)
        x4 = jnp.asarray(rng.randn(*shp4), DT)
        t_dn = timeit(call, x4)
        del x4
        print(f"  {name} rd4x  {nb_d / t_dn / 1e9:6.0f} GB/s "
              f"({t_dn * 1e3:.2f} ms)", flush=True)
        call, nb_c = build_chain(c, h, w)
        t_ch = timeit(call, x)
        print(f"  {name} chain {nb_c / t_ch / 1e9:6.0f} GB/s "
              f"({t_ch * 1e3:.2f} ms)", flush=True)
        del x
        t_x, bmin = xla_updown(c, h, w)
        print(f"{name:10s} {rep:3d} | {nb / t_copy / 1e9:6.0f} "
              f"{nb_u / t_up / 1e9:6.0f} {nb_d / t_dn / 1e9:6.0f} "
              f"{nb_c / t_ch / 1e9:6.0f} | {t_x * 1e3:7.2f} "
              f"{bmin / t_x / 1e9:8.0f}", flush=True)
    print("\nGB/s of LOGICAL bytes (rd+wr). copy/wr4x/rd4x/chain = Pallas "
          "stream kernels, lane-aligned, no tap math.\nchain bounds a fused "
          "up->act->down kernel's HBM rate; xla GB/s is the current emitter "
          "at minimal-traffic accounting.\nIf chain >= ~650, a streaming FIR "
          "kernel has real headroom over the emitter; if ~450-500, the "
          "pattern is the floor.", flush=True)


if __name__ == "__main__":
    main()
