"""Diagnose the Pallas copy rate: block-size sweep, perfectly-aligned flat
stream, and the XLA elementwise baseline at the same shapes.

Follow-up to probe_fir_roofline.py's first datum (copy C128@276 = 154 GB/s,
suspiciously low). Separates three hypotheses:
  1. per-grid-step overhead (fix: bigger blocks)
  2. odd-W layout padding (276 -> 384 lanes, 1.39x physical)
  3. a genuine Mosaic DMA cap (then the XLA emitter is already the roofline)

Run on TPU: python scripts/probe_stream_diag.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from afcm_tpu.utils.profiling import host_sync as sync


def timeit(fn, x, iters=30):
    f = jax.jit(fn)
    out = f(x)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(x)
    sync(out)
    return (time.time() - t0) / iters


def copy3d(c, h, w, cb):
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...]
    return pl.pallas_call(
        k, grid=(c // cb,),
        in_specs=[pl.BlockSpec((cb, h, w), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((cb, h, w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.bfloat16))


def copy2d(rows, cols, br):
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...]
    return pl.pallas_call(
        k, grid=(rows // br,),
        in_specs=[pl.BlockSpec((br, cols), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((br, cols), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.bfloat16))


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)

    for name, c, h, w in [("C@276", 8192, 276, 276), ("C@256", 8192, 256, 256)]:
        x = jnp.asarray(rng.randn(c, h, w).astype(np.float32), jnp.bfloat16)
        nb = 2 * x.size * 2
        # XLA elementwise baseline (same logical traffic, XLA's layouts)
        t = timeit(lambda a: a * jnp.bfloat16(1.0009765625), x)
        print(f"{name} xla-mult              {nb / t / 1e9:6.0f} GB/s "
              f"({t*1e3:.2f} ms)", flush=True)
        for cb in (4, 8, 16):
            blk_mb = 2 * cb * h * w * 2 / 1e6
            try:
                t = timeit(copy3d(c, h, w, cb), x)
                print(f"{name} pallas-copy cb={cb:<3d}    {nb / t / 1e9:6.0f} "
                      f"GB/s ({t*1e3:.2f} ms, blk {blk_mb:.1f}MB log)",
                      flush=True)
            except Exception as e:
                print(f"{name} pallas-copy cb={cb:<3d}    FAIL "
                      f"{str(e).splitlines()[0][:90]}", flush=True)
        del x

    # Perfectly-aligned flat stream: same byte count as C@276, zero padding.
    tot = 8192 * 276 * 276
    cols = 512
    rows = tot // cols  # 1219968 rows
    x = jnp.asarray(rng.randn(rows, cols).astype(np.float32), jnp.bfloat16)
    nb = 2 * x.size * 2
    t = timeit(lambda a: a * jnp.bfloat16(1.0009765625), x)
    print(f"flat  xla-mult              {nb / t / 1e9:6.0f} GB/s "
          f"({t*1e3:.2f} ms)", flush=True)
    for br in (2048, 4096, 8192):
        if rows % br:
            continue
        blk_mb = 2 * br * cols * 2 / 1e6
        try:
            t = timeit(copy2d(rows, cols, br), x)
            print(f"flat  pallas-copy br={br:<5d} {nb / t / 1e9:6.0f} GB/s "
                  f"({t*1e3:.2f} ms, blk {blk_mb:.1f}MB)", flush=True)
        except Exception as e:
            print(f"flat  pallas-copy br={br:<5d} FAIL "
                  f"{str(e).splitlines()[0][:90]}", flush=True)


if __name__ == "__main__":
    main()
