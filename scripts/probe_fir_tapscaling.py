"""Probe: is the XLA depthwise FIR emitter bandwidth- or compute-bound?

probe_stream_diag (round 4) measured the chip's practical streaming ceiling
at ~490 GB/s; the FIR bucket achieves ~450 — which reads as "bandwidth-bound,
done". But the int8-intermediate probe showed byte cuts barely move wall time
(1.0-1.15x), which fits a COMPUTE-bound VPU emitter instead. Decisive test:
time one depthwise conv pass at fixed shape with 4 / 8 / 12 / 16 / 24 taps.

  time ~ flat in taps     -> bandwidth-bound (bytes are the lever)
  time ~ linear in taps   -> VPU-compute-bound (MACs are the lever;
                             int8 storage and fused streaming kernels are
                             both dead ends for this bucket)

Also splits up-pass (lhs_dilation=2: does XLA skip the structural zeros?)
from down-pass (stride 2) and plain (up=down=1) behavior.

Run on TPU: python scripts/probe_fir_tapscaling.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from afcm_tpu.ops.upfirdn2d import _depthwise_conv
from afcm_tpu.utils.profiling import host_sync as sync

SHAPES = [  # (name, C, H, W) at batch 16 — bucket shapes at the pass's rate
    ("C512@84 ", 512, 84, 84),
    ("C256@148", 256, 148, 148),
    ("C128@276", 128, 276, 276),
]
TAPS = (4, 8, 12, 16, 24)


def timeit(fn, x, iters=30):
    f = jax.jit(fn)
    out = f(x)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(x)
    sync(out)
    return (time.time() - t0) / iters


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    for mode, up, down in (("up2  ", 2, 1), ("down2", 1, 2),
                           ("plain", 1, 1)):
        print(f"\n-- {mode} H-pass (lhs_dilation={up}, stride={down}) --",
              flush=True)
        print(f"{'shape':9s} | " +
              " ".join(f"{t:>7d}" for t in TAPS) + "  (ms per pass)",
              flush=True)
        for name, c, h, w in SHAPES:
            hh = h * 2 if up == 1 and down == 2 else h   # feed 2x-rate input
            x = jnp.asarray(rng.randn(16, c, hh, w), jnp.bfloat16)
            row = []
            for nt in TAPS:
                taps = np.hanning(nt + 2)[1:-1].astype(np.float32)
                taps /= taps.sum()
                pad = (nt // 2, nt // 2)
                t = timeit(lambda a, taps=taps, pad=pad: _depthwise_conv(
                    a, taps, up=up, down=down, pad=pad, axis=2), x)
                row.append(t)
            base = row[0]
            print(f"{name} | " +
                  " ".join(f"{t*1e3:7.3f}" for t in row) +
                  f"   x{row[-1]/base:.2f} from {TAPS[0]}->{TAPS[-1]} taps",
                  flush=True)
    print("\nflat rows => bandwidth-bound; linear rows => VPU compute-bound.",
          flush=True)


if __name__ == "__main__":
    main()
