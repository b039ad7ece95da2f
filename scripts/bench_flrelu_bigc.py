"""Per-layer A/B: filtered_lrelu XLA composition vs the (chunked-H) MXU
kernel at the C>=128 layer shapes — the 80 ms bucket round 2 could not
route. Run on TPU: python scripts/bench_flrelu_bigc.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from afcm_tpu.ops.filter_design import design_lowpass_filter
from afcm_tpu.ops.filtered_lrelu import filtered_lrelu
from afcm_tpu.ops.pallas.filtered_lrelu_mxu import filtered_lrelu_mxu

LAYERS = [  # (name, C, size, up, down)
    ("C128@276", 128, 276, 2, 2),
    ("C181@276", 181, 276, 2, 2),
    ("C256@148", 256, 148, 2, 2),
    ("C362@148", 362, 148, 2, 2),
    ("C512@84 ", 512, 84, 2, 2),
    ("C512@52 ", 512, 52, 2, 2),
]


from afcm_tpu.utils.profiling import host_sync as sync  # noqa: E402


def timeit(fn, *args, iters=30):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / iters


def main():
    ms_target = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    print("backend:", jax.default_backend(), "ms_target:", ms_target)
    rng = np.random.RandomState(0)
    batch = 16
    for name, c, size, up, down in LAYERS:
        fu = design_lowpass_filter(6 * up, cutoff=size / 4, width=size / 2,
                                   fs=size * up)
        fd = design_lowpass_filter(6 * down, cutoff=size / 4, width=size / 2,
                                   fs=size * up)
        pad = (9, 8, 9, 8) if up == 2 else (-6, -9, -6, -9)
        x = jnp.asarray(rng.randn(batch, c, size, size), jnp.bfloat16)
        b = jnp.asarray(rng.randn(c), jnp.bfloat16)
        kw = dict(up=up, down=down, padding=pad, gain=float(np.sqrt(2)),
                  slope=0.2, clamp=256.0)
        f_xla = jax.jit(lambda x, b: filtered_lrelu(
            x, fu=fu, fd=fd, b=b, impl="xla", **kw))
        f_mxu = jax.jit(lambda x, b: filtered_lrelu_mxu(
            x, fu, fd, b, up, down, pad, float(np.sqrt(2)), 0.2, 256.0,
            False, ms_target=ms_target))
        probe = f_mxu(x, b)
        if probe is None:
            print(f"{name}: kernel unsupported")
            continue
        t_xla = timeit(f_xla, x, b)
        t_mxu = timeit(f_mxu, x, b)
        y1 = np.asarray(f_xla(x, b), np.float32)
        y2 = np.asarray(f_mxu(x, b), np.float32)
        err = np.mean((y1 - y2) ** 2)
        psnr = 10 * np.log10((y1.max() - y1.min()) ** 2 / max(err, 1e-12))
        print(f"{name}: xla {t_xla*1e3:7.2f} ms | mxu {t_mxu*1e3:7.2f} ms | "
              f"{t_xla/t_mxu:4.2f}x | {psnr:5.1f} dB")


if __name__ == "__main__":
    main()
