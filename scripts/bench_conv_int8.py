"""Per-layer A/B of the production int8 conv vs the incumbent XLA path,
at the flagship generator's conv worklist shapes (padding=2, batch 16).

Run on the TPU: python scripts/bench_conv_int8.py [dots|im2col]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from afcm_tpu.ops import modulated_conv as mc
from afcm_tpu.ops.pallas.conv_int8 import conv3x3_int8, int8_routable

LAYERS = [  # (name, I, O, H)
    ("E1 ", 64, 64, 276), ("E2 ", 64, 91, 276), ("E3 ", 91, 128, 276),
    ("E4 ", 128, 181, 276), ("E5 ", 181, 256, 148), ("E6 ", 256, 362, 148),
    ("E7 ", 362, 512, 148), ("E8 ", 512, 512, 84), ("E10", 512, 512, 52),
    ("E12", 512, 512, 36),
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
    variant = sys.argv[1] if len(sys.argv) > 1 else "dots"
    print("backend:", jax.default_backend(), "variant:", variant)
    rng = np.random.RandomState(0)
    batch = 16
    for name, i, o, h in LAYERS:
        x = jnp.asarray(rng.randn(batch, i, h, h), jnp.bfloat16)
        w = jnp.asarray(rng.randn(o, i, 3, 3) / np.sqrt(9 * i), jnp.float32)
        if not int8_routable(x.shape, w.shape, 2, variant):
            print(f"{name}: not routable")
            continue
        f_xla = jax.jit(lambda x, w: mc.conv2d(x, w, padding=2))
        f_i8 = jax.jit(lambda x, w: conv3x3_int8(x, w, padding=2,
                                                 variant=variant))
        t_xla = timeit(f_xla, x, w)
        t_i8 = timeit(f_i8, x, w)
        y1 = np.asarray(f_xla(x, w), np.float32)
        y2 = np.asarray(f_i8(x, w), np.float32)
        err = np.mean((y1 - y2) ** 2)
        psnr = 10 * np.log10((y1.max() - y1.min()) ** 2 / max(err, 1e-12))
        fl = 2 * i * o * 9 * (h + 2) ** 2 * batch
        print(f"{name} {i:3d}->{o:3d}@{h}^2: xla {t_xla*1e3:7.2f} ms "
              f"({fl/t_xla/1e12:5.1f} TF/s) | int8 {t_i8*1e3:7.2f} ms "
              f"({fl/t_i8/1e12:5.1f} TOP/s) | {t_xla/t_i8:4.2f}x | "
              f"{psnr:5.1f} dB")


if __name__ == "__main__":
    main()
