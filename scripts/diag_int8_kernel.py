"""Isolate the int8 conv kernel bottleneck: aligned dots vs unaligned
tap-slice relayouts, at the E7 step geometry ([512,384]@[384,1920] x9).
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


def sync(x):
    np.asarray(jax.device_get(jnp.sum(jnp.asarray(x, jnp.float32))))


def timeit(fn, *args, iters=30):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / iters


O, I, COLS, WP, STEPS = 512, 384, 1920, 160, 208
WIN = COLS + 2 * WP + 2
WINP = -(-WIN // 128) * 128


def make(mode):
    """mode: 'aligned' (9 dots, offset 0), 'slices' (9 unaligned slices,
    1 dot each on the pre-sliced? no — dot included), 'sliceonly'
    (9 unaligned slices + cheap reduce, no dots), 'dot1' (single dot)."""
    def kernel(w_ref, x_ref, o_ref, acc):
        taps = 9 if mode != "dot1" else 1
        for tap in range(taps):
            dy, dx = divmod(tap, 3)
            off = (dy * WP + dx) if mode in ("slices", "sliceonly") else 0
            rhs = x_ref[0, :, off:off + COLS]
            if mode == "sliceonly":
                d = rhs.astype(jnp.int32)[:O] if I >= O else \
                    jnp.pad(rhs.astype(jnp.int32), ((0, O - I), (0, 0)))
            else:
                d = jax.lax.dot_general(
                    w_ref[tap], rhs, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            if tap == 0:
                acc[:] = d
            else:
                acc[:] += d
        o_ref[0] = acc[:].astype(jnp.bfloat16)

    @jax.jit
    def f(w9, x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((STEPS, O, COLS), jnp.bfloat16),
            grid=(STEPS,),
            in_specs=[
                pl.BlockSpec((9, O, I), lambda s: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, I, WINP), lambda s: (s, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, O, COLS), lambda s: (s, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((O, COLS), jnp.int32)],
            interpret=False,
        )(w9, x)
    return f


def kern2(w_ref, x_ref, o_ref, acc):
    pass


def main():
    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)
    w9 = jnp.asarray(rng.randint(-127, 127, (9, O, I)), jnp.int8)
    # x as [STEPS, I, WINP] so each grid step gets its own aligned block
    x = jnp.asarray(rng.randint(-127, 127, (STEPS, I, WINP)), jnp.int8)
    flops9 = 2 * O * I * COLS * 9 * STEPS
    for mode in ("dot1", "aligned", "slices", "sliceonly"):
        t = timeit(make(mode), w9, x)
        fl = flops9 / (9 if mode == "dot1" else 1)
        rate = fl / t / 1e12
        print(f"{mode:9s}: {t*1e3:7.2f} ms  "
              f"({rate:6.1f} TOP/s equivalent)"
              + ("  [no dots: pure slice+acc cost]" if mode == "sliceonly"
                 else ""))


if __name__ == "__main__":
    main()
