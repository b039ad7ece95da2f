"""Microbench v2: int8 vs bf16 matmul rate with many matmuls per dispatch
(the axon tunnel costs ~0.65-1.2 ms/call, so single-op timings are
latency-bound; here each jit call does K independent matmuls over distinct
data and we divide).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    np.asarray(jax.device_get(jnp.sum(jnp.asarray(x, jnp.float32))))


def timeit(fn, *args, iters=10):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / iters


def stacked_mm_kernel(a_ref, b_ref, o_ref):
    # a: [O, I], b: [1, I, L_blk] (grid over stack+L), o: [1, O, L_blk]
    o_ref[0] = jax.lax.dot_general(
        a_ref[:], b_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def pallas_stacked(a, bstack, block_n):
    k, i, l = bstack.shape
    o = a.shape[0]
    return pl.pallas_call(
        stacked_mm_kernel,
        out_shape=jax.ShapeDtypeStruct((k, o, l), jnp.int32),
        grid=(k, l // block_n),
        in_specs=[
            pl.BlockSpec((o, i), lambda s, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, i, block_n), lambda s, j: (s, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, o, block_n), lambda s, j: (s, 0, j),
                               memory_space=pltpu.VMEM),
    )(a, bstack)


def main():
    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)
    # (O, I, L, K): K matmuls of [O,I]@[I,L] per dispatch
    shapes = [
        (512, 512, 2816, 64),
        (512, 512, 11264, 16),
        (256, 256, 5632, 64),
        (128, 128, 22528, 64),
    ]
    for (o, i, l, k) in shapes:
        a8 = jnp.asarray(rng.randint(-127, 127, (o, i)), jnp.int8)
        b8 = jnp.asarray(rng.randint(-127, 127, (k, i, l)), jnp.int8)
        abf = a8.astype(jnp.bfloat16)
        bbf = b8.astype(jnp.bfloat16)
        flops = 2 * o * i * l * k

        def xla_stack(a, bs, pet):
            return jax.lax.dot_general(
                bs, a, (((1,), (1,)), ((), ())), preferred_element_type=pet)

        t_bf = timeit(jax.jit(lambda a, b: xla_stack(a, b, jnp.float32)),
                      abf, bbf)
        t_i8 = timeit(jax.jit(lambda a, b: xla_stack(a, b, jnp.int32)),
                      a8, b8)
        block = 2816 if l % 2816 == 0 else l
        t_pl = timeit(jax.jit(lambda a, b: pallas_stacked(a, b, block)),
                      a8, b8)
        print(f"[{o:4d},{i:4d}]@[{i:4d},{l:6d}] x{k:3d}  "
              f"bf16 {t_bf*1e3:7.2f} ms {flops/t_bf/1e12:6.1f} TF/s | "
              f"xla-i8 {t_i8*1e3:7.2f} ms {flops/t_i8/1e12:6.1f} TOP/s | "
              f"pallas-i8 {t_pl*1e3:7.2f} ms {flops/t_pl/1e12:6.1f} TOP/s")


if __name__ == "__main__":
    main()
