"""Microbench: int8 matmul rate on the attached TPU chip.

Round-2 ruled out `lax.conv` int8 (0.87-1.0x vs bf16). This measures the
matmul formulation instead, at the [C_out, C_in] @ [C_in, H*Wp] shapes the
3x3-conv-as-9-taps decomposition produces, three ways:
  - XLA bf16 dot (the incumbent's compute primitive)
  - XLA int8 dot_general (preferred_element_type=int32)
  - Pallas int8 matmul kernel

Run on the TPU: python scripts/bench_int8_mm.py
"""

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


def mm_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def mm_kernel_acc(a_ref, b_ref, o_ref, acc_ref):
    # grid over N blocks; single K, accumulate taps — here plain per-block mm
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def pallas_mm(a, b, block_n=512):
    m, k = a.shape
    k2, n = b.shape
    assert k == k2 and n % block_n == 0
    return pl.pallas_call(
        mm_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        grid=(n // block_n,),
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, block_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(a, b)


# 9-tap accumulation shape: one fused kernel doing 9 [O,I]@[I,L] matmuls
# from a single VMEM-resident x copy with in-kernel (unaligned) lane slices.
def tap9_kernel(w_ref, x_ref, o_ref):
    # w_ref: [9, O, I] int8; x_ref: [I, L + 2*WP + 2] int8 (flat padded rows)
    acc = None
    wp = (x_ref.shape[1] - o_ref.shape[1] - 2) // 2
    for tap in range(9):
        dy, dx = divmod(tap, 3)
        off = dy * wp + dx
        rhs = x_ref[:, off:off + o_ref.shape[1]]
        d = jax.lax.dot_general(w_ref[tap], rhs, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        acc = d if acc is None else acc + d
    o_ref[:] = acc


def pallas_tap9(w9, x_flat, out_l, wp):
    o, i = w9.shape[1], w9.shape[2]
    return pl.pallas_call(
        tap9_kernel,
        out_shape=jax.ShapeDtypeStruct((o, out_l), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(w9, x_flat)


def main():
    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)
    # [O, I] @ [I, L]: L = H*Wp worth of columns (batch folded into L when
    # it fits; realistic per-layer L values for b16 come out huge, so grid
    # over blocks).
    shapes = [
        (512, 512, 2816),     # 52^2-ish single sample
        (512, 512, 45056),    # 52^2 x batch 16
        (256, 256, 90112),    # ~74^2 x 16
        (128, 128, 359424),   # 148^2 x 16
        (64, 64, 1244160),    # 276^2-ish x 16 (lane-starved class)
    ]
    for (o, i, l) in shapes:
        a8 = jnp.asarray(rng.randint(-127, 127, (o, i)), jnp.int8)
        b8 = jnp.asarray(rng.randint(-127, 127, (i, l)), jnp.int8)
        abf = a8.astype(jnp.bfloat16)
        bbf = b8.astype(jnp.bfloat16)
        flops = 2 * o * i * l

        t_bf = timeit(jax.jit(lambda a, b: jnp.dot(
            a, b, preferred_element_type=jnp.float32)), abf, bbf)
        t_i8 = timeit(jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)), a8, b8)
        try:
            block = 512
            while l % block:
                block //= 2
            t_pl = timeit(jax.jit(lambda a, b: pallas_mm(a, b, block)), a8, b8)
        except Exception as e:
            t_pl = float("nan")
            print("  pallas failed:", repr(e)[:200])
        print(f"[{o:4d},{i:4d}]@[{i:4d},{l:7d}]  "
              f"bf16 {t_bf*1e3:7.3f} ms {flops/t_bf/1e12:6.1f} TF/s | "
              f"xla-i8 {t_i8*1e3:7.3f} ms {flops/t_i8/1e12:6.1f} TOP/s | "
              f"pallas-i8 {t_pl*1e3:7.3f} ms {flops/t_pl/1e12:6.1f} TOP/s")

    # 9-tap fused kernel vs 9x XLA bf16 dots (the conv decomposition core)
    print("\n9-tap accumulation (52^2, C512, per-sample):")
    h, w = 52, 52
    wp = w + 2
    l = h * wp
    w9 = jnp.asarray(rng.randint(-127, 127, (9, 512, 512)), jnp.int8)
    x_flat = jnp.asarray(rng.randint(-127, 127, (512, l + 2 * wp + 2)),
                         jnp.int8)
    flops = 2 * 9 * 512 * 512 * l

    t9 = timeit(jax.jit(lambda a, b: pallas_tap9(a, b, l, wp)), w9, x_flat)
    print(f"  pallas 9-tap: {t9*1e3:.3f} ms  {flops/t9/1e12:.1f} TOP/s")

    w9bf = w9.astype(jnp.bfloat16)
    xbf = x_flat.astype(jnp.bfloat16)

    def xla9(w9, x):
        acc = 0
        for tap in range(9):
            dy, dx = divmod(tap, 3)
            off = dy * wp + dx
            acc += jnp.dot(w9[tap], jax.lax.dynamic_slice_in_dim(x, off, l, 1),
                           preferred_element_type=jnp.float32)
        return acc
    t9x = timeit(jax.jit(xla9), w9bf, xbf)
    print(f"  xla bf16 9-tap: {t9x*1e3:.3f} ms  {flops/t9x/1e12:.1f} TF/s")


if __name__ == "__main__":
    main()
