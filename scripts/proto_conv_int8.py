"""Prototype: fused int8 3x3 conv as 9 shifted matmuls, single layer.

Formulation (see docs/performance.md round 3):
  x [N, I, H, W] bf16 -> pad ch to I' (128-mult), spatial +1, W to WP'
  (32-mult) -> quantize int8 per-sample -> x_flat [N, I', (H+2)*WP'].
  Kernel grid (N, RB): DMA a [I', (rows+2)*WP'] window (128-aligned start),
  9 static-offset lane slices as matmul rhs, acc i32 in VMEM, dequant
  epilogue -> bf16 out [N, O, H*WP'] -> XLA reshape/slice to [N, O, H, W].

Measures vs the incumbent XLA bf16 conv at the big-bucket layer shapes.
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
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


def rup(x, m):
    return -(-x // m) * m


def make_kernel(ip, o, wp, rows, win_len, out_cols):
    def kernel(x_hbm, w_ref, s_ref, o_ref, xwin, sem):
        n = pl.program_id(0)
        rb = pl.program_id(1)
        start = rb * out_cols
        dma = pltpu.make_async_copy(
            x_hbm.at[n, :, pl.ds(start, win_len)], xwin, sem)
        dma.start()
        dma.wait()
        acc = jnp.zeros((o, out_cols), jnp.int32)
        for tap in range(9):
            dy, dx = divmod(tap, 3)
            off = dy * wp + dx
            rhs = xwin[:, off:off + out_cols]
            acc += jax.lax.dot_general(
                w_ref[tap], rhs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        o_ref[0] = (acc.astype(jnp.float32) *
                    s_ref[0, 0][:, None]).astype(jnp.bfloat16)
    return kernel


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def conv_int8(x_flat, w9, scale, ip, o, wp, rows, hpad):
    n = x_flat.shape[0]
    h_cols = hpad * wp  # valid output cols total (Hpad*WP')
    out_cols = rows * wp
    rb = h_cols // out_cols
    win_len = rup(out_cols + 2 * wp + 2, 128)
    kernel = make_kernel(ip, o, wp, rows, win_len, out_cols)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, o, h_cols), jnp.bfloat16),
        grid=(n, rb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((9, o, ip), lambda n_, r_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, o), lambda n_, r_: (n_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, o, out_cols), lambda n_, r_: (n_, 0, r_),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((ip, win_len), jnp.int8),
                        pltpu.SemaphoreType.DMA],
    )(x_flat, w9, scale[:, None, :])


def prep_x(x, ip, wp, rows):
    """bf16 [N, I, H, W] -> int8 flat [N, I', (Hpad+2)*WP'] + scales [N]."""
    n, i, h, w = x.shape
    hpad = rup(h, rows)
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(1, 2, 3))
    xscale = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) /
                            xscale[:, None, None, None]), -127, 127)
    xq = xq.astype(jnp.int8)
    xq = jnp.pad(xq, ((0, 0), (0, ip - i), (1, hpad - h + 1),
                      (1, wp - w - 1)))
    xq = xq.reshape(n, ip, (hpad + 2) * wp)
    # tail pad so the last DMA window read stays in bounds
    out_cols = rows * wp
    rb = hpad // rows
    win_len = rup(out_cols + 2 * wp + 2, 128)
    need = (rb - 1) * out_cols + win_len
    if need > xq.shape[2]:
        xq = jnp.pad(xq, ((0, 0), (0, 0), (0, need - xq.shape[2])))
    return xq, xscale


def prep_w(w, ip):
    """f32 [O, I, 3, 3] -> int8 [9, O, I'] + per-out-channel scales [O]."""
    o, i = w.shape[:2]
    wmax = jnp.max(jnp.abs(w), axis=(1, 2, 3))
    wscale = jnp.maximum(wmax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / wscale[:, None, None, None]), -127, 127)
    wq = wq.astype(jnp.int8)
    wq = jnp.pad(wq, ((0, 0), (0, ip - i), (0, 0), (0, 0)))
    wq = jnp.transpose(wq, (2, 3, 0, 1)).reshape(9, o, ip)
    return wq, wscale


_DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                 ("NCHW", "OIHW", "NCHW"))


@jax.jit
def conv_bf16(x, w):
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=_DN)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def conv_int8_full(x, w, wp, rows, ip):
    """Full pipeline: quantize + kernel + reshape/slice."""
    n, i, h, w_sp = x.shape
    o = w.shape[0]
    hpad = rup(h, rows)
    xq, xs = prep_x(x, ip, wp, rows)
    wq, ws = prep_w(w, ip)
    scale = xs[:, None] * ws[None, :]
    y = conv_int8(xq, wq, scale, ip, o, wp, rows, hpad)
    y = y.reshape(n, o, hpad, wp)[:, :, :h, :w_sp]
    return y


def run_layer(name, i, o, h, batch=16, rows=None):
    w_sp = h
    wp = rup(w_sp + 2, 32)
    ip = rup(i, 128)
    if rows is None:
        # target ~4-6 MB acc
        rows = max(4, (5 * 2 ** 20 // (o * 4 * wp)) // 4 * 4)
        while h % rows and rows > 4:
            rows -= 4
        budget_rows = rows
        rows = min(rup(h, 4), budget_rows)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, i, h, w_sp), jnp.bfloat16)
    w = jnp.asarray(rng.randn(o, i, 3, 3) / np.sqrt(i * 9), jnp.float32)

    t_bf = timeit(conv_bf16, x, w)
    y_ref = conv_bf16(x, w)
    try:
        t_i8 = timeit(conv_int8_full, x, w, wp, rows, ip)
        y_i8 = conv_int8_full(x, w, wp, rows, ip)
        err = np.asarray(y_i8, np.float32) - np.asarray(y_ref, np.float32)
        ref = np.asarray(y_ref, np.float32)
        psnr = 10 * np.log10((ref.max() - ref.min()) ** 2 /
                             max(np.mean(err ** 2), 1e-12))
    except Exception as e:
        print(f"{name}: int8 FAILED: {repr(e)[:300]}")
        return
    fl = 2 * i * o * 9 * h * w_sp * batch
    print(f"{name} ({i}->{o}@{h}^2 rows={rows} wp={wp}): "
          f"bf16 {t_bf*1e3:7.2f} ms ({fl/t_bf/1e12:5.1f} TF/s) | "
          f"int8 {t_i8*1e3:7.2f} ms ({fl/t_i8/1e12:5.1f} TOP/s) | "
          f"speedup {t_bf/t_i8:4.2f}x | psnr {psnr:5.1f} dB")


def main():
    print("backend:", jax.default_backend())
    run_layer("E7 ", 362, 512, 148)
    run_layer("E8 ", 512, 512, 84)
    run_layer("E10", 512, 512, 52)
    run_layer("E12", 512, 512, 36)
    run_layer("E6 ", 256, 362, 148)
    run_layer("E4 ", 128, 181, 276)
    run_layer("L11", 128, 91, 276)
    run_layer("E1 ", 64, 64, 276)


if __name__ == "__main__":
    main()
