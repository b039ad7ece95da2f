"""Fused int8 3x3 convolution for the dense conv stack (Mosaic/MXU).

Why this exists: the alias-free generator's dense 3x3 convs are the second
largest device-time bucket (~52 ms of a 205 ms bf16 forward, ~160 TF/s —
near the bf16 MXU peak). The v5e MXU runs int8 at ~246 TOP/s measured
(1.7x bf16), but XLA's conv emitter does not exploit it (`lax.conv` int8
measured 0.87-1.0x in round 2), and a split matmul formulation drowns in
int32 HBM traffic. This kernel keeps the whole 9-tap accumulation in VMEM
and writes dequantized bf16, making the op compute-bound on the int8 MXU.

Reference analog: the CUDA ops exist purely for throughput
(models/networks/stylegan3/torch_utils/ops/*.cu); the reference's reduced
precision path is fp16 (CoModGAN/layers.py:40-42). int8-on-MXU is the
TPU-native equivalent.

Formulation ("conv as 9 shifted matmuls on flattened spatial"):
  * x [N, I, H, W] -> quantize per-sample int8 (dynamic max scale), pad
    channels to I' (128-mult), p-px spatial halo, W to WP' (8-mult),
    flatten rows -> x_flat [N, I', (Hp+2)*WP'].
  * For output position (h, w): out[:, h*WP'+w] = sum_{dy,dx}
    W[dy,dx] @ x_flat[:, (h+dy)*WP' + (w+dx)] — every tap's rhs is ONE
    contiguous column-slice of the flat buffer at static offset
    dy*WP' + dx. Junk columns (w >= W) are computed and sliced away.
  * Grid (N, RB) over row-blocks. An XLA-side overlapped tile gather
    stages [N, RB, I', rows*WP' + halo] windows that Mosaic's pipeline
    double-buffers into VMEM (a serial in-kernel DMA capped the taps at
    ~95 TOP/s; the same dots run ~296 TOP/s BlockSpec-fed). Taps run on
    the MXU accumulating int32 in VMEM, then the epilogue dequantizes:
    out = acc * scale[n,o] -> bf16.
  * scale [N, O] folds x_scale * w_scale (and optionally the modulated
    conv's demodulation coefficients — same shape).

Two kernel variants (A/B-measured on hardware, see docs/performance.md):
  'dots'   — 9 sequential [O,I']@[I',cols] dots accumulating in scratch.
  'im2col' — stage the 9 shifted slices into a [9*I', cols] scratch
             (sublane-aligned writes), then ONE [O,9*I']@[9*I',cols] dot.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3_int8", "conv3x3_int8_ste", "int8_routable",
           "int8_supported", "plan_blocks"]


def _rup(x: int, m: int) -> int:
    return -(-x // m) * m


_VMEM_BUDGET = 11 * 2 ** 20  # leave headroom under the 16M scoped limit


def plan_blocks(i_pad: int, o: int, h: int, wp: int, variant: str):
    """Choose (rows, hpad): row-block height and padded H.

    rows*wp must be 128-divisible so the out BlockSpec's lane-dim blocks
    are legal (a single block covering H is exempt); within that, maximize
    cols per MXU issue subject to the VMEM budget (double-buffered x and
    out blocks + int32 acc + Mosaic stack temps + weights).
    """
    import math
    r_align = 128 // math.gcd(wp, 128)
    w_bytes = 9 * o * i_pad
    best = None
    rows = r_align
    while True:
        cols = rows * wp
        win = _rup(cols + 2 * wp + 2, 128)
        use = (2 * i_pad * win                  # x block, double-buffered
               + o * cols * 4                   # int32 acc
               + 2 * o * cols * 2               # out block, double-buffered
               + o * cols * 4                   # Mosaic stack temps (dot
               + w_bytes)                       # result / f32 cast, ~acc-sized:
                                                # an E1-shaped kernel measured
                                                # 1.55x acc of stack overhead)
        if variant == "im2col":
            use += 9 * i_pad * cols             # staged rhs (int8)
        if use > _VMEM_BUDGET:
            break
        best = rows
        if rows >= h:
            break
        rows += r_align
    if best is None:
        return None
    # never block finer than needed: a single block covering H drops the
    # alignment constraint entirely (start is always 0)
    if best >= h:
        return h, h
    hpad = _rup(h, best)
    return best, hpad


def plan_wp(i_pad: int, o: int, h: int, w_needed: int, variant: str):
    """Choose (wp, rows, hpad): the padded width and row blocking.

    Smaller wp means fewer junk columns (at 36^2 the old 32-mult rule burnt
    40% of compute), but a finer wp coarsens r_align (rows must make
    rows*wp 128-divisible), which can overshoot VMEM for wide-O layers —
    so score every feasible wp granularity by total computed cells.
    """
    best = None
    tried = set()
    for m in (8, 16, 32, 64, 128):
        wp = _rup(w_needed, m)
        if wp in tried:
            continue
        tried.add(wp)
        plan = plan_blocks(i_pad, o, h, wp, variant)
        if plan is None:
            continue
        rows, hpad = plan
        # score by total computed cells (junk columns + padded rows),
        # breaking ties toward larger row blocks (fewer, fatter MXU issues)
        score = (hpad * wp, -rows)
        if best is None or score < best[0]:
            best = (score, wp, rows, hpad)
    return None if best is None else best[1:]


def _make_kernel(i_pad, o, wp, out_cols, variant):
    def kernel(x_ref, w_ref, s_ref, o_ref, acc, *im2col):
        xwin = x_ref[0, 0]
        if variant == "im2col":
            stage = im2col[0]
            for tap in range(9):
                dy, dx = divmod(tap, 3)
                off = dy * wp + dx
                stage[tap * i_pad:(tap + 1) * i_pad, :] = \
                    xwin[:, off:off + out_cols]
            acc[:] = jax.lax.dot_general(
                w_ref[0], stage[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        else:
            for tap in range(9):
                dy, dx = divmod(tap, 3)
                off = dy * wp + dx
                d = jax.lax.dot_general(
                    w_ref[tap], xwin[:, off:off + out_cols],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                if tap == 0:
                    acc[:] = d
                else:
                    acc[:] += d
        o_ref[0] = (acc[:].astype(jnp.float32) *
                    s_ref[0, 0][:, None]).astype(jnp.bfloat16)
    return kernel


@functools.partial(jax.jit,
                   static_argnums=(3, 4, 5, 6, 7, 8))
def _conv_int8_call(x_flat, w9, scale, i_pad, o, wp, rows, variant,
                    interpret):
    n = x_flat.shape[0]
    hpad_cols = x_flat.shape[2]  # includes halo tail; valid = hpad*wp
    out_cols = rows * wp
    win_len = _rup(out_cols + 2 * wp + 2, 128)
    rb = (hpad_cols - (win_len - out_cols)) // out_cols
    # Overlapped tile gather (XLA): window rb starts at rb*out_cols; the
    # ~(2*wp/out_cols) duplicated halo columns cost far less than the
    # per-step latency of a serial in-kernel DMA (measured: the same taps
    # run at ~296 vs ~95 TOP/s once Mosaic double-buffers the input block).
    xt = jnp.stack([
        jax.lax.slice_in_dim(x_flat, r * out_cols, r * out_cols + win_len,
                             axis=2)
        for r in range(rb)], axis=1)            # [N, RB, I', win]
    kernel = _make_kernel(i_pad, o, wp, out_cols, variant)
    scratch = [pltpu.VMEM((o, out_cols), jnp.int32)]
    if variant == "im2col":
        # [9, O, I'] -> [O, 9*I'] with (tap, i) ordering matching the
        # stage buffer's tap-major sublane layout
        w_in = jnp.transpose(w9, (1, 0, 2)).reshape(1, o, 9 * i_pad)
        w_spec = pl.BlockSpec((1, o, 9 * i_pad), lambda n_, r_: (0, 0, 0),
                              memory_space=pltpu.VMEM)
        scratch.append(pltpu.VMEM((9 * i_pad, out_cols), jnp.int8))
    else:
        w_in = w9
        w_spec = pl.BlockSpec((9, o, i_pad), lambda n_, r_: (0, 0, 0),
                              memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, o, rb * out_cols), jnp.bfloat16),
        grid=(n, rb),
        in_specs=[
            pl.BlockSpec((1, 1, i_pad, win_len),
                         lambda n_, r_: (n_, r_, 0, 0),
                         memory_space=pltpu.VMEM),
            w_spec,
            pl.BlockSpec((1, 1, o), lambda n_, r_: (n_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, o, out_cols), lambda n_, r_: (n_, 0, r_),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )(xt, w_in, scale[:, None, :])


def int8_supported(x_shape, w_shape) -> bool:
    """Routing gate: 3x3, groups=1, big enough to pay for quantization."""
    if len(w_shape) != 4 or w_shape[2] != 3 or w_shape[3] != 3:
        return False
    o, i = int(w_shape[0]), int(w_shape[1])
    if o < 32 or i < 32:
        return False
    h, w = int(x_shape[2]), int(x_shape[3])
    if h < 8 or w < 8 or h != w:
        return False
    return True


def conv3x3_int8(x, w, padding: int = 1, extra_scale=None,
                 variant: str = "dots",
                 interpret: bool = False) -> Optional[jax.Array]:
    """Quantized 3x3 conv: y = conv(x, w), NCHW, stride 1, symmetric pad.

    padding=1 is a 'same' conv; padding=2 the full conv the alias-free
    layers use (reference: networks_stylegan3.py conv with padding=k-1,
    output H+2 x W+2).

    Args:
      x: [N, I, H, W] float (bf16/f32). Quantized per-sample dynamically.
      w: [O, I, 3, 3] float. Quantized per-output-channel.
      padding: symmetric spatial padding (0..2).
      extra_scale: optional [N, O] factor folded into the dequant epilogue
        (e.g. the modulated conv's demodulation coefficients).
      variant: 'dots' | 'im2col' kernel inner loop (see module docstring).
    Returns bf16 [N, O, H+2p-2, W+2p-2], or None when unsupported.
    """
    if not int8_supported(x.shape, w.shape) or not 0 <= padding <= 2:
        return None
    n, i, h, w_sp = x.shape
    o = w.shape[0]
    p = int(padding)
    h_out = h + 2 * p - 2
    w_out = w_sp + 2 * p - 2
    if h_out < 4 or w_out < 4:
        return None
    i_pad = _rup(i, 128)
    o_pad = _rup(o, 32)
    plan = plan_wp(i_pad, o_pad, h_out, w_sp + 2 * p, variant)
    if plan is None:
        return None
    wp, rows, hpad = plan

    # --- quantize x per sample (dynamic scale; two passes, fused by XLA
    # into the producer where possible) ---
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=(1, 2, 3))
    x_scale = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / x_scale[:, None, None, None]),
                  -127, 127).astype(jnp.int8)
    # padded rows total = h_out + 2 = h + 2p (+ block-rounding tail)
    xq = jnp.pad(xq, ((0, 0), (0, i_pad - i), (p, hpad + 2 - h - p),
                      (p, wp - w_sp - p)))
    xq = xq.reshape(n, i_pad, (hpad + 2) * wp)
    out_cols = rows * wp
    win_len = _rup(out_cols + 2 * wp + 2, 128)
    need = (hpad // rows - 1) * out_cols + win_len
    if need > xq.shape[2]:
        xq = jnp.pad(xq, ((0, 0), (0, 0), (0, need - xq.shape[2])))
    else:
        xq = xq[:, :, :need]

    # --- quantize w per out-channel ---
    wf = w.astype(jnp.float32)
    wmax = jnp.max(jnp.abs(wf), axis=(1, 2, 3))
    w_scale = jnp.maximum(wmax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(wf / w_scale[:, None, None, None]),
                  -127, 127).astype(jnp.int8)
    wq = jnp.pad(wq, ((0, o_pad - o), (0, i_pad - i), (0, 0), (0, 0)))
    wq = jnp.transpose(wq, (2, 3, 0, 1)).reshape(9, o_pad, i_pad)

    scale = x_scale[:, None] * jnp.pad(w_scale, (0, o_pad - o))[None, :]
    if extra_scale is not None:
        scale = scale * jnp.pad(extra_scale.astype(jnp.float32),
                                ((0, 0), (0, o_pad - o)))
    y = _conv_int8_call(xq, wq, scale, i_pad, o_pad, wp, rows, variant,
                        interpret)
    y = y.reshape(n, o_pad, hpad, wp)[:, :o, :h_out, :w_out]
    return y


def int8_routable(x_shape, w_shape, padding, variant: str = "dots") -> bool:
    """Full static routing check (shape gates + VMEM plan feasibility)."""
    if not int8_supported(x_shape, w_shape):
        return False
    if not isinstance(padding, (int, np.integer)) or not 0 <= padding <= 2:
        return False
    h, w_sp = int(x_shape[2]), int(x_shape[3])
    p = int(padding)
    if h + 2 * p - 2 < 4 or w_sp + 2 * p - 2 < 4:
        return False
    i_pad = _rup(int(w_shape[1]), 128)
    o_pad = _rup(int(w_shape[0]), 32)
    return plan_wp(i_pad, o_pad, h + 2 * p - 2, w_sp + 2 * p,
                   variant) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def conv3x3_int8_ste(x, w, padding, variant, interpret=False):
    """int8 forward with a straight-through f32-conv backward (QAT-style):
    gradients ignore the quantization rounding, flowing through the exact
    conv adjoint instead — so the op is safe inside `jax.grad` (R1, G/D
    losses) while inference takes the MXU int8 path. Callers must gate on
    `int8_routable` first."""
    out = conv3x3_int8(x, w, padding=padding, variant=variant,
                       interpret=interpret)
    assert out is not None, "conv3x3_int8_ste called on unroutable shape"
    return out


def _xla_conv_f32(x, w, p):
    from jax import lax
    dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                    ("NCHW", "OIHW", "NCHW"))
    return lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1),
        ((p, p), (p, p)), dimension_numbers=dn)


def _ste_fwd(x, w, padding, variant, interpret=False):
    return conv3x3_int8_ste(x, w, padding, variant, interpret), (x, w)


def _ste_bwd(padding, variant, interpret, res, g):
    x, w = res
    _, vjp = jax.vjp(lambda a, b: _xla_conv_f32(a, b, int(padding)), x, w)
    dx, dw = vjp(g.astype(jnp.float32))
    return dx, dw


conv3x3_int8_ste.defvjp(_ste_fwd, _ste_bwd)
