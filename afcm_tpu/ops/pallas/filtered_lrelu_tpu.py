"""Fused Pallas TPU kernel for filtered_lrelu (separable polyphase form).

The op is bias -> zero-stuff up-FIR -> lrelu(gain, clamp) -> down-FIR ->
decimate (reference CUDA mega-kernel: torch_utils/ops/filtered_lrelu.cu).
The XLA composition materializes the up-rate intermediate (4x the pixels) in
HBM between the four conv passes; this kernel keeps the whole chain in VMEM
per (batch*channel) image.

Polyphase formulation (all tables static, built in numpy at trace time):
the zero-stuffed up-FIR output t decomposes into ``up`` phase planes per
dimension, each a small FIR over x (no strided stores); the leaky ReLU is
elementwise on the planes; and because every supported layer has
``down % up == 0``, each down-FIR tap reads a statically-known phase, so the
down stage is per-phase strided FIRs summed.

1-D index math (flip_filter=False, i.e. true convolution):
  t[i]   = sum_m fu[m] * xs[i - m + (ntu - 1 - px0)]   (xs = zero-stuffed x)
  out[o] = sum_m fd[m] * t2[o*down - m + (ntd - 1)]

Supported: separable (or None) filters, any padding, ``down % up == 0``
(every critically-sampled and downsampling layer of the AFCM generator — 19
of its 29 alias-free layers).  Upsampling layers fall back to the XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _phase_tables(taps: np.ndarray, up: int, shift: int):
    """Tables for t[p + up*i] = sum coeff * x[i + off]:
    t[u] = sum_k taps[k] * xs[u - k + shift], xs zero-stuffed by `up`."""
    tables = []
    for p in range(up):
        entries = []
        for k in range(len(taps)):
            num = p - k + shift
            if num % up != 0:
                continue
            entries.append((float(taps[k]), num // up))
        tables.append(entries)
    return tables


def _flrelu_plan(in_h: int, in_w: int, fu, fd, up: int, down: int,
                 padding: Tuple[int, int, int, int], gain: float,
                 slope: float, clamp: Optional[float]):
    if down % up != 0:
        return None
    px0, px1, py0, py1 = padding
    fu_t = np.ones(1, np.float32) if fu is None else np.asarray(fu, np.float32)
    fd_t = np.ones(1, np.float32) if fd is None else np.asarray(fd, np.float32)
    if fu_t.ndim != 1 or fd_t.ndim != 1:
        return None

    fu_dim = fu_t * up  # upfirdn gain up^2 -> up per separable pass
    ntu, ntd = len(fu_t), len(fd_t)

    tmp_w = in_w * up + px0 + px1 - (ntu - 1)
    tmp_h = in_h * up + py0 + py1 - (ntu - 1)
    out_w = (tmp_w - (ntd - 1) + (down - 1)) // down
    out_h = (tmp_h - (ntd - 1) + (down - 1)) // down
    if min(tmp_w, tmp_h, out_w, out_h) <= 0:
        return None

    up_tables_x = _phase_tables(fu_dim, up, ntu - 1 - px0)
    up_tables_y = _phase_tables(fu_dim, up, ntu - 1 - py0)

    down_tables = []
    for k in range(ntd):
        t_const = (ntd - 1) - k
        down_tables.append((float(fd_t[k]), t_const % up, t_const // up))

    dpu = down // up
    max_base = max(b for _, _, b in down_tables)
    plane_w = (out_w - 1) * dpu + max_base + 1
    plane_h = (out_h - 1) * dpu + max_base + 1

    return dict(up_tables_x=up_tables_x, up_tables_y=up_tables_y,
                down_tables=down_tables, up=up, down=down, dpu=dpu,
                in_h=in_h, in_w=in_w, out_h=out_h, out_w=out_w,
                plane_h=plane_h, plane_w=plane_w,
                gain=float(gain), slope=float(slope),
                clamp=None if clamp is None else float(clamp))


def _apply_fir(x, table, out_len: int, pad_lo: int, axis: int):
    """y[.., i, ..] = sum coeff * x[.., i + off + pad_lo, ..] along `axis`;
    the caller guarantees the padded x covers every access."""
    acc = None
    for coeff, off in table:
        start = off + pad_lo
        seg = jax.lax.slice_in_dim(x, start, start + out_len, axis=axis)
        term = seg * coeff
        acc = term if acc is None else acc + term
    if acc is None:
        shape = list(x.shape)
        shape[axis] = out_len
        acc = jnp.zeros(tuple(shape), x.dtype)
    return acc


def _make_kernel(plan):
    up = plan["up"]
    dpu = plan["dpu"]
    in_h, in_w = plan["in_h"], plan["in_w"]
    out_h, out_w = plan["out_h"], plan["out_w"]
    plane_h, plane_w = plan["plane_h"], plan["plane_w"]
    gain, slope, clamp = plan["gain"], plan["slope"], plan["clamp"]

    def table_range(tables):
        offs = [off for tab in tables for _, off in tab]
        return (min(offs), max(offs)) if offs else (0, 0)

    lo_x, hi_x = table_range(plan["up_tables_x"])
    lo_y, hi_y = table_range(plan["up_tables_y"])
    pad_lo_x = max(0, -lo_x)
    pad_hi_x = max(0, plane_w - 1 + hi_x - (in_w - 1))
    pad_lo_y = max(0, -lo_y)
    pad_hi_y = max(0, plane_h - 1 + hi_y - (in_h - 1))
    xpad_h = in_h + pad_lo_y + pad_hi_y
    xpad_w = in_w + pad_lo_x + pad_hi_x

    def _down_pass(planes, tables, axis: int, out_len: int):
        """Separable down-FIR along `axis` over per-phase planes."""
        acc = None
        for coeff, phase, base in tables:
            seg = jax.lax.slice_in_dim(planes[phase], base,
                                       base + (out_len - 1) * dpu + 1,
                                       stride=dpu, axis=axis)
            term = seg * coeff
            acc = term if acc is None else acc + term
        return acc

    def kernel(x_ref, o_ref, xpad_ref):
        # bias is pre-added outside the kernel (it fuses into the producing
        # conv); the kernel fuses up-FIR + lrelu + down-FIR.
        x = x_ref[0].astype(jnp.float32)

        xpad_ref[...] = jnp.zeros((xpad_h, xpad_w), jnp.float32)
        xpad_ref[pad_lo_y:pad_lo_y + in_h, pad_lo_x:pad_lo_x + in_w] = x
        xpad = xpad_ref[...]

        # x-direction up-FIR phase planes: tx[px] is [xpad_h, plane_w].
        tx = [_apply_fir(xpad, plan["up_tables_x"][px], plane_w, pad_lo_x,
                         axis=1) for px in range(up)]

        # y-direction pass + activation -> t2[py][px] [plane_h, plane_w];
        # then x-direction down immediately (separable): xd[py] planes.
        xd = []
        for py in range(up):
            row = []
            for px in range(up):
                t = _apply_fir(tx[px], plan["up_tables_y"][py], plane_h,
                               pad_lo_y, axis=0)
                t = t * gain
                t = jnp.where(t >= 0, t, t * slope)
                if clamp is not None:
                    t = jnp.clip(t, -clamp, clamp)
                row.append(t)
            xd.append(_down_pass(row, plan["down_tables"], axis=1,
                                 out_len=out_w))

        out = _down_pass(xd, plan["down_tables"], axis=0, out_len=out_h)
        o_ref[0] = out.astype(o_ref.dtype)

    return kernel, (xpad_h, xpad_w)


@functools.lru_cache(maxsize=None)
def _build_call(in_h, in_w, fu_key, fd_key, up, down, padding, gain, slope,
                clamp, dtype_name, interpret):
    import jax.experimental.pallas as pl

    fu = None if fu_key is None else np.asarray(fu_key, np.float32)
    fd = None if fd_key is None else np.asarray(fd_key, np.float32)
    plan = _flrelu_plan(in_h, in_w, fu, fd, up, down, padding, gain, slope,
                        clamp)
    if plan is None:
        return None
    kernel, (xpad_h, xpad_w) = _make_kernel(plan)
    out_h, out_w = plan["out_h"], plan["out_w"]
    dtype = jnp.dtype(dtype_name)

    from jax.experimental.pallas import tpu as pltpu

    def call(x2):
        nc = x2.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(nc,),
            in_specs=[
                pl.BlockSpec((1, in_h, in_w), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, out_h, out_w), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((nc, out_h, out_w), dtype),
            scratch_shapes=[pltpu.VMEM((xpad_h, xpad_w), jnp.float32)],
            interpret=interpret,
        )(x2)

    return jax.jit(call)


def filtered_lrelu_pallas(x, fu, fd, b, up, down, padding, gain, slope, clamp,
                          flip_filter, interpret: bool = False):
    """Returns the fused result, or None when the config is unsupported."""
    if flip_filter:
        return None
    if (fu is not None and np.asarray(fu).ndim != 1) or \
            (fd is not None and np.asarray(fd).ndim != 1):
        return None
    # Mosaic only lowers stride-1 vector slices; the dpu > 1 down stage needs
    # strided extracts, so compiled mode covers up == down only (the
    # critically-sampled majority). Interpret mode exercises the general math.
    if not interpret and down > up:
        return None
    n, c, in_h, in_w = x.shape
    fu_key = None if fu is None else \
        tuple(np.asarray(fu, np.float32).ravel().tolist())
    fd_key = None if fd is None else \
        tuple(np.asarray(fd, np.float32).ravel().tolist())

    call = _build_call(in_h, in_w, fu_key, fd_key, int(up), int(down),
                       tuple(int(p) for p in padding), float(gain),
                       float(slope), None if clamp is None else float(clamp),
                       x.dtype.name, interpret)
    if call is None:
        return None

    if b is not None:
        x = x + jnp.asarray(b, x.dtype)[None, :, None, None]
    x2 = x.reshape(n * c, in_h, in_w)
    out = call(x2)
    return out.reshape(n, c, out.shape[1], out.shape[2])
