"""filtered_lrelu Pallas kernel v2 — channels on lanes.

The v1 kernel (filtered_lrelu_tpu.py) processes one (batch*channel) image per
program; with 54-278-wide images the vector lanes sit mostly idle and the
grid serializes ~8k tiny programs, losing to XLA.  v2 retiles the problem the
way the VPU wants it:

  x is pre-padded once in XLA (rows+cols) and viewed as [N, XH, XW, C];
  the grid is (N, C/CB, OH/R); each program DMAs a haloed row window
  [XR, XW, CB] into VMEM and runs the polyphase up-FIR -> lrelu -> down-FIR
  chain with channels occupying the 128 lanes.  All shifted-slice FMAs move
  along the row/column dims, which are sublane-cheap.

Supported: separable filters, up == down (the critically-sampled layers that
dominate the generator).  The NCHW<->NHWC transposes at the boundary are two
cheap relayouts vs. the 4 HBM round-trips of the XLA composition.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .filtered_lrelu_tpu import _flrelu_plan


def _fir_tables_range(tables):
    offs = [off for tab in tables for _, off in tab]
    return (min(offs), max(offs)) if offs else (0, 0)


def _apply_fir_axis(x, table, out_len: int, pad_lo: int, axis: int):
    acc = None
    for coeff, off in table:
        start = off + pad_lo
        seg = jax.lax.slice_in_dim(x, start, start + out_len, axis=axis)
        term = seg * coeff
        acc = term if acc is None else acc + term
    return acc


@functools.lru_cache(maxsize=None)
def _build_nhwc_call(in_h, in_w, channels, fu_key, fd_key, up, down, padding,
                     gain, slope, clamp, dtype_name, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    fu = None if fu_key is None else np.asarray(fu_key, np.float32)
    fd = None if fd_key is None else np.asarray(fd_key, np.float32)
    plan = _flrelu_plan(in_h, in_w, fu, fd, up, down, padding, gain, slope,
                        clamp)
    if plan is None or plan["dpu"] != 1:
        return None

    out_h, out_w = plan["out_h"], plan["out_w"]
    plane_h, plane_w = plan["plane_h"], plan["plane_w"]
    gain_f, slope_f, clamp_f = plan["gain"], plan["slope"], plan["clamp"]
    upf = plan["up"]

    lo_x, hi_x = _fir_tables_range(plan["up_tables_x"])
    lo_y, hi_y = _fir_tables_range(plan["up_tables_y"])
    pad_lo_x = max(0, -lo_x)
    pad_lo_y = max(0, -lo_y)

    base_max = max(b for _, _, b in plan["down_tables"])

    # Lane constraint: HBM DMAs need full 128-lane blocks, so channels are
    # always padded to a multiple of 128 by the wrapper.
    CB = 128

    def geometry(r):
        pr = r + base_max
        xr = pr + hi_y + pad_lo_y
        return pr, xr

    def vmem_need(r):
        # tw is recomputed per phase pair inside the kernel, so the live set
        # is xin + one t plane (x2 for the producer) + the xd accumulators +
        # the (double-buffered) out block.
        pr, xr = geometry(r)
        fp = 4
        xin = xr * (in_w + 16) * CB
        t_live = 2 * xr * plane_w * CB
        xd = upf * pr * out_w * CB
        out = 2 * r * out_w * CB
        return (xin + t_live + xd + out) * fp

    # Mosaic double-buffers the output block and keeps extra temporaries;
    # budget well under the 16M scoped limit.
    R = None
    for cand in (16, 8, 4, 2, 1):
        if cand <= out_h and vmem_need(cand) <= 7 * 1024 * 1024:
            R = cand
            break
    if R is None:
        return None

    n_row_blocks = -(-out_h // R)
    PR, XR = geometry(R)
    xh_needed = (n_row_blocks - 1) * R + XR
    pad_hi_x_needed = (plane_w - 1) + hi_x + pad_lo_x - (in_w - 1)
    xw_pad = in_w + pad_lo_x + max(0, pad_hi_x_needed)
    xw_pad = -(-xw_pad // 8) * 8  # HBM slice sublane alignment for the DMA
    pad_hi_y_needed = xh_needed - pad_lo_y - in_h
    xh_pad = in_h + pad_lo_y + max(0, pad_hi_y_needed)

    def kernel(x_hbm, o_ref, xin_ref, sem):
        n_idx = pl.program_id(0)
        cb_idx = pl.program_id(1)
        rb = pl.program_id(2)
        row0 = rb * R
        cb = xin_ref.shape[-1]
        if x_hbm.shape[-1] == cb:
            src = x_hbm.at[n_idx, pl.ds(row0, XR), :, :]
        else:
            src = x_hbm.at[n_idx, pl.ds(row0, XR), :,
                           pl.ds(cb_idx * cb, cb)]
        copy = pltpu.make_async_copy(src, xin_ref, sem)
        copy.start()
        copy.wait()
        xin = xin_ref[...].astype(jnp.float32)   # [XR, xw_pad, CB]

        # Per (py, px): W up-FIR (recomputed to keep VMEM low) -> row up-FIR
        # -> activation -> W down-FIR accumulated into xd[py].
        xd = []
        for py in range(upf):
            acc = None
            for px in range(upf):
                tw = _apply_fir_axis(xin, plan["up_tables_x"][px], plane_w,
                                     pad_lo_x, axis=1)
                t = _apply_fir_axis(tw, plan["up_tables_y"][py], PR,
                                    pad_lo_y, axis=0)
                t = t * gain_f
                t = jnp.where(t >= 0, t, t * slope_f)
                if clamp_f is not None:
                    t = jnp.clip(t, -clamp_f, clamp_f)
                for coeff, phase, base in plan["down_tables"]:
                    if phase != px:
                        continue
                    seg = jax.lax.slice_in_dim(t, base, base + out_w, axis=1)
                    term = seg * coeff
                    acc = term if acc is None else acc + term
            xd.append(acc)                        # [PR, out_w, CB]
        out = None
        for coeff, phase, base in plan["down_tables"]:
            seg = jax.lax.slice_in_dim(xd[phase], base, base + R, axis=0)
            term = seg * coeff
            out = term if out is None else out + term
        o_ref[0] = out.astype(o_ref.dtype)

    dtype = jnp.dtype(dtype_name)

    def call(x_pad):
        # x_pad: [N, xh_pad, xw_pad, C] with C padded to a CB multiple
        n, _, _, c = x_pad.shape
        assert c % CB == 0, (c, CB)
        cb = CB
        grid = (n, c // cb, n_row_blocks)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, R, out_w, cb),
                                   lambda i, j, r: (i, r, 0, j)),
            out_shape=jax.ShapeDtypeStruct(
                (n, n_row_blocks * R, out_w, c), dtype),
            scratch_shapes=[pltpu.VMEM((XR, xw_pad, cb), dtype),
                            pltpu.SemaphoreType.DMA],
            interpret=interpret,
        )(x_pad)

    meta = dict(pad_lo_y=pad_lo_y, pad_lo_x=pad_lo_x, xh_pad=xh_pad,
                xw_pad=xw_pad, out_h=out_h, out_w=out_w, CB=CB)
    return call, meta


def filtered_lrelu_pallas_nhwc(x, fu, fd, b, up, down, padding, gain, slope,
                               clamp, flip_filter, interpret: bool = False):
    """NCHW in/out wrapper; returns None when unsupported."""
    if flip_filter:
        return None
    if (fu is not None and np.asarray(fu).ndim != 1) or \
            (fd is not None and np.asarray(fd).ndim != 1):
        return None
    if down != up:
        return None
    n, c, in_h, in_w = x.shape
    fu_key = None if fu is None else \
        tuple(np.asarray(fu, np.float32).ravel().tolist())
    fd_key = None if fd is None else \
        tuple(np.asarray(fd, np.float32).ravel().tolist())
    built = _build_nhwc_call(in_h, in_w, int(c), fu_key, fd_key, int(up),
                             int(down), tuple(int(p) for p in padding),
                             float(gain), float(slope),
                             None if clamp is None else float(clamp),
                             x.dtype.name, interpret)
    if built is None:
        return None
    call, meta = built

    if b is not None:
        x = x + jnp.asarray(b, x.dtype)[None, :, None, None]
    x_nhwc = jnp.transpose(x, (0, 2, 3, 1))
    cb = meta["CB"]
    c_pad = (-(-c // cb)) * cb - c
    x_pad = jnp.pad(x_nhwc, ((0, 0),
                             (meta["pad_lo_y"],
                              meta["xh_pad"] - in_h - meta["pad_lo_y"]),
                             (meta["pad_lo_x"],
                              meta["xw_pad"] - in_w - meta["pad_lo_x"]),
                             (0, c_pad)))
    out = call(x_pad)
    out = out[:, :meta["out_h"], :, :c]
    return jnp.transpose(out, (0, 3, 1, 2))
