"""filtered_lrelu Pallas kernel — fused block-banded MXU chain (v4).

Replaces the reference CUDA mega-kernel
(reference: torch_utils/ops/filtered_lrelu.cu:16-1284) with the formulation
the TPU wants. Round-1 findings (docs/performance.md): every shift/slice
formulation of the FIR loses to relayout cost on the VPU, while expressing a
FIR pass as a matmul against a static banded tap matrix engages the
otherwise-idle MXU. The fused chain

    up-FIR (W) -> up-FIR (H) -> gain/lrelu/clamp -> down-FIR (H) -> down-FIR (W)

runs as per-tile matmuls with the 2x-rate intermediate living only in VMEM —
the HBM round-trips of the XLA composition (the dominant forward cost:
2x-rate buffers at 569-619^2) disappear entirely.

v4 structure (v3 — one small dot per channel per stage — ran at ~4% MXU and
lost to XLA; kept here as the lesson):

  * Grid (n, channel-block, w-tile). Each program holds the FULL padded
    height, so the per-channel W-axis matmuls have fat row dims
    ([Hx, wxw] @ [wxw, ms]).
  * The up-FIR results land in an A scratch laid out [Hx, cb*ms]: channel c
    occupies lane slot [c*ms, (c+1)*ms). The H-axis passes then run as ONE
    matmul per h-tile covering all channels ([ms, wxh] @ [wxh, cb*ms]) — the
    MXU's favourite shape.
  * Tile geometry is constrained so every in-kernel slice offset is
    sublane-aligned for bf16 (h-stride, h-window, out-tile all multiples of
    16) and every lane slot is a 128 multiple (ms padded to the lane target
    with zero filter columns — exact, since zero taps contribute nothing).
  * Interior tiles share their local banded matrices (FIR shift invariance);
    boundary tiles are made interior by zero-extending x (exact: out-of-range
    taps read zeros by definition).
  * Only the W axis is pre-tiled (overlapped gather in XLA, whose autodiff
    transpose supplies the backward overlap-add); the H axis is sliced
    in-kernel from the A scratch at aligned offsets.

Backward = the transposed chain with a recomputed lrelu/clamp mask — the
reference's own structure (backward is another filtered_lrelu with swapped
filters, reference filtered_lrelu.py:238-268) without the CUDA sign tensor.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..upfirdn2d import _banded_matrix

_VMEM_BUDGET = 7 * 1024 * 1024
_ALIGN = 16          # sublane alignment that is layout-free for f32 and bf16


def _chain_axis_plan(fu, fd, up, down, p0, p1, in_len, ms_target, flip,
                     align):
    """Tiling plan for one separable axis of the full chain: up-FIR with taps
    ``fu`` (per-axis gain ``up``; up^2 total across both axes, matching
    reference upfirdn2d gain=up**2), then down-FIR with taps ``fd`` (gain 1).

    Returns dict with the local matrices shared by every tile:
      mu [wx, msl]  — x window -> (lane-padded) mid window (up-FIR)
      md [msl, bo]  — (lane-padded) mid window -> out tile (down-FIR)
    plus geometry: bo/ms/msl/n_t/wx/s and the x zero-extension pad_lo/pad_hi
    that makes window t equal x_use[t*s : t*s + wx].
    """
    fu = np.asarray(fu, np.float32)
    fd = np.asarray(fd, np.float32)
    ntu, ntd = len(fu), len(fd)
    mid_len = in_len * up + p0 + p1 - (ntu - 1)
    out_len = (mid_len - (ntd - 1) + down - 1) // down
    if out_len <= 0 or mid_len <= 0:
        return None

    # Largest aligned output tile whose mid window fits the lane target:
    # bo % align == 0 and s = bo*down/up integral and % align == 0.
    bo = None
    for cand in range((ms_target - ntd) // down + 1, 0, -1):
        if cand % align or (cand * down) % up:
            continue
        if ((cand * down) // up) % align:
            continue
        bo = cand
        break
    if bo is None:
        return None
    if bo > out_len:
        # keep alignment; a single padded tile covers the axis
        pass
    ms = (bo - 1) * down + ntd
    msl = -(-ms // 128) * 128 if ms > 8 else ms     # lane-pad the mid window
    n_t = -(-out_len // bo)
    s = bo * down // up

    fu_key = tuple((fu * up).tolist())
    E = (ms + ntu) // up + ntu + (abs(p0) + abs(min(0, p1))) // up + 4
    E = -(-E // align) * align
    in_ext = in_len + 2 * E
    need_mid = up * E + (n_t - 1) * bo * down + ms
    p1_ext = need_mid - (in_ext * up + p0) + (ntu - 1)
    mu_full = np.asarray(_banded_matrix(fu_key, up, 1, p0, p1_ext, in_ext,
                                        flip))
    if mu_full.shape[1] < need_mid:
        return None

    r_lo, r_hi = [], []
    for t in range(n_t):
        c0 = up * E + t * bo * down
        nz = np.nonzero(np.any(mu_full[:, c0:c0 + ms] != 0.0, axis=1))[0]
        if len(nz) == 0:
            return None
        r_lo.append(int(nz[0]))
        r_hi.append(int(nz[-1]))
    # Windows on an aligned stride grid covering the nonzeros: place base at
    # an aligned offset at or below the first nonzero row.
    base = (r_lo[0] // align) * align
    wx = max(h - (base + t * s) for t, h in enumerate(r_hi)) + 1
    wx = -(-wx // align) * align
    if any(l < base + t * s for t, l in enumerate(r_lo)):
        return None
    mu = np.zeros((wx, msl), np.float32)
    mu[:, :ms] = mu_full[base:base + wx, up * E:up * E + ms]
    for t in range(1, n_t):
        c0 = up * E + t * bo * down
        blk = mu_full[base + t * s:base + t * s + wx, c0:c0 + ms]
        if blk.shape != (wx, ms) or not np.array_equal(blk, mu[:, :ms]):
            return None

    md_core = np.asarray(_banded_matrix(tuple(fd.tolist()), 1, down, 0, 0,
                                        ms, flip))
    if md_core.shape != (ms, bo):
        return None
    md = np.zeros((msl, bo), np.float32)
    md[:ms] = md_core

    pad_lo = E - base                       # may be negative (crop)
    pad_hi = (base + (n_t - 1) * s + wx) - (E + in_len)
    return dict(bo=bo, ms=ms, msl=msl, n_t=n_t, wx=wx, s=s, pad_lo=pad_lo,
                pad_hi=pad_hi, mu=mu, md=md, out_len=out_len)


_H_CHUNK = 1024     # lane chunk for the H-pass dots (bounds the f32 temps)


def _pick_cb(c, hx, wxw, msl, n_th, boh, bow, bytes_per):
    """Largest channel block whose working set fits the VMEM budget.

    The budget (7 MB) is set against Mosaic's 16 MB scoped-VMEM limit with
    enough headroom that the backward kernel's extra f32 dA accumulator
    ([hx, cb*msl], up to ~2.5 MB at the routed configs) also fits — fwd and
    bwd share cb so the wrapper's channel padding stays consistent.

    The H-pass dot temps are lane-chunked to _H_CHUNK (round 3): before,
    the transient [mshl, cb*msl] f32 b/l values were the LARGEST term in
    the working set and capped cb at the C>=128 layers; chunking bounds
    them at [mshl, _H_CHUNK] regardless of cb."""
    hout = n_th * boh
    for cb in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        if cb > c and cb != 1:
            continue
        lanes = cb * msl
        need = (cb * (2 * hx * wxw + 2 * hout * bow) +      # x + out blocks
                hx * cb * msl +                              # A scratch
                hout * cb * msl +                            # CC scratch
                2 * 128 * min(lanes, _H_CHUNK) * (4 // bytes_per)  # b/l temps
                ) * bytes_per
        if need <= _VMEM_BUDGET:
            return cb
    return 1


@functools.lru_cache(maxsize=None)
def _build_mxu_call(in_h, in_w, c, fu_key, fd_key, up, down, padding, gain,
                    slope, clamp, flip, dtype_name, ms_target, interpret,
                    element_gather=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    fu = np.asarray(fu_key, np.float32)
    fd = np.asarray(fd_key, np.float32)
    px0, px1, py0, py1 = padding
    plan_h = _chain_axis_plan(fu, fd, up, down, py0, py1, in_h, ms_target,
                              flip, _ALIGN)
    plan_w = _chain_axis_plan(fu, fd, up, down, px0, px1, in_w, ms_target,
                              flip, _ALIGN)
    if plan_h is None or plan_w is None:
        return None

    boh, bow = plan_h["bo"], plan_w["bo"]
    mshl, mswl = plan_h["msl"], plan_w["msl"]
    wxh, wxw = plan_h["wx"], plan_w["wx"]
    n_th, n_tw = plan_h["n_t"], plan_w["n_t"]
    sh = plan_h["s"]
    hx = (n_th - 1) * sh + wxh              # full padded height per program
    hout = n_th * boh

    cdt = jnp.dtype(dtype_name)
    f32 = jnp.float32
    # Element-gather mode: the kernel reads overlapping W windows straight
    # from HBM via pl.Element block dims instead of an XLA-side gathered
    # [N, C, n_tw, hx, wxw] copy (~20 ms/iter of the bf16 forward). Mosaic's
    # 8/128 rule applies to Element blocks too, so the window widens to a
    # 128 multiple; the extra columns multiply zero tap rows (exact).
    wxwE = -(-wxw // 128) * 128 if element_gather else wxw
    cb = _pick_cb(c, hx, wxwE, mswl, n_th, boh, bow, cdt.itemsize)
    c_pad = -(-c // cb) * cb
    lanes = cb * mswl

    # Keep the banded matrices as NUMPY in this (lru-cached) closure: jnp
    # constants created here would capture the caller's trace and leak
    # across jit boundaries. pallas_call converts them per trace.
    np_dt = np.dtype(cdt.name) if cdt.name != "bfloat16" else \
        jnp.bfloat16
    mu_w_np = plan_w["mu"]
    if wxwE != wxw:
        mu_w_np = np.concatenate(
            [mu_w_np, np.zeros((wxwE - wxw, mswl), np.float32)])
    muw = np.asarray(mu_w_np, np_dt)                     # [wxwE, mswl]
    mdw = np.asarray(plan_w["md"], np_dt)                # [mswl, bow]
    muh_t = np.ascontiguousarray(plan_h["mu"].T).astype(np_dt)   # [mshl, wxh]
    mdh_t = np.ascontiguousarray(plan_h["md"].T).astype(np_dt)   # [boh, mshl]
    muw_t = np.ascontiguousarray(plan_w["mu"].T).astype(np_dt)   # [mswl, wxw]
    mdw_t = np.ascontiguousarray(plan_w["md"].T).astype(np_dt)   # [bow, mswl]
    muh = np.asarray(plan_h["mu"], np_dt)                # [wxh, mshl]
    mdh = np.asarray(plan_h["md"], np_dt)                # [mshl, boh]

    gain_f, slope_f = float(gain), float(slope)
    clamp_f = None if clamp is None else float(clamp)

    # strict > 0 so the at-zero subgradient is slope*gain, matching torch
    # leaky_relu and ops/bias_act.py (see tests/test_train_parity.py)
    def _act(b):
        t = jnp.where(b > 0, b, b * slope_f) * gain_f
        if clamp_f is not None:
            t = jnp.clip(t, -clamp_f, clamp_f)
        return t

    def _act_mask(b):
        m = jnp.where(b > 0, gain_f, slope_f * gain_f)
        if clamp_f is not None:
            t = jnp.where(b > 0, b, b * slope_f) * gain_f
            m = m * ((t >= -clamp_f) & (t <= clamp_f)).astype(f32)
        return m

    # x-tile channel accessor: tile-form refs are [1, cb, 1, hx, wxw]
    # (pre-gathered), element-form refs are [cb, hx, wxwE] (the N dim is
    # Squeezed and the window comes straight from HBM).
    if element_gather:
        def _x_at(x_ref, ci):
            return x_ref[ci]
    else:
        def _x_at(x_ref, ci):
            return x_ref[0, ci, 0]

    def _wup(x_ref, muw_ref, a_ref):
        """A[:, c-slot] = x_c @ Mu_w for every channel (fat row dim Hx)."""
        for ci in range(cb):
            a = jnp.dot(_x_at(x_ref, ci), muw_ref[...],
                        preferred_element_type=f32)       # [hx, mswl]
            a_ref[:, ci * mswl:(ci + 1) * mswl] = a.astype(cdt)

    # H-pass dots run in lane chunks so the transient f32 b/l values stay
    # bounded (~[mshl, _H_CHUNK]) — that transient, not the A scratch, was
    # what capped the channel block at the C>=128 layers (round 3). Chunks
    # are channel-slot aligned so the backward's per-channel g dots line up.
    _ch_chunk = max(1, _H_CHUNK // mswl)
    lane_chunks = [(c0, min(c0 + _ch_chunk, cb),
                    c0 * mswl, min(c0 + _ch_chunk, cb) * mswl)
                   for c0 in range(0, cb, _ch_chunk)]

    def fwd_kernel(x_ref, muw_ref, muht_ref, mdht_ref, mdw_ref, o_ref,
                   a_ref, cc_ref):
        _wup(x_ref, muw_ref, a_ref)
        # H passes: one matmul per h-tile per lane chunk.
        for t in range(n_th):
            for (_, _, l0, l1) in lane_chunks:
                a_t = a_ref[t * sh:t * sh + wxh, l0:l1]   # [wxh, chunk]
                b = jnp.dot(muht_ref[...], a_t,
                            preferred_element_type=f32)   # [mshl, chunk]
                l = _act(b).astype(cdt)
                cc = jnp.dot(mdht_ref[...], l,
                             preferred_element_type=f32)  # [boh, chunk]
                cc_ref[t * boh:(t + 1) * boh, l0:l1] = cc.astype(cdt)
        # W-down per channel (fat row dim Hout).
        for ci in range(cb):
            y = jnp.dot(cc_ref[:, ci * mswl:(ci + 1) * mswl], mdw_ref[...],
                        preferred_element_type=f32)       # [hout, bow]
            o_ref[0, ci, 0] = y.astype(o_ref.dtype)

    def bwd_kernel(x_ref, g_ref, muw_ref, muht_ref, mdwt_ref, mdh_ref,
                   muh_ref, muwt_ref, dx_ref, a_ref, da_ref):
        _wup(x_ref, muw_ref, a_ref)
        da_ref[...] = jnp.zeros((hx, lanes), f32)
        # Recompute b per tile, apply mask, walk the transposed chain, and
        # accumulate overlapping dA rows — per lane chunk, like the forward.
        for t in range(n_th):
            for (c0, c1, l0, l1) in lane_chunks:
                a_t = a_ref[t * sh:t * sh + wxh, l0:l1]
                b = jnp.dot(muht_ref[...], a_t,
                            preferred_element_type=f32)   # [mshl, chunk]
                mask = _act_mask(b)
                # per-channel dcc rows for this tile's chunk:
                # dCC_t[:, c-slot] = g[c, t-rows] @ Md_w^T
                dcc_rows = []
                for ci in range(c0, c1):
                    g_ct = g_ref[0, ci, 0, t * boh:(t + 1) * boh, :]
                    dcc_rows.append(jnp.dot(g_ct, mdwt_ref[...],
                                            preferred_element_type=f32)
                                    .astype(cdt))
                dcc_t = jnp.concatenate(dcc_rows, axis=1)  # [boh, chunk]
                dl = jnp.dot(mdh_ref[...], dcc_t,
                             preferred_element_type=f32)   # [mshl, chunk]
                db = (dl * mask).astype(cdt)
                da_t = jnp.dot(muh_ref[...], db,
                               preferred_element_type=f32)  # [wxh, chunk]
                da_ref[t * sh:t * sh + wxh, l0:l1] = (
                    da_ref[t * sh:t * sh + wxh, l0:l1] + da_t)
        for ci in range(cb):
            dx = jnp.dot(da_ref[:, ci * mswl:(ci + 1) * mswl].astype(cdt),
                         muwt_ref[...], preferred_element_type=f32)
            dx_ref[0, ci, 0] = dx.astype(dx_ref.dtype)

    def x_spec():
        return pl.BlockSpec((1, cb, 1, hx, wxw),
                            lambda n, ci, wt: (n, ci, wt, 0, 0))

    sw_w = plan_w["s"]

    def x_spec_elem():
        # Overlapping windows at element offsets wt*sw_w on the (padded,
        # in-bounds) x — index_map entries are ELEMENT offsets here.
        return pl.BlockSpec(
            (pl.Squeezed(), pl.Element(cb), pl.Element(hx), pl.Element(wxwE)),
            lambda n, ci, wt: (n, ci * cb, 0, wt * sw_w))

    def mat_spec(m):
        return pl.BlockSpec(m.shape, lambda n, ci, wt: (0,) * m.ndim)

    def o_spec():
        # Trailing block dims must equal the full array dims (Mosaic's
        # 8/128-divisibility rule), so w-tiles get their own array axis and
        # the wrapper reassembles them with one cheap XLA transpose.
        return pl.BlockSpec((1, cb, 1, hout, bow),
                            lambda n, ci, wt: (n, ci, wt, 0, 0))

    in0_spec = x_spec_elem if element_gather else x_spec

    def fwd_call(x_in, n):
        return pl.pallas_call(
            fwd_kernel,
            grid=(n, c_pad // cb, n_tw),
            in_specs=[in0_spec(), mat_spec(muw), mat_spec(muh_t),
                      mat_spec(mdh_t), mat_spec(mdw)],
            out_specs=o_spec(),
            out_shape=jax.ShapeDtypeStruct(
                (n, c_pad, n_tw, hout, bow), cdt),
            scratch_shapes=[pltpu.VMEM((hx, lanes), cdt),
                            pltpu.VMEM((hout, lanes), cdt)],
            interpret=interpret,
        )(x_in, muw, muh_t, mdh_t, mdw)

    def bwd_call(x_in, g, n):
        # dx comes out in tile form even in element-gather mode; the wrapper
        # overlap-adds the tiles (the transpose of the window gather).
        return pl.pallas_call(
            bwd_kernel,
            grid=(n, c_pad // cb, n_tw),
            in_specs=[in0_spec(), o_spec(), mat_spec(muw), mat_spec(muh_t),
                      mat_spec(mdw_t), mat_spec(mdh), mat_spec(muh),
                      mat_spec(muw_t)],
            out_specs=x_spec(),
            out_shape=jax.ShapeDtypeStruct(
                (n, c_pad, n_tw, hx, wxw), cdt),
            scratch_shapes=[pltpu.VMEM((hx, lanes), cdt),
                            pltpu.VMEM((hx, lanes), jnp.float32)],
            interpret=interpret,
        )(x_in, g, muw, muh_t, mdw_t, mdh, muh, muw_t)

    meta = dict(plan_h=plan_h, plan_w=plan_w, c_pad=c_pad, cb=cb, hx=hx,
                hout=hout, out_h=plan_h["out_len"], out_w=plan_w["out_len"],
                wxwE=wxwE, element_gather=element_gather)
    return fwd_call, bwd_call, meta


def _pad_axis(x, axis, lo, hi):
    """Zero-pad (or crop, for negative amounts) one axis."""
    if lo < 0 or hi < 0:
        start = [0] * x.ndim
        stop = list(x.shape)
        start[axis] = max(0, -lo)
        stop[axis] = x.shape[axis] - max(0, -hi)
        x = jax.lax.slice(x, start, stop)
        lo, hi = max(0, lo), max(0, hi)
    if lo or hi:
        pads = [(0, 0)] * x.ndim
        pads[axis] = (lo, hi)
        x = jnp.pad(x, pads)
    return x


_ELEMENT_GATHER = False      # flipped by measurement; see set_element_gather


def set_element_gather(on: bool):
    """Route the kernel's x input through pl.Element windows (overlapping
    reads straight from HBM) instead of the XLA-side gathered tile copy.
    Exact either way; this is a perf knob (see docs/performance.md)."""
    global _ELEMENT_GATHER
    _ELEMENT_GATHER = bool(on)


def filtered_lrelu_mxu(x, fu, fd, b, up, down, padding, gain, slope, clamp,
                       flip_filter, ms_target: int = 128,
                       interpret: bool = False,
                       element_gather: Optional[bool] = None
                       ) -> Optional[jnp.ndarray]:
    """Fused banded-MXU filtered_lrelu; NCHW in/out. Returns None when the
    configuration is unsupported (caller falls back to the XLA composition).
    Differentiable: custom_vjp with a transposed-chain backward kernel."""
    if fu is None or fd is None:
        return None
    fu = np.asarray(fu, np.float32)
    fd = np.asarray(fd, np.float32)
    if fu.ndim != 1 or fd.ndim != 1:
        return None
    if len(fu) == 1 and len(fd) == 1 and up == 1 and down == 1:
        return None                       # pure elementwise: XLA is optimal
    use_elem = _ELEMENT_GATHER if element_gather is None else element_gather
    n, c, in_h, in_w = map(int, x.shape)
    built = _build_mxu_call(
        in_h, in_w, c, tuple(fu.tolist()), tuple(fd.tolist()), int(up),
        int(down), tuple(int(p) for p in padding), float(gain), float(slope),
        None if clamp is None else float(clamp), bool(flip_filter),
        x.dtype.name, int(ms_target), bool(interpret), bool(use_elem))
    if built is None:
        return None
    fwd_call, bwd_call, meta = built
    plan_h, plan_w = meta["plan_h"], meta["plan_w"]
    n_tw = plan_w["n_t"]
    wxw, sw = plan_w["wx"], plan_w["s"]

    if b is not None:
        x = x + jnp.asarray(b, x.dtype)[None, :, None, None]
    x_p = _pad_axis(x, 2, plan_h["pad_lo"], plan_h["pad_hi"])
    pad_hi_w = plan_w["pad_hi"]
    if use_elem:
        # The widened (128-multiple) element window over-reads past the last
        # true window; extend the zero tail so every read stays in bounds
        # (the extra columns multiply zero tap rows — exact).
        pad_hi_w += meta["wxwE"] - wxw
    x_p = _pad_axis(x_p, 3, plan_w["pad_lo"], pad_hi_w)
    if meta["c_pad"] != c:
        x_p = jnp.pad(x_p, ((0, 0), (0, meta["c_pad"] - c), (0, 0), (0, 0)))

    if use_elem:
        # Overlapping W windows are read in-kernel via pl.Element offsets —
        # no gathered copy. The backward still emits tile-form dx; the
        # overlap-add below is the gather's transpose, written by hand.
        @jax.custom_vjp
        def _run(x_p):
            return fwd_call(x_p, n)

        def _run_fwd(x_p):
            return fwd_call(x_p, n), x_p

        def _run_bwd(x_p, g):
            dxt = bwd_call(x_p, g, n)     # [N, c_pad, n_tw, hx, wxw]
            dx = jnp.zeros_like(x_p)
            for t in range(n_tw):
                dx = dx.at[:, :, :, t * sw:t * sw + wxw].add(dxt[:, :, t])
            return (dx,)

        _run.defvjp(_run_fwd, _run_bwd)
        y = _run(x_p)                     # [N, c_pad, n_tw, hout, bow]
    else:
        # Overlapped W-tile gather (XLA; its autodiff transpose is the
        # overlap-add the backward needs). The H axis is sliced in-kernel.
        cols = [jax.lax.slice(x_p, (0, 0, 0, j * sw),
                              (n, meta["c_pad"], meta["hx"], j * sw + wxw))
                for j in range(n_tw)]
        tiles = jnp.stack(cols, axis=2)   # [N, c_pad, n_tw, hx, wxw]

        @jax.custom_vjp
        def _run(tiles):
            return fwd_call(tiles, n)

        def _run_fwd(tiles):
            return fwd_call(tiles, n), tiles

        def _run_bwd(tiles, g):
            return (bwd_call(tiles, g, n),)

        _run.defvjp(_run_fwd, _run_bwd)
        y = _run(tiles)                   # [N, c_pad, n_tw, hout, bow]

    y = jnp.transpose(y, (0, 1, 3, 2, 4)).reshape(
        n, meta["c_pad"], meta["hout"], n_tw * plan_w["bo"])
    return y[:, :c, :meta["out_h"], :meta["out_w"]]
