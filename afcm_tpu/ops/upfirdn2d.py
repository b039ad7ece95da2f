"""upfirdn2d — pad / upsample / FIR-filter / downsample, fused for XLA.

The reference implements this as a templated CUDA mega-kernel
(reference: torch_utils/ops/upfirdn2d.{cpp,cu,h}).  On TPU the whole
operation is *one* `lax.conv_general_dilated` call:

* zero-stuffing upsample  -> ``lhs_dilation``
* pad / crop              -> (possibly negative) conv padding
* FIR filter              -> depthwise kernel (``feature_group_count = C``)
* decimation downsample   -> ``window_strides``

Separable filters run as two passes (x then y), each fusing its own
up/pad/down per dimension; XLA schedules both onto the VPU without any
intermediate HBM round-trip beyond the single temp.

Semantics match reference torch_utils/ops/upfirdn2d.py:118-211 bit-for-bit in
fp32 (validated by tests/test_ops_parity.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .filter_design import filter_size
from jax import lax

_DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NCHW", "OIHW", "NCHW"))


def parse_scaling(scaling):
    if isinstance(scaling, (int, np.integer)):
        scaling = [scaling, scaling]
    sx, sy = (int(s) for s in scaling)
    assert sx >= 1 and sy >= 1
    return sx, sy


def parse_padding(padding):
    if isinstance(padding, (int, np.integer)):
        padding = [padding, padding]
    padding = [int(x) for x in padding]
    if len(padding) == 2:
        px, py = padding
        padding = [px, px, py, py]
    px0, px1, py0, py1 = padding
    return px0, px1, py0, py1


def _as_np_filter(f):
    if f is None:
        return None
    f = np.asarray(f, dtype=np.float32)
    assert f.ndim in (1, 2)
    return f


def _depthwise_conv(x, taps, *, up, down, pad, axis):
    """Depthwise 1-D FIR along `axis` (2=H, 3=W) with fused up/pad/down."""
    channels = x.shape[1]
    taps = jnp.asarray(taps, dtype=x.dtype)
    # lhs_dilation yields (n-1)*up+1 samples; the reference zero-stuffs to
    # n*up (up-1 trailing zeros), so fold those into the trailing pad.
    pad = (pad[0], pad[1] + up - 1)
    if axis == 3:
        kernel = jnp.tile(taps.reshape(1, 1, 1, -1), (channels, 1, 1, 1))
        lhs_dilation, strides = (1, up), (1, down)
        padding = ((0, 0), pad)
    else:
        kernel = jnp.tile(taps.reshape(1, 1, -1, 1), (channels, 1, 1, 1))
        lhs_dilation, strides = (up, 1), (down, 1)
        padding = (pad, (0, 0))
    return lax.conv_general_dilated(
        x, kernel, window_strides=strides, padding=padding,
        lhs_dilation=lhs_dilation, dimension_numbers=_DN,
        feature_group_count=channels)


def _depthwise_conv2d(x, taps2d, *, up, down, pad):
    channels = x.shape[1]
    kernel = jnp.tile(jnp.asarray(taps2d, dtype=x.dtype)[None, None], (channels, 1, 1, 1))
    return lax.conv_general_dilated(
        x, kernel, window_strides=(down[1], down[0]),
        padding=((pad[2], pad[3] + up[1] - 1), (pad[0], pad[1] + up[0] - 1)),
        lhs_dilation=(up[1], up[0]), dimension_numbers=_DN,
        feature_group_count=channels)


_DEFAULT_IMPL = "auto"


def set_default_impl(impl: str):
    """Global upfirdn2d implementation: 'conv' (fused conv_general_dilated),
    'banded' (MXU matmul against a static banded tap matrix), or 'auto'
    (banded for fp32 large-spatial separable passes — measured +12% on the
    full generator — conv otherwise; bf16 depthwise convs are already
    faster than bf16 banded matmuls)."""
    global _DEFAULT_IMPL
    assert impl in ("conv", "banded", "auto")
    _DEFAULT_IMPL = impl


def get_default_impl() -> str:
    return _DEFAULT_IMPL


@functools.lru_cache(maxsize=None)
def _banded_matrix(taps_key, up: int, down: int, pad0: int, pad1: int,
                   in_len: int, flip: bool):
    """M[j, o] for one separable pass: out[o] = sum_j M[j, o] * x[j].

    Derivation (convolution orientation): t[i] = sum_m f[m] xs[i + nt-1-m -
    pad0] with xs zero-stuffed by `up`; out[o] = t[o*down]."""
    f = np.asarray(taps_key, np.float32)
    if flip:
        f = f[::-1]
    nt = len(f)
    out_len = (in_len * up + pad0 + pad1 - (nt - 1) + (down - 1)) // down
    m = np.zeros((in_len, out_len), np.float32)
    shift = nt - 1 - pad0
    for o in range(out_len):
        for k in range(nt):
            idx = o * down - k + shift
            if idx % up == 0 and 0 <= idx // up < in_len:
                m[idx // up, o] += f[k]
    return m


def _upfirdn2d_banded(x, f, upx, upy, downx, downy, px0, px1, py0, py1,
                      flip_filter, gain):
    """Separable upfirdn as two MXU matmuls. ~up*nt/1 redundant FLOPs vs the
    depthwise conv, but the MXU has an order of magnitude more of them than
    the VPU at these shapes (measured faster on every >=128-wide layer)."""
    f = np.asarray(f, np.float32) * (float(gain) ** 0.5)
    taps_key = tuple(f.ravel().tolist())
    in_h, in_w = x.shape[2], x.shape[3]
    mx = jnp.asarray(_banded_matrix(taps_key, upx, downx, px0, px1, in_w,
                                    flip_filter), x.dtype)
    my = jnp.asarray(_banded_matrix(taps_key, upy, downy, py0, py1, in_h,
                                    flip_filter), x.dtype)
    x = jnp.einsum("nchw,wo->ncho", x, mx)
    return jnp.einsum("ncho,hp->ncpo", x, my)


def upfirdn2d(x, f, up=1, down=1, padding=0, flip_filter=False, gain=1,
              impl=None):
    """Pad, upsample, filter and downsample a batch of NCHW images.

    Args:
      x: [N, C, H, W] array.
      f: FIR filter — 1-D [taps] (separable), 2-D [fh, fw], or None (identity).
         Static (numpy) values; baked into the graph.
      up / down: int or [x, y] integer resampling factors.
      padding: int, [x, y] or [x0, x1, y0, y1] w.r.t. the upsampled image;
               negative values crop.
      flip_filter: False = convolution, True = correlation.
      gain: overall magnitude scaling.
    """
    assert x.ndim == 4
    f = _as_np_filter(f)
    upx, upy = parse_scaling(up)
    downx, downy = parse_scaling(down)
    px0, px1, py0, py1 = parse_padding(padding)

    _, _, in_h, in_w = x.shape
    fw, fh = filter_size(f)
    up_w = in_w * upx + px0 + px1
    up_h = in_h * upy + py0 + py1
    assert up_w >= fw and up_h >= fh, "upsampled buffer smaller than filter"

    if impl is None:
        impl = _DEFAULT_IMPL
    if f is not None and f.ndim == 1 and (
            impl == "banded" or
            (impl == "auto" and max(in_h, in_w) >= 96 and
             x.dtype == jnp.float32)):
        return _upfirdn2d_banded(x, f, upx, upy, downx, downy, px0, px1,
                                 py0, py1, flip_filter, gain)

    if _CUSTOM_GRAD:
        taps_key = None if f is None else \
            (tuple(f.ravel().tolist()), f.shape)
        return _custom_conv_op(taps_key, upx, upy, downx, downy,
                               px0, px1, py0, py1, bool(flip_filter),
                               float(gain), in_h, in_w)(x)
    return _conv_path(x, f, upx, upy, downx, downy, px0, px1, py0, py1,
                      flip_filter, gain)


def _conv_path(x, f, upx, upy, downx, downy, px0, px1, py0, py1,
               flip_filter, gain):
    """The fused conv_general_dilated lowering (f = raw numpy taps or None)."""
    if f is None:
        f = np.ones([1, 1], dtype=np.float32)

    # Fold gain into the filter; flip for convolution semantics
    # (conv_general_dilated correlates, the reference convolves by default).
    f = f * (gain ** (f.ndim / 2))
    if not flip_filter:
        f = f[::-1] if f.ndim == 1 else f[::-1, ::-1]
    f = np.ascontiguousarray(f)

    if f.ndim == 1:
        # Separable: x-pass then y-pass. Zero rows introduced by the y
        # upsample commute with the x-direction FIR, so each pass owns the
        # resampling of its own dimension.
        x = _depthwise_conv(x, f, up=upx, down=downx, pad=(px0, px1), axis=3)
        x = _depthwise_conv(x, f, up=upy, down=downy, pad=(py0, py1), axis=2)
        return x
    return _depthwise_conv2d(x, f, up=(upx, upy), down=(downx, downy),
                             pad=(px0, px1, py0, py1))


_CUSTOM_GRAD = True


def set_custom_grad(on: bool):
    """Toggle the swapped-filter custom VJP (default on).

    JAX's autodiff of the strided/dilated FIR convs produces transposed
    convs that the TPU compiler lowers through data reversals (the 'reverse'
    HLO bucket in the train-step profile). The custom VJP expresses the
    backward as the mathematically identical *forward-form* upfirdn with
    up/down swapped, the static filter flipped at trace time, and the
    transposed padding — the reference's own backward construction
    (torch_utils/ops/upfirdn2d.py:250-268)."""
    global _CUSTOM_GRAD
    _CUSTOM_GRAD = bool(on)


@functools.lru_cache(maxsize=None)
def _custom_conv_op(taps_key, upx, upy, downx, downy, px0, px1, py0, py1,
                    flip_filter, gain, in_h, in_w):
    """Cached custom-VJP wrapper of the conv path for one static config.

    The cache is keyed on every static argument including the input H/W
    (the transposed padding needs them); one entry per layer config."""
    if taps_key is None:
        f = None
    else:
        taps, shape = taps_key
        f = np.asarray(taps, np.float32).reshape(shape)
    fw, fh = filter_size(f)

    @jax.custom_vjp
    def op(x):
        return _conv_path(x, f, upx, upy, downx, downy, px0, px1, py0, py1,
                          flip_filter, gain)

    def op_fwd(x):
        return op(x), None

    def op_bwd(_, dy):
        # Reference backward (torch_utils/ops/upfirdn2d.py:250-268): the
        # transpose of upfirdn(up, down, p, f) is upfirdn(down, up, p', f
        # flipped) with the same gain.
        oh, ow = int(dy.shape[2]), int(dy.shape[3])
        p = (fw - px0 - 1,
             in_w * upx - ow * downx + px0 - upx + 1,
             fh - py0 - 1,
             in_h * upy - oh * downy + py0 - upy + 1)
        dx = upfirdn2d(dy, f, up=(downx, downy), down=(upx, upy), padding=p,
                       flip_filter=not flip_filter, gain=gain)
        return (dx,)

    op.defvjp(op_fwd, op_bwd)
    return op


def filter2d(x, f, padding=0, flip_filter=False, gain=1):
    """Filter NCHW images, output padded to match the input shape."""
    f = _as_np_filter(f)
    padx0, padx1, pady0, pady1 = parse_padding(padding)
    fw, fh = filter_size(f)
    p = [padx0 + fw // 2, padx1 + (fw - 1) // 2,
         pady0 + fh // 2, pady1 + (fh - 1) // 2]
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain)


def upsample2d(x, f, up=2, padding=0, flip_filter=False, gain=1):
    """Upsample NCHW images by an integer factor with the given FIR filter."""
    upx, upy = parse_scaling(up)
    padx0, padx1, pady0, pady1 = parse_padding(padding)
    f = _as_np_filter(f)
    fw, fh = filter_size(f)
    p = [padx0 + (fw + upx - 1) // 2, padx1 + (fw - upx) // 2,
         pady0 + (fh + upy - 1) // 2, pady1 + (fh - upy) // 2]
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter,
                     gain=gain * upx * upy)


def downsample2d(x, f, down=2, padding=0, flip_filter=False, gain=1):
    """Downsample NCHW images by an integer factor with the given FIR filter."""
    downx, downy = parse_scaling(down)
    padx0, padx1, pady0, pady1 = parse_padding(padding)
    f = _as_np_filter(f)
    fw, fh = filter_size(f)
    p = [padx0 + (fw - downx + 1) // 2, padx1 + (fw - downx) // 2,
         pady0 + (fh - downy + 1) // 2, pady1 + (fh - downy) // 2]
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain)


def gaussian_blur2d(x, sigma, max_radius: int):
    """Gaussian blur with a *traced* sigma under a static filter footprint.

    The reference builds a filter of data-dependent size
    ``2*floor(3*sigma)+1`` (reference: models/stylegan3_model.py:24-30) which
    would force a retrace per sigma under jit.  Instead we use a fixed
    ``2*max_radius+1`` footprint and zero the taps beyond ``floor(3*sigma)``;
    with matching symmetric padding this is numerically identical to the
    variable-size filter, and collapses to the identity when sigma < 1/3.
    """
    t = jnp.arange(-max_radius, max_radius + 1, dtype=jnp.float32)
    sigma = jnp.asarray(sigma, dtype=jnp.float32)
    blur_size = jnp.floor(sigma * 3.0)
    safe_sigma = jnp.maximum(sigma, 1e-8)
    taps = jnp.exp2(-jnp.square(t / safe_sigma))
    taps = jnp.where(jnp.abs(t) <= blur_size, taps, 0.0)
    taps = taps / jnp.sum(taps)

    # Static-shape separable depthwise conv with 'same' padding.
    channels = x.shape[1]
    tapsx = jnp.tile(taps.astype(x.dtype).reshape(1, 1, 1, -1), (channels, 1, 1, 1))
    tapsy = jnp.tile(taps.astype(x.dtype).reshape(1, 1, -1, 1), (channels, 1, 1, 1))
    pad = max_radius
    x = lax.conv_general_dilated(x, tapsx, (1, 1), ((0, 0), (pad, pad)),
                                 dimension_numbers=_DN, feature_group_count=channels)
    x = lax.conv_general_dilated(x, tapsy, (1, 1), ((pad, pad), (0, 0)),
                                 dimension_numbers=_DN, feature_group_count=channels)
    return x
