"""Per-sample style-modulated convolutions, TPU-shaped.

The reference executes modulated conv as a batch-grouped convolution with
per-sample materialized weights (reference: networks_stylegan3.py:24-64 and
CoModGAN/layers.py:19-77).  Grouped convs with ``groups == batch`` map poorly
onto the MXU; instead we use the mathematically-identical
"scale-activations" factorization (the reference's own
``fused_modconv=False`` path, CoModGAN/layers.py:56-65):

    conv(x, w * s[n,i] * d[n,o])  ==  d[n,o] * conv(x * s[n,i], w)

with the demodulation coefficients computed *without* materializing
per-sample weights, via one [O,I] x [I,N] matmul:

    d[n,o] = rsqrt( sum_{i,k} (w[o,i,k] * s[n,i])^2 + eps )
           = rsqrt( (sum_k w^2)[o,:] @ (s^2)[n,:] + eps )

This keeps the big conv a single dense MXU op shared across the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


_DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NCHW", "OIHW", "NCHW"))

# Test hook: force the lane-padding branch regardless of backend.
_FORCE_CHANNEL_PAD = False

# Quantized inference path (round 3): 'int8' routes the measured-win 3x3
# convs to the fused int8 MXU kernel (ops/pallas/conv_int8.py); 'int8_all'
# routes every eligible conv (experiments); 'xla' keeps the bf16/f32 conv
# emitter. Training is safe under int8 (straight-through f32 backward) but
# the knob is intended for inference (bench/predictor).
_CONV_IMPL = "xla"
_CONV_INT8_VARIANT = "dots"
_CONV_INT8_MIN_CH = 64
# Test hook: allow int8 routing off-TPU (interpret-mode CI).
_FORCE_INT8 = False


def _int8_gate(x_shape, w_shape) -> bool:
    """Measured routing table (v5e, batch 16, in-model A/B — see
    docs/performance.md round 3): the int8 kernel wins on the small-spatial
    big-channel conv class where XLA's bf16 emitter is far off peak; the
    large-spatial mid-channel convs run near the bf16 roofline and the
    quantize/dequant traffic erases the MXU gain."""
    o, i = int(w_shape[0]), int(w_shape[1])
    h = int(x_shape[2])
    return min(o, i) >= 256 and h <= 56


def set_conv_impl(impl: str, variant: str = None, min_ch: int = None):
    """Select the conv implementation: 'xla' (default), 'int8' (measured
    routing table) or 'int8_all' (every eligible conv)."""
    global _CONV_IMPL, _CONV_INT8_VARIANT, _CONV_INT8_MIN_CH
    assert impl in ("xla", "int8", "int8_all")
    _CONV_IMPL = impl
    if variant is not None:
        assert variant in ("dots", "im2col")
        _CONV_INT8_VARIANT = variant
    if min_ch is not None:
        _CONV_INT8_MIN_CH = int(min_ch)


def get_conv_impl() -> str:
    return _CONV_IMPL


def fma(a, b, c):
    """Fused multiply-add a*b + c (reference: torch_utils/ops/fma.py —
    the unbroadcast-aware backward is native to JAX's autodiff)."""
    return a * b + c


def conv2d(x, w, padding=0, groups: int = 1, flip_weight: bool = True):
    """Plain NCHW conv2d (correlation when flip_weight, like torch.conv2d).

    Channel-padding heuristic (measured on v5e at 278²): XLA's conv emitter
    runs C64→64 at 19 TF/s bf16 / 16 TF/s fp32 but C128→128 at 121 / 114 —
    the padded conv is FASTER in absolute time despite 4x the FLOPs (lane
    starvation). When both channel dims sit in [64, 128) on a large-spatial
    conv, zero-pad them to 128 and slice the result — numerically exact,
    ~1.5-2 ms saved per such conv, and the pad/slice VJP extends the win to
    the gradient convs in training (docs/performance.md round 2).
    """
    if isinstance(padding, (int, np.integer)):
        padding = ((int(padding), int(padding)), (int(padding), int(padding)))
    else:
        py, px = padding
        padding = ((int(py), int(py)), (int(px), int(px)))
    if not flip_weight and (w.shape[2] > 1 or w.shape[3] > 1):
        w = w[:, :, ::-1, ::-1]

    if _CONV_IMPL in ("int8", "int8_all") and groups == 1:
        y = _try_conv_int8(x, w, padding)
        if y is not None:
            return y

    out_c, in_c = w.shape[0], w.shape[1] * groups
    crop_out = None
    if (groups == 1 and x.dtype in (jnp.bfloat16, jnp.float32)
            and x.shape[2] >= 192
            and 64 <= in_c < 128 and 64 <= out_c < 128
            and (jax.default_backend() == "tpu" or _FORCE_CHANNEL_PAD)):
        # lane-starvation is TPU-specific; on CPU padding just costs FLOPs
        x = jnp.pad(x, ((0, 0), (0, 128 - in_c), (0, 0), (0, 0)))
        w = jnp.pad(w, ((0, 128 - out_c), (0, 128 - in_c), (0, 0), (0, 0)))
        crop_out = out_c
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding=padding,
        dimension_numbers=_DN, feature_group_count=groups)
    if crop_out is not None:
        y = y[:, :crop_out]
    return y


def _try_conv_int8(x, w, padding):
    """Route an eligible conv to the fused int8 MXU kernel, else None.

    Eligibility: symmetric integer padding 0..2, 3x3 kernel, channels >=
    the routing floor, a feasible VMEM plan, and a TPU backend (or the CI
    force hook, which runs the kernel in interpret mode)."""
    (py0, py1), (px0, px1) = padding
    if py0 != py1 or px0 != px1 or py0 != px0:
        return None
    on_tpu = jax.default_backend() == "tpu"
    if not (on_tpu or _FORCE_INT8):
        return None
    if min(w.shape[0], w.shape[1]) < _CONV_INT8_MIN_CH:
        return None
    if _CONV_IMPL == "int8" and not _int8_gate(x.shape, w.shape):
        return None
    from .pallas.conv_int8 import conv3x3_int8_ste, int8_routable
    if not int8_routable(x.shape, w.shape, py0, _CONV_INT8_VARIANT):
        return None
    y = conv3x3_int8_ste(x, w.astype(jnp.float32), py0,
                         _CONV_INT8_VARIANT, not on_tpu)
    return None if y is None else y.astype(x.dtype)


def modulated_conv2d(x, w, s, demodulate: bool = True, padding=0,
                     input_gain=None):
    """StyleGAN3-style modulated conv (reference: networks_stylegan3.py:24-64).

    Args:
      x: [N, I, H, W] input.
      w: [O, I, kh, kw] weight.
      s: [N, I] styles.
      demodulate: apply weight pre-normalization + demodulation.
      padding: int or (padH, padW).
      input_gain: optional extra scale on input channels: scalar, [I], or [N, I].
    """
    batch = x.shape[0]
    out_channels, in_channels, kh, kw = w.shape
    assert s.shape == (batch, in_channels)

    w = w.astype(jnp.float32)
    s = s.astype(jnp.float32)
    if demodulate:
        w = w * jax.lax.rsqrt(jnp.mean(jnp.square(w), axis=(1, 2, 3), keepdims=True))
        s = s * jax.lax.rsqrt(jnp.mean(jnp.square(s)))

    dcoefs = None
    if demodulate:
        w_sq = jnp.sum(jnp.square(w), axis=(2, 3))            # [O, I]
        denom = jnp.square(s) @ w_sq.T                        # [N, O]
        dcoefs = jax.lax.rsqrt(denom + 1e-8)

    styles = s
    if input_gain is not None:
        input_gain = jnp.broadcast_to(jnp.asarray(input_gain, jnp.float32),
                                      (batch, in_channels))
        styles = styles * input_gain

    x = x * styles.astype(x.dtype)[:, :, None, None]
    x = conv2d(x, w, padding=padding)
    if demodulate:
        x = x * dcoefs.astype(x.dtype)[:, :, None, None]
    return x


def modulated_conv2d_resample(x, weight, styles, noise=None, up: int = 1,
                              down: int = 1, padding: int = 0,
                              resample_filter=None, demodulate: bool = True,
                              flip_weight: bool = True):
    """StyleGAN2-style modulated conv with fused resampling
    (reference: CoModGAN/layers.py:19-77).

    Uses the scale-activations factorization; `conv2d_resample` provides the
    up/down FIR plumbing.
    """
    from .conv2d_resample import conv2d_resample

    batch = x.shape[0]
    out_channels, in_channels, kh, kw = weight.shape
    assert styles.shape == (batch, in_channels)

    weight = weight.astype(jnp.float32)
    styles = styles.astype(jnp.float32)

    dcoefs = None
    if demodulate:
        w_sq = jnp.sum(jnp.square(weight), axis=(2, 3))       # [O, I]
        denom = jnp.square(styles) @ w_sq.T                   # [N, O]
        dcoefs = jax.lax.rsqrt(denom + 1e-8)

    x = x * styles.astype(x.dtype)[:, :, None, None]
    x = conv2d_resample(x, weight, f=resample_filter, up=up, down=down,
                        padding=padding, flip_weight=flip_weight)
    if demodulate and noise is not None:
        x = x * dcoefs.astype(x.dtype)[:, :, None, None] + noise.astype(x.dtype)
    elif demodulate:
        x = x * dcoefs.astype(x.dtype)[:, :, None, None]
    elif noise is not None:
        x = x + noise.astype(x.dtype)
    return x
