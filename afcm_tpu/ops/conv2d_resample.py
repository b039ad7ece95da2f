"""conv2d with fused up/down FIR resampling.

Reference semantics: torch_utils/ops/conv2d_resample.py:46-141.  The
reference dispatches across five CUDA fast paths (strided / transposed
convolutions); under XLA all of them lower to `conv_general_dilated`, so we
implement only the generic composition — XLA's conv canonicalizer picks the
strided/dilated form itself:

    upfirdn(f, up, pad, gain=up^2)  ->  conv(w)  ->  upfirdn(f, down)

with the same padding adjustment arithmetic as the reference.
"""

from __future__ import annotations

import numpy as np

from .modulated_conv import conv2d
from .filter_design import filter_size
from .upfirdn2d import parse_padding, upfirdn2d


def conv2d_resample(x, w, f=None, up: int = 1, down: int = 1, padding=0,
                    groups: int = 1, flip_weight: bool = True,
                    flip_filter: bool = False):
    """2D conv with optional up/downsampling (padding w.r.t. upsampled image)."""
    assert x.ndim == 4 and w.ndim == 4
    out_channels, in_channels_per_group, kh, kw = w.shape
    fw, fh = filter_size(f)
    px0, px1, py0, py1 = parse_padding(padding)

    # Adjust padding to account for up/downsampling
    # (reference: conv2d_resample.py:81-91).
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    if down > 1 and up == 1:
        # Anti-alias filter, then strided conv: keep the FIR *before* the
        # conv (matching the reference fast path at conv2d_resample.py:105-109
        # — the ordering matters at zero-padded borders).
        x = upfirdn2d(x, f, padding=[px0, px1, py0, py1], flip_filter=flip_filter)
        x = _strided_conv(x, w, stride=down, groups=groups, flip_weight=flip_weight)
        return x

    x = upfirdn2d(x, f if up > 1 else None, up=up,
                  padding=[px0, px1, py0, py1], gain=up ** 2,
                  flip_filter=flip_filter)
    x = conv2d(x, w, padding=0, groups=groups, flip_weight=flip_weight)
    if down > 1:
        x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
    return x


def _strided_conv(x, w, stride: int, groups: int, flip_weight: bool):
    from jax import lax
    from .modulated_conv import _DN
    if not flip_weight and (w.shape[2] > 1 or w.shape[3] > 1):
        w = w[:, :, ::-1, ::-1]
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding=((0, 0), (0, 0)), dimension_numbers=_DN,
        feature_group_count=groups)
