"""filtered_lrelu — bias, up-FIR, leaky ReLU, down-FIR, fused.

This is the hot op of the alias-free generator: every synthesis/encoder layer
runs one (reference: the 1.6k-line CUDA mega-kernel in
torch_utils/ops/filtered_lrelu.{cpp,cu,h} + wrapper filtered_lrelu.py:56-153).

TPU design:
  * The default XLA path composes `bias_act` and two fused `upfirdn2d`
    convolutions; XLA fuses the elementwise stages into the FIR convs, so the
    whole op is two VPU conv passes per separable dimension with no extra HBM
    traffic.
  * The CUDA sign-tensor trick (bit-packed lrelu/clamp signs retained for the
    backward) exists to save memory on GPUs; under JAX the equivalent
    memory/compute trade is `jax.checkpoint` around the layer, which recomputes
    the cheap elementwise stage in the backward instead of storing it.
  * An optional Pallas kernel (`afcm_tpu.ops.pallas`) fuses the separable
    up-FIR -> lrelu -> down-FIR chain per VMEM tile for the critical shapes.

Numerics match the reference composition (filtered_lrelu.py:120-153) exactly:
bias -> zero-stuff upsample (gain up^2) -> FIR -> x gain -> lrelu(slope) ->
clamp -> FIR -> decimate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .bias_act import bias_act as _bias_act_fn
from .filter_design import filter_size
from .upfirdn2d import parse_padding
from .upfirdn2d import upfirdn2d as _upfirdn2d_fn


_DEFAULT_IMPL = "xla"
# Default history (full ledger in docs/experiments.md): 'auto' (the measured
# per-layer Pallas routing) won +3.4% e2e in round 2, went neutral in round 3
# once conv channel padding sped the XLA baseline up (75.99 xla vs 75.74
# auto forward, same process), and measured -8.4% in the FULL train step in
# round 4 (auto 1025.4 / xla 939.4 / auto 1025.5 ms bracketed,
# scripts/bench_train_impl.py): under grad + remat the routed layers run 3x
# (fwd, custom_vjp bwd, recompute), so the wrapper's gather/reassembly tax
# triples while the kernel's fusion win does not. 'xla' is therefore the
# measured-best default for BOTH training and serving on v5e; the kernel
# stays one knob away ('auto'/'pallas') for chips or shapes where the
# balance flips back.
# Pruned experiment knobs (round 4):
#  * _FIR_CHANNEL_PAD (odd-channel pad inside the chain) — in-model NEUTRAL;
#  * _BO_ALIGN (lane-aligned W output tiles) — in-model 0.90x, a clear loss.
# Both deleted rather than kept off: re-run scripts/bench_model_sweep.py
# against the git history if a future chip changes the balance.


def set_default_impl(impl: str):
    """Select the global filtered_lrelu implementation:
    'xla'    — fused conv composition only (the default: measured-best in
               the train step, ties the routed kernel in the forward —
               see the default-history note above);
    'pallas' — force the banded-MXU kernel wherever it supports the config;
    'auto'   — measured per-layer routing (kernel only where it beat XLA
               on v5e in round 2; see _route_to_pallas)."""
    global _DEFAULT_IMPL
    assert impl in ("xla", "pallas", "auto")
    _DEFAULT_IMPL = impl


def get_default_impl() -> str:
    return _DEFAULT_IMPL


# Measured on one v5e chip (batch 16, iters=30, docs/performance.md round 2):
# the fused banded-MXU kernel beats the XLA composition only in bf16, on
# (a) low-channel large-spatial same-rate layers — the lane-starved tail of
# the conv emitter — and (b) up4 transition layers at mid target 256.
# fp32 routes to XLA everywhere (the MXU's f32 rate cancels the fusion win).
_MS_TARGET_UP2 = 128   # W/H tile mid-window target for the routed up2 class;
                       # bigger = fewer W tiles (less gather/reassembly tax)
                       # at more redundant banded-MXU FLOPs. A/B hook.


def set_ms_target_up2(v: int):
    global _MS_TARGET_UP2
    _MS_TARGET_UP2 = int(v)


def _route_to_pallas(shape, dtype, up, down):
    """Returns the kernel's ms_target, or None to stay on XLA."""
    if jnp.dtype(dtype) != jnp.bfloat16:
        return None
    if jax.default_backend() != "tpu":   # Mosaic path is TPU-only
        return None
    c, h, w = int(shape[1]), int(shape[2]), int(shape[3])
    size = min(h, w)
    if up == 2 and down == 2 and c <= 96 and size >= 192:
        return _MS_TARGET_UP2  # 1.2-1.5x measured (276^2, C 64-91)
    if up == 4 and down == 2:
        if c <= 128 and size >= 128:
            return 256        # 1.3x (148^2 C128)
        if c >= 256 and 48 <= size <= 96:
            return 256        # 1.06-1.25x (52^2/84^2 C362-512)
    return None


def filtered_lrelu(x, fu=None, fd=None, b=None, up=1, down=1, padding=0,
                   gain=np.sqrt(2), slope=0.2, clamp=None, flip_filter=False,
                   impl=None):
    """Filtered leaky ReLU for a batch of NCHW images.

    Args:
      x: [N, C, H, W] input.
      fu / fd: static up/down FIR filters (1-D separable, 2-D, or None).
      b: optional per-channel bias [C].
      up / down: integer resampling factors.
      padding: int / [x,y] / [x0,x1,y0,y1] w.r.t. the upsampled image.
      gain, slope, clamp: leaky ReLU parameters (clamp None disables).
      impl: 'xla' (fused conv composition) or 'pallas' (tiled TPU kernel for
            supported configs, falling back to 'xla' otherwise).
    """
    assert x.ndim == 4
    if impl is None:
        impl = _DEFAULT_IMPL
    assert isinstance(up, (int, np.integer)) and up >= 1
    assert isinstance(down, (int, np.integer)) and down >= 1
    px0, px1, py0, py1 = parse_padding(padding)
    gain = float(gain)
    slope = float(slope)
    assert gain > 0 and slope >= 0

    if impl in ("pallas", "auto") and jax.default_backend() == "tpu":
        from .pallas import filtered_lrelu_mxu
        if impl == "pallas":
            # Forced mode keeps the measured tile geometry (256 for the up4
            # layers, 128 otherwise) but drops the dtype/size win-gates.
            ms = _route_to_pallas(x.shape, x.dtype, up, down) \
                or (256 if up == 4 else 128)
        else:
            ms = _route_to_pallas(x.shape, x.dtype, up, down)
        if ms is not None:
            out = filtered_lrelu_mxu(x, fu, fd, b, up, down,
                                     (px0, px1, py0, py1), gain, slope,
                                     clamp, flip_filter, ms_target=ms)
            if out is not None:
                return out

    x = _bias_act_fn(x, b)
    x = _upfirdn2d_fn(x, fu, up=up, padding=[px0, px1, py0, py1],
                      gain=up ** 2, flip_filter=flip_filter)
    x = _bias_act_fn(x, act="lrelu", alpha=slope, gain=gain, clamp=clamp)
    x = _upfirdn2d_fn(x, fd, down=down, flip_filter=flip_filter)
    return x


def filtered_lrelu_output_size(in_size, fu, fd, up, down, padding):
    """Static output (h, w) for the given configuration."""
    px0, px1, py0, py1 = parse_padding(padding)
    fu_w, fu_h = filter_size(fu)
    fd_w, fd_h = filter_size(fd)
    in_h, in_w = in_size
    out_w = (in_w * up + (px0 + px1) - (fu_w - 1) - (fd_w - 1) + (down - 1)) // down
    out_h = (in_h * up + (py0 + py1) - (fu_h - 1) - (fd_h - 1) + (down - 1)) // down
    return out_h, out_w

