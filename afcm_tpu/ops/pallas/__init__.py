"""Pallas TPU kernels for the hot alias-free ops.

The entry points return ``None`` when a configuration is unsupported so the
callers can fall back to the fused-XLA composition.

History: rounds 1-2 tried a polyphase whole-image kernel (v1) and a
channels-on-lanes shift kernel (v2); both validated numerically but lost to
the XLA conv emitter (0.30-0.87x) and were cut. The surviving kernel is the
fused block-banded MXU chain (filtered_lrelu_mxu), which wins on the
lane-starved low-channel large-spatial layers in bf16 and carries a
custom_vjp for training. See docs/performance.md for the measured tables.
"""

from .filtered_lrelu_mxu import filtered_lrelu_mxu

__all__ = ["filtered_lrelu_mxu"]
