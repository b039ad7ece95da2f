"""Pallas TPU kernels for the hot alias-free ops.

The entry points return ``None`` when a configuration is unsupported so the
callers can fall back to the fused-XLA composition.
"""

from .filtered_lrelu_tpu import filtered_lrelu_pallas

__all__ = ["filtered_lrelu_pallas"]
