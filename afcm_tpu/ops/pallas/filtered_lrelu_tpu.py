"""Tiled Pallas TPU kernel for filtered_lrelu (separable configurations).

Status: the fused-XLA composition in `afcm_tpu.ops.filtered_lrelu` is the
production path; this module will host the hand-tiled VMEM kernel for the
dominant (up=2, down=2, separable Kaiser) configuration.  Until the kernel
lands, `filtered_lrelu_pallas` returns None and callers fall back to XLA.
"""

from __future__ import annotations


def filtered_lrelu_pallas(x, fu, fd, b, up, down, padding, gain, slope, clamp,
                          flip_filter):
    return None
