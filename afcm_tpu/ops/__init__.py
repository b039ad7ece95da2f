"""Functional signal-processing ops for the alias-free compute path.

Every op mirrors a CUDA extension from the reference (see SURVEY.md §2.5) but
is designed for XLA/TPU: fused `conv_general_dilated` forms by default, with
optional Pallas kernels for the hottest configurations.
"""

from .bias_act import activation_funcs, bias_act
from .conv2d_resample import conv2d_resample
from .filter_design import design_lowpass_filter, filter_size, setup_filter
from .filtered_lrelu import filtered_lrelu, filtered_lrelu_output_size
from .grid_sample import grid_sample
from .modulated_conv import (conv2d, fma, get_conv_impl, modulated_conv2d,
                             modulated_conv2d_resample, set_conv_impl)
from .upfirdn2d import (downsample2d, filter2d, gaussian_blur2d, upfirdn2d,
                        upsample2d)

__all__ = [
    "activation_funcs", "bias_act", "conv2d", "conv2d_resample",
    "design_lowpass_filter", "downsample2d", "filter2d", "filter_size",
    "filtered_lrelu", "filtered_lrelu_output_size", "fma", "gaussian_blur2d",
    "get_conv_impl", "set_conv_impl",
    "modulated_conv2d", "modulated_conv2d_resample", "setup_filter",
    "upfirdn2d", "upsample2d",
]
