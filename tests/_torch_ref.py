"""Helpers to load the upstream PyTorch reference as a numerical oracle.

The reference repo (read-only, /root/reference) ships pure-PyTorch `impl='ref'`
twins of every CUDA op; we import those on CPU to validate our JAX ops
bit-for-bit in fp32.  Nothing from the reference is vendored into this repo —
tests are skipped when it is absent.
"""

import os
import sys

import pytest

REFERENCE_ROOT = "/root/reference"


def load_reference_ops():
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference repo not available")
    torch = pytest.importorskip("torch")
    if "pkg_resources" not in sys.modules:
        # The reference targets old setuptools; shim the one symbol it needs.
        import types
        from packaging.version import parse as parse_version
        shim = types.ModuleType("pkg_resources")
        shim.parse_version = parse_version
        sys.modules["pkg_resources"] = shim
    if "torchvision" not in sys.modules:
        # torchvision isn't installed; the reference only touches it from
        # legacy pix2pix dataset code paths our oracle tests never execute.
        import types
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        tv.transforms.InterpolationMode = types.SimpleNamespace(
            BICUBIC="bicubic", NEAREST="nearest")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
    if "skimage" not in sys.modules:
        # skimage isn't installed; shim the few names the reference's
        # transforms module imports (none are exercised by our oracle tests).
        import types
        from scipy.ndimage import gaussian_filter
        sk = types.ModuleType("skimage")
        sk.measure = types.ModuleType("skimage.measure")
        sk.measure.label = None
        sk.filters = types.ModuleType("skimage.filters")
        sk.filters.gaussian = lambda x, sigma: gaussian_filter(
            x.astype("float64"), sigma=sigma, mode="nearest")
        sk.segmentation = types.ModuleType("skimage.segmentation")
        sk.segmentation.find_boundaries = None
        for name, mod in [("skimage", sk), ("skimage.measure", sk.measure),
                          ("skimage.filters", sk.filters),
                          ("skimage.segmentation", sk.segmentation)]:
            sys.modules[name] = mod
    # The reference targets py3.8; restore the pre-3.10 collections aliases
    # its data/utils.py:320 relies on.
    import collections
    import collections.abc
    for name in ("Sequence", "Mapping", "Iterable"):
        if not hasattr(collections, name):
            setattr(collections, name, getattr(collections.abc, name))
    for missing in ("SimpleITK", "nibabel", "visdom", "dominate", "wandb"):
        if missing not in sys.modules:
            import types
            sys.modules[missing] = types.ModuleType(missing)
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from models.networks.stylegan3.torch_utils.ops import (  # noqa: E501
        bias_act as t_bias_act,
        filtered_lrelu as t_filtered_lrelu,
        upfirdn2d as t_upfirdn2d,
        conv2d_resample as t_conv2d_resample,
    )
    return dict(torch=torch, bias_act=t_bias_act,
                filtered_lrelu=t_filtered_lrelu, upfirdn2d=t_upfirdn2d,
                conv2d_resample=t_conv2d_resample)


def load_reference_networks():
    ops = load_reference_ops()
    from models.networks.stylegan3 import networks_stylegan3
    from models.networks.CoModGAN import generator as comod_generator
    from models.networks.CoModGAN import layers as comod_layers
    ops["networks_stylegan3"] = networks_stylegan3
    ops["comod_generator"] = comod_generator
    ops["comod_layers"] = comod_layers
    return ops
