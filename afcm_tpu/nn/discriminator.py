"""StyleGAN2 discriminator (reference: CoModGAN/generator.py:613-836).

Resnet block pyramid + minibatch-stddev epilogue, with optional projection
conditioning through a label mapping network (used for the slice-index
condition when ``c_dim > 0``).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops import downsample2d, setup_filter
from .layers import Conv2dLayer, FullyConnected, MinibatchStdLayer
from .mapping import MappingNetwork


class DiscriminatorBlock(nn.Module):
    in_channels: int
    tmp_channels: int
    out_channels: int
    resolution: int
    img_channels: int
    architecture: str = "resnet"
    activation: str = "lrelu"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None

    @nn.compact
    def __call__(self, x, img):
        if x is not None:
            assert x.shape[1:] == (self.in_channels, self.resolution,
                                   self.resolution)

        if self.in_channels == 0 or self.architecture == "skip":
            y = Conv2dLayer(self.img_channels, self.tmp_channels, kernel_size=1,
                            activation=self.activation,
                            conv_clamp=self.conv_clamp, name="fromrgb")(img)
            x = x + y if x is not None else y
            img = downsample2d(img, setup_filter(list(self.resample_filter))) \
                if self.architecture == "skip" else None

        if self.architecture == "resnet":
            y = Conv2dLayer(self.tmp_channels, self.out_channels, kernel_size=1,
                            use_bias=False, down=2,
                            resample_filter=self.resample_filter,
                            name="skip")(x, gain=np.sqrt(0.5))
            x = Conv2dLayer(self.tmp_channels, self.tmp_channels, kernel_size=3,
                            activation=self.activation,
                            conv_clamp=self.conv_clamp, name="conv0")(x)
            x = Conv2dLayer(self.tmp_channels, self.out_channels, kernel_size=3,
                            activation=self.activation, down=2,
                            resample_filter=self.resample_filter,
                            conv_clamp=self.conv_clamp,
                            name="conv1")(x, gain=np.sqrt(0.5))
            x = y + x
        else:
            x = Conv2dLayer(self.tmp_channels, self.tmp_channels, kernel_size=3,
                            activation=self.activation,
                            conv_clamp=self.conv_clamp, name="conv0")(x)
            x = Conv2dLayer(self.tmp_channels, self.out_channels, kernel_size=3,
                            activation=self.activation, down=2,
                            resample_filter=self.resample_filter,
                            conv_clamp=self.conv_clamp, name="conv1")(x)
        return x, img


class DiscriminatorEpilogue(nn.Module):
    in_channels: int
    cmap_dim: int
    resolution: int
    img_channels: int
    architecture: str = "resnet"
    mbstd_group_size: Optional[int] = 4
    mbstd_num_channels: int = 1
    activation: str = "lrelu"
    conv_clamp: Optional[float] = None

    @nn.compact
    def __call__(self, x, img, cmap):
        assert x.shape[1:] == (self.in_channels, self.resolution, self.resolution)
        x = x.astype(jnp.float32)
        if self.architecture == "skip":
            x = x + Conv2dLayer(self.img_channels, self.in_channels,
                                kernel_size=1, activation=self.activation,
                                name="fromrgb")(img.astype(jnp.float32))
        if self.mbstd_num_channels > 0:
            x = MinibatchStdLayer(group_size=self.mbstd_group_size,
                                  num_channels=self.mbstd_num_channels,
                                  name="mbstd")(x)
        x = Conv2dLayer(self.in_channels + self.mbstd_num_channels,
                        self.in_channels, kernel_size=3,
                        activation=self.activation, conv_clamp=self.conv_clamp,
                        name="conv")(x)
        x = FullyConnected(self.in_channels * self.resolution ** 2,
                           self.in_channels, activation=self.activation,
                           name="fc")(x.reshape(x.shape[0], -1))
        x = FullyConnected(self.in_channels,
                           1 if self.cmap_dim == 0 else self.cmap_dim,
                           name="out")(x)
        if self.cmap_dim > 0:
            x = jnp.sum(x * cmap, axis=1, keepdims=True) * (1 / np.sqrt(self.cmap_dim))
        return x


class CoModDiscriminator(nn.Module):
    c_dim: int
    img_resolution: int
    img_channels: int
    architecture: str = "resnet"
    channel_base: int = 32768
    channel_max: int = 512
    conv_clamp: Optional[float] = None
    cmap_dim: Optional[int] = None
    block_kwargs: Any = None
    mapping_kwargs: Any = None
    epilogue_kwargs: Any = None
    # Mixed-precision blocks (TPU analog of the reference's per-block
    # ``use_fp16`` machinery, CoModGAN/generator.py:625-638 — default off
    # there and here). Params stay f32; block activations run in this dtype
    # (Conv2dLayer casts weights to the input dtype) and the epilogue
    # restores f32 exactly like the reference's fp32 b4 block. bf16 keeps
    # f32's exponent range, so no conv_clamp is required for safety.
    compute_dtype: str = "float32"

    @property
    def block_resolutions(self) -> List[int]:
        log2res = int(np.log2(self.img_resolution))
        return [2 ** i for i in range(log2res, 2, -1)]

    def channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)

    @nn.compact
    def __call__(self, img, c=None):
        cmap_dim = self.cmap_dim if self.cmap_dim is not None else self.channels(4)
        if self.c_dim == 0:
            cmap_dim = 0

        block_kwargs = dict(self.block_kwargs or {})
        common = dict(img_channels=self.img_channels,
                      architecture=self.architecture,
                      conv_clamp=self.conv_clamp)

        x = None
        img = img.astype(jnp.dtype(self.compute_dtype))
        for res in self.block_resolutions:
            in_channels = self.channels(res) if res < self.img_resolution else 0
            x, img = DiscriminatorBlock(
                in_channels, self.channels(res), self.channels(res // 2),
                resolution=res, name=f"b{res}", **block_kwargs, **common)(x, img)

        cmap = None
        if self.c_dim > 0:
            mapping_kwargs = dict(self.mapping_kwargs or {})
            mapping_kwargs = {k: v for k, v in mapping_kwargs.items()
                              if k in ("num_layers", "lr_multiplier")}
            mapping_kwargs.setdefault("num_layers", 8)
            cmap = MappingNetwork(z_dim=0, c_dim=self.c_dim, w_dim=cmap_dim,
                                  num_ws=None, w_avg_beta=None,
                                  name="mapping", **mapping_kwargs)(None, c)

        epilogue_kwargs = dict(self.epilogue_kwargs or {})
        x = DiscriminatorEpilogue(self.channels(4), cmap_dim=cmap_dim,
                                  resolution=4, name="b4",
                                  **epilogue_kwargs, **common)(x, img, cmap)
        return x
