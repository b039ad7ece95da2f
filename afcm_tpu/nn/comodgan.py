"""Co-modulated StyleGAN2 generator branch (reference: models/networks/CoModGAN).

Encoder pyramid -> 1024-d global co-modulation vector -> skip-architecture
synthesis blocks whose mod vector is ``concat(w, global)``.  All resampling
runs through the fused `conv2d_resample` / `upfirdn2d` ops.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import (modulated_conv2d_resample, setup_filter, upsample2d)
from ..ops.bias_act import activation_funcs, bias_act
from .layers import CALayer, Conv2dLayer, FullyConnected, _normal_init
from .mapping import MappingNetwork


class EFromRGB(nn.Module):
    """fromRGB 1x1 conv (reference: CoModGAN/layers.py:214-223)."""

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x, y):
        t = Conv2dLayer(self.in_channels, self.out_channels, kernel_size=1,
                        activation="lrelu", name="con_layer")(y)
        return t if x is None else x + t


class EBlock(nn.Module):
    """Two convs with down=2; records the pre-downsample feature for skips
    (reference: CoModGAN/layers.py:228-248)."""

    tmp_channels: int
    out_channels: int
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    channel_attention: bool = False

    @nn.compact
    def __call__(self, x):
        x = Conv2dLayer(self.tmp_channels, self.tmp_channels, kernel_size=3,
                        activation="lrelu", name="conv_layer0")(x)
        feature = x
        x = Conv2dLayer(self.tmp_channels, self.out_channels, kernel_size=3,
                        activation="lrelu", down=2,
                        resample_filter=self.resample_filter,
                        name="conv_layer1")(x)
        if self.channel_attention:
            # E_block hardcodes reduction=16 (layers.py:239).
            x, _ = CALayer(self.out_channels, reduction=16, name="ca")(x)
        return x, feature


class SynthesisLayerSG2(nn.Module):
    """Modulated conv + noise + lrelu (reference: CoModGAN/layers.py:253-305)."""

    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    kernel_size: int = 3
    up: int = 1
    use_noise: bool = True
    activation: str = "lrelu"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None

    @nn.compact
    def __call__(self, x, w, noise_mode: str = "random", gain: float = 1.0):
        assert noise_mode in ("random", "const", "none")
        styles = FullyConnected(self.w_dim, self.in_channels, bias_init=1.0,
                                name="affine")(w)
        weight = self.param("weight", _normal_init(1.0),
                            (self.out_channels, self.in_channels,
                             self.kernel_size, self.kernel_size))

        noise = None
        if self.use_noise:
            noise_const = self.variable(
                "constants", "noise_const",
                lambda: jax.random.normal(self.make_rng("params"),
                                          (self.resolution, self.resolution)))
            noise_strength = self.param("noise_strength", nn.initializers.zeros, ())
            if noise_mode == "random":
                noise = jax.random.normal(
                    self.make_rng("noise"),
                    (x.shape[0], 1, self.resolution, self.resolution)) * noise_strength
            elif noise_mode == "const":
                noise = noise_const.value * noise_strength

        f = setup_filter(list(self.resample_filter))
        x = modulated_conv2d_resample(
            x, weight, styles, noise=noise, up=self.up,
            padding=self.kernel_size // 2, resample_filter=f,
            flip_weight=(self.up == 1))

        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, b.astype(x.dtype), act=self.activation,
                        gain=act_gain, clamp=act_clamp)


class ToRGBLayer(nn.Module):
    """1x1 modulated conv without demodulation (reference: layers.py:310-325)."""

    in_channels: int
    out_channels: int
    w_dim: int
    kernel_size: int = 1
    conv_clamp: Optional[float] = None

    @nn.compact
    def __call__(self, x, w):
        weight_gain = 1 / np.sqrt(self.in_channels * self.kernel_size ** 2)
        styles = FullyConnected(self.w_dim, self.in_channels, bias_init=1.0,
                                name="affine")(w) * weight_gain
        weight = self.param("weight", _normal_init(1.0),
                            (self.out_channels, self.in_channels,
                             self.kernel_size, self.kernel_size))
        x = modulated_conv2d_resample(x, weight, styles, demodulate=False,
                                      padding=self.kernel_size // 2)
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        return bias_act(x, b.astype(x.dtype), clamp=self.conv_clamp)


class SynthesisBlock(nn.Module):
    """Skip-architecture block with co-modulation
    (reference: CoModGAN/layers.py:330-450).

    Reference quirk preserved: a single w (the block's first) modulates conv0,
    conv1 *and* torgb (layers.py:414-417 — `next(w_iter)` is called once).
    """

    in_channels: int
    out_channels: int
    w_dim: int
    global_w_dim: int
    resolution: int
    img_channels: int
    is_last: bool
    up: int = 2
    to_rgb: bool = True
    architecture: str = "skip"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    cond_mod: bool = False
    early_channels: int = 0
    channel_attention: bool = False
    # CALayer squeeze ratio when channel_attention is on (the reference's
    # plain SynthesisBlock hardcodes 16, layers.py:393; CASynthesisBlock
    # exposes it as ``reduction``, layers.py:472 — CAIN configs set it).
    ca_reduction: int = 16

    @property
    def num_conv(self) -> int:
        return (1 if self.in_channels != 0 else 0) + 1

    @property
    def num_torgb(self) -> int:
        return 1 if self.to_rgb and (self.is_last or self.architecture == "skip") else 0

    @nn.compact
    def __call__(self, x, img, ws, global_w, x_skip=None, include_skip=True,
                 noise_mode: str = "random"):
        mod_dim = self.w_dim + (self.global_w_dim if self.cond_mod else 0)
        if self.cond_mod:
            mod_vector = jnp.concatenate([ws[:, 0], global_w], axis=1)
        else:
            mod_vector = ws[:, 0]

        layer_kwargs = dict(w_dim=mod_dim, resolution=self.resolution,
                            resample_filter=self.resample_filter,
                            conv_clamp=self.conv_clamp)

        if self.in_channels == 0:
            conv1_in = self.early_channels if self.early_channels > 0 else self.out_channels
            x = SynthesisLayerSG2(conv1_in, self.out_channels, name="conv1",
                                  **layer_kwargs)(x, mod_vector,
                                                  noise_mode=noise_mode)
        elif self.architecture == "resnet":
            y = Conv2dLayer(self.in_channels, self.out_channels, kernel_size=1,
                            use_bias=False, up=self.up,
                            resample_filter=self.resample_filter,
                            name="skip")(x, gain=np.sqrt(0.5))
            x = SynthesisLayerSG2(self.in_channels, self.out_channels,
                                  up=self.up, name="conv0",
                                  **layer_kwargs)(x, mod_vector,
                                                  noise_mode=noise_mode)
            if include_skip and x_skip is not None:
                x = x + x_skip.astype(x.dtype)
            x = SynthesisLayerSG2(self.out_channels, self.out_channels,
                                  name="conv1", **layer_kwargs)(
                x, mod_vector, noise_mode=noise_mode, gain=np.sqrt(0.5))
            if self.channel_attention:
                x, _ = CALayer(self.out_channels, reduction=self.ca_reduction,
                                name="ca")(x)
            x = y + x
        else:
            x = SynthesisLayerSG2(self.in_channels, self.out_channels,
                                  up=self.up, name="conv0",
                                  **layer_kwargs)(x, mod_vector,
                                                  noise_mode=noise_mode)
            if include_skip and x_skip is not None:
                x = x + x_skip.astype(x.dtype)
            x = SynthesisLayerSG2(self.out_channels, self.out_channels,
                                  name="conv1", **layer_kwargs)(
                x, mod_vector, noise_mode=noise_mode)
            if self.channel_attention:
                x, _ = CALayer(self.out_channels, reduction=self.ca_reduction,
                                name="ca")(x)

        if img is not None:
            img = upsample2d(img, setup_filter(list(self.resample_filter)))
        if self.is_last or self.architecture == "skip":
            y = ToRGBLayer(self.out_channels, self.img_channels, w_dim=mod_dim,
                           conv_clamp=self.conv_clamp, name="torgb")(x, mod_vector)
            y = y.astype(jnp.float32)
            img = img + y if img is not None else y
        return x, img


class CoModSynthesisNetwork(nn.Module):
    """Encoder pyramid + global vector + synthesis blocks
    (reference: CoModGAN/generator.py:29-125)."""

    w_dim: int
    img_resolution: int
    img_channels_in: int
    img_channels_out: int
    channel_base: int = 32768
    channel_max: int = 512
    dropout_rate: float = 0.5
    skip_resolution: int = 256
    channel_attention: bool = False
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    architecture: str = "skip"
    conv_clamp: Optional[float] = None
    cond_mod: bool = False

    @property
    def block_resolutions(self) -> List[int]:
        log2res = int(np.log2(self.img_resolution))
        return [2 ** i for i in range(2, log2res + 1)]

    def channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)

    @property
    def num_ws(self) -> int:
        n = 1  # block_early: in_channels == 0 -> one conv
        for res in self.block_resolutions[1:]:
            n += 2
            if res == self.img_resolution:
                n += 1  # torgb of the last block
        return n

    @property
    def skip_connects(self) -> List[bool]:
        log2res = int(np.log2(self.img_resolution))
        if self.skip_resolution >= 4:
            final_skip = int(np.log2(self.skip_resolution))
            return [True] * (final_skip - 1) + [False] * (log2res - final_skip)
        return [False] * log2res

    @nn.compact
    def __call__(self, ws, img_in, train: bool = False,
                 noise_mode: str = "random"):
        assert ws.shape[1:] == (self.num_ws, self.w_dim)
        ws = ws.astype(jnp.float32)
        log2res = int(np.log2(self.img_resolution))
        ch4 = self.channels(4)
        global_w_dim = ch4 * 2

        # Encoder pyramid.
        e_features: Dict[int, jnp.ndarray] = {}
        x = None
        img = img_in
        for res in range(log2res, 2, -1):
            if res == log2res:
                img = EFromRGB(self.img_channels_in, self.channels(2 ** res),
                               name="e_fromrgb")(x, img)
            # channel_attention applies to the synthesis blocks only: the
            # reference builds these E_blocks without it (generator.py:61
            # passes no channel_attention; only CASynthesisNetwork's encoder
            # hardcodes it, generator.py:372 — mirrored in ca_variants.py).
            img, feat = EBlock(self.channels(2 ** res),
                               self.channels(2 ** res // 2),
                               resample_filter=self.resample_filter,
                               name=f"e_b{res}")(img)
            e_features[2 ** res] = feat

        img = Conv2dLayer(ch4, ch4, kernel_size=3, activation="lrelu",
                          name="e_4x4")(img)
        e_features[4] = img
        pooled = FullyConnected(ch4 * 16, global_w_dim, activation="lrelu",
                                name="fc_in")(img.reshape(img.shape[0], -1))
        pooled = nn.Dropout(rate=self.dropout_rate,
                            deterministic=not train)(pooled)
        img_global = pooled
        seed = FullyConnected(global_w_dim, ch4 * 16, activation="lrelu",
                              name="fc_out")(pooled)
        seed = seed.reshape(-1, ch4, 4, 4)
        if self.skip_connects[0]:
            seed = seed + e_features[4]

        # Synthesis blocks. ``resample_filter`` deliberately NOT forwarded:
        # in the reference it is a named SynthesisNetwork arg consumed by the
        # E_blocks only (generator.py:61) — the synthesis blocks are built
        # without it (generator.py:69,78) so they always run the default
        # [1,3,3,1], and a config-supplied filter can never reach
        # **block_kwargs. Quirk preserved (verified by
        # scripts/fuzz_generator_parity.py with resample_filter=[1,2,1]).
        block_kwargs = dict(w_dim=self.w_dim, global_w_dim=global_w_dim,
                            img_channels=self.img_channels_out,
                            architecture=self.architecture,
                            conv_clamp=self.conv_clamp, cond_mod=self.cond_mod,
                            channel_attention=self.channel_attention)
        w_idx = 0
        block = SynthesisBlock(0, ch4, resolution=4, is_last=False,
                               name="block_early", **block_kwargs)
        x, img = block(seed, None, ws[:, w_idx:w_idx + 1], img_global,
                       noise_mode=noise_mode)
        w_idx += block.num_conv

        for res, skip in zip(self.block_resolutions[1:], self.skip_connects[1:]):
            block = SynthesisBlock(
                self.channels(res // 2), self.channels(res), resolution=res,
                is_last=(res == self.img_resolution), name=f"b{res}",
                **block_kwargs)
            x, img = block(x, img, ws[:, w_idx:w_idx + block.num_conv + block.num_torgb],
                           img_global, x_skip=e_features.get(res),
                           include_skip=skip, noise_mode=noise_mode)
            w_idx += block.num_conv
        return img


class RefMappingNetwork(nn.Module):
    """Image -> w mapping via an encoder pyramid
    (reference: CoModGAN/layers.py:619-664)."""

    img_resolution: int
    img_channels: int
    w_dim: int
    num_ws: Optional[int]
    channel_base: int = 32768
    channel_max: int = 512
    resample_filter: Sequence[int] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, z=None, c=None, img_in=None, **kwargs):
        assert img_in is not None
        log2res = int(np.log2(self.img_resolution))
        chans = lambda res: min(self.channel_base // res, self.channel_max)
        x = None
        img = img_in
        for res in range(log2res, 2, -1):
            if res == log2res:
                img = EFromRGB(self.img_channels, chans(2 ** res),
                               name="e_fromrgb")(x, img)
            img, _ = EBlock(chans(2 ** res), chans(2 ** res // 2),
                            resample_filter=self.resample_filter,
                            name=f"e_b{res}")(img)
        img = Conv2dLayer(chans(4), chans(4), kernel_size=3,
                          activation="lrelu", name="e_4x4")(img)
        x = FullyConnected(chans(4) * 16, self.w_dim, activation="lrelu",
                           name="fc_in")(img.reshape(img.shape[0], -1))
        if self.num_ws is not None:
            x = jnp.tile(x[:, None, :], (1, self.num_ws, 1))
        return x


def get_synthesizer(name: str):
    """Synthesizer registry (reference: generator.py:21-24 uses reflection;
    here the families are a closed set)."""
    if name == "SynthesisNetwork":
        return CoModSynthesisNetwork
    if name == "CASynthesisNetwork":
        from .ca_variants import CASynthesisNetwork
        return CASynthesisNetwork
    if name == "CAINSynthesisNetwork":
        from .ca_variants import CAINSynthesisNetwork
        return CAINSynthesisNetwork
    if name == "MotionSynthesisNetwork":
        from .motion import MotionSynthesisNetwork
        return MotionSynthesisNetwork
    raise NotImplementedError(f"synthesizer {name}")


class CoModGenerator(nn.Module):
    """mapping + co-modulated synthesis (reference: generator.py:545-572)."""

    z_dim: int
    c_dim: int
    w_dim: int
    img_resolution: int
    img_channels_in: int
    img_channels_out: int
    mapping_kwargs: Any = None
    synthesis_kwargs: Any = None

    def setup(self):
        synthesis_kwargs = dict(self.synthesis_kwargs or {})
        synth_name = synthesis_kwargs.pop("name", "SynthesisNetwork")
        synthesis_cls = get_synthesizer(synth_name)
        self.synthesis = synthesis_cls(
            w_dim=self.w_dim, img_resolution=self.img_resolution,
            img_channels_in=self.img_channels_in,
            img_channels_out=self.img_channels_out, **synthesis_kwargs)

        mapping_kwargs = dict(self.mapping_kwargs or {})
        mapper_name = mapping_kwargs.pop("name", "MappingNetwork")
        self.mapper_name = mapper_name
        if mapper_name == "MappingNetwork":
            mapping_kwargs = {k: v for k, v in mapping_kwargs.items()
                              if k in ("num_layers", "lr_multiplier", "w_avg_beta")}
            mapping_kwargs.setdefault("num_layers", 8)
            mapping_kwargs.setdefault("w_avg_beta", 0.995)
            self.mapping = MappingNetwork(
                z_dim=self.z_dim, c_dim=self.c_dim, w_dim=self.w_dim,
                num_ws=self.synthesis.num_ws, **mapping_kwargs)
        elif mapper_name == "RefMappingNetwork":
            self.mapping = RefMappingNetwork(
                w_dim=self.w_dim, num_ws=self.synthesis.num_ws, **mapping_kwargs)
        else:
            raise NotImplementedError(mapper_name)

    def __call__(self, z, c, cond_img, ref_img=None, truncation_psi: float = 1.0,
                 truncation_cutoff=None, train: bool = False,
                 update_emas: bool = False, noise_mode: str = "random"):
        if self.mapper_name == "RefMappingNetwork":
            ws = self.mapping(img_in=ref_img)
        else:
            ws = self.mapping(z, c, truncation_psi=truncation_psi,
                              truncation_cutoff=truncation_cutoff,
                              update_w_avg=train)
        return self.synthesis(ws, cond_img, train=train, noise_mode=noise_mode)
