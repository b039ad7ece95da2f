"""Channel-attention / pixel-shuffle synthesis variants
(reference: CoModGAN/generator.py:300-541, layers.py:455-526, 742-856).

These are the CAIN-style SR alternatives selectable through
``synthesis_kwargs.name`` (CASynthesisNetwork, CAINSynthesisNetwork); they
ship in the reference unused by the published configs but are part of the
selectable surface.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .comodgan import EBlock, SynthesisBlock
from .layers import CALayer, Conv2dLayer, FullyConnected


def pixel_shuffle(x, scale_factor):
    """Pixel (un)shuffle by a power-of-2 factor (reference: layers.py:742-757)."""
    n, c, h, w = x.shape
    if scale_factor >= 1:
        s = int(scale_factor)
        oc = c // (s * s)
        x = x.reshape(n, oc, s, s, h, w)
        x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
        return x.reshape(n, oc, h * s, w * s)
    s = int(round(1 / scale_factor))
    oh, ow = h // s, w // s
    x = x.reshape(n, c, oh, s, ow, s)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))
    return x.reshape(n, c * s * s, oh, ow)


def _torch_conv_init(fan_in: float):
    """torch nn.Conv2d default kaiming_uniform(a=sqrt(5)): U[-b, b] with
    b = 1/sqrt(fan_in), fan_in = I*k*k. Computed explicitly because jax's
    variance_scaling derives fan_in from the trailing axes (assuming an
    (..., in, out) layout), which is wrong for OIHW kernels."""
    bound = 1 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class _PlainConv(nn.Module):
    """torch-default Conv2d(k3, p1) with bias. Parameters are stored at
    their torch values (no offsets) so utils/port.py stays mechanical."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        fan_in = self.in_channels * k * k
        w = self.param("weight", _torch_conv_init(fan_in),
                       (self.out_channels, self.in_channels, k, k))
        b = self.param("bias", _torch_conv_init(fan_in),
                       (self.out_channels,))
        from ..ops.modulated_conv import conv2d
        return conv2d(x, w, padding=k // 2) + \
            b[None, :, None, None].astype(x.dtype)


class ConvNorm(nn.Module):
    """Reflection-padded conv with optional instance norm
    (reference: layers.py:772-791)."""

    in_feat: int
    out_feat: int
    kernel_size: int
    stride: int = 1
    norm: bool = False

    @nn.compact
    def __call__(self, x):
        pad = self.kernel_size // 2
        x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)),
                    mode="reflect")
        from jax import lax
        from ..ops.modulated_conv import _DN
        fan_in = self.in_feat * self.kernel_size * self.kernel_size
        w = self.param("weight", _torch_conv_init(fan_in),
                       (self.out_feat, self.in_feat, self.kernel_size,
                        self.kernel_size))
        b = self.param("bias", _torch_conv_init(fan_in), (self.out_feat,))
        x = lax.conv_general_dilated(x, w.astype(x.dtype),
                                     (self.stride, self.stride),
                                     ((0, 0), (0, 0)), dimension_numbers=_DN)
        x = x + b[None, :, None, None].astype(x.dtype)
        if self.norm:
            mean = jnp.mean(x, axis=(2, 3), keepdims=True)
            var = jnp.var(x, axis=(2, 3), keepdims=True)
            x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return x


class RCAB(nn.Module):
    """Residual channel-attention block (reference: layers.py:814-840)."""

    in_feat: int
    out_feat: int
    kernel_size: int
    reduction: int = 16
    norm: bool = False
    downscale: bool = False

    @nn.compact
    def __call__(self, x):
        res = x
        h = ConvNorm(self.in_feat, self.out_feat, self.kernel_size,
                     stride=2 if self.downscale else 1, norm=self.norm,
                     name="conv0")(x)
        h = jax.nn.relu(h)
        h = ConvNorm(self.out_feat, self.out_feat, self.kernel_size,
                     stride=1, norm=self.norm, name="conv1")(h)
        h, _ = CALayer(self.out_feat, self.reduction, name="ca")(h)
        if self.downscale:
            res = ConvNorm(self.in_feat, self.out_feat, 3, stride=2,
                           name="down")(res)
        return res + h


class ResidualGroup(nn.Module):
    """Group of RCABs with a trailing conv + group skip
    (reference: layers.py:844-856)."""

    n_resblocks: int
    n_feat: int
    kernel_size: int
    reduction: int = 16
    norm: bool = False

    @nn.compact
    def __call__(self, x):
        res = x
        for i in range(self.n_resblocks):
            res = RCAB(self.n_feat, self.n_feat, self.kernel_size,
                       self.reduction, norm=self.norm, name=f"rcab{i}")(res)
        res = ConvNorm(self.n_feat, self.n_feat, self.kernel_size,
                       norm=self.norm, name="tail")(res)
        return x + res


class PixShuffleEarlyBlock(nn.Module):
    """(reference: generator.py:300-315)"""

    in_channels: int
    out_channels: int
    depth: int

    @nn.compact
    def __call__(self, x):
        parts = [pixel_shuffle(x[:, i:i + 1], 1 / 2 ** self.depth)
                 for i in range(self.in_channels)]
        x = jnp.concatenate(parts, axis=1)
        return _PlainConv(self.in_channels * 4 ** self.depth,
                          self.out_channels, name="headConv")(x)


class PixShuffleTailBlock(nn.Module):
    """(reference: generator.py:321-332)"""

    in_channels: int
    out_channels: int
    depth: int

    @nn.compact
    def __call__(self, x):
        x = _PlainConv(self.in_channels,
                       self.out_channels * 4 ** self.depth,
                       name="tailConv")(x)
        return pixel_shuffle(x, 2 ** self.depth)


class CASynthesisNetwork(nn.Module):
    """Pixel-shuffle encoder + channel-attention E-blocks + SynthesisBlocks
    (reference: generator.py:338-443)."""

    w_dim: int
    img_resolution: int
    img_channels_in: int
    img_channels_out: int
    channel_base: int = 32768
    channel_max: int = 512
    dropout_rate: float = 0.5
    skip_resolution: int = 256
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    architecture: str = "skip"
    conv_clamp: Optional[float] = None
    cond_mod: bool = False
    # Reaches the synthesis blocks via **block_kwargs in the reference
    # (generator.py:384); the encoder E_blocks hardcode it True regardless.
    channel_attention: bool = False

    inter_channels_out: int = 16  # 4**2

    def channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)

    @property
    def synth_resolution(self) -> int:
        # Synthesis runs to img_resolution/2; the pixel-shuffle tail restores
        # full resolution (keeps the generator's in/out contract, unlike the
        # reference whose tail would emit 2x the configured resolution).
        return self.img_resolution // 2

    @property
    def block_resolutions(self) -> List[int]:
        log2res = int(np.log2(self.synth_resolution))
        return [2 ** i for i in range(2, log2res + 1)]

    @property
    def num_ws(self) -> int:
        n = 1
        for res in self.block_resolutions[1:]:
            n += 2
            if res == self.synth_resolution:
                n += 1
        return n

    @property
    def skip_connects(self) -> List[bool]:
        log2res = int(np.log2(self.synth_resolution))
        if self.skip_resolution >= 4:
            final_skip = min(int(np.log2(self.skip_resolution)), log2res)
            return [True] * (final_skip - 1) + [False] * (log2res - final_skip)
        return [False] * log2res

    @nn.compact
    def __call__(self, ws, img_in, train: bool = False,
                 noise_mode: str = "random"):
        ws = ws.astype(jnp.float32)
        log2res = int(np.log2(self.img_resolution))
        ch4 = self.channels(4)
        global_w_dim = ch4 * 2

        # The depth-1 pixel-unshuffle halves the resolution; the reference
        # nevertheless runs the full-length E_block pyramid, ending at 2x2
        # against a 4x4 fc_in (generator.py:367-377) — dimensionally
        # impossible.  We run the pyramid from img_resolution/2 instead, which
        # is the consistent reading: skip features then line up with the
        # synthesis resolutions (the top block simply has no skip).
        img = PixShuffleEarlyBlock(self.img_channels_in,
                                   self.channels(self.img_resolution // 2),
                                   depth=1, name="e_fromrgb")(img_in)
        e_features: Dict[int, jnp.ndarray] = {}
        for res in range(log2res - 1, 2, -1):
            img, feat = EBlock(self.channels(2 ** res),
                               self.channels(2 ** res // 2),
                               resample_filter=self.resample_filter,
                               channel_attention=True, name=f"e_b{res}")(img)
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

        # ``resample_filter`` deliberately NOT forwarded: like the plain
        # SynthesisNetwork, the reference consumes it as a named ctor arg for
        # the E_blocks only (generator.py:348,371) — the synthesis blocks are
        # built from **block_kwargs and always run the default [1,3,3,1].
        block_kwargs = dict(w_dim=self.w_dim, global_w_dim=global_w_dim,
                            img_channels=self.inter_channels_out,
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
            block = SynthesisBlock(self.channels(res // 2), self.channels(res),
                                   resolution=res,
                                   is_last=(res == self.synth_resolution),
                                   name=f"b{res}", **block_kwargs)
            x, img = block(x, img,
                           ws[:, w_idx:w_idx + block.num_conv + block.num_torgb],
                           img_global, x_skip=e_features.get(res),
                           include_skip=skip, noise_mode=noise_mode)
            w_idx += block.num_conv
        return PixShuffleTailBlock(self.inter_channels_out,
                                   self.img_channels_out, depth=1,
                                   name="d_torgb")(img)


class CAINSynthesisNetwork(nn.Module):
    """CAIN-style residual-group SR network (reference: generator.py:448-541)."""

    w_dim: int
    img_resolution: int
    img_channels_in: int
    img_channels_out: int
    depth: int = 3
    n_resgroups: int = 5
    n_resblocks: int = 12
    reduction: int = 16
    conv_clamp: Optional[float] = None

    @property
    def num_ws(self) -> int:
        return 2 * self.n_resgroups * self.n_resblocks

    @nn.compact
    def __call__(self, ws, img_in, train: bool = False,
                 noise_mode: str = "random"):
        n_feats = 4 ** self.depth
        parts = [pixel_shuffle(img_in[:, i:i + 1], 1 / 2 ** self.depth)
                 for i in range(self.img_channels_in)]
        x = jnp.concatenate(parts, axis=1)
        x = _PlainConv(self.img_channels_in * n_feats, n_feats,
                       name="headConv")(x)

        resolution = int(self.img_resolution / 2 ** self.depth)
        ws = ws.astype(jnp.float32)
        ws_idx = 0
        global_res = x
        for g in range(self.n_resgroups):
            res_x = x
            for b in range(self.n_resblocks):
                block = SynthesisBlock(
                    n_feats, n_feats, w_dim=self.w_dim, global_w_dim=0,
                    resolution=resolution, img_channels=self.img_channels_out,
                    is_last=False, up=1, to_rgb=False, architecture="resnet",
                    conv_clamp=self.conv_clamp, cond_mod=False,
                    channel_attention=True, ca_reduction=self.reduction,
                    name=f"b{g}_{b}")
                x, _ = block(x, None, ws[:, ws_idx:ws_idx + block.num_conv],
                             None, include_skip=False, noise_mode=noise_mode)
                ws_idx += block.num_conv
            x = x + res_x
        x = x + global_res
        x = _PlainConv(n_feats, n_feats, name="tailConv")(x)
        x = jnp.tanh(x)
        return pixel_shuffle(x, 2 ** self.depth)
