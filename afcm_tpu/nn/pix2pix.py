"""pix2pix baseline networks: UNet generator + PatchGAN discriminator.

The reference inherits these from pytorch-CycleGAN-and-pix2pix as its
Pix2PixModel baseline (reference: models/pix2pix_model.py; its `define_G`
no longer ships the unet networks, leaving the baseline configs dangling —
here they are implemented so the pix2pix config surface actually runs).

Architecture follows upstream pix2pix: UnetSkipConnectionBlock recursion
(conv k4 s2 / deconv k4 s2, norm + ReLU/LeakyReLU, dropout on the three
innermost decoder stages) and the 70x70 PatchGAN.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                 ("NCHW", "OIHW", "NCHW"))


def _conv(x, w, stride=2, padding=1):
    return lax.conv_general_dilated(x, w.astype(x.dtype), (stride, stride),
                                    ((padding, padding), (padding, padding)),
                                    dimension_numbers=_DN)


def _deconv(x, w, stride=2):
    """torch ConvTranspose2d(k=4, s=2, p=1) => output = in*2.

    `w` uses the torch transposed layout [in, out, kh, kw]; equivalent
    direct form: zero-stuff by stride, pad k-1-p = 2, correlate with the
    flipped kernel."""
    kernel = jnp.transpose(w, (1, 0, 2, 3)).astype(x.dtype)[:, :, ::-1, ::-1]
    return lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(stride, stride), dimension_numbers=_DN)


class _Norm(nn.Module):
    """batch | instance | none normalization over NCHW feature maps."""

    features: int
    kind: str = "batch"
    # BatchNorm gamma ~ N(1, init_gain) for every init policy
    # (reference: models/utils.py:99-101).
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.kind == "none":
            return x
        if self.kind == "instance":
            mean = jnp.mean(x, axis=(2, 3), keepdims=True)
            var = jnp.var(x, axis=(2, 3), keepdims=True)
            return (x - mean) * jax.lax.rsqrt(var + 1e-5)
        # batch norm with running stats (affine). gamma is stored at its
        # torch value (N(1, init_gain), reference models/utils.py:99-101) —
        # no call-time offset, so state_dict ports stay value-mechanical.
        gain = self.init_gain

        def gamma_init(key, shape, dtype=jnp.float32):
            return 1.0 + gain * jax.random.normal(key, shape, dtype)

        scale = self.param("scale", gamma_init, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,)))
        if train:
            mean = jnp.mean(x, axis=(0, 2, 3))
            var = jnp.var(x, axis=(0, 2, 3))
            momentum = 0.1
            if not self.is_initializing():
                ra_mean.value = (1 - momentum) * ra_mean.value + momentum * mean
                ra_var.value = (1 - momentum) * ra_var.value + momentum * var
        else:
            mean, var = ra_mean.value, ra_var.value
        x = (x - mean[None, :, None, None]) * \
            jax.lax.rsqrt(var[None, :, None, None] + 1e-5)
        return x * scale[None, :, None, None] + bias[None, :, None, None]


def make_weight_init(init_type: str = "normal", init_gain: float = 0.02):
    """Weight initializers for torch-layout [out, in, *k] kernels
    (reference: models/utils.py:72-110 — normal | xavier | kaiming |
    orthogonal; kaiming ignores the gain like torch's kaiming_normal_)."""

    def init(key, shape, dtype=jnp.float32):
        rf = int(np.prod(shape[2:])) if len(shape) > 2 else 1
        fan_in = (shape[1] if len(shape) > 1 else shape[0]) * rf
        fan_out = shape[0] * rf
        if init_type == "normal":
            return jax.random.normal(key, shape, dtype) * init_gain
        if init_type == "xavier":
            std = init_gain * np.sqrt(2.0 / (fan_in + fan_out))
            return jax.random.normal(key, shape, dtype) * std
        if init_type == "kaiming":
            return jax.random.normal(key, shape, dtype) * \
                np.sqrt(2.0 / fan_in)
        if init_type == "orthogonal":
            flat = jax.nn.initializers.orthogonal(
                scale=init_gain, column_axis=0)(
                key, (shape[0], int(np.prod(shape[1:]))), dtype)
            return flat.reshape(shape)
        raise NotImplementedError(
            f"initialization method [{init_type}] is not implemented")

    return init


class UnetSkipConnectionBlock(nn.Module):
    outer_nc: int
    inner_nc: int
    input_nc: Optional[int] = None
    submodule: Optional[nn.Module] = None
    outermost: bool = False
    innermost: bool = False
    norm: str = "batch"
    use_dropout: bool = False
    init_type: str = "normal"
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x, train: bool = True):
        _winit = make_weight_init(self.init_type, self.init_gain)
        input_nc = self.input_nc if self.input_nc is not None else self.outer_nc
        use_bias = self.norm == "instance"

        down_w = self.param("down_w", _winit, (self.inner_nc, input_nc, 4, 4))
        h = x
        if not self.outermost:
            h = jnp.where(h >= 0, h, 0.2 * h)  # leaky relu before down conv
        h = _conv(h, down_w)
        if use_bias:  # upstream builds every downconv with bias=use_bias
            down_b = self.param("down_b", nn.initializers.zeros, (self.inner_nc,))
            h = h + down_b[None, :, None, None]
        if not (self.outermost or self.innermost):
            h = _Norm(self.inner_nc, self.norm, self.init_gain,
                      name="down_norm")(h, train)

        if self.submodule is not None:
            h = self.submodule(h, train=train)

        h = jax.nn.relu(h)
        up_in = self.inner_nc if self.innermost else self.inner_nc * 2
        up_w = self.param("up_w", _winit, (up_in, self.outer_nc, 4, 4))
        h = _deconv(h, up_w)
        if self.outermost:
            up_b = self.param("up_b", nn.initializers.zeros, (self.outer_nc,))
            h = jnp.tanh(h + up_b[None, :, None, None])
            return h
        if use_bias:
            up_b = self.param("up_b", nn.initializers.zeros, (self.outer_nc,))
            h = h + up_b[None, :, None, None]
        h = _Norm(self.outer_nc, self.norm, self.init_gain,
                  name="up_norm")(h, train)
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=not train)(h)
        return jnp.concatenate([x, h], axis=1)


class UnetGenerator(nn.Module):
    """unet_256: 8 downsamplings (reference config: model.G.netG unet_256)."""

    input_nc: int
    output_nc: int
    num_downs: int = 8
    ngf: int = 64
    norm: str = "batch"
    use_dropout: bool = True
    init_type: str = "normal"
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x, train: bool = True):
        ngf = self.ngf
        init = dict(init_type=self.init_type, init_gain=self.init_gain)
        block = UnetSkipConnectionBlock(ngf * 8, ngf * 8, innermost=True,
                                        norm=self.norm, name="inner", **init)
        for i in range(self.num_downs - 5):
            block = UnetSkipConnectionBlock(
                ngf * 8, ngf * 8, submodule=block, norm=self.norm,
                use_dropout=self.use_dropout, name=f"mid{i}", **init)
        block = UnetSkipConnectionBlock(ngf * 4, ngf * 8, submodule=block,
                                        norm=self.norm, name="up4", **init)
        block = UnetSkipConnectionBlock(ngf * 2, ngf * 4, submodule=block,
                                        norm=self.norm, name="up2", **init)
        block = UnetSkipConnectionBlock(ngf, ngf * 2, submodule=block,
                                        norm=self.norm, name="up1", **init)
        block = UnetSkipConnectionBlock(self.output_nc, ngf,
                                        input_nc=self.input_nc,
                                        submodule=block, outermost=True,
                                        norm=self.norm, name="outer", **init)
        return block(x, train=train)


class NLayerDiscriminator(nn.Module):
    """70x70 PatchGAN (reference config: model.D.netD basic, n_layers 3)."""

    input_nc: int
    ndf: int = 64
    n_layers: int = 3
    norm: str = "batch"
    init_type: str = "normal"
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x, train: bool = True):
        _winit = make_weight_init(self.init_type, self.init_gain)
        use_bias = self.norm == "instance"
        w = self.param("w0", _winit, (self.ndf, self.input_nc, 4, 4))
        b = self.param("b0", nn.initializers.zeros, (self.ndf,))
        x = _conv(x, w) + b[None, :, None, None]
        x = jnp.where(x >= 0, x, 0.2 * x)

        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_prev, nf_mult = nf_mult, min(2 ** n, 8)
            w = self.param(f"w{n}", _winit,
                           (self.ndf * nf_mult, self.ndf * nf_prev, 4, 4))
            x = _conv(x, w)
            if use_bias:
                b = self.param(f"b{n}", nn.initializers.zeros,
                               (self.ndf * nf_mult,))
                x = x + b[None, :, None, None]
            x = _Norm(self.ndf * nf_mult, self.norm, self.init_gain,
                      name=f"norm{n}")(x, train)
            x = jnp.where(x >= 0, x, 0.2 * x)

        nf_prev, nf_mult = nf_mult, min(2 ** self.n_layers, 8)
        w = self.param("w_last", _winit,
                       (self.ndf * nf_mult, self.ndf * nf_prev, 4, 4))
        x = _conv(x, w, stride=1)
        if use_bias:
            b = self.param("b_last", nn.initializers.zeros,
                           (self.ndf * nf_mult,))
            x = x + b[None, :, None, None]
        x = _Norm(self.ndf * nf_mult, self.norm, self.init_gain,
                  name="norm_last")(x, train)
        x = jnp.where(x >= 0, x, 0.2 * x)

        w = self.param("w_out", _winit, (1, self.ndf * nf_mult, 4, 4))
        b = self.param("b_out", nn.initializers.zeros, (1,))
        return _conv(x, w, stride=1) + b[None, :, None, None]


class PixelDiscriminator(nn.Module):
    """1x1 PixelGAN discriminator."""

    input_nc: int
    ndf: int = 64
    norm: str = "batch"
    init_type: str = "normal"
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x, train: bool = True):
        _winit = make_weight_init(self.init_type, self.init_gain)
        w = self.param("w0", _winit, (self.ndf, self.input_nc, 1, 1))
        b = self.param("b0", nn.initializers.zeros, (self.ndf,))
        x = _conv(x, w, stride=1, padding=0) + b[None, :, None, None]
        x = jnp.where(x >= 0, x, 0.2 * x)
        use_bias = self.norm == "instance"
        w = self.param("w1", _winit, (self.ndf * 2, self.ndf, 1, 1))
        x = _conv(x, w, stride=1, padding=0)
        if use_bias:
            b = self.param("b1", nn.initializers.zeros, (self.ndf * 2,))
            x = x + b[None, :, None, None]
        x = _Norm(self.ndf * 2, self.norm, self.init_gain,
                  name="norm1")(x, train)
        x = jnp.where(x >= 0, x, 0.2 * x)
        w = self.param("w2", _winit, (1, self.ndf * 2, 1, 1))
        x = _conv(x, w, stride=1, padding=0)
        if use_bias:
            b = self.param("b2", nn.initializers.zeros, (1,))
            x = x + b[None, :, None, None]
        return x
