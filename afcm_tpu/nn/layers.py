"""Shared equalized-LR building blocks (flax.linen).

Numerical semantics follow the reference layers (reference:
models/networks/CoModGAN/layers.py:81-162 FullyConnectedLayer/Conv2dLayer,
generator.py:696-718 MinibatchStdLayer, layers.py:795-811 CALayer), with
parameterization identical up to RNG: weights are stored at
``randn * weight_init / lr_multiplier`` scale and multiplied by the equalized
gain at call time, so ported checkpoints are drop-in.

Precision note: all dense/conv math inherits `jax.default_matmul_precision`;
wrap strict-parity evaluation in ``jax.default_matmul_precision('highest')``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import bias_act, conv2d_resample, setup_filter
from ..ops.bias_act import activation_funcs


def _normal_init(stddev: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * stddev
    return init


class FullyConnected(nn.Module):
    """Equalized-LR dense layer with fused bias+activation."""

    in_features: int
    out_features: int
    activation: str = "linear"
    use_bias: bool = True
    lr_multiplier: float = 1.0
    weight_init: float = 1.0
    bias_init: Union[float, Sequence[float]] = 0.0

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight", _normal_init(self.weight_init / self.lr_multiplier),
            (self.out_features, self.in_features))
        weight_gain = self.lr_multiplier / np.sqrt(self.in_features)
        w = w.astype(x.dtype) * weight_gain

        b = None
        if self.use_bias:
            init_val = np.broadcast_to(
                np.asarray(self.bias_init, dtype=np.float32) / self.lr_multiplier,
                (self.out_features,))
            b = self.param("bias", lambda key: jnp.asarray(init_val))
            b = b.astype(x.dtype)
            if self.lr_multiplier != 1:
                b = b * self.lr_multiplier

        x = x @ w.T
        if self.activation == "linear":
            if b is not None:
                x = x + b
            return x
        return bias_act(x, b, act=self.activation)


class Conv2dLayer(nn.Module):
    """Equalized-LR conv with optional fused FIR up/downsampling."""

    in_channels: int
    out_channels: int
    kernel_size: int
    use_bias: bool = True
    activation: str = "linear"
    up: int = 1
    down: int = 1
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None

    @nn.compact
    def __call__(self, x, gain: float = 1.0):
        k = self.kernel_size
        w = self.param("weight", _normal_init(1.0),
                       (self.out_channels, self.in_channels, k, k))
        weight_gain = 1 / np.sqrt(self.in_channels * k * k)
        f = setup_filter(list(self.resample_filter))
        x = conv2d_resample(x, w.astype(x.dtype) * weight_gain, f=f,
                            up=self.up, down=self.down, padding=k // 2,
                            flip_weight=(self.up == 1))

        b = self.param("bias", nn.initializers.zeros,
                       (self.out_channels,)) if self.use_bias else None
        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, None if b is None else b.astype(x.dtype),
                        act=self.activation, gain=act_gain, clamp=act_clamp)


class MinibatchStdLayer(nn.Module):
    """Cross-sample stddev feature channel for the discriminator epilogue."""

    group_size: Optional[int] = 4
    num_channels: int = 1

    @nn.compact
    def __call__(self, x):
        N, C, H, W = x.shape
        G = min(self.group_size, N) if self.group_size is not None else N
        F = self.num_channels
        c = C // F
        y = x.reshape(G, -1, F, c, H, W)
        y = y - jnp.mean(y, axis=0)
        y = jnp.mean(jnp.square(y), axis=0)
        y = jnp.sqrt(y + 1e-8)
        y = jnp.mean(y, axis=(2, 3, 4))
        y = y.reshape(-1, F, 1, 1)
        y = jnp.tile(y, (G, 1, H, W))
        return jnp.concatenate([x, y.astype(x.dtype)], axis=1)


def _torch_default_init(fan_in: int):
    """torch nn.Conv2d/Linear default: kaiming_uniform(a=sqrt(5)) kernels
    and U[-1/sqrt(fan_in), 1/sqrt(fan_in)] biases — both reduce to the
    same uniform bound."""
    bound = 1 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class CALayer(nn.Module):
    """Squeeze-excite channel attention (RCAB-style).

    The reference builds conv_du from plain 1x1 nn.Conv2d layers
    (reference: CoModGAN/layers.py:795-811), so the Dense layers here use
    torch's default init (uniform kernel AND bias) rather than flax's
    lecun_normal/zeros — keeps training-from-init dynamics comparable."""

    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        mid = self.channels // self.reduction
        y = jnp.mean(x, axis=(2, 3), keepdims=True)          # [N, C, 1, 1]
        y = y[:, :, 0, 0]
        y = nn.Dense(mid, name="down",
                     kernel_init=_torch_default_init(self.channels),
                     bias_init=_torch_default_init(self.channels))(y)
        y = jax.nn.relu(y)
        y = nn.Dense(self.channels, name="up",
                     kernel_init=_torch_default_init(mid),
                     bias_init=_torch_default_init(mid))(y)
        y = jax.nn.sigmoid(y)[:, :, None, None]
        return x * y, y


def adaptive_avg_pool2d(x, output_size):
    """NCHW adaptive average pooling (exact for divisible sizes, general otherwise)."""
    oh, ow = output_size
    N, C, H, W = x.shape
    if H % oh == 0 and W % ow == 0:
        x = x.reshape(N, C, oh, H // oh, ow, W // ow)
        return jnp.mean(x, axis=(3, 5))
    # General case: torch-style bin edges floor(i*H/oh) .. ceil((i+1)*H/oh).
    out = []
    for i in range(oh):
        h0, h1 = (i * H) // oh, -(-((i + 1) * H) // oh)
        row = []
        for j in range(ow):
            w0, w1 = (j * W) // ow, -(-((j + 1) * W) // ow)
            row.append(jnp.mean(x[:, :, h0:h1, w0:w1], axis=(2, 3)))
        out.append(jnp.stack(row, axis=-1))
    return jnp.stack(out, axis=-2)


def normalize_2nd_moment(x, axis: int = 1, eps: float = 1e-8):
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)
