"""Latent mapping networks.

One module covers both reference variants — the StyleGAN3 2-layer mapping
(reference: networks_stylegan3.py:108-164) and the StyleGAN2 8-layer mapping
(reference: CoModGAN/layers.py:539-616) — they share the identical dataflow
(z-normalize, optional label embed+normalize+concat, lrelu MLP with
lr_multiplier 0.01, w_avg EMA, broadcast, truncation) and differ only in
depth and EMA decay.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import FullyConnected, normalize_2nd_moment


class MappingNetwork(nn.Module):
    z_dim: int
    c_dim: int
    w_dim: int
    num_ws: Optional[int]
    num_layers: int = 2
    lr_multiplier: float = 0.01
    w_avg_beta: Optional[float] = 0.998

    def setup(self):
        if self.c_dim > 0:
            self.embed = FullyConnected(self.c_dim, self.w_dim, name="embed")
        in_features = self.z_dim + (self.w_dim if self.c_dim > 0 else 0)
        layers = []
        for idx in range(self.num_layers):
            layers.append(FullyConnected(
                in_features if idx == 0 else self.w_dim, self.w_dim,
                activation="lrelu", lr_multiplier=self.lr_multiplier,
                name=f"fc{idx}"))
        self.fcs = layers
        if self.num_ws is not None and self.w_avg_beta is not None:
            self.w_avg = self.variable("moments", "w_avg",
                                       lambda: jnp.zeros((self.w_dim,)))

    def __call__(self, z, c=None, truncation_psi: float = 1.0,
                 truncation_cutoff: Optional[int] = None,
                 update_w_avg: bool = False):
        x = None
        if self.z_dim > 0:
            assert z.shape[-1] == self.z_dim
            x = normalize_2nd_moment(z.astype(jnp.float32))
        if self.c_dim > 0:
            y = normalize_2nd_moment(self.embed(c.astype(jnp.float32)))
            x = jnp.concatenate([x, y], axis=1) if x is not None else y

        for layer in self.fcs:
            x = layer(x)

        if update_w_avg and self.w_avg_beta is not None and self.num_ws is not None:
            beta = self.w_avg_beta
            mean_w = jnp.mean(jax.lax.stop_gradient(x), axis=0)
            self.w_avg.value = mean_w + (self.w_avg.value - mean_w) * beta

        if self.num_ws is not None:
            x = jnp.tile(x[:, None, :], (1, self.num_ws, 1))

        if truncation_psi != 1:
            assert self.w_avg_beta is not None
            w_avg = self.w_avg.value
            if self.num_ws is None or truncation_cutoff is None:
                x = w_avg + (x - w_avg) * truncation_psi
            else:
                trunc = w_avg + (x[:, :truncation_cutoff] - w_avg) * truncation_psi
                x = x.at[:, :truncation_cutoff].set(trunc)
        return x
