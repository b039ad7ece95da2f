"""Training state for the conditional GAN models.

Replaces the reference's BaseModel attribute soup (netG / netD / netG_ema /
two torch optimizers, reference: models/base_model.py + comodgan_model.py)
with one immutable PyTree that a single jitted step transforms — the natural
XLA shape: params stay resident in HBM, the whole D-step/G-step/EMA chain is
one compiled program.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


def make_optimizer(learning_rate: float, beta1: float = 0.0,
                   beta2: float = 0.99, eps: float = 1e-8):
    """Adam as configured by the reference (comodgan_model.py:19-22), with an
    injectable learning-rate scale for epoch schedules."""
    return optax.inject_hyperparams(optax.adam)(
        learning_rate=learning_rate, b1=beta1, b2=beta2, eps=eps)


def opt_state_with_lr(opt_state, lr):
    """Rebuild an optax InjectHyperparamsState with a new learning rate —
    never mutate the hyperparams dict in place (the previous state would
    alias it, which is unsafe under buffer donation)."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state._replace(hyperparams=hp)


class GANTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params_G: Any
    params_D: Any
    params_G_ema: Any
    moments_G: Any          # w_avg / magnitude_ema collections of G
    moments_G_ema: Any
    constants_G: Any        # noise_const etc. (shared by G and G_ema)
    opt_state_G: Any
    opt_state_D: Any

    def with_lr(self, lr_G: float, lr_D: float) -> "GANTrainState":
        return self.replace(
            opt_state_G=opt_state_with_lr(self.opt_state_G, lr_G),
            opt_state_D=opt_state_with_lr(self.opt_state_D, lr_D))


def ema_beta(batch_size: int, ema_kimgs: float, ramp: Optional[float],
             cur_nimg) -> jnp.ndarray:
    """EMA decay (reference: train.py:67-73)."""
    ema_nimg = ema_kimgs * 1000.0
    if ramp is not None:
        ema_nimg = jnp.minimum(ema_nimg, cur_nimg * ramp)
    return 0.5 ** (batch_size / jnp.maximum(ema_nimg, 1e-8))


def ema_update(params_ema, params, beta):
    """p_ema <- lerp(p, p_ema, beta) (reference: train.py:74-75)."""
    return jax.tree.map(lambda e, p: p + (e - p) * beta, params_ema, params)
