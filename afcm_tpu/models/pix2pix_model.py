"""pix2pix baseline model: one jitted D+G step with the classic objectives
(reference: models/pix2pix_model.py).

GAN objective is configurable (vanilla | lsgan | wgangp, reference:
models/utils.py:213-316), optimizers are Adam(beta1, 0.999), and the UNet's
batch-norm running stats ride a mutable ``batch_stats`` collection.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..nn.pix2pix import NLayerDiscriminator, PixelDiscriminator, UnetGenerator
from . import losses
from .train_state import make_optimizer, opt_state_with_lr


@dataclasses.dataclass(frozen=True)
class Pix2PixConfig:
    gan_mode: str = "vanilla"
    lambda_l1: float = 100.0
    lambda_gp: float = 0.0        # wgangp gradient penalty weight
    lr_g: float = 2e-4
    lr_d: float = 2e-4
    beta1: float = 0.5
    combine_ab: bool = True


import flax.struct


class Pix2PixState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params_G: dict
    params_D: dict
    stats_G: dict
    stats_D: dict
    opt_state_G: dict
    opt_state_D: dict

    def with_lr(self, lr_G: float, lr_D: float) -> "Pix2PixState":
        return self.replace(
            opt_state_G=opt_state_with_lr(self.opt_state_G, lr_G),
            opt_state_D=opt_state_with_lr(self.opt_state_D, lr_D))


class Pix2PixModel:
    def __init__(self, generator: UnetGenerator, discriminator,
                 config: Pix2PixConfig):
        self.generator = generator
        self.discriminator = discriminator
        self.config = config

    @functools.partial(jax.jit, static_argnums=0)
    def init_state(self, rng, batch) -> Pix2PixState:
        cfg = self.config
        rng_g, rng_d, rng_drop = jax.random.split(rng, 3)
        g_vars = self.generator.init({"params": rng_g, "dropout": rng_drop},
                                     batch["A"], train=True)
        d_in = self._d_input(batch["A"], batch["B"])
        d_vars = self.discriminator.init({"params": rng_d}, d_in, train=True)
        tx_g = make_optimizer(cfg.lr_g, cfg.beta1, 0.999, 1e-8)
        tx_d = make_optimizer(cfg.lr_d, cfg.beta1, 0.999, 1e-8)
        return Pix2PixState(
            step=jnp.zeros((), jnp.int32),
            params_G=g_vars["params"], params_D=d_vars["params"],
            stats_G=g_vars.get("batch_stats", {}),
            stats_D=d_vars.get("batch_stats", {}),
            opt_state_G=tx_g.init(g_vars["params"]),
            opt_state_D=tx_d.init(d_vars["params"]))

    def _d_input(self, a, b):
        return jnp.concatenate([a, b], axis=1) if self.config.combine_ab else b

    def _run_g(self, params, stats, a, rng, train: bool):
        variables = {"params": params, "batch_stats": stats}
        out = self.generator.apply(variables, a, train=train,
                                   rngs={"dropout": rng},
                                   mutable=["batch_stats"] if train else False)
        if train:
            y, updated = out
            return y, updated.get("batch_stats", stats)
        return out, stats

    def _run_d(self, params, stats, img, train: bool):
        variables = {"params": params, "batch_stats": stats}
        out = self.discriminator.apply(
            variables, img, train=train,
            mutable=["batch_stats"] if train else False)
        if train:
            logits, updated = out
            return logits, updated.get("batch_stats", stats)
        return out, stats

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: Pix2PixState, batch, rng, nimg=None
                   ) -> Tuple[Pix2PixState, Dict[str, jnp.ndarray]]:
        del nimg  # pix2pix has no nimg-dependent schedule (no blur fade/EMA)
        cfg = self.config
        real_a, real_b = batch["A"], batch["B"]
        rng_g1, rng_g2, rng_gp = jax.random.split(rng, 3)

        tx_g = make_optimizer(cfg.lr_g, cfg.beta1, 0.999, 1e-8)
        tx_d = make_optimizer(cfg.lr_d, cfg.beta1, 0.999, 1e-8)

        fake_b, stats_g = self._run_g(jax.lax.stop_gradient(state.params_G),
                                      state.stats_G, real_a, rng_g1, True)
        fake_b = jax.lax.stop_gradient(fake_b)

        def d_loss_fn(params_d):
            fake_ab = self._d_input(real_a, fake_b)
            real_ab = self._d_input(real_a, real_b)
            pred_fake, stats_d = self._run_d(params_d, state.stats_D,
                                             fake_ab, True)
            pred_real, stats_d = self._run_d(params_d, stats_d, real_ab, True)
            loss_fake = losses.gan_loss(cfg.gan_mode, pred_fake, False)
            loss_real = losses.gan_loss(cfg.gan_mode, pred_real, True)
            loss = (loss_fake + loss_real) * 0.5
            if cfg.gan_mode == "wgangp" and cfg.lambda_gp > 0:
                # WGAN-GP Lipschitz penalty (losses.cal_gradient_penalty,
                # reference helper models/utils.py:282-316 — which the
                # reference's own pix2pix never wires; opt-in here via
                # loss.lambda_gp). Frozen BN stats for the interpolate pass.
                gp, _ = losses.cal_gradient_penalty(
                    lambda x: self._run_d(params_d, stats_d, x, False)[0],
                    real_ab, fake_ab, rng_gp, lambda_gp=cfg.lambda_gp)
                loss = loss + gp
            return loss, (loss_fake, loss_real, stats_d)

        (_, (loss_d_fake, loss_d_real, stats_d)), d_grads = \
            jax.value_and_grad(d_loss_fn, has_aux=True)(state.params_D)
        d_updates, opt_state_d = tx_d.update(d_grads, state.opt_state_D,
                                             state.params_D)
        params_d = optax.apply_updates(state.params_D, d_updates)

        def g_loss_fn(params_g):
            fake, new_stats_g = self._run_g(params_g, stats_g, real_a,
                                            rng_g2, True)
            fake_ab = self._d_input(real_a, fake)
            pred_fake, _ = self._run_d(params_d, stats_d, fake_ab, True)
            loss_gan = losses.gan_loss(cfg.gan_mode, pred_fake, True)
            loss_l1 = losses.l1_loss(fake, real_b) * cfg.lambda_l1
            return loss_gan + loss_l1, (loss_gan, loss_l1, new_stats_g)

        (_, (loss_g_gan, loss_g_l1, stats_g)), g_grads = \
            jax.value_and_grad(g_loss_fn, has_aux=True)(state.params_G)
        g_updates, opt_state_g = tx_g.update(g_grads, state.opt_state_G,
                                             state.params_G)
        params_g = optax.apply_updates(state.params_G, g_updates)

        new_state = state.replace(step=state.step + 1, params_G=params_g,
                                  params_D=params_d, stats_G=stats_g,
                                  stats_D=stats_d, opt_state_G=opt_state_g,
                                  opt_state_D=opt_state_d)
        return new_state, {"G_GAN": loss_g_gan, "G_L1": loss_g_l1,
                           "D_real": loss_d_real, "D_fake": loss_d_fake}

    @functools.partial(jax.jit, static_argnums=0)
    def eval_step(self, state: Pix2PixState, a, slice_idx=None, rng=None,
                  ref_img=None):
        del slice_idx, rng, ref_img  # accepted for the shared validate() API
        out, _ = self._run_g(state.params_G, state.stats_G, a,
                             jax.random.PRNGKey(0), train=False)
        return out


def build_pix2pix_model(cfg) -> Pix2PixModel:
    g_cfg = dict(cfg.model.G)
    d_cfg = dict(cfg.model.D)
    net_g = g_cfg.get("netG", "unet_256")
    if net_g not in ("unet_256", "unet_128"):
        raise NotImplementedError(f"pix2pix generator {net_g}")
    generator = UnetGenerator(
        input_nc=g_cfg.get("input_nc", 1), output_nc=g_cfg.get("output_nc", 1),
        num_downs=8 if net_g == "unet_256" else 7, ngf=g_cfg.get("ngf", 64),
        norm=g_cfg.get("norm", "batch"),
        use_dropout=g_cfg.get("dropout", True),
        init_type=g_cfg.get("init_type", "normal"),
        init_gain=g_cfg.get("init_gain", 0.02))
    net_d = d_cfg.get("netD", "basic")
    if net_d in ("basic", "n_layers"):
        discriminator = NLayerDiscriminator(
            input_nc=d_cfg.get("input_nc", 2), ndf=d_cfg.get("ndf", 64),
            n_layers=3 if net_d == "basic" else d_cfg.get("n_layers", 3),
            norm=d_cfg.get("norm", "batch"),
            init_type=d_cfg.get("init_type", "normal"),
            init_gain=d_cfg.get("init_gain", 0.02))
    elif net_d == "pixel":
        discriminator = PixelDiscriminator(
            input_nc=d_cfg.get("input_nc", 2), ndf=d_cfg.get("ndf", 64),
            norm=d_cfg.get("norm", "batch"),
            init_type=d_cfg.get("init_type", "normal"),
            init_gain=d_cfg.get("init_gain", 0.02))
    else:
        raise NotImplementedError(f"pix2pix discriminator {net_d}")
    config = Pix2PixConfig(gan_mode=cfg.loss.gan_mode,
                           lambda_l1=cfg.loss.lambda_L1,
                           lambda_gp=getattr(cfg.loss, "lambda_gp", 0.0),
                           lr_g=cfg.optimizer.lr_G, lr_d=cfg.optimizer.lr_D,
                           beta1=cfg.optimizer.beta1,
                           combine_ab=cfg.model.combine_ab)
    return Pix2PixModel(generator, discriminator, config)
