"""Unified conditional-GAN model (CoModGAN / StyleGAN3 branches).

The reference splits this across Pix2PixModel -> CoModGANModel ->
StyleGAN3Model with eager D/G phases (reference: models/comodgan_model.py,
models/stylegan3_model.py).  Here the whole iteration — D forward/backward
(with R1 double-grad), D update, G forward/backward, G update, EMA — is one
jitted function over a `GANTrainState`, so XLA schedules the entire step as a
single program resident on device.

Semantics preserved from the reference:
  * two independent G forwards per step (fresh dropout/noise each phase);
    `GANConfig.shared_g_fwd` collapses them into one forward + captured VJP
    (the reference's own pix2pix branch shares its forward the same way)
  * softplus GAN losses, R1 on reals through the blur, blurred L1
  * Adam(0, 0.99) eps 1e-8, per-step gradient NaN/Inf scrubbing
  * EMA lerp of G params + buffer copy every step
  * progressive Gaussian blur fade on D inputs and L1 targets
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import gaussian_blur2d
from . import losses
from .train_state import GANTrainState, ema_beta, ema_update, make_optimizer


@dataclasses.dataclass(frozen=True)
class GANConfig:
    """Static training hyperparameters (subset of the reference cfg tree)."""

    z_dim: int = 512
    c_dim: int = 0
    batch_size: int = 16
    combine_ab: bool = True
    lambda_l1: float = 100.0
    lambda_r1: float = 10.0
    # Lazy R1 (StyleGAN2 trick; OFF by default = reference-faithful, the
    # reference computes R1 every D step, comodgan_model.py:143-147). With
    # interval N the penalty runs every Nth step scaled by N so the
    # integrated regularization strength is unchanged; the off-steps compile
    # to a separate executable without the double-grad subgraph. Measured on
    # v5e (full-size model, bf16, remat_min_size 140): off-step 993 ms vs
    # 1042 on-step — the step is generator-dominated, so the win is ~5%
    # per off-step (~1.04x avg at interval 4). The StyleGAN2 beta/lr
    # re-derivation is deliberately not applied — document the deviation
    # where the knob is enabled.
    r1_interval: int = 1
    lr_g: float = 0.0025
    lr_d: float = 0.002
    adam_beta1: float = 0.0
    adam_beta2: float = 0.99
    adam_eps: float = 1e-8
    ema_enabled: bool = True
    ema_kimgs: float = 10.0
    ema_ramp: Optional[float] = None
    blur_init_sigma: float = 0.0
    blur_fade_kimg: float = 0.0
    # Style mixing regularization probability (reference keeps the hook at 0,
    # comodgan_model.py:31; supported here for completeness).
    style_mixing_prob: float = 0.0
    # Share ONE G forward between the D and G phases (the reference's own
    # pix2pix branch does exactly this — pix2pix_model.py:163-174 runs
    # forward() once and reuses fake_B for backward_D (detached) and
    # backward_G; the comodgan/stylegan3 branches instead re-forward per
    # phase, stylegan3_model.py:119,129, whose only observable effect is a
    # fresh dropout draw for the G phase). With sharing, the fake and its
    # VJP are computed once: the step drops a full G forward (~200 ms of
    # 853 on v5e, measured in scripts/bench_train_shared.py). Gradients are
    # bit-identical to the two-forward step whenever the two phases' rngs
    # coincide (pinned in tests/test_train_step.py). Deviations when ON:
    # the G loss sees the D-phase dropout mask (same distribution), and
    # mappers that EMA w_avg every training forward (the CoModGAN branch)
    # update it once per step instead of twice.
    shared_g_fwd: bool = False


class GANModel:
    """Bundles generator/discriminator modules with the jitted step functions."""

    def __init__(self, generator: nn.Module, discriminator: nn.Module,
                 config: GANConfig):
        self.generator = generator
        self.discriminator = discriminator
        self.config = config
        self.blur_max_radius = int(np.floor(config.blur_init_sigma * 3.0))

    # -- initialization ------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def init_state(self, rng, batch: Dict[str, jnp.ndarray]) -> GANTrainState:
        # Jitted as one graph: eager init dispatches hundreds of tiny ops,
        # which is minutes of round-trips on a remote-compile backend.
        cfg = self.config
        rng_g, rng_d, rng_noise, rng_z = jax.random.split(rng, 4)
        z = jax.random.normal(rng_z, (batch["A"].shape[0], cfg.z_dim))
        c = self._cond(batch)

        g_vars = self.generator.init(
            {"params": rng_g, "noise": rng_noise, "dropout": rng_noise},
            z, c, batch["A"], ref_img=batch.get("B"))
        d_in = self._d_input(batch["A"], batch["B"])
        d_vars = self.discriminator.init({"params": rng_d}, d_in, c)

        params_g = g_vars["params"]
        moments_g = g_vars.get("moments", {})
        constants_g = g_vars.get("constants", {})
        params_d = d_vars["params"]

        tx_g = make_optimizer(cfg.lr_g, cfg.adam_beta1, cfg.adam_beta2, cfg.adam_eps)
        tx_d = make_optimizer(cfg.lr_d, cfg.adam_beta1, cfg.adam_beta2, cfg.adam_eps)
        return GANTrainState(
            step=jnp.zeros((), jnp.int32),
            params_G=params_g, params_D=params_d,
            params_G_ema=jax.tree.map(jnp.copy, params_g),
            moments_G=moments_g,
            moments_G_ema=jax.tree.map(jnp.copy, moments_g),
            constants_G=constants_g,
            opt_state_G=tx_g.init(params_g), opt_state_D=tx_d.init(params_d))

    # -- helpers -------------------------------------------------------------

    def _cond(self, batch):
        cfg = self.config
        if cfg.c_dim > 0:
            return batch["slice_idx"].reshape(-1, cfg.c_dim)
        return jnp.zeros((batch["A"].shape[0], 1), jnp.float32)

    def _d_input(self, a, b):
        return jnp.concatenate([a, b], axis=1) if self.config.combine_ab else b

    def _blur(self, img, sigma):
        if self.blur_max_radius <= 0:
            return img
        return gaussian_blur2d(img, sigma, max_radius=self.blur_max_radius)

    def _run_g(self, params_g, moments_g, constants_g, z, c, cond_img, ref_img,
               rng, train: bool):
        variables = {"params": params_g, "moments": moments_g,
                     "constants": constants_g}
        rng_noise, rng_drop, rng_mix = jax.random.split(rng, 3)
        if train and self.config.style_mixing_prob > 0:
            return self._run_g_mixed(variables, moments_g, z, c, cond_img,
                                     rng_noise, rng_drop, rng_mix)
        out = self.generator.apply(
            variables, z, c, cond_img, ref_img=ref_img, train=train,
            rngs={"noise": rng_noise, "dropout": rng_drop},
            mutable=["moments"] if train else False)
        if train:
            fake, updated = out
            return fake, updated.get("moments", moments_g)
        return out, moments_g

    def _run_g_mixed(self, variables, moments_g, z, c, cond_img, rng_noise,
                     rng_drop, rng_mix):
        """Style mixing (reference: comodgan_model.py:80-85): with probability
        p, ws beyond a random cutoff come from a second latent."""
        gen = self.generator
        rng_z2, rng_cut, rng_coin = jax.random.split(rng_mix, 3)

        def map_train(module, z, c):
            return module.mapping(z, c, update_w_avg=True)

        def map_fixed(module, z, c):
            return module.mapping(z, c, update_w_avg=False)

        ws, updated = gen.apply(variables, z, c, method=map_train,
                                mutable=["moments"])
        z2 = jax.random.normal(rng_z2, z.shape)
        ws2 = gen.apply(variables, z2, c, method=map_fixed)
        num_ws = ws.shape[1]
        cutoff = jax.random.randint(rng_cut, (), 1, num_ws)
        do_mix = jax.random.uniform(rng_coin, ()) < self.config.style_mixing_prob
        mask = (jnp.arange(num_ws)[None, :, None] >= cutoff) & do_mix
        ws = jnp.where(mask, ws2, ws)

        def synth_fn(module, ws, cond_img):
            return module.synthesis(ws, cond_img, train=True)

        fake, updated2 = gen.apply(
            {**variables, "moments": updated.get("moments", moments_g)},
            ws, cond_img, method=synth_fn, mutable=["moments"],
            rngs={"noise": rng_noise, "dropout": rng_drop})
        return fake, updated2.get("moments", moments_g)

    def _run_d(self, params_d, img, c, sigma):
        return self.discriminator.apply({"params": params_d},
                                        self._blur(img, sigma), c)

    # -- the jitted train step ----------------------------------------------

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1,
                       static_argnames=("with_r1",))
    def train_step(self, state: GANTrainState, batch: Dict[str, jnp.ndarray],
                   rng, cur_nimg, with_r1: bool = True,
                   ) -> Tuple[GANTrainState, Dict[str, jnp.ndarray]]:
        rng_z, rng_gd, rng_gg = jax.random.split(rng, 3)
        z = jax.random.normal(rng_z,
                              (batch["A"].shape[0], self.config.z_dim))
        return self._train_step_impl(state, batch, z, rng_gd, rng_gg,
                                     cur_nimg, with_r1=with_r1)

    def _train_step_impl(self, state: GANTrainState, batch, z, rng_gd,
                         rng_gg, cur_nimg, with_r1: bool = True):
        """Step body with an explicit latent (z) — split out so the parity
        tests can pin z against the reference (which draws gen_z in
        set_input, comodgan_model.py:94)."""
        cfg = self.config
        c = self._cond(batch)
        real_a, real_b = batch["A"], batch["B"]
        sigma = losses.blur_sigma_schedule(cur_nimg, cfg.blur_init_sigma,
                                           cfg.blur_fade_kimg)

        tx_g = make_optimizer(cfg.lr_g, cfg.adam_beta1, cfg.adam_beta2, cfg.adam_eps)
        tx_d = make_optimizer(cfg.lr_d, cfg.adam_beta1, cfg.adam_beta2, cfg.adam_eps)

        # ---- D phase (G frozen; reference stylegan3_model.py:117-125) ----
        g_vjp = None
        if cfg.shared_g_fwd:
            # One forward serves both phases: capture the VJP now, pull the
            # G-phase head gradient back through it after the D update.
            def g_fwd(params_g):
                return self._run_g(params_g, state.moments_G,
                                   state.constants_G, z, c, real_a, real_b,
                                   rng_gd, train=True)

            fake_b_shared, g_vjp, moments_g = jax.vjp(
                g_fwd, state.params_G, has_aux=True)
            fake_b_d = jax.lax.stop_gradient(fake_b_shared)
        else:
            fake_b_d, moments_g = self._run_g(
                jax.lax.stop_gradient(state.params_G), state.moments_G,
                state.constants_G, z, c, real_a, real_b, rng_gd, train=True)
            fake_b_d = jax.lax.stop_gradient(fake_b_d)

        def d_loss_fn(params_d):
            fake_ab = self._d_input(real_a, fake_b_d)
            real_ab = self._d_input(real_a, real_b)
            fake_logits = self._run_d(params_d, fake_ab, c, sigma)
            real_logits = self._run_d(params_d, real_ab, c, sigma)
            loss_fake, loss_real = losses.softplus_d_loss(fake_logits, real_logits)
            loss = loss_fake + loss_real
            r1 = jnp.zeros(())
            if cfg.lambda_r1 > 0 and with_r1:
                r1 = losses.r1_penalty(
                    lambda img: self._run_d(params_d, img, c, sigma), real_ab)
                # Lazy R1 scales by the interval so sum-over-steps matches
                # the every-step schedule (interval 1 => identical graph).
                loss = loss + r1 * cfg.lambda_r1 * max(1, cfg.r1_interval)
            return loss, (loss_fake, loss_real, r1)

        (_, (loss_d_fake, loss_d_real, loss_r1)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.params_D)
        d_grads = losses.nan_to_num_grads(d_grads)
        d_updates, opt_state_d = tx_d.update(d_grads, state.opt_state_D,
                                             state.params_D)
        params_d = jax.tree.map(lambda p, u: p + u, state.params_D, d_updates)

        # ---- G phase (reference stylegan3_model.py:126-135) ----
        def g_head(fake_b):
            """GAN + L1 head on a fake image, through the UPDATED D (the
            reference updates D before the G phase, stylegan3_model.py:125)."""
            fake_ab = self._d_input(real_a, fake_b)
            gen_logits = self._run_d(params_d, fake_ab, c, sigma)
            loss_gan = losses.softplus_g_loss(gen_logits)
            loss_l1 = losses.l1_loss(self._blur(fake_b, sigma),
                                     self._blur(real_b, sigma)) * cfg.lambda_l1
            return loss_gan + loss_l1, (loss_gan, loss_l1)

        if cfg.shared_g_fwd:
            (_, (loss_g_gan, loss_g_l1)), head_grad = jax.value_and_grad(
                g_head, has_aux=True)(fake_b_shared)
            (g_grads,) = g_vjp(head_grad)
        else:
            def g_loss_fn(params_g):
                fake_b, new_moments = self._run_g(
                    params_g, moments_g, state.constants_G, z, c, real_a,
                    real_b, rng_gg, train=True)
                loss, (loss_gan, loss_l1) = g_head(fake_b)
                return loss, (loss_gan, loss_l1, new_moments)

            (_, (loss_g_gan, loss_g_l1, moments_g)), g_grads = \
                jax.value_and_grad(g_loss_fn, has_aux=True)(state.params_G)
        g_grads = losses.nan_to_num_grads(g_grads)
        g_updates, opt_state_g = tx_g.update(g_grads, state.opt_state_G,
                                             state.params_G)
        params_g = jax.tree.map(lambda p, u: p + u, state.params_G, g_updates)

        # ---- EMA (reference train.py:67-77) ----
        if cfg.ema_enabled:
            beta = ema_beta(cfg.batch_size, cfg.ema_kimgs, cfg.ema_ramp, cur_nimg)
            params_g_ema = ema_update(state.params_G_ema, params_g, beta)
            moments_g_ema = moments_g
        else:
            params_g_ema = state.params_G_ema
            moments_g_ema = state.moments_G_ema

        new_state = state.replace(
            step=state.step + 1, params_G=params_g, params_D=params_d,
            params_G_ema=params_g_ema, moments_G=moments_g,
            moments_G_ema=moments_g_ema, opt_state_G=opt_state_g,
            opt_state_D=opt_state_d)
        metrics = {"G_GAN": loss_g_gan, "G_L1": loss_g_l1,
                   "D_real": loss_d_real, "D_fake": loss_d_fake,
                   "D_r1": loss_r1, "blur_sigma": sigma}
        return new_state, metrics

    # -- inference -----------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def eval_step(self, state: GANTrainState, cond_img, slice_idx, rng,
                  ref_img=None):
        """EMA forward with const noise (reference: comodgan_model.py:114-126).

        ``ref_img`` mirrors the reference's ``ref_img=self.real_B``: the
        validation flow passes the target batch so a RefMappingNetwork
        mapper works; the predictor flow has no target (the reference's
        set_test_input doesn't set one either) and the mainstream mappers
        ignore it."""
        cfg = self.config
        z = jax.random.normal(rng, (cond_img.shape[0], cfg.z_dim))
        c = slice_idx.reshape(-1, cfg.c_dim) if cfg.c_dim > 0 else \
            jnp.zeros((cond_img.shape[0], 1), jnp.float32)
        variables = {"params": state.params_G_ema,
                     "moments": state.moments_G_ema,
                     "constants": state.constants_G}
        return self.generator.apply(variables, z, c, cond_img,
                                    ref_img=ref_img, train=False,
                                    noise_mode="const")
