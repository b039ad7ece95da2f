"""GAN objectives (reference: models/comodgan_model.py:128-161,
models/stylegan3_model.py:89-111, models/utils.py:213-316).

R1 uses `jax.grad` through the discriminator — no conv2d_gradfix machinery is
needed; XLA differentiates the double-backward natively.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def softplus_d_loss(fake_logits, real_logits):
    """Non-saturating D loss: softplus(D(fake)) + softplus(-D(real))."""
    loss_fake = jnp.mean(jax.nn.softplus(fake_logits))
    loss_real = jnp.mean(jax.nn.softplus(-real_logits))
    return loss_fake, loss_real


def softplus_g_loss(fake_logits):
    return jnp.mean(jax.nn.softplus(-fake_logits))


def r1_penalty(d_fn, real_img):
    """0.5 * E[ ||∇_x D(x)||² ] on real images.

    `d_fn` must map image -> logits [N, 1]; gradients flow through any blur
    inside `d_fn`, matching the reference which differentiates w.r.t. the
    pre-blur input (comodgan_model.py:139-146).
    """
    def scalar_d(img):
        return jnp.sum(d_fn(img))

    grads = jax.grad(scalar_d)(real_img)
    return 0.5 * jnp.mean(jnp.sum(jnp.square(grads), axis=(1, 2, 3)))


def l1_loss(a, b):
    return jnp.mean(jnp.abs(a - b))


def gan_loss(mode: str, logits, target_is_real: bool):
    """pix2pix-style GAN objectives (reference: models/utils.py:213-279)."""
    if mode == "vanilla":
        target = jnp.ones_like(logits) if target_is_real else jnp.zeros_like(logits)
        return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, target))
    if mode == "lsgan":
        target = 1.0 if target_is_real else 0.0
        return jnp.mean(jnp.square(logits - target))
    if mode == "wgangp":
        return -jnp.mean(logits) if target_is_real else jnp.mean(logits)
    raise NotImplementedError(f"gan mode {mode}")


def cal_gradient_penalty(d_fn, real_data, fake_data, rng, mode: str = "mixed",
                         constant: float = 1.0, lambda_gp: float = 10.0):
    """WGAN-GP gradient penalty (reference: models/utils.py:282-316)."""
    if lambda_gp <= 0:
        return jnp.zeros(()), None
    if mode == "real":
        interp = real_data
    elif mode == "fake":
        interp = fake_data
    elif mode == "mixed":
        alpha = jax.random.uniform(rng, (real_data.shape[0],) +
                                   (1,) * (real_data.ndim - 1))
        interp = alpha * real_data + (1 - alpha) * fake_data
    else:
        raise NotImplementedError(mode)

    def scalar_d(x):
        return jnp.sum(d_fn(x))

    grads = jax.grad(scalar_d)(interp)
    grads = grads.reshape(real_data.shape[0], -1)
    norms = jnp.linalg.norm(grads + 1e-16, axis=1)
    penalty = jnp.mean(jnp.square(norms - constant)) * lambda_gp
    return penalty, grads


def dice_loss_1class(pred_logits, target, smooth: float = 0.01):
    """Binary dice on thresholded sigmoid (reference: models/utils.py:349-370)."""
    n = target.shape[0]
    pred = (jax.nn.sigmoid(pred_logits) > 0.5).astype(jnp.float32)
    pred = pred.reshape(n, -1)
    target = target.reshape(n, -1).astype(jnp.float32)
    rev_p, rev_t = 1 - pred, 1 - target
    inter1 = jnp.sum(pred * target, axis=1)
    inter2 = jnp.sum(rev_p * rev_t, axis=1)
    loss = (2 * (inter1 + inter2) + smooth) / (
        jnp.sum(pred, 1) + jnp.sum(rev_p, 1) + jnp.sum(target, 1) +
        jnp.sum(rev_t, 1) + smooth)
    return 1 - jnp.sum(loss) / n


def bce_dice_loss(pred_logits, target, alpha: float = 1.0, beta: float = 1.0):
    """Linear BCE + dice combo (reference: models/utils.py:373-385)."""
    bce = jnp.mean(optax.sigmoid_binary_cross_entropy(
        pred_logits, target.astype(jnp.float32)))
    return alpha * bce + beta * dice_loss_1class(pred_logits, target)


def nan_to_num_grads(grads):
    """Per-step gradient scrubbing (reference: comodgan_model.py:170-182)."""
    return jax.tree.map(
        lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e5, neginf=-1e5), grads)


def blur_sigma_schedule(cur_nimg, blur_init_sigma: float, blur_fade_kimg: float):
    """Progressive blur fade (reference: stylegan3_model.py:115-116)."""
    if blur_fade_kimg <= 0 or blur_init_sigma <= 0:
        return jnp.zeros(())
    frac = jnp.maximum(1.0 - cur_nimg / (blur_fade_kimg * 1e3), 0.0)
    return frac * blur_init_sigma
