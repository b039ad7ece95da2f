"""pix2pix baseline: shapes + one train step on a tiny UNet."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from afcm_tpu.models.pix2pix_model import (Pix2PixConfig, Pix2PixModel,  # noqa: E402
                                           build_pix2pix_model)
from afcm_tpu.nn.pix2pix import NLayerDiscriminator, UnetGenerator  # noqa: E402


def test_unet_shapes():
    gen = UnetGenerator(input_nc=1, output_nc=1, num_downs=8, ngf=8)
    x = jnp.zeros((2, 1, 256, 256))
    variables = gen.init({"params": jax.random.PRNGKey(0),
                          "dropout": jax.random.PRNGKey(1)}, x, train=True)
    y, _ = gen.apply(variables, x, train=True,
                     rngs={"dropout": jax.random.PRNGKey(2)},
                     mutable=["batch_stats"])
    assert y.shape == (2, 1, 256, 256)
    assert float(jnp.max(jnp.abs(y))) <= 1.0  # tanh output


def test_patchgan_shapes():
    disc = NLayerDiscriminator(input_nc=2, ndf=8, n_layers=3)
    x = jnp.zeros((2, 2, 256, 256))
    variables = disc.init(jax.random.PRNGKey(0), x, train=True)
    y, _ = disc.apply(variables, x, train=True, mutable=["batch_stats"])
    assert y.shape == (2, 1, 30, 30)  # 70x70 PatchGAN logit map


@pytest.mark.parametrize("gan_mode", ["vanilla", "lsgan"])
def test_pix2pix_train_step(gan_mode):
    gen = UnetGenerator(input_nc=1, output_nc=1, num_downs=6, ngf=4)
    disc = NLayerDiscriminator(input_nc=2, ndf=4, n_layers=2)
    model = Pix2PixModel(gen, disc, Pix2PixConfig(gan_mode=gan_mode))

    rng = np.random.RandomState(0)
    batch = {"A": jnp.asarray(rng.randn(2, 1, 64, 64).clip(-1, 1), jnp.float32),
             "B": jnp.asarray(rng.randn(2, 1, 64, 64).clip(-1, 1), jnp.float32)}
    state = model.init_state(jax.random.PRNGKey(0), batch)
    new_state, metrics = model.train_step(state, batch, jax.random.PRNGKey(1))
    assert int(new_state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    out = model.eval_step(new_state, batch["A"])
    assert out.shape == (2, 1, 64, 64)


def test_build_from_config():
    from afcm_tpu.config import get_default_cfg, apply_model_defaults
    cfg = get_default_cfg()
    apply_model_defaults(cfg, "pix2pix")
    model = build_pix2pix_model(cfg)
    assert model.config.gan_mode == "vanilla"
    assert model.generator.num_downs == 8
