"""Shape/behavior tests for the CA / pixel-shuffle / motion variants."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from afcm_tpu.nn.ca_variants import (CAINSynthesisNetwork, CASynthesisNetwork,  # noqa: E402
                                     pixel_shuffle)
from afcm_tpu.nn.comodgan import CoModGenerator, get_synthesizer  # noqa: E402
from afcm_tpu.nn.motion import (FixedTimeEncoder, MotionMappingNetwork,  # noqa: E402
                                StyleGANVDiscriminator, StyleGANVGenerator,
                                TemporalDifferenceEncoder)


def test_pixel_shuffle_roundtrip(rng):
    x = jnp.asarray(rng.randn(2, 4, 8, 8).astype(np.float32))
    up = pixel_shuffle(x, 2)          # [2, 1, 16, 16]
    assert up.shape == (2, 1, 16, 16)
    down = pixel_shuffle(up, 1 / 2)
    np.testing.assert_allclose(np.asarray(down), np.asarray(x))


def test_pixel_shuffle_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.randn(1, 16, 4, 4).astype(np.float32)
    want = torch.pixel_shuffle(torch.from_numpy(x), 4).numpy()
    got = np.asarray(pixel_shuffle(jnp.asarray(x), 4))
    np.testing.assert_allclose(got, want)


def test_get_synthesizer_registry():
    for name in ("SynthesisNetwork", "CASynthesisNetwork",
                 "CAINSynthesisNetwork", "MotionSynthesisNetwork"):
        assert get_synthesizer(name) is not None
    with pytest.raises(NotImplementedError):
        get_synthesizer("nope")


def test_ca_synthesis_network_forward(rng):
    net = CASynthesisNetwork(w_dim=32, img_resolution=32, img_channels_in=4,
                             img_channels_out=1, channel_base=512,
                             channel_max=32, skip_resolution=16, cond_mod=True)
    ws = jnp.zeros((2, net.num_ws, 32))
    img = jnp.asarray(rng.randn(2, 4, 32, 32).astype(np.float32))
    variables = net.init({"params": jax.random.PRNGKey(0),
                          "noise": jax.random.PRNGKey(1)}, ws, img,
                         noise_mode="const")
    out = net.apply(variables, ws, img, noise_mode="const")
    assert out.shape == (2, 1, 32, 32)
    assert np.all(np.isfinite(np.asarray(out)))


def test_cain_synthesis_network_forward(rng):
    net = CAINSynthesisNetwork(w_dim=16, img_resolution=32, img_channels_in=4,
                               img_channels_out=1, depth=2, n_resgroups=1,
                               n_resblocks=2)
    ws = jnp.zeros((1, net.num_ws, 16))
    img = jnp.asarray(rng.randn(1, 4, 32, 32).astype(np.float32))
    variables = net.init({"params": jax.random.PRNGKey(0),
                          "noise": jax.random.PRNGKey(1)}, ws, img,
                         noise_mode="const")
    out = net.apply(variables, ws, img, noise_mode="const")
    assert out.shape == (1, 1, 32, 32)
    assert float(jnp.max(jnp.abs(out))) <= 1.0  # tanh before shuffle


def test_rcab_residual_group(rng):
    from afcm_tpu.nn.ca_variants import ResidualGroup
    rg = ResidualGroup(n_resblocks=2, n_feat=8, kernel_size=3, reduction=4)
    x = jnp.asarray(rng.randn(1, 8, 16, 16).astype(np.float32))
    v = rg.init(jax.random.PRNGKey(0), x)
    y = rg.apply(v, x)
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y)))


def test_time_encoders(rng):
    enc = FixedTimeEncoder(max_num_frames=16)
    t = jnp.asarray(rng.rand(3, 1).astype(np.float32) * 10)
    variables = enc.init(jax.random.PRNGKey(0), t)
    out = enc.apply(variables, t)
    assert out.shape == (3, enc.get_dim())

    tde = TemporalDifferenceEncoder(max_num_frames=16)
    variables = tde.init(jax.random.PRNGKey(0), t)
    out = tde.apply(variables, t)
    assert out.shape == (3, tde.get_dim())


def test_motion_mapping(rng):
    net = MotionMappingNetwork(max_num_frames=8, motion_v_dim=32,
                               motion_z_dim=16, motion_z_distance=2,
                               motion_kernel_size=3,
                               time_encoder_kwargs=dict(dim=16,
                                                        min_period_len=2,
                                                        max_period_len=16))
    t = jnp.asarray(rng.randint(0, 7, size=(2, 3)).astype(np.float32))
    variables = net.init({"params": jax.random.PRNGKey(0),
                          "noise": jax.random.PRNGKey(1)}, t)
    out = net.apply(variables, t, rngs={"noise": jax.random.PRNGKey(2)})
    assert out["motion_v"].shape == (6, 32)  # batch*frames, dim*2=32


def test_styleganv_generator_and_discriminator(rng):
    gen = StyleGANVGenerator(
        z_dim=16, c_dim=0, w_dim=16, motion_v_dim=16, img_resolution=32,
        img_channels_in=1, img_channels_out=1, max_num_frames=8,
        synthesis_kwargs=dict(channel_base=512, channel_max=32,
                              skip_resolution=16, comod_emb=False,
                              coord_emb=True),
        mapping_kwargs=dict(num_layers=2),
        motion_mapping_kwargs=dict(motion_v_dim=16, motion_z_dim=8,
                                   motion_z_distance=2, motion_kernel_size=3,
                                   time_encoder_kwargs=dict(
                                       dim=8, min_period_len=2,
                                       max_period_len=8)))
    z = jnp.zeros((2, 16))
    t = jnp.zeros((2, 1))
    delta_t = jnp.zeros((2, 1))
    cond = jnp.asarray(rng.randn(2, 1, 32, 32).astype(np.float32))
    variables = gen.init({"params": jax.random.PRNGKey(0),
                          "noise": jax.random.PRNGKey(1)},
                         z, None, t, delta_t, cond, noise_mode="const")
    out = gen.apply(variables, z, None, t, delta_t, cond, noise_mode="const",
                    rngs={"noise": jax.random.PRNGKey(2)})
    assert out.shape == (2, 1, 32, 32)

    disc = StyleGANVDiscriminator(c_dim=0, img_resolution=32, img_channels=1,
                                  num_frames=3, channel_base=512,
                                  channel_max=32, concat_res=8,
                                  max_num_frames=8)
    frames = jnp.asarray(rng.randn(2, 3, 1, 32, 32).astype(np.float32))
    c = jnp.zeros((2, 0))
    dvars = disc.init(jax.random.PRNGKey(0), frames, c, delta_t)
    logits = disc.apply(dvars, frames, c, delta_t)
    assert logits.shape == (2, 1)


def test_plain_conv_torch_default_init():
    """_PlainConv/ConvNorm use torch Conv2d's default init: U[-b, b] with
    b = 1/sqrt(I*k*k) — jax's variance_scaling computed fan_in from the
    wrong axes on OIHW kernels (k*O*I), shrinking the bound by sqrt(k/O)."""
    import jax
    import numpy as np
    import torch
    from afcm_tpu.nn.ca_variants import _PlainConv

    conv = _PlainConv(16, 64, kernel_size=3)
    params = conv.init(jax.random.PRNGKey(0),
                       np.zeros((1, 16, 8, 8), np.float32))["params"]
    w = np.asarray(params["weight"])
    b = np.asarray(params["bias"])

    ref = torch.nn.Conv2d(16, 64, 3, padding=1)
    expect = 1 / np.sqrt(16 * 9)
    assert abs(float(ref.weight.detach().abs().max()) - expect) < expect * 0.1
    assert w.max() <= expect and w.min() >= -expect
    assert w.max() > 0.8 * expect            # actually fills the range
    assert b.max() <= expect and b.min() >= -expect
    # no call-time offsets: effective bias == stored bias
    out = conv.apply({"params": params}, np.zeros((1, 16, 8, 8), np.float32))
    np.testing.assert_allclose(np.asarray(out)[0, :, 4, 4], b, atol=1e-6)
