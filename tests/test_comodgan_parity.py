"""Forward parity of the CoModGAN generator + discriminator vs the reference."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from afcm_tpu.nn import CoModDiscriminator, CoModGenerator  # noqa: E402
from afcm_tpu.utils.port import state_dict_to_variables  # noqa: E402
from tests._torch_ref import load_reference_networks  # noqa: E402

GEN = dict(z_dim=64, c_dim=1, w_dim=64, img_resolution=64,
           img_channels_in=4, img_channels_out=1)
SYNTH = dict(channel_base=4096, channel_max=128, skip_resolution=32,
             cond_mod=True, conv_clamp=None, channel_attention=False)
MAP = dict(num_layers=2)

DISC = dict(c_dim=1, img_resolution=64, img_channels=5, channel_base=4096,
            channel_max=128, conv_clamp=None)


@pytest.fixture(scope="module")
def ref():
    return load_reference_networks()


def test_comod_generator_parity(ref, rng):
    torch = ref["torch"]
    torch.manual_seed(0)
    tgen = ref["comod_generator"].CoModGenerator(
        mapping_kwargs=dict(name="MappingNetwork", **MAP),
        synthesis_kwargs=dict(name="SynthesisNetwork", **SYNTH), **GEN).eval()

    z = rng.randn(2, GEN["z_dim"]).astype(np.float32)
    c = rng.rand(2, 1).astype(np.float32)
    cond = rng.randn(2, 4, 64, 64).astype(np.float32).clip(-1, 1)

    with torch.no_grad():
        want = tgen(torch.from_numpy(z), torch.from_numpy(c),
                    torch.from_numpy(cond), noise_mode="const").numpy()

    gen = CoModGenerator(mapping_kwargs=dict(MAP), synthesis_kwargs=dict(SYNTH),
                         **GEN)
    variables = state_dict_to_variables(tgen.state_dict())
    got = np.asarray(gen.apply(variables, jnp.asarray(z), jnp.asarray(c),
                               jnp.asarray(cond), noise_mode="const"))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)

    # param tree completeness
    init_vars = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.asarray(z), jnp.asarray(c), jnp.asarray(cond), noise_mode="const")
    flat = lambda t: {jax.tree_util.keystr(p): v.shape
                      for p, v in jax.tree_util.tree_leaves_with_path(t)}
    assert flat(init_vars["params"]) == flat(variables["params"])


def test_comod_discriminator_parity(ref, rng):
    torch = ref["torch"]
    torch.manual_seed(0)
    tdisc = ref["comod_generator"].CoModDiscriminator(
        mapping_kwargs={"num_layers": 2},
        epilogue_kwargs={"mbstd_group_size": 2}, **DISC).eval()

    img = rng.randn(4, 5, 64, 64).astype(np.float32)
    c = rng.rand(4, 1).astype(np.float32)
    with torch.no_grad():
        want = tdisc(torch.from_numpy(img), torch.from_numpy(c)).numpy()

    disc = CoModDiscriminator(mapping_kwargs={"num_layers": 2},
                              epilogue_kwargs={"mbstd_group_size": 2}, **DISC)
    variables = state_dict_to_variables(tdisc.state_dict())
    got = np.asarray(disc.apply(variables, jnp.asarray(img), jnp.asarray(c)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def test_ref_mapping_network_parity(ref, rng):
    """Image->w mapper (reference: layers.py:619-664) selected via
    mapping_kwargs.name, driven by ref_img like comodgan_model.py:114-126."""
    torch = ref["torch"]
    torch.manual_seed(2)
    mapping = dict(name="RefMappingNetwork", img_resolution=32,
                   img_channels=1, channel_base=2048, channel_max=32,
                   resample_filter=[1, 2, 1])
    cfg = dict(z_dim=32, c_dim=0, w_dim=32, img_resolution=32,
               img_channels_in=4, img_channels_out=1)
    synth = dict(channel_base=2048, channel_max=32, skip_resolution=16,
                 cond_mod=True)
    tgen = ref["comod_generator"].CoModGenerator(
        mapping_kwargs=dict(mapping),
        synthesis_kwargs=dict(name="SynthesisNetwork", **synth), **cfg).eval()

    z = rng.randn(2, 32).astype(np.float32)
    c = np.zeros((2, 0), np.float32)
    cond = rng.randn(2, 4, 32, 32).astype(np.float32).clip(-1, 1)
    ref_img = rng.randn(2, 1, 32, 32).astype(np.float32).clip(-1, 1)
    with torch.no_grad():
        want = tgen(torch.from_numpy(z), torch.from_numpy(c),
                    torch.from_numpy(cond),
                    ref_img=torch.from_numpy(ref_img),
                    noise_mode="const").numpy()

    gen = CoModGenerator(mapping_kwargs=dict(mapping),
                         synthesis_kwargs=dict(synth), **cfg)
    variables = state_dict_to_variables(tgen.state_dict())
    got = np.asarray(gen.apply(variables, jnp.asarray(z), jnp.asarray(c),
                               jnp.asarray(cond), ref_img=jnp.asarray(ref_img),
                               noise_mode="const"))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)
