"""Forward parity of the AFCM SG3 generator vs the PyTorch reference.

Weights are initialized by the reference and ported via
`afcm_tpu.utils.port`; outputs must agree in fp32.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from afcm_tpu.nn import Stylegan3Generator  # noqa: E402
from afcm_tpu.utils.port import state_dict_to_variables  # noqa: E402
from tests._torch_ref import load_reference_networks  # noqa: E402

SMALL = dict(z_dim=64, c_dim=1, w_dim=64, img_resolution=64,
             img_channels_in=4, img_channels_out=1)
SMALL_SYNTH = dict(channel_base=4096, channel_max=128, num_layers=6,
                   num_critical=2, margin_size=10, output_scale=0.25,
                   skip_resolution=32, conv_clamp=256, cond_mod=True)
SMALL_MAP = dict(num_layers=2)


@pytest.fixture(scope="module")
def ref():
    return load_reference_networks()


@pytest.fixture(scope="module")
def torch_gen(ref):
    torch = ref["torch"]
    torch.manual_seed(0)
    gen = ref["networks_stylegan3"].Stylegan3Generator(
        mapping_kwargs=dict(SMALL_MAP), synthesis_kwargs=dict(SMALL_SYNTH),
        **SMALL).eval()
    return gen


def _jax_gen():
    return Stylegan3Generator(
        mapping_kwargs=dict(SMALL_MAP), synthesis_kwargs=dict(SMALL_SYNTH),
        **SMALL)


def test_layer_geometry_matches(ref, torch_gen):
    """Filters, paddings, and factors of every layer must match the reference."""
    from afcm_tpu.nn.stylegan3 import (_design_layer_filters,
                                       compute_synthesis_layout)
    layout = compute_synthesis_layout(
        img_resolution=SMALL["img_resolution"],
        img_channels_in=SMALL["img_channels_in"],
        img_channels_out=SMALL["img_channels_out"],
        channel_base=SMALL_SYNTH["channel_base"],
        channel_max=SMALL_SYNTH["channel_max"],
        num_layers=SMALL_SYNTH["num_layers"],
        num_critical=SMALL_SYNTH["num_critical"],
        first_cutoff=2, first_stopband=2 ** 2.1, last_stopband_rel=2 ** 0.3,
        margin_size=10, output_scale=0.25,
        skip_resolution=SMALL_SYNTH["skip_resolution"])

    tsyn = torch_gen.synthesis
    for idx, name in enumerate(tsyn.layer_names):
        tlayer = getattr(tsyn, name)
        spec = layout.decoder_specs[idx]
        assert (tlayer.in_channels, tlayer.out_channels) == (spec.in_channels,
                                                             spec.out_channels)
        assert tuple(tlayer.in_size) == (spec.in_size, spec.in_size)
        assert tuple(tlayer.out_size) == (spec.out_size, spec.out_size)
        fu, fd, up, down, padding = _design_layer_filters(
            spec, is_torgb=spec.is_torgb, filter_size=6, lrelu_upsampling=2,
            use_radial_filters=False)
        assert up == tlayer.up_factor and down == tlayer.down_factor
        assert list(padding) == list(tlayer.padding)
        for mine, theirs in [(fu, tlayer.up_filter), (fd, tlayer.down_filter)]:
            if theirs is None:
                assert mine is None
            else:
                np.testing.assert_allclose(mine, theirs.numpy(), rtol=1e-6)

    for idx in range(SMALL_SYNTH["num_layers"]):
        tlayer = getattr(tsyn, f"encoder_{idx}")
        spec = layout.encoder_specs[idx]
        assert (tlayer.in_channels, tlayer.out_channels) == (spec.in_channels,
                                                             spec.out_channels)
        fu, fd, up, down, padding = _design_layer_filters(
            spec, is_torgb=False, filter_size=6, lrelu_upsampling=1,
            use_radial_filters=False)
        assert up == tlayer.up_factor and down == tlayer.down_factor
        assert list(padding) == list(tlayer.padding)


def test_generator_forward_parity(ref, torch_gen, rng):
    torch = ref["torch"]
    z = rng.randn(2, SMALL["z_dim"]).astype(np.float32)
    c = rng.rand(2, 1).astype(np.float32)
    cond = rng.randn(2, 4, 64, 64).astype(np.float32).clip(-1, 1)

    with torch.no_grad():
        want = torch_gen(torch.from_numpy(z), torch.from_numpy(c),
                         torch.from_numpy(cond)).numpy()

    variables = state_dict_to_variables(torch_gen.state_dict())
    gen = _jax_gen()
    got = np.asarray(gen.apply(variables, jnp.asarray(z), jnp.asarray(c),
                               jnp.asarray(cond)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=2e-4)


def test_generator_param_shapes_complete(ref, torch_gen):
    """Every reference parameter must land somewhere in our tree (no orphans)."""
    variables = state_dict_to_variables(torch_gen.state_dict())
    gen = _jax_gen()
    z = jnp.zeros((1, SMALL["z_dim"]))
    c = jnp.zeros((1, 1))
    cond = jnp.zeros((1, 4, 64, 64))
    init_vars = gen.init(jax.random.PRNGKey(0), z, c, cond)

    flat_init = jax.tree_util.tree_leaves_with_path(init_vars["params"])
    flat_port = jax.tree_util.tree_leaves_with_path(variables["params"])
    init_paths = {jax.tree_util.keystr(p): v.shape for p, v in flat_init}
    port_paths = {jax.tree_util.keystr(p): v.shape for p, v in flat_port}
    assert init_paths == port_paths
