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


# ---------------------------------------------------------------------------
# SynthesisInput (reference: networks_stylegan3.py:168-248). Dormant in the
# AFCM U-net configs (the encoder replaces it) but shipped for upstream
# parity — so it gets the same oracle treatment as the live modules.

def _synthesis_input_pair(ref, seed, w_dim, channels, size, sampling_rate,
                          bandwidth):
    """Reference module (with a randomized affine head so the inverse
    rotation/translation path is exercised, not the identity it inits to)
    plus the ported variables for ours."""
    torch = ref["torch"]
    torch.manual_seed(seed)
    tinp = ref["networks_stylegan3"].SynthesisInput(
        w_dim=w_dim, channels=channels, size=size,
        sampling_rate=sampling_rate, bandwidth=bandwidth).eval()
    with torch.no_grad():
        g = torch.Generator().manual_seed(seed + 1)
        # weight_init=0 zeroes the affine kernel, so at init t == bias ==
        # (1,0,0,0) == identity for every w. Randomize both so each batch
        # row gets a distinct non-identity rotation AND translation.
        tinp.affine.weight.copy_(
            torch.randn(tinp.affine.weight.shape, generator=g) * 3.0)
        tinp.affine.bias.copy_(
            torch.randn(tinp.affine.bias.shape, generator=g) * 0.5)
    from afcm_tpu.nn.stylegan3 import SynthesisInput
    jinp = SynthesisInput(w_dim=w_dim, channels=channels, size=size,
                          sampling_rate=sampling_rate, bandwidth=bandwidth)
    variables = state_dict_to_variables(tinp.state_dict())
    return tinp, jinp, variables


def _synthesis_input_oracle64(tinp, w):
    """numpy float64 transcription of the reference forward
    (networks_stylegan3.py:199-243; the torch module itself cannot run in
    double — its internal torch.eye stays fp32)."""
    freqs = tinp.freqs.numpy().astype(np.float64)
    phases = tinp.phases.numpy().astype(np.float64)
    aw = tinp.affine.weight.detach().numpy().astype(np.float64)
    ab = tinp.affine.bias.detach().numpy().astype(np.float64)
    weight = tinp.weight.detach().numpy().astype(np.float64)
    sr, bw = float(tinp.sampling_rate), float(tinp.bandwidth)
    size_x, size_y = int(tinp.size[0]), int(tinp.size[1])

    t = w.astype(np.float64) @ (aw.T / np.sqrt(aw.shape[1])) + ab
    t = t / np.linalg.norm(t[:, :2], axis=1, keepdims=True)
    r_c, r_s, t_x, t_y = t[:, 0], t[:, 1], t[:, 2], t[:, 3]
    rot = np.stack([np.stack([r_c, -r_s], -1),
                    np.stack([r_s, r_c], -1)], -2)
    freqs_b = np.einsum("cf,bfg->bcg", freqs, rot)
    phases_b = phases[None] + freqs_b[:, :, 0] * (-t_x[:, None]) \
        + freqs_b[:, :, 1] * (-t_y[:, None])
    with np.errstate(divide="ignore"):  # sr/2 == bw edge case → ±inf, clipped
        amp = np.clip(1 - (np.linalg.norm(freqs_b, axis=2) - bw)
                      / (sr / 2 - bw), 0, 1)
    cx = ((np.arange(size_x) * 2 + 1) / size_x - 1) * (0.5 * size_x / sr)
    cy = ((np.arange(size_y) * 2 + 1) / size_y - 1) * (0.5 * size_y / sr)
    gy, gx = np.meshgrid(cy, cx, indexing="ij")
    grid = np.stack([gx, gy], axis=-1)
    x = np.einsum("hwf,bcf->bhwc", grid, freqs_b) + phases_b[:, None, None, :]
    x = np.sin(x * (np.pi * 2)) * amp[:, None, None, :]
    x = x @ (weight.T / np.sqrt(weight.shape[1]))
    return np.transpose(x, (0, 3, 1, 2))


def _assert_synthesis_input_close(torch, tinp, got, w):
    """fp32 parity with float64 adjudication: sin() of O(10) phase sums
    amplifies fp32 rounding, so bound OUR fp32 error vs the float64 oracle
    by the reference's OWN fp32 error vs the same oracle (same convention
    as scripts/fuzz_ops_parity.py)."""
    with torch.no_grad():
        want32 = tinp(torch.from_numpy(w)).numpy()
    want64 = _synthesis_input_oracle64(tinp, w)
    np.testing.assert_allclose(got, want32, rtol=2e-2, atol=2e-4)  # floor
    err_ref = np.abs(want32 - want64).max()
    err_us = np.abs(got - want64).max()
    assert err_us <= max(3 * err_ref, 1e-6), (err_us, err_ref)


def test_synthesis_input_forward_parity(ref, rng):
    torch = ref["torch"]
    # The upstream input-layer shape family (networks_stylegan3.py:642-644):
    # size = first_size + margin*2, sampling_rate = first_size.
    tinp, jinp, variables = _synthesis_input_pair(
        ref, seed=0, w_dim=64, channels=32, size=36, sampling_rate=16,
        bandwidth=2)
    w = rng.randn(4, 64).astype(np.float32)
    got = np.asarray(jinp.apply(variables, jnp.asarray(w)))
    assert got.shape == (4, 32, 36, 36)
    _assert_synthesis_input_close(torch, tinp, got, w)


@pytest.mark.parametrize(
    "channels,size,sampling_rate,bandwidth",
    [(4, 16, 16, 2), (8, 52, 16, 8), (16, 64, 32, 2), (32, 20, 8, 4 / 3)])
def test_synthesis_input_fuzz(ref, rng, channels, size, sampling_rate,
                              bandwidth):
    torch = ref["torch"]
    tinp, jinp, variables = _synthesis_input_pair(
        ref, seed=channels, w_dim=32, channels=channels, size=size,
        sampling_rate=sampling_rate, bandwidth=bandwidth)
    w = rng.randn(3, 32).astype(np.float32)
    got = np.asarray(jinp.apply(variables, jnp.asarray(w)))
    _assert_synthesis_input_close(torch, tinp, got, w)


def test_synthesis_input_init_matches_reference_stats(ref):
    """Our freq_init must draw from the reference's disc distribution:
    unit-disc-normalized gaussians scaled by bandwidth (statistical check,
    different RNG streams)."""
    from afcm_tpu.nn.stylegan3 import SynthesisInput
    jinp = SynthesisInput(w_dim=16, channels=512, size=16, sampling_rate=16,
                          bandwidth=2)
    variables = jinp.init(jax.random.PRNGKey(3), jnp.zeros((1, 16)))
    freqs = np.asarray(variables["constants"]["freqs"])
    radii = np.linalg.norm(freqs, axis=1)
    assert radii.max() <= 2.0 + 1e-6  # bandwidth-bounded
    phases = np.asarray(variables["constants"]["phases"])
    assert -0.5 <= phases.min() and phases.max() <= 0.5
