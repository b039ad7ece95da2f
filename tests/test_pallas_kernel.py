"""Pallas filtered_lrelu kernel vs the XLA composition (interpret mode on CPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from afcm_tpu import ops  # noqa: E402
from afcm_tpu.ops.pallas.filtered_lrelu_tpu import filtered_lrelu_pallas  # noqa: E402


def _filters():
    fu = ops.design_lowpass_filter(12, cutoff=8, width=16, fs=64)
    fd = ops.design_lowpass_filter(12, cutoff=11.3, width=41, fs=64)
    return fu, fd


@pytest.mark.parametrize("up,down,pad", [
    (2, 2, (-2, -2, -2, -2)),       # critically sampled layer
    (2, 2, (9, 8, 9, 8)),           # positive padding
    (2, 4, (5, 5, 5, 5)),           # downsampling encoder layer
    (1, 1, (11, 11, 11, 11)),       # no resampling
    (1, 2, (11, 12, 11, 12)),       # plain downsample
])
def test_pallas_matches_xla(rng, up, down, pad):
    fu, fd = _filters()
    x = jnp.asarray(rng.randn(2, 3, 36, 36).astype(np.float32))
    b = jnp.asarray(rng.randn(3).astype(np.float32))

    want = ops.filtered_lrelu(x, fu=fu, fd=fd, b=b, up=up, down=down,
                              padding=pad, gain=np.sqrt(2), slope=0.2,
                              clamp=256)
    got = filtered_lrelu_pallas(x, fu, fd, b, up, down, pad,
                                float(np.sqrt(2)), 0.2, 256.0, False,
                                interpret=True)
    assert got is not None, "config should be supported"
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)


def test_pallas_identity_filters(rng):
    x = jnp.asarray(rng.randn(1, 2, 16, 16).astype(np.float32))
    want = ops.filtered_lrelu(x, fu=None, fd=None, b=None, up=1, down=1,
                              padding=0, gain=1.0, slope=0.2, clamp=None)
    got = filtered_lrelu_pallas(x, None, None, None, 1, 1, (0, 0, 0, 0),
                                1.0, 0.2, None, False, interpret=True)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_pallas_rejects_upsampling_config():
    x = jnp.zeros((1, 1, 16, 16))
    fu, fd = _filters()
    out = filtered_lrelu_pallas(x, fu, fd, None, 4, 2, (0, 0, 0, 0), 1.0,
                                0.2, None, False, interpret=True)
    assert out is None  # down % up != 0 -> XLA fallback


def test_pallas_real_layer_geometry(rng):
    """Exact geometry of AFCM decoder layer L5 (sr 32, critically sampled)."""
    from afcm_tpu.nn.stylegan3 import (_design_layer_filters,
                                       compute_synthesis_layout)
    layout = compute_synthesis_layout(
        img_resolution=256, img_channels_in=4, img_channels_out=1,
        channel_base=16384, channel_max=512, num_layers=14, num_critical=2,
        first_cutoff=2, first_stopband=2 ** 2.1, last_stopband_rel=2 ** 0.3,
        margin_size=10, output_scale=0.25, skip_resolution=128)
    spec = layout.decoder_specs[4]  # 52 -> 52, critically sampled
    fu, fd, up, down, padding = _design_layer_filters(
        spec, is_torgb=False, filter_size=6, lrelu_upsampling=2,
        use_radial_filters=False)
    assert down % up == 0
    in_size = spec.in_size + 2  # after conv k3 pad 2
    x = jnp.asarray(rng.randn(1, 4, in_size, in_size).astype(np.float32))
    b = jnp.asarray(rng.randn(4).astype(np.float32))
    want = ops.filtered_lrelu(x, fu=fu, fd=fd, b=b, up=up, down=down,
                              padding=padding, gain=np.sqrt(2), slope=0.2,
                              clamp=256)
    got = filtered_lrelu_pallas(x, fu, fd, b, up, down, padding,
                                float(np.sqrt(2)), 0.2, 256.0, False,
                                interpret=True)
    assert got is not None
    assert got.shape == want.shape == (1, 4, spec.out_size, spec.out_size)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)
