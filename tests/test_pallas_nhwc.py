"""NHWC (channels-on-lanes) Pallas kernel parity in interpret mode."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from afcm_tpu import ops  # noqa: E402
from afcm_tpu.ops.pallas.filtered_lrelu_nhwc import (  # noqa: E402
    filtered_lrelu_pallas_nhwc)


def _filters():
    fu = ops.design_lowpass_filter(12, cutoff=8, width=16, fs=64)
    fd = ops.design_lowpass_filter(12, cutoff=11.3, width=41, fs=64)
    return fu, fd


@pytest.mark.parametrize("c,h,pad", [
    (3, 54, (-2, -2, -2, -2)),
    (5, 36, (9, 8, 9, 8)),
    (130, 20, (-2, -2, -2, -2)),   # channel padding to 2x128
])
def test_nhwc_matches_xla(rng, c, h, pad):
    fu, fd = _filters()
    x = jnp.asarray(rng.randn(2, c, h, h).astype(np.float32))
    b = jnp.asarray(rng.randn(c).astype(np.float32))
    want = ops.filtered_lrelu(x, fu=fu, fd=fd, b=b, up=2, down=2, padding=pad,
                              gain=np.sqrt(2), slope=0.2, clamp=256)
    got = filtered_lrelu_pallas_nhwc(x, fu, fd, b, 2, 2, pad,
                                     float(np.sqrt(2)), 0.2, 256.0, False,
                                     interpret=True)
    assert got is not None
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)


def test_nhwc_rejects_resampling_mismatch():
    fu, fd = _filters()
    x = jnp.zeros((1, 4, 32, 32))
    assert filtered_lrelu_pallas_nhwc(x, fu, fd, None, 2, 4, (0, 0, 0, 0),
                                      1.0, 0.2, None, False,
                                      interpret=True) is None
