"""Banded-matmul upfirdn parity vs the conv composition."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from afcm_tpu import ops  # noqa: E402


@pytest.mark.parametrize("up,down,pad,gain,flip", [
    (2, 2, 11, 1.0, False),
    (2, 1, (3, 4, 5, 6), 4.0, False),
    (1, 2, 11, 1.0, False),
    (1, 1, 6, 2.0, False),
    (4, 2, 11, 16.0, False),
    (2, 1, 8, 4.0, True),
])
def test_banded_matches_conv(rng, up, down, pad, gain, flip):
    f = ops.design_lowpass_filter(12, cutoff=4, width=6, fs=32)
    x = jnp.asarray(rng.randn(2, 3, 20, 24).astype(np.float32))
    a = np.asarray(ops.upfirdn2d(x, f, up=up, down=down, padding=pad,
                                 gain=gain, flip_filter=flip, impl="conv"))
    b = np.asarray(ops.upfirdn2d(x, f, up=up, down=down, padding=pad,
                                 gain=gain, flip_filter=flip, impl="banded"))
    assert a.shape == b.shape
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5)


def test_banded_matches_torch_reference(rng):
    from tests._torch_ref import load_reference_ops
    ref = load_reference_ops()
    torch = ref["torch"]
    f = ops.design_lowpass_filter(12, cutoff=4, width=6, fs=32)
    x = rng.randn(2, 3, 100, 100).astype(np.float32)  # >= 96: auto -> banded
    want = ref["upfirdn2d"].upfirdn2d(torch.from_numpy(x),
                                      torch.from_numpy(f), up=2, down=2,
                                      padding=11, gain=1.5,
                                      impl="ref").numpy()
    got = np.asarray(ops.upfirdn2d(jnp.asarray(x), f, up=2, down=2,
                                   padding=11, gain=1.5, impl="banded"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_auto_uses_conv_for_bf16(rng):
    """The auto heuristic must not reroute bf16 inputs (conv is faster)."""
    f = ops.design_lowpass_filter(12, cutoff=4, width=6, fs=32)
    x = jnp.asarray(rng.randn(1, 2, 128, 128).astype(np.float32))
    a32 = np.asarray(ops.upfirdn2d(x, f, up=2, down=2, padding=11))
    a16 = np.asarray(ops.upfirdn2d(x.astype(jnp.bfloat16), f, up=2, down=2,
                                   padding=11))
    assert a16.dtype == np.dtype("bfloat16")  # conv path preserves dtype
    np.testing.assert_allclose(a16.astype(np.float32), a32, rtol=0.05,
                               atol=0.05)
