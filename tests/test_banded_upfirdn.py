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


# ---------------------------------------------------------------------------
# Custom VJP (swapped-filter forward-form backward; reference
# torch_utils/ops/upfirdn2d.py:250-268) vs plain JAX autodiff.
# ---------------------------------------------------------------------------

def _upfirdn_module():
    import importlib
    return importlib.import_module("afcm_tpu.ops.upfirdn2d")


@pytest.mark.parametrize("up,down,pad,gain,flip,taps", [
    (2, 1, (5, 4, 5, 4), 4.0, False, 12),
    (1, 2, (3, 3, 2, 2), 1.0, False, 12),
    (2, 2, (7, 6, 5, 5), 4.0, True, 11),
    (4, 2, (9, 8, 9, 8), 16.0, False, 12),
    (1, 1, (2, 1, 1, 2), 2.0, False, (5, 7)),  # full 2-D filter
    (2, 1, (4, 4, 4, 4), 1.0, False, None),    # identity filter
])
def test_custom_vjp_matches_autodiff(rng, up, down, pad, gain, flip, taps):
    """The custom backward must equal jax.grad of the plain conv path to
    float32 rounding, including second order (the R1 grad-of-grad pattern)."""
    u = _upfirdn_module()
    if taps is None:
        f = None
    elif isinstance(taps, tuple):
        f = rng.randn(*taps).astype(np.float32)
    else:
        f = rng.randn(taps).astype(np.float32)
    x = jnp.asarray(rng.randn(2, 3, 13, 17).astype(np.float32))

    def run(x, custom):
        u.set_custom_grad(custom)
        try:
            return u.upfirdn2d(x, f, up=up, down=down, padding=pad,
                               gain=gain, flip_filter=flip, impl="conv")
        finally:
            u.set_custom_grad(True)

    np.testing.assert_array_equal(np.asarray(run(x, True)),
                                  np.asarray(run(x, False)))

    grad = lambda custom: jax.grad(
        lambda x: jnp.sum(jnp.sin(run(x, custom))))(x)
    np.testing.assert_allclose(np.asarray(grad(True)),
                               np.asarray(grad(False)), rtol=2e-5, atol=2e-5)

    def r1(x, custom):
        gx = jax.grad(lambda x: jnp.sum(jnp.sin(run(x, custom)) ** 2))(x)
        return jnp.sum(gx ** 2)
    g2 = lambda custom: jax.grad(lambda x: r1(x, custom))(x)
    # 2nd-order tolerance is looser: fp32 accumulation-order noise on the
    # large grad-of-grad magnitudes (worst observed 2.5e-4 relative).
    np.testing.assert_allclose(np.asarray(g2(True)), np.asarray(g2(False)),
                               rtol=5e-4, atol=5e-4)


def test_custom_vjp_under_remat(rng):
    """jax.checkpoint over the custom-VJP op (the training configuration)."""
    u = _upfirdn_module()
    f = ops.design_lowpass_filter(12, cutoff=4, width=6, fs=32)
    x = jnp.asarray(rng.randn(2, 3, 16, 16).astype(np.float32))

    def layer(x):
        y = u.upfirdn2d(x, f, up=2, padding=(5, 6, 5, 6), gain=4, impl="conv")
        y = jnp.maximum(y, 0.2 * y)
        return u.upfirdn2d(y, f, down=2, padding=0, impl="conv")

    def loss(x, ckpt):
        fn = jax.checkpoint(layer) if ckpt else layer
        return jnp.sum(fn(x) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(lambda x: loss(x, True))(x)),
        np.asarray(jax.grad(lambda x: loss(x, False))(x)),
        rtol=1e-5, atol=1e-5)
