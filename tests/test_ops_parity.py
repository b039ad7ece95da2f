"""Numerical parity of afcm_tpu.ops against the reference pure-PyTorch ops."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from afcm_tpu import ops  # noqa: E402
from tests._torch_ref import load_reference_ops  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    return load_reference_ops()


def _rand(rng, *shape):
    return rng.randn(*shape).astype(np.float32)


@pytest.mark.parametrize("up,down,pad,sep", [
    (1, 1, 0, True),
    (2, 1, 3, True),
    (1, 2, 1, True),
    (2, 2, (4, 2, 3, 5), True),
    (2, 1, 2, False),
    (1, 2, (-1, 2, 0, 1), True),
    (4, 2, 11, True),
])
def test_upfirdn2d_parity(ref, rng, up, down, pad, sep):
    torch = ref["torch"]
    x = _rand(rng, 2, 3, 16, 20)
    taps = 12 if sep else 6
    f = rng.randn(taps).astype(np.float32) if sep else rng.randn(taps, taps).astype(np.float32)

    want = ref["upfirdn2d"].upfirdn2d(
        torch.from_numpy(x), torch.from_numpy(f), up=up, down=down,
        padding=pad, gain=1.5, impl="ref").numpy()
    got = np.asarray(ops.upfirdn2d(jnp.asarray(x), f, up=up, down=down,
                                   padding=pad, gain=1.5))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upfirdn2d_identity_filter(ref, rng):
    torch = ref["torch"]
    x = _rand(rng, 1, 2, 9, 9)
    want = ref["upfirdn2d"].upfirdn2d(torch.from_numpy(x), None, up=2,
                                      padding=1, impl="ref").numpy()
    got = np.asarray(ops.upfirdn2d(jnp.asarray(x), None, up=2, padding=1))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("helper", ["filter2d", "upsample2d", "downsample2d"])
def test_upfirdn2d_helpers(ref, rng, helper):
    torch = ref["torch"]
    x = _rand(rng, 2, 3, 12, 12)
    f = ops.setup_filter([1, 3, 3, 1])
    want = getattr(ref["upfirdn2d"], helper)(
        torch.from_numpy(x), torch.from_numpy(np.asarray(f)), impl="ref").numpy()
    got = np.asarray(getattr(ops, helper)(jnp.asarray(x), f))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_setup_filter_matches_reference(ref):
    torch = ref["torch"]
    for cand in [None, [1, 3, 3, 1], np.random.RandomState(1).randn(8),
                 np.random.RandomState(2).randn(4, 4)]:
        want = ref["upfirdn2d"].setup_filter(
            None if cand is None else torch.as_tensor(cand), gain=2).numpy()
        got = ops.setup_filter(cand, gain=2)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("act", ["linear", "relu", "lrelu", "tanh", "sigmoid",
                                 "elu", "selu", "softplus", "swish"])
def test_bias_act_parity(ref, rng, act):
    torch = ref["torch"]
    x = _rand(rng, 3, 5, 4, 4) * 3
    b = _rand(rng, 5)
    want = ref["bias_act"].bias_act(torch.from_numpy(x), torch.from_numpy(b),
                                    act=act, gain=1.7, clamp=2.0,
                                    impl="ref").numpy()
    got = np.asarray(ops.bias_act(jnp.asarray(x), jnp.asarray(b), act=act,
                                  gain=1.7, clamp=2.0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, 11),
    (2, 1, (3, 4, 3, 4)),
    (2, 2, (12, 11, 12, 11)),
    (1, 2, 11),
])
def test_filtered_lrelu_parity(ref, rng, up, down, pad):
    torch = ref["torch"]
    x = _rand(rng, 2, 4, 18, 18)
    b = _rand(rng, 4)
    fu = ops.design_lowpass_filter(12, cutoff=4, width=6, fs=32)
    fd = ops.design_lowpass_filter(12, cutoff=4, width=6, fs=32)
    want = ref["filtered_lrelu"].filtered_lrelu(
        torch.from_numpy(x), fu=torch.from_numpy(fu), fd=torch.from_numpy(fd),
        b=torch.from_numpy(b), up=up, down=down, padding=pad,
        gain=np.sqrt(2), slope=0.2, clamp=256, impl="ref").numpy()
    got = np.asarray(ops.filtered_lrelu(
        jnp.asarray(x), fu=fu, fd=fd, b=jnp.asarray(b), up=up, down=down,
        padding=pad, gain=np.sqrt(2), slope=0.2, clamp=256))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_filtered_lrelu_output_size(ref, rng):
    torch = ref["torch"]
    x = _rand(rng, 1, 1, 36, 36)
    fu = ops.design_lowpass_filter(12, cutoff=2, width=12, fs=32)
    fd = ops.design_lowpass_filter(12, cutoff=2, width=12, fs=32)
    pad = (9, 9, 9, 9)
    want = ref["filtered_lrelu"].filtered_lrelu(
        torch.from_numpy(x), fu=torch.from_numpy(fu), fd=torch.from_numpy(fd),
        up=2, down=2, padding=pad, impl="ref").numpy()
    oh, ow = ops.filtered_lrelu_output_size((36, 36), fu, fd, 2, 2, pad)
    assert want.shape[2:] == (oh, ow)


@pytest.mark.parametrize("up,down,k,groups", [
    (1, 1, 3, 1),
    (2, 1, 3, 1),
    (1, 2, 3, 1),
    (1, 2, 1, 1),
    (2, 1, 1, 1),
    (1, 1, 1, 2),
])
def test_conv2d_resample_parity(ref, rng, up, down, k, groups):
    torch = ref["torch"]
    x = _rand(rng, 2, 6, 16, 16)
    w = _rand(rng, 8, 6 // groups, k, k)
    f = ops.setup_filter([1, 3, 3, 1])
    want = ref["conv2d_resample"].conv2d_resample(
        torch.from_numpy(x), torch.from_numpy(w),
        f=torch.from_numpy(np.asarray(f)), up=up, down=down, padding=k // 2,
        groups=groups, flip_weight=(up == 1)).numpy()
    got = np.asarray(ops.conv2d_resample(
        jnp.asarray(x), jnp.asarray(w), f=f, up=up, down=down, padding=k // 2,
        groups=groups, flip_weight=(up == 1)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_design_lowpass_filter_matches_reference(ref):
    n3 = ref["torch"].hub  # noqa: F841 (ensure torch import alive)
    import sys
    from models.networks.stylegan3.networks_stylegan3 import SynthesisLayer
    for numtaps, cutoff, width, fs, radial in [
            (12, 2.0, 12.0, 32.0, False),
            (12, 22.6, 82.7, 256.0, False),
            (1, 2.0, 12.0, 16.0, False),
            (24, 64.0, 75.0, 512.0, True)]:
        want = SynthesisLayer.design_lowpass_filter(numtaps, cutoff, width, fs,
                                                    radial=radial)
        got = ops.design_lowpass_filter(numtaps, cutoff, width, fs, radial=radial)
        if want is None:
            assert got is None
        else:
            np.testing.assert_allclose(got, want.numpy(), rtol=1e-6, atol=1e-7)


def test_modulated_conv2d_parity(ref, rng):
    """Scale-activation factorization == reference grouped-conv modconv."""
    torch = ref["torch"]
    import models.networks.stylegan3.networks_stylegan3 as ns3

    x = _rand(rng, 3, 6, 8, 8)
    w = _rand(rng, 10, 6, 3, 3)
    s = _rand(rng, 3, 6) + 2.0
    gain = np.float32(0.7)

    want = ns3.modulated_conv2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(s),
        demodulate=True, padding=2,
        input_gain=torch.from_numpy(gain[None]).squeeze()).numpy()
    got = np.asarray(ops.modulated_conv2d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(s), demodulate=True,
        padding=2, input_gain=gain))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # no-demod (toRGB) path
    want = ns3.modulated_conv2d(torch.from_numpy(x), torch.from_numpy(w),
                                torch.from_numpy(s), demodulate=False,
                                padding=0).numpy()
    got = np.asarray(ops.modulated_conv2d(jnp.asarray(x), jnp.asarray(w),
                                          jnp.asarray(s), demodulate=False,
                                          padding=0))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_modulated_conv2d_resample_parity(ref, rng):
    torch = ref["torch"]
    import models.networks.CoModGAN.layers as cl

    x = _rand(rng, 2, 6, 8, 8)
    w = _rand(rng, 12, 6, 3, 3)
    s = _rand(rng, 2, 6) + 1.5
    f = ops.setup_filter([1, 3, 3, 1])
    for up, flip_w in [(1, True), (2, False)]:
        want = cl.modulated_conv2d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(s),
            up=up, padding=1, resample_filter=torch.from_numpy(np.asarray(f)),
            demodulate=True, flip_weight=flip_w, fused_modconv=False).numpy()
        got = np.asarray(ops.modulated_conv2d_resample(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(s), up=up, padding=1,
            resample_filter=f, demodulate=True, flip_weight=flip_w))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_gaussian_blur_matches_reference_filter2d(ref, rng):
    """Masked fixed-footprint blur == reference variable-size blur."""
    torch = ref["torch"]
    x = _rand(rng, 2, 1, 24, 24)
    for sigma in [10.0, 3.7, 1.0, 0.2, 0.0]:
        blur_size = int(np.floor(sigma * 3))
        if blur_size > 0:
            t = torch.arange(-blur_size, blur_size + 1).float()
            f = t.div(sigma).square().neg().exp2()
            want = ref["upfirdn2d"].filter2d(torch.from_numpy(x), f / f.sum(),
                                             impl="ref").numpy()
        else:
            want = x
        got = np.asarray(ops.gaussian_blur2d(jnp.asarray(x), sigma, max_radius=30))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_conv2d_channel_padding_exact(rng):
    """The bf16 lane-padding heuristic (64<=C<128 at >=192 spatial) is
    numerically exact: zero input channels and zero filters contribute 0."""
    import jax.numpy as jnp
    from afcm_tpu.ops.modulated_conv import conv2d

    import jax.lax as lax
    import afcm_tpu.ops.modulated_conv as mc
    mc._FORCE_CHANNEL_PAD = True   # branch is TPU-gated; force it on CPU
    try:
        _run_channel_padding_check(rng, lax, jnp, conv2d)
    finally:
        mc._FORCE_CHANNEL_PAD = False


def _run_channel_padding_check(rng, lax, jnp, conv2d):
    x = jnp.asarray(rng.randn(1, 64, 192, 192), jnp.bfloat16)
    w = jnp.asarray(rng.randn(91, 64, 3, 3) * 0.05, jnp.bfloat16)
    got = conv2d(x, w, padding=1)          # padded branch (64->91 channels)
    # unpadded reference: direct lax conv (correlation, like conv2d default)
    dn = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NCHW", "OIHW", "NCHW"))
    for dtype, tol in ((jnp.bfloat16, 2e-2), (jnp.float32, 1e-5)):
        xd, wd = x.astype(dtype), w.astype(dtype)
        got = conv2d(xd, wd, padding=1)            # padded branch active
        want = lax.conv_general_dilated(
            xd, wd, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=dn)                   # plain conv, flipped
        assert got.shape == want.shape == (1, 91, 192, 192)
        rel = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                                    want.astype(jnp.float32))) /
                    (jnp.max(jnp.abs(want.astype(jnp.float32))) + 1e-9))
        assert rel < tol, (dtype, rel)
