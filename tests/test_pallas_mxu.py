"""v3 fused banded-MXU filtered_lrelu: numerics + gradients vs the XLA
composition (interpret mode on CPU; the TPU compile path is exercised by
bench/eval on hardware).

Covers the four layer archetypes of the CMSR generator worklist:
same-res up2/down2, upsampling up4/down2 (negative padding), encoder
transition up2/down4, and the margin-crop final layer.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from afcm_tpu.ops.filter_design import design_lowpass_filter  # noqa: E402
from afcm_tpu.ops.filtered_lrelu import filtered_lrelu  # noqa: E402
from afcm_tpu.ops.pallas.filtered_lrelu_mxu import (  # noqa: E402
    filtered_lrelu_mxu)

CONFIGS = [
    dict(size=36, c=8, up=2, down=2, ntu=12, ntd=12, pad=(9, 8, 9, 8)),
    dict(size=40, c=4, up=4, down=2, ntu=24, ntd=12, pad=(-6, -9, -6, -9)),
    dict(size=48, c=4, up=2, down=4, ntu=12, ntd=24, pad=(34, 33, 34, 33)),
    dict(size=70, c=3, up=2, down=2, ntu=12, ntd=12,
         pad=(-11, -12, -11, -12)),
]


def _filters(cfg):
    fu = design_lowpass_filter(cfg["ntu"], cutoff=cfg["size"] / 4,
                               width=cfg["size"] / 4,
                               fs=cfg["size"] * cfg["up"])
    fd = design_lowpass_filter(cfg["ntd"], cutoff=cfg["size"] / 4,
                               width=cfg["size"] / 4,
                               fs=cfg["size"] * cfg["up"])
    return fu, fd


@pytest.mark.parametrize("element_gather", [False, True],
                         ids=["gather", "element"])
@pytest.mark.parametrize("cfg", CONFIGS, ids=lambda c: f"u{c['up']}d{c['down']}s{c['size']}")
def test_forward_matches_xla(cfg, element_gather, rng):
    fu, fd = _filters(cfg)
    x = jnp.asarray(rng.randn(2, cfg["c"], cfg["size"],
                              cfg["size"]).astype(np.float32))
    b = jnp.asarray(rng.randn(cfg["c"]).astype(np.float32))
    want = filtered_lrelu(x, fu=fu, fd=fd, b=b, up=cfg["up"],
                          down=cfg["down"], padding=cfg["pad"],
                          gain=np.sqrt(2), slope=0.2, clamp=256, impl="xla")
    got = filtered_lrelu_mxu(x, fu, fd, b, cfg["up"], cfg["down"],
                             cfg["pad"], float(np.sqrt(2)), 0.2, 256.0,
                             False, interpret=True,
                             element_gather=element_gather)
    assert got is not None and got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("element_gather", [False, True],
                         ids=["gather", "element"])
def test_gradient_matches_xla(element_gather, rng):
    cfg = CONFIGS[0]
    fu, fd = _filters(cfg)
    x = jnp.asarray(rng.randn(1, 3, cfg["size"],
                              cfg["size"]).astype(np.float32))
    b = jnp.asarray(rng.randn(3).astype(np.float32))
    kw = dict(gain=np.sqrt(2), slope=0.2, clamp=256)

    def loss_xla(x, b):
        return jnp.sum(jnp.sin(filtered_lrelu(
            x, fu=fu, fd=fd, b=b, up=2, down=2, padding=cfg["pad"],
            impl="xla", **kw)))

    def loss_mxu(x, b):
        return jnp.sum(jnp.sin(filtered_lrelu_mxu(
            x, fu, fd, b, 2, 2, cfg["pad"], float(np.sqrt(2)), 0.2, 256.0,
            False, interpret=True, element_gather=element_gather)))

    gx1, gb1 = jax.grad(loss_xla, argnums=(0, 1))(x, b)
    gx2, gb2 = jax.grad(loss_mxu, argnums=(0, 1))(x, b)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb2), np.asarray(gb1),
                               rtol=1e-4, atol=1e-5)


def test_unsupported_returns_none():
    x = jnp.zeros((1, 2, 8, 8))
    # pure elementwise (torgb) layer: XLA is already optimal
    assert filtered_lrelu_mxu(x, np.ones(1, np.float32),
                              np.ones(1, np.float32), None, 1, 1,
                              (0, 0, 0, 0), 1.0, 1.0, None, False,
                              interpret=True) is None
    # 2-D (radial) filters are not separable
    assert filtered_lrelu_mxu(x, np.ones((3, 3), np.float32),
                              np.ones(1, np.float32), None, 2, 2,
                              (1, 1, 1, 1), 1.0, 0.2, None, False,
                              interpret=True) is None


@pytest.mark.parametrize("cfg", CONFIGS[:2],
                         ids=lambda c: f"u{c['up']}d{c['down']}s{c['size']}")
def test_forward_bf16_matches_xla(cfg, rng):
    """The production routing feeds the kernel bf16 inputs exclusively; the
    bf16 scratch-rounding path (A/CC held bf16 between matmuls) gets its own
    interpret-mode check with a PSNR-style bound against the fp32 XLA chain."""
    fu, fd = _filters(cfg)
    x32 = jnp.asarray(rng.randn(2, cfg["c"], cfg["size"],
                                cfg["size"]).astype(np.float32))
    b32 = jnp.asarray(rng.randn(cfg["c"]).astype(np.float32))
    want = np.asarray(filtered_lrelu(
        x32, fu=fu, fd=fd, b=b32, up=cfg["up"], down=cfg["down"],
        padding=cfg["pad"], gain=np.sqrt(2), slope=0.2, clamp=256,
        impl="xla"), np.float32)
    got = filtered_lrelu_mxu(
        x32.astype(jnp.bfloat16), fu, fd, b32.astype(jnp.bfloat16),
        cfg["up"], cfg["down"], cfg["pad"], float(np.sqrt(2)), 0.2, 256.0,
        False, interpret=True)
    assert got is not None and got.dtype == jnp.bfloat16
    got = np.asarray(got, np.float32)
    assert got.shape == want.shape
    err = np.mean((got - want) ** 2)
    data_range = float(want.max() - want.min())
    psnr = 10 * np.log10(data_range ** 2 / max(err, 1e-12))
    assert psnr > 38, f"bf16 kernel drift too large: PSNR={psnr:.1f} dB"
