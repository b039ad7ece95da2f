"""int8 fused conv kernel: numerics (interpret mode), routing, STE grads,
and an end-to-end PSNR guardrail on a generator forward.

The real-hardware throughput claims live in docs/performance.md; here we
pin correctness on CPU. Reference analog: the CUDA ops exist purely for
throughput (torch_utils/ops/*.cu); the int8 path is their TPU-native
replacement for inference.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from afcm_tpu.ops.pallas.conv_int8 import (conv3x3_int8,  # noqa: E402
                                           int8_routable, plan_blocks)

_DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                 ("NCHW", "OIHW", "NCHW"))


def _ref_conv(x, w, p):
    return lax.conv_general_dilated(
        x.astype(jnp.float32), w, (1, 1), ((p, p), (p, p)),
        dimension_numbers=_DN)


def _psnr(got, want):
    err = np.mean((got - want) ** 2)
    dr = float(want.max() - want.min())
    return 10 * np.log10(dr * dr / max(err, 1e-12))


@pytest.mark.parametrize("variant", ["dots", "im2col"])
@pytest.mark.parametrize("i,o,h,p", [
    (48, 40, 20, 1),    # 'same' conv, odd channels
    (64, 64, 24, 2),    # full padding (the alias-free layers' form)
    (128, 96, 36, 2),   # needs channel padding on O only
])
def test_conv_int8_matches_f32(variant, i, o, h, p, rng):
    x = jnp.asarray(rng.randn(2, i, h, h), jnp.float32)
    w = jnp.asarray(rng.randn(o, i, 3, 3) / np.sqrt(9 * i), jnp.float32)
    want = np.asarray(_ref_conv(x, w, p))
    got = conv3x3_int8(x, w, padding=p, variant=variant, interpret=True)
    assert got is not None and got.dtype == jnp.bfloat16
    got = np.asarray(got, np.float32)
    assert got.shape == want.shape
    assert _psnr(got, want) > 50, "per-layer int8 drift above budget"


def test_conv_int8_extra_scale(rng):
    x = jnp.asarray(rng.randn(2, 48, 16, 16), jnp.float32)
    w = jnp.asarray(rng.randn(40, 48, 3, 3) / 21, jnp.float32)
    es = jnp.asarray(rng.rand(2, 40) + 0.5, jnp.float32)
    want = np.asarray(_ref_conv(x, w, 1)) * np.asarray(es)[:, :, None, None]
    got = np.asarray(conv3x3_int8(x, w, padding=1, extra_scale=es,
                                  interpret=True), np.float32)
    assert _psnr(got, want) > 50


def test_routing_gates():
    # 1x1 kernels, tiny channels, non-square, infeasible padding: all out
    assert not int8_routable((1, 64, 32, 32), (64, 64, 1, 1), 1)
    assert not int8_routable((1, 16, 32, 32), (16, 16, 3, 3), 1)
    assert not int8_routable((1, 64, 32, 16), (64, 64, 3, 3), 1)
    assert not int8_routable((1, 64, 32, 32), (64, 64, 3, 3), 3)
    assert int8_routable((1, 64, 32, 32), (64, 64, 3, 3), 1)
    assert int8_routable((16, 362, 148, 148), (512, 362, 3, 3), 2)


def test_plan_alignment():
    """Every multi-block plan must give lane-aligned DMA window starts."""
    for (ipad, o, h, wp) in [(384, 512, 150, 160), (128, 128, 278, 288),
                             (512, 512, 86, 96), (512, 512, 38, 64)]:
        plan = plan_blocks(ipad, o, h, wp, "dots")
        assert plan is not None
        rows, hpad = plan
        assert hpad % rows == 0
        if rows < h:  # multi-block: starts at rb*rows*wp must be 128-aligned
            assert (rows * wp) % 128 == 0


def test_conv2d_routes_int8(rng, monkeypatch):
    """The ops.conv2d entry point honors set_conv_impl('int8')."""
    from afcm_tpu.ops import modulated_conv as mc
    monkeypatch.setattr(mc, "_FORCE_INT8", True)
    x = jnp.asarray(rng.randn(1, 64, 24, 24), jnp.float32)
    w = jnp.asarray(rng.randn(64, 64, 3, 3) / 24, jnp.float32)
    want = np.asarray(mc.conv2d(x, w, padding=2))
    mc.set_conv_impl("int8")
    try:
        got = np.asarray(mc.conv2d(x, w, padding=2), np.float32)
    finally:
        mc.set_conv_impl("xla")
    assert got.shape == want.shape
    assert _psnr(got, want) > 50
    # groups != 1 and asymmetric padding fall back to XLA regardless
    mc.set_conv_impl("int8")
    try:
        xg = jnp.asarray(rng.randn(1, 64, 12, 12), jnp.float32)
        wg = jnp.asarray(rng.randn(64, 32, 3, 3) / 17, jnp.float32)
        out = mc.conv2d(xg, wg, padding=1, groups=2)
        assert out.dtype == xg.dtype
    finally:
        mc.set_conv_impl("xla")


def test_generator_int8_psnr_guardrail(rng, monkeypatch):
    """End-to-end guardrail (VERDICT r2 item 1c): the tiny-G forward under
    int8 conv routing must stay within the quantization budget of the f32
    output. The full-size G is checked on hardware (docs/performance.md)."""
    from afcm_tpu.nn import Stylegan3Generator
    from afcm_tpu.ops import modulated_conv as mc

    gen = Stylegan3Generator(
        z_dim=64, c_dim=1, w_dim=64, img_resolution=64, img_channels_in=4,
        img_channels_out=1, mapping_kwargs=dict(num_layers=2),
        synthesis_kwargs=dict(channel_base=8192, channel_max=128,
                              num_layers=6, num_critical=2, margin_size=10,
                              skip_resolution=32, conv_clamp=256))
    z = jnp.asarray(rng.randn(1, 64), jnp.float32)
    c = jnp.asarray(rng.rand(1, 1), jnp.float32)
    cond = jnp.asarray(rng.randn(1, 4, 64, 64).clip(-1, 1), jnp.float32)
    variables = gen.init(jax.random.PRNGKey(0), z, c, cond)
    want = np.asarray(gen.apply(variables, z, c, cond), np.float32)

    monkeypatch.setattr(mc, "_FORCE_INT8", True)
    mc.set_conv_impl("int8", min_ch=32)
    try:
        got = np.asarray(gen.apply(variables, z, c, cond), np.float32)
    finally:
        mc.set_conv_impl("xla", min_ch=64)
    psnr = _psnr(got, want)
    assert psnr > 45, f"int8 generator drift {psnr:.1f} dB < 45 dB budget"


def test_ste_gradients_flow(rng, monkeypatch):
    """Under int8 routing, grads use the straight-through f32 conv adjoint
    and match the XLA path closely (quantization noise excepted)."""
    from afcm_tpu.ops import modulated_conv as mc
    monkeypatch.setattr(mc, "_FORCE_INT8", True)
    x = jnp.asarray(rng.randn(1, 48, 16, 16), jnp.float32)
    w = jnp.asarray(rng.randn(48, 48, 3, 3) / 21, jnp.float32)

    def loss(x, w):
        return jnp.sum(jnp.sin(mc.conv2d(x, w, padding=1).astype(jnp.float32)))

    gx_ref, gw_ref = jax.grad(loss, argnums=(0, 1))(x, w)
    mc.set_conv_impl("int8", min_ch=32)
    try:
        gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
    finally:
        mc.set_conv_impl("xla", min_ch=64)
    # forward outputs differ by quantization noise -> cos' differs a bit;
    # the gradients must agree to a few percent, not machine precision
    assert _psnr(np.asarray(gx), np.asarray(gx_ref)) > 30
    assert _psnr(np.asarray(gw), np.asarray(gw_ref)) > 30
