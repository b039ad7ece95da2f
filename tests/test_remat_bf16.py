"""remat + bf16 knobs on the SG3 generator."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from afcm_tpu.nn import Stylegan3Generator  # noqa: E402

SMALL = dict(z_dim=32, c_dim=1, w_dim=32, img_resolution=32,
             img_channels_in=4, img_channels_out=1,
             mapping_kwargs=dict(num_layers=2))
SYNTH = dict(channel_base=1024, channel_max=32, num_layers=4, num_critical=2,
             margin_size=4, skip_resolution=16, conv_clamp=256,
             lrelu_upsampling=2)


def _inputs(rng):
    return (jnp.asarray(rng.randn(2, 32), jnp.float32),
            jnp.asarray(rng.rand(2, 1), jnp.float32),
            jnp.asarray(rng.randn(2, 4, 32, 32).clip(-1, 1), jnp.float32))


def test_remat_matches_plain_forward_and_grad(rng):
    z, c, cond = _inputs(rng)
    plain = Stylegan3Generator(synthesis_kwargs=dict(SYNTH), **SMALL)
    remat = Stylegan3Generator(synthesis_kwargs=dict(SYNTH, remat=True),
                               **SMALL)
    variables = plain.init(jax.random.PRNGKey(0), z, c, cond)

    out_p = plain.apply(variables, z, c, cond)
    out_r = remat.apply(variables, z, c, cond)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r),
                               rtol=1e-5, atol=1e-6)

    def loss_p(v):
        return jnp.mean(jnp.square(plain.apply(v, z, c, cond)))

    def loss_r(v):
        return jnp.mean(jnp.square(remat.apply(v, z, c, cond)))

    g_p = jax.grad(loss_p)(variables)
    g_r = jax.grad(loss_r)(variables)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_bf16_close_to_fp32(rng):
    z, c, cond = _inputs(rng)
    fp32 = Stylegan3Generator(synthesis_kwargs=dict(SYNTH), **SMALL)
    bf16 = Stylegan3Generator(synthesis_kwargs=dict(SYNTH,
                                                    compute_dtype="bfloat16"),
                              **SMALL)
    variables = fp32.init(jax.random.PRNGKey(0), z, c, cond)
    out32 = np.asarray(fp32.apply(variables, z, c, cond))
    out16 = np.asarray(bf16.apply(variables, z, c, cond))
    assert out16.dtype == np.float32  # output cast back
    rel = np.abs(out32 - out16).max() / (np.abs(out32).max() + 1e-9)
    assert rel < 0.05
    # Pin the bf16 drift budget as PSNR (VERDICT r1 item 3): >= 50 dB keeps
    # it far inside the 0.1 dB task-metric parity budget (56.3 dB measured
    # on hardware, BASELINE.md).
    rng_span = out32.max() - out32.min()
    psnr = 20 * np.log10(rng_span / np.sqrt(np.mean((out32 - out16) ** 2)))
    assert psnr >= 50.0, psnr


def test_selective_remat_matches(rng):
    """remat_min_size gates which layers recompute without changing values."""
    z, c, cond = _inputs(rng)
    plain = Stylegan3Generator(synthesis_kwargs=dict(SYNTH), **SMALL)
    sel = Stylegan3Generator(
        synthesis_kwargs=dict(SYNTH, remat=True, remat_min_size=24), **SMALL)
    variables = plain.init(jax.random.PRNGKey(0), z, c, cond)
    np.testing.assert_allclose(
        np.asarray(plain.apply(variables, z, c, cond)),
        np.asarray(sel.apply(variables, z, c, cond)), rtol=1e-5, atol=1e-6)

    g_p = jax.grad(lambda v: jnp.mean(jnp.square(
        plain.apply(v, z, c, cond))))(variables)
    g_s = jax.grad(lambda v: jnp.mean(jnp.square(
        sel.apply(v, z, c, cond))))(variables)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_config_knobs_build(rng):
    from afcm_tpu.config import get_default_cfg, apply_model_defaults
    from afcm_tpu.models import build_gan_model
    cfg = get_default_cfg()
    apply_model_defaults(cfg, "stylegan3")
    cfg.tpu.compute_dtype = "bfloat16"
    cfg.tpu.remat = True
    model = build_gan_model(cfg)
    assert model.generator.synthesis_kwargs["compute_dtype"] == "bfloat16"
    assert model.generator.synthesis_kwargs["remat"] is True


def test_discriminator_bf16_close_to_fp32(rng):
    """tpu.compute_dtype drives the D block pyramid too (round 4): bf16
    blocks + f32 epilogue (the TPU analog of the reference's per-block
    use_fp16, CoModGAN/generator.py:625-638). Same params, loose drift."""
    from afcm_tpu.nn import CoModDiscriminator
    img = jnp.asarray(rng.randn(4, 5, 32, 32), jnp.float32)
    c = jnp.asarray(rng.rand(4, 1), jnp.float32)
    kw = dict(c_dim=1, img_resolution=32, img_channels=5, channel_base=2048,
              channel_max=64, epilogue_kwargs=dict(mbstd_group_size=2))
    d32 = CoModDiscriminator(**kw)
    dbf = CoModDiscriminator(compute_dtype="bfloat16", **kw)
    variables = d32.init(jax.random.PRNGKey(0), img, c)
    out32 = np.asarray(d32.apply(variables, img, c))
    out16 = np.asarray(dbf.apply(variables, img, c))
    assert out16.dtype == np.float32  # epilogue restores f32
    rel = np.abs(out32 - out16).max() / (np.abs(out32).max() + 1e-9)
    assert rel < 0.05, rel
    # R1-style input gradient also flows (through the bf16 cast).
    g = jax.grad(lambda im: jnp.sum(dbf.apply(variables, im, c)))(img)
    assert np.asarray(g).dtype == np.float32
    assert np.isfinite(np.asarray(g)).all()


def test_config_compute_dtype_reaches_discriminator(rng):
    from afcm_tpu.config import get_default_cfg, apply_model_defaults
    from afcm_tpu.models import build_gan_model
    cfg = get_default_cfg()
    apply_model_defaults(cfg, "stylegan3")
    cfg.tpu.compute_dtype = "bfloat16"
    model = build_gan_model(cfg)
    assert model.discriminator.compute_dtype == "bfloat16"
    cfg2 = get_default_cfg()
    apply_model_defaults(cfg2, "stylegan3")
    model2 = build_gan_model(cfg2)
    assert model2.discriminator.compute_dtype == "float32"
