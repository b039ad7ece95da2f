"""Train-step behavior tests on a tiny model (CPU, virtual devices)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from afcm_tpu.models import GANConfig, GANModel, build_discriminator, build_generator  # noqa: E402

TINY_G = dict(netG="stylegan3", z_dim=32, c_dim=1, w_dim=32, img_resolution=32,
              img_channels_in=4, img_channels_out=1,
              mapping_kwargs=dict(num_layers=2),
              synthesis_kwargs=dict(channel_base=1024, channel_max=32,
                                    num_layers=4, num_critical=2,
                                    skip_resolution=16, conv_clamp=256,
                                    margin_size=4, lrelu_upsampling=2))
TINY_D = dict(netD="comodgan", c_dim=1, img_resolution=32, img_channels=5,
              channel_base=1024, channel_max=32,
              epilogue_kwargs=dict(mbstd_group_size=2))


def _make_model(**cfg_kwargs):
    cfg = GANConfig(z_dim=32, c_dim=1, batch_size=2, blur_init_sigma=2.0,
                    blur_fade_kimg=1.0, **cfg_kwargs)
    return GANModel(build_generator(dict(TINY_G)),
                    build_discriminator(dict(TINY_D)), cfg)


def _batch(rng, n=2):
    return {"A": jnp.asarray(rng.randn(n, 4, 32, 32).clip(-1, 1), jnp.float32),
            "B": jnp.asarray(rng.randn(n, 1, 32, 32).clip(-1, 1), jnp.float32),
            "slice_idx": jnp.asarray(rng.rand(n, 1), jnp.float32)}


@pytest.fixture(scope="module", autouse=True)
def _fresh_compile_state():
    """Drop executables/tracing caches accumulated by the ~200 compiles that
    precede this module in a full-suite run: the XLA CPU compiler has
    segfaulted on this module's train-step compiles under that accumulated
    state (passes in isolation; see CLAUDE.md testing notes)."""
    jax.clear_caches()


@pytest.fixture(scope="module")
def model():
    return _make_model()


@pytest.fixture(scope="module")
def state(model):
    rng = np.random.RandomState(0)
    return model.init_state(jax.random.PRNGKey(0), _batch(rng))


def test_train_step_updates_everything(model, state):
    rng = np.random.RandomState(1)
    batch = _batch(rng)
    new_state, metrics = model.train_step(
        jax.tree.map(jnp.copy, state), batch, jax.random.PRNGKey(1),
        jnp.asarray(0.0))

    assert int(new_state.step) == 1
    for key in ("G_GAN", "G_L1", "D_real", "D_fake", "D_r1"):
        v = float(metrics[key])
        assert np.isfinite(v), key

    # params moved
    def changed(a, b):
        return any(not np.allclose(x, y) for x, y in
                   zip(jax.tree.leaves(a), jax.tree.leaves(b)))
    assert changed(new_state.params_G, state.params_G)
    assert changed(new_state.params_D, state.params_D)
    # EMA moved toward new params but is not equal to them
    assert changed(new_state.params_G_ema, state.params_G_ema)
    assert changed(new_state.params_G_ema, new_state.params_G)


def test_blur_sigma_fades(model, state):
    rng = np.random.RandomState(2)
    batch = _batch(rng)
    st = jax.tree.map(jnp.copy, state)
    _, m0 = model.train_step(st, batch, jax.random.PRNGKey(0), jnp.asarray(0.0))
    assert float(m0["blur_sigma"]) == pytest.approx(2.0)
    st = jax.tree.map(jnp.copy, state)
    _, m1 = model.train_step(st, batch, jax.random.PRNGKey(0),
                             jnp.asarray(2000.0))
    assert float(m1["blur_sigma"]) == 0.0


def test_eval_step_deterministic(model, state):
    rng = np.random.RandomState(3)
    batch = _batch(rng)
    out1 = model.eval_step(state, batch["A"], batch["slice_idx"],
                           jax.random.PRNGKey(7))
    out2 = model.eval_step(state, batch["A"], batch["slice_idx"],
                           jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert out1.shape == (2, 1, 32, 32)


def test_comodgan_family_train_step():
    rng = np.random.RandomState(9)
    g = dict(netG="comodgan", z_dim=32, c_dim=1, w_dim=32, img_resolution=32,
             img_channels_in=4, img_channels_out=1,
             mapping_kwargs=dict(num_layers=2),
             synthesis_kwargs=dict(channel_base=512, channel_max=32,
                                   skip_resolution=16, cond_mod=True))
    model = GANModel(build_generator(g), build_discriminator(dict(TINY_D)),
                     GANConfig(z_dim=32, c_dim=1, batch_size=2))
    batch = _batch(rng)
    state = model.init_state(jax.random.PRNGKey(0), batch)
    new_state, metrics = model.train_step(state, batch, jax.random.PRNGKey(1),
                                          jnp.asarray(0.0))
    for key in ("G_GAN", "G_L1", "D_real", "D_fake", "D_r1"):
        assert np.isfinite(float(metrics[key])), key
    # SG2 mapping updates w_avg during training (reference semantics)
    w_avg_new = np.asarray(new_state.moments_G["mapping"]["w_avg"])
    assert not np.allclose(w_avg_new, 0)
    out = model.eval_step(new_state, batch["A"], batch["slice_idx"],
                          jax.random.PRNGKey(3))
    assert out.shape == (2, 1, 32, 32)


def test_style_mixing_train_step(rng=None):
    rng = np.random.RandomState(5)
    model = _make_model(style_mixing_prob=0.9)
    batch = _batch(rng)
    state = model.init_state(jax.random.PRNGKey(0), batch)
    new_state, metrics = model.train_step(state, batch, jax.random.PRNGKey(2),
                                          jnp.asarray(0.0))
    for key in ("G_GAN", "G_L1", "D_real", "D_fake"):
        assert np.isfinite(float(metrics[key])), key
    assert int(new_state.step) == 1


def test_lr_injection(model, state):
    st = state.with_lr(1e-3, 2e-3)
    assert float(st.opt_state_G.hyperparams["learning_rate"]) == pytest.approx(1e-3)
    assert float(st.opt_state_D.hyperparams["learning_rate"]) == pytest.approx(2e-3)


def test_lazy_r1(state):
    """Lazy-R1 knob (GANConfig.r1_interval; StyleGAN2 trick, opt-in — the
    reference computes R1 every step, comodgan_model.py:143-147).

    * with_r1=False: D_r1 metric is exactly 0 and the step still updates D.
    * with_r1=True at interval N: the penalty enters the loss scaled by N, so
      params_D must differ from the interval-1 step on identical inputs
      while the raw D_r1 metric matches.
    """
    rng = np.random.RandomState(7)
    batch = _batch(rng)
    m1 = _make_model()                    # r1_interval=1 (reference-faithful)
    m2 = _make_model(r1_interval=2)

    st = jax.tree.map(jnp.copy, state)
    s_off, met_off = m2.train_step(st, batch, jax.random.PRNGKey(4),
                                   jnp.asarray(0.0), with_r1=False)
    assert float(met_off["D_r1"]) == 0.0
    d_changed = jax.tree.reduce(
        lambda a, b: a or b,
        jax.tree.map(lambda a, b: bool(jnp.any(a != b)),
                     state.params_D, s_off.params_D))
    assert d_changed

    s1, met1 = m1.train_step(jax.tree.map(jnp.copy, state), batch,
                             jax.random.PRNGKey(4), jnp.asarray(0.0))
    s2, met2 = m2.train_step(jax.tree.map(jnp.copy, state), batch,
                             jax.random.PRNGKey(4), jnp.asarray(0.0),
                             with_r1=True)
    assert float(met1["D_r1"]) == pytest.approx(float(met2["D_r1"]), rel=1e-6)
    leaves1 = jax.tree.leaves(s1.params_D)
    leaves2 = jax.tree.leaves(s2.params_D)
    assert any(bool(jnp.any(a != b)) for a, b in zip(leaves1, leaves2))


def test_shared_g_fwd_exactness(state):
    """`shared_g_fwd` (one G forward + captured VJP serving both phases)
    must match the two-forward step whenever the two phases' rngs coincide:
    the only semantic difference between the reference's re-forward
    (stylegan3_model.py:119,129) and sharing is the G phase's fresh
    dropout/noise draw, so with rng_gd == rng_gg the steps are equivalent.
    """
    rng = np.random.RandomState(8)
    batch = _batch(rng)
    z = jnp.asarray(np.random.RandomState(9).randn(2, 32), jnp.float32)
    key = jax.random.PRNGKey(5)

    m_ref = _make_model()
    m_sh = _make_model(shared_g_fwd=True)
    nimg = jnp.asarray(0.0)

    run_ref = jax.jit(lambda st: m_ref._train_step_impl(
        st, batch, z, key, key, nimg))
    run_sh = jax.jit(lambda st: m_sh._train_step_impl(
        st, batch, z, key, key, nimg))
    s_ref, met_ref = run_ref(jax.tree.map(jnp.copy, state))
    s_sh, met_sh = run_sh(jax.tree.map(jnp.copy, state))

    for k in met_ref:
        np.testing.assert_allclose(float(met_ref[k]), float(met_sh[k]),
                                   rtol=1e-5, err_msg=k)
    # D path sees the identical (stop-gradient) fake in both modes.
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(s_ref.params_D),
            jax.tree_util.tree_leaves_with_path(s_sh.params_D)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=1e-6, err_msg=jax.tree_util.keystr(pa))
    # G params: gradients are the same chain rule either way; Adam at step 1
    # is sign-like (m/sqrt(v) ~ sign(g)), so compare with an atol that admits
    # fp32 scheduling drift on near-zero gradient leaves.
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(s_sh.params_G),
            jax.tree_util.tree_leaves_with_path(s_ref.params_G)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=1e-6, err_msg=jax.tree_util.keystr(pa))


def test_shared_g_fwd_with_style_mixing():
    """The shared path also covers the style-mixing forward (vjp through
    _run_g_mixed)."""
    rng = np.random.RandomState(10)
    batch = _batch(rng)
    m = _make_model(shared_g_fwd=True, style_mixing_prob=0.9)
    st = m.init_state(jax.random.PRNGKey(0), batch)
    st0 = jax.tree.map(jnp.copy, st)  # train_step donates st
    new_state, metrics = m.train_step(st, batch, jax.random.PRNGKey(2),
                                      jnp.asarray(0.0))
    st = st0
    for key in ("G_GAN", "G_L1", "D_real", "D_fake", "D_r1"):
        assert np.isfinite(float(metrics[key])), key
    changed = any(not np.allclose(x, y) for x, y in
                  zip(jax.tree.leaves(new_state.params_G),
                      jax.tree.leaves(st.params_G)))
    assert changed
