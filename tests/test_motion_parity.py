"""Forward parity of the StyleGAN-V (motion) variants vs the PyTorch
reference — the last network family without an oracle test.

Reference: models/networks/CoModGAN/motion.py (MotionMappingNetwork with the
'conv' generation strategy + AlignedTimeEncoder) and generator.py:130-295
(MotionSynthesisNetwork), 577-609 (StyleGANVGenerator), 840-930
(StyleGANVDiscriminator).  Weights are initialized by the reference and
ported via `afcm_tpu.utils.port`; outputs must agree in fp32.  `motion_z` is
supplied explicitly so the 'conv' path is deterministic end to end.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from afcm_tpu.nn.motion import (MotionMappingNetwork,  # noqa: E402
                                StyleGANVDiscriminator, StyleGANVGenerator)
from afcm_tpu.utils.port import state_dict_to_variables  # noqa: E402
from tests._torch_ref import load_reference_networks  # noqa: E402

MAX_NUM_FRAMES = 8
MOTION_KW = dict(motion_z_dim=8, motion_z_distance=2, motion_kernel_size=3,
                 time_encoder_kwargs=dict(dim=8, min_period_len=2,
                                          max_period_len=8))
GEN = dict(z_dim=16, c_dim=1, w_dim=16, motion_v_dim=16, img_resolution=32,
           img_channels_in=4, img_channels_out=1,
           max_num_frames=MAX_NUM_FRAMES)
GEN_SYNTH = dict(channel_base=1024, channel_max=32, skip_resolution=16,
                 cond_mod=True, global_enc=True, conv_clamp=256)
DISC = dict(c_dim=1, img_resolution=32, img_channels=1, num_frames=3,
            channel_base=2048, channel_max=32, conv_clamp=256,
            num_frames_div_factor=2, max_num_frames=MAX_NUM_FRAMES,
            concat_res=16)


@pytest.fixture(scope="module")
def ref():
    return load_reference_networks()


def _traj_inputs(rng, batch, motion_z_dim, motion_z_distance, kernel_size):
    max_traj_len = int(np.ceil((MAX_NUM_FRAMES - 1) / motion_z_distance)) \
        + 2 + (kernel_size - 1) * 2
    t = rng.randint(0, MAX_NUM_FRAMES - 1, size=(batch, 1))
    motion_z = rng.randn(batch, max_traj_len, motion_z_dim).astype(np.float32)
    return t, motion_z


def _assert_close(got, want, label):
    assert got.shape == want.shape, f"{label}: {got.shape} vs {want.shape}"
    tol = 1e-4 + 1e-4 * np.abs(want)
    np.testing.assert_array_less(np.abs(got - want), tol, err_msg=label)


def test_motion_mapping_parity(ref):
    torch = ref["torch"]
    rng = np.random.RandomState(0)
    kw = dict(MOTION_KW)
    torch.manual_seed(0)
    import importlib
    ref_motion = importlib.import_module("models.networks.CoModGAN.motion")
    tnet = ref_motion.MotionMappingNetwork(
        max_num_frames=MAX_NUM_FRAMES, motion_v_dim=16, fourier=True,
        **kw).eval()

    t, motion_z = _traj_inputs(rng, 3, kw["motion_z_dim"],
                               kw["motion_z_distance"],
                               kw["motion_kernel_size"])
    with torch.no_grad():
        want = tnet(torch.from_numpy(t.astype(np.float32)),
                    motion_z=torch.from_numpy(motion_z))

    net = MotionMappingNetwork(max_num_frames=MAX_NUM_FRAMES, motion_v_dim=16,
                               fourier=True, **kw)
    variables = state_dict_to_variables(tnet.state_dict())
    got = net.apply(variables, jnp.asarray(t, jnp.float32),
                    motion_z=jnp.asarray(motion_z))
    _assert_close(np.asarray(got["motion_v"]), want["motion_v"].numpy(),
                  "motion_v")


def test_styleganv_generator_parity(ref):
    torch = ref["torch"]
    rng = np.random.RandomState(1)
    torch.manual_seed(1)
    tgen = ref["comod_generator"].StyleGANVGenerator(
        mapping_kwargs=dict(name="MappingNetwork", num_layers=2),
        synthesis_kwargs=dict(name="MotionSynthesisNetwork", **GEN_SYNTH),
        motion_mapping_kwargs=dict(MOTION_KW), **GEN).eval()

    batch = 2
    t, motion_z = _traj_inputs(rng, batch, MOTION_KW["motion_z_dim"],
                               MOTION_KW["motion_z_distance"],
                               MOTION_KW["motion_kernel_size"])
    z = rng.randn(batch, GEN["z_dim"]).astype(np.float32)
    c = rng.rand(batch, GEN["c_dim"]).astype(np.float32)
    delta_t = rng.randint(0, MAX_NUM_FRAMES - 1,
                          size=(batch, 1)).astype(np.float32)
    cond = rng.randn(batch, GEN["img_channels_in"], GEN["img_resolution"],
                     GEN["img_resolution"]).astype(np.float32).clip(-1, 1)
    with torch.no_grad():
        want = tgen(torch.from_numpy(z), torch.from_numpy(c),
                    torch.from_numpy(t.astype(np.float32)),
                    torch.from_numpy(delta_t), torch.from_numpy(cond),
                    motion_z=torch.from_numpy(motion_z),
                    noise_mode="const").numpy()

    gen = StyleGANVGenerator(
        mapping_kwargs=dict(num_layers=2), synthesis_kwargs=dict(GEN_SYNTH),
        motion_mapping_kwargs=dict(MOTION_KW), **GEN)
    from afcm_tpu.nn.motion import MotionSynthesisNetwork
    synth = MotionSynthesisNetwork(
        w_dim=GEN["w_dim"], motion_v_dim=GEN["motion_v_dim"],
        img_resolution=GEN["img_resolution"],
        img_channels_in=GEN["img_channels_in"],
        img_channels_out=GEN["img_channels_out"],
        max_num_frames=MAX_NUM_FRAMES, **GEN_SYNTH)
    assert synth.num_ws == tgen.num_ws
    variables = state_dict_to_variables(tgen.state_dict())
    got = np.asarray(gen.apply(variables, jnp.asarray(z), jnp.asarray(c),
                               jnp.asarray(t, jnp.float32),
                               jnp.asarray(delta_t), jnp.asarray(cond),
                               motion_z=jnp.asarray(motion_z),
                               noise_mode="const"))
    assert got.shape == want.shape
    tol = 5e-4 + 5e-3 * np.abs(want)
    np.testing.assert_array_less(np.abs(got - want), tol)


def test_styleganv_discriminator_parity(ref):
    torch = ref["torch"]
    rng = np.random.RandomState(2)
    torch.manual_seed(2)
    tdisc = ref["comod_generator"].StyleGANVDiscriminator(**DISC).eval()

    batch = 2
    img = rng.randn(batch, DISC["num_frames"] * DISC["img_channels"],
                    DISC["img_resolution"],
                    DISC["img_resolution"]).astype(np.float32)
    c = rng.rand(batch, DISC["c_dim"]).astype(np.float32)
    delta_t = rng.randint(0, MAX_NUM_FRAMES - 1,
                          size=(batch, 1)).astype(np.float32)
    with torch.no_grad():
        want = tdisc(torch.from_numpy(img), torch.from_numpy(c),
                     torch.from_numpy(delta_t)).numpy()

    disc = StyleGANVDiscriminator(**DISC)
    variables = state_dict_to_variables(tdisc.state_dict())
    got = np.asarray(disc.apply(variables, jnp.asarray(img), jnp.asarray(c),
                                jnp.asarray(delta_t)))
    assert got.shape == want.shape
    tol = 5e-4 + 5e-3 * np.abs(want)
    np.testing.assert_array_less(np.abs(got - want), tol)


def test_motion_mapping_non_fourier_broken_in_reference(ref):
    """fourier=False cannot be constructed in the reference: motion.py:46
    calls MappingNetwork without the required positional c_dim.  Ours fixes
    the construct (c_dim=0, a comment in nn/motion.py says so) — pin both
    facts so a reference upgrade is noticed."""
    torch = ref["torch"]
    import importlib
    ref_motion = importlib.import_module("models.networks.CoModGAN.motion")
    with pytest.raises(TypeError):
        ref_motion.MotionMappingNetwork(
            max_num_frames=MAX_NUM_FRAMES, motion_v_dim=16, fourier=False,
            motion_z_dim=16, motion_z_distance=2, motion_kernel_size=3)

    net = MotionMappingNetwork(max_num_frames=MAX_NUM_FRAMES, motion_v_dim=16,
                               fourier=False, motion_z_dim=16,
                               motion_z_distance=2, motion_kernel_size=3)
    rng = np.random.RandomState(3)
    t, motion_z = _traj_inputs(rng, 2, 16, 2, 3)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(t, jnp.float32),
                         motion_z=jnp.asarray(motion_z))
    out = net.apply(variables, jnp.asarray(t, jnp.float32),
                    motion_z=jnp.asarray(motion_z))
    assert out["motion_v"].shape == (2, 16)
    assert np.all(np.isfinite(np.asarray(out["motion_v"])))
