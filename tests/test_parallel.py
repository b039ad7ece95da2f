"""Mesh sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from afcm_tpu.parallel import (infer_param_sharding, make_mesh,  # noqa: E402
                               make_mesh_for_batch, replicate_state,
                               shard_batch, shard_params)


def test_make_mesh_shapes():
    mesh = make_mesh((0, 1))
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh2 = make_mesh((4, 2))
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2


def test_make_mesh_for_batch_clamps():
    mesh = make_mesh_for_batch((0, 1), batch_size=6)
    assert mesh.shape["data"] == 6
    mesh = make_mesh_for_batch((0, 1), batch_size=2)
    assert mesh.shape["data"] == 2


def test_param_sharding_rule():
    mesh = make_mesh((4, 2))
    s = infer_param_sharding("kernel", (512, 256), mesh)
    assert s.spec == P("model")
    # indivisible or small -> replicated
    assert infer_param_sharding("w", (511, 256), mesh).spec == P()
    assert infer_param_sharding("b", (512,), mesh).spec == P()
    # model axis 1 -> replicated
    assert infer_param_sharding("kernel", (512, 256),
                                make_mesh((8, 1))).spec == P()


def test_dp_tp_train_step_matches_single_device(rng):
    """The same train step on a dp x tp mesh must match 1-device numerics."""
    from afcm_tpu.models import (GANConfig, GANModel, build_discriminator,
                                 build_generator)
    tiny_g = dict(netG="stylegan3", z_dim=32, c_dim=1, w_dim=32,
                  img_resolution=32, img_channels_in=4, img_channels_out=1,
                  mapping_kwargs=dict(num_layers=2),
                  synthesis_kwargs=dict(channel_base=1024, channel_max=32,
                                        num_layers=4, num_critical=2,
                                        skip_resolution=16, conv_clamp=256,
                                        margin_size=4, lrelu_upsampling=2))
    tiny_d = dict(netD="comodgan", c_dim=1, img_resolution=32, img_channels=5,
                  channel_base=1024, channel_max=32,
                  epilogue_kwargs=dict(mbstd_group_size=2))
    model = GANModel(build_generator(tiny_g), build_discriminator(tiny_d),
                     GANConfig(z_dim=32, c_dim=1, batch_size=4))

    batch = {"A": jnp.asarray(rng.randn(4, 4, 32, 32).clip(-1, 1), jnp.float32),
             "B": jnp.asarray(rng.randn(4, 1, 32, 32).clip(-1, 1), jnp.float32),
             "slice_idx": jnp.asarray(rng.rand(4, 1), jnp.float32)}
    state = model.init_state(jax.random.PRNGKey(0), batch)

    ref_state, ref_metrics = model.train_step(
        jax.tree.map(jnp.copy, state), dict(batch), jax.random.PRNGKey(1),
        jnp.asarray(0.0))

    mesh = make_mesh((2, 2))
    sharded_state = shard_params(jax.tree.map(jnp.copy, state), mesh)
    sharded_batch = shard_batch(dict(batch), mesh)
    new_state, metrics = model.train_step(sharded_state, sharded_batch,
                                          jax.random.PRNGKey(1),
                                          jnp.asarray(0.0))

    for k in ref_metrics:
        np.testing.assert_allclose(float(metrics[k]), float(ref_metrics[k]),
                                   rtol=2e-4, atol=2e-5)
    # spot-check a parameter tree leaf
    ref_leaves = jax.tree.leaves(ref_state.params_G)
    new_leaves = jax.tree.leaves(new_state.params_G)
    np.testing.assert_allclose(np.asarray(new_leaves[0]),
                               np.asarray(ref_leaves[0]), rtol=2e-4,
                               atol=2e-5)


def test_graft_dryrun_entry():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)  # dp=4 x tp=2 on the virtual CPU mesh
