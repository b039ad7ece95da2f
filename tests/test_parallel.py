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


def test_collective_census_parser():
    from afcm_tpu.parallel import collective_census, format_census
    hlo = """
  %ar = f32[64,32]{1,0} all-reduce(f32[64,32] %p), replica_groups={}
  %ag.1 = f32[8,128]{1,0} all-gather(f32[4,128] %x), dimensions={0}
  %ars = (f32[16]{0}, f32[16]{0}) all-reduce-start(f32[16] %a, f32[16] %b)
  %ard = f32[16]{0} all-reduce-done((f32[16], f32[16]) %ars)
  %add = f32[2]{0} add(f32[2] %u, f32[2] %v)
"""
    census = collective_census(hlo)
    assert census["all-reduce"]["count"] == 2          # plain + start, no done
    # the -start tuple is (operand, result) buffers: only the result counts
    assert census["all-reduce"]["bytes"] == 64 * 32 * 4 + 16 * 4
    assert census["all-gather"]["count"] == 1
    assert census["all-gather"]["bytes"] == 8 * 128 * 4
    assert "reduce-scatter" not in census
    assert "all-reduce x2" in format_census(census)


def _tiny_gan_model(res=32):
    from afcm_tpu.models import (GANConfig, GANModel, build_discriminator,
                                 build_generator)
    tiny_g = dict(netG="stylegan3", z_dim=32, c_dim=1, w_dim=32,
                  img_resolution=res, img_channels_in=4, img_channels_out=1,
                  mapping_kwargs=dict(num_layers=2),
                  synthesis_kwargs=dict(channel_base=1024, channel_max=32,
                                        num_layers=4, num_critical=2,
                                        skip_resolution=res // 2,
                                        conv_clamp=256, margin_size=4,
                                        lrelu_upsampling=2))
    tiny_d = dict(netD="comodgan", c_dim=1, img_resolution=res,
                  img_channels=5, channel_base=1024, channel_max=32,
                  epilogue_kwargs=dict(mbstd_group_size=2))
    return GANModel(build_generator(tiny_g), build_discriminator(tiny_d),
                    GANConfig(z_dim=32, c_dim=1, batch_size=4))


def test_tp_census_differs_from_dp(rng):
    """Pins the designed communication pattern (SURVEY.md 2.9): dp-only =
    gradient all-reduces, no gathers; dp x tp adds all-gathers for the
    model-axis-sharded parameters (VERDICT r2 item 6)."""
    from afcm_tpu.parallel import collective_census
    model = _tiny_gan_model()
    batch = {"A": jnp.asarray(rng.randn(4, 4, 32, 32), jnp.float32),
             "B": jnp.asarray(rng.randn(4, 1, 32, 32), jnp.float32),
             "slice_idx": jnp.asarray(rng.rand(4, 1), jnp.float32)}
    state = model.init_state(jax.random.PRNGKey(0), batch)

    def census_for(mesh_shape, shard_fn):
        mesh = make_mesh(mesh_shape)
        st = shard_fn(jax.tree.map(jnp.copy, state), mesh)
        hlo = type(model).train_step.lower(
            model, st, shard_batch(dict(batch), mesh), jax.random.PRNGKey(1),
            jnp.asarray(0.0)).compile().as_text()
        return collective_census(hlo)

    dp = census_for((4, 1), replicate_state)
    tp = census_for((2, 2), shard_params)
    assert dp["all-reduce"]["count"] > 0
    assert dp.get("all-gather", {}).get("count", 0) == 0, (
        "dp-only should need no all-gathers (params replicated)")
    assert tp.get("all-gather", {}).get("count", 0) > 0, (
        "tp mesh sharded nothing: no all-gathers inserted")
    assert tp["all-reduce"]["count"] > 0


def test_tp_sharded_eval_step_matches(rng):
    """The EMA inference path must run tp-sharded and match replicated
    numerics (the predictor's multi-chip serving path)."""
    from jax.sharding import NamedSharding
    model = _tiny_gan_model()
    batch = {"A": jnp.asarray(rng.randn(4, 4, 32, 32), jnp.float32),
             "B": jnp.asarray(rng.randn(4, 1, 32, 32), jnp.float32),
             "slice_idx": jnp.asarray(rng.rand(4, 1), jnp.float32)}
    state = model.init_state(jax.random.PRNGKey(0), batch)
    ref = np.asarray(model.eval_step(state, batch["A"], batch["slice_idx"],
                                     jax.random.PRNGKey(7)))

    mesh = make_mesh((2, 2))
    st = shard_params(jax.tree.map(jnp.copy, state), mesh)
    a = jax.device_put(batch["A"], NamedSharding(mesh, P("data")))
    out = np.asarray(model.eval_step(st, a, batch["slice_idx"],
                                     jax.random.PRNGKey(7)))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_sharded_predictor_matches_single_device(rng, tmp_path):
    """The full predictor path (make_forward_fn + StandardPredictor) over a
    dp x tp mesh must stitch the identical volume a single device produces —
    the multi-chip serving analog of the reference's DataParallel test-batch
    scaling (reference: data/utils.py:292-295)."""
    from afcm_tpu.evaluate import make_forward_fn
    from afcm_tpu.infer.predictor import StandardPredictor
    from afcm_tpu.utils.nifti import read_nifti

    model = _tiny_gan_model()
    batch = {"A": jnp.asarray(rng.randn(4, 4, 32, 32), jnp.float32),
             "B": jnp.asarray(rng.randn(4, 1, 32, 32), jnp.float32),
             "slice_idx": jnp.asarray(rng.rand(4, 1), jnp.float32)}
    state = model.init_state(jax.random.PRNGKey(0), batch)

    vol_np = rng.randn(10, 32, 32).astype(np.float32)

    class _StubDataset:
        """10 full-frame slices of a 10x32x32 volume."""
        file_path = str(tmp_path / "subject.h5")
        raw = {"t1": vol_np}
        volume = vol_np
        slices = [(slice(0, 1), slice(z, z + 1), slice(0, 32), slice(0, 32))
                  for z in range(10)]

        def __len__(self):
            return 10

        def get_item(self, i):
            a = np.repeat(self.volume[i][None], 4, axis=0)
            idx = (slice(i, i + 1), slice(0, 32), slice(0, 32))
            return (a.astype(np.float32),
                    np.asarray([i % 4 / 4.0], np.float32), idx)

    class _Loader:
        dataset = _StubDataset()
        batch_size = 4

        def __iter__(self):
            ds = self.dataset
            for start in range(0, len(ds), self.batch_size):
                items = [ds.get_item(i) for i in
                         range(start, min(start + self.batch_size, len(ds)))]
                yield (np.stack([x[0] for x in items]),
                       np.stack([x[1] for x in items]),
                       [x[2] for x in items])

    def run(state, mesh, out_dir):
        fwd = make_forward_fn(model, state, mesh=mesh)
        pred = StandardPredictor(fwd, str(out_dir), None, patch_halo=(0, 0, 0))
        path = pred(_Loader())
        pred.wait_for_writes()  # head files are write-behind
        vol, _ = read_nifti(path)
        return np.asarray(vol)

    ref = run(state, None, tmp_path / "single")

    mesh = make_mesh((2, 2))
    sharded = shard_params(jax.tree.map(jnp.copy, state), mesh)
    got = run(sharded, mesh, tmp_path / "mesh")
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_make_mesh_rejects_oversized_model_axis():
    import pytest

    from afcm_tpu.parallel import make_mesh
    with pytest.raises(ValueError, match="mesh"):
        make_mesh((0, 1024))  # model axis larger than the device count
