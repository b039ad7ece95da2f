"""AOT serving export: serialize/deserialize roundtrip of the EMA eval step
(afcm_tpu.infer.export) and its integration with the predictor."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from afcm_tpu.config import setup  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class _Args:
    def __init__(self, config_file="", model=None, opts=None):
        self.config_file = config_file
        self.model = model
        self.opts = opts or []


@pytest.fixture(scope="module")
def tiny():
    cfg = setup(_Args(os.path.join(REPO, "configs/demo/cmsr_tiny.yml")))
    from afcm_tpu.models import build_gan_model
    model = build_gan_model(cfg)
    res = cfg.model.G.img_resolution
    dummy = {"A": jnp.zeros((1, cfg.model.G.img_channels_in, res, res)),
             "B": jnp.zeros((1, cfg.model.G.img_channels_out, res, res)),
             "slice_idx": jnp.zeros((1, 1))}
    state = model.init_state(jax.random.PRNGKey(0), dummy)
    return cfg, model, state


def test_export_roundtrip_matches_eval_step(tiny, tmp_path, rng):
    """Deserialized artifact == the live eval step (same z discipline)."""
    cfg, model, state = tiny
    from afcm_tpu.infer.export import (export_eval, load_exported,
                                       save_exported, serving_forward)
    res = cfg.model.G.img_resolution
    c_in = cfg.model.G.img_channels_in
    batch = 2
    exported = export_eval(model, state, batch, (c_in, res, res), seed=7)
    path = save_exported(exported, str(tmp_path / "serving.hlo"))
    assert os.path.getsize(path) > 0

    forward = serving_forward(load_exported(path))
    a = rng.randn(batch, c_in, res, res).clip(-1, 1).astype(np.float32)
    s = rng.rand(batch, 1).astype(np.float32)
    got0 = np.asarray(forward(a, s))
    got1 = np.asarray(forward(a, s))

    # live reference: counter 0/1 folded into PRNGKey(7), like the artifact
    key = jax.random.PRNGKey(7)
    want0 = np.asarray(model.eval_step(state, jnp.asarray(a), jnp.asarray(s),
                                       jax.random.fold_in(key, 0)))
    want1 = np.asarray(model.eval_step(state, jnp.asarray(a), jnp.asarray(s),
                                       jax.random.fold_in(key, 1)))
    # The artifact is bit-identical to its jitted trace; the eager
    # eval_step reference differs only by XLA fusion reassociation (~1e-7).
    np.testing.assert_allclose(got0, want0, rtol=0, atol=2e-6)
    np.testing.assert_allclose(got1, want1, rtol=0, atol=2e-6)
    assert np.abs(got0 - got1).max() > 0  # fresh z per batch


def test_export_uint8_ingest_and_fetch_dtype(tiny, tmp_path, rng):
    """uint8 ingest normalizes in-graph; bf16 fetch halves the output bytes."""
    cfg, model, state = tiny
    from afcm_tpu.infer.export import export_eval, serving_forward
    res = cfg.model.G.img_resolution
    c_in = cfg.model.G.img_channels_in
    exported = export_eval(model, state, 2, (c_in, res, res),
                           norm_range=(0.0, 255.0), fetch_dtype="bfloat16",
                           seed=7)
    forward = serving_forward(exported)
    a_u8 = rng.randint(0, 256, (2, c_in, res, res)).astype(np.uint8)
    s = rng.rand(2, 1).astype(np.float32)
    got = forward(a_u8, s)
    assert got.dtype == jnp.bfloat16

    a_f = np.clip(2 * (a_u8.astype(np.float32) / 255.0) - 1, -1, 1)
    want = model.eval_step(state, jnp.asarray(a_f), jnp.asarray(s),
                           jax.random.fold_in(jax.random.PRNGKey(7), 0))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0, atol=0.05)


def test_serving_forward_drives_predictor(tiny, tmp_path, rng):
    """The artifact plugs into StandardPredictor as forward_fn."""
    cfg, model, state = tiny
    from afcm_tpu.data.demo import write_demo_tree
    from afcm_tpu.data import get_test_loaders
    from afcm_tpu.infer import StandardPredictor
    from afcm_tpu.infer.export import export_eval, serving_forward

    root = str(tmp_path / "demo")
    write_demo_tree(root, n_train=1, n_val=1, n_test=1, depth=8, size=64)
    cfg2 = setup(_Args(
        os.path.join(REPO, "configs/demo/cmsr_tiny.yml"),
        opts=["loaders.test.file_paths", f"['{root}/test']",
              "loaders.train.file_paths", f"['{root}/train']",
              "loaders.val.file_paths", f"['{root}/val']"]))

    res = cfg.model.G.img_resolution
    c_in = cfg.model.G.img_channels_in
    batch = int(cfg2.loaders.batch_size)
    exported = export_eval(model, state, batch, (c_in, res, res))
    predictor = StandardPredictor(serving_forward(exported),
                                  str(tmp_path / "out"), cfg2)
    loader = next(iter(get_test_loaders(cfg2)))
    out_path = predictor(loader)
    predictor.wait_for_writes()
    assert os.path.exists(out_path)
    vol = predictor.last_prediction
    assert vol.shape == (8, 64, 64) and np.isfinite(vol).all()


def test_export_symbolic_batch(tiny, rng):
    """batch_size=None exports one artifact that serves any batch size."""
    cfg, model, state = tiny
    from afcm_tpu.infer.export import export_eval, serving_forward
    res = cfg.model.G.img_resolution
    c_in = cfg.model.G.img_channels_in
    exported = export_eval(model, state, None, (c_in, res, res), seed=7)
    forward = serving_forward(exported)
    for n in (1, 3):
        a = rng.randn(n, c_in, res, res).clip(-1, 1).astype(np.float32)
        s = rng.rand(n, 1).astype(np.float32)
        out = np.asarray(forward(a, s))
        assert out.shape == (n, 1, res, res) and np.isfinite(out).all()


def test_export_mesh_sharded(tiny, rng):
    """A mesh export embeds the dp sharding (nr_devices = mesh size) and
    reproduces the single-device artifact's math on sharded inputs."""
    cfg, model, state = tiny
    from afcm_tpu.infer.export import export_eval, serving_forward
    from afcm_tpu.parallel import make_mesh_for_batch
    res = cfg.model.G.img_resolution
    c_in = cfg.model.G.img_channels_in
    mesh = make_mesh_for_batch((0, 1), 8)
    assert mesh.devices.size == 8  # conftest forces the 8-device CPU mesh

    exported = export_eval(model, state, 8, (c_in, res, res), seed=7,
                           mesh=mesh)
    assert exported.nr_devices == 8
    forward = serving_forward(exported, mesh=mesh)
    a = rng.randn(8, c_in, res, res).clip(-1, 1).astype(np.float32)
    s = rng.rand(8, 1).astype(np.float32)
    got = np.asarray(forward(a, s), np.float32)

    single = export_eval(model, state, 8, (c_in, res, res), seed=7)
    want = np.asarray(serving_forward(single)(a, s), np.float32)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-6)


def test_export_bf16_weights_halves_artifact(tiny, rng):
    """weights_dtype='bfloat16' halves the artifact; drift stays in the
    bf16-weights class (>40 dB PSNR on the tiny config)."""
    cfg, model, state = tiny
    from afcm_tpu.infer.export import export_eval, serving_forward
    res = cfg.model.G.img_resolution
    c_in = cfg.model.G.img_channels_in
    full = export_eval(model, state, 2, (c_in, res, res), seed=7)
    half = export_eval(model, state, 2, (c_in, res, res), seed=7,
                       weights_dtype="bfloat16")
    nf, nh = len(full.serialize()), len(half.serialize())
    assert nh < 0.65 * nf, (nf, nh)

    a = rng.randn(2, c_in, res, res).clip(-1, 1).astype(np.float32)
    s = rng.rand(2, 1).astype(np.float32)
    want = np.asarray(serving_forward(full)(a, s), np.float32)
    got = np.asarray(serving_forward(half)(a, s), np.float32)
    mse = float(np.mean((got - want) ** 2))
    psnr = 10 * np.log10(4.0 / max(mse, 1e-20))  # data range 2
    assert psnr > 40, f"bf16-weights drift too large: {psnr:.1f} dB"


def test_export_pins_op_impls(tiny):
    """Process-global op routing (int8 conv, forced pallas lrelu) must not
    leak Mosaic custom-calls into the portable artifact, and the globals
    must be restored after export."""
    import importlib
    cfg, model, state = tiny
    from afcm_tpu.infer.export import export_eval
    mc = importlib.import_module("afcm_tpu.ops.modulated_conv")
    fl = importlib.import_module("afcm_tpu.ops.filtered_lrelu")
    res = cfg.model.G.img_resolution
    c_in = cfg.model.G.img_channels_in
    prev_conv, prev_fl = mc.get_conv_impl(), fl.get_default_impl()
    mc.set_conv_impl("int8")
    fl.set_default_impl("pallas")
    try:
        exported = export_eval(model, state, 2, (c_in, res, res), seed=7)
        assert mc.get_conv_impl() == "int8"       # restored, not clobbered
        assert fl.get_default_impl() == "pallas"
        assert "custom_call" not in exported.mlir_module()
    finally:
        mc.set_conv_impl(prev_conv)
        fl.set_default_impl(prev_fl)


def test_serve_cli_artifact_matches_in_process(tiny, tmp_path):
    """afcm_tpu.serve writes the same volumes from a checkpoint (in-process)
    and from an AOT artifact."""
    import glob
    from afcm_tpu.data.demo import write_demo_tree
    from afcm_tpu.utils.nifti import read_nifti
    from afcm_tpu.utils import checkpoint as ckpt
    from afcm_tpu.infer.export import export_eval, save_exported
    from afcm_tpu.serve import main as serve_main

    cfg, model, state = tiny
    root = str(tmp_path / "demo")
    write_demo_tree(root, n_train=1, n_val=1, n_test=1, depth=8, size=64)
    run_dir = str(tmp_path / "ckpt" / "demo_tiny")
    os.makedirs(run_dir, exist_ok=True)
    ckpt.save_state(state, run_dir, "latest")
    opts = ["loaders.test.file_paths", f"['{root}/test']",
            "loaders.train.file_paths", f"['{root}/train']",
            "loaders.val.file_paths", f"['{root}/val']",
            "checkpoints_dir", str(tmp_path / "ckpt")]
    cfg_file = os.path.join(REPO, "configs/demo/cmsr_tiny.yml")

    out1 = serve_main(["--config-file", cfg_file,
                       "--out", str(tmp_path / "out1")] + opts)
    res = cfg.model.G.img_resolution
    c_in = cfg.model.G.img_channels_in
    art = save_exported(export_eval(model, state, 2, (c_in, res, res)),
                        str(tmp_path / "serving.hlo"))
    out2 = serve_main(["--config-file", cfg_file, "--artifact", art,
                       "--out", str(tmp_path / "out2")] + opts)

    f1 = sorted(glob.glob(out1 + "/*_predictions0.nii.gz"))
    f2 = sorted(glob.glob(out2 + "/*_predictions0.nii.gz"))
    assert len(f1) == 1 and len(f2) == 1
    v1, _ = read_nifti(f1[0])
    v2, _ = read_nifti(f2[0])
    assert np.abs(v1 - v2).max() < 5e-6


def test_detect_norm_range_strict_on_mixed_storage(tiny, tmp_path):
    """The export ingest decision checks stored dtypes from h5 metadata:
    all-uint8 -> uint8 ingest; any float-stored volume -> float ingest."""
    import h5py
    from afcm_tpu.evaluate import detect_norm_range, pipeline_norm_range
    from afcm_tpu.data.demo import write_demo_tree

    root = str(tmp_path / "demo")
    write_demo_tree(root, n_train=1, n_val=1, n_test=2, depth=8, size=64)
    opts = ["loaders.test.file_paths", f"['{root}/test']",
            "loaders.train.file_paths", f"['{root}/train']",
            "loaders.val.file_paths", f"['{root}/val']",
            "tpu.transfer_dtype", "uint8"]
    cfg = setup(_Args(os.path.join(REPO, "configs/demo/cmsr_tiny.yml"),
                      opts=opts))
    assert pipeline_norm_range(cfg) == (0.0, 255.0)
    assert detect_norm_range(cfg) == (0.0, 255.0)  # demo volumes are uint8

    # rewrite one subject's modalities as float32 -> strict check says float
    import glob
    victim = sorted(glob.glob(os.path.join(root, "test", "*.h5")))[1]
    with h5py.File(victim, "r+") as f:
        for k in list(f.keys()):
            data = f[k][()].astype(np.float32)
            del f[k]
            f[k] = data
    assert detect_norm_range(cfg) is None
    # the in-process decision is unchanged (runtime dtype dispatch is safe)
    assert pipeline_norm_range(cfg) == (0.0, 255.0)


def test_serve_rejects_pix2pix(tmp_path):
    """serve gives the same deliberate scope error as evaluate for the
    image-folder baseline instead of an obscure AttributeError."""
    from afcm_tpu.serve import main as serve_main
    with pytest.raises(NotImplementedError, match="volumetric"):
        serve_main(["--config-file",
                    os.path.join(REPO, "configs/demo/pix2pix_tiny.yml")
                    if os.path.exists(os.path.join(
                        REPO, "configs/demo/pix2pix_tiny.yml"))
                    else os.path.join(REPO, "configs/demo/cmsr_tiny.yml"),
                    "--model", "pix2pix",
                    "checkpoints_dir", str(tmp_path)])
