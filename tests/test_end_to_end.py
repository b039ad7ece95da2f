"""End-to-end smoke: train a tiny model on synthetic data, checkpoint,
resume-load, run the predictor + evaluate CLI flow."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from afcm_tpu.config import setup  # noqa: E402
from afcm_tpu.data.demo import write_demo_tree  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class _Args:
    def __init__(self, config_file="", model=None, opts=None):
        self.config_file = config_file
        self.model = model
        self.opts = opts or []


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    write_demo_tree(str(root / "data" / "demo"), n_train=1, n_val=1, n_test=1,
                    depth=12, size=64)
    return root


@pytest.fixture(scope="module")
def cfg(workdir):
    return setup(_Args(
        os.path.join(REPO, "configs/demo/cmsr_tiny.yml"),
        opts=["loaders.train.file_paths",
              f"['{workdir}/data/demo/train']",
              "loaders.val.file_paths", f"['{workdir}/data/demo/val']",
              "loaders.test.file_paths", f"['{workdir}/data/demo/test']",
              "checkpoints_dir", f"{workdir}/checkpoints",
              "trainer.max_iters", "8"]))


def test_train_smoke(cfg, workdir):
    from afcm_tpu.train import train
    result = train(cfg, max_iters=8)
    assert "psnr" in result and np.isfinite(result["psnr"])
    run_dir = os.path.join(str(workdir), "checkpoints", "demo_tiny")
    assert os.path.exists(os.path.join(run_dir, "latest_state.msgpack"))
    assert os.path.exists(os.path.join(run_dir, "latest_net_G_ema.msgpack"))
    assert os.path.exists(os.path.join(run_dir, "loss_log.txt"))
    log = open(os.path.join(run_dir, "loss_log.txt")).read()
    assert "G_GAN" in log


def test_evaluate_smoke(cfg, workdir):
    from afcm_tpu.evaluate import main as evaluate_main
    result = evaluate_main([
        "--config-file", os.path.join(REPO, "configs/demo/cmsr_tiny.yml"),
        "loaders.train.file_paths", f"['{workdir}/data/demo/train']",
        "loaders.val.file_paths", f"['{workdir}/data/demo/val']",
        "loaders.test.file_paths", f"['{workdir}/data/demo/test']",
        "checkpoints_dir", f"{workdir}/checkpoints"])
    assert np.isfinite(result["psnr"]) and np.isfinite(result["ssim"])
    eval_dir = os.path.join(str(workdir), "checkpoints", "demo_tiny", "evaluate")
    files = os.listdir(eval_dir)
    assert any(f.endswith("_predictions0.nii.gz") for f in files)
    assert "evaluate.txt" in files


def test_evaluate_uint8_transfer_parity(cfg, workdir):
    """tpu.transfer_dtype uint8 (device-side normalization) reproduces the
    float-transfer evaluation to ~1 ULP (runs after test_evaluate_smoke,
    whose float-path predictions it compares against). Not bit-identical:
    XLA lowers the Normalize divide-by-constant to a reciprocal multiply,
    which differs from numpy's correctly-rounded divide by 1 ULP on most
    byte values; the generator propagates that to ~1e-7 on its outputs."""
    from afcm_tpu.evaluate import main as evaluate_main
    from afcm_tpu.utils.nifti import read_nifti
    eval_dir = os.path.join(str(workdir), "checkpoints", "demo_tiny",
                            "evaluate")
    pred_path = next(os.path.join(eval_dir, f) for f in os.listdir(eval_dir)
                     if f.endswith("_predictions0.nii.gz"))
    float_vol, _ = read_nifti(pred_path)
    float_vol = float_vol.copy()
    result = evaluate_main([
        "--config-file", os.path.join(REPO, "configs/demo/cmsr_tiny.yml"),
        "loaders.train.file_paths", f"['{workdir}/data/demo/train']",
        "loaders.val.file_paths", f"['{workdir}/data/demo/val']",
        "loaders.test.file_paths", f"['{workdir}/data/demo/test']",
        "checkpoints_dir", f"{workdir}/checkpoints",
        "tpu.transfer_dtype", "uint8"])
    assert np.isfinite(result["psnr"])
    uint8_vol, _ = read_nifti(pred_path)
    np.testing.assert_allclose(uint8_vol, float_vol, rtol=0, atol=1e-6)


def test_evaluate_bf16_fetch_parity(cfg, workdir):
    """tpu.fetch_dtype bfloat16 (half device->host prediction traffic)
    matches the float32-fetch evaluation to bf16 rounding (~4e-3 on
    [-1,1]-ranged outputs; the values are fp32-computed here, so the only
    delta IS the fetch rounding). Runs after test_evaluate_smoke, whose
    float-path predictions it compares against."""
    from afcm_tpu.evaluate import main as evaluate_main
    from afcm_tpu.utils.nifti import read_nifti
    eval_dir = os.path.join(str(workdir), "checkpoints", "demo_tiny",
                            "evaluate")
    pred_path = next(os.path.join(eval_dir, f) for f in os.listdir(eval_dir)
                     if f.endswith("_predictions0.nii.gz"))
    float_vol, _ = read_nifti(pred_path)
    float_vol = float_vol.copy()
    result = evaluate_main([
        "--config-file", os.path.join(REPO, "configs/demo/cmsr_tiny.yml"),
        "loaders.train.file_paths", f"['{workdir}/data/demo/train']",
        "loaders.val.file_paths", f"['{workdir}/data/demo/val']",
        "loaders.test.file_paths", f"['{workdir}/data/demo/test']",
        "checkpoints_dir", f"{workdir}/checkpoints",
        "tpu.fetch_dtype", "bfloat16"])
    assert np.isfinite(result["psnr"])
    bf16_vol, _ = read_nifti(pred_path)
    np.testing.assert_allclose(bf16_vol, float_vol, rtol=0, atol=4e-3)


def test_run_pipelined_matches_serial(workdir, tmp_path):
    """The cross-subject pipelined predictor stream (run_pipelined, depth>0,
    batches of subject k+1 in flight during subject k's finalize) stitches
    volumes identical to serial per-subject __call__, in subject order."""
    from afcm_tpu.data import get_test_loaders
    from afcm_tpu.infer import get_predictor

    root = str(tmp_path / "multi")
    write_demo_tree(root, n_train=1, n_val=1, n_test=3, depth=12, size=64)
    cfg3 = setup(_Args(
        os.path.join(REPO, "configs/demo/cmsr_tiny.yml"),
        opts=["loaders.train.file_paths", f"['{root}/train']",
              "loaders.val.file_paths", f"['{root}/val']",
              "loaders.test.file_paths", f"['{root}/test']",
              "checkpoints_dir", f"{tmp_path}/ckpt",
              "loaders.batch_size", "5"]))  # ragged tails: 12 % 5 != 0

    calls = []

    def forward(a_batch, slice_idx):  # deterministic, batch-stateful
        calls.append(a_batch.shape[0])
        return (a_batch[:, 1:2] * 0.5
                + np.float32(0.01) * slice_idx[:, :, None, None])

    serial = get_predictor("StandardPredictor")(
        forward, str(tmp_path / "out_serial"), cfg3)
    vols_serial, names_serial = [], []
    for loader in get_test_loaders(cfg3):
        serial(loader)
        vols_serial.append(serial.last_prediction.copy())
        names_serial.append(os.path.basename(loader.dataset.file_path))
    serial.wait_for_writes()

    piped = get_predictor("StandardPredictor")(
        forward, str(tmp_path / "out_piped"), cfg3)
    calls.clear()
    vols_piped, names_piped, calls_at_yield = [], [], []
    for loader in piped.run_pipelined(get_test_loaders(cfg3), depth=3):
        calls_at_yield.append(len(calls))
        vols_piped.append(piped.last_prediction.copy())
        names_piped.append(os.path.basename(loader.dataset.file_path))
    piped.wait_for_writes()
    # Overlap proof: when subject 1 finalizes (12 slices = 3 batches of 5),
    # subject 2's batches must already be dispatched (depth=3 keeps the
    # device fed across the boundary). Serially this would be 3.
    assert calls_at_yield[0] > 3, calls_at_yield

    assert names_piped == names_serial and len(names_piped) == 3
    for a, b in zip(vols_piped, vols_serial):
        np.testing.assert_array_equal(a, b)
    # the pipelined head files land on disk too
    out = os.listdir(str(tmp_path / "out_piped"))
    assert sum(f.endswith("_predictions0.nii.gz") for f in out) == 3

    # depth=0 (pipelining disabled) must drain cleanly at end of stream
    # and still match (regression: IndexError on the empty deque)
    d0 = get_predictor("StandardPredictor")(
        forward, str(tmp_path / "out_d0"), cfg3)
    vols_d0 = [d0.last_prediction.copy()
               for _ in d0.run_pipelined(get_test_loaders(cfg3), depth=0)]
    d0.wait_for_writes()
    assert len(vols_d0) == 3
    for a, b in zip(vols_d0, vols_serial):
        np.testing.assert_array_equal(a, b)


def test_evaluate_state_device_committed(cfg, workdir):
    """Regression (round 5): checkpoint.load_state restores HOST numpy
    leaves; if prepare_mesh_state hands them to the jitted forward
    uncommitted, every batch dispatch re-uploads all parameters (measured
    4.3 vs ~70 slices/s e2e on the v5e tunnel, bench_evaluate_e2e.py)."""
    import jax
    from afcm_tpu.evaluate import init_and_load_state, prepare_mesh_state
    from afcm_tpu.models import build_gan_model
    model = build_gan_model(cfg)
    state = init_and_load_state(cfg, model)
    # the restored tree really is host numpy (the hazard this test pins)
    assert isinstance(jax.tree.leaves(state)[0], np.ndarray)
    _, placed = prepare_mesh_state(cfg, state)
    for leaf in jax.tree.leaves(placed):
        assert isinstance(leaf, jax.Array)


def test_eval_z_protocols(cfg, workdir):
    """tpu.eval_z: "per-batch" (reference protocol — fresh gen_z each test
    batch, comodgan_model.py:101-108) vs "fixed" (one z for the run:
    slice-consistent stitched volumes, the round-5 serving knob)."""
    from afcm_tpu.evaluate import init_and_load_state, make_forward_fn
    from afcm_tpu.models import build_gan_model
    model = build_gan_model(cfg)
    state = init_and_load_state(cfg, model)
    a = np.random.RandomState(0).rand(2, 4, 64, 64).astype(np.float32)
    s = np.zeros((2, 1), np.float32)
    fixed = make_forward_fn(model, state, eval_z="fixed")
    assert np.array_equal(np.asarray(fixed(a, s)), np.asarray(fixed(a, s)))
    per_batch = make_forward_fn(model, state)  # the default
    assert not np.array_equal(np.asarray(per_batch(a, s)),
                              np.asarray(per_batch(a, s)))


def test_resume_restores_state(cfg, workdir):
    from afcm_tpu.models import build_gan_model
    from afcm_tpu.utils import checkpoint as ckpt
    import jax.numpy as jnp

    model = build_gan_model(cfg)
    res = cfg.model.G.img_resolution
    dummy = {"A": jnp.zeros((1, 4, res, res)),
             "B": jnp.zeros((1, 1, res, res)),
             "slice_idx": jnp.zeros((1, 1))}
    state = model.init_state(jax.random.PRNGKey(0), dummy)
    run_dir = os.path.join(str(workdir), "checkpoints", "demo_tiny")
    restored = ckpt.load_state(state, run_dir, "latest")
    assert int(restored.step) > 0
    # optimizer state is preserved (improvement over the reference)
    leaves = jax.tree.leaves(restored.opt_state_G)
    assert any(np.any(np.asarray(l) != 0) for l in leaves)
