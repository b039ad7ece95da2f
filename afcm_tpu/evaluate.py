"""Evaluation entry point (reference: evaluate.py).

    python -m afcm_tpu.evaluate --config-file configs/adni/stylegan3/cmsr.yml \
        epoch latest

Runs the patch-stitched predictor per test subject with the jitted EMA
generator, reloads the written NIfTI volumes, and reports 3-D + per-slice
PSNR/SSIM against the original-resolution targets into ``evaluate.txt``.
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import default_argument_parser
from .data import get_test_loaders
from .infer import get_predictor
from .models import build_gan_model
from .utils import checkpoint as ckpt
from .utils.metrics import evaluate_3D, evaluate_slice
from .utils.nifti import read_nifti


def rescale_intensity(volume, percentils=(0.5, 99.5), bins_num=256,
                      norm=False):
    """(reference: evaluate.py:23-40)"""
    from .data.prepare_h5 import rescale_intensity as _ri
    return _ri(volume, percentils=percentils, bins_num=bins_num, norm=norm)


def normalize_uint8(a, lo, hi):
    """In-graph Normalize→[-1,1] for uint8-transfer batches — the same
    formula the host float path precomputes
    (data/h5_dataset.py AbstractVolumeDataset._norm). XLA lowers the
    divide-by-constant to a reciprocal multiply, so results can differ
    from the host path by 1 ULP (~6e-8)."""
    return jnp.clip(2 * ((a.astype(jnp.float32) - lo) / (hi - lo)) - 1, -1, 1)


def fetch_dtype_or_none(fetch_dtype):
    """tpu.fetch_dtype → the on-device output cast dtype (None = float32)."""
    return (jnp.dtype(fetch_dtype)
            if fetch_dtype not in (None, "float32") else None)


def checkpoint_tag(cfg) -> str:
    """The checkpoint tag the CLIs load: ``cfg.epoch`` or "latest"."""
    return str(cfg.epoch) if cfg.epoch else "latest"


def init_and_load_state(cfg, model, tag: Optional[str] = None):
    """Initialize a state skeleton from the config's shapes and restore the
    checkpoint (``cfg.epoch`` or "latest"). Shared by the evaluate and
    serving-export CLIs."""
    run_dir = os.path.join(cfg.checkpoints_dir, cfg.name)
    tag = tag or checkpoint_tag(cfg)
    rng = jax.random.PRNGKey(0)
    res = cfg.model.G.img_resolution
    dummy = {"A": jnp.zeros((1, cfg.model.G.img_channels_in, res, res)),
             "B": jnp.zeros((1, cfg.model.G.img_channels_out, res, res)),
             "slice_idx": jnp.zeros((1, 1))}
    state = model.init_state(rng, dummy)
    return ckpt.load_state(state, run_dir, tag)


def pipeline_norm_range(cfg):
    """Config-only uint8-transfer check: the Normalize range when
    ``tpu.transfer_dtype`` is uint8 and the test pipeline is the standard
    Normalize→ToTensor chain, else None. This is the right input for
    in-process serving: ``make_forward_fn`` dispatches on the actual
    batch dtype per call, and TestLoader only ships bytes for volumes
    actually stored uint8 (data/loader.py) — a range here merely enables
    the uint8 path; float-stored subjects still take the float path."""
    if getattr(cfg.tpu, "transfer_dtype", "float32") != "uint8":
        return None
    from .data.h5_dataset import _is_standard_pipeline
    return _is_standard_pipeline(cfg.loaders.test.transformer.raw)


def detect_norm_range(cfg):
    """Strict ingest decision for AOT export — the artifact has ONE ingest
    dtype, so uint8 is only chosen when every test volume will actually
    ship as bytes. For the h5 pipeline this is checked from file metadata
    (h5py dtype reads; no volume data is loaded). Mixed or non-uint8
    storage falls back to float ingest with a printed note; when no test
    data is reachable (exporting away from the datasets) or the dataset
    mode is the NII cascade (whose loader bins volumes to uint8 by
    construction, data/nii_dataset.py:44), the config range is assumed
    and noted."""
    rng = pipeline_norm_range(cfg)
    if rng is None:
        return None
    if cfg.loaders.get("dataset_mode", "cmsr") != "cmsr":
        return rng
    from .data.h5_dataset import StandardHDF5Dataset
    try:
        files = StandardHDF5Dataset.traverse_paths(
            list(cfg.loaders.test.file_paths), cfg.loaders)
    except (OSError, TypeError):
        files = []
    if not files:
        print("export note: no test volumes reachable — assuming uint8 "
              f"storage (config Normalize range {tuple(rng)}); re-export "
              "with `tpu.transfer_dtype float32` if the data is not uint8.")
        return rng
    import h5py
    keys = list(dict.fromkeys(list(cfg.loaders.raw_internal_path_in) +
                              list(cfg.loaders.raw_internal_path_out)))
    for path in files:
        try:
            with h5py.File(path, "r") as f:
                dtypes = {f[k].dtype for k in keys if k in f}
        except OSError as exc:
            print(f"export note: cannot read {path} ({exc}); "
                  "falling back to float32 ingest.")
            return None
        if dtypes != {np.dtype(np.uint8)}:
            print(f"export note: {path} stores {sorted(map(str, dtypes))} "
                  "(not uint8) — the loader will ship float batches, so "
                  "the artifact uses float32 ingest.")
            return None
    return rng


def configure_ops(cfg):
    """Apply the config's op-routing / precision knobs to the process:
    ``tpu.filtered_lrelu_impl``, the int8 conv path (``tpu.conv_int8``),
    and ``tpu.matmul_precision``. Shared by the evaluate and serve CLIs
    so deployment serves exactly the numerics that were scored."""
    from .ops.filtered_lrelu import set_default_impl
    set_default_impl(getattr(cfg.tpu, "filtered_lrelu_impl", "xla"))
    if getattr(cfg.tpu, "conv_int8", False):
        from .ops.modulated_conv import set_conv_impl
        set_conv_impl("int8",
                      variant=getattr(cfg.tpu, "conv_int8_variant", "dots"),
                      min_ch=getattr(cfg.tpu, "conv_int8_min_ch", 64))
    if cfg.tpu.matmul_precision != "default":
        jax.config.update("jax_default_matmul_precision",
                          cfg.tpu.matmul_precision)


def prepare_mesh_state(cfg, state):
    """Build the serving mesh and place the state on it: tensor-shard the
    big params when the model axis is configured, else replicate.
    Returns ``(mesh_or_None, state)``; shared by evaluate and serve."""
    from .parallel import make_mesh_for_batch, replicate_state, shard_params
    mesh = make_mesh_for_batch(tuple(cfg.tpu.mesh_shape),
                               cfg.loaders.batch_size)
    if mesh.devices.size <= 1:
        # checkpoint.load_state restores HOST numpy leaves; a jitted
        # forward that closes over them re-uploads every parameter on
        # every batch dispatch. Measured on the axon v5e (round 5,
        # scripts/bench_evaluate_e2e.py): 4.3 -> 57.1 slices/s e2e from
        # committing the state once. The multi-device branches below
        # already commit via shard_params/replicate_state.
        return None, jax.device_put(state)
    if mesh.shape["model"] > 1 and hasattr(state, "params_G_ema"):
        return mesh, shard_params(state, mesh)
    return mesh, replicate_state(state, mesh)


def ensure_volumetric(cfg, driver: str):
    """The volumetric predictor flow has no meaning for the pix2pix
    image-folder baseline (matches the reference's scope: its evaluate.py
    drives only the h5/NIfTI predictor — reference: evaluate.py,
    data/utils.py:265-308)."""
    if getattr(cfg.model, "name", "stylegan3") == "pix2pix":
        raise NotImplementedError(
            f"{driver} is the volumetric predictor flow; the pix2pix "
            "image-folder baseline is trained/validated via afcm_tpu.train "
            "(PSNR/SSIM on the val split), matching the reference's scope.")


def make_forward_fn(model, state, seed: int = 0, mesh=None, norm_range=None,
                    fetch_dtype=None, eval_z: str = "per-batch"):
    """Jitted (A, slice_idx) -> fake_B closure over the EMA generator.

    Draws a fresh z key per batch (fold_in on a call counter), matching the
    reference protocol which samples new gen_z for every test batch
    (reference: models/comodgan_model.py:101-108). The seed is fixed so a
    given evaluation run is still reproducible end to end.
    ``eval_z="fixed"`` (config ``tpu.eval_z``) instead holds one z for the
    whole run so a stitched volume's slices share a style — the
    slice-consistent serving mode (see config/defaults.py).

    With a multi-device ``mesh``, patch batches shard over the 'data' axis
    (the caller shards/replicates the state) so the predictor serves from
    the whole mesh — the TPU-native replacement for the reference's
    DataParallel test-batch scaling (reference: data/utils.py:292-295)."""
    key = jax.random.PRNGKey(seed)
    counter = [0]
    sharding = None
    if mesh is not None and mesh.devices.size > 1:
        from .parallel import batch_sharding
        sharding = batch_sharding(mesh)

    eval_u8 = None
    if norm_range is not None:
        # uint8 transfer (tpu.transfer_dtype): patches arrive in the stored
        # byte dtype and the Normalize->[-1,1] chain runs in-jit on device
        # while host->device traffic drops 4x; outputs agree with the float
        # path to ~1e-7
        # (tests/test_end_to_end.py::test_evaluate_uint8_transfer_parity).
        lo, hi = float(norm_range[0]), float(norm_range[1])

        @jax.jit
        def eval_u8(state, a_u8, s, sub):
            return model.eval_step(state, normalize_uint8(a_u8, lo, hi), s,
                                   sub)

    # tpu.fetch_dtype "bfloat16": round the prediction batch on device so
    # the host fetch moves half the bytes. With compute_dtype bfloat16 the
    # values are bf16-computed already; the predictor accumulates float32.
    out_dt = fetch_dtype_or_none(fetch_dtype)
    eval_cast = None
    if out_dt is not None:
        @jax.jit
        def eval_cast(state, a, s, sub):
            return model.eval_step(state, a, s, sub).astype(out_dt)

        if eval_u8 is not None:
            _eval_u8 = eval_u8

            @jax.jit
            def eval_u8(state, a_u8, s, sub):
                return _eval_u8(state, a_u8, s, sub).astype(out_dt)

    assert eval_z in ("per-batch", "fixed"), eval_z

    def forward(a_batch, slice_idx):
        sub = jax.random.fold_in(key, counter[0])
        if eval_z == "per-batch":
            counter[0] += 1
        a = jnp.asarray(a_batch)
        s = jnp.asarray(slice_idx)
        if sharding is not None:
            a = jax.device_put(a, sharding)
            s = jax.device_put(s, sharding)
        if np.asarray(a_batch).dtype == np.uint8:
            assert eval_u8 is not None, \
                "uint8 batches require make_forward_fn(norm_range=...)"
            return eval_u8(state, a, s, sub)
        if eval_cast is not None:
            return eval_cast(state, a, s, sub)
        return model.eval_step(state, a, s, sub)
    return forward


def find_target_volume(cfg, subject: str) -> Optional[np.ndarray]:
    """Load the original-resolution target for a subject.

    Prefers the reference layout (``<ori_file_path>/<subject>/<subject>*
    <out_modality>.nii.gz``); falls back to the subject's own h5 target
    modality when no registered original tree exists (demo / self-contained
    evaluation)."""
    modality = cfg.loaders.raw_internal_path_out[-1]
    ori = cfg.loaders.test.ori_file_path
    if ori and os.path.isdir(os.path.join(ori, subject)):
        matches = glob.glob(os.path.join(ori, subject,
                                         f"{subject}*{modality}.nii.gz"))
        if matches:
            vol, _ = read_nifti(matches[0])
            return np.asarray(vol, np.float64)
    return None


def main(argv=None):
    cfg = default_argument_parser(argv)
    print(cfg.dump())
    ensure_volumetric(cfg, "evaluate.py")
    configure_ops(cfg)

    model = build_gan_model(cfg)
    run_dir = os.path.join(cfg.checkpoints_dir, cfg.name)
    state = init_and_load_state(cfg, model)

    # Multi-device serving: batch-shard patches over the mesh's data axis;
    # tensor-shard the big params over the model axis when configured.
    mesh, state = prepare_mesh_state(cfg, state)

    out_path = os.path.join(run_dir, "evaluate")
    os.makedirs(out_path, exist_ok=True)
    norm_range = pipeline_norm_range(cfg)
    predictor_cls = get_predictor(cfg.predictor.name)
    predictor = predictor_cls(
        make_forward_fn(model, state, mesh=mesh, norm_range=norm_range,
                        fetch_dtype=getattr(cfg.tpu, "fetch_dtype", None),
                        eval_z=getattr(cfg.tpu, "eval_z", "per-batch")),
        out_path, cfg, patch_halo=cfg.predictor.patch_halo)

    c_psnr, c_ssim, c_psnr_slice, c_ssim_slice = [], [], [], []
    with open(os.path.join(out_path, "evaluate.txt"), "a") as fw:
        # One continuous device stream across subjects: the next subject's
        # batches are already in flight while this loop stitches, scores
        # (PSNR/SSIM are host-side on a 1-core box) and queues writes for
        # the previous one. Results are identical to serial per-subject
        # prediction (overlap-add is order-independent).
        # (depth comes from cfg.tpu.pipeline_depth via the predictor's config)
        for test_loader in predictor.run_pipelined(get_test_loaders(cfg)):
            from .infer.predictor import subject_id
            subject = subject_id(test_loader.dataset.file_path)

            # The stitched head-0 volume, bit-identical to reading back the
            # (background-written) predictions0 file — float32 roundtrip.
            img_data = predictor.last_prediction
            img_data = (np.clip(img_data, -1, 1) + 1) / 2

            target = find_target_volume(cfg, subject)
            if target is not None:
                target_data = np.clip(target, 0, 255) / 255
            else:
                modality = cfg.loaders.raw_internal_path_out[-1]
                target_data = test_loader.dataset.raw[modality].astype(
                    np.float64) / 255

            # Persist the rescaled target next to the predictions
            # (reference writes <subject>_ori.nii.gz, evaluate.py:92-93) —
            # on the predictor's background writer, like the head files.
            from .utils.nifti import write_nifti
            predictor.submit_write(
                write_nifti, os.path.join(out_path, subject + "_ori.nii.gz"),
                target_data.astype(np.float32))

            one = evaluate_3D(img_data, target_data)
            one_slice = evaluate_slice(img_data, target_data)
            c_psnr.append(one[0])
            c_ssim.append(one[1])
            c_psnr_slice.append(one_slice[0])
            c_ssim_slice.append(one_slice[1])

            line = (f" subject:{subject}   psnr:{one[0]:.6}, ssim:{one[1]:.6}, "
                    f"psnr_slice:{one_slice[0]:.6}, ssim_slice:{one_slice[1]:.6}\n")
            fw.write(line)
            print(line, end="")

        summary = (f" ^^^VALIDATION mean psnr:{np.mean(c_psnr):.6}, "
                   f"ssim:{np.mean(c_ssim):.6}, "
                   f"psnr_slice:{np.mean(c_psnr_slice):.6}, "
                   f"ssim_slice:{np.mean(c_ssim_slice):.6}\n")
        summary += (f" std   psnr:{np.std(c_psnr):.6}, ssim:{np.std(c_ssim):.6}, "
                    f"psnr_slice:{np.std(c_psnr_slice):.6}, "
                    f"ssim_slice:{np.std(c_ssim_slice):.6}\n")
        fw.write(summary)
        print(summary, end="")
    # Heads 1/2 are written by the predictor's background writer, overlapped
    # with the next subject's forward; make sure they are all on disk.
    predictor.wait_for_writes()
    return {"psnr": float(np.mean(c_psnr)), "ssim": float(np.mean(c_ssim))}


if __name__ == "__main__":
    main()
