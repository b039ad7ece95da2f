"""Training entry point.

    python -m afcm_tpu.train --config-file configs/adni/stylegan3/cmsr.yml \
        [--model stylegan3] [key value ...]

Mirrors the reference loop (reference: train.py): epoch loop with linear LR
decay, periodic loss logging, periodic validation (PSNR/SSIM) with
best-by-SSIM checkpointing — but the whole D+G+EMA iteration is one jitted
XLA program and batches stream onto the device mesh.
"""

from __future__ import annotations

import random
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import default_argument_parser
from .data import get_train_loaders
from .models import build_model
from .models.schedulers import LRScheduler
from .parallel import (make_mesh_for_batch, replicate_state, shard_batch,
                       shard_params)
from .utils import checkpoint as ckpt
from .utils.metrics import evaluate_2D
from .utils.visualizer import Visualizer


def lr_factor(epoch: int, cfg, metric=None) -> float:
    """Per-epoch LR factor, stateless convenience over LRScheduler
    (all four reference policies — models/utils.py:43-69). For ``plateau``
    — which is stateful — use one LRScheduler across epochs, as train() does;
    a fresh scheduler per call would silently discard the patience state."""
    if cfg.scheduler.lr_policy == "plateau":
        raise ValueError(
            "lr_factor() is stateless; the 'plateau' policy needs a single "
            "persistent LRScheduler across epochs (see train())")
    return LRScheduler(cfg).factor(epoch, metric)


def _slice_idx_of(batch) -> np.ndarray:
    """slice_idx for models that consume it; zeros for the image datasets
    (aligned/unaligned have no fractional-position condition)."""
    if "slice_idx" in batch:
        return batch["slice_idx"]
    return np.zeros((len(batch["A"]), 1), np.float32)


def validate(model, state, val_loader, rng) -> Optional[Dict[str, float]]:
    """PSNR/SSIM over the val split (reference: train.py:83-106)."""
    c_psnr, c_ssim = [], []
    for i, batch in enumerate(val_loader):
        rng, sub = jax.random.split(rng)
        # ref_img = the target batch, like the reference's forward_ema
        # (comodgan_model.py:114-116) — used only by RefMappingNetwork.
        fake = np.asarray(model.eval_step(
            state, jnp.asarray(batch["A"]),
            jnp.asarray(_slice_idx_of(batch)), sub,
            ref_img=jnp.asarray(batch["B"])))
        preds = np.clip((fake[:, None] + 1) / 2, 0, 1)
        real = np.clip((batch["B"][:, None] + 1) / 2, 0, 1)
        result = evaluate_2D(preds, real)
        if result is None:
            continue
        c_psnr.append(result[0])
        c_ssim.append(result[1])
    if not c_psnr:
        return None
    return {"psnr": float(np.mean(c_psnr)), "ssim": float(np.mean(c_ssim))}


def train(cfg, max_iters: Optional[int] = None) -> Dict[str, float]:
    from .ops.filtered_lrelu import set_default_impl
    # The banded-MXU pallas kernel carries a custom_vjp, so training and
    # inference share the same per-layer routing ('auto' default).
    set_default_impl(getattr(cfg.tpu, "filtered_lrelu_impl", "xla"))
    if cfg.tpu.matmul_precision != "default":
        jax.config.update("jax_default_matmul_precision",
                          cfg.tpu.matmul_precision)
    seed = cfg.manual_seed if cfg.manual_seed is not None else 0
    random.seed(seed)
    np.random.seed(seed)
    rng = jax.random.PRNGKey(seed)

    loaders = get_train_loaders(cfg, seed=seed)
    dataset_size = len(loaders["train"].dataset)
    print(f"The number of training images = {dataset_size}")

    model = build_model(cfg)
    rng, init_rng = jax.random.split(rng)
    raw_batch = next(iter(loaders["train"]))
    # slice-conditioned models (c_dim > 0) read batch["slice_idx"];
    # image-folder/template datasets carry no fractional position, so
    # _slice_idx_of feeds zeros (= integer slice) for those.
    sample_batch = {"A": jnp.asarray(raw_batch["A"]),
                    "B": jnp.asarray(raw_batch["B"]),
                    "slice_idx": jnp.asarray(_slice_idx_of(raw_batch))}
    state = model.init_state(init_rng, sample_batch)

    run_dir = f"{cfg.checkpoints_dir}/{cfg.name}"
    if cfg.continue_train:
        tag = str(cfg.epoch) if cfg.epoch else "latest"
        if ckpt.checkpoint_exists(run_dir, tag):
            print(f"resuming from {run_dir}/{tag}")
            state = ckpt.load_state(state, run_dir, tag)

    mesh = make_mesh_for_batch(tuple(cfg.tpu.mesh_shape),
                               cfg.loaders.batch_size)
    multi_device = mesh.devices.size > 1
    if multi_device:
        if mesh.shape["model"] > 1 and hasattr(state, "params_G_ema"):
            # dp x tp: big params (and their Adam moments / EMA copies)
            # shard their output dim over the model axis.
            state = shard_params(state, mesh)
        else:
            state = replicate_state(state, mesh)

    visualizer = Visualizer(cfg)
    # Persist the exact experiment config next to its checkpoints (the
    # durable analog of the reference's source-pickling `persistence`).
    import os
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "config.yml"), "w") as f:
        f.write(cfg.dump())
    total_iters = 0
    opt_steps = 0
    r1_interval = int(cfg.loss.get("r1_interval", 1))
    ssim_max = 0.0
    max_iters = max_iters or (cfg.trainer.max_iters or None)
    last_val = {}

    n_total_epochs = cfg.scheduler.n_epochs + cfg.scheduler.n_epochs_decay
    stop = False
    scheduler = LRScheduler(cfg)
    for epoch in range(cfg.scheduler.epoch_count, n_total_epochs + 1):
        epoch_start = time.time()
        # plateau watches -SSIM from the most recent validation (lower is
        # better); the other policies ignore the metric.
        factor = scheduler.factor(
            epoch, -last_val["ssim"] if last_val else None)
        state = state.with_lr(cfg.optimizer.lr_G * factor,
                              cfg.optimizer.lr_D * factor)
        iter_data_time = time.time()
        epoch_iter = 0  # per-epoch image counter (reference train.py:39,55)

        for batch in loaders["train"]:
            iter_start = time.time()
            t_data = iter_start - iter_data_time
            total_iters += cfg.loaders.batch_size
            epoch_iter += cfg.loaders.batch_size

            device_batch = {"A": batch["A"], "B": batch["B"],
                            "slice_idx": _slice_idx_of(batch)}
            if multi_device:
                device_batch = shard_batch(device_batch, mesh)
            else:
                device_batch = {k: jnp.asarray(v)
                                for k, v in device_batch.items()}

            rng, step_rng = jax.random.split(rng)
            step_kwargs = {}
            if r1_interval > 1 and hasattr(model, "config") \
                    and getattr(model.config, "r1_interval", 1) > 1:
                # Lazy R1: host-side selection between the two compiled
                # executables (with/without the double-grad subgraph).
                step_kwargs["with_r1"] = opt_steps % r1_interval == 0
            state, metrics = model.train_step(state, device_batch, step_rng,
                                              jnp.asarray(float(total_iters)),
                                              **step_kwargs)
            opt_steps += 1

            if total_iters % cfg.trainer.display_freq < cfg.loaders.batch_size:
                rng, vis_rng = jax.random.split(rng)
                fake = model.eval_step(
                    state, jnp.asarray(batch["A"][:1]),
                    jnp.asarray(_slice_idx_of(batch)[:1]), vis_rng,
                    ref_img=jnp.asarray(batch["B"][:1]))
                # display the center slice of the 4-window input (channel 1)
                # when present; single-channel inputs show as-is
                a_ch = 1 if batch["A"].shape[1] > 1 else 0
                visualizer.display_current_results(
                    {"real_A": batch["A"][:1, a_ch:a_ch + 1],
                     "fake_B": np.asarray(fake),
                     "real_B": batch["B"][:1]}, epoch)

            if total_iters % cfg.trainer.print_freq < cfg.loaders.batch_size:
                metrics = {k: float(v) for k, v in metrics.items()}
                t_comp = (time.time() - iter_start) / cfg.loaders.batch_size
                # per-epoch counter, matching the reference's epoch_iter
                # (reference train.py:64 resets it every epoch)
                visualizer.print_current_losses(epoch, epoch_iter, metrics,
                                                t_comp, t_data)

            if total_iters % cfg.trainer.save_latest_freq < cfg.loaders.batch_size:
                ckpt.save_state(state, run_dir, "latest")
                rng, val_rng = jax.random.split(rng)
                val = validate(model, state, loaders["val"], val_rng)
                if val:
                    last_val = val
                    visualizer.plot_val_results(val)
                    print(f" ^^^VALIDATION   psnr:{val['psnr']:.6}, "
                          f"ssim:{val['ssim']:.6}", flush=True)
                    if val["ssim"] > ssim_max:
                        ssim_max = val["ssim"]
                        ckpt.save_state(state, run_dir, "best")

            iter_data_time = time.time()
            if max_iters and total_iters >= max_iters:
                stop = True
                break

        if epoch % cfg.trainer.save_epoch_freq == 0:
            ckpt.save_state(state, run_dir, "latest")
            ckpt.save_state(state, run_dir, str(epoch))
        print(f"End of epoch {epoch} / {n_total_epochs} \t "
              f"Time Taken: {time.time() - epoch_start:.0f} sec", flush=True)
        if stop:
            break

    ckpt.save_state(state, run_dir, "latest")
    if hasattr(state, "params_G_ema"):  # pix2pix keeps no EMA copy
        ckpt.save_generator_only(state, run_dir, "latest")
    rng, val_rng = jax.random.split(rng)
    final_val = validate(model, state, loaders["val"], val_rng) or last_val
    return final_val or {}


def main(argv=None):
    cfg = default_argument_parser(argv)
    print(cfg.dump())
    train(cfg)


if __name__ == "__main__":
    main()
