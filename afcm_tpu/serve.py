"""Deployment entry point: predict volumes for every test subject — the
evaluate flow minus scoring (no targets needed).

    python -m afcm_tpu.serve --config-file configs/adni/stylegan3/cmsr.yml \
        [--artifact serving.hlo] [--out DIR] [epoch latest] [key value ...]

Serves either in-process (jitted EMA forward from the checkpoint — the
default) or from an AOT artifact produced by ``afcm_tpu.infer.export``
(``--artifact``; no checkpoint loading, no re-trace). Subjects stream
through the pipelined predictor (``tpu.pipeline_depth``); per-subject
NIfTI heads are written write-behind.

The reference has no serving-only driver — its evaluate.py always scores
(reference: evaluate.py:43-103); this is the deployment half of that flow.
"""

from __future__ import annotations

import os
import time

import jax


def main(argv=None):
    import sys
    argv = list(sys.argv[1:] if argv is None else argv)
    artifact = None
    if "--artifact" in argv:
        i = argv.index("--artifact")
        artifact = argv[i + 1]
        del argv[i:i + 2]
    out_dir = None
    if "--out" in argv:
        i = argv.index("--out")
        out_dir = argv[i + 1]
        del argv[i:i + 2]

    from .config import default_argument_parser
    from .data import get_test_loaders
    from .infer import get_predictor

    cfg = default_argument_parser(argv)
    if cfg.tpu.matmul_precision != "default":
        jax.config.update("jax_default_matmul_precision",
                          cfg.tpu.matmul_precision)
    run_dir = os.path.join(cfg.checkpoints_dir, cfg.name)
    out_dir = out_dir or os.path.join(run_dir, "serve")

    from .parallel import make_mesh_for_batch
    mesh = make_mesh_for_batch(tuple(cfg.tpu.mesh_shape),
                               cfg.loaders.batch_size)
    if mesh.devices.size <= 1:
        mesh = None

    if artifact is not None:
        from .infer.export import serving_forward
        forward = serving_forward(artifact, mesh=mesh)
    else:
        from .evaluate import (detect_norm_range, init_and_load_state,
                               make_forward_fn)
        from .models import build_gan_model
        from .ops.filtered_lrelu import set_default_impl
        set_default_impl(getattr(cfg.tpu, "filtered_lrelu_impl", "auto"))
        model = build_gan_model(cfg)
        state = init_and_load_state(cfg, model)
        if mesh is not None:
            from .parallel import replicate_state, shard_params
            if mesh.shape["model"] > 1 and hasattr(state, "params_G_ema"):
                state = shard_params(state, mesh)
            else:
                state = replicate_state(state, mesh)
        forward = make_forward_fn(
            model, state, mesh=mesh, norm_range=detect_norm_range(cfg),
            fetch_dtype=getattr(cfg.tpu, "fetch_dtype", None))

    predictor = get_predictor(cfg.predictor.name)(
        forward, out_dir, cfg, patch_halo=cfg.predictor.patch_halo)
    n_subjects, n_slices, t0 = 0, 0, time.time()
    for loader in predictor.run_pipelined(get_test_loaders(cfg)):
        n_subjects += 1
        n_slices += len(loader.dataset)
        subject = os.path.basename(loader.dataset.file_path).split(".")[0]
        print(f" subject:{subject}  {len(loader.dataset)} slices -> "
              f"{out_dir}", flush=True)
    predictor.wait_for_writes()
    dt = time.time() - t0
    print(f"served {n_subjects} subjects / {n_slices} slices in {dt:.1f} s "
          f"({n_slices / max(dt, 1e-9):.1f} slices/s e2e)")
    return out_dir


if __name__ == "__main__":
    main()
