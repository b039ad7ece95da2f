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


def main(argv=None):
    import sys
    argv = list(sys.argv[1:] if argv is None else argv)
    from .config import default_argument_parser, pop_flag
    artifact = pop_flag(argv, "--artifact")
    out_dir = pop_flag(argv, "--out")
    from .data import get_test_loaders
    from .evaluate import (configure_ops, ensure_volumetric,
                           init_and_load_state, make_forward_fn,
                           pipeline_norm_range, prepare_mesh_state)
    from .infer import get_predictor

    cfg = default_argument_parser(argv)
    ensure_volumetric(cfg, "afcm_tpu.serve")
    configure_ops(cfg)  # same routing/precision the evaluation was scored at
    run_dir = os.path.join(cfg.checkpoints_dir, cfg.name)
    out_dir = out_dir or os.path.join(run_dir, "serve")

    if artifact is not None:
        from .infer.export import load_exported, serving_forward
        from .parallel import make_mesh
        exp = load_exported(artifact)
        # The artifact dictates the device count (jax.export pins it at
        # export time); the local mesh config is irrelevant here. A
        # single-device artifact serves without any sharding; a mesh-exported
        # one needs exactly nr_devices chips (make_mesh raises otherwise).
        mesh = (make_mesh((exp.nr_devices, 1))
                if exp.nr_devices > 1 else None)
        forward = serving_forward(exp, mesh=mesh)
    else:
        from .models import build_gan_model
        model = build_gan_model(cfg)
        mesh, state = prepare_mesh_state(cfg,
                                         init_and_load_state(cfg, model))
        forward = make_forward_fn(
            model, state, mesh=mesh, norm_range=pipeline_norm_range(cfg),
            fetch_dtype=getattr(cfg.tpu, "fetch_dtype", None),
            eval_z=getattr(cfg.tpu, "eval_z", "per-batch"))

    predictor = get_predictor(cfg.predictor.name)(
        forward, out_dir, cfg, patch_halo=cfg.predictor.patch_halo)
    # len(dataset) counts patch windows; with overlapping strides there are
    # more patches than slices, so the rate below is patches/s, not slices/s
    # (equal for the shipped full-slice 256² configs).
    n_subjects, n_patches, t0 = 0, 0, time.time()
    for loader in predictor.run_pipelined(get_test_loaders(cfg)):
        n_subjects += 1
        n_patches += len(loader.dataset)
        from .infer.predictor import subject_id
        subject = subject_id(loader.dataset.file_path)
        print(f" subject:{subject}  {len(loader.dataset)} patches -> "
              f"{out_dir}", flush=True)
    predictor.wait_for_writes()
    dt = time.time() - t0
    print(f"served {n_subjects} subjects / {n_patches} patches in {dt:.1f} s "
          f"({n_patches / max(dt, 1e-9):.1f} patches/s e2e)")
    return out_dir


if __name__ == "__main__":
    main()
