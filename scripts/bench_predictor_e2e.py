"""Serving-grade end-to-end predictor throughput: full-size generator,
patch-stitched volumes through StandardPredictor (dispatch + halo removal +
native overlap-accumulate + NIfTI write), demo-sized subjects.

This measures what a deployment sees — the G_ema forward rate (bench.py)
minus the stitching/IO overhead of the real pipeline.

    python scripts/bench_predictor_e2e.py [n_subjects] [uint8|float32] \
        [fetch_dtype] [pipeline_depth]

Prints slices/s end-to-end and the ratio vs the pure-forward bench.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


class _Args:
    def __init__(self, config_file, opts):
        self.config_file = config_file
        self.model = None
        self.opts = opts


def main():
    n_subjects = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    transfer = sys.argv[2] if len(sys.argv) > 2 else "uint8"
    fetch = sys.argv[3] if len(sys.argv) > 3 else "float32"
    depth = sys.argv[4] if len(sys.argv) > 4 else "2"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    work = "/tmp/bench_predictor_e2e"
    os.makedirs(work, exist_ok=True)

    from afcm_tpu.data.demo import write_demo_tree
    data_root = os.path.join(work, f"demo_{n_subjects}")
    if not os.path.isdir(os.path.join(data_root, "test")):
        # full 256^2 slices so the full-size generator runs its real shapes;
        # depth 64 = whole batches (no ragged-tail padding waste)
        write_demo_tree(data_root, n_train=1, n_val=1, n_test=n_subjects,
                        size=256, depth=64)

    from afcm_tpu.config import setup
    cfg = setup(_Args(
        os.path.join(repo, "configs/adni/stylegan3/cmsr.yml"),
        ["loaders.test.file_paths", f"['{data_root}/test']",
         "loaders.train.file_paths", f"['{data_root}/train']",
         "loaders.val.file_paths", f"['{data_root}/val']",
         "checkpoints_dir", os.path.join(work, "ckpt"),
         "tpu.compute_dtype", "bfloat16",
         "tpu.transfer_dtype", transfer,
         "tpu.fetch_dtype", fetch,
         "tpu.pipeline_depth", depth]))

    from afcm_tpu.models import build_gan_model
    from afcm_tpu.evaluate import make_forward_fn
    from afcm_tpu.infer import get_predictor
    from afcm_tpu.data import get_test_loaders

    model = build_gan_model(cfg)
    res = cfg.model.G.img_resolution
    dummy = {"A": jnp.zeros((1, cfg.model.G.img_channels_in, res, res)),
             "B": jnp.zeros((1, cfg.model.G.img_channels_out, res, res)),
             "slice_idx": jnp.zeros((1, 1))}
    state = model.init_state(jax.random.PRNGKey(0), dummy)  # random weights
    from afcm_tpu.data.h5_dataset import _is_standard_pipeline
    norm_range = _is_standard_pipeline(cfg.loaders.test.transformer.raw)
    forward = make_forward_fn(model, state, norm_range=norm_range,
                              fetch_dtype=cfg.tpu.fetch_dtype)

    runs = []
    predictor = get_predictor("StandardPredictor")(
        forward, os.path.join(work, "out"), cfg)
    # One continuous pipelined stream over all subjects (the production
    # evaluate.py path): subject boundaries are overlapped with the device,
    # so per-subject wall times below include pipelined work for neighbors.
    t0 = time.time()
    snap = dict(predictor.timings)
    for loader in predictor.run_pipelined(get_test_loaders(cfg)):
        dt = time.time() - t0
        n = len(loader.dataset)
        subject = os.path.basename(loader.dataset.file_path)
        phases = " ".join(f"{k}={predictor.timings[k] - snap[k]:.2f}s"
                          for k in predictor.timings)
        print(f"subject {subject}: {n} patches "
              f"in {dt:.2f} s = {n / dt:.1f} slices/s e2e  [{phases}]",
              flush=True)
        runs.append((n, dt))
        t0 = time.time()
        snap = dict(predictor.timings)
    t0 = time.time()
    predictor.wait_for_writes()  # background head-1/2 writes
    drain = time.time() - t0
    print(f"write drain: {drain:.2f} s")

    steady = runs[1:] if len(runs) > 1 else runs  # first pays the compile
    n = sum(r[0] for r in steady)
    t = sum(r[1] for r in steady) + drain
    print(f"steady-state: {n / t:.1f} slices/s end-to-end "
          f"(stitch + NIfTI + write drain included)")


if __name__ == "__main__":
    main()
