"""Full evaluate-CLI end-to-end throughput: predictor stream + stitching +
NIfTI writes + 3D/per-slice PSNR/SSIM scoring + evaluate.txt — everything a
deployment's evaluation job does per subject.

This is the layer above scripts/bench_predictor_e2e.py (which excludes
scoring). Round 3 made it interesting: host metrics dropped 13x (native
ssim_mean/err_stats) and subjects stream through one pipelined device queue
(StandardPredictor.run_pipelined), so the CLI should now track the
device-bound predictor rate instead of the old ~10 s/subject host wall.

    python scripts/bench_evaluate_e2e.py [n_subjects] [pipeline_depth]

Prints slices/s end-to-end for the full CLI (first subject excluded — it
pays the jit compile).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _chip_util import start_watchdog, tiny_probe  # noqa: E402


class _Args:
    def __init__(self, config_file, opts):
        self.config_file = config_file
        self.model = None
        self.opts = opts


def main():
    tiny_probe()
    n_subjects = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    depth = sys.argv[2] if len(sys.argv) > 2 else "4"  # shipped default
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    work = "/tmp/bench_evaluate_e2e"
    os.makedirs(work, exist_ok=True)

    from afcm_tpu.data.demo import write_demo_tree
    data_root = os.path.join(work, f"demo_{n_subjects}")
    if not os.path.isdir(os.path.join(data_root, "test")):
        write_demo_tree(data_root, n_train=1, n_val=1, n_test=n_subjects,
                        size=256, depth=64)

    opts = ["loaders.test.file_paths", f"['{data_root}/test']",
            "loaders.train.file_paths", f"['{data_root}/train']",
            "loaders.val.file_paths", f"['{data_root}/val']",
            "checkpoints_dir", os.path.join(work, "ckpt"),
            "tpu.compute_dtype", "bfloat16",
            "tpu.transfer_dtype", "uint8",
            "tpu.pipeline_depth", depth]
    cfg_file = os.path.join(repo, "configs/adni/stylegan3/cmsr.yml")

    from afcm_tpu.config import setup
    cfg = setup(_Args(cfg_file, list(opts)))

    # Seed a checkpoint (random init weights — rate is weight-independent).
    run_dir = os.path.join(cfg.checkpoints_dir, cfg.name)
    if not os.path.exists(os.path.join(run_dir, "latest_state.msgpack")):
        from afcm_tpu.models import build_gan_model
        from afcm_tpu.utils import checkpoint as ckpt
        model = build_gan_model(cfg)
        res = cfg.model.G.img_resolution
        dummy = {"A": jnp.zeros((1, cfg.model.G.img_channels_in, res, res)),
                 "B": jnp.zeros((1, cfg.model.G.img_channels_out, res, res)),
                 "slice_idx": jnp.zeros((1, 1))}
        state = model.init_state(jax.random.PRNGKey(0), dummy)
        os.makedirs(run_dir, exist_ok=True)
        ckpt.save_state(state, run_dir, "latest")

    # Warm one subject (jit compile) outside the timed window by running
    # the CLI twice: first over 1 subject, then the timed full run.
    from afcm_tpu.evaluate import main as eval_main
    one_dir = os.path.join(work, "demo_warm")
    if not os.path.isdir(os.path.join(one_dir, "test")):
        write_demo_tree(one_dir, n_train=1, n_val=1, n_test=1,
                        size=256, depth=64)
    warm_opts = list(opts)
    warm_opts[1] = f"['{one_dir}/test']"
    wd = start_watchdog(1500, "evaluate-CLI warm subject (jit compile)")
    t0 = time.time()
    eval_main(["--config-file", cfg_file] + warm_opts)
    wd.cancel()
    print(f"warm (compile) subject: {time.time() - t0:.1f} s", flush=True)

    slices = n_subjects * 64
    t0 = time.time()
    eval_main(["--config-file", cfg_file] + opts)
    dt = time.time() - t0
    print(f"evaluate CLI: {n_subjects} subjects x 64 slices in {dt:.2f} s = "
          f"{slices / dt:.1f} slices/s end-to-end "
          f"(stitch + NIfTI + PSNR/SSIM scoring included, depth={depth})")


if __name__ == "__main__":
    main()
