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

    # One eval_main over N subjects, timestamping each subject as the
    # pipelined generator yields it back to evaluate's scoring loop. The
    # first subject pays the jit compile (and the pipeline fill), so the
    # steady-state e2e rate is the marginal rate over subjects 2..N —
    # a separate warm CLI call would NOT warm anything (each eval_main
    # builds a fresh jit closure, so a second call recompiles).
    from afcm_tpu import evaluate as eval_mod
    from afcm_tpu.infer import predictor as pred_mod

    stamps = []
    orig_run = pred_mod.StandardPredictor.run_pipelined

    def timed_run(self, loaders):
        snap = dict(self.timings)
        for out in orig_run(self, loaders):
            yield out
            # after evaluate's loop body ran for this subject (scoring +
            # queued writes) control returns here: stamp the full cost
            stamps.append(time.time())
            phases = " ".join(f"{k}={self.timings[k] - snap[k]:.2f}"
                              for k in self.timings)
            print(f"    [predictor phases this subject: {phases}]",
                  flush=True)
            snap = dict(self.timings)

    pred_mod.StandardPredictor.run_pipelined = timed_run

    # Attribute evaluate.py's own per-subject host work too.
    host_t = {"find_target": 0.0, "score": 0.0}

    def timed(fn, key):
        def wrap(*a, **k):
            t0 = time.time()
            try:
                return fn(*a, **k)
            finally:
                host_t[key] += time.time() - t0
        return wrap

    eval_mod.find_target_volume = timed(eval_mod.find_target_volume,
                                        "find_target")
    eval_mod.evaluate_3D = timed(eval_mod.evaluate_3D, "score")
    eval_mod.evaluate_slice = timed(eval_mod.evaluate_slice, "score")

    wd = start_watchdog(2400, "evaluate-CLI run (first subject pays jit)")
    t0 = time.time()
    eval_mod.main(["--config-file", cfg_file] + opts)
    wd.cancel()
    dt = time.time() - t0
    stamps.insert(0, t0)

    slices = n_subjects * 64
    per_subj = [b - a for a, b in zip(stamps, stamps[1:])]
    print("per-subject seconds (first includes compile+fill): "
          + ", ".join(f"{s:.2f}" for s in per_subj), flush=True)
    steady = per_subj[1:]
    if steady:
        rate = 64 * len(steady) / sum(steady)
        print(f"evaluate CLI steady-state: {len(steady)} subjects x 64 "
              f"slices in {sum(steady):.2f} s = {rate:.1f} slices/s "
              f"end-to-end (stitch + NIfTI + PSNR/SSIM scoring included, "
              f"depth={depth})")
    print(f"evaluate CLI total: {n_subjects} subjects in {dt:.2f} s "
          f"({slices / dt:.1f} slices/s incl. the one-time jit compile)")
    print(f"evaluate-side host work, whole run: "
          f"find_target={host_t['find_target']:.2f}s "
          f"score={host_t['score']:.2f}s")


if __name__ == "__main__":
    main()
