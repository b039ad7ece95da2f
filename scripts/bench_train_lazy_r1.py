"""In-model A/B of the lazy-R1 knob (GANConfig.r1_interval) on the full-size
AFCM training step: every-step R1 (reference-faithful) vs the off-step
executable, one process.

The off-step compiles without the R1 double-grad subgraph; with interval N
the average step time is (1 on-step + (N-1) off-steps) / N. Round 5 rebases
the bracket on the shipped config (shared_g_fwd=True, the 761 ms base);
interval 16 is the StyleGAN2-ADA lazy-regularization standard the
reference's upstream uses. Run:

    python scripts/bench_train_lazy_r1.py [batch] [interval] [remat_min]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from afcm_tpu.utils.profiling import host_sync as sync  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _chip_util import start_watchdog, tiny_probe  # noqa: E402


def main():
    tiny_probe()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    interval = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    # remat_min_size: at 200 (the fastest every-step config) the no-R1
    # executable OOMs by 44 MB on a 16G v5e — XLA's remat scheduling keeps
    # more 2x-rate temps live without the R1 subgraph. 140 pulls the 148
    # layer tier into remat (the next tier below 200) and fits both
    # executables. Measured: on 1042 ms, off 993 ms (the step is
    # G-dominated; lazy R1 buys ~5% per off-step).
    remat_min = int(sys.argv[3]) if len(sys.argv) > 3 else 140
    # Shipped config: bf16 both nets, impl xla + upfirdn custom VJP (module
    # defaults since round 4) + shared G forward — the 761 ms/step base.
    from bench_train_impl import make_model
    model = make_model(batch, remat_min, shared_g_fwd=True)

    rng = np.random.RandomState(0)
    batch_data = {
        "A": jnp.asarray(rng.randn(batch, 4, 256, 256).clip(-1, 1),
                         jnp.float32),
        "B": jnp.asarray(rng.randn(batch, 1, 256, 256).clip(-1, 1),
                         jnp.float32),
        "slice_idx": jnp.asarray(rng.rand(batch, 1), jnp.float32)}
    state = model.init_state(jax.random.PRNGKey(0), batch_data)
    sync(state.params_G)

    def run(with_r1, iters=10):
        nonlocal state
        # train_step donates state; keep the returned one.
        state, m = model.train_step(state, batch_data, jax.random.PRNGKey(1),
                                    jnp.asarray(0.0), with_r1=with_r1)
        sync(m["G_L1"])  # compile + warm
        times = []
        for _ in range(3):
            t0 = time.time()
            for i in range(iters):
                state, m = model.train_step(state, batch_data,
                                            jax.random.PRNGKey(2 + i),
                                            jnp.asarray(0.0), with_r1=with_r1)
            sync(m["G_L1"])
            times.append((time.time() - t0) / iters * 1000)
        return float(np.median(times)), m

    wd = start_watchdog(2400, "lazy-R1 bracket (two train-step compiles)")
    ms_on, m_on = run(True)
    print(f"with_r1=True : {ms_on:7.1f} ms/step   "
          f"D_r1={float(m_on['D_r1']):.4f}", flush=True)
    ms_off, m_off = run(False)
    print(f"with_r1=False: {ms_off:7.1f} ms/step   "
          f"D_r1={float(m_off['D_r1']):.4f}", flush=True)
    # Bracket: re-measure the on-step so session drift can't masquerade as
    # the R1 delta (both executables stay cached; no recompile).
    ms_on2, _ = run(True)
    print(f"with_r1=True : {ms_on2:7.1f} ms/step   (bracket)", flush=True)
    ms_on_b = float(np.median([ms_on, ms_on2]))
    avg = (ms_on_b + (interval - 1) * ms_off) / interval
    print(f"interval={interval}: avg {avg:.1f} ms/step "
          f"({ms_on_b / avg:.2f}x vs every-step R1), "
          f"{batch / avg * 1000:.1f} img/s/chip "
          f"[bracket drift {abs(ms_on - ms_on2) / ms_on * 100:.1f}%]")


if __name__ == "__main__":
    main()
