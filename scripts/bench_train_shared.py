"""Same-process bracketed A/B of GANConfig.shared_g_fwd on the full train
step (D w/ R1 + G + EMA): two independent G forwards per step (the
reference's comodgan/stylegan3 structure, stylegan3_model.py:119,129) vs
ONE forward whose VJP is captured and reused for the G phase (the
reference's own pix2pix structure, pix2pix_model.py:163-174).

The step is G-dominated (round-4 profile: 96.3% convolution work), and the
D-phase forward is a full un-rematted G forward — sharing should delete
~one forward's conv work from the step.

Run: python scripts/bench_train_shared.py [batch] [remat_min] [iters]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from afcm_tpu.utils.profiling import host_sync as sync  # noqa: E402

from bench_train_impl import make_model  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    remat_min = int(sys.argv[2]) if len(sys.argv) > 2 else 140
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    rng = np.random.RandomState(0)
    batch_data = {
        "A": jnp.asarray(rng.randn(batch, 4, 256, 256).clip(-1, 1),
                         jnp.float32),
        "B": jnp.asarray(rng.randn(batch, 1, 256, 256).clip(-1, 1),
                         jnp.float32),
        "slice_idx": jnp.asarray(rng.rand(batch, 1), jnp.float32)}

    times = {}
    for name, shared in (("two-fwd", False), ("shared", True),
                         ("two-fwd2", False)):
        model = make_model(batch, remat_min)
        model.config = dataclasses.replace(model.config, shared_g_fwd=shared)
        state = model.init_state(jax.random.PRNGKey(0), batch_data)
        state, m = model.train_step(state, batch_data, jax.random.PRNGKey(1),
                                    jnp.asarray(0.0), with_r1=True)
        sync(m["G_L1"])  # compile + warm
        print(f"{name}: compiled (G_L1={float(m['G_L1']):.3f} "
              f"D_real={float(m['D_real']):.3f} "
              f"D_r1={float(m['D_r1']):.4f})", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.time()
            for i in range(iters):
                state, m = model.train_step(state, batch_data,
                                            jax.random.PRNGKey(7 + i),
                                            jnp.asarray(0.0), with_r1=True)
            sync(m["G_L1"])
            ts.append((time.time() - t0) / iters * 1e3)
        times[name] = ts
        print(f"{name}: median {np.median(ts):7.1f} ms/step "
              f"(spread {min(ts):.1f}-{max(ts):.1f})", flush=True)
        del state, model, m

    two = np.median(times["two-fwd"] + times["two-fwd2"])
    sh = np.median(times["shared"])
    print(f"\ntwo-fwd(bracket) {two:.1f} ms vs shared {sh:.1f} ms "
          f"-> shared is {two / sh:.3f}x ({batch / sh * 1e3:.1f} img/s/chip)",
          flush=True)


if __name__ == "__main__":
    main()
