"""Same-process A/B: upfirdn2d custom VJP (swapped-filter forward-form
backward, the reference's own backward construction) vs JAX autodiff
(XLA conv-transpose lowering) in the FULL train step, bf16 both nets,
remat>=140, filtered_lrelu_impl xla.

Target: the 'reverse' HLO bucket (17.3 ms/step in the round-4 xla-impl
profile — XLA's lowering of the strided/dilated FIR backwards) plus any
conv-transpose inefficiency hiding inside the conv-fusion buckets.

Run: python scripts/bench_train_customgrad.py [batch] [remat_min] [iters]
"""

import importlib
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

    u = importlib.import_module("afcm_tpu.ops.upfirdn2d")
    fl = importlib.import_module("afcm_tpu.ops.filtered_lrelu")
    fl.set_default_impl("xla")

    rng = np.random.RandomState(0)
    batch_data = {
        "A": jnp.asarray(rng.randn(batch, 4, 256, 256).clip(-1, 1),
                         jnp.float32),
        "B": jnp.asarray(rng.randn(batch, 1, 256, 256).clip(-1, 1),
                         jnp.float32),
        "slice_idx": jnp.asarray(rng.rand(batch, 1), jnp.float32)}

    # Bracketed legs (custom, autodiff, custom again); a fresh GANModel per
    # leg forces a retrace (train_step's jit cache keys on self).
    times = {}
    for name, custom in (("custom", True), ("autodiff", False),
                         ("custom2", True)):
        u.set_custom_grad(custom)
        model = make_model(batch, remat_min)
        state = model.init_state(jax.random.PRNGKey(0), batch_data)
        state, m = model.train_step(state, batch_data, jax.random.PRNGKey(1),
                                    jnp.asarray(0.0), with_r1=True)
        sync(m["G_L1"])  # compile + warm
        print(f"{name}: compiled (G_L1={float(m['G_L1']):.3f} "
              f"D_real={float(m['D_real']):.3f})", flush=True)
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
    u.set_custom_grad(True)

    c = np.median(times["custom"] + times["custom2"])
    a = np.median(times["autodiff"])
    print(f"\ncustom(bracket) {c:.1f} ms vs autodiff {a:.1f} ms "
          f"-> custom is {a / c:.3f}x speedup", flush=True)


if __name__ == "__main__":
    main()
