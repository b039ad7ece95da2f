"""Same-process remat_min_size sweep of the FULL train step at the shipped
defaults (bf16 both nets, impl xla, upfirdn custom VJP on).

Motivation: the upfirdn custom VJP's backward needs NO saved activations
(the FIR is linear — dx depends only on dy and the static filter), so the
activation-memory pressure that made remat_min 200 OOM by 748 MB with the
bf16 D (BASELINE.md round-4 addendum) may be gone; coarser remat means
fewer recomputed convs per backward.

Legs bracket the shipped 140 around each candidate, one process. A leg
that OOMs is caught and reported, not fatal.

Run: python scripts/bench_train_remat.py [batch] [iters] [remat values...]
Default sweep: 140 200 280 140
"""

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
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    sweep = [int(v) for v in sys.argv[3:]] or [140, 200, 280, 140]

    rng = np.random.RandomState(0)
    batch_data = {
        "A": jnp.asarray(rng.randn(batch, 4, 256, 256).clip(-1, 1),
                         jnp.float32),
        "B": jnp.asarray(rng.randn(batch, 1, 256, 256).clip(-1, 1),
                         jnp.float32),
        "slice_idx": jnp.asarray(rng.rand(batch, 1), jnp.float32)}

    for idx, remat_min in enumerate(sweep):
        name = f"leg{idx}:remat{remat_min}"
        try:
            model = make_model(batch, remat_min)
            state = model.init_state(jax.random.PRNGKey(0), batch_data)
            state, m = model.train_step(state, batch_data,
                                        jax.random.PRNGKey(1),
                                        jnp.asarray(0.0), with_r1=True)
            sync(m["G_L1"])
            print(f"{name}: compiled (G_L1={float(m['G_L1']):.3f})",
                  flush=True)
            ts = []
            for _ in range(3):
                t0 = time.time()
                for i in range(iters):
                    state, m = model.train_step(state, batch_data,
                                                jax.random.PRNGKey(7 + i),
                                                jnp.asarray(0.0),
                                                with_r1=True)
                sync(m["G_L1"])
                ts.append((time.time() - t0) / iters * 1e3)
            print(f"{name}: median {np.median(ts):7.1f} ms/step "
                  f"(spread {min(ts):.1f}-{max(ts):.1f})", flush=True)
            del state, model, m
        except Exception as exc:  # OOM legs report and continue
            print(f"{name}: FAILED {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:200]}", flush=True)


if __name__ == "__main__":
    main()
