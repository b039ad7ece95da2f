"""Same-process train-step batch-size sweep at the shipped defaults
(bf16 both nets, impl xla, upfirdn custom VJP, remat>=140, R1 on).

Question: does batch >16 buy img/s/chip? The reference's shipped CMSR
schedule is batch 16 (`/root/reference/configs/*.yml` train.batch_size);
the forward saturates by b16 (bench_batch_probe: b48 neutral), but the
train step's remat recompute and gradient convs could still amortize
differently. Legs bracket b16 around each candidate; OOM legs report
and continue (the b16 state must be freed before a bigger leg compiles).

Run: python scripts/bench_train_batch.py [iters] [batches...]
Default sweep: 16 24 16
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
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sweep = [int(v) for v in sys.argv[2:]] or [16, 24, 16]

    rng = np.random.RandomState(0)
    for idx, batch in enumerate(sweep):
        name = f"leg{idx}:b{batch}"
        batch_data = {
            "A": jnp.asarray(rng.randn(batch, 4, 256, 256).clip(-1, 1),
                             jnp.float32),
            "B": jnp.asarray(rng.randn(batch, 1, 256, 256).clip(-1, 1),
                             jnp.float32),
            "slice_idx": jnp.asarray(rng.rand(batch, 1), jnp.float32)}
        try:
            model = make_model(batch, 140)
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
            med = float(np.median(ts))
            print(f"{name}: median {med:7.1f} ms/step = "
                  f"{batch / med * 1e3:5.1f} img/s "
                  f"(spread {min(ts):.1f}-{max(ts):.1f})", flush=True)
            del state, model, m
        except Exception as exc:  # OOM legs report and continue
            print(f"{name}: FAILED {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:200]}", flush=True)
        del batch_data


if __name__ == "__main__":
    main()
