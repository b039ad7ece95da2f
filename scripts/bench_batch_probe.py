"""Headline probe: bf16 forward throughput of the full-size CMSR generator
at large batch (48/64) — checks whether batch scaling past bench.py's 32
buys anything once dispatch overhead is fully amortized.

    python scripts/bench_batch_probe.py [batches...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench as bench_mod


def main():
    batches = [int(b) for b in sys.argv[1:]] or [48, 64]
    rng = np.random.RandomState(0)
    gen = bench_mod._make_gen("bfloat16")
    variables = None
    for batch in batches:
        z = jnp.asarray(rng.randn(batch, 512), jnp.float32)
        c = jnp.asarray(rng.rand(batch, 1), jnp.float32)
        cond = jnp.asarray(rng.randn(batch, 4, 256, 256).clip(-1, 1),
                           jnp.float32)
        try:
            if variables is None:
                variables = jax.jit(gen.init)(jax.random.PRNGKey(0), z, c,
                                              cond)
            fwd = jax.jit(lambda v, z, c, x: gen.apply(v, z, c, x))
            np.asarray(fwd(variables, z, c, cond))  # warm + reliable sync
            rates = []
            for _ in range(3):
                t0 = time.time()
                for _ in range(12):
                    out = fwd(variables, z, c, cond)
                np.asarray(out)
                rates.append(batch / ((time.time() - t0) / 12))
            print(f"b{batch}: median {np.median(rates):.2f} slices/s, "
                  f"spread {[round(r, 1) for r in sorted(rates)]}")
        except Exception as exc:
            print(f"b{batch} failed: {exc!r}")


if __name__ == "__main__":
    main()
