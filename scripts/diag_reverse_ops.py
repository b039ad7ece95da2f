"""Locate the train step's `reverse` HLO ops in the TPU optimized module.

The round-4 per-bucket profile shows 17.4 ms/iter of activation-shaped
`reverse` ops (e.g. bf16[16,64,278,278]) that survive the upfirdn custom
VJP. This compiles the shipped train step over the tunnel, dumps the
optimized HLO, and prints each reverse op's shape + op_name metadata so
the producing layer/op is identifiable.

Run: python scripts/diag_reverse_ops.py [batch]
"""

import functools
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from _chip_util import start_watchdog, tiny_probe
from bench_train_impl import make_model


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    tiny_probe()
    # Shipped round-4 config (one source: bench_train_impl.make_model).
    model = make_model(batch, remat_min=140, shared_g_fwd=True)

    rng = np.random.RandomState(0)
    bd = {"A": jnp.asarray(rng.randn(batch, 4, 256, 256).clip(-1, 1),
                           jnp.float32),
          "B": jnp.asarray(rng.randn(batch, 1, 256, 256).clip(-1, 1),
                           jnp.float32),
          "slice_idx": jnp.asarray(rng.rand(batch, 1), jnp.float32)}
    state = model.init_state(jax.random.PRNGKey(0), bd)
    step = jax.jit(functools.partial(model.train_step, with_r1=True))
    # The train-step compile runs 2-3 min over the tunnel; a wedge here
    # would otherwise hang forever (CLAUDE.md ops guidance).
    wd = start_watchdog(1200, "train-step compile")
    txt = step.lower(state, bd, jax.random.PRNGKey(1),
                     jnp.asarray(0.0)).compile().as_text()
    wd.cancel()
    with open("/tmp/train_step_hlo.txt", "w") as f:
        f.write(txt)
    print("HLO saved to /tmp/train_step_hlo.txt")

    rows = []
    for line in txt.splitlines():
        ls = line.strip()
        if not re.match(r"(?:ROOT )?\S+ = \S+ reverse\(", ls):
            continue
        shape = re.search(r"= ((?:bf16|f32|s32|u8)\[[0-9,]*\][^ ]*) reverse",
                          ls)
        op = re.search(r'op_name="([^"]*)"', ls)
        rows.append(((shape.group(1) if shape else "?"),
                     (op.group(1) if op else "?")))
    # biggest first by element count
    def elts(s):
        m = re.search(r"\[([0-9,]*)\]", s)
        if not m or not m.group(1):
            return 0
        return int(np.prod([int(v) for v in m.group(1).split(",")]))
    for shape, op in sorted(rows, key=lambda r: -elts(r[0])):
        print(f"{elts(shape)/1e6:9.1f} Melts  {shape:28s} {op[:150]}")
    print(f"total reverse ops: {len(rows)}")


if __name__ == "__main__":
    main()
