"""Smoke: AOT-export the tiny-config eval step under the attached TPU
backend and call the deserialized artifact once (the CPU-side equivalent
runs in tests/test_export.py; this validates the real-platform path).

    python scripts/smoke_export_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from afcm_tpu.config import setup


class _Args:
    def __init__(self, config_file, opts=None):
        self.config_file = config_file
        self.model = None
        self.opts = opts or []


def main():
    cfg = setup(_Args("configs/demo/cmsr_tiny.yml"))
    from afcm_tpu.models import build_gan_model
    from afcm_tpu.infer.export import export_eval, serving_forward

    model = build_gan_model(cfg)
    d = {"A": jnp.zeros((1, 4, 64, 64)), "B": jnp.zeros((1, 1, 64, 64)),
         "slice_idx": jnp.zeros((1, 1))}
    state = model.init_state(jax.random.PRNGKey(0), d)
    exp = export_eval(model, state, 2, (4, 64, 64), seed=7)
    print("platforms:", exp.platforms, "bytes:", len(exp.serialize()))
    fwd = serving_forward(exp)
    rng = np.random.RandomState(0)
    out = np.asarray(
        fwd(rng.randn(2, 4, 64, 64).clip(-1, 1).astype(np.float32),
            rng.rand(2, 1).astype(np.float32)), np.float32)
    print("TPU artifact call OK:", out.shape, float(np.abs(out).max()))


if __name__ == "__main__":
    main()
