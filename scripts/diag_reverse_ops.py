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

import numpy as np
import jax
import jax.numpy as jnp


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from afcm_tpu.models import GANConfig, GANModel, build_discriminator, \
        build_generator

    g_cfg = dict(netG="stylegan3", z_dim=512, c_dim=1, w_dim=512,
                 img_resolution=256, img_channels_in=4, img_channels_out=1,
                 mapping_kwargs=dict(num_layers=8),
                 synthesis_kwargs=dict(channel_base=16384, channel_max=512,
                                       num_layers=14, skip_resolution=128,
                                       lrelu_upsampling=2, conv_clamp=256,
                                       compute_dtype="bfloat16", remat=True,
                                       remat_min_size=140))
    d_cfg = dict(netD="comodgan", c_dim=1, img_resolution=256,
                 img_channels=5, channel_base=16384, channel_max=512,
                 compute_dtype="bfloat16")
    cfg = GANConfig(z_dim=512, c_dim=1, batch_size=batch,
                    blur_init_sigma=0.0, r1_interval=1, shared_g_fwd=True)
    model = GANModel(build_generator(g_cfg), build_discriminator(d_cfg), cfg)

    rng = np.random.RandomState(0)
    bd = {"A": jnp.asarray(rng.randn(batch, 4, 256, 256).clip(-1, 1),
                           jnp.float32),
          "B": jnp.asarray(rng.randn(batch, 1, 256, 256).clip(-1, 1),
                           jnp.float32),
          "slice_idx": jnp.asarray(rng.rand(batch, 1), jnp.float32)}
    state = model.init_state(jax.random.PRNGKey(0), bd)
    step = jax.jit(functools.partial(model.train_step, with_r1=True))
    txt = step.lower(state, bd, jax.random.PRNGKey(1),
                     jnp.asarray(0.0)).compile().as_text()
    with open("/tmp/train_step_hlo.txt", "w") as f:
        f.write(txt)
    print("HLO saved to /tmp/train_step_hlo.txt")

    rows = []
    for line in txt.splitlines():
        ls = line.strip()
        if not re.match(r"\S+ = \S+ reverse\(", ls):
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
