"""In-model sweep of the round-3 perf knobs on the full-size generator,
one process: conv impl (xla / int8 table).

Run: python scripts/bench_model_sweep.py [batch]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp


from afcm_tpu.utils.profiling import host_sync as sync  # noqa: E402


from afcm_tpu.utils.profiling import bench_rates as bench  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from afcm_tpu.nn import Stylegan3Generator
    import importlib
    fl = importlib.import_module('afcm_tpu.ops.filtered_lrelu')
    import afcm_tpu.ops.modulated_conv as mc

    gen = Stylegan3Generator(
        z_dim=512, c_dim=1, w_dim=512, img_resolution=256,
        img_channels_in=4, img_channels_out=1,
        mapping_kwargs=dict(num_layers=8),
        synthesis_kwargs=dict(channel_base=16384, channel_max=512,
                              num_layers=14, skip_resolution=128,
                              lrelu_upsampling=2, conv_clamp=256,
                              compute_dtype="bfloat16"))
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(batch, 512), jnp.float32)
    c = jnp.asarray(rng.rand(batch, 1), jnp.float32)
    cond = jnp.asarray(rng.randn(batch, 4, 256, 256).clip(-1, 1), jnp.float32)
    variables = jax.jit(gen.init)(jax.random.PRNGKey(0), z, c, cond)

    configs = [
        ("baseline      ", "xla"),
        ("int8-table    ", "int8"),
        ("baseline-again", "xla"),
    ]
    outs = {}
    for name, conv_impl in configs:
        mc.set_conv_impl(conv_impl)
        fl.set_default_impl("auto")
        fwd = jax.jit(lambda v, z, c, x: gen.apply(v, z, c, x))
        rate, out = bench(fwd, (variables, z, c, cond))
        outs[name] = (rate, np.asarray(out, np.float32))
        print(f"{name}: {rate:6.2f} slices/s", flush=True)
    mc.set_conv_impl("xla")

    base = outs["baseline      "][1]
    dr = base.max() - base.min()
    for name in ("int8-table    ",):
        err = np.mean((outs[name][1] - base) ** 2)
        print(f"{name.strip()} PSNR vs bf16: "
              f"{10*np.log10(dr*dr/max(err,1e-12)):.1f} dB")


if __name__ == "__main__":
    main()
