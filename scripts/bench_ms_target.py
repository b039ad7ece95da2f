"""In-model A/B of the routed up2 kernel tile size (set_ms_target_up2),
one process: bigger W/H mid-window targets mean fewer overlapped W tiles
(less XLA-side gather/reassembly boundary tax — measured ~20-23 ms/iter at
target 128, docs/performance.md round 3) at the cost of more redundant
banded-MXU FLOPs per tile.

Run: python scripts/bench_ms_target.py [batch]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from afcm_tpu.utils.profiling import bench_rates as bench  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from afcm_tpu.nn import Stylegan3Generator
    import importlib
    fl = importlib.import_module("afcm_tpu.ops.filtered_lrelu")

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

    configs = [("xla", "xla", 128), ("ms128", "auto", 128),
               ("ms192", "auto", 192), ("ms256", "auto", 256),
               ("ms320", "auto", 320), ("xla2", "xla", 128),
               ("ms128b", "auto", 128)]
    outs = {}
    for name, impl, ms in configs:
        fl.set_default_impl(impl)
        fl.set_ms_target_up2(ms)
        fwd = jax.jit(lambda v, z, c, x: gen.apply(v, z, c, x))
        rate, out = bench(fwd, (variables, z, c, cond))
        outs[name] = np.asarray(out, np.float32)
        print(f"{name:7s}: {rate:6.2f} slices/s", flush=True)
    fl.set_default_impl("auto")
    fl.set_ms_target_up2(128)

    base = outs["xla"]
    dr = base.max() - base.min()
    for name in ("ms128", "ms192", "ms256", "ms320"):
        err = np.mean((outs[name] - base) ** 2)
        print(f"{name} PSNR vs xla: "
              f"{10*np.log10(dr*dr/max(err,1e-12)):.1f} dB", flush=True)


if __name__ == "__main__":
    main()
