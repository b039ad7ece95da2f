"""In-model A/B: full-size CMSR G_ema forward with conv impl xla vs int8,
same process (the only timing methodology the axon tunnel respects).

Run: python scripts/bench_model_int8.py [batch] [variant]
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
    variant = sys.argv[2] if len(sys.argv) > 2 else "dots"
    from afcm_tpu.nn import Stylegan3Generator
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

    results = {}
    outs = {}
    for impl in ("xla", "int8", "xla2"):
        mc.set_conv_impl("int8" if impl == "int8" else "xla",
                         variant=variant)
        fwd = jax.jit(lambda v, z, c, x: gen.apply(v, z, c, x))
        rate, out = bench(fwd, (variables, z, c, cond))
        results[impl] = rate
        outs[impl] = np.asarray(out, np.float32)
        print(f"{impl:5s}: {rate:6.2f} slices/s", flush=True)
    mc.set_conv_impl("xla")

    err = np.mean((outs["int8"] - outs["xla"]) ** 2)
    dr = outs["xla"].max() - outs["xla"].min()
    psnr = 10 * np.log10(dr * dr / max(err, 1e-12))
    print(f"speedup {results['int8'] / max(results['xla'], results['xla2']):.3f}x"
          f" | int8-vs-bf16 PSNR {psnr:.1f} dB (variant {variant})")


if __name__ == "__main__":
    main()
