"""In-model A/B of filtered_lrelu variants on the full-size generator,
one process: xla-only vs auto (measured routing).

Run: python scripts/bench_model_flrelu.py [batch]
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

    from afcm_tpu.ops.pallas.filtered_lrelu_mxu import set_element_gather

    # The Element-window Mosaic compile wedged the axon tunnel for >2 h
    # (docs/performance.md round 3) — it is OFF unless explicitly requested
    # with AFCM_BENCH_ELEMENT=1, and then runs first so the A/B loss is
    # bounded if it wedges again.
    if os.environ.get("AFCM_BENCH_ELEMENT") == "1":
        configs = [("auto_elem", "auto", None, True),
                   ("xla", "xla", None, False), ("auto", "auto", None, False),
                   ("auto_elem2", "auto", None, True),
                   ("auto2", "auto", None, False)]
    else:
        configs = [("xla", "xla", None, False), ("auto", "auto", None, False),
                   ("xla2", "xla", None, False), ("auto2", "auto", None, False)]
    outs = {}
    for name, impl, bo, elem in configs:
        fl.set_default_impl(impl)
        set_element_gather(elem)
        fwd = jax.jit(lambda v, z, c, x: gen.apply(v, z, c, x))
        rate, out = bench(fwd, (variables, z, c, cond))
        outs[name] = np.asarray(out, np.float32)
        print(f"{name:11s}: {rate:6.2f} slices/s", flush=True)
    fl.set_default_impl("auto")
    set_element_gather(False)

    ref = outs.get("auto_elem", outs["auto"])
    err = np.mean((ref - outs["xla"]) ** 2)
    dr = outs["xla"].max() - outs["xla"].min()
    print(f"vs-xla PSNR {10*np.log10(dr*dr/max(err,1e-12)):.1f} dB")


if __name__ == "__main__":
    main()
