"""Device-time bucket profile of the full-size G forward (bf16, batch 16).

Captures a jax.profiler trace, parses the trace-viewer JSON, and groups
device-stream op time into the buckets docs/performance.md tracks
(FIR depthwise / dense convs / pallas / copy-layout / misc).

Run: python scripts/profile_forward.py [xla|auto|int8] [batch]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from _chip_util import start_watchdog, tiny_probe
from _trace_util import parse_trace, print_profile


def sync(x):
    np.asarray(jax.device_get(jnp.sum(jnp.asarray(x, jnp.float32))))


def main():
    tiny_probe()
    impl = sys.argv[1] if len(sys.argv) > 1 else "auto"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    from afcm_tpu.nn import Stylegan3Generator
    import importlib
    fl = importlib.import_module('afcm_tpu.ops.filtered_lrelu')
    import afcm_tpu.ops.modulated_conv as mc

    if impl == "int8":
        mc.set_conv_impl("int8")
        fl.set_default_impl("auto")
    else:
        fl.set_default_impl(impl)

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
    wd = start_watchdog(1500, "forward init+compile")
    variables = jax.jit(gen.init)(jax.random.PRNGKey(0), z, c, cond)
    fwd = jax.jit(lambda v, z, c, x: gen.apply(v, z, c, x))
    sync(fwd(variables, z, c, cond))
    wd.cancel()

    trace_dir = "/tmp/fwd_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        out = fwd(variables, z, c, cond)
    sync(out)
    jax.profiler.stop_trace()

    parsed = parse_trace(trace_dir, iters=3)
    if parsed is None:
        print("no trace captured (axon tunnel may not export device traces)")
        return
    print_profile(f"impl={impl}", parsed)


if __name__ == "__main__":
    main()
