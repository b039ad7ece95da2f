"""One-config (bf16, batch 16) forward-rate probe for XLA-flag A/Bs.

The axon compile helper forwards proto-backed ``xla_*`` debug-option flags
from the client's XLA_FLAGS per-compile — but the CLIENT's parser only
accepts fields of the open-source DebugOptions proto, which (this jaxlib)
carries no perf-relevant TPU flags: ``--xla_tpu_scoped_vmem_limit_kib`` et
al. are rejected with "Unknown flag" (only xla_tpu_detect_nan/inf and
xla_tpu_user_reserved_hbm_bytes exist). The TPU compiler's real knobs are
terminal-owned (``axon launch --extra-libtpu-args``) and unreachable from
here — measured dead end, recorded in docs/performance.md.

Usage (for flags the client does know):

    XLA_FLAGS="--xla_dump_fusion_visualization" \
        python scripts/bench_xla_flags.py

Prints one line: the flag string and the median bf16-b16 slices/s.
Baseline measured 75.79 / 75.81 slices/s back-to-back (flagless).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from afcm_tpu.utils.profiling import bench_rates


def main():
    from afcm_tpu.nn import Stylegan3Generator
    gen = Stylegan3Generator(
        z_dim=512, c_dim=1, w_dim=512, img_resolution=256,
        img_channels_in=4, img_channels_out=1,
        mapping_kwargs=dict(num_layers=8),
        synthesis_kwargs=dict(channel_base=16384, channel_max=512,
                              num_layers=14, skip_resolution=128,
                              lrelu_upsampling=2, conv_clamp=256,
                              compute_dtype="bfloat16"))
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(16, 512), jnp.float32)
    c = jnp.asarray(rng.rand(16, 1), jnp.float32)
    cond = jnp.asarray(rng.randn(16, 4, 256, 256).clip(-1, 1), jnp.float32)
    variables = jax.jit(gen.init)(jax.random.PRNGKey(0), z, c, cond)
    fwd = jax.jit(lambda v, z, c, x: gen.apply(v, z, c, x))
    rate, _ = bench_rates(fwd, (variables, z, c, cond))
    print(f"XLA_FLAGS={os.environ.get('XLA_FLAGS', '')!r}: "
          f"{rate:.2f} slices/s")


if __name__ == "__main__":
    main()
