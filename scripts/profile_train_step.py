"""Device-time bucket profile of the FULL training step (D w/ R1 + G + EMA)
— VERDICT r3 item 4: the 1,039-1,049 ms step was only characterized
end-to-end; this splits it into HLO-category buckets + top ops so the
backward/remat recompute share, the R1 double-grad cost, and the
optimizer/EMA tail become visible.

Run: python scripts/profile_train_step.py [batch] [remat_min] [with_r1] [d_dtype] [shared]
Defaults: batch 16, remat_min 140, with_r1 1, d_dtype bfloat16, shared 1
(the shipped bf16 config — tpu.compute_dtype drives both nets and
tpu.shared_g_fwd is on since round 4).
Compare with_r1=0 to isolate the R1 double-grad subgraph's device share.
NOTE: remat_min 200 OOMs with the bf16 D (and with the no-R1 f32-D
executable) — BASELINE.md memory boundaries; 140 is runtime-neutral.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from _trace_util import parse_trace, print_profile
from afcm_tpu.utils.profiling import host_sync as sync  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    remat_min = int(sys.argv[2]) if len(sys.argv) > 2 else 140
    with_r1 = bool(int(sys.argv[3])) if len(sys.argv) > 3 else True
    d_dtype = sys.argv[4] if len(sys.argv) > 4 else "bfloat16"
    from afcm_tpu.models import GANConfig, GANModel, build_discriminator, \
        build_generator

    g_cfg = dict(netG="stylegan3", z_dim=512, c_dim=1, w_dim=512,
                 img_resolution=256, img_channels_in=4, img_channels_out=1,
                 mapping_kwargs=dict(num_layers=8),
                 synthesis_kwargs=dict(channel_base=16384, channel_max=512,
                                       num_layers=14, skip_resolution=128,
                                       lrelu_upsampling=2, conv_clamp=256,
                                       compute_dtype="bfloat16", remat=True,
                                       remat_min_size=remat_min))
    d_cfg = dict(netD="comodgan", c_dim=1, img_resolution=256,
                 img_channels=5, channel_base=16384, channel_max=512,
                 compute_dtype=d_dtype)
    shared = bool(int(sys.argv[5])) if len(sys.argv) > 5 else True
    cfg = GANConfig(z_dim=512, c_dim=1, batch_size=batch,
                    blur_init_sigma=0.0, r1_interval=1 if with_r1 else 2,
                    shared_g_fwd=shared)
    model = GANModel(build_generator(g_cfg), build_discriminator(d_cfg), cfg)

    rng = np.random.RandomState(0)
    batch_data = {
        "A": jnp.asarray(rng.randn(batch, 4, 256, 256).clip(-1, 1),
                         jnp.float32),
        "B": jnp.asarray(rng.randn(batch, 1, 256, 256).clip(-1, 1),
                         jnp.float32),
        "slice_idx": jnp.asarray(rng.rand(batch, 1), jnp.float32)}
    state = model.init_state(jax.random.PRNGKey(0), batch_data)
    sync(state.params_G)

    state, m = model.train_step(state, batch_data, jax.random.PRNGKey(1),
                                jnp.asarray(0.0), with_r1=with_r1)
    sync(m["G_L1"])  # compile + warm

    iters = 3
    trace_dir = "/tmp/train_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    for i in range(iters):
        state, m = model.train_step(state, batch_data,
                                    jax.random.PRNGKey(2 + i),
                                    jnp.asarray(0.0), with_r1=with_r1)
    sync(m["G_L1"])
    jax.profiler.stop_trace()

    parsed = parse_trace(trace_dir, iters)
    if parsed is None:
        print("no trace captured (axon tunnel may not export device traces)")
        return
    print_profile(f"train step b{batch} remat>={remat_min} r1={with_r1} "
                  f"D={d_dtype}", parsed, top_n=30)


if __name__ == "__main__":
    main()
