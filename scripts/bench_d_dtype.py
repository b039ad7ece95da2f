"""Same-process A/B: discriminator compute dtype f32 vs bf16 in the full
train step (D w/ R1 + G + EMA), G bf16 in both legs.

Round-4 train-step profile finding: with only the generator switched to
bf16, every D-side conv (fwd, bwd, and the R1 double-grad) ran f32 with a
2x layout-padding expansion (f32[16,64,256,256] padded 2.0x). The
reference's own D carries per-block use_fp16 machinery
(CoModGAN/generator.py:625-638); this measures the TPU analog.

Run: python scripts/bench_d_dtype.py [batch] [remat_min] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from afcm_tpu.utils.profiling import host_sync as sync  # noqa: E402


def make_model(batch, remat_min, d_dtype):
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
    cfg = GANConfig(z_dim=512, c_dim=1, batch_size=batch,
                    blur_init_sigma=0.0)
    return GANModel(build_generator(g_cfg), build_discriminator(d_cfg), cfg)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    remat_min = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    rng = np.random.RandomState(0)
    batch_data = {
        "A": jnp.asarray(rng.randn(batch, 4, 256, 256).clip(-1, 1),
                         jnp.float32),
        "B": jnp.asarray(rng.randn(batch, 1, 256, 256).clip(-1, 1),
                         jnp.float32),
        "slice_idx": jnp.asarray(rng.rand(batch, 1), jnp.float32)}

    # Sequential legs (f32, bf16, f32 again to bracket tunnel drift): the
    # remat-200 program needs 15.3G HBM, so two resident train states
    # (+1.2G each) cannot coexist — each leg frees its state before the
    # next compiles. The repeated baseline leg is the drift control.
    times = {}
    for name, d_dtype in (("f32", "float32"), ("bf16", "bfloat16"),
                          ("f32b", "float32")):
        model = make_model(batch, remat_min, d_dtype)
        state = model.init_state(jax.random.PRNGKey(0), batch_data)
        state, m = model.train_step(state, batch_data, jax.random.PRNGKey(1),
                                    jnp.asarray(0.0), with_r1=True)
        sync(m["G_L1"])  # compile + warm
        print(f"{name}: compiled (G_L1={float(m['G_L1']):.3f} "
              f"D_real={float(m['D_real']):.3f})", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.time()
            for i in range(iters):
                state, m = model.train_step(state, batch_data,
                                            jax.random.PRNGKey(7 + i),
                                            jnp.asarray(0.0), with_r1=True)
            sync(m["G_L1"])
            ts.append((time.time() - t0) / iters * 1e3)
        times[name] = sorted(ts)
        del state, m, model
        ts = times[name]
        print(f"{name}: {np.median(ts):7.1f} ms/step "
              f"(spread {ts[0]:.1f}-{ts[-1]:.1f}) "
              f"= {batch / np.median(ts) * 1e3:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
