"""Same-process A/B: filtered_lrelu impl 'auto' (banded-MXU kernel on the
routed layers, chunked custom_vjp) vs 'xla' (fused conv composition,
native jax.grad) in the FULL train step (D w/ R1 + G + EMA), bf16 both
nets, remat>=140.

Why this might differ from the forward A/B (which measured xla 76.1 vs
auto 75.8, ~neutral): in training the routed layers appear in the G
forward, the G backward (custom_vjp vs XLA conv-transpose — the 35 ms
'reverse' bucket), AND the remat recompute, so the wrapper's gather tax
triples while the kernel's fusion win also triples; the net sign is not
predictable from the forward number. Round-4 train profile attributes
91.5 ms/iter to Pallas custom-calls.

Run: python scripts/bench_train_impl.py [batch] [remat_min] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from afcm_tpu.utils.profiling import host_sync as sync  # noqa: E402


def make_model(batch, remat_min, shared_g_fwd=False, r1_interval=1):
    """The round-4 full-size AFCM training config, one source for every
    chip script (impl xla + upfirdn custom VJP come from the module
    defaults). shared_g_fwd=True is the shipped default
    (config/defaults.py tpu.shared_g_fwd); this A/B predates it and
    measures the two-forward base unless asked otherwise."""
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
                 compute_dtype="bfloat16")
    cfg = GANConfig(z_dim=512, c_dim=1, batch_size=batch,
                    blur_init_sigma=0.0, shared_g_fwd=shared_g_fwd,
                    r1_interval=r1_interval)
    return GANModel(build_generator(g_cfg), build_discriminator(d_cfg), cfg)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    remat_min = int(sys.argv[2]) if len(sys.argv) > 2 else 140
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    import importlib
    # the ops package re-exports the function under the same name; import
    # the module itself for the impl switch
    fl = importlib.import_module("afcm_tpu.ops.filtered_lrelu")

    rng = np.random.RandomState(0)
    batch_data = {
        "A": jnp.asarray(rng.randn(batch, 4, 256, 256).clip(-1, 1),
                         jnp.float32),
        "B": jnp.asarray(rng.randn(batch, 1, 256, 256).clip(-1, 1),
                         jnp.float32),
        "slice_idx": jnp.asarray(rng.rand(batch, 1), jnp.float32)}

    # Sequential bracketed legs (auto, xla, auto again): impl is read at
    # trace time from the module global; a fresh GANModel per leg forces a
    # retrace (train_step's jit cache keys on self). Each leg frees its
    # train state before the next compiles (two cannot coexist in HBM).
    times = {}
    for name, impl in (("auto", "auto"), ("xla", "xla"), ("auto2", "auto")):
        fl.set_default_impl(impl)
        model = make_model(batch, remat_min)
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
        times[name] = ts
        print(f"{name}: median {np.median(ts):7.1f} ms/step "
              f"(spread {min(ts):.1f}-{max(ts):.1f})", flush=True)
        del state, model, m

    a = np.median(times["auto"] + times["auto2"])
    x = np.median(times["xla"])
    print(f"\nauto(bracket) {a:.1f} ms vs xla {x:.1f} ms "
          f"-> xla is {a / x:.3f}x of auto", flush=True)


if __name__ == "__main__":
    main()
