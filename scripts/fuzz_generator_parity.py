"""Randomized full-generator parity fuzz: Stylegan3Generator vs the
PyTorch reference across the constructor-knob space (resolution, layer
count, channel schedule, margins, skips, filter design, lrelu rates,
conditioning) — the breadth complement to tests/test_stylegan3_parity.py's
fixed config. Every config ports reference-initialized weights and
compares the full forward in fp32, which transitively verifies the whole
static layout/filter-design math for that config.

    python scripts/fuzz_generator_parity.py [n=20] [seed=0]

Exits 1 on any mismatch (config printed).

Last full runs: seeds 0/1/2 (5+30+30 = 65 random configs) — every config
instantiable by the reference forward-matches on ported weights (fp32,
rtol 5e-3 / atol 3e-4); zero skips, zero failures.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from afcm_tpu.nn import (CoModDiscriminator, CoModGenerator,  # noqa: E402
                         Stylegan3Generator)
from afcm_tpu.utils.port import state_dict_to_variables  # noqa: E402
from tests._torch_ref import load_reference_networks  # noqa: E402


def _sample_config(rng):
    img_resolution = int(rng.choice([32, 32, 64, 64, 128]))
    num_layers = int(rng.randint(4, 11))
    num_critical = int(rng.choice([1, 2]))
    cfg = dict(
        z_dim=int(rng.choice([32, 64])),
        c_dim=int(rng.choice([0, 1, 1])),
        w_dim=int(rng.choice([32, 64])),
        img_resolution=img_resolution,
        img_channels_in=int(rng.choice([1, 4])),
        img_channels_out=int(rng.choice([1, 3])),
    )
    synth = dict(
        channel_base=int(rng.choice([2048, 4096, 8192])),
        channel_max=int(rng.choice([32, 64, 128])),
        num_layers=num_layers,
        num_critical=min(num_critical, num_layers - 1),
        margin_size=int(rng.choice([4, 10])),
        output_scale=float(rng.choice([0.25, 1.0])),
        skip_resolution=int(rng.choice([0, 16, 32])),
        conv_clamp=256,
        cond_mod=True,
        filter_size=int(rng.choice([4, 6])),
        use_radial_filters=bool(rng.rand() < 0.3),
    )
    # None = reference default construction (the encoder-lrelu-at-1x
    # asymmetry quirk); explicit values are forwarded to both layer kinds
    # like the shipped AFCM configs do.
    lrelu_up = rng.choice([None, 1, 2, 4])
    if lrelu_up is not None:
        synth["lrelu_upsampling"] = int(lrelu_up)
    mapping = dict(num_layers=int(rng.choice([1, 2])))
    return cfg, synth, mapping


def _sample_comod_config(rng):
    cfg = dict(
        z_dim=int(rng.choice([32, 64])),
        c_dim=int(rng.choice([0, 1, 1])),
        w_dim=int(rng.choice([32, 64])),
        img_resolution=int(rng.choice([32, 32, 64])),
        img_channels_in=int(rng.choice([1, 4])),
        img_channels_out=int(rng.choice([1, 3])),
    )
    synth = dict(
        channel_base=int(rng.choice([2048, 4096, 8192])),
        channel_max=int(rng.choice([32, 64, 128])),
        skip_resolution=int(rng.choice([0, 16, 32])),
        cond_mod=bool(rng.rand() < 0.7),
        conv_clamp=None if rng.rand() < 0.5 else 256,
        channel_attention=bool(rng.rand() < 0.3),
        resample_filter=[1, 3, 3, 1] if rng.rand() < 0.7 else [1, 2, 1],
    )
    if rng.rand() < 0.25:
        # image->w mapper (reference: layers.py:619-664); ref_img drives ws
        mapping = dict(name="RefMappingNetwork",
                       img_resolution=cfg["img_resolution"],
                       img_channels=cfg["img_channels_out"],
                       channel_base=int(rng.choice([2048, 4096])),
                       channel_max=int(rng.choice([32, 64])))
        if rng.rand() < 0.3:
            mapping["resample_filter"] = [1, 2, 1]
    else:
        mapping = dict(name="MappingNetwork",
                       num_layers=int(rng.choice([1, 2])))
    return cfg, synth, mapping


def fuzz_comod(ref, rng, n, failures):
    """CoModGenerator constructor-space parity (reference:
    CoModGAN/generator.py:29-125 SynthesisNetwork + layers.py blocks)."""
    torch = ref["torch"]
    ok = skipped = 0
    for i in range(n):
        cfg, synth, mapping = _sample_comod_config(rng)
        torch.manual_seed(1000 + i)
        try:
            tgen = ref["comod_generator"].CoModGenerator(
                mapping_kwargs=dict(mapping),
                synthesis_kwargs=dict(name="SynthesisNetwork", **synth),
                **cfg).eval()
        except Exception:
            try:
                CoModGenerator(mapping_kwargs=dict(mapping),
                               synthesis_kwargs=dict(synth), **cfg)
            except Exception:
                skipped += 1
                continue
            failures.append((dict(cfg, **synth),
                             "reference ctor raised, ours did not"))
            continue

        res = cfg["img_resolution"]
        z = rng.randn(2, cfg["z_dim"]).astype(np.float32)
        c = rng.rand(2, cfg["c_dim"]).astype(np.float32)
        cond = rng.randn(2, cfg["img_channels_in"], res,
                         res).astype(np.float32).clip(-1, 1)
        ref_img = None
        if mapping.get("name") == "RefMappingNetwork":
            ref_img = rng.randn(2, mapping["img_channels"], res,
                                res).astype(np.float32).clip(-1, 1)
        t_ref = None if ref_img is None else torch.from_numpy(ref_img)
        with torch.no_grad():
            want = tgen(torch.from_numpy(z), torch.from_numpy(c),
                        torch.from_numpy(cond), ref_img=t_ref,
                        noise_mode="const").numpy()

        gen = CoModGenerator(mapping_kwargs=dict(mapping),
                             synthesis_kwargs=dict(synth), **cfg)
        variables = state_dict_to_variables(tgen.state_dict())
        got = np.asarray(gen.apply(variables, jnp.asarray(z),
                                   jnp.asarray(c), jnp.asarray(cond),
                                   ref_img=None if ref_img is None
                                   else jnp.asarray(ref_img),
                                   noise_mode="const"))
        label = dict(family="comod", mapper=mapping.get("name"),
                     **cfg, **synth)
        if got.shape != want.shape:
            failures.append((label, f"shape {got.shape} vs {want.shape}"))
            continue
        err = np.abs(want - got)
        tol = 5e-4 + 5e-3 * np.abs(want)
        if np.any(err > tol):
            failures.append(
                (label, f"max abs {err.max():.3e}, "
                        f"scale {np.abs(want).max():.3e}"))
        else:
            ok += 1
        print(f"[comod {i + 1}/{n}] ok={ok} skipped={skipped} "
              f"failed={len(failures)}", flush=True)
    return ok, skipped


def _sample_ca_config(rng):
    # ref_res is the REFERENCE's img_resolution; ours takes 2*ref_res (we fix
    # the reference's broken in/out contract: its pixel-shuffle tail emits 2x
    # the configured resolution — see ca_variants.py CASynthesisNetwork).
    ref_res = int(rng.choice([8, 16]))
    common = dict(
        w_dim=int(rng.choice([8, 16])),
        img_channels_in=int(rng.choice([1, 4])),
        img_channels_out=int(rng.choice([1, 3])),
        channel_base=int(rng.choice([512, 1024, 2048])),
        channel_max=int(rng.choice([16, 32])),
        skip_resolution=int(rng.choice([0, 4, 8, ref_res])),
        resample_filter=[1, 3, 3, 1] if rng.rand() < 0.7 else [1, 2, 1],
    )
    block = dict(
        architecture=str(rng.choice(["skip", "resnet"])),
        conv_clamp=None if rng.rand() < 0.5 else 256,
        cond_mod=bool(rng.rand() < 0.7),
        channel_attention=bool(rng.rand() < 0.3),
    )
    return ref_res, common, block


def fuzz_ca(ref, rng, n, failures):
    """CASynthesisNetwork constructor-space parity (reference:
    generator.py:338-443).  The reference net configured at R consumes and
    emits 2R images (its forward only type-checks at that size); ours is
    constructed at img_resolution=2R with the identical module tree."""
    torch = ref["torch"]
    from afcm_tpu.nn.ca_variants import CASynthesisNetwork
    ok = skipped = 0
    for i in range(n):
        ref_res, common, block = _sample_ca_config(rng)
        torch.manual_seed(3000 + i)
        try:
            tnet = ref["comod_generator"].CASynthesisNetwork(
                img_resolution=ref_res, **common, **block).eval()
        except Exception:
            skipped += 1
            continue

        net = CASynthesisNetwork(img_resolution=2 * ref_res, **common, **block)
        if net.num_ws != tnet.num_ws:
            failures.append((dict(family="ca", ref_res=ref_res, **common,
                                  **block),
                             f"num_ws {net.num_ws} vs {tnet.num_ws}"))
            continue
        b = 2
        ws = rng.randn(b, tnet.num_ws, common["w_dim"]).astype(np.float32)
        img = rng.randn(b, common["img_channels_in"], 2 * ref_res,
                        2 * ref_res).astype(np.float32).clip(-1, 1)
        with torch.no_grad():
            want = tnet(torch.from_numpy(ws), torch.from_numpy(img),
                        noise_mode="const").numpy()

        variables = state_dict_to_variables(tnet.state_dict())
        got = np.asarray(net.apply(variables, jnp.asarray(ws),
                                   jnp.asarray(img), noise_mode="const"))
        label = dict(family="ca", ref_res=ref_res, **common, **block)
        if got.shape != want.shape:
            failures.append((label, f"shape {got.shape} vs {want.shape}"))
            continue
        err = np.abs(want - got)
        tol = 5e-4 + 5e-3 * np.abs(want)
        if np.any(err > tol):
            failures.append(
                (label, f"max abs {err.max():.3e}, "
                        f"scale {np.abs(want).max():.3e}"))
        else:
            ok += 1
        print(f"[ca {i + 1}/{n}] ok={ok} skipped={skipped} "
              f"failed={len(failures)}", flush=True)
    return ok, skipped


def fuzz_cain(ref, rng, n, failures):
    """CAINSynthesisNetwork constructor-space parity (reference:
    generator.py:448-541 — pixel-shuffle head/tail, CASynthesisBlock
    residual groups, configurable CA reduction)."""
    torch = ref["torch"]
    from afcm_tpu.nn.ca_variants import CAINSynthesisNetwork
    ok = skipped = 0
    for i in range(n):
        cfg = dict(
            w_dim=int(rng.choice([8, 16])),
            img_resolution=int(rng.choice([16, 32])),
            img_channels_in=int(rng.choice([1, 4])),
            img_channels_out=1,
            depth=int(rng.choice([1, 2])),
            n_resgroups=int(rng.choice([1, 2])),
            n_resblocks=int(rng.choice([1, 2, 3])),
            reduction=int(rng.choice([2, 4])),
        )
        clamp = None if rng.rand() < 0.5 else 256
        torch.manual_seed(4000 + i)
        try:
            tnet = ref["comod_generator"].CAINSynthesisNetwork(
                conv_clamp=clamp, **cfg).eval()
        except Exception:
            skipped += 1
            continue

        net = CAINSynthesisNetwork(conv_clamp=clamp, **cfg)
        b = 2
        ws = rng.randn(b, tnet.num_ws, cfg["w_dim"]).astype(np.float32)
        img = rng.randn(b, cfg["img_channels_in"], cfg["img_resolution"],
                        cfg["img_resolution"]).astype(np.float32).clip(-1, 1)
        with torch.no_grad():
            want = tnet(torch.from_numpy(ws), torch.from_numpy(img),
                        noise_mode="const").numpy()

        variables = state_dict_to_variables(tnet.state_dict())
        got = np.asarray(net.apply(variables, jnp.asarray(ws),
                                   jnp.asarray(img), noise_mode="const"))
        label = dict(family="cain", conv_clamp=clamp, **cfg)
        if got.shape != want.shape:
            failures.append((label, f"shape {got.shape} vs {want.shape}"))
            continue
        err = np.abs(want - got)
        tol = 5e-4 + 5e-3 * np.abs(want)
        if np.any(err > tol):
            failures.append(
                (label, f"max abs {err.max():.3e}, "
                        f"scale {np.abs(want).max():.3e}"))
        else:
            ok += 1
        print(f"[cain {i + 1}/{n}] ok={ok} skipped={skipped} "
              f"failed={len(failures)}", flush=True)
    return ok, skipped


def _sample_disc_config(rng):
    cfg = dict(
        c_dim=int(rng.choice([0, 1, 1])),
        img_resolution=int(rng.choice([32, 32, 64])),
        img_channels=int(rng.choice([1, 2, 5])),
        architecture=str(rng.choice(["resnet", "resnet", "skip", "orig"])),
        channel_base=int(rng.choice([2048, 4096, 8192])),
        channel_max=int(rng.choice([32, 64, 128])),
        conv_clamp=None if rng.rand() < 0.5 else 256,
        cmap_dim=None if rng.rand() < 0.7 else 32,
    )
    block = {} if rng.rand() < 0.7 else dict(resample_filter=[1, 2, 1])
    mapping = dict(num_layers=int(rng.choice([1, 2])))
    epilogue = dict(
        mbstd_group_size=[None, 2, 4][int(rng.choice(3))],
        mbstd_num_channels=int(rng.choice([0, 1, 1])),
    )
    return cfg, block, mapping, epilogue


def fuzz_disc(ref, rng, n, failures):
    """CoModDiscriminator constructor-space parity (reference:
    CoModGAN/generator.py:613-836 — blocks, mbstd epilogue, cond mapping)."""
    torch = ref["torch"]
    ok = skipped = 0
    for i in range(n):
        cfg, block, mapping, epilogue = _sample_disc_config(rng)
        kwargs = dict(block_kwargs=dict(block),
                      mapping_kwargs=dict(mapping),
                      epilogue_kwargs=dict(epilogue))
        torch.manual_seed(2000 + i)
        try:
            tdisc = ref["comod_generator"].CoModDiscriminator(
                **kwargs, **cfg).eval()
        except Exception:
            try:
                CoModDiscriminator(**kwargs, **cfg)
            except Exception:
                skipped += 1
                continue
            failures.append((dict(cfg, **block, **epilogue),
                             "reference ctor raised, ours did not"))
            continue

        res = cfg["img_resolution"]
        img = rng.randn(4, cfg["img_channels"], res, res).astype(np.float32)
        c = rng.rand(4, cfg["c_dim"]).astype(np.float32)
        with torch.no_grad():
            want = tdisc(torch.from_numpy(img), torch.from_numpy(c)).numpy()

        disc = CoModDiscriminator(**kwargs, **cfg)
        variables = state_dict_to_variables(tdisc.state_dict())
        got = np.asarray(disc.apply(variables, jnp.asarray(img),
                                    jnp.asarray(c)))
        label = dict(family="disc", **cfg, **block, **epilogue)
        if got.shape != want.shape:
            failures.append((label, f"shape {got.shape} vs {want.shape}"))
            continue
        err = np.abs(want - got)
        tol = 5e-4 + 5e-3 * np.abs(want)
        if np.any(err > tol):
            failures.append(
                (label, f"max abs {err.max():.3e}, "
                        f"scale {np.abs(want).max():.3e}"))
        else:
            ok += 1
        print(f"[disc {i + 1}/{n}] ok={ok} skipped={skipped} "
              f"failed={len(failures)}", flush=True)
    return ok, skipped


def _sample_motion_config(rng):
    res = int(rng.choice([16, 32]))
    gen = dict(
        z_dim=int(rng.choice([8, 16])),
        c_dim=int(rng.choice([0, 1, 1])),
        w_dim=int(rng.choice([8, 16])),
        motion_v_dim=int(rng.choice([8, 16])),
        img_resolution=res,
        img_channels_in=int(rng.choice([1, 4])),
        img_channels_out=int(rng.choice([1, 3])),
        max_num_frames=int(rng.choice([8, 16])),
    )
    coord_emb = bool(rng.rand() < 0.7)
    synth = dict(
        channel_base=int(rng.choice([512, 1024, 2048])),
        channel_max=int(rng.choice([16, 32])),
        skip_resolution=int(rng.choice([0, 4, 16])),
        cond_mod=bool(rng.rand() < 0.7),
        conv_clamp=None if rng.rand() < 0.5 else 256,
        architecture=str(rng.choice(["skip", "resnet"])),
        global_enc=bool(rng.rand() < 0.5),
        # relative_enc without coord_emb crashes the reference forward
        # (time_encoder only constructed under coord_emb, generator.py:190)
        relative_enc=bool(coord_emb and rng.rand() < 0.4),
        coord_emb=coord_emb,
        comod_emb=bool(coord_emb and rng.rand() < 0.4),
    )
    motion = dict(
        motion_z_dim=int(rng.choice([4, 8])),
        motion_z_distance=int(rng.choice([1, 2, 4])),
        motion_kernel_size=int(rng.choice([2, 3])),
        time_encoder_kwargs=dict(dim=int(rng.choice([4, 8])),
                                 min_period_len=2,
                                 max_period_len=int(rng.choice([8, 16]))),
    )
    return gen, synth, motion


def fuzz_motion(ref, rng, n, failures):
    """StyleGANVGenerator constructor-space parity (reference:
    generator.py:130-295, 577-609 + motion.py 'conv' strategy).
    ``motion_z`` is supplied so the run is deterministic."""
    torch = ref["torch"]
    from afcm_tpu.nn.motion import StyleGANVGenerator
    ok = skipped = 0
    for i in range(n):
        gen_cfg, synth, motion = _sample_motion_config(rng)
        torch.manual_seed(5000 + i)
        b = 2
        frames = gen_cfg["max_num_frames"]
        traj_len = int(np.ceil((frames - 1) / motion["motion_z_distance"])) \
            + 2 + (motion["motion_kernel_size"] - 1) * 2
        t = rng.randint(0, frames - 1, size=(b, 1)).astype(np.float32)
        delta_t = rng.randint(0, frames - 1, size=(b, 1)).astype(np.float32)
        motion_z = rng.randn(b, traj_len,
                             motion["motion_z_dim"]).astype(np.float32)
        z = rng.randn(b, gen_cfg["z_dim"]).astype(np.float32)
        c = rng.rand(b, gen_cfg["c_dim"]).astype(np.float32)
        res = gen_cfg["img_resolution"]
        cond = rng.randn(b, gen_cfg["img_channels_in"], res,
                         res).astype(np.float32).clip(-1, 1)
        try:
            tgen = ref["comod_generator"].StyleGANVGenerator(
                mapping_kwargs=dict(name="MappingNetwork", num_layers=2),
                synthesis_kwargs=dict(name="MotionSynthesisNetwork", **synth),
                motion_mapping_kwargs=dict(motion), **gen_cfg).eval()
            with torch.no_grad():
                want = tgen(torch.from_numpy(z), torch.from_numpy(c),
                            torch.from_numpy(t), torch.from_numpy(delta_t),
                            torch.from_numpy(cond),
                            motion_z=torch.from_numpy(motion_z),
                            noise_mode="const").numpy()
        except Exception:
            skipped += 1
            continue

        gen = StyleGANVGenerator(mapping_kwargs=dict(num_layers=2),
                                 synthesis_kwargs=dict(synth),
                                 motion_mapping_kwargs=dict(motion), **gen_cfg)
        variables = state_dict_to_variables(tgen.state_dict())
        got = np.asarray(gen.apply(variables, jnp.asarray(z), jnp.asarray(c),
                                   jnp.asarray(t), jnp.asarray(delta_t),
                                   jnp.asarray(cond),
                                   motion_z=jnp.asarray(motion_z),
                                   noise_mode="const"))
        label = dict(family="motion", **gen_cfg, **synth)
        if got.shape != want.shape:
            failures.append((label, f"shape {got.shape} vs {want.shape}"))
            continue
        err = np.abs(want - got)
        tol = 5e-4 + 5e-3 * np.abs(want)
        if np.any(err > tol):
            failures.append(
                (label, f"max abs {err.max():.3e}, "
                        f"scale {np.abs(want).max():.3e}"))
        else:
            ok += 1
        print(f"[motion {i + 1}/{n}] ok={ok} skipped={skipped} "
              f"failed={len(failures)}", flush=True)
    return ok, skipped


def fuzz_motion_disc(ref, rng, n, failures):
    """StyleGANVDiscriminator constructor-space parity (reference:
    generator.py:840-930 — frame concat at concat_res, time conditioning)."""
    torch = ref["torch"]
    from afcm_tpu.nn.motion import StyleGANVDiscriminator
    ok = skipped = 0
    for i in range(n):
        cfg = dict(
            c_dim=int(rng.choice([0, 1])),
            img_resolution=int(rng.choice([32, 64])),
            img_channels=int(rng.choice([1, 2])),
            num_frames=int(rng.choice([2, 3])),
            channel_base=int(rng.choice([2048, 4096])),
            channel_max=int(rng.choice([32, 64])),
            conv_clamp=None if rng.rand() < 0.5 else 256,
            cmap_dim=None if rng.rand() < 0.7 else 16,
            num_frames_div_factor=int(rng.choice([1, 2])),
            max_num_frames=int(rng.choice([8, 16])),
            concat_res=int(rng.choice([8, 16])),
        )
        epilogue = dict(
            mbstd_group_size=[None, 2][int(rng.choice(2))],
            mbstd_num_channels=int(rng.choice([0, 1, 1])),
        )
        torch.manual_seed(6000 + i)
        b = 2
        res = cfg["img_resolution"]
        img = rng.randn(b, cfg["num_frames"] * cfg["img_channels"], res,
                        res).astype(np.float32)
        c = rng.rand(b, cfg["c_dim"]).astype(np.float32)
        delta_t = rng.randint(0, cfg["max_num_frames"] - 1,
                              size=(b, 1)).astype(np.float32)
        try:
            tdisc = ref["comod_generator"].StyleGANVDiscriminator(
                epilogue_kwargs=dict(epilogue), **cfg).eval()
            with torch.no_grad():
                want = tdisc(torch.from_numpy(img), torch.from_numpy(c),
                             torch.from_numpy(delta_t)).numpy()
        except Exception:
            skipped += 1
            continue

        disc = StyleGANVDiscriminator(epilogue_kwargs=dict(epilogue), **cfg)
        variables = state_dict_to_variables(tdisc.state_dict())
        got = np.asarray(disc.apply(variables, jnp.asarray(img),
                                    jnp.asarray(c), jnp.asarray(delta_t)))
        label = dict(family="motion_disc", **cfg, **epilogue)
        if got.shape != want.shape:
            failures.append((label, f"shape {got.shape} vs {want.shape}"))
            continue
        err = np.abs(want - got)
        tol = 5e-4 + 5e-3 * np.abs(want)
        if np.any(err > tol):
            failures.append(
                (label, f"max abs {err.max():.3e}, "
                        f"scale {np.abs(want).max():.3e}"))
        else:
            ok += 1
        print(f"[motion_disc {i + 1}/{n}] ok={ok} skipped={skipped} "
              f"failed={len(failures)}", flush=True)
    return ok, skipped


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    ref = load_reference_networks()
    torch = ref["torch"]
    rng = np.random.RandomState(seed)
    ok = skipped = 0
    failures = []
    for i in range(n):
        cfg, synth, mapping = _sample_config(rng)
        torch.manual_seed(i)
        try:
            tgen = ref["networks_stylegan3"].Stylegan3Generator(
                mapping_kwargs=dict(mapping), synthesis_kwargs=dict(synth),
                **cfg).eval()
        except Exception as exc:
            # config the reference itself rejects — ours must too
            try:
                Stylegan3Generator(mapping_kwargs=dict(mapping),
                                   synthesis_kwargs=dict(synth), **cfg)
            except Exception:
                skipped += 1
                continue
            # can't instantiate inputs to prove divergence; just record
            failures.append((dict(cfg, **synth),
                             f"reference ctor raised ({exc!r}), ours "
                             f"did not"))
            continue

        res = cfg["img_resolution"]
        z = rng.randn(2, cfg["z_dim"]).astype(np.float32)
        c = rng.rand(2, cfg["c_dim"]).astype(np.float32)
        cond = rng.randn(2, cfg["img_channels_in"], res,
                         res).astype(np.float32).clip(-1, 1)
        with torch.no_grad():
            want = tgen(torch.from_numpy(z), torch.from_numpy(c),
                        torch.from_numpy(cond)).numpy()

        gen = Stylegan3Generator(mapping_kwargs=dict(mapping),
                                 synthesis_kwargs=dict(synth), **cfg)
        variables = state_dict_to_variables(tgen.state_dict())
        got = np.asarray(gen.apply(variables, jnp.asarray(z),
                                   jnp.asarray(c), jnp.asarray(cond)))
        label = dict(cfg, **synth, mapping_layers=mapping["num_layers"])
        if got.shape != want.shape:
            failures.append((label, f"shape {got.shape} vs {want.shape}"))
            continue
        err = np.abs(want - got)
        tol = 3e-4 + 5e-3 * np.abs(want)
        if np.any(err > tol):
            failures.append(
                (label, f"max abs {err.max():.3e}, "
                        f"scale {np.abs(want).max():.3e}"))
        else:
            ok += 1
        print(f"[{i + 1}/{n}] ok={ok} skipped={skipped} "
              f"failed={len(failures)}", flush=True)

    cok, cskipped = fuzz_comod(ref, rng, n, failures)
    dok, dskipped = fuzz_disc(ref, rng, n, failures)
    aok, askipped = fuzz_ca(ref, rng, n, failures)
    iok, iskipped = fuzz_cain(ref, rng, n, failures)
    mok, mskipped = fuzz_motion(ref, rng, n, failures)
    vok, vskipped = fuzz_motion_disc(ref, rng, n, failures)
    print(f"\ngenerator parity fuzz: sg3 {ok} ok/{skipped} skipped, "
          f"comod {cok} ok/{cskipped} skipped, "
          f"disc {dok} ok/{dskipped} skipped, "
          f"ca {aok} ok/{askipped} skipped, "
          f"cain {iok} ok/{iskipped} skipped, "
          f"motion {mok} ok/{mskipped} skipped, "
          f"motion_disc {vok} ok/{vskipped} skipped, {len(failures)} failed")
    for label, msg in failures[:10]:
        print(f"  FAIL {msg}\n    {label}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
