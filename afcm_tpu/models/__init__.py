"""Model registry: config -> GANModel assembly.

Mirrors the reference's `create_model` + `define_G`/`define_D` factories
(reference: models/__init__.py:54-67, models/utils.py:126-200) without the
import-by-convention reflection — the model families are a closed set.
"""

from __future__ import annotations

from typing import Any, Dict

from ..nn import CoModDiscriminator, CoModGenerator, Stylegan3Generator
from .gan_model import GANConfig, GANModel
from .losses import gan_loss
from .train_state import GANTrainState, ema_beta, ema_update, make_optimizer

_GENERATORS = {
    "stylegan3": Stylegan3Generator,
    "comodgan": CoModGenerator,
}

_SG3_SYNTH_KEYS = {
    "channel_base", "channel_max", "num_layers", "num_critical",
    "first_cutoff", "first_stopband", "last_stopband_rel", "margin_size",
    "output_scale", "dropout_rate", "skip_resolution", "cond_mod",
    "conv_kernel", "filter_size", "lrelu_upsampling", "use_radial_filters",
    "conv_clamp", "magnitude_ema_beta", "compute_dtype", "remat",
    "remat_min_size", "channel_align",
}
_COMOD_SYNTH_KEYS = {
    "channel_base", "channel_max", "dropout_rate", "skip_resolution",
    "channel_attention", "resample_filter", "architecture", "conv_clamp",
    "cond_mod",
}


def build_generator(g_cfg: Dict[str, Any]):
    g_cfg = dict(g_cfg)
    net_g = g_cfg.pop("netG")
    if net_g not in _GENERATORS:
        raise NotImplementedError(f"Generator model name [{net_g}] is not recognized")

    synthesis_kwargs = dict(g_cfg.pop("synthesis_kwargs", {}) or {})
    synth_name = synthesis_kwargs.pop("name", None)
    mapping_kwargs = dict(g_cfg.pop("mapping_kwargs", {}) or {})
    allowed = _SG3_SYNTH_KEYS if net_g == "stylegan3" else _COMOD_SYNTH_KEYS
    synthesis_kwargs = {k: v for k, v in synthesis_kwargs.items() if k in allowed}
    if net_g == "comodgan" and synth_name:
        synthesis_kwargs["name"] = synth_name
    if net_g == "stylegan3":
        mapping_kwargs = {k: v for k, v in mapping_kwargs.items()
                          if k in ("num_layers", "lr_multiplier", "w_avg_beta")}
    cls = _GENERATORS[net_g]
    return cls(z_dim=g_cfg["z_dim"], c_dim=g_cfg["c_dim"], w_dim=g_cfg["w_dim"],
               img_resolution=g_cfg["img_resolution"],
               img_channels_in=g_cfg["img_channels_in"],
               img_channels_out=g_cfg["img_channels_out"],
               mapping_kwargs=mapping_kwargs, synthesis_kwargs=synthesis_kwargs)


def build_discriminator(d_cfg: Dict[str, Any]):
    d_cfg = dict(d_cfg)
    net_d = d_cfg.pop("netD")
    if net_d != "comodgan":
        raise NotImplementedError(f"Discriminator model name [{net_d}] is not recognized")
    return CoModDiscriminator(
        c_dim=d_cfg.get("c_dim", 0),
        img_resolution=d_cfg["img_resolution"],
        img_channels=d_cfg["img_channels"],
        channel_base=d_cfg.get("channel_base", 32768),
        channel_max=d_cfg.get("channel_max", 512),
        conv_clamp=d_cfg.get("conv_clamp"),
        cmap_dim=d_cfg.get("cmap_dim"),
        mapping_kwargs=d_cfg.get("mapping_kwargs", {}),
        epilogue_kwargs=d_cfg.get("epilogue_kwargs", {}),
        compute_dtype=d_cfg.get("compute_dtype", "float32"))


def build_model(cfg):
    """Top-level model factory: dispatch on ``cfg.model.name``
    (reference: models/__init__.py:54-67 create_model). ``stylegan3`` and
    ``comodgan`` assemble the co-modulated GANModel; ``pix2pix`` the
    baseline conditional GAN."""
    name = getattr(cfg.model, "name", "stylegan3")
    if name == "pix2pix":
        from .pix2pix_model import build_pix2pix_model
        return build_pix2pix_model(cfg)
    if name in ("stylegan3", "comodgan"):
        return build_gan_model(cfg)
    raise NotImplementedError(f"model name [{name}] is not recognized")


def build_gan_model(cfg) -> GANModel:
    """Assemble a GANModel from a full config tree (see afcm_tpu.config)."""
    g_cfg = dict(cfg.model.G)
    d_cfg = dict(cfg.model.D)
    tpu_cfg = getattr(cfg, "tpu", None)
    compute_dtype = getattr(tpu_cfg, "compute_dtype", None)
    if g_cfg.get("netG") == "stylegan3":
        extra = {}
        if compute_dtype and compute_dtype != "float32":
            extra["compute_dtype"] = compute_dtype
        if getattr(tpu_cfg, "remat", False):
            extra["remat"] = True
            min_size = getattr(tpu_cfg, "remat_min_size", 0)
            if min_size:
                extra["remat_min_size"] = int(min_size)
        if extra:
            g_cfg["synthesis_kwargs"] = dict(
                g_cfg.get("synthesis_kwargs", {}) or {}, **extra)
    # tpu.compute_dtype drives BOTH nets: the D's block pyramid runs in the
    # same compute dtype (epilogue stays f32 — see CoModDiscriminator).
    # Found by the round-4 train-step profile: with only G switched, the D
    # fwd/bwd/R1 subgraphs ran f32 convs with 2x layout padding.
    if compute_dtype and compute_dtype != "float32" \
            and "compute_dtype" not in d_cfg:
        d_cfg["compute_dtype"] = compute_dtype
    generator = build_generator(g_cfg)
    discriminator = build_discriminator(d_cfg)
    gan_config = GANConfig(
        z_dim=g_cfg.get("z_dim", 512),
        c_dim=g_cfg.get("c_dim", 0),
        batch_size=cfg.loaders.batch_size,
        combine_ab=cfg.model.combine_ab,
        lambda_l1=cfg.loss.lambda_L1,
        lambda_r1=cfg.loss.lambda_r1,
        r1_interval=int(cfg.loss.get("r1_interval", 1)),
        lr_g=cfg.optimizer.lr_G,
        lr_d=cfg.optimizer.lr_D,
        ema_enabled=cfg.scheduler.ema.enabled,
        ema_kimgs=cfg.scheduler.ema.ema_kimgs,
        # the reference YAMLs write `ramp: None`, which YAML reads as a string
        ema_ramp=None if cfg.scheduler.ema.ramp in (None, "None") else
        cfg.scheduler.ema.ramp,
        blur_init_sigma=getattr(cfg.loss, "blur_init_sigma", 0.0),
        blur_fade_kimg=getattr(cfg.loss, "blur_fade_kimg", 0.0),
        shared_g_fwd=bool(cfg.tpu.get("shared_g_fwd", False))
        if hasattr(cfg, "tpu") else False)
    return GANModel(generator, discriminator, gan_config)


__all__ = [
    "GANConfig", "GANModel", "GANTrainState", "build_discriminator",
    "build_gan_model", "build_generator", "build_model", "ema_beta",
    "ema_update", "gan_loss", "make_optimizer",
]
