"""Temporal (StyleGAN-V-style) variants (reference: CoModGAN/motion.py,
generator.py:130-295, 577-609, 840-930, layers.py:669-739).

These ship in the reference selectable via ``synthesis_kwargs.name`` /
``mapping_kwargs`` but are unused by the published configs; they are
implemented here for surface completeness.  The data-dependent trajectory
length of the reference is made static (derived from ``max_num_frames``) so
the graphs compile once.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .comodgan import EBlock, EFromRGB, SynthesisBlock
from .layers import Conv2dLayer, FullyConnected, _normal_init


# -- time encoders (reference: layers.py:669-739) ---------------------------


def construct_log_spaced_freqs(max_num_frames: int,
                               skip_small_t_freqs: int = 0) -> np.ndarray:
    time_resolution = 2 ** np.ceil(np.log2(max_num_frames))
    num_fourier_feats = int(np.ceil(np.log2(time_resolution)))
    powers = 2 ** np.arange(num_fourier_feats)
    powers = powers[:len(powers) - skip_small_t_freqs]
    fourier_coefs = powers[None].astype(np.float32) * np.pi
    return fourier_coefs / time_resolution


class FixedTimeEncoder(nn.Module):
    max_num_frames: int
    skip_small_t_freqs: int = 0

    def get_dim(self) -> int:
        return construct_log_spaced_freqs(
            self.max_num_frames, self.skip_small_t_freqs).shape[1] * 2

    @nn.compact
    def __call__(self, t):
        coefs = jnp.asarray(construct_log_spaced_freqs(
            self.max_num_frames, self.skip_small_t_freqs))
        t = t.reshape(-1).astype(jnp.float32)
        raw = coefs * t[:, None]
        return jnp.concatenate([jnp.sin(raw), jnp.cos(raw)], axis=1)


class _Embedding(nn.Module):
    """torch.nn.Embedding twin — param named ``weight`` so the state_dict
    key ``const_embed.weight`` ports mechanically."""

    num_embeddings: int
    features: int

    @nn.compact
    def __call__(self, idx):
        w = self.param("weight", _normal_init(1.0),
                       (self.num_embeddings, self.features))
        return w[idx]


class TemporalDifferenceEncoder(nn.Module):
    max_num_frames: int
    num_frames_per_video: int = 1
    d: int = 256

    def get_dim(self) -> int:
        return self.d + construct_log_spaced_freqs(
            self.max_num_frames).shape[1] * 2

    @nn.compact
    def __call__(self, delta_t):
        batch_size = delta_t.shape[0]
        t_diffs = delta_t.reshape(-1)
        const_embs = _Embedding(self.max_num_frames, self.d,
                                name="const_embed")(
            jnp.round(t_diffs.astype(jnp.float32)).astype(jnp.int32))
        fourier_embs = FixedTimeEncoder(self.max_num_frames,
                                        name="time_encoder")(t_diffs[:, None])
        out = jnp.concatenate([const_embs, fourier_embs], axis=1)
        return out.reshape(batch_size, -1)


# -- motion mapping (reference: motion.py) -----------------------------------


def construct_linspaced_frequencies(num_freqs: int, min_period_len: int,
                                    max_period_len: int) -> np.ndarray:
    freqs = 2 * np.pi / (2 ** np.linspace(np.log2(min_period_len),
                                          np.log2(max_period_len), num_freqs))
    return freqs[::-1].copy().astype(np.float32)[None]


class EqLRConv1d(nn.Module):
    """(reference: layers.py:167-209)"""

    in_features: int
    out_features: int
    kernel_size: int
    padding: int = 0
    activation: str = "linear"
    lr_multiplier: float = 1.0

    @nn.compact
    def __call__(self, x):
        # x: [N, C, L]
        w = self.param("weight", _normal_init(1.0 / self.lr_multiplier),
                       (self.out_features, self.in_features, self.kernel_size))
        b = self.param("bias", nn.initializers.zeros, (self.out_features,))
        weight_gain = self.lr_multiplier / np.sqrt(
            self.in_features * self.kernel_size)
        from jax import lax
        dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NCH", "OIH", "NCH"))
        y = lax.conv_general_dilated(
            x, (w * weight_gain).astype(x.dtype), (1,),
            ((self.padding, self.padding),), dimension_numbers=dn)
        y = y + (b * self.lr_multiplier)[None, :, None].astype(y.dtype)
        if self.activation == "lrelu":
            # strict > so d/dy at exactly 0 is the slope, like torch's
            # leaky_relu (see docs/performance.md round-3 subgradient note)
            y = jnp.where(y > 0, y, 0.2 * y)
        return y


class AlignedTimeEncoder(nn.Module):
    """(reference: motion.py:176-238)"""

    dim: int
    min_period_len: int
    max_period_len: int
    latent_dim: int = 512

    def get_dim(self) -> int:
        return self.dim * 2

    @nn.compact
    def __call__(self, t, motion_u_left, motion_u_right, interp_weights,
                 t_left, t_right):
        freqs = jnp.asarray(construct_linspaced_frequencies(
            self.dim, self.min_period_len, self.max_period_len))
        period_lens = 2 * np.pi / freqs
        phase_scales = self.max_period_len / period_lens

        bsz, nf, u_dim = motion_u_left.shape
        ul = motion_u_left.reshape(bsz * nf, u_dim)
        ur = motion_u_right.reshape(bsz * nf, u_dim)
        periods = jnp.tanh(FullyConnected(self.latent_dim, self.dim,
                                          use_bias=False,
                                          name="periods_predictor")(ul)) + 1
        phases = FullyConnected(self.latent_dim, self.dim, use_bias=False,
                                name="phase_predictor")(ul)
        aligner = FullyConnected(self.latent_dim, self.dim * 2, use_bias=False,
                                 name="aligners_predictor")
        aligners_left = aligner(ul)
        aligners_right = aligner(ur)

        def pos_emb(time):
            raw = freqs * periods * time.reshape(-1)[:, None] + \
                phases * phase_scales
            return jnp.concatenate([jnp.sin(raw), jnp.cos(raw)], axis=1)

        pos_embs = pos_emb(t.astype(jnp.float32))
        pos_l = pos_emb(t_left.astype(jnp.float32))
        pos_r = pos_emb(t_right.astype(jnp.float32))
        w = interp_weights.reshape(-1, 1)
        aligners_remove = pos_l * (1 - w) + pos_r * w
        aligners_add = aligners_left * (1 - w) + aligners_right * w
        return pos_embs - aligners_remove + aligners_add


class _MotionConvStack(nn.Module):
    """The reference's ``self.conv = nn.Sequential(...)`` (motion.py:67-73) —
    children named ``0``/``1`` so ``conv.0.weight`` ports mechanically."""

    motion_z_dim: int
    motion_v_dim: int
    kernel_size: int

    @nn.compact
    def __call__(self, h):
        h = EqLRConv1d(self.motion_z_dim, self.motion_z_dim, self.kernel_size,
                       activation="lrelu", lr_multiplier=0.01, name="0")(h)
        h = EqLRConv1d(self.motion_z_dim, self.motion_v_dim, self.kernel_size,
                       activation="lrelu", lr_multiplier=0.01, name="1")(h)
        return h


class MotionMappingNetwork(nn.Module):
    """Trajectory-noise -> motion codes (reference: motion.py:19-170).

    Implements the 'conv' generation strategy (the reference's recommended
    path — its own comments note the LSTM diverges for large t)."""

    max_num_frames: int
    motion_v_dim: int
    motion_z_dim: int
    motion_z_distance: int
    motion_kernel_size: int
    fourier: bool = True
    time_encoder_kwargs: Any = None

    @property
    def num_additional_codes(self) -> int:
        return (self.motion_kernel_size - 1) * 2

    def max_traj_len(self) -> int:
        max_t = self.max_num_frames - 1
        return int(np.ceil(max_t / self.motion_z_distance)) + 2 + \
            self.num_additional_codes

    @nn.compact
    def __call__(self, t, motion_z=None) -> Dict[str, jnp.ndarray]:
        assert t.ndim == 2
        batch_size, num_frames = t.shape
        traj_len = self.max_traj_len()

        if motion_z is None:
            motion_z = jax.random.normal(
                self.make_rng("noise"),
                (batch_size, traj_len, self.motion_z_dim))
        trajs = motion_z

        h = jnp.transpose(trajs, (0, 2, 1))
        h = _MotionConvStack(self.motion_z_dim, self.motion_v_dim,
                             self.motion_kernel_size, name="conv")(h)
        trajs = jnp.transpose(h, (0, 2, 1))

        left_idx = jnp.floor(t / self.motion_z_distance).astype(jnp.int32)
        batch_idx = jnp.arange(batch_size)[:, None]
        u_left = trajs[batch_idx, left_idx]
        u_right = trajs[batch_idx, left_idx + 1]
        t_left = t - t % self.motion_z_distance
        t_right = t_left + self.motion_z_distance
        w = ((t % self.motion_z_distance) /
             self.motion_z_distance)[..., None].astype(jnp.float32)
        motion_u = (u_left * (1 - w) + u_right * w).reshape(
            batch_size * num_frames, -1)

        if self.fourier:
            motion_v = AlignedTimeEncoder(
                latent_dim=self.motion_v_dim, name="time_encoder",
                **(dict(self.time_encoder_kwargs or {})))(
                t, u_left, u_right, w, t_left, t_right)
        else:
            from .mapping import MappingNetwork
            motion_v = MappingNetwork(z_dim=self.motion_z_dim, c_dim=0,
                                      w_dim=self.motion_v_dim, num_ws=None,
                                      num_layers=2, w_avg_beta=None,
                                      name="mapping")(motion_u)
        return {"motion_v": motion_v, "motion_z": motion_z}


# -- motion synthesis network (reference: generator.py:130-295) -------------


class MotionSynthesisNetwork(nn.Module):
    w_dim: int
    motion_v_dim: int
    img_resolution: int
    img_channels_in: int
    img_channels_out: int
    channel_base: int = 32768
    channel_max: int = 512
    dropout_rate: float = 0.5
    skip_resolution: int = 256
    global_enc: bool = False
    relative_enc: bool = False
    coord_emb: bool = True
    comod_emb: bool = False
    max_num_frames: int = 128
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    architecture: str = "skip"
    conv_clamp: Optional[float] = None
    cond_mod: bool = False

    def channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)

    @property
    def block_resolutions(self) -> List[int]:
        log2res = int(np.log2(self.img_resolution))
        return [2 ** i for i in range(2, log2res + 1)]

    @property
    def early_channels(self) -> int:
        early = self.channels(4)
        if self.coord_emb:
            if self.global_enc:
                early += self.motion_v_dim
            if self.relative_enc:
                early += 256 + construct_log_spaced_freqs(
                    self.max_num_frames).shape[1] * 2
            else:
                early += 1
        return early

    @property
    def global_w_dim(self) -> int:
        # Mirrors the reference exactly (generator.py:196-199), including the
        # coord_emb=False + comod_emb=True adjustment — note that combo only
        # type-checks at runtime for some enc flags in the reference too.
        if self.comod_emb:
            gw = self.channels(4) + self.early_channels
            if not self.coord_emb:
                gw += self.motion_v_dim
            return gw
        return self.channels(4) * 2

    @property
    def num_ws(self) -> int:
        n = 1
        for res in self.block_resolutions[1:]:
            n += 2
            if res == self.img_resolution:
                n += 1
        return n

    @property
    def skip_connects(self) -> List[bool]:
        log2res = int(np.log2(self.img_resolution))
        if self.skip_resolution >= 4:
            final_skip = int(np.log2(self.skip_resolution))
            return [True] * (final_skip - 1) + [False] * (log2res - final_skip)
        return [False] * log2res

    @nn.compact
    def __call__(self, ws, img_in, motion: Dict, delta_t, train: bool = False,
                 noise_mode: str = "random"):
        ws = ws.astype(jnp.float32)
        log2res = int(np.log2(self.img_resolution))
        ch4 = self.channels(4)

        e_features: Dict[int, jnp.ndarray] = {}
        x = None
        img = img_in
        for res in range(log2res, 2, -1):
            if res == log2res:
                img = EFromRGB(self.img_channels_in, self.channels(2 ** res),
                               name="e_fromrgb")(x, img)
            img, feat = EBlock(self.channels(2 ** res),
                               self.channels(2 ** res // 2),
                               resample_filter=self.resample_filter,
                               name=f"e_b{res}")(img)
            e_features[2 ** res] = feat

        img = Conv2dLayer(ch4, ch4, kernel_size=3, activation="lrelu",
                          name="e_4x4")(img)
        e_features[4] = img
        pooled = FullyConnected(ch4 * 16, ch4 * 2, activation="lrelu",
                                name="fc_in")(img.reshape(img.shape[0], -1))
        pooled = nn.Dropout(rate=self.dropout_rate,
                            deterministic=not train)(pooled)
        img_global = pooled
        seed = FullyConnected(ch4 * 2, ch4 * 16, activation="lrelu",
                              name="fc_out")(pooled)
        seed = seed.reshape(-1, ch4, 4, 4)
        if self.skip_connects[0]:
            seed = seed + e_features[4]

        position_emb = []
        t_embs = None
        if self.global_enc:
            position_emb.append(motion["motion_v"])
        if self.relative_enc:
            t_embs = TemporalDifferenceEncoder(self.max_num_frames,
                                               name="time_encoder")(delta_t)
            position_emb.append(t_embs)
        else:
            position_emb.append(delta_t)
        position_emb = jnp.concatenate(position_emb, axis=-1)

        if self.coord_emb:
            def tile(v):
                return jnp.tile(v[:, :, None, None],
                                (1, 1, seed.shape[2], seed.shape[3]))
            if self.global_enc:
                seed = jnp.concatenate([seed, tile(motion["motion_v"])], axis=1)
            if self.relative_enc:
                seed = jnp.concatenate([seed, tile(t_embs)], axis=1)
            else:
                seed = jnp.concatenate([seed, tile(delta_t)], axis=1)

        if self.comod_emb:
            img_global = jnp.concatenate([img_global, position_emb], axis=-1)

        block_kwargs = dict(w_dim=self.w_dim, global_w_dim=self.global_w_dim,
                            img_channels=self.img_channels_out,
                            architecture=self.architecture,
                            resample_filter=self.resample_filter,
                            conv_clamp=self.conv_clamp, cond_mod=self.cond_mod)
        w_idx = 0
        # early_channels is passed unconditionally like the reference
        # (generator.py:204) — without coord_emb it equals ch4 == out_channels
        # so conv1's in-width is the same either way.
        block = SynthesisBlock(0, ch4, resolution=4, is_last=False,
                               early_channels=self.early_channels,
                               name="block_early", **block_kwargs)
        x, img = block(seed, None, ws[:, w_idx:w_idx + 1], img_global,
                       noise_mode=noise_mode)
        w_idx += block.num_conv
        for res, skip in zip(self.block_resolutions[1:], self.skip_connects[1:]):
            block = SynthesisBlock(self.channels(res // 2), self.channels(res),
                                   resolution=res,
                                   is_last=(res == self.img_resolution),
                                   name=f"b{res}", **block_kwargs)
            x, img = block(x, img,
                           ws[:, w_idx:w_idx + block.num_conv + block.num_torgb],
                           img_global, x_skip=e_features.get(res),
                           include_skip=skip, noise_mode=noise_mode)
            w_idx += block.num_conv
        return img


class StyleGANVGenerator(nn.Module):
    """(reference: generator.py:577-609)"""

    z_dim: int
    c_dim: int
    w_dim: int
    motion_v_dim: int
    img_resolution: int
    img_channels_in: int
    img_channels_out: int
    max_num_frames: int = 8
    mapping_kwargs: Any = None
    synthesis_kwargs: Any = None
    motion_mapping_kwargs: Any = None

    def setup(self):
        synthesis_kwargs = dict(self.synthesis_kwargs or {})
        synthesis_kwargs.pop("name", None)
        self.synthesis = MotionSynthesisNetwork(
            w_dim=self.w_dim, motion_v_dim=self.motion_v_dim,
            img_resolution=self.img_resolution,
            img_channels_in=self.img_channels_in,
            img_channels_out=self.img_channels_out,
            max_num_frames=self.max_num_frames, **synthesis_kwargs)
        from .mapping import MappingNetwork
        mapping_kwargs = dict(self.mapping_kwargs or {})
        mapping_kwargs.pop("name", None)
        mapping_kwargs = {k: v for k, v in mapping_kwargs.items()
                          if k in ("num_layers", "lr_multiplier", "w_avg_beta")}
        mapping_kwargs.setdefault("num_layers", 8)
        self.mapping = MappingNetwork(z_dim=self.z_dim, c_dim=self.c_dim,
                                      w_dim=self.w_dim,
                                      num_ws=self.synthesis.num_ws,
                                      **mapping_kwargs)
        motion_mapping_kwargs = dict(self.motion_mapping_kwargs or {})
        motion_mapping_kwargs.setdefault("motion_v_dim", self.motion_v_dim)
        self.motion_mapping = MotionMappingNetwork(
            max_num_frames=self.max_num_frames, **motion_mapping_kwargs)

    def __call__(self, z, c, t, delta_t, cond_img, motion_z=None,
                 ref_img=None, train: bool = False, noise_mode: str = "random"):
        ws = self.mapping(z, c, update_w_avg=train)
        motion_info = self.motion_mapping(t, motion_z=motion_z)
        return self.synthesis(ws, cond_img, motion_info, delta_t, train=train,
                              noise_mode=noise_mode)


class StyleGANVDiscriminator(nn.Module):
    """Time-conditioned D with frame concatenation at ``concat_res``
    (reference: generator.py:840-930)."""

    c_dim: int
    img_resolution: int
    img_channels: int
    num_frames: int = 3
    architecture: str = "resnet"
    channel_base: int = 32768
    channel_max: int = 512
    conv_clamp: Optional[float] = None
    cmap_dim: Optional[int] = None
    num_frames_div_factor: int = 4
    max_num_frames: int = 128
    concat_res: int = 16
    block_kwargs: Any = None
    mapping_kwargs: Any = None
    epilogue_kwargs: Any = None

    def channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)

    @nn.compact
    def __call__(self, img, c, delta_t):
        from .discriminator import DiscriminatorBlock, DiscriminatorEpilogue
        from .mapping import MappingNetwork

        log2res = int(np.log2(self.img_resolution))
        block_resolutions = [2 ** i for i in range(log2res, 2, -1)]
        cmap_dim = self.cmap_dim if self.cmap_dim is not None else self.channels(4)

        t_enc = TemporalDifferenceEncoder(self.max_num_frames,
                                          name="time_encoder")
        t_embs = t_enc(delta_t)
        c = jnp.concatenate([c, t_embs], axis=1) if c is not None else t_embs

        img = img.reshape(-1, self.img_channels, *img.shape[-2:])
        x = None
        for res in block_resolutions:
            in_channels = self.channels(res) if res < self.img_resolution else 0
            tmp_channels = self.channels(res)
            out_channels = self.channels(res // 2)
            if res // 2 == self.concat_res:
                out_channels //= self.num_frames_div_factor
            if res == self.concat_res:
                in_channels = tmp_channels = \
                    (in_channels // self.num_frames_div_factor) * self.num_frames
                x = x.reshape(-1, self.num_frames, *x.shape[1:])
                x = x.reshape(x.shape[0], -1, *x.shape[3:])
            x, img = DiscriminatorBlock(
                in_channels, tmp_channels, out_channels, resolution=res,
                img_channels=self.img_channels, architecture=self.architecture,
                conv_clamp=self.conv_clamp, name=f"b{res}",
                **dict(self.block_kwargs or {}))(x, img)

        mapping_kwargs = dict(self.mapping_kwargs or {})
        mapping_kwargs.setdefault("num_layers", 8)
        cmap = MappingNetwork(z_dim=0, c_dim=c.shape[1], w_dim=cmap_dim,
                              num_ws=None, w_avg_beta=None,
                              name="mapping", **mapping_kwargs)(None, c)
        return DiscriminatorEpilogue(self.channels(4), cmap_dim=cmap_dim,
                                     resolution=4,
                                     img_channels=self.img_channels,
                                     architecture=self.architecture,
                                     conv_clamp=self.conv_clamp,
                                     name="b4",
                                     **dict(self.epilogue_kwargs or {}))(
            x, img, cmap)
