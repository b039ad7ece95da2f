"""AFCM alias-free generator (StyleGAN3 branch), TPU-native.

Architecture reproduced from the reference (models/networks/stylegan3/
networks_stylegan3.py): a U-shaped network of 14 alias-free EncoderLayers
feeding (a) per-resolution skip features and (b) a 1024-d global
co-modulation vector, followed by 15 alias-free SynthesisLayers whose affine
styles condition on ``concat(w, global)``.

TPU-first design decisions:
  * All geometry (cutoffs, sampling rates, paddings, filter taps, skip
    wiring) is computed once in numpy at construction -> the traced graph has
    static shapes and constant filters; XLA sees one straight-line program.
  * `modulated_conv2d` uses the scale-activation factorization (MXU-dense,
    no batch-grouped conv) and `filtered_lrelu` lowers to fused
    lhs-dilated convolutions (see afcm_tpu.ops).
  * The E_features dict of the reference becomes a statically-wired list of
    (encoder index -> decoder layer) skip edges resolved at build time.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import (design_lowpass_filter, filtered_lrelu, modulated_conv2d,
                   setup_filter)
from ..ops.modulated_conv import conv2d
from .layers import (Conv2dLayer, FullyConnected, _normal_init,
                     adaptive_avg_pool2d)
from .mapping import MappingNetwork

# ---------------------------------------------------------------------------
# Static layout


@dataclasses.dataclass(frozen=True)
class LayerSpec:
    in_channels: int
    out_channels: int
    in_size: int
    out_size: int
    in_sampling_rate: int
    out_sampling_rate: int
    in_cutoff: float
    out_cutoff: float
    in_half_width: float
    out_half_width: float
    is_torgb: bool = False
    is_critically_sampled: bool = False


@dataclasses.dataclass(frozen=True)
class SynthesisLayout:
    """Static wiring of the AFCM U-net (reference: networks_stylegan3.py:555-705)."""

    encoder_specs: Tuple[LayerSpec, ...]
    decoder_specs: Tuple[LayerSpec, ...]
    # encoder index -> skip key (output size) recorded after that layer
    encoder_records: Tuple[Tuple[int, int], ...]
    # decoder index -> skip key, or None (already folds in skip_connects)
    decoder_skips: Tuple[Optional[int], ...]
    bottleneck_channels: int
    num_ws: int
    margin_size: int
    output_scale: float


def compute_synthesis_layout(img_resolution: int, img_channels_in: int,
                             img_channels_out: int, channel_base: int,
                             channel_max: int, num_layers: int,
                             num_critical: int, first_cutoff: float,
                             first_stopband: float, last_stopband_rel: float,
                             margin_size: int, output_scale: float,
                             skip_resolution: int,
                             channel_align: int = 1) -> SynthesisLayout:
    # Geometric progression of cutoffs / stopbands
    # (reference: networks_stylegan3.py:595-611).
    last_cutoff = img_resolution / 2
    last_stopband = last_cutoff * last_stopband_rel
    exponents = np.minimum(np.arange(num_layers + 1) / (num_layers - num_critical), 1)
    cutoffs = first_cutoff * (last_cutoff / first_cutoff) ** exponents
    stopbands = first_stopband * (last_stopband / first_stopband) ** exponents
    sampling_rates = np.exp2(np.ceil(np.log2(np.minimum(stopbands * 2, img_resolution))))
    half_widths = np.maximum(stopbands, sampling_rates / 2) - cutoffs
    sizes = sampling_rates + margin_size * 2
    sizes_enc = sizes.copy()
    sizes[-2:] = img_resolution
    channels = np.rint(np.minimum((channel_base / 2) / cutoffs, channel_max))
    if channel_align > 1:
        # TPU-friendly channel rounding (sublane/lane alignment). The
        # reference schedule yields counts like 91/181/362 whose layouts pad
        # by up to 1.4x on TPU; aligning trades a little extra capacity for
        # dense tiles. Not checkpoint-compatible with the reference when set.
        channels = np.ceil(channels / channel_align) * channel_align
        channels = np.minimum(channels, channel_max)
    channels[-1] = img_channels_out

    log2res = int(np.log2(img_resolution))
    if skip_resolution >= 4:
        final_skip = int(np.log2(skip_resolution))
        skip_connects = [True] * (final_skip - 1) + [False] * (log2res - final_skip)
    else:
        skip_connects = [False] * log2res

    # Encoder: reversed schedule (reference: networks_stylegan3.py:613-633).
    encoder_specs: List[LayerSpec] = []
    encoder_records: List[Tuple[int, int]] = []
    for idx in range(num_layers):
        rev_idx = num_layers - idx - 1
        prev = max(idx - 1, 0)
        rev_prev = num_layers - prev - 1
        encoder_specs.append(LayerSpec(
            in_channels=img_channels_in if idx == 0 else int(channels[rev_prev]),
            out_channels=int(channels[rev_idx]),
            in_size=int(sizes_enc[rev_prev]), out_size=int(sizes_enc[rev_idx]),
            in_sampling_rate=int(sampling_rates[rev_prev]),
            out_sampling_rate=int(sampling_rates[rev_idx]),
            in_cutoff=float(cutoffs[rev_prev]), out_cutoff=float(cutoffs[rev_idx]),
            in_half_width=float(half_widths[rev_prev]),
            out_half_width=float(half_widths[rev_idx]),
            is_critically_sampled=(idx < num_layers - num_critical)))
        # Skip-feature recording condition (reference: networks_stylegan3.py:679-680).
        if sizes[rev_idx] != sizes[rev_prev] and sizes[rev_prev] != sizes[0]:
            encoder_records.append((idx, int(sizes[rev_idx])))

    # Decoder (reference: networks_stylegan3.py:648-664, skip logic 689-698).
    decoder_specs: List[LayerSpec] = []
    decoder_skips: List[Optional[int]] = []
    res_idx = 1
    for idx in range(num_layers + 1):
        prev = max(idx - 1, 0)
        is_torgb = (idx == num_layers)
        decoder_specs.append(LayerSpec(
            in_channels=int(channels[prev]), out_channels=int(channels[idx]),
            in_size=int(sizes[prev]), out_size=int(sizes[idx]),
            in_sampling_rate=int(sampling_rates[prev]),
            out_sampling_rate=int(sampling_rates[idx]),
            in_cutoff=float(cutoffs[prev]), out_cutoff=float(cutoffs[idx]),
            in_half_width=float(half_widths[prev]),
            out_half_width=float(half_widths[idx]),
            is_torgb=is_torgb,
            is_critically_sampled=(idx >= num_layers - num_critical)))
        nxt = min(idx + 1, num_layers)
        if sizes[idx] != sizes[nxt] and sizes[idx] != sizes[0]:
            include = skip_connects[res_idx]
            res_idx += 1
        else:
            include = False
        decoder_skips.append(int(sizes[idx]) if include else None)

    # Every decoder skip key must be produced by an encoder record with
    # matching channel count.
    recorded = {key: encoder_specs[i].out_channels for i, key in encoder_records}
    for spec, key in zip(decoder_specs, decoder_skips):
        if key is not None:
            assert key in recorded, f"skip key {key} never recorded by encoder"
            assert recorded[key] == spec.out_channels, (
                f"skip channel mismatch at {key}: {recorded[key]} vs {spec.out_channels}")

    return SynthesisLayout(
        encoder_specs=tuple(encoder_specs), decoder_specs=tuple(decoder_specs),
        encoder_records=tuple(encoder_records), decoder_skips=tuple(decoder_skips),
        bottleneck_channels=int(channels[0]), num_ws=num_layers + 2,
        margin_size=margin_size, output_scale=output_scale)


def _design_layer_filters(spec: LayerSpec, is_torgb: bool, filter_size: int,
                          lrelu_upsampling: int, use_radial_filters: bool):
    """Up/down filter taps + padding for one alias-free layer
    (reference: networks_stylegan3.py:313-334)."""
    tmp_rate = max(spec.in_sampling_rate, spec.out_sampling_rate) * \
        (1 if is_torgb else lrelu_upsampling)
    up_factor = int(np.rint(tmp_rate / spec.in_sampling_rate))
    assert spec.in_sampling_rate * up_factor == tmp_rate
    up_taps = filter_size * up_factor if up_factor > 1 and not is_torgb else 1
    up_filter = design_lowpass_filter(
        numtaps=up_taps, cutoff=spec.in_cutoff, width=spec.in_half_width * 2,
        fs=tmp_rate)

    down_factor = int(np.rint(tmp_rate / spec.out_sampling_rate))
    assert spec.out_sampling_rate * down_factor == tmp_rate
    down_taps = filter_size * down_factor if down_factor > 1 and not is_torgb else 1
    down_radial = use_radial_filters and not spec.is_critically_sampled
    down_filter = design_lowpass_filter(
        numtaps=down_taps, cutoff=spec.out_cutoff,
        width=spec.out_half_width * 2, fs=tmp_rate, radial=down_radial)

    conv_kernel = 1 if is_torgb else 3
    in_size = np.broadcast_to(np.asarray(spec.in_size), (2,))
    out_size = np.broadcast_to(np.asarray(spec.out_size), (2,))
    pad_total = (out_size - 1) * down_factor + 1
    pad_total -= (in_size + conv_kernel - 1) * up_factor
    pad_total += up_taps + down_taps - 2
    pad_lo = (pad_total + up_factor) // 2
    pad_hi = pad_total - pad_lo
    padding = (int(pad_lo[0]), int(pad_hi[0]), int(pad_lo[1]), int(pad_hi[1]))
    return up_filter, down_filter, up_factor, down_factor, padding


# ---------------------------------------------------------------------------
# Layers


class EncoderLayer(nn.Module):
    """Alias-free encoder layer: conv3x3 -> filtered lrelu (+resampling).

    Reference: networks_stylegan3.py:416-549.  Note the reference passes the
    synthesis ``lrelu_upsampling`` (2) to the encoder as well, so encoder
    lrelus also run at the doubled temporary rate.
    """

    spec: LayerSpec
    conv_kernel: int = 3
    filter_size: int = 6
    lrelu_upsampling: int = 2
    use_radial_filters: bool = False
    conv_clamp: Optional[float] = 256
    magnitude_ema_beta: float = 0.999

    @nn.compact
    def __call__(self, x, update_emas: bool = False):
        spec = self.spec
        assert x.shape[1:] == (spec.in_channels, spec.in_size, spec.in_size), \
            f"EncoderLayer: got {x.shape}, want {spec}"
        up_filter, down_filter, up, down, padding = _design_layer_filters(
            spec, is_torgb=False, filter_size=self.filter_size,
            lrelu_upsampling=self.lrelu_upsampling,
            use_radial_filters=self.use_radial_filters)

        magnitude_ema = self.variable("moments", "magnitude_ema",
                                      lambda: jnp.ones(()))
        if update_emas:
            mag = jnp.mean(jnp.square(jax.lax.stop_gradient(x).astype(jnp.float32)))
            magnitude_ema.value = mag + (magnitude_ema.value - mag) * self.magnitude_ema_beta

        k = self.conv_kernel
        w = self.param("weight", _normal_init(1.0),
                       (spec.out_channels, spec.in_channels, k, k))
        weight_gain = 1 / np.sqrt(spec.in_channels * k * k)
        b = self.param("bias", nn.initializers.zeros, (spec.out_channels,))

        x = conv2d(x, w.astype(x.dtype) * weight_gain, padding=k - 1)
        x = filtered_lrelu(x, fu=up_filter, fd=down_filter, b=b.astype(x.dtype),
                           up=up, down=down, padding=padding,
                           gain=np.sqrt(2), slope=0.2, clamp=self.conv_clamp)
        assert x.shape[1:] == (spec.out_channels, spec.out_size, spec.out_size)
        return x


class SynthesisLayer(nn.Module):
    """Alias-free modulated layer with global co-modulation.

    Reference: networks_stylegan3.py:252-379.  The affine input is
    ``concat(w, global_w)`` when ``cond_mod`` — this is the AFCM graft.
    """

    spec: LayerSpec
    w_dim: int
    global_w_dim: int
    cond_mod: bool = True
    conv_kernel: int = 3
    filter_size: int = 6
    lrelu_upsampling: int = 2
    use_radial_filters: bool = False
    conv_clamp: Optional[float] = 256
    magnitude_ema_beta: float = 0.999

    @nn.compact
    def __call__(self, w, x, global_w, x_skip=None, update_emas: bool = False):
        spec = self.spec
        assert x.shape[1:] == (spec.in_channels, spec.in_size, spec.in_size), \
            f"SynthesisLayer: got {x.shape}, want {spec}"
        is_torgb = spec.is_torgb
        up_filter, down_filter, up, down, padding = _design_layer_filters(
            spec, is_torgb=is_torgb, filter_size=self.filter_size,
            lrelu_upsampling=self.lrelu_upsampling,
            use_radial_filters=self.use_radial_filters)

        magnitude_ema = self.variable("moments", "magnitude_ema",
                                      lambda: jnp.ones(()))
        if update_emas:
            mag = jnp.mean(jnp.square(jax.lax.stop_gradient(x).astype(jnp.float32)))
            magnitude_ema.value = mag + (magnitude_ema.value - mag) * self.magnitude_ema_beta
        input_gain = jax.lax.rsqrt(magnitude_ema.value)

        if self.cond_mod:
            w = jnp.concatenate([w, global_w], axis=1)
        affine_in = self.w_dim + (self.global_w_dim if self.cond_mod else 0)
        styles = FullyConnected(affine_in, spec.in_channels, bias_init=1.0,
                                name="affine")(w)
        if is_torgb:
            styles = styles * (1 / np.sqrt(spec.in_channels * self.conv_kernel_eff ** 2))

        k = self.conv_kernel_eff
        weight = self.param("weight", _normal_init(1.0),
                            (spec.out_channels, spec.in_channels, k, k))
        bias = self.param("bias", nn.initializers.zeros, (spec.out_channels,))

        x = modulated_conv2d(x, weight, styles, demodulate=not is_torgb,
                             padding=k - 1, input_gain=input_gain)
        x = filtered_lrelu(x, fu=up_filter, fd=down_filter, b=bias.astype(x.dtype),
                           up=up, down=down, padding=padding,
                           gain=1 if is_torgb else np.sqrt(2),
                           slope=1 if is_torgb else 0.2, clamp=self.conv_clamp)
        assert x.shape[1:] == (spec.out_channels, spec.out_size, spec.out_size)
        if x_skip is not None:
            x = x + x_skip.astype(x.dtype)
        return x

    @property
    def conv_kernel_eff(self) -> int:
        return 1 if self.spec.is_torgb else self.conv_kernel


class SynthesisInput(nn.Module):
    """Fourier-feature input grid (reference: networks_stylegan3.py:168-248).

    Unused by the AFCM U-net (the encoder replaces it) but kept for upstream
    StyleGAN3 parity and experimentation.
    """

    w_dim: int
    channels: int
    size: int
    sampling_rate: float
    bandwidth: float

    @nn.compact
    def __call__(self, w):
        def freq_init(key):
            f = jax.random.normal(key, (self.channels, 2))
            radii = jnp.sqrt(jnp.sum(jnp.square(f), axis=1, keepdims=True))
            f = f / (radii * jnp.exp(jnp.square(radii)) ** 0.25)
            return f * self.bandwidth

        freqs = self.variable("constants", "freqs",
                              lambda: freq_init(self.make_rng("params"))).value
        phases = self.variable(
            "constants", "phases",
            lambda: jax.random.uniform(self.make_rng("params"),
                                       (self.channels,)) - 0.5).value
        weight = self.param("weight", _normal_init(1.0),
                            (self.channels, self.channels))

        t = FullyConnected(self.w_dim, 4, weight_init=0,
                           bias_init=(1, 0, 0, 0), name="affine")(w)
        t = t / jnp.linalg.norm(t[:, :2], axis=1, keepdims=True)

        # Inverse rotation/translation applied to the frequencies.
        r_c, r_s, t_x, t_y = t[:, 0], t[:, 1], t[:, 2], t[:, 3]
        rot = jnp.stack([jnp.stack([r_c, -r_s], -1),
                         jnp.stack([r_s, r_c], -1)], -2)      # [B, 2, 2]
        freqs_b = jnp.einsum("cf,bfg->bcg", freqs, rot)
        phase_shift = freqs_b[:, :, 0] * (-t_x[:, None]) + freqs_b[:, :, 1] * (-t_y[:, None])
        phases_b = phases[None] + phase_shift

        amplitudes = jnp.clip(
            1 - (jnp.linalg.norm(freqs_b, axis=2) - self.bandwidth) /
            (self.sampling_rate / 2 - self.bandwidth), 0, 1)

        # Sampling grid (align_corners=False affine_grid semantics).
        half = 0.5 * self.size / self.sampling_rate
        coords = (np.arange(self.size) * 2 + 1) / self.size - 1  # [-1, 1) centers
        gy, gx = np.meshgrid(coords * half, coords * half, indexing="ij")
        grid = jnp.asarray(np.stack([gx, gy], axis=-1), jnp.float32)  # [H, W, 2]

        x = jnp.einsum("hwf,bcf->bhwc", grid, freqs_b) + phases_b[:, None, None, :]
        x = jnp.sin(x * (np.pi * 2)) * amplitudes[:, None, None, :]
        x = x @ (weight.T / np.sqrt(self.channels))
        return jnp.transpose(x, (0, 3, 1, 2))


class SynthesisNetwork(nn.Module):
    """AFCM U-shaped synthesis network (reference: networks_stylegan3.py:555-705)."""

    w_dim: int
    img_resolution: int
    img_channels_in: int
    img_channels_out: int
    channel_base: int = 32768
    channel_max: int = 512
    num_layers: int = 14
    num_critical: int = 2
    first_cutoff: float = 2.0
    first_stopband: float = 2 ** 2.1
    last_stopband_rel: float = 2 ** 0.3
    margin_size: int = 10
    output_scale: float = 0.25
    dropout_rate: float = 0.5
    skip_resolution: int = 256
    channel_align: int = 1
    # layer kwargs
    cond_mod: bool = True
    conv_kernel: int = 3
    filter_size: int = 6
    # None reproduces the reference *default construction* (encoder lrelu at
    # 1x, decoder at 2x); the shipped AFCM configs pass 2 explicitly, which
    # the reference forwards to both encoder and decoder layers.
    lrelu_upsampling: Optional[int] = None
    use_radial_filters: bool = False
    conv_clamp: Optional[float] = 256
    magnitude_ema_beta: float = 0.999
    global_w_dim: int = 512 * 2
    # Compute dtype for the conv stack ("float32" | "bfloat16").  Styles,
    # demodulation and the co-modulation head stay fp32; bf16 halves HBM
    # traffic of the 2x-rate lrelu intermediates and engages the MXU bf16
    # path.  Output is always cast back to fp32.
    compute_dtype: str = "float32"
    # Rematerialize alias-free layers in the backward pass (trades the cheap
    # FIR/lrelu recompute for activation memory; the TPU analog of the CUDA
    # sign-tensor trick, see SURVEY.md §2.10). `remat_min_size` restricts it
    # to layers whose spatial extent reaches the threshold — 0 remats all.
    remat: bool = False
    remat_min_size: int = 0

    @property
    def layout(self) -> SynthesisLayout:
        return compute_synthesis_layout(
            self.img_resolution, self.img_channels_in, self.img_channels_out,
            self.channel_base, self.channel_max, self.num_layers,
            self.num_critical, self.first_cutoff, self.first_stopband,
            self.last_stopband_rel, self.margin_size, self.output_scale,
            self.skip_resolution, self.channel_align)

    @property
    def num_ws(self) -> int:
        return self.num_layers + 2

    @nn.compact
    def __call__(self, ws, img_in, train: bool = False,
                 update_emas: bool = False):
        layout = self.layout
        assert ws.shape[1:] == (self.num_ws, self.w_dim)
        ws = ws.astype(jnp.float32)
        common_kwargs = dict(conv_kernel=self.conv_kernel,
                             filter_size=self.filter_size,
                             use_radial_filters=self.use_radial_filters,
                             conv_clamp=self.conv_clamp,
                             magnitude_ema_beta=self.magnitude_ema_beta)
        enc_kwargs = dict(common_kwargs,
                          lrelu_upsampling=self.lrelu_upsampling or 1)
        dec_kwargs = dict(common_kwargs,
                          lrelu_upsampling=self.lrelu_upsampling or 2)

        m = layout.margin_size
        x = jnp.pad(img_in, ((0, 0), (0, 0), (m, m), (m, m)))
        x = x.astype(jnp.dtype(self.compute_dtype))

        # Selective rematerialization: only layers whose spatial extent
        # reaches `remat_min_size` pay the recompute — the 2x-rate FIR
        # intermediates of the big layers dominate activation memory, while
        # rematting the small 512-channel layers only adds backward FLOPs
        # (VERDICT r1 item 5).
        def encoder_cls(spec):
            big = max(spec.in_size, spec.out_size) >= self.remat_min_size
            return nn.remat(EncoderLayer, static_argnums=(2,)) \
                if (self.remat and big) else EncoderLayer

        def synthesis_cls(spec):
            big = max(spec.in_size, spec.out_size) >= self.remat_min_size
            return nn.remat(SynthesisLayer, static_argnums=(5,)) \
                if (self.remat and big) else SynthesisLayer

        records = dict(layout.encoder_records)
        e_features: Dict[int, jnp.ndarray] = {}
        for idx, spec in enumerate(layout.encoder_specs):
            x = encoder_cls(spec)(spec, name=f"encoder_{idx}", **enc_kwargs)(
                x, update_emas)
            if idx in records:
                e_features[records[idx]] = x

        # Global co-modulation head (reference: networks_stylegan3.py:635-638, 682-686).
        pooled = Conv2dLayer(layout.bottleneck_channels,
                             layout.bottleneck_channels, kernel_size=3,
                             activation="lrelu", conv_clamp=None,
                             name="e_16x16")(x)
        pooled = adaptive_avg_pool2d(pooled, (4, 4))
        pooled = pooled.reshape(pooled.shape[0], -1).astype(jnp.float32)
        pooled = FullyConnected(layout.bottleneck_channels * 16,
                                self.global_w_dim, activation="lrelu",
                                name="fc_in")(pooled)
        img_global = nn.Dropout(rate=self.dropout_rate, deterministic=not train)(pooled)

        for idx, (spec, skip_key) in enumerate(zip(layout.decoder_specs,
                                                   layout.decoder_skips)):
            name = f"L{idx}_{spec.out_size}_{spec.out_channels}"
            x_skip = e_features[skip_key] if skip_key is not None else None
            x = synthesis_cls(spec)(spec, w_dim=self.w_dim,
                                    global_w_dim=self.global_w_dim,
                                    cond_mod=self.cond_mod, name=name,
                                    **dec_kwargs)(
                ws[:, idx + 1], x, img_global, x_skip, update_emas)

        if layout.output_scale != 1:
            x = x * layout.output_scale
        assert x.shape[1:] == (self.img_channels_out, self.img_resolution,
                               self.img_resolution)
        return x.astype(jnp.float32)


class Stylegan3Generator(nn.Module):
    """mapping + synthesis (reference: networks_stylegan3.py:716-740)."""

    z_dim: int
    c_dim: int
    w_dim: int
    img_resolution: int
    img_channels_in: int
    img_channels_out: int
    mapping_kwargs: Any = None
    synthesis_kwargs: Any = None

    def setup(self):
        synthesis_kwargs = dict(self.synthesis_kwargs or {})
        self.synthesis = SynthesisNetwork(
            w_dim=self.w_dim, img_resolution=self.img_resolution,
            img_channels_in=self.img_channels_in,
            img_channels_out=self.img_channels_out, **synthesis_kwargs)
        mapping_kwargs = dict(self.mapping_kwargs or {})
        mapping_kwargs.setdefault("num_layers", 2)
        self.mapping = MappingNetwork(
            z_dim=self.z_dim, c_dim=self.c_dim, w_dim=self.w_dim,
            num_ws=self.synthesis.num_ws, **mapping_kwargs)

    def __call__(self, z, c, cond_img, ref_img=None, truncation_psi: float = 1.0,
                 truncation_cutoff=None, train: bool = False,
                 update_emas: bool = False, noise_mode: str = "random"):
        del ref_img, noise_mode  # accepted for API parity; unused by SG3
        ws = self.mapping(z, c, truncation_psi=truncation_psi,
                          truncation_cutoff=truncation_cutoff,
                          update_w_avg=update_emas)
        return self.synthesis(ws, cond_img, train=train, update_emas=update_emas)
