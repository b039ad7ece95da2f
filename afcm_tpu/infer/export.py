"""AOT serving export: serialize the jitted EMA inference step into a
self-contained artifact (StableHLO via ``jax.export``) that a serving
process deserializes and calls — no model code, config tree, or checkpoint
loading on the serving side, and no re-trace.

The exported function is the full evaluation step the predictor drives:
optional uint8 ingest + in-graph normalization (``tpu.transfer_dtype``),
fresh per-batch z from a folded-in call counter (the reference protocol —
reference: models/comodgan_model.py:101-108), EMA generator forward with
const noise, optional reduced-precision fetch (``tpu.fetch_dtype``).
Weights ride inside the artifact as constants, like a saved serving
binary. The PyTorch reference has no counterpart — its deployment story
re-instantiates the module tree and state_dict every time
(reference: models/base_model.py:162-199).

CLI (mirrors the evaluate CLI; writes <run_dir>/serving.hlo by default):

    python -m afcm_tpu.infer.export --config-file configs/adni/stylegan3/cmsr.yml \
        [--output serving.hlo] [epoch latest] [key value ...]

Serving side:

    from afcm_tpu.infer.export import serving_forward
    forward = serving_forward("serving.hlo")        # (a, slice_idx) -> fake_B
    predictor = StandardPredictor(forward, out_dir, cfg)
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


def make_eval_fn(model, state, *, norm_range=None, fetch_dtype=None,
                 seed: int = 0):
    """The serving computation: ``fn(a, slice_idx, counter) -> fake_B``.

    ``state`` is closed over (weights become artifact constants).
    ``counter`` is the per-call batch index; z is drawn from
    ``fold_in(PRNGKey(seed), counter)`` so a given evaluation stream is
    reproducible while every batch still sees fresh z (the same discipline
    as evaluate.make_forward_fn, whose normalize/fetch-cast helpers this
    shares)."""
    from ..evaluate import fetch_dtype_or_none, normalize_uint8
    out_dt = fetch_dtype_or_none(fetch_dtype)
    lo_hi = None
    if norm_range is not None:
        lo_hi = (float(norm_range[0]), float(norm_range[1]))

    def fn(a, slice_idx, counter):
        if lo_hi is not None:
            a = normalize_uint8(a, *lo_hi)
        key = jax.random.fold_in(jax.random.PRNGKey(seed), counter)
        out = model.eval_step(state, a, slice_idx, key)
        return out.astype(out_dt) if out_dt is not None else out

    return fn


def export_eval(model, state, batch_size: Optional[int],
                img_shape: Sequence[int], *,
                norm_range=None, fetch_dtype=None, seed: int = 0,
                platforms: Optional[Sequence[str]] = None, mesh=None,
                weights_dtype=None):
    """Export the EMA eval step for fixed ``batch_size`` (the predictor pads
    ragged tails to the loader batch size, so one static shape serves the
    whole volume stream). ``batch_size=None`` exports with a *symbolic*
    batch dimension — one artifact serves any batch size (each distinct
    size still compiles its own executable on first use at the call site).

    With a multi-device ``mesh``, the artifact is exported batch-sharded
    over the mesh's data axis (GSPMD partitions the embedded weights);
    calling it then requires the same device count — pass the mesh to
    ``serving_forward`` too so inputs land sharded.

    ``weights_dtype="bfloat16"`` stores the embedded weights rounded to
    bf16, halving the artifact (the 58.5M-param flagship drops ~234 MB →
    ~117 MB). Output drift is the bf16-weights class (~56 dB PSNR vs
    fp32, BASELINE.md) — far inside the 0.1 dB parity budget.

    ``img_shape`` is the conditioning-window shape (C, H, W). With
    ``norm_range`` the artifact ingests uint8 patches and normalizes
    in-graph; otherwise float32 in [-1, 1].

    The trace forces ``filtered_lrelu``/``upfirdn2d`` onto their pure-XLA
    implementations: Mosaic custom-calls would pin the artifact to one
    TPU toolchain generation, and the measured in-model routing win is
    neutral (docs/performance.md round 3), so portability costs nothing.
    """
    import importlib
    # importlib, not `from ..ops import filtered_lrelu`: the package exports
    # functions with the submodules' names, which shadow attribute imports.
    _fl = importlib.import_module("afcm_tpu.ops.filtered_lrelu")
    _uf = importlib.import_module("afcm_tpu.ops.upfirdn2d")
    _mc = importlib.import_module("afcm_tpu.ops.modulated_conv")

    if weights_dtype is not None:
        wdt = jnp.dtype(weights_dtype)
        state = jax.tree.map(
            lambda x: x.astype(wdt)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            and x.dtype == jnp.float32 else x, state)
    fn = make_eval_fn(model, state, norm_range=norm_range,
                      fetch_dtype=fetch_dtype, seed=seed)
    a_dt = jnp.uint8 if norm_range is not None else jnp.float32
    b = (jax.export.symbolic_shape("batch")[0] if batch_size is None
         else batch_size)
    args = (jax.ShapeDtypeStruct((b,) + tuple(img_shape), a_dt),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.int32))

    jit_kwargs = {}
    if mesh is not None and mesh.devices.size > 1:
        from ..parallel import batch_sharding
        bs = batch_sharding(mesh)
        jit_kwargs["in_shardings"] = (bs, bs, None)

    old_fl, old_uf = _fl.get_default_impl(), _uf.get_default_impl()
    old_mc = _mc.get_conv_impl()
    _fl.set_default_impl("xla")
    _uf.set_default_impl("auto")  # banded/conv einsum forms are portable
    _mc.set_conv_impl("xla")      # int8 path is a Mosaic custom-call: unpin
    try:
        kwargs = {"platforms": tuple(platforms)} if platforms else {}
        return jax.export.export(jax.jit(fn, **jit_kwargs), **kwargs)(*args)
    finally:
        _fl.set_default_impl(old_fl)
        _uf.set_default_impl(old_uf)
        _mc.set_conv_impl(old_mc)


def save_exported(exported, path: str) -> str:
    data = exported.serialize()
    tmp = f"{path}.tmp.{os.getpid()}"  # atomic: a kill mid-write of the
    with open(tmp, "wb") as f:         # ~100-250 MB artifact must not leave
        f.write(data)                  # a truncated file at the real path
    os.replace(tmp, path)
    return path


def load_exported(path: str):
    with open(path, "rb") as f:
        return jax.export.deserialize(f.read())


def serving_forward(exported_or_path, start_counter: int = 0, mesh=None):
    """Wrap a (de)serialized artifact as the ``(a_batch, slice_idx)``
    callable ``StandardPredictor`` consumes; the call counter advances
    per batch (fresh z, reproducible stream). For an artifact exported
    over a mesh, pass the (same-shape) serving mesh so input batches are
    placed sharded over its data axis."""
    exp = (load_exported(exported_or_path)
           if isinstance(exported_or_path, (str, os.PathLike))
           else exported_or_path)
    counter = [int(start_counter)]
    sharding = None
    if mesh is not None and mesh.devices.size > 1:
        from ..parallel import batch_sharding
        sharding = batch_sharding(mesh)

    def forward(a_batch, slice_idx):
        a = jnp.asarray(a_batch)
        expect = exp.in_avals[0].dtype
        if a.dtype != expect:
            raise TypeError(
                f"artifact expects {expect} patches but got {a.dtype}: "
                f"the export's ingest mode (uint8 vs float) must match what "
                f"the loader ships — re-export with the matching "
                f"tpu.transfer_dtype, or override it at export time "
                f"(e.g. 'tpu.transfer_dtype float32').")
        s = jnp.asarray(slice_idx, jnp.float32)
        if sharding is not None:
            a = jax.device_put(a, sharding)
            s = jax.device_put(s, sharding)
        out = exp.call(a, s, jnp.int32(counter[0]))
        counter[0] += 1
        return out

    return forward


def main(argv=None):
    import sys
    argv = list(sys.argv[1:] if argv is None else argv)
    from ..config import default_argument_parser, pop_flag
    output = pop_flag(argv, "--output")
    symbolic = pop_flag(argv, "--symbolic-batch", has_value=False)
    weights_dtype = pop_flag(argv, "--weights-dtype")

    from ..evaluate import (checkpoint_tag, detect_norm_range,
                            ensure_volumetric, init_and_load_state)
    from ..models import build_gan_model

    cfg = default_argument_parser(argv)
    ensure_volumetric(cfg, "afcm_tpu.infer.export")
    # Trace-time precision must match the in-process serving step
    # (evaluate.main applies the same config key before building).
    if cfg.tpu.matmul_precision != "default":
        jax.config.update("jax_default_matmul_precision",
                          cfg.tpu.matmul_precision)
    model = build_gan_model(cfg)
    run_dir = os.path.join(cfg.checkpoints_dir, cfg.name)
    tag = checkpoint_tag(cfg)  # same default init_and_load_state applies
    res = cfg.model.G.img_resolution
    c_in = cfg.model.G.img_channels_in
    state = init_and_load_state(cfg, model)

    # uint8 ingest only when the loader will actually ship bytes (it checks
    # the stored volume dtype, not just the transform chain).
    norm_range = detect_norm_range(cfg)
    batch = None if symbolic else int(cfg.loaders.batch_size)
    exported = export_eval(
        model, state, batch, (c_in, res, res),
        norm_range=norm_range,
        fetch_dtype=getattr(cfg.tpu, "fetch_dtype", None),
        weights_dtype=weights_dtype)
    output = output or os.path.join(run_dir, "serving.hlo")
    save_exported(exported, output)
    print(f"exported {tag} eval step (batch {batch or 'symbolic'}, "
          f"{'uint8' if norm_range else 'float32'} ingest) -> {output} "
          f"[{os.path.getsize(output) / 1e6:.1f} MB, "
          f"platforms {list(exported.platforms)}]")
    return output


if __name__ == "__main__":
    main()
