"""Config system tests: defaults, _BASE_ inheritance, CLI overrides, freeze."""

import os

import pytest

from afcm_tpu.config import CfgNode, get_default_cfg, setup

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class _Args:
    def __init__(self, config_file="", model=None, opts=None):
        self.config_file = config_file
        self.model = model
        self.opts = opts or []


def test_defaults_tree():
    cfg = get_default_cfg()
    assert cfg.loaders.batch_size == 8
    assert cfg.predictor.patch_halo == [0, 8, 8]
    assert cfg.loss.lambda_r1 == 10.0


def test_filtered_lrelu_impl_default_is_xla():
    """'xla' is the measured-best default since round 4: the Pallas-routed
    'auto' ties the forward but loses 8.4% in the full train step
    (scripts/bench_train_impl.py; docs/experiments.md). Config default and
    the ops-module default must agree."""
    import importlib
    import inspect
    fl = importlib.import_module("afcm_tpu.ops.filtered_lrelu")
    assert get_default_cfg().tpu.filtered_lrelu_impl == "xla"
    # The module global may have been switched by an earlier test in this
    # process; pin the shipped initial value via the source instead.
    assert '_DEFAULT_IMPL = "xla"' in inspect.getsource(fl)


def test_adni_cmsr_config():
    cfg = setup(_Args(os.path.join(REPO, "configs/adni/stylegan3/cmsr.yml")))
    assert cfg.model.name == "stylegan3"
    assert cfg.model.G.c_dim == 1
    assert cfg.model.G.img_channels_in == 4
    assert cfg.model.G.synthesis_kwargs.num_layers == 14
    assert cfg.model.G.synthesis_kwargs.skip_resolution == 128
    assert cfg.model.D.img_channels == 5
    assert cfg.model.D.epilogue_kwargs.mbstd_group_size == 16
    assert cfg.loaders.thickness == [5]
    assert cfg.loaders.batch_size == 16
    assert cfg.loss.blur_init_sigma == 10.0
    assert cfg.optimizer.lr_G == 0.0025
    assert cfg.scheduler.ema.enabled is True
    assert cfg.is_frozen()
    with pytest.raises(AttributeError):
        cfg.loaders.batch_size = 4


def test_base_inheritance_chain():
    # sr_5 -> cmsr -> adni/base
    cfg = setup(_Args(os.path.join(REPO, "configs/adni/stylegan3/sr_5.yml")))
    assert cfg.name == "adni_stylegan3_sr5"
    assert cfg.loaders.raw_internal_path_in == ["t1_lr4sr"]
    assert cfg.loaders.thickness == [5]          # inherited from cmsr.yml
    assert cfg.loss.blur_fade_kimg == 100.0


def test_cli_overrides():
    cfg = setup(_Args(os.path.join(REPO, "configs/adni/stylegan3/cmsr.yml"),
                      opts=["loaders.batch_size", "4",
                            "model.G.synthesis_kwargs.num_layers", "6",
                            "scheduler.ema.enabled", "False"]))
    assert cfg.loaders.batch_size == 4
    assert cfg.model.G.synthesis_kwargs.num_layers == 6
    assert cfg.scheduler.ema.enabled is False


def test_unknown_key_rejected():
    cfg = get_default_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_other({"nonexistent_key": 1})


def test_all_shipped_configs_load():
    root = os.path.join(REPO, "configs")
    count = 0
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".yml") and f != "base.yml":
                cfg = setup(_Args(os.path.join(dirpath, f)))
                assert cfg.model.name in ("stylegan3", "comodgan", "pix2pix")
                count += 1
    assert count >= 11


def test_comodgan_config_builds_model():
    from afcm_tpu.models import build_gan_model
    cfg = setup(_Args(os.path.join(REPO, "configs/adni/comodgan/ccsr.yml")))
    model = build_gan_model(cfg)
    assert model.config.c_dim == 1
    assert model.generator.img_channels_in == 4


def test_stylegan3_config_builds_model():
    from afcm_tpu.models import build_gan_model
    cfg = setup(_Args(os.path.join(REPO, "configs/inhouse/stylegan3/ccsr.yml")))
    model = build_gan_model(cfg)
    assert model.config.blur_init_sigma == 10.0
    assert model.generator.synthesis_kwargs["num_layers"] == 14


def test_r1_interval_threads_to_model():
    from afcm_tpu.models import build_gan_model
    cfg = setup(_Args(os.path.join(REPO, "configs/adni/comodgan/ccsr.yml"),
                      opts=["loss.r1_interval", "4"]))
    model = build_gan_model(cfg)
    assert model.config.r1_interval == 4
    # default stays reference-faithful (R1 every step)
    cfg = setup(_Args(os.path.join(REPO, "configs/adni/comodgan/ccsr.yml")))
    assert build_gan_model(cfg).config.r1_interval == 1


def test_num_gpus_flag_maps_to_mesh():
    """--num-gpus N (reference CLI compat, configs/config.py:29-31) sets the
    mesh's data axis; an explicit tpu.mesh_shape override still wins."""
    from afcm_tpu.config import default_argument_parser
    base = ["--config-file", os.path.join(REPO, "configs/demo/cmsr_tiny.yml")]
    cfg = default_argument_parser(base + ["--num-gpus", "4"])
    assert list(cfg.tpu.mesh_shape) == [4, 1]
    cfg = default_argument_parser(base + ["--num-gpus", "4",
                                          "tpu.mesh_shape", "[2, 2]"])
    assert list(cfg.tpu.mesh_shape) == [2, 2]
    # the flag sets only the data axis; a configured model axis survives
    cfg = default_argument_parser(base + ["--num-gpus", "4"])
    assert cfg.tpu.mesh_shape[1] == 1  # default model axis preserved
    cfg = default_argument_parser(base)
    assert list(cfg.tpu.mesh_shape) == [0, 1]
