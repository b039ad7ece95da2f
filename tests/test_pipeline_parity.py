"""Full-pipeline output parity vs the reference predictor (VERDICT r1 item 6,
extended per VERDICT r2 item 5 to both generator families and fractional
slice positions).

Drives the reference's StandardPredictor (reference: models/predictor.py:106-202)
over a synthetic h5 subject with the reference torch generator, and our
afcm_tpu predictor over the same subject with the same (ported) weights; the
stitched volumes and the final PSNR/SSIM numbers (after each side's
evaluate-time rescale, reference: evaluate.py:73-77) must agree. This closes
the last untested seam: dataset windowing → halo removal → overlap-average →
rescale conventions.

Parametrized over:
  * generator family: alias-free SG3 and CoModGAN (reference:
    networks_stylegan3.py:716-740, CoModGAN/generator.py:545-572);
  * thickness 4 and 5 — thickness 5 exercises the non-integer SR positions
    slice_idx ∈ {0.2, 0.4, 0.6, 0.8} (reference: cmsr_dataset.py:130-152),
    the paper's headline capability.
"""

import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from afcm_tpu.data.demo import write_demo_tree  # noqa: E402
from afcm_tpu.data.loader import TestLoader  # noqa: E402
from afcm_tpu.data import create_dataset  # noqa: E402
from afcm_tpu.infer.predictor import StandardPredictor  # noqa: E402
from afcm_tpu.nn import CoModGenerator, Stylegan3Generator  # noqa: E402
from afcm_tpu.utils.metrics import evaluate_3D  # noqa: E402
from afcm_tpu.utils.nifti import read_nifti  # noqa: E402
from afcm_tpu.utils.port import state_dict_to_variables  # noqa: E402
from tests._torch_ref import load_reference_networks  # noqa: E402

SIZE = 96          # volume H/W; patches overlap (stride 32 < patch 64)
PATCH = 64         # == generator img_resolution
DEPTH = 12
BATCH = 8
HALO = (0, 8, 8)

GEN = dict(z_dim=64, c_dim=1, w_dim=64, img_resolution=PATCH,
           img_channels_in=4, img_channels_out=1)
SG3_SYNTH = dict(channel_base=4096, channel_max=128, num_layers=6,
                 num_critical=2, margin_size=10, output_scale=0.25,
                 skip_resolution=32, conv_clamp=256, cond_mod=True)
COMOD_SYNTH = dict(channel_base=4096, channel_max=128, skip_resolution=32,
                   cond_mod=True, conv_clamp=None, channel_attention=False)
GEN_MAP = dict(num_layers=2)


def _loaders_config(root, thickness):
    transformer = {"raw": {
        "Normalize": {"enabled": True, "min_value": 0.0, "max_value": 255.0},
        "ToTensor": {"enabled": True, "expand_dims": False}}}
    sb = {"name": "SliceBuilder", "patch_shape": [1, PATCH, PATCH],
          "stride_shape": [1, 32, 32]}
    return {
        "dataset_mode": "cmsr", "batch_size": BATCH, "serial_batches": True,
        "raw_internal_path_in": ["flair"], "raw_internal_path_out": ["t1"],
        "rand_output": False, "cat_inputs": False, "thickness": [thickness],
        "slice_num": 4, "global_normalization": None,
        "test": {"file_paths": [os.path.join(root, "test")],
                 "slice_builder": sb, "transformer": transformer},
    }


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    ref = load_reference_networks()
    torch = ref["torch"]

    root = tmp_path_factory.mktemp("pipe")
    write_demo_tree(str(root / "data"), n_train=0, n_val=0, n_test=1,
                    depth=DEPTH, size=SIZE)

    torch.manual_seed(0)
    torch_sg3 = ref["networks_stylegan3"].Stylegan3Generator(
        mapping_kwargs=dict(GEN_MAP), synthesis_kwargs=dict(SG3_SYNTH),
        **GEN).eval()
    torch.manual_seed(0)
    torch_comod = ref["comod_generator"].CoModGenerator(
        mapping_kwargs=dict(name="MappingNetwork", **GEN_MAP),
        synthesis_kwargs=dict(name="SynthesisNetwork", **COMOD_SYNTH),
        **GEN).eval()
    families = {
        "sg3": dict(
            torch_gen=torch_sg3,
            variables=state_dict_to_variables(torch_sg3.state_dict()),
            jax_gen=Stylegan3Generator(mapping_kwargs=dict(GEN_MAP),
                                       synthesis_kwargs=dict(SG3_SYNTH),
                                       **GEN)),
        "comod": dict(
            torch_gen=torch_comod,
            variables=state_dict_to_variables(torch_comod.state_dict()),
            jax_gen=CoModGenerator(mapping_kwargs=dict(GEN_MAP),
                                   synthesis_kwargs=dict(COMOD_SYNTH),
                                   **GEN)),
    }
    return dict(ref=ref, torch=torch, root=str(root), families=families)


class _RefModelShim:
    """The minimal model surface the reference predictor drives
    (reference: models/predictor.py:144-169 + comodgan_model.py:101-126):
    set_test_input / test / fake_B / real_A / pred_mask.  z is pinned to
    zeros on both sides so the comparison is deterministic; head 1
    (``pred_mask``, which no shipped reference model defines) mirrors our
    predictor's copy-of-head-0 convention."""

    gpu_ids = []

    def __init__(self, torch, gen):
        self._torch = torch
        self._gen = gen

    def set_test_input(self, batch, slice_idx, indices):
        self.real_A = batch
        self._gen_c = slice_idx

    def test(self):
        torch = self._torch
        with torch.no_grad():
            z = torch.zeros(self.real_A.shape[0], GEN["z_dim"])
            self.fake_B = self._gen(z=z, c=self._gen_c, cond_img=self.real_A,
                                    ref_img=None, noise_mode="const")
        self.pred_mask = self.fake_B


def _run_reference_pipeline(env, family, thickness, out_dir):
    """Reference dataset -> DataLoader -> StandardPredictor, capturing the
    arrays its (shimmed) SimpleITK writer would persist."""
    torch = env["torch"]
    from data.cmsr_dataset import StandardHDF5Dataset as RefDS
    from data.utils import default_prediction_collate
    from models.predictor import StandardPredictor as RefPredictor

    class _Cfg(dict):
        __getattr__ = dict.__getitem__

    lcfg = _loaders_config(env["root"] + "/data", thickness)
    h5dir = os.path.join(env["root"], "data", "test")
    h5file = os.path.join(h5dir, os.listdir(h5dir)[0])
    ref_ds = RefDS(file_path=h5file, phase="test",
                   slice_builder_config=_Cfg(lcfg["test"]["slice_builder"]),
                   transformer_config=lcfg["test"]["transformer"],
                   raw_internal_path_in=["flair"],
                   raw_internal_path_out=["t1"], thickness=[thickness],
                   slice_num=4, global_normalization=None)
    ref_ds.mirror_padding = None  # reference quirk: attribute read at
    # predictor.py:219 but never set by any shipped dataset class
    loader = torch.utils.data.DataLoader(
        ref_ds, batch_size=BATCH, collate_fn=default_prediction_collate)

    captured = {}
    sitk = sys.modules["SimpleITK"]
    sitk.GetImageFromArray = lambda arr: np.array(arr)
    sitk.WriteImage = lambda img, path: captured.__setitem__(
        os.path.basename(path), np.asarray(img))

    config = {"model": {"G": {"output_nc": 1}, "output_heads": 3},
              "loaders": {"test": {"slice_builder":
                                   lcfg["test"]["slice_builder"]}}}
    predictor = RefPredictor(
        _RefModelShim(torch, env["families"][family]["torch_gen"]), out_dir,
        config, patch_halo=HALO)
    predictor(loader)
    base = os.path.basename(h5file).split(".")[0]
    return {i: captured[f"{base}_predictions{i}.nii.gz"] for i in range(3)}, \
        ref_ds


def _run_our_pipeline(env, family, thickness, out_dir):
    lcfg = _loaders_config(env["root"] + "/data", thickness)
    ds = create_dataset(lcfg, phase="test").datasets[0]
    loader = TestLoader(ds, batch_size=BATCH)

    fam = env["families"][family]
    gen, variables = fam["jax_gen"], fam["variables"]

    @jax.jit
    def forward(a, slice_idx):
        z = jnp.zeros((a.shape[0], GEN["z_dim"]), jnp.float32)
        kwargs = {"noise_mode": "const"} if family == "comod" else {}
        return gen.apply(variables, z, jnp.asarray(slice_idx),
                         jnp.asarray(a), **kwargs)

    predictor = StandardPredictor(forward_fn=forward, output_dir=out_dir,
                                  config=None, patch_halo=HALO)
    path0 = predictor(loader)
    predictor.wait_for_writes()  # head files are written write-behind
    vols = {}
    for i in range(3):
        vols[i], _ = read_nifti(path0.replace("predictions0",
                                              f"predictions{i}"))
    return vols, ds


@pytest.mark.parametrize("family,thickness",
                         [("sg3", 4), ("sg3", 5), ("comod", 5)])
def test_full_pipeline_parity(env, tmp_path, family, thickness):
    ref_vols, ref_ds = _run_reference_pipeline(env, family, thickness,
                                               str(tmp_path / "ref"))
    our_vols, our_ds = _run_our_pipeline(env, family, thickness,
                                         str(tmp_path / "ours"))

    # Same patch decomposition on both sides.
    assert len(ref_ds) == len(our_ds)
    if thickness == 5:
        # the fractional positions the thickness-5 schedule must visit
        fracs = {round(float(ref_ds[i][1]), 3) for i in range(len(ref_ds))}
        assert {0.2, 0.4, 0.6, 0.8} <= fracs

    for head in (0, 2):
        want = np.squeeze(ref_vols[head])
        got = np.squeeze(our_vols[head])
        assert got.shape == want.shape
        # cross-framework fp32 G forward agrees to ~2e-4 abs (see
        # test_stylegan3_parity); stitching must add nothing on top.
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)
    # head 1 is the copy-of-head-0 convention on both sides
    np.testing.assert_allclose(np.squeeze(our_vols[1]),
                               np.squeeze(our_vols[0]), atol=0)

    # Final metrics after each side's evaluate-time rescale
    # (reference: evaluate.py:73-77 — pred (clip±1+1)/2, target /255).
    target = np.asarray(ref_ds.raw["t1"], np.float64)
    target = np.clip(target, 0, 255) / 255.0
    m_ref = evaluate_3D((np.clip(np.squeeze(ref_vols[0]), -1, 1) + 1) / 2,
                        target)
    m_ours = evaluate_3D((np.clip(np.squeeze(our_vols[0]), -1, 1) + 1) / 2,
                         target)
    assert abs(m_ref[0] - m_ours[0]) < 0.01      # PSNR within 0.01 dB
    assert abs(m_ref[1] - m_ours[1]) < 1e-4      # SSIM within 1e-4
