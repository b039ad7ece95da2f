"""NIfTI-directory (cascade) dataset path: cmsrnii loaders end-to-end."""

import os

import numpy as np
import pytest

from afcm_tpu.data import create_dataset, get_test_loaders
from afcm_tpu.data.nii_dataset import StandardNIIDataset, percentile_clip
from afcm_tpu.utils.nifti import write_nifti


@pytest.fixture
def nii_root(tmp_path, rng):
    """Per-subject dirs of <subject>*<modality>.nii.gz files (the layout the
    predictor writes for cascaded evaluation)."""
    root = tmp_path / "stage1_out"
    for subject in ("sub0", "sub1"):
        d = root / subject
        os.makedirs(d)
        vol = (rng.rand(12, 96, 96) * 800).astype(np.float32)
        write_nifti(str(d / f"{subject}_predictions0_flair.nii.gz"), vol)
        vol2 = (rng.rand(12, 96, 96) * 800).astype(np.float32)
        write_nifti(str(d / f"{subject}_predictions0_t1.nii.gz"), vol2)
    return str(root)


def _cfg(root):
    transformer = {"raw": {
        "Normalize": {"enabled": True, "min_value": 0.0, "max_value": 255.0},
        "ToTensor": {"enabled": True, "expand_dims": False}}}
    sb = {"name": "SliceBuilder", "patch_shape": [1, 96, 96],
          "stride_shape": [1, 32, 32]}
    return {"dataset_mode": "cmsrnii", "batch_size": 4,
            "serial_batches": True,
            "raw_internal_path_in": ["predictions0_flair"],
            "raw_internal_path_out": ["predictions0_t1"],
            "rand_output": False, "cat_inputs": False, "thickness": [4],
            "slice_num": 4, "global_normalization": None,
            "train": {"file_paths": [root], "slice_builder": sb,
                      "transformer": transformer},
            "test": {"file_paths": [root], "slice_builder": sb,
                     "transformer": transformer}}


def test_percentile_clip_range(rng):
    vol = rng.rand(8, 16, 16) * 1000
    out = percentile_clip(vol)
    assert out.min() >= 0 and out.max() <= 1


def test_nii_dataset_loads(nii_root):
    ds = create_dataset(_cfg(nii_root), phase="train")
    assert len(ds.datasets) == 2
    sub = ds.datasets[0]
    assert sub.raw["predictions0_flair"].dtype == np.uint8
    item = sub.get_item(5)
    assert item["A"].shape == (4, 96, 96)
    assert item["B"].shape == (1, 96, 96)


def test_nii_test_loaders(nii_root):
    class _Cfg:
        loaders = None

    import afcm_tpu.config as cfgmod
    cfg = cfgmod.CfgNode({"loaders": _cfg(nii_root)})
    loaders = list(get_test_loaders(cfg))
    assert len(loaders) == 2
    a, slice_idx, indices = next(iter(loaders[0]))
    assert a.shape[1:] == (4, 96, 96)
    assert len(indices) == a.shape[0]


def test_nifti_header_edge_cases(tmp_path, rng):
    """Fields some writers leave degenerate: NaN scl_slope (= no scaling,
    the nibabel convention), qform-only affines, pixdim-only spacing; the
    returned volume must be writeable (not a frombuffer view)."""
    import struct

    from afcm_tpu.utils.nifti import read_nifti

    vol = (rng.rand(4, 8, 8) * 100).astype(np.float32)
    path = str(tmp_path / "edge.nii")
    write_nifti(path, vol)
    with open(path, "rb") as f:
        raw = bytearray(f.read())

    # NaN scl_slope / scl_inter -> no scaling applied
    struct.pack_into("<f", raw, 112, float("nan"))
    struct.pack_into("<f", raw, 116, float("nan"))
    with open(path, "wb") as f:
        f.write(raw)
    got, affine = read_nifti(path)
    np.testing.assert_array_equal(got, vol)
    assert got.flags.writeable
    got[0, 0, 0] = -1.0  # must not raise

    # qform-only (srow zeroed, identity quaternion, anisotropic pixdim)
    struct.pack_into("<48x", raw, 280)                   # zero srow
    struct.pack_into("<8f", raw, 76, 1.0, 0.98, 0.98, 3.0, 1, 1, 1, 1)
    struct.pack_into("<3f", raw, 268, 10.0, -20.0, 30.0)  # qoffset
    with open(path, "wb") as f:
        f.write(raw)
    _, affine = read_nifti(path)
    np.testing.assert_allclose(np.diag(affine)[:3], [0.98, 0.98, 3.0],
                               rtol=1e-6)
    np.testing.assert_allclose(affine[:3, 3], [10.0, -20.0, 30.0], rtol=1e-6)

    # no sform, no qform -> spacing still honored from pixdim
    struct.pack_into("<h", raw, 252, 0)                  # qform_code = 0
    with open(path, "wb") as f:
        f.write(raw)
    _, affine = read_nifti(path)
    np.testing.assert_allclose(np.diag(affine)[:3], [0.98, 0.98, 3.0],
                               rtol=1e-6)
