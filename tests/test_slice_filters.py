"""Filter slice builders + rand_output vs the reference oracle
(reference: data/utils.py:132-199, data/cmsr_dataset.py:111-119)."""

import os

import numpy as np
import pytest

from afcm_tpu.data.slice_builder import (FilterGraySliceBuilder,
                                         FilterSliceBuilder, SliceBuilder)


def _volume(seed=0, shape=(8, 96, 96)):
    """Noise + x-gradient so per-patch gray fractions actually vary."""
    rng = np.random.RandomState(seed)
    grad = np.linspace(0, 200, shape[-1])[None, None, :]
    return np.clip(rng.rand(*shape) * 120 + grad, 0, 255).astype(np.uint8)


def test_filter_gray_matches_reference():
    from tests._torch_ref import load_reference_ops
    load_reference_ops()
    from data.utils import FilterGraySliceBuilder as RefBuilder

    vol = _volume()
    kw = dict(patch_shape=(1, 64, 64), stride_shape=(1, 16, 16),
              gray_threshold=160, gray_percentile=0.45)
    ours = FilterGraySliceBuilder(vol, None, None, **kw)
    ref = RefBuilder(vol, None, None, **kw)
    assert len(ours.raw_slices) > 0
    assert len(ours.raw_slices) < len(SliceBuilder(
        vol, None, None, (1, 64, 64), (1, 16, 16)).raw_slices)
    assert ours.raw_slices == list(ref.raw_slices)


def test_filter_slice_builder_matches_reference():
    from tests._torch_ref import load_reference_ops
    load_reference_ops()
    from data.utils import FilterSliceBuilder as RefBuilder

    vol = _volume(1)
    label = (_volume(2) > 100).astype(np.uint8)
    kw = dict(patch_shape=(1, 64, 64), stride_shape=(1, 16, 16),
              threshold=0.55, slack_acceptance=0.05, gray_threshold=160,
              gray_percentile=0.3)
    ours = FilterSliceBuilder(vol, label, None, **kw)
    ref = RefBuilder(vol, label, None, **kw)
    # both consume the same seeded RandomState(47) slack stream
    assert ours.raw_slices == list(ref.raw_slices)
    assert ours.label_slices == list(ref.label_slices)
    assert 0 < len(ours.raw_slices)


def test_rand_output_selects_random_modality(tmp_path):
    """rand_output=True picks the output modality per item at train time
    (reference: cmsr_dataset.py:111-119); the inputs exclude it."""
    import h5py
    import random

    from afcm_tpu.data import create_dataset

    vols = {"t1": _volume(3, (12, 96, 96)), "t2": _volume(4, (12, 96, 96)),
            "flair": _volume(5, (12, 96, 96))}
    d = tmp_path / "train"
    os.makedirs(d)
    with h5py.File(d / "s.h5", "w") as f:
        for k, v in vols.items():
            f[k] = v

    cfg = {
        "dataset_mode": "cmsr", "batch_size": 2, "serial_batches": True,
        "raw_internal_path_in": ["t1", "t2", "flair"],
        "raw_internal_path_out": ["t1", "t2", "flair"],
        "rand_output": True, "cat_inputs": False, "thickness": [4],
        "slice_num": 4, "global_normalization": None,
        "train": {"file_paths": [str(d)],
                  "slice_builder": {"name": "SliceBuilder",
                                    "patch_shape": [1, 96, 96],
                                    "stride_shape": [1, 16, 16]},
                  "transformer": {"raw": {
                      "Normalize": {"enabled": True, "min_value": 0.0,
                                    "max_value": 255.0},
                      "ToTensor": {"enabled": True, "expand_dims": False}}}},
    }
    ds = create_dataset(cfg, phase="train").datasets[0]
    random.seed(0)
    seen_b = set()
    norm = {k: np.clip(2 * (v.astype(np.float32) / 255) - 1, -1, 1)
            for k, v in vols.items()}
    for _ in range(24):
        item = ds.get_item(5)
        # identify which modality B came from (idx 5, thickness 4 -> raw 5)
        for k in vols:
            if np.allclose(item["B"][0], norm[k][5], atol=1e-6):
                seen_b.add(k)
    assert len(seen_b) >= 2, seen_b


def test_cat_inputs_concatenates_modalities(tmp_path):
    """cat_inputs=True stacks the windows of every input modality except the
    output one (reference: cmsr_dataset.py:115-119, 130-142)."""
    import h5py
    import random

    from afcm_tpu.data import create_dataset

    vols = {"t1": _volume(6, (12, 96, 96)), "t2": _volume(7, (12, 96, 96)),
            "flair": _volume(8, (12, 96, 96))}
    d = tmp_path / "train"
    os.makedirs(d)
    with h5py.File(d / "s.h5", "w") as f:
        for k, v in vols.items():
            f[k] = v

    cfg = {
        "dataset_mode": "cmsr", "batch_size": 2, "serial_batches": True,
        "raw_internal_path_in": ["t1", "t2", "flair"],
        "raw_internal_path_out": ["t1"],
        "rand_output": False, "cat_inputs": True, "thickness": [4],
        "slice_num": 4, "global_normalization": None,
        "train": {"file_paths": [str(d)],
                  "slice_builder": {"name": "SliceBuilder",
                                    "patch_shape": [1, 96, 96],
                                    "stride_shape": [1, 16, 16]},
                  "transformer": {"raw": {
                      "Normalize": {"enabled": True, "min_value": 0.0,
                                    "max_value": 255.0},
                      "ToTensor": {"enabled": True, "expand_dims": False}}}},
    }
    ds = create_dataset(cfg, phase="train").datasets[0]
    random.seed(0)
    item = ds.get_item(5)
    # output modality t1 excluded -> inputs t2+flair, each a 4-slice window
    assert item["A"].shape == (8, 96, 96)
    norm = {k: np.clip(2 * (v.astype(np.float32) / 255) - 1, -1, 1)
            for k, v in vols.items()}
    # idx 5, thickness 4 -> window anchors [0(->1? no: idx_a=4 -> [0,4,8,None])]
    # verify channel 1 (anchor of first input modality t2) and channel 5
    # (anchor of flair)
    np.testing.assert_allclose(item["A"][1], norm["t2"][4], atol=1e-6)
    np.testing.assert_allclose(item["A"][5], norm["flair"][4], atol=1e-6)
