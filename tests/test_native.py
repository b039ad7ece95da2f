"""Native C++ data ops vs numpy fallback + dataset-path equivalence."""

import numpy as np
import pytest

from afcm_tpu.native import (accumulate_patches, assemble_windows,
                             have_native)
from afcm_tpu.native import ops as native_ops


def test_native_builds():
    assert have_native(), "g++ toolchain expected in this environment"


def test_assemble_windows_matches_fallback(rng, monkeypatch):
    volume = (rng.rand(10, 32, 32) * 255).astype(np.uint8)
    idx = np.array([[-1, 0, 4, 8], [0, 2, 9, 12]], dtype=np.int32)
    got = assemble_windows(volume, idx, 0.0, 255.0)

    monkeypatch.setattr(native_ops, "get_native", lambda: None)
    want = assemble_windows(volume, idx, 0.0, 255.0)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # out-of-range rows become the normalized zero value (-1 for [0,255])
    np.testing.assert_allclose(got[0, 0], -1.0)
    np.testing.assert_allclose(got[1, 3], -1.0)  # idx 12 >= depth


def test_assemble_windows_matches_dataset_normalize(rng):
    volume = (rng.rand(6, 16, 16) * 255).astype(np.uint8)
    idx = np.array([[1, 2, 3, 4]], dtype=np.int32)
    got = assemble_windows(volume, idx, 0.0, 255.0)
    want = np.clip(2 * (volume[1:5].astype(np.float32) / 255.0) - 1, -1, 1)
    np.testing.assert_allclose(got[0], want, atol=1e-6)


def test_native_batch_matches_per_item_path(tmp_path, rng):
    """CmsrDataset.get_batch (native gather) == stacked get_item results."""
    import os
    from afcm_tpu.data import CmsrDataset
    from afcm_tpu.data.demo import write_demo_tree
    from tests.test_data import _loaders_config

    root = write_demo_tree(str(tmp_path / "h5"), n_train=0, n_val=2, n_test=0,
                           depth=12, size=96)
    cfg = _loaders_config(root)
    ds = CmsrDataset(cfg, phase="val")
    idxs = [0, 3, 7, 13]  # spans both subjects
    batch = ds.get_batch(idxs)
    assert batch is not None, "native fast path should be eligible"
    for i, idx in enumerate(idxs):
        item = ds.get_item(idx)
        np.testing.assert_allclose(batch["A"][i], item["A"], atol=1e-6)
        np.testing.assert_allclose(batch["B"][i], item["B"], atol=1e-6)
        np.testing.assert_allclose(batch["slice_idx"][i], item["slice_idx"],
                                   atol=1e-7)


def test_predictor_native_stitch_matches_reference_path(rng):
    """StandardPredictor._accumulate_native == the remove_halo loop."""
    from afcm_tpu.infer.predictor import StandardPredictor, remove_halo

    d, h, w = 3, 64, 64
    pred = StandardPredictor(forward_fn=None, output_dir="/tmp/x", config=None,
                            patch_halo=(0, 8, 8))
    # overlapping 32x32 patches at stride 16 incl. boundary cases
    indices = []
    for z in range(d):
        for y in (0, 16, 32):
            for x in (0, 16, 32):
                indices.append((slice(z, z + 1), slice(y, y + 32),
                                slice(x, x + 32)))
    patches = rng.randn(len(indices), 1, 1, 32, 32).astype(np.float32)

    pmap_n = np.zeros((1, d, h, w), np.float32)
    nmask_n = np.zeros((1, d, h, w), np.uint16)
    ok = pred._accumulate_native(patches, indices, (d, h, w), pmap_n, nmask_n)
    assert ok

    pmap_r = np.zeros((1, d, h, w), np.float32)
    nmask_r = np.zeros((1, d, h, w), np.uint16)
    for p, index in zip(patches, indices):
        index = (slice(0, 1),) + tuple(index)
        u_p, u_i = remove_halo(p, index, (d, h, w), (0, 8, 8))
        pmap_r[u_i] += u_p
        nmask_r[u_i] += 1

    np.testing.assert_allclose(pmap_n, pmap_r, atol=1e-6)
    np.testing.assert_array_equal(nmask_n, nmask_r)


def test_accumulate_patches_matches_fallback(rng, monkeypatch):
    d, h, w = 4, 32, 32
    patches = rng.randn(3, 16, 16).astype(np.float32)
    coords = np.array([[0, 0, 0], [1, 8, 8], [1, 10, 10]], dtype=np.int32)
    offsets = np.array([[0, 0], [2, 2], [0, 4]], dtype=np.int32)
    sizes = np.array([[16, 16], [12, 12], [10, 8]], dtype=np.int32)

    pmap1 = np.zeros((d, h, w), np.float32)
    nmask1 = np.zeros((d, h, w), np.uint16)
    accumulate_patches(pmap1, nmask1, patches, coords, offsets, sizes)

    monkeypatch.setattr(native_ops, "get_native", lambda: None)
    pmap2 = np.zeros((d, h, w), np.float32)
    nmask2 = np.zeros((d, h, w), np.uint16)
    accumulate_patches(pmap2, nmask2, patches, coords, offsets, sizes)

    np.testing.assert_allclose(pmap1, pmap2, atol=1e-6)
    np.testing.assert_array_equal(nmask1, nmask2)
    assert nmask1.max() >= 2  # overlapping region accumulated twice


def test_native_ssim_matches_numpy_oracle(rng, monkeypatch):
    """The fused C++ ssim_mean matches the scipy/numpy composition (the
    skimage-semantics oracle in utils/metrics.py) to float64 epsilon, for
    2-D slices and 3-D volumes, smooth and noisy pairs."""
    from afcm_tpu.utils import metrics
    from afcm_tpu import native

    def numpy_ssim(x, y, **kw):
        monkeypatch.setattr("afcm_tpu.native.ops.get_native", lambda: None)
        try:
            return metrics.ssim(x, y, **kw)
        finally:
            monkeypatch.undo()

    for shape in [(16, 64, 64), (64, 64), (9, 11), (8, 9, 10)]:
        x = rng.rand(*shape)
        y = np.clip(x + 0.1 * rng.randn(*shape), 0, 1)
        want = numpy_ssim(x, y)
        got = metrics.ssim(x, y)
        assert abs(got - want) < 1e-12, (shape, got, want)
        # non-default window + data_range
        want5 = numpy_ssim(x, y, win_size=5, data_range=1.0)
        got5 = metrics.ssim(x, y, win_size=5, data_range=1.0)
        assert abs(got5 - want5) < 1e-12
    # identical inputs -> exactly 1 (both paths)
    x = rng.rand(12, 32, 32)
    assert metrics.ssim(x, x.copy()) == pytest.approx(1.0, abs=1e-12)
    # fallback gates: even window / tiny dims return None from native
    assert native.ssim_mean(np.zeros((4, 4)), np.zeros((4, 4)),
                            7, 1e-4, 9e-4, 1.02) is None


def test_native_err_stats_matches_numpy(rng, monkeypatch):
    from afcm_tpu.utils import metrics
    a = rng.rand(16, 64, 64)
    b = np.clip(a + 0.1 * rng.randn(*a.shape), 0, 1)
    got_psnr, got_mae = metrics.psnr(a, b), metrics.mae(a, b)
    monkeypatch.setattr("afcm_tpu.native.ops.get_native", lambda: None)
    want_psnr, want_mae = metrics.psnr(a, b), metrics.mae(a, b)
    assert abs(got_psnr - want_psnr) < 1e-10
    assert abs(got_mae - want_mae) < 1e-14


def test_native_slice_metrics_matches_loops(rng, monkeypatch):
    """Fused slice_metrics == the per-slice Python loops (reference
    evaluation.py:116-121 semantics: own-max PSNR normalization,
    data-range-2, empty-target slices skipped)."""
    from afcm_tpu.native import slice_metrics
    from afcm_tpu.utils import metrics

    for shape in [(16, 64, 64), (9, 33, 41)]:
        l = rng.rand(*shape)
        g = np.clip(l + 0.1 * rng.randn(*shape), 0, 1)
        l[3] = 0.0  # empty TARGET slice: both metrics must skip it
        want = (metrics.threed_slice_psnr(g, l),
                metrics.threed_slice_ssim(g, l))
        got = slice_metrics(g, l, 7, (0.01 * 2) ** 2, (0.03 * 2) ** 2,
                            49 / 48)
        assert got is not None and got[2] == shape[0] - 1
        assert abs(got[0] - want[0]) < 1e-10, (shape, got, want)
        assert abs(got[1] - want[1]) < 1e-12, (shape, got, want)
        # the evaluate_slice entry routes through the native path and
        # equals the loop composition (incl. mae)
        e_native = metrics.evaluate_slice(g, l)
        monkeypatch.setattr("afcm_tpu.native.ops.get_native", lambda: None)
        e_loop = metrics.evaluate_slice(g, l)
        monkeypatch.undo()
        assert np.allclose(e_native, e_loop, rtol=0, atol=1e-10)
    # gates: 2D input / even window fall back to None
    assert slice_metrics(np.zeros((8, 8)), np.zeros((8, 8)),
                         7, 1e-4, 9e-4, 49 / 48) is None
