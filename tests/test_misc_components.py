"""Smaller surface components: HTML gallery, EasyDict, config compat,
tri-axial metrics, image datasets."""

import os

import numpy as np
import pytest

from afcm_tpu.config import CfgNode
from afcm_tpu.config.compat import upgrade_config
from afcm_tpu.utils.easydict import EasyDict
from afcm_tpu.utils.html import HTML
from afcm_tpu.utils.metrics import evaluate_one, threed_psnr, threed_ssim


def test_easydict():
    d = EasyDict(a=1)
    d.b = 2
    assert d.a == 1 and d["b"] == 2
    del d.a
    with pytest.raises(AttributeError):
        _ = d.a


def test_html_gallery(tmp_path):
    page = HTML(str(tmp_path), "test experiment")
    page.add_header("epoch 1")
    page.add_images(["x.png"], ["fake_B"], ["x.png"])
    page.save()
    content = open(tmp_path / "index.html").read()
    assert "epoch 1" in content and "x.png" in content
    assert os.path.isdir(page.get_image_dir())


def test_config_upgrade():
    cfg = CfgNode({"VERSION": 1, "name": "x"})
    out = upgrade_config(cfg, 2)
    assert out.VERSION == 2
    with pytest.raises(AssertionError):
        upgrade_config(CfgNode({"VERSION": 3, "name": "x"}), 2)


def test_triaxial_metrics(rng):
    a = rng.rand(8, 16, 16)
    assert threed_ssim(a, a) == pytest.approx(1.0)
    assert threed_psnr(a, a * 0.99 + 0.005) > 20
    p, s, m = evaluate_one(a, a)
    assert s == pytest.approx(1.0) and m == 0.0


@pytest.fixture
def image_root(tmp_path):
    from PIL import Image
    root = tmp_path / "pix"
    for split in ("train",):
        os.makedirs(root / split)
        for i in range(3):
            arr = (np.random.RandomState(i).rand(64, 128, 3) * 255).astype("uint8")
            Image.fromarray(arr).save(root / split / f"{i}.png")
    os.makedirs(root / "trainA")
    os.makedirs(root / "trainB")
    for i in range(2):
        arr = (np.random.RandomState(i).rand(64, 64, 3) * 255).astype("uint8")
        Image.fromarray(arr).save(root / "trainA" / f"{i}.png")
        Image.fromarray(arr).save(root / "trainB" / f"{i}.png")
    return str(root)


def test_aligned_dataset(image_root):
    from afcm_tpu.data.image_datasets import AlignedDataset
    ds = AlignedDataset(image_root, phase="train", load_size=72, crop_size=64)
    assert len(ds) == 3
    item = ds.get_item(0)
    assert item["A"].shape == (1, 64, 64)
    assert item["B"].shape == (1, 64, 64)
    assert item["A"].min() >= -1 and item["A"].max() <= 1


def test_unaligned_and_single_dataset(image_root):
    from afcm_tpu.data.image_datasets import SingleDataset, UnalignedDataset
    ds = UnalignedDataset(image_root, phase="train", load_size=72,
                          crop_size=64, serial_batches=True,
                          input_nc=3, output_nc=3)
    item = ds.get_item(1)
    assert item["A"].shape == (3, 64, 64)
    assert item["B"].shape == (3, 64, 64)
    # default channel count matches this repo's 1-channel MR configs
    assert UnalignedDataset(image_root, phase="train", load_size=72,
                            crop_size=64,
                            serial_batches=True).get_item(0)["A"].shape \
        == (1, 64, 64)
    single = SingleDataset(os.path.join(image_root, "trainA"), load_size=64,
                           crop_size=64)
    assert single.get_item(0)["A"].shape == (1, 64, 64)


def test_ssim_rejects_small_extent(rng):
    """skimage parity: win_size larger than any dim raises instead of
    silently returning NaN from an empty interior crop."""
    from afcm_tpu.utils.metrics import ssim
    a = rng.rand(5, 32, 32)
    with pytest.raises(ValueError, match="win_size"):
        ssim(a, a)
    # a smaller window still works
    assert ssim(a, a, win_size=5) == pytest.approx(1.0)
