"""tasks/vision: classification finetune + SegFormer segmentation
(reference tasks/vision/classification/classification.py,
segmentation/finetune_segformer.py). Synthetic easily-separable data: the
finetunes must actually learn (accuracy / mIoU well above chance)."""
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def image_folder(tmp_path_factory):
    """3-class ImageFolder: each class is a distinct solid color + noise."""
    from PIL import Image
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    colors = [(220, 40, 40), (40, 220, 40), (40, 40, 220)]
    for ci, col in enumerate(colors):
        d = root / f"class{ci}"
        d.mkdir()
        for i in range(12):
            img = np.clip(np.asarray(col, np.float32)[None, None]
                          + rng.randn(32, 32, 3) * 20, 0, 255
                          ).astype(np.uint8)
            Image.fromarray(img).save(d / f"{i}.png")
    return str(root)


def test_vision_classify_learns(image_folder):
    from tasks.main import parse_args, run
    out = run(parse_args([
        "--task", "vision-classify", "--data-dir", image_folder,
        "--num-layers", "2", "--hidden-size", "64", "--patch-size", "8",
        "--img-size", "32", "--batch-size", "12", "--epochs", "4",
        "--lr", "1e-3"]))
    assert out["num_classes"] == 3
    assert out["dev_accuracy"] > 0.6, out   # chance = 1/3


@pytest.fixture(scope="module")
def seg_folder(tmp_path_factory):
    """images/ + masks/: left half class 0 (dark), right half class 1
    (bright); a strip of ignore labels along the boundary."""
    from PIL import Image
    root = tmp_path_factory.mktemp("seg")
    (root / "images").mkdir()
    (root / "masks").mkdir()
    rng = np.random.RandomState(0)
    for i in range(8):
        img = np.zeros((32, 32, 3), np.float32)
        img[:, :16] = 40 + rng.randn(32, 16, 3) * 10
        img[:, 16:] = 210 + rng.randn(32, 16, 3) * 10
        mask = np.zeros((32, 32), np.uint8)
        mask[:, 16:] = 1
        mask[:, 15:17] = 255          # ignore strip
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)
                        ).save(root / "images" / f"{i}.png")
        Image.fromarray(mask).save(root / "masks" / f"{i}.png")
    return str(root)


def test_vision_segment_learns(seg_folder):
    from tasks.main import parse_args, run
    out = run(parse_args([
        "--task", "vision-segment", "--data-dir", seg_folder,
        "--num-classes", "2", "--img-size", "32", "--batch-size", "4",
        "--epochs", "6", "--lr", "1e-3", "--seg-embed-dim", "32",
        "--seg-depths", "1", "1", "1", "1"]))
    assert out["miou"] > 0.6, out           # trivially separable halves


def test_vision_segment_setr_learns(seg_folder):
    """--seg-arch setr: plain-ViT encoder + progressive-upsampling head
    (the reference's finetune_setr.py harness)."""
    from tasks.main import parse_args, run
    out = run(parse_args([
        "--task", "vision-segment", "--seg-arch", "setr",
        "--data-dir", seg_folder,
        "--num-classes", "2", "--img-size", "32", "--batch-size", "4",
        "--epochs", "6", "--lr", "1e-3", "--seg-embed-dim", "32",
        "--num-layers", "2", "--hidden-size", "64", "--patch-size", "8"]))
    assert out["miou"] > 0.6, out


@pytest.fixture(scope="module")
def cityscapes_root(tmp_path_factory):
    """Official layout: leftImg8bit_trainvaltest/leftImg8bit/train/<city>/
    *_leftImg8bit.png + gtFine_trainvaltest/gtFine/... _gtFine_labelIds.png.
    Left half road (labelId 7 -> trainId 0), right half sky (23 -> 10),
    a center column of void (0 -> ignore 19)."""
    from PIL import Image
    root = tmp_path_factory.mktemp("cs")
    rng = np.random.RandomState(0)
    for city in ("aaa", "bbb"):
        imd = root / "leftImg8bit_trainvaltest" / "leftImg8bit" / "train" / city
        gtd = root / "gtFine_trainvaltest" / "gtFine" / "train" / city
        imd.mkdir(parents=True)
        gtd.mkdir(parents=True)
        for i in range(4):
            img = np.zeros((32, 32, 3), np.uint8)
            img[:, :16] = (90, 60, 90)
            img[:, 16:] = (70, 130, 180)
            img = np.clip(img + rng.randn(32, 32, 3) * 10, 0, 255
                          ).astype(np.uint8)
            mask = np.zeros((32, 32), np.uint8)
            mask[:, :16] = 7
            mask[:, 16:] = 23
            mask[:, 15:17] = 0
            base = f"{city}_0000{i}_000019"
            Image.fromarray(img).save(imd / f"{base}_leftImg8bit.png")
            Image.fromarray(mask).save(gtd / f"{base}_gtFine_labelIds.png")
    return str(root)


def test_cityscapes_loader_remap(cityscapes_root):
    from tasks.vision import (_scan_cityscapes, _decode_seg_batch,
                              _CITYSCAPES_REMAP, CITYSCAPES_IGNORE)
    pairs = _scan_cityscapes(cityscapes_root, "train")
    xs, ys = _decode_seg_batch(pairs, 32, _CITYSCAPES_REMAP)
    assert xs.shape == (8, 32, 32, 3) and ys.shape == (8, 32, 32)
    assert set(np.unique(ys)) == {0, 10, CITYSCAPES_IGNORE}
    assert (ys[:, :, :8] == 0).all() and (ys[:, :, -8:] == 10).all()


def test_vision_segment_cityscapes(cityscapes_root):
    from tasks.main import parse_args, run
    out = run(parse_args([
        "--task", "vision-segment", "--seg-dataset", "cityscapes",
        "--data-dir", cityscapes_root, "--img-size", "32",
        "--patch-size", "8", "--batch-size", "4", "--epochs", "3",
        "--seg-dims", "16", "32", "40", "64",
        "--seg-depths", "1", "1", "1", "1", "--seg-embed-dim", "32",
        "--lr", "3e-3"]))
    assert out["num_classes"] == 19
    assert out["miou"] > 0.5, out   # two trivially-separable classes
