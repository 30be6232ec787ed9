"""AutoAugment tests (reference: megatron/data/autoaugment.py ImageNet
policy)."""
import numpy as np
from PIL import Image

from megatron_clip_tpu.data.autoaugment import (
    ImageNetAutoAugment, IMAGENET_POLICY, _OPS)
from megatron_clip_tpu.data.transforms import image_transform


def test_policy_tables_complete():
    assert len(IMAGENET_POLICY) == 25
    for sub in IMAGENET_POLICY:
        assert sub[0] in _OPS and sub[3] in _OPS
        assert 0.0 <= sub[1] <= 1.0 and 0 <= sub[2] <= 10


def test_all_ops_run_on_an_image():
    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 255, (48, 48, 3), np.uint8))
    import random
    for name, (fn, max_mag) in _OPS.items():
        out = fn(img, max_mag * 0.5 if max_mag else 0)
        assert out.size == img.size, name


def test_deterministic_under_seed():
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 255, (64, 64, 3), np.uint8)
    a = np.asarray(ImageNetAutoAugment(seed=7)(Image.fromarray(arr)))
    b = np.asarray(ImageNetAutoAugment(seed=7)(Image.fromarray(arr)))
    c = np.asarray(ImageNetAutoAugment(seed=8)(Image.fromarray(arr)))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (64, 64, 3)
    # different seeds usually differ (probabilistic ops; seed 8 picked to
    # produce a different sub-policy here)
    assert not np.array_equal(a, c)


def test_transform_integration():
    import random as pyrandom
    tr = image_transform(32, True, rng=pyrandom.Random(0), autoaugment=True)
    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 255, (48, 48, 3), np.uint8))
    out = tr(img)
    assert out.shape == (32, 32, 3) and out.dtype == np.float32
