"""open_CLIP augmentation/normalization/resolution CLI tail:
--aug-cfg (transform.py:15-23 AugmentationCfg), --image-mean/--image-std,
--force-image-size (+ resize_pos_embed at checkpoint load, model.py:417)."""
import numpy as np
import pytest

from megatron_clip_tpu.data.transforms import (
    AugmentationCfg, image_transform, parse_aug_cfg,
    OPENAI_DATASET_MEAN, OPENAI_DATASET_STD)


def _img(seed=0, size=96):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (size, size, 3), np.uint8)


def test_parse_aug_cfg_cli_forms():
    cfg = parse_aug_cfg(["scale=(0.5,1.0)", "color_jitter=0.4",
                         "gray_scale_prob=0.2"])
    assert cfg.scale == (0.5, 1.0)
    assert cfg.color_jitter == 0.4
    assert cfg.gray_scale_prob == 0.2
    assert parse_aug_cfg(None) is None
    assert parse_aug_cfg([]) is None


def test_aug_cfg_grayscale_and_jitter():
    import random
    t = image_transform(32, is_train=True, rng=random.Random(0),
                        aug_cfg={"scale": (1.0, 1.0),
                                 "gray_scale_prob": 1.0})
    out = t(_img())
    assert out.shape == (32, 32, 3)
    # grayscale: un-normalized channels equal
    raw = out * np.asarray(OPENAI_DATASET_STD) + np.asarray(OPENAI_DATASET_MEAN)
    assert np.allclose(raw[..., 0], raw[..., 1], atol=1e-6)
    assert np.allclose(raw[..., 1], raw[..., 2], atol=1e-6)

    # color jitter changes pixels vs the un-jittered transform
    t_plain = image_transform(32, is_train=True, rng=random.Random(1),
                              aug_cfg={"scale": (1.0, 1.0)})
    t_jit = image_transform(32, is_train=True, rng=random.Random(1),
                            aug_cfg={"scale": (1.0, 1.0),
                                     "color_jitter": (0.8, 0.8, 0.8, 0.4)})
    a, b = t_plain(_img(2)), t_jit(_img(2))
    assert a.shape == b.shape and not np.allclose(a, b)


def test_aug_cfg_unused_items_warn():
    with pytest.warns(UserWarning, match="re_prob"):
        image_transform(32, is_train=True,
                        aug_cfg=AugmentationCfg(re_prob=0.25))


def test_custom_mean_std():
    mean, std = (0.5, 0.5, 0.5), (0.25, 0.25, 0.25)
    t = image_transform(32, is_train=False, mean=mean, std=std)
    img = np.full((64, 64, 3), 128, np.uint8)
    out = t(img)
    expected = (128 / 255.0 - 0.5) / 0.25
    assert np.allclose(out, expected, atol=1e-5)
    assert t.mean == mean and t.std == std


def test_cli_flags_parse():
    from megatron_clip_tpu.training.params import parse_args
    ns = parse_args(["--aug-cfg", "scale=(0.7,1.0)", "color_jitter=0.3",
                     "--image-mean", "0.5", "0.5", "0.5",
                     "--image-std", "0.2", "0.2", "0.2",
                     "--force-image-size", "128",
                     "--dist-backend", "nccl",
                     "--remote-sync-protocol", "fsspec"])
    assert ns.aug_cfg == ["scale=(0.7,1.0)", "color_jitter=0.3"]
    assert ns.image_mean == [0.5, 0.5, 0.5]
    assert ns.force_image_size == [128]
    with pytest.warns(UserWarning, match="no-op"):
        ns = parse_args(["--use-bn-sync", "--horovod", "--torchscript"])
    assert ns.use_bn_sync and ns.horovod


def test_force_image_size_model_and_transforms():
    from megatron_clip_tpu.factory import create_model_and_transforms
    model, params, pp_train, pp_val = create_model_and_transforms(
        "ViT-B-32", precision="fp32", force_image_size=128, init_params=True)
    assert model.image_size == 128
    # position table sized for the forced grid: (128/32)^2 + 1 = 17
    assert params["visual"]["pos_embed"].shape[0] == 17
    assert pp_val(_img()).shape == (128, 128, 3)


def test_resize_pos_embed_on_load():
    import jax.numpy as jnp
    from megatron_clip_tpu.checkpoints.torch_interop import _resize_pos_embed
    pe = jnp.zeros((50, 8)).at[0].set(7.0)   # 7x7 grid + cls, ViT-B/32@224
    out = _resize_pos_embed(pe, 17)          # 4x4 grid + cls (@128)
    assert out.shape == (17, 8)
    assert np.allclose(np.asarray(out[0]), 7.0)   # cls slot untouched

    # e2e: a 224-trained state dict loads into a force_image_size=128 model
    from megatron_clip_tpu.factory import create_model
    from megatron_clip_tpu.checkpoints.torch_interop import (
        openclip_state_dict_from_params, params_from_openclip_state_dict)
    m224, p224 = create_model("ViT-B-32", precision="fp32", seed=0)
    sd = openclip_state_dict_from_params(p224, m224.cfg)
    m128, _ = create_model("ViT-B-32", precision="fp32", seed=0,
                           force_image_size=128, init_params=False)
    p128 = params_from_openclip_state_dict(sd, m128.cfg)
    assert p128["visual"]["pos_embed"].shape[0] == 17
    # and the model runs at the forced resolution
    import jax
    img = jax.numpy.zeros((1, 128, 128, 3))
    feats = m128.encode_image(p128, img)
    assert feats.shape == (1, m128.cfg.embed_dim)
