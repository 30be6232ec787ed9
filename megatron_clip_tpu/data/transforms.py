"""Image preprocessing, matching open_CLIP's transforms
(open_CLIP/src/open_clip/transform.py:56-133, constants.py) but emitting
NHWC float32 numpy arrays (TPU-native layout) instead of CHW torch tensors:

  train: RandomResizedCrop(size, scale=(0.9, 1.0), bicubic) -> normalize
  val:   Resize(shortest side -> size, bicubic) -> CenterCrop -> normalize

Decode/resize runs on host CPU (numpy/PIL); normalization constants are the
OpenAI CLIP dataset statistics.
"""
import math
import random
from typing import Optional, Sequence

import numpy as np

OPENAI_DATASET_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_DATASET_STD = (0.26862954, 0.26130258, 0.27577711)


def _to_pil(img):
    from PIL import Image
    if isinstance(img, Image.Image):
        return img.convert("RGB")
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    return Image.fromarray(arr).convert("RGB")


def _normalize(arr: np.ndarray, mean, std) -> np.ndarray:
    arr = arr.astype(np.float32) / 255.0
    return (arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def _random_resized_crop(img, size: int, scale=(0.9, 1.0),
                         ratio=(3 / 4, 4 / 3), rng: Optional[random.Random] = None):
    """torchvision RandomResizedCrop semantics (10 tries then center fallback)."""
    from PIL import Image
    rng = rng or random
    w, h = img.size
    area = w * h
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
        aspect = math.exp(rng.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            x = rng.randint(0, w - cw)
            y = rng.randint(0, h - ch)
            return img.resize((size, size), Image.BICUBIC,
                              box=(x, y, x + cw, y + ch))
    # fallback: center crop of the constrained aspect
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        cw, ch = int(round(h * ratio[1])), h
    else:
        cw, ch = w, h
    x, y = (w - cw) // 2, (h - ch) // 2
    return img.resize((size, size), Image.BICUBIC, box=(x, y, x + cw, y + ch))


def _resize_center_crop(img, size: int):
    from PIL import Image
    w, h = img.size
    short = min(w, h)
    nw, nh = int(round(w * size / short)), int(round(h * size / short))
    img = img.resize((nw, nh), Image.BICUBIC)
    x, y = (nw - size) // 2, (nh - size) // 2
    return img.crop((x, y, x + size, y + size))


def image_transform(image_size: int, is_train: bool,
                    mean: Optional[Sequence[float]] = None,
                    std: Optional[Sequence[float]] = None,
                    resize_longest_max: bool = False,
                    rng: Optional[random.Random] = None,
                    autoaugment: bool = False):
    """Returns f(PIL/array) -> np.float32 [H, W, 3] normalized NHWC slice.
    autoaugment=True applies the ImageNet AutoAugment policy before the
    crop (train only; megatron/data/autoaugment.py surface)."""
    mean = tuple(mean or OPENAI_DATASET_MEAN)
    std = tuple(std or OPENAI_DATASET_STD)
    aa = None
    if autoaugment and is_train:
        from megatron_clip_tpu.data.autoaugment import ImageNetAutoAugment
        aa = ImageNetAutoAugment(seed=getattr(rng, "random", None)
                                 and rng.randint(0, 2 ** 31))

    def preprocess(img):
        img = _to_pil(img)
        if is_train:
            if aa is not None:
                img = aa(img)
            img = _random_resized_crop(img, image_size, rng=rng)
        else:
            img = _resize_center_crop(img, image_size)
        return _normalize(np.asarray(img, dtype=np.uint8), mean, std)

    preprocess.image_size = image_size
    preprocess.mean, preprocess.std = mean, std
    return preprocess
