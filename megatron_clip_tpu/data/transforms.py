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
import warnings
from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence, Tuple, Union

import numpy as np

OPENAI_DATASET_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_DATASET_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclass
class AugmentationCfg:
    """open_CLIP's train-time augmentation config (transform.py:15-23,
    CLI `--aug-cfg scale=(0.8,1.0) color_jitter=0.4 ...`).

    The reference's non-timm path consumes only `scale`; here scale, ratio,
    color_jitter (+ color_jitter_prob) and gray_scale_prob are implemented
    natively (PIL/numpy), and the timm-only knobs (re_prob/re_count random
    erasing, interpolation=random) warn-and-skip like the reference warns
    for its unused items."""
    scale: Tuple[float, float] = (0.9, 1.0)
    ratio: Optional[Tuple[float, float]] = None
    color_jitter: Optional[Union[float, Tuple[float, ...]]] = None
    color_jitter_prob: Optional[float] = None
    gray_scale_prob: Optional[float] = None
    interpolation: Optional[str] = None
    re_prob: Optional[float] = None
    re_count: Optional[int] = None
    use_timm: bool = False


def parse_aug_cfg(items) -> Optional[AugmentationCfg]:
    """Parse the CLI form: a list of 'key=value' strings (open_CLIP
    params.py --aug-cfg nargs='*'), values python-literal-eval'd."""
    if not items:
        return None
    import ast
    kw: Dict[str, Any] = {}
    for it in items:
        k, _, v = it.partition("=")
        k = k.replace("-", "_")
        try:
            kw[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            kw[k] = v
    return AugmentationCfg(**kw)


def _color_jitter(img, strength, hue, rng: random.Random):
    """torchvision ColorJitter semantics: brightness/contrast/saturation
    factors ~ U[max(0, 1-s), 1+s] applied in random order, hue shift
    ~ U[-h, h] (fraction of the hue wheel)."""
    from PIL import ImageEnhance
    ops = []
    names = ("brightness", "contrast", "saturation")
    for name, s in zip(names, strength):
        if s and s > 0:
            lo, hi = max(0.0, 1.0 - s), 1.0 + s
            ops.append((name, rng.uniform(lo, hi)))
    rng.shuffle(ops)
    enh = {"brightness": ImageEnhance.Brightness,
           "contrast": ImageEnhance.Contrast,
           "saturation": ImageEnhance.Color}
    for name, f in ops:
        img = enh[name](img).enhance(f)
    if hue and hue > 0:
        shift = rng.uniform(-hue, hue)
        hsv = np.asarray(img.convert("HSV"), dtype=np.int16)
        hsv[..., 0] = (hsv[..., 0] + int(round(shift * 255))) % 256
        from PIL import Image
        img = Image.fromarray(hsv.astype(np.uint8), "HSV").convert("RGB")
    return img


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
                    autoaugment: bool = False,
                    aug_cfg: Optional[Union[AugmentationCfg, Dict, list]] = None):
    """Returns f(PIL/array) -> np.float32 [H, W, 3] normalized NHWC slice.
    autoaugment=True applies the ImageNet AutoAugment policy before the
    crop (train only; megatron/data/autoaugment.py surface). aug_cfg is the
    open_CLIP AugmentationCfg (or its CLI 'k=v' list form)."""
    mean = tuple(mean or OPENAI_DATASET_MEAN)
    std = tuple(std or OPENAI_DATASET_STD)
    if isinstance(image_size, (list, tuple)):
        # open_CLIP accepts (h, w); square towers here (transform.py:73-75)
        image_size = int(image_size[0])
    if isinstance(aug_cfg, (list, tuple)):
        aug_cfg = parse_aug_cfg(aug_cfg)
    elif isinstance(aug_cfg, dict):
        aug_cfg = AugmentationCfg(**aug_cfg)
    aug_cfg = aug_cfg or AugmentationCfg()
    unused = [k for k in ("re_prob", "re_count", "interpolation")
              if getattr(aug_cfg, k) is not None]
    if aug_cfg.use_timm:
        unused.append("use_timm")
    if unused and is_train:
        warnings.warn(f"aug_cfg items not implemented natively, skipped: "
                      f"{unused} (open_CLIP transform.py non-timm parity)")
    scale = tuple(aug_cfg.scale)
    ratio = tuple(aug_cfg.ratio) if aug_cfg.ratio else (3 / 4, 4 / 3)
    cj = aug_cfg.color_jitter
    if cj is not None and not isinstance(cj, (list, tuple)):
        cj = (cj, cj, cj)
    cj_hue = float(cj[3]) if cj is not None and len(cj) > 3 else 0.0
    cj_prob = aug_cfg.color_jitter_prob
    if cj is not None and cj_prob is None:
        cj_prob = 1.0  # plain ColorJitter (not RandomApply) when no prob
    gray_prob = aug_cfg.gray_scale_prob
    aa = None
    if autoaugment and is_train:
        from megatron_clip_tpu.data.autoaugment import ImageNetAutoAugment
        aa = ImageNetAutoAugment(seed=getattr(rng, "random", None)
                                 and rng.randint(0, 2 ** 31))

    def preprocess(img):
        img = _to_pil(img)
        if is_train:
            r = rng or random
            if aa is not None:
                img = aa(img)
            img = _random_resized_crop(img, image_size, scale=scale,
                                       ratio=ratio, rng=rng)
            if cj is not None and r.random() < cj_prob:
                img = _color_jitter(img, cj[:3], cj_hue, r)
            if gray_prob and r.random() < gray_prob:
                img = img.convert("L").convert("RGB")
        else:
            img = _resize_center_crop(img, image_size)
        return _normalize(np.asarray(img, dtype=np.uint8), mean, std)

    preprocess.image_size = image_size
    preprocess.mean, preprocess.std = mean, std
    return preprocess
