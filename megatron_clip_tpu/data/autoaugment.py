"""AutoAugment: ImageNet policy (host-side PIL augmentation).

Covers the reference's megatron/data/autoaugment.py (~320 LoC): the
25-sub-policy ImageNet policy from Cubuk et al. — each sample draws one
sub-policy of two (op, probability, magnitude) steps. Ops are PIL
transforms; magnitudes follow the paper's discrete 10-level ranges.
"""
import random
from typing import Callable, List, Tuple

from PIL import Image, ImageEnhance, ImageOps

_MAX_LEVEL = 10


def _shear_x(img, mag):
    return img.transform(img.size, Image.AFFINE, (1, mag, 0, 0, 1, 0),
                         fillcolor=(128, 128, 128))


def _shear_y(img, mag):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, mag, 1, 0),
                         fillcolor=(128, 128, 128))


def _translate_x(img, mag):
    return img.transform(img.size, Image.AFFINE,
                         (1, 0, mag * img.size[0], 0, 1, 0),
                         fillcolor=(128, 128, 128))


def _translate_y(img, mag):
    return img.transform(img.size, Image.AFFINE,
                         (1, 0, 0, 0, 1, mag * img.size[1]),
                         fillcolor=(128, 128, 128))


_OPS = {
    "ShearX": (_shear_x, 0.3),
    "ShearY": (_shear_y, 0.3),
    "TranslateX": (_translate_x, 150 / 331),
    "TranslateY": (_translate_y, 150 / 331),
    "Rotate": (lambda im, m: im.rotate(m, fillcolor=(128, 128, 128)), 30),
    "Color": (lambda im, m: ImageEnhance.Color(im).enhance(1 + m), 0.9),
    "Posterize": (lambda im, m: ImageOps.posterize(im, max(1, int(m))), 4),
    "Solarize": (lambda im, m: ImageOps.solarize(im, int(m)), 256),
    "Contrast": (lambda im, m: ImageEnhance.Contrast(im).enhance(1 + m), 0.9),
    "Sharpness": (lambda im, m: ImageEnhance.Sharpness(im).enhance(1 + m), 0.9),
    "Brightness": (lambda im, m: ImageEnhance.Brightness(im).enhance(1 + m), 0.9),
    "AutoContrast": (lambda im, m: ImageOps.autocontrast(im), 0),
    "Equalize": (lambda im, m: ImageOps.equalize(im), 0),
    "Invert": (lambda im, m: ImageOps.invert(im), 0),
}

# the published ImageNet policy: 25 sub-policies of
# (op1, p1, level1, op2, p2, level2)
IMAGENET_POLICY: List[Tuple] = [
    ("Posterize", 0.4, 8, "Rotate", 0.6, 9),
    ("Solarize", 0.6, 5, "AutoContrast", 0.6, 5),
    ("Equalize", 0.8, 8, "Equalize", 0.6, 3),
    ("Posterize", 0.6, 7, "Posterize", 0.6, 6),
    ("Equalize", 0.4, 7, "Solarize", 0.2, 4),
    ("Equalize", 0.4, 4, "Rotate", 0.8, 8),
    ("Solarize", 0.6, 3, "Equalize", 0.6, 7),
    ("Posterize", 0.8, 5, "Equalize", 1.0, 2),
    ("Rotate", 0.2, 3, "Solarize", 0.6, 8),
    ("Equalize", 0.6, 8, "Posterize", 0.4, 6),
    ("Rotate", 0.8, 8, "Color", 0.4, 0),
    ("Rotate", 0.4, 9, "Equalize", 0.6, 2),
    ("Equalize", 0.0, 7, "Equalize", 0.8, 8),
    ("Invert", 0.6, 4, "Equalize", 1.0, 8),
    ("Color", 0.6, 4, "Contrast", 1.0, 8),
    ("Rotate", 0.8, 8, "Color", 1.0, 2),
    ("Color", 0.8, 8, "Solarize", 0.8, 7),
    ("Sharpness", 0.4, 7, "Invert", 0.6, 8),
    ("ShearX", 0.6, 5, "Equalize", 1.0, 9),
    ("Color", 0.4, 0, "Equalize", 0.6, 3),
    ("Equalize", 0.4, 7, "Solarize", 0.2, 4),
    ("Solarize", 0.6, 5, "AutoContrast", 0.6, 5),
    ("Invert", 0.6, 4, "Equalize", 1.0, 8),
    ("Color", 0.6, 4, "Contrast", 1.0, 8),
    ("Equalize", 0.8, 8, "Equalize", 0.6, 3),
]


def _apply_op(img, name: str, prob: float, level: int,
              rng: random.Random):
    if rng.random() > prob:
        return img
    fn, max_mag = _OPS[name]
    mag = max_mag * level / _MAX_LEVEL
    if name in ("ShearX", "ShearY", "TranslateX", "TranslateY", "Rotate"):
        if rng.random() < 0.5:
            mag = -mag
    if name == "Solarize":
        mag = 256 - mag        # higher level = stronger solarization
    return fn(img, mag)


class ImageNetAutoAugment:
    """Callable PIL->PIL transform; deterministic under a seeded rng."""

    def __init__(self, seed: int = None):
        self.rng = random.Random(seed)

    def __call__(self, img: Image.Image) -> Image.Image:
        if img.mode != "RGB":
            img = img.convert("RGB")
        sub = self.rng.choice(IMAGENET_POLICY)
        img = _apply_op(img, sub[0], sub[1], sub[2], self.rng)
        img = _apply_op(img, sub[3], sub[4], sub[5], self.rng)
        return img
