"""ImageFolder-style classification data (reference:
megatron/data/image_folder.py + vit_dataset.py ClassificationTransform):
`root/<class_name>/*.jpg` directories -> (image, label) batches with the
train transform."""
import os
import random
from typing import Iterator, List, Tuple

import numpy as np

from megatron_clip_tpu.data.transforms import image_transform

_EXTS = (".jpg", ".jpeg", ".png", ".webp", ".bmp")


def scan_image_folder(root: str) -> Tuple[List[Tuple[str, int]], List[str]]:
    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    samples = []
    for idx, c in enumerate(classes):
        cdir = os.path.join(root, c)
        for fn in sorted(os.listdir(cdir)):
            if fn.lower().endswith(_EXTS):
                samples.append((os.path.join(cdir, fn), idx))
    return samples, classes


def image_folder_batches(root: str, batch_size: int, image_size: int, *,
                         is_train: bool = True, seed: int = 0,
                         epochs: int = -1) -> Iterator:
    from PIL import Image
    samples, _ = scan_image_folder(root)
    if not samples:
        raise ValueError(f"no class-dir images under {root}")
    pp = image_transform(image_size, is_train=is_train)
    rng = random.Random(seed)
    epoch = 0
    while epochs < 0 or epoch < epochs:
        order = list(range(len(samples)))
        if is_train:
            rng.shuffle(order)
        for lo in range(0, len(order) - batch_size + 1, batch_size):
            imgs, labels = [], []
            for i in order[lo:lo + batch_size]:
                path, label = samples[i]
                with Image.open(path) as im:
                    imgs.append(pp(im))
                labels.append(label)
            yield np.stack(imgs), np.asarray(labels, np.int32)
        epoch += 1
