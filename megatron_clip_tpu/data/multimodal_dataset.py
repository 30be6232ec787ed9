"""Multimodal (image, caption) indexed dataset.

Reference surface: megatron/data/multimodal_dataset.py:19-54 (paired text +
raw-image indexed datasets produced by tools/preprocess_mmdata.py:171). The
corpus is two MMap indexed datasets sharing sample order:

  <prefix>_text.bin/.idx   int32 token ids per caption
  <prefix>_img.bin/.idx    uint8 encoded image bytes (png/jpeg) per sample

Items decode the image, apply the CLIP transform, and pad/truncate tokens
to context_length — ready to feed the CLIP train step.
"""
import io
from typing import Callable, Optional

import numpy as np

from megatron_clip_tpu.data.indexed_dataset import MMapIndexedDataset


class MultimodalDataset:
    def __init__(self, prefix: str, *, transform: Optional[Callable] = None,
                 context_length: int = 77):
        self.text = MMapIndexedDataset(prefix + "_text")
        self.img = MMapIndexedDataset(prefix + "_img")
        if len(self.text) != len(self.img):
            raise ValueError(
                f"text/img sample counts differ: {len(self.text)} vs "
                f"{len(self.img)}")
        self.transform = transform
        self.context_length = context_length

    def __len__(self):
        return len(self.text)

    def __getitem__(self, idx: int):
        from PIL import Image
        raw = np.asarray(self.img[idx], np.uint8).tobytes()
        img = Image.open(io.BytesIO(raw))
        img.load()
        if self.transform is not None:
            img = self.transform(img)
        toks = np.asarray(self.text[idx], np.int32)
        out = np.zeros(self.context_length, np.int32)
        n = min(len(toks), self.context_length)
        out[:n] = toks[:n]
        return img, out

    def batches(self, batch_size: int, *, shuffle: bool = True,
                seed: int = 0, epochs: int = 1):
        rng = np.random.RandomState(seed)
        for _ in range(epochs):
            order = np.arange(len(self))
            if shuffle:
                rng.shuffle(order)
            for lo in range(0, len(order) - batch_size + 1, batch_size):
                rows = [self[i] for i in order[lo:lo + batch_size]]
                yield (np.stack([r[0] for r in rows]),
                       np.stack([r[1] for r in rows]))
