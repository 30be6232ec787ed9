"""preprocess_mmdata -> MultimodalDataset end-to-end (reference:
tools/preprocess_mmdata.py + megatron/data/multimodal_dataset.py)."""
import subprocess
import sys

import numpy as np

from megatron_clip_tpu.data.multimodal_dataset import MultimodalDataset
from megatron_clip_tpu.data.transforms import image_transform


def test_preprocess_and_read(tmp_path):
    from PIL import Image
    rng = np.random.RandomState(0)
    pairs = tmp_path / "pairs.tsv"
    lines = []
    for i in range(6):
        p = tmp_path / f"img{i}.png"
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8)).save(p)
        lines.append(f"{p}\ta photo number {i}")
    pairs.write_text("\n".join(lines))

    prefix = str(tmp_path / "mm")
    r = subprocess.run(
        [sys.executable, "tools/preprocess_mmdata.py", "--input", str(pairs),
         "--output-prefix", prefix, "--tokenizer", "clip"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr

    ds = MultimodalDataset(prefix, transform=image_transform(32, False),
                           context_length=16)
    assert len(ds) == 6
    img, toks = ds[3]
    assert img.shape == (32, 32, 3)
    assert toks.shape == (16,)
    assert toks[0] == 49406 and 49407 in toks   # SOT ... EOT
    batches = list(ds.batches(3, epochs=1, shuffle=True, seed=0))
    assert len(batches) == 2
    assert batches[0][0].shape == (3, 32, 32, 3)
