"""Cross-implementation golden regression: our CLIP vs the actual open_CLIP.

The fixtures in tests/goldens/ were produced by tools/make_openclip_goldens.py
from the reference torch implementation (open_CLIP/src/open_clip/model.py
CLIP): a torch zip checkpoint + seeded inputs + the reference's
encode_image/encode_text outputs. This replaces self-referential goldens:
feature parity here means the two implementations agree numerically
(open_CLIP/tests/util_test.py:12-50 discipline, applied across frameworks).

Also exercises the torch-free .pt reader end to end.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
PT = os.path.join(GOLDEN_DIR, "openclip_tiny.pt")
NPZ = os.path.join(GOLDEN_DIR, "openclip_tiny_expected.npz")

pytestmark = pytest.mark.skipif(
    not (os.path.isfile(PT) and os.path.isfile(NPZ)),
    reason="golden fixtures missing")


def _tiny_cfg():
    from megatron_clip_tpu.config import CLIPCfg, VisionCfg, TextCfg
    return CLIPCfg(
        embed_dim=64,
        vision=VisionCfg(image_size=32, patch_size=8, width=64,
                         head_width=32, layers=2),
        text=TextCfg(context_length=16, vocab_size=512, width=64, heads=2,
                     layers=2))


def test_pt_reader_matches_torch():
    torch = pytest.importorskip("torch")
    from megatron_clip_tpu.checkpoints.pt_reader import load_state_dict
    ours = load_state_dict(PT)
    ref = torch.load(PT, map_location="cpu", weights_only=True)["state_dict"]
    assert set(ours) == set(ref)
    for k in ref:
        np.testing.assert_array_equal(ours[k], ref[k].numpy(), err_msg=k)


def test_encode_matches_reference_openclip():
    from megatron_clip_tpu.checkpoints.torch_interop import (
        load_openclip_checkpoint)
    from megatron_clip_tpu.config import Precision
    from megatron_clip_tpu.factory import CLIPModel

    cfg = _tiny_cfg()
    params = load_openclip_checkpoint(PT, cfg)
    model = CLIPModel(cfg=cfg, precision=Precision("float32", "float32"))

    exp = np.load(NPZ)
    images = jnp.asarray(exp["images"].transpose(0, 2, 3, 1))  # NCHW->NHWC
    texts = jnp.asarray(exp["texts"])

    img_feat = np.asarray(model.encode_image(params, images))
    txt_feat = np.asarray(model.encode_text(params, texts))

    np.testing.assert_allclose(img_feat, exp["image_features"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(txt_feat, exp["text_features"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(np.exp(params["logit_scale"]) /
                                     np.exp(exp["logit_scale"])), 1.0,
                               rtol=1e-6)
