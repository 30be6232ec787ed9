"""open_CLIP .pt checkpoint import/export roundtrip
(reference: factory pretrained loading + tools/checkpoint converters)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from megatron_clip_tpu.config import CLIPCfg, VisionCfg, TextCfg
from megatron_clip_tpu.models.clip import init_clip, apply_clip
from megatron_clip_tpu.checkpoints.torch_interop import (
    params_from_openclip_state_dict, openclip_state_dict_from_params)

TINY = CLIPCfg(
    embed_dim=64,
    vision=VisionCfg(layers=2, width=64, head_width=32, patch_size=8, image_size=32),
    text=TextCfg(context_length=16, vocab_size=512, width=64, heads=2, layers=2),
)


def test_export_import_roundtrip():
    params = init_clip(jax.random.PRNGKey(0), TINY)
    sd = openclip_state_dict_from_params(params, TINY)
    assert "visual.conv1.weight" in sd
    assert sd["visual.conv1.weight"].shape == (64, 3, 8, 8)
    assert sd["visual.transformer.resblocks.0.attn.in_proj_weight"].shape == (192, 64)
    back = params_from_openclip_state_dict(sd, TINY)
    for (p1, x), (p2, y) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(params),
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(back),
                   key=lambda t: str(t[0]))):
        assert str(p1) == str(p2)
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6,
                                   err_msg=str(p1))
    # forward equality after roundtrip
    k = jax.random.PRNGKey(1)
    images = jax.random.normal(k, (2, 32, 32, 3))
    texts = jax.random.randint(k, (2, 16), 1, 510).astype(jnp.int32)
    a = apply_clip(params, images, texts, TINY, compute_dtype=jnp.float32)
    b = apply_clip(back, images, texts, TINY, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(a["image_features"]),
                               np.asarray(b["image_features"]), rtol=1e-5)


def test_torch_file_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    params = init_clip(jax.random.PRNGKey(0), TINY)
    sd = openclip_state_dict_from_params(params, TINY)
    tsd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    path = tmp_path / "epoch_1.pt"
    torch.save({"state_dict": {"module." + k: v for k, v in tsd.items()},
                "epoch": 1}, path)
    from megatron_clip_tpu.checkpoints.torch_interop import load_openclip_checkpoint
    back = load_openclip_checkpoint(str(path), TINY)
    np.testing.assert_allclose(np.asarray(back["logit_scale"]),
                               np.asarray(params["logit_scale"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(back["visual"]["blocks"]["mlp"]["w1"]),
                               np.asarray(params["visual"]["blocks"]["mlp"]["w1"]),
                               rtol=1e-6)


def test_bicubic_resize_matches_torch_exactly():
    """ops/image_resize reproduces torch F.interpolate bicubic bit-for-bit:
    antialias=True (the reference resize_pos_embed default, model.py:417)
    and antialias=False, up- and down-scaling, on the grid sizes the ViT
    ladder actually hits."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from megatron_clip_tpu.ops.image_resize import resize_grid_bicubic

    rng = np.random.RandomState(0)
    for (h, oh) in [(7, 5), (7, 8), (7, 16), (14, 7), (16, 10), (5, 7)]:
        x = rng.randn(h, h, 3).astype(np.float32)
        t = torch.from_numpy(x.transpose(2, 0, 1))[None].double()
        for aa in (True, False):
            ref = F.interpolate(t, size=(oh, oh), mode="bicubic",
                                antialias=aa, align_corners=False)
            ref = ref[0].numpy().transpose(1, 2, 0)
            ours = np.asarray(resize_grid_bicubic(x, oh, oh, antialias=aa))
            np.testing.assert_allclose(ours, ref, atol=2e-6,
                                       err_msg=f"{h}->{oh} aa={aa}")
