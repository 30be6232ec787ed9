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
