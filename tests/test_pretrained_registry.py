"""Pretrained zoo registry tests (open_CLIP pretrained.py surface):
tag listing/resolution, cache behavior, offline error quality."""
import os

import numpy as np
import pytest

from megatron_clip_tpu.pretrained import (
    list_pretrained, list_pretrained_tags_by_model, get_pretrained_url,
    register_pretrained, resolve_pretrained, cache_dir, _cache_path)


def test_registry_listing():
    pairs = list_pretrained()
    assert ("ViT-B-32", "openai") in pairs
    assert "ViT-B-32:laion400m_e32" in list_pretrained(as_str=True)
    assert "openai" in list_pretrained_tags_by_model("ViT-B-32")
    assert get_pretrained_url("ViT-B-32", "nope") is None


def test_register_and_resolve_local(tmp_path, monkeypatch):
    ckpt = tmp_path / "weights.pt"
    ckpt.write_bytes(b"x")
    # local path resolves verbatim
    assert resolve_pretrained("ViT-B-32", str(ckpt)) == str(ckpt)
    # registered tag resolves through the cache
    monkeypatch.setenv("MCT_CACHE_DIR", str(tmp_path / "cache"))
    register_pretrained("tiny-model", "mytag", "https://example.invalid/w.pt")
    cached = _cache_path("https://example.invalid/w.pt")
    os.makedirs(os.path.dirname(cached), exist_ok=True)
    with open(cached, "wb") as f:
        f.write(b"cached")
    assert resolve_pretrained("tiny-model", "mytag") == cached


def test_unknown_tag_error_names_options():
    with pytest.raises(ValueError) as e:
        resolve_pretrained("ViT-B-32", "not-a-tag")
    assert "laion400m_e32" in str(e.value)


def test_offline_download_error_is_actionable(tmp_path, monkeypatch):
    monkeypatch.setenv("MCT_CACHE_DIR", str(tmp_path))
    register_pretrained("tiny-model2", "t", "https://example.invalid/none.pt")
    with pytest.raises(RuntimeError) as e:
        resolve_pretrained("tiny-model2", "t")
    msg = str(e.value)
    assert "example.invalid" in msg and str(tmp_path) in msg


def test_factory_pretrained_tag_roundtrip(tmp_path, monkeypatch):
    """create_model_and_transforms(pretrained=<tag>) loads from the cache
    (using the committed golden checkpoint as the cached file)."""
    import megatron_clip_tpu as mct
    golden = os.path.join(os.path.dirname(__file__), "goldens",
                          "openclip_tiny.pt")
    if not os.path.isfile(golden):
        pytest.skip("golden checkpoint missing")
    monkeypatch.setenv("MCT_CACHE_DIR", str(tmp_path))
    url = "https://example.invalid/tiny.pt"
    register_pretrained("ViT-B-32", "test-local", url)
    import shutil
    cached = _cache_path(url)
    os.makedirs(os.path.dirname(cached), exist_ok=True)
    shutil.copy(golden, cached)
    model, params, _, _ = mct.create_model_and_transforms(
        "ViT-B-32", pretrained="test-local", precision="fp32",
        embed_dim=64,
        vision_cfg={"image_size": 32, "layers": 2, "width": 64,
                    "head_width": 32, "patch_size": 8},
        text_cfg={"context_length": 16, "vocab_size": 512, "width": 64,
                  "heads": 2, "layers": 2})
    assert np.isfinite(float(params["logit_scale"]))
