"""HF-hub export layout tests (reference open_clip push_to_hf_hub.py)."""
import json

import numpy as np
import pytest

import jax.numpy as jnp

from megatron_clip_tpu.factory import create_model, parse_model_cfg
from megatron_clip_tpu.hub import HF_CONFIG_NAME, HF_WEIGHTS_NAME, save_for_hf


def test_save_for_hf_roundtrip(tmp_path):
    """Exported torch weights + config JSON reload into identical features."""
    torch = pytest.importorskip("torch")
    model, params = create_model("test-tiny", precision="fp32", seed=0)
    out = save_for_hf(model, params, tmp_path / "hub")

    cfg_json = json.loads((out / HF_CONFIG_NAME).read_text())
    assert cfg_json["model_cfg"]["embed_dim"] == 64
    assert cfg_json["preprocess_cfg"]["size"] == 32
    assert (out / "README.md").exists()

    sd = torch.load(out / HF_WEIGHTS_NAME, weights_only=True)
    from megatron_clip_tpu.checkpoints.torch_interop import (
        params_from_openclip_state_dict)
    cfg2 = parse_model_cfg(cfg_json["model_cfg"])
    params2 = params_from_openclip_state_dict(
        {k: v.numpy() for k, v in sd.items()}, cfg2)

    imgs = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3),
                       jnp.float32)
    f1 = np.asarray(model.encode_image(params, imgs))
    f2 = np.asarray(model.encode_image(params2, imgs))
    np.testing.assert_allclose(f1, f2, atol=1e-5)


def test_push_without_hub_package_raises_clearly(monkeypatch):
    from megatron_clip_tpu import hub
    model, params = create_model("test-tiny", precision="fp32", seed=0,
                                 init_params=False)
    import builtins
    real_import = builtins.__import__

    def fake(name, *a, **k):
        if name.startswith("huggingface_hub"):
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", fake)
    with pytest.raises(RuntimeError, match="save_for_hf"):
        hub.push_to_hf_hub(model, params, "user/repo")
