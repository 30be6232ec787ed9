"""Llama-HF import parity: converted weights produce the same logits as
transformers LlamaForCausalLM (torch CPU) — validates our rope (rotate-half),
swiglu packing, RMSNorm, and GQA against the canonical implementation."""
import numpy as np
import pytest

import jax.numpy as jnp

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from megatron_clip_tpu.checkpoints.llama_hf import (  # noqa: E402
    convert_llama_state_dict, gpt_cfg_from_llama_config, load_llama_hf)
from megatron_clip_tpu.models.gpt import apply_gpt  # noqa: E402


def _tiny_llama(kv_heads=4):
    config = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=172,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=kv_heads, max_position_embeddings=64,
        rope_theta=10000.0, tie_word_embeddings=False)
    torch.manual_seed(0)
    return transformers.LlamaForCausalLM(config).eval(), config


@pytest.mark.parametrize("kv_heads", [4, 2])
def test_logits_match_transformers(kv_heads):
    model, config = _tiny_llama(kv_heads)
    cfg = gpt_cfg_from_llama_config(config)
    assert cfg.swiglu and cfg.normalization == "rmsnorm" and not cfg.use_bias
    if kv_heads != 4:
        assert cfg.kv_heads == kv_heads
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_llama_state_dict(sd, cfg)

    ids = np.random.RandomState(0).randint(1, 127, (2, 10)).astype(np.int64)
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    ours = np.asarray(apply_gpt(params, jnp.asarray(ids, jnp.int32), cfg,
                                compute_dtype=jnp.float32,
                                tcfg=cfg.transformer(use_flash=False)))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_load_llama_hf_roundtrip(tmp_path):
    model, _ = _tiny_llama()
    model.save_pretrained(tmp_path)
    cfg, params = load_llama_hf(str(tmp_path))
    assert cfg.num_layers == 2
    assert params["blocks"]["attn"]["wqkv"].shape == (2, 64, 3 * 64)


def test_import_cli(tmp_path):
    model, _ = _tiny_llama()
    hf_dir = tmp_path / "hf"
    model.save_pretrained(hf_dir)
    out = tmp_path / "mct"
    from tools.import_llama_hf import main
    main(["--hf-path", str(hf_dir), "--save", str(out)])
    assert (out / "latest_checkpointed_iteration.txt").exists()
