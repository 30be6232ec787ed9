"""HF text-tower parity tests: our native JAX BERT/RoBERTa encoder vs the
actual transformers implementation (torch CPU), weight-converted.

Mirrors the reference's open_CLIP/tests/test_hf_model.py discipline but with
a real cross-implementation numeric check (no downloads: tiny random-init HF
models are created and saved locally)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megatron_clip_tpu.models.hf_text import (
    HFTextCfg, apply_hf_text, convert_hf_state_dict,
    hf_cfg_from_transformers, init_hf_text, load_hf_text_tower)

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def _tiny_bert():
    cfg = transformers.BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=2, pad_token_id=0)
    torch.manual_seed(0)
    return transformers.BertModel(cfg).eval(), cfg


def _tiny_roberta():
    cfg = transformers.RobertaConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=42, type_vocab_size=1, pad_token_id=1)
    torch.manual_seed(1)
    return transformers.RobertaModel(cfg).eval(), cfg


@pytest.mark.parametrize("family", ["bert", "roberta"])
def test_hidden_states_match_transformers(family):
    model, hcfg = _tiny_bert() if family == "bert" else _tiny_roberta()
    cfg = hf_cfg_from_transformers(hcfg)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    sd = {k: v for k, v in sd.items() if not k.startswith("pooler.")}
    params = convert_hf_state_dict(sd, cfg)

    rng = np.random.RandomState(0)
    pad = hcfg.pad_token_id
    ids = rng.randint(3, 119, (2, 12)).astype(np.int64)
    ids[0, 9:] = pad
    mask = (ids != pad).astype(np.int64)

    with torch.no_grad():
        ref = model(torch.tensor(ids), attention_mask=torch.tensor(mask)
                    ).last_hidden_state.numpy()
    _, ours = apply_hf_text(params, jnp.asarray(ids, jnp.int32), cfg,
                            attention_mask=jnp.asarray(mask),
                            compute_dtype=jnp.float32, return_tokens=True)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4, rtol=1e-4)


def test_mean_pooler_matches_manual():
    cfg = HFTextCfg(vocab_size=50, width=16, heads=2, layers=1,
                    mlp_hidden=32, max_positions=20, pad_token_id=0,
                    position_offset=False, pooler="mean_pooler",
                    proj="none")
    params = init_hf_text(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray([[5, 6, 7, 0, 0]], jnp.int32)
    pooled, tokens = apply_hf_text(params, ids, cfg,
                                   compute_dtype=jnp.float32,
                                   return_tokens=True)
    manual = np.asarray(tokens)[0, :3].mean(0)
    np.testing.assert_allclose(np.asarray(pooled)[0], manual, atol=1e-6)


def test_load_hf_text_tower_roundtrip(tmp_path):
    model, hcfg = _tiny_bert()
    model.save_pretrained(tmp_path)
    cfg, params = load_hf_text_tower(str(tmp_path), output_dim=24,
                                     proj="linear")
    assert cfg.layers == 2 and cfg.output_dim == 24
    ids = jnp.asarray([[4, 5, 6, 7]], jnp.int32)
    out = apply_hf_text(params, ids, cfg, compute_dtype=jnp.float32)
    assert out.shape == (1, 24)
    assert np.isfinite(np.asarray(out)).all()


def test_factory_hf_text_clip():
    """A CLIP whose text tower is the HF arch (reference
    coca_roberta-ViT-B-32-style text_cfg with hf_model_name)."""
    from megatron_clip_tpu.factory import create_model
    model, params = create_model(
        "test-tiny", precision="fp32", seed=0,
        text_cfg={"hf_model_name": "__random_tiny__", "proj": "linear",
                  "pooler_type": "mean_pooler", "width": 32,
                  "hf_model_pretrained": False,
                  "vocab_size": 120, "heads": 2, "layers": 2,
                  "context_length": 12})
    imgs = jnp.zeros((2, 32, 32, 3), jnp.float32)
    txts = jnp.asarray(np.random.RandomState(0).randint(3, 119, (2, 12)),
                       jnp.int32)
    out = model(params, imgs, txts)
    assert out["text_features"].shape == (2, 64)
    n = np.linalg.norm(np.asarray(out["text_features"]), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)


# ------------------------- T5/mT5 encoder family ----------------------------

def _tiny_t5(ff_proj):
    cfg = transformers.T5Config(
        vocab_size=120, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, feed_forward_proj=ff_proj,
        pad_token_id=0, decoder_start_token_id=0)
    torch.manual_seed(0)
    return transformers.T5EncoderModel(cfg).eval(), cfg


@pytest.mark.parametrize("ff_proj", ["gated-gelu", "relu"])
def test_t5_encoder_matches_transformers(ff_proj):
    """Native T5 encoder (models/hf_t5_text.py: RMS norms, relative
    position buckets, gated/relu FF, no attention scaling) vs the actual
    transformers T5EncoderModel."""
    from megatron_clip_tpu.models.hf_t5_text import (
        t5_cfg_from_transformers, convert_t5_state_dict, apply_hf_t5_text)

    model, hcfg = _tiny_t5(ff_proj)
    cfg = t5_cfg_from_transformers(hcfg, proj="none")
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_t5_state_dict(sd, cfg)

    rng = np.random.RandomState(0)
    ids = rng.randint(3, 119, (2, 10)).astype(np.int64)
    ids[0, 7:] = 0
    mask = (ids != 0).astype(np.int64)
    with torch.no_grad():
        hid = model(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask)
                    ).last_hidden_state.numpy()
    want = (hid * mask[..., None]).sum(1) / mask.sum(1, keepdims=True)
    got = np.asarray(apply_hf_t5_text(
        params, jnp.asarray(ids.astype(np.int32)), cfg,
        compute_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_clip_with_t5_text_tower():
    """A CLIP model whose text tower is a (random-init) mT5-style encoder
    runs end-to-end through the factory config path (the reference's
    mt5-base-ViT-B-32 config family)."""
    from megatron_clip_tpu import factory

    cfgd = {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 32,
                       "head_width": 16, "patch_size": 8},
        "text_cfg": {"hf_model_name": "google/mt5-tiny-nonexistent",
                     "hf_model_pretrained": False,
                     "context_length": 16, "vocab_size": 250,
                     "width": 32, "heads": 4, "layers": 2,
                     "proj": "linear", "pooler_type": "mean_pooler"},
    }
    cfg = factory.parse_model_cfg(cfgd)
    model = factory.CLIPModel(cfg=cfg,
                              precision=factory.Precision("float32",
                                                          "float32"))
    params = model.init(jax.random.PRNGKey(0))
    ids = jnp.asarray(np.random.RandomState(0).randint(
        1, 249, (2, 16)).astype(np.int32))
    out = model(params, jnp.zeros((2, 32, 32, 3)), ids)
    assert out["text_features"].shape == (2, 32)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(out["text_features"], axis=-1)),
        np.ones(2), rtol=1e-5)
