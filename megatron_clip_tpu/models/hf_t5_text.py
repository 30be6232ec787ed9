"""HF T5/mT5 encoder text tower, native JAX.

Completes the reference's generic-HF-text-tower surface
(open_CLIP/src/open_clip/hf_model.py + hf_configs.py arch_dict: the
mt5-base-ViT-B-32 / t5 family configs). The T5 encoder differs from the
BERT/RoBERTa stack (models/hf_text.py) in every structural detail, so it
gets its own implementation:

  - RMS layer norm (no mean subtraction, no bias), computed in fp32;
  - pre-LN blocks, all linears bias-free;
  - NO absolute position embeddings; attention uses bucketed relative
    position biases, with the bias embedding living in block 0 and shared
    by all layers;
  - NO 1/sqrt(d) attention scaling (folded into T5's initialization);
  - d_kv per head is independent of d_model / heads;
  - feed-forward is either ReLU (t5) or gated-GELU (t5.1.1 / mT5):
    wo(gelu(wi_0(x)) * wi_1(x)).

Weight conversion from `transformers` T5EncoderModel / MT5EncoderModel
checkpoints; parity vs transformers tested to <=1e-4
(tests/test_hf_text.py::test_t5_encoder_matches_transformers).
"""
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class T5TextCfg:
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 1024
    heads: int = 6
    layers: int = 8
    layer_norm_eps: float = 1e-6
    rel_buckets: int = 32
    rel_max_distance: int = 128
    gated_ff: bool = True          # t5.1.1 / mT5; False = original ReLU t5
    pad_token_id: int = 0
    pooler: str = "mean_pooler"
    proj: str = "linear"
    output_dim: Optional[int] = None


def _rms(p, x, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * \
        p.astype(x.dtype)


def _rel_bucket(rel_pos, num_buckets, max_distance):
    """Bidirectional relative-position bucketing (T5Attention
    _relative_position_bucket, bidirectional=True)."""
    nb = num_buckets // 2
    ret = jnp.where(rel_pos > 0, nb, 0)
    n = jnp.abs(rel_pos)
    max_exact = nb // 2
    large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return ret + jnp.where(n < max_exact, n, large)


def init_hf_t5_text(key, cfg: T5TextCfg, dtype=jnp.float32):
    def lin(k, i, o):
        return (jax.random.normal(k, (i, o)) * (i ** -0.5)).astype(dtype)

    keys = jax.random.split(key, 8 * cfg.layers + 4)
    it = iter(keys)
    d, inner = cfg.d_model, cfg.heads * cfg.d_kv
    params = {
        "shared": (jax.random.normal(next(it), (cfg.vocab_size, d))
                   ).astype(dtype),
        "rel_bias": (0.1 * jax.random.normal(
            next(it), (cfg.rel_buckets, cfg.heads))).astype(dtype),
        "ln_f": jnp.ones((d,), dtype),
        "layers": [],
    }
    for _ in range(cfg.layers):
        lp = {
            "attn_ln": jnp.ones((d,), dtype),
            "q": lin(next(it), d, inner), "k": lin(next(it), d, inner),
            "v": lin(next(it), d, inner), "o": lin(next(it), inner, d),
            "ff_ln": jnp.ones((d,), dtype),
            "wo": lin(next(it), cfg.d_ff, d),
        }
        if cfg.gated_ff:
            lp["wi_0"] = lin(next(it), d, cfg.d_ff)
            lp["wi_1"] = lin(next(it), d, cfg.d_ff)
        else:
            lp["wi"] = lin(next(it), d, cfg.d_ff)
        params["layers"].append(lp)
    if cfg.output_dim and cfg.proj != "none":
        params["proj"] = {"w": lin(next(it), d, cfg.output_dim)}
    return params


def apply_hf_t5_text(params, ids, cfg: T5TextCfg, *, attention_mask=None,
                     compute_dtype=jnp.bfloat16):
    """ids [B, S] -> pooled/projected features (mean pooler over the mask,
    hf_model.py MeanPooler + proj head)."""
    if attention_mask is None:
        attention_mask = (ids != cfg.pad_token_id).astype(jnp.int32)
    x = params["shared"][ids].astype(compute_dtype)
    b, s, d = x.shape
    h, dk = cfg.heads, cfg.d_kv

    pos = jnp.arange(s)
    buckets = _rel_bucket(pos[None, :] - pos[:, None],
                          cfg.rel_buckets, cfg.rel_max_distance)
    pos_bias = params["rel_bias"][buckets].astype(jnp.float32)  # [S, S, H]
    pos_bias = pos_bias.transpose(2, 0, 1)[None]                # [1, H, S, S]
    mask_bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e30)
    bias = pos_bias + mask_bias

    for lp in params["layers"]:
        y = _rms(lp["attn_ln"], x, cfg.layer_norm_eps)
        q = (y @ lp["q"].astype(y.dtype)).reshape(b, s, h, dk)
        k = (y @ lp["k"].astype(y.dtype)).reshape(b, s, h, dk)
        v = (y @ lp["v"].astype(y.dtype)).reshape(b, s, h, dk)
        # T5: no 1/sqrt(d) scaling (folded into init)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) + bias
        probs = jax.nn.softmax(logits, axis=-1).astype(y.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, h * dk)
        x = x + ctx @ lp["o"].astype(y.dtype)

        y = _rms(lp["ff_ln"], x, cfg.layer_norm_eps)
        if cfg.gated_ff:
            ff = jax.nn.gelu(y @ lp["wi_0"].astype(y.dtype),
                             approximate=True) * \
                (y @ lp["wi_1"].astype(y.dtype))
        else:
            ff = jax.nn.relu(y @ lp["wi"].astype(y.dtype))
        x = x + ff @ lp["wo"].astype(y.dtype)

    x = _rms(params["ln_f"], x, cfg.layer_norm_eps)
    m = attention_mask[..., None].astype(x.dtype)
    pooled = (x * m).sum(1) / jnp.maximum(m.sum(1), 1)
    if "proj" in params:
        pooled = pooled @ params["proj"]["w"].astype(pooled.dtype)
    return pooled


# ----------------------- HF checkpoint conversion ---------------------------

def t5_cfg_from_transformers(config, pooler=None, proj="linear",
                             output_dim=None) -> T5TextCfg:
    return T5TextCfg(
        vocab_size=config.vocab_size, d_model=config.d_model,
        d_kv=config.d_kv, d_ff=config.d_ff,
        heads=config.num_heads, layers=config.num_layers,
        layer_norm_eps=getattr(config, "layer_norm_epsilon", 1e-6),
        rel_buckets=config.relative_attention_num_buckets,
        rel_max_distance=getattr(config, "relative_attention_max_distance",
                                 128),
        gated_ff="gated" in getattr(config, "feed_forward_proj", "relu"),
        pad_token_id=getattr(config, "pad_token_id", 0) or 0,
        pooler=pooler or "mean_pooler", proj=proj, output_dim=output_dim)


def convert_t5_state_dict(sd, cfg: T5TextCfg, dtype=jnp.float32):
    """transformers T5EncoderModel state_dict -> JAX param tree (torch
    Linear weights [out, in] transposed)."""
    def g(name):
        return jnp.asarray(np.asarray(sd[name]), dtype)

    p = {
        "shared": g("shared.weight"),
        "rel_bias": g("encoder.block.0.layer.0.SelfAttention."
                      "relative_attention_bias.weight"),
        "ln_f": g("encoder.final_layer_norm.weight"),
        "layers": [],
    }
    for i in range(cfg.layers):
        a = f"encoder.block.{i}.layer.0"
        f = f"encoder.block.{i}.layer.1"
        lp = {
            "attn_ln": g(a + ".layer_norm.weight"),
            "q": g(a + ".SelfAttention.q.weight").T,
            "k": g(a + ".SelfAttention.k.weight").T,
            "v": g(a + ".SelfAttention.v.weight").T,
            "o": g(a + ".SelfAttention.o.weight").T,
            "ff_ln": g(f + ".layer_norm.weight"),
            "wo": g(f + ".DenseReluDense.wo.weight").T,
        }
        if cfg.gated_ff:
            lp["wi_0"] = g(f + ".DenseReluDense.wi_0.weight").T
            lp["wi_1"] = g(f + ".DenseReluDense.wi_1.weight").T
        else:
            lp["wi"] = g(f + ".DenseReluDense.wi.weight").T
        p["layers"].append(lp)
    return p


def load_hf_t5_text_tower(model_name_or_path: str, *, output_dim=None,
                          proj="linear", pooler=None, seed=0,
                          dtype=jnp.float32):
    """(T5TextCfg, params) from a local T5/MT5 checkpoint; fresh projection
    head (open_CLIP hf_model.py does the same)."""
    from transformers import AutoConfig, T5EncoderModel
    config = AutoConfig.from_pretrained(model_name_or_path)
    cfg = t5_cfg_from_transformers(config, pooler=pooler, proj=proj,
                                   output_dim=output_dim)
    model = T5EncoderModel.from_pretrained(model_name_or_path)
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    params = convert_t5_state_dict(sd, cfg, dtype)
    if output_dim and proj != "none":
        init = init_hf_t5_text(jax.random.PRNGKey(seed), cfg, dtype)
        params["proj"] = init["proj"]
    return cfg, params
