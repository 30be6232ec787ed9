"""T5 encoder-decoder model.

Covers the reference's T5 workload (megatron/model/t5_model.py,
pretrain_t5.py): bidirectional encoder, causal decoder with cross-attention,
tied embeddings, LM head; trained with span corruption. The reference splits
encoder/decoder across pipeline ranks (schedules.py encoder/decoder split
rank); here the two stacks can be given independent sharding specs.
"""
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from megatron_clip_tpu.config import TransformerCfg, MultimodalCfg
from megatron_clip_tpu.nn.transformer import (
    init_transformer, apply_transformer, init_layer_norm, apply_norm)
from megatron_clip_tpu.ops import layer_norm, multi_head_attention
from megatron_clip_tpu.ops.activations import bias_act
from megatron_clip_tpu.ops.cross_entropy import cross_entropy


def _init_dec_block(key, cfg, dtype=jnp.float32):
    """T5 decoder block: self-attn + cross-attn + ONE mlp, all pre-LN
    (megatron t5_model.py decoder layer; formerly shared with the CoCa
    decoder, which round 5 moved to open_CLIP's self+cross block PAIRS —
    this single-mlp layout stays the T5 shape, numerics unchanged)."""
    w = cfg.width
    std = w ** -0.5
    proj_std = std * ((2 * cfg.layers) ** -0.5)
    fc_std = (2 * w) ** -0.5
    ks, kc, kf, kp, kq, kk = jax.random.split(key, 6)
    hid = int(w * cfg.mlp_ratio)
    return {
        "ln_1": init_layer_norm(w, dtype),
        "attn": {
            "wqkv": (jax.random.normal(ks, (w, 3 * w)) * std).astype(dtype),
            "bqkv": jnp.zeros((3 * w,), dtype=dtype),
            "wo": (jax.random.normal(kp, (w, w)) * proj_std).astype(dtype),
            "bo": jnp.zeros((w,), dtype=dtype),
        },
        "ln_1_kv": init_layer_norm(w, dtype),
        "cross": {
            "wq": (jax.random.normal(kq, (w, w)) * std).astype(dtype),
            "bq": jnp.zeros((w,), dtype=dtype),
            "wkv": (jax.random.normal(kk, (w, 2 * w)) * std).astype(dtype),
            "bkv": jnp.zeros((2 * w,), dtype=dtype),
            "wo": (jax.random.normal(kc, (w, w)) * proj_std).astype(dtype),
            "bo": jnp.zeros((w,), dtype=dtype),
        },
        "ln_2": init_layer_norm(w, dtype),
        "mlp": {
            "w1": (jax.random.normal(kf, (w, hid)) * fc_std).astype(dtype),
            "b1": jnp.zeros((hid,), dtype=dtype),
            "w2": (jax.random.normal(kp, (hid, w)) * proj_std).astype(dtype),
            "b2": jnp.zeros((w,), dtype=dtype),
        },
    }


def _apply_dec_block(block, x, enc_tokens, heads):
    h = layer_norm(x, block["ln_1"]["scale"], block["ln_1"]["bias"])
    x = x + multi_head_attention(h, block["attn"], heads, causal=True,
                                 use_flash=False)
    h = layer_norm(x, block["ln_1_kv"]["scale"], block["ln_1_kv"]["bias"])
    x = x + multi_head_attention(h, block["cross"], heads, kv=enc_tokens,
                                 use_flash=False)
    h = layer_norm(x, block["ln_2"]["scale"], block["ln_2"]["bias"])
    h = jnp.einsum("bsw,wd->bsd", h, block["mlp"]["w1"].astype(h.dtype))
    h = bias_act(h, block["mlp"]["b1"].astype(h.dtype), "gelu")
    h = jnp.einsum("bsw,wd->bsd", h, block["mlp"]["w2"].astype(h.dtype))
    return x + h + block["mlp"]["b2"].astype(h.dtype)


@dataclass(frozen=True)
class T5Cfg:
    num_layers: int = 12           # encoder layers
    num_decoder_layers: int = 12
    hidden_size: int = 768
    num_heads: int = 12
    vocab_size: int = 30592
    max_seq_length: int = 512
    max_decode_length: int = 128
    mlp_ratio: float = 4.0
    init_std: float = 0.02
    # megatron --kv-channels; the decoder's mm blocks fix the head dim at
    # width//heads, so the entry rejects values that differ from it
    kv_channels: Optional[int] = None

    def encoder_cfg(self, **ov) -> TransformerCfg:
        return TransformerCfg(layers=self.num_layers, width=self.hidden_size,
                              heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                              kv_channels=self.kv_channels,
                              act="gelu_tanh", **ov)

    def decoder_cfg(self) -> MultimodalCfg:
        return MultimodalCfg(context_length=self.max_decode_length,
                             width=self.hidden_size, heads=self.num_heads,
                             layers=self.num_decoder_layers,
                             mlp_ratio=self.mlp_ratio)


def init_t5(key, cfg: T5Cfg, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    w = cfg.hidden_size
    std = cfg.init_std
    dec_blocks = [_init_dec_block(k, cfg.decoder_cfg(), dtype)
                  for k in jax.random.split(ks[2], cfg.num_decoder_layers)]
    return {
        "tok_embed": (std * jax.random.normal(ks[0], (cfg.vocab_size, w))).astype(dtype),
        "enc_pos": (std * jax.random.normal(ks[1], (cfg.max_seq_length, w))).astype(dtype),
        "dec_pos": (std * jax.random.normal(ks[3], (cfg.max_decode_length, w))).astype(dtype),
        "enc_blocks": init_transformer(ks[4], cfg.encoder_cfg(), dtype),
        "enc_ln": init_layer_norm(w, dtype),
        "dec_blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *dec_blocks),
        "dec_ln": init_layer_norm(w, dtype),
        "lm_bias": jnp.zeros((cfg.vocab_size,), dtype=dtype),
    }


def apply_t5(params, enc_tokens, dec_tokens, cfg: T5Cfg, *,
             enc_pad_mask=None, compute_dtype=jnp.bfloat16,
             tcfg: Optional[TransformerCfg] = None):
    """-> logits [B, S_dec, V] (fp32)."""
    tcfg = tcfg or cfg.encoder_cfg()
    se = enc_tokens.shape[1]
    x = params["tok_embed"][enc_tokens].astype(compute_dtype)
    x = x + params["enc_pos"][:se].astype(compute_dtype)[None]
    bias = None
    if enc_pad_mask is not None:
        bias = jnp.where(enc_pad_mask[:, None, None, :].astype(bool), 0.0, -1e30)
    enc = apply_transformer(params["enc_blocks"], x, tcfg, causal=False,
                            bias=bias)
    enc = apply_norm(params["enc_ln"], enc)

    sd = dec_tokens.shape[1]
    y = params["tok_embed"][dec_tokens].astype(compute_dtype)
    y = y + params["dec_pos"][:sd].astype(compute_dtype)[None]

    def body(carry, block):
        return _apply_dec_block(block, carry, enc, cfg.num_heads), None

    y, _ = jax.lax.scan(body, y, params["dec_blocks"])
    y = apply_norm(params["dec_ln"], y)
    logits = jnp.einsum("bsw,vw->bsv", y, params["tok_embed"].astype(y.dtype))
    return (logits + params["lm_bias"].astype(y.dtype)).astype(jnp.float32)


def t5_loss(params, enc_tokens, dec_tokens, labels, loss_mask, cfg: T5Cfg,
            *, enc_pad_mask=None, compute_dtype=jnp.bfloat16, tcfg=None):
    logits = apply_t5(params, enc_tokens, dec_tokens, cfg,
                      enc_pad_mask=enc_pad_mask, compute_dtype=compute_dtype,
                      tcfg=tcfg)
    per_tok = cross_entropy(logits, labels)
    m = loss_mask.astype(jnp.float32)
    return jnp.sum(per_tok * m) / jnp.maximum(m.sum(), 1.0)
