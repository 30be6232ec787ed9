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
from megatron_clip_tpu.models.coca import _init_mm_block, _apply_mm_block
from megatron_clip_tpu.ops.cross_entropy import cross_entropy


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
    dec_blocks = [_init_mm_block(k, cfg.decoder_cfg(), dtype)
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
        return _apply_mm_block(block, carry, enc, cfg.num_heads), None

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
