"""ICT/REALM biencoder: query + context BERT encoders with CLS pooling.

Covers the reference's biencoder surface (megatron/model/biencoder_model.py
~328 LoC `BiEncoderModel`, pretrain_ict.py): two BERT trunks (optionally
shared) embed queries and evidence blocks; training uses the in-batch
retrieval objective — softmax over the B×B similarity matrix with the
diagonal as targets (the ICT inverse-cloze task).
"""
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp

from megatron_clip_tpu.config import TransformerCfg
from megatron_clip_tpu.models.bert import BertCfg
from megatron_clip_tpu.nn.transformer import (
    init_transformer, apply_transformer, init_layer_norm, apply_norm)
from megatron_clip_tpu.ops.cross_entropy import cross_entropy


@dataclass(frozen=True)
class BiencoderCfg:
    bert: BertCfg = field(default_factory=lambda: BertCfg(
        add_binary_head=False))
    projection_dim: int = 128     # 0 = use pooled CLS directly
    shared: bool = False          # share trunk params between the two towers


def _init_encoder(key, cfg: BiencoderCfg, dtype):
    b = cfg.bert
    ks = jax.random.split(key, 5)
    w = b.hidden_size
    std = b.init_std
    enc = {
        "tok_embed": (std * jax.random.normal(ks[0], (b.vocab_size, w))).astype(dtype),
        "pos_embed": (std * jax.random.normal(ks[1], (b.seq_length, w))).astype(dtype),
        "blocks": init_transformer(ks[2], b.transformer(), dtype),
        "ln_f": init_layer_norm(w, dtype),
    }
    if cfg.projection_dim:
        enc["proj"] = {
            "w": (std * jax.random.normal(ks[3], (w, cfg.projection_dim))).astype(dtype),
            "b": jnp.zeros((cfg.projection_dim,), dtype=dtype),
        }
    return enc


def init_biencoder(key, cfg: BiencoderCfg, dtype=jnp.float32):
    kq, kc = jax.random.split(key)
    params = {"query": _init_encoder(kq, cfg, dtype)}
    params["context"] = params["query"] if cfg.shared \
        else _init_encoder(kc, cfg, dtype)
    return params


def _encode(enc, tokens, cfg: BiencoderCfg, pad_mask, compute_dtype,
            tcfg: Optional[TransformerCfg]):
    b = cfg.bert
    tcfg = tcfg or b.transformer()
    s = tokens.shape[1]
    x = enc["tok_embed"][tokens].astype(compute_dtype)
    x = x + enc["pos_embed"][:s].astype(compute_dtype)[None]
    bias = None
    if pad_mask is not None:
        bias = jnp.where(pad_mask[:, None, None, :].astype(bool), 0.0, -1e30)
    x = apply_transformer(enc["blocks"], x, tcfg, causal=False, bias=bias)
    x = apply_norm(enc["ln_f"], x)
    pooled = x[:, 0]                              # CLS
    if "proj" in enc:
        pooled = pooled @ enc["proj"]["w"].astype(pooled.dtype) \
            + enc["proj"]["b"].astype(pooled.dtype)
    return pooled.astype(jnp.float32)


def encode_query(params, tokens, cfg: BiencoderCfg, *, pad_mask=None,
                 compute_dtype=jnp.bfloat16, tcfg=None):
    return _encode(params["query"], tokens, cfg, pad_mask, compute_dtype, tcfg)


def encode_context(params, tokens, cfg: BiencoderCfg, *, pad_mask=None,
                   compute_dtype=jnp.bfloat16, tcfg=None):
    return _encode(params["context"], tokens, cfg, pad_mask, compute_dtype,
                   tcfg)


def ict_loss(params, query_tokens, block_tokens, cfg: BiencoderCfg, *,
             compute_dtype=jnp.bfloat16, tcfg=None):
    """In-batch retrieval cross-entropy (pretrain_ict.py loss: row-softmax of
    q @ c^T with diagonal targets) + top-1 retrieval accuracy."""
    q = encode_query(params, query_tokens,
                     cfg, pad_mask=(query_tokens != 0),
                     compute_dtype=compute_dtype, tcfg=tcfg)
    c = encode_context(params, block_tokens, cfg,
                       pad_mask=(block_tokens != 0),
                       compute_dtype=compute_dtype, tcfg=tcfg)
    logits = q @ c.T                               # [B, B]
    labels = jnp.arange(logits.shape[0])
    loss = cross_entropy(logits[None], labels[None]).mean()
    acc = (jnp.argmax(logits, axis=-1) == labels).mean()
    return loss, acc
