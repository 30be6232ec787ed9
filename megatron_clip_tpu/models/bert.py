"""BERT masked-LM model.

Covers the reference's BERT workload (megatron/model/bert_model.py,
pretrain_bert.py): token + position + token-type embeddings, bidirectional
transformer with padding mask, masked-LM head (dense + norm + tied decoder),
and the binary NSP head over the pooled first token
(megatron/model/bert_model.py:BertLMHead, language_model.py:Pooler).
"""
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from megatron_clip_tpu.config import TransformerCfg
from megatron_clip_tpu.nn.transformer import (
    init_transformer, apply_transformer, init_layer_norm, apply_norm)
from megatron_clip_tpu.ops.activations import gelu_exact
from megatron_clip_tpu.ops.cross_entropy import cross_entropy


@dataclass(frozen=True)
class BertCfg:
    num_layers: int = 12
    hidden_size: int = 768
    num_heads: int = 12
    vocab_size: int = 30592          # megatron pads bert vocab
    seq_length: int = 512
    num_tokentypes: int = 2
    mlp_ratio: float = 4.0
    add_binary_head: bool = True     # NSP (megatron --bert-binary-head)
    init_std: float = 0.02

    def transformer(self, **overrides) -> TransformerCfg:
        return TransformerCfg(layers=self.num_layers, width=self.hidden_size,
                              heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                              act="gelu_tanh", **overrides)


def init_bert(key, cfg: BertCfg, dtype=jnp.float32):
    ks = jax.random.split(key, 7)
    w = cfg.hidden_size
    std = cfg.init_std
    params = {
        "tok_embed": (std * jax.random.normal(ks[0], (cfg.vocab_size, w))).astype(dtype),
        "pos_embed": (std * jax.random.normal(ks[1], (cfg.seq_length, w))).astype(dtype),
        "type_embed": (std * jax.random.normal(ks[2], (cfg.num_tokentypes, w))).astype(dtype),
        "blocks": init_transformer(ks[3], cfg.transformer(), dtype),
        "ln_f": init_layer_norm(w, dtype),
        # masked-LM head: dense + norm, decoder tied to tok_embed + bias
        "lm_head": {
            "dense": {"w": (std * jax.random.normal(ks[4], (w, w))).astype(dtype),
                      "b": jnp.zeros((w,), dtype=dtype)},
            "ln": init_layer_norm(w, dtype),
            "bias": jnp.zeros((cfg.vocab_size,), dtype=dtype),
        },
    }
    if cfg.add_binary_head:
        params["pooler"] = {"w": (std * jax.random.normal(ks[5], (w, w))).astype(dtype),
                            "b": jnp.zeros((w,), dtype=dtype)}
        params["binary_head"] = {"w": (std * jax.random.normal(ks[6], (w, 2))).astype(dtype),
                                 "b": jnp.zeros((2,), dtype=dtype)}
    return params


def apply_bert(params, tokens, cfg: BertCfg, *, pad_mask=None,
               token_types=None, compute_dtype=jnp.bfloat16,
               tcfg: Optional[TransformerCfg] = None, layers_fn=None,
               rng=None):
    """tokens [B, S]; pad_mask [B, S] 1=real. Returns (lm_logits, nsp_logits).

    `layers_fn`: pipeline schedule adapter (pp>1) — the padding bias travels
    with each microbatch through the ring. `rng`: enables dropout."""
    tcfg = tcfg or cfg.transformer()
    s = tokens.shape[1]
    x = params["tok_embed"][tokens].astype(compute_dtype)
    x = x + params["pos_embed"][:s].astype(compute_dtype)[None]
    if token_types is not None:
        x = x + params["type_embed"][token_types].astype(compute_dtype)
    bias = None
    if pad_mask is not None:
        # additive attention bias: block attending TO padding
        bias = jnp.where(pad_mask[:, None, None, :].astype(bool), 0.0, -1e30)
    if layers_fn is None:
        x = apply_transformer(params["blocks"], x, tcfg, causal=False,
                              bias=bias, rng=rng)
    else:
        x = layers_fn(params["blocks"], x, tcfg, causal=False, bias=bias,
                      rng=rng)
    x = apply_norm(params["ln_f"], x)

    h = x @ params["lm_head"]["dense"]["w"].astype(x.dtype) \
        + params["lm_head"]["dense"]["b"].astype(x.dtype)
    h = gelu_exact(h)
    h = apply_norm(params["lm_head"]["ln"], h)
    lm_logits = (jnp.einsum("bsw,vw->bsv", h, params["tok_embed"].astype(h.dtype))
                 + params["lm_head"]["bias"].astype(h.dtype)).astype(jnp.float32)

    nsp_logits = None
    if "binary_head" in params:
        pooled = jnp.tanh(x[:, 0] @ params["pooler"]["w"].astype(x.dtype)
                          + params["pooler"]["b"].astype(x.dtype))
        nsp_logits = (pooled @ params["binary_head"]["w"].astype(x.dtype)
                      + params["binary_head"]["b"].astype(x.dtype)).astype(jnp.float32)
    return lm_logits, nsp_logits


def bert_loss(params, tokens, labels, loss_mask, cfg: BertCfg, *,
              pad_mask=None, token_types=None, is_next=None,
              compute_dtype=jnp.bfloat16, tcfg=None, layers_fn=None,
              rng=None):
    """Masked-LM CE over masked positions + optional NSP CE
    (pretrain_bert.py loss_func semantics)."""
    lm_logits, nsp_logits = apply_bert(params, tokens, cfg, pad_mask=pad_mask,
                                       token_types=token_types,
                                       compute_dtype=compute_dtype, tcfg=tcfg,
                                       layers_fn=layers_fn, rng=rng)
    per_tok = cross_entropy(lm_logits, labels)
    m = loss_mask.astype(jnp.float32)
    lm = jnp.sum(per_tok * m) / jnp.maximum(m.sum(), 1.0)
    if nsp_logits is not None and is_next is not None:
        nsp = cross_entropy(nsp_logits, is_next).mean()
        return lm + nsp
    return lm


def make_bert_masking(rng: "np.random.RandomState", tokens, mask_id: int,
                      vocab_size: int, mask_prob: float = 0.15):
    """Standard 15% masking with 80/10/10 mask/random/keep split
    (megatron/data/dataset_utils.py create_masked_lm_predictions, simplified
    to whole-token masking). Host-side numpy."""
    import numpy as np
    tokens = np.asarray(tokens)
    labels = tokens.copy()
    masked = tokens.copy()
    sel = rng.rand(*tokens.shape) < mask_prob
    sel &= tokens > 3  # don't mask specials (0..3)
    action = rng.rand(*tokens.shape)
    masked[sel & (action < 0.8)] = mask_id
    rand_ids = rng.randint(4, vocab_size, size=tokens.shape)
    swap = sel & (action >= 0.8) & (action < 0.9)
    masked[swap] = rand_ids[swap]
    return masked, labels, sel.astype(np.float32)
