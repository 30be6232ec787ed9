"""RETRO: retrieval-enhanced GPT with chunked cross-attention.

Covers the reference's RETRO surface (pretrain_retro.py + tools/retro/
~2200 LoC db/index/query pipeline + the retro hooks in
megatron/model/transformer.py): the sequence is split into fixed-size
chunks; each chunk's k retrieved neighbor passages (neighbor + its
continuation, tokenized) are encoded by a small bidirectional encoder; at
the configured decoder layers, a chunked cross-attention (CCA) block lets
positions in chunk u attend to the encoded neighbors retrieved for chunk
u-1 (the paper's causal offset: a chunk's retrieval is only available
after the chunk is complete, so chunk 0 receives no retrieval).

TPU shape discipline: neighbors are a dense [B, L, K, R] int array; the
encoder runs as one batched transformer over B*L*K sequences; CCA is one
batched attention over (B, L) chunks with the chunk-0 gate — no ragged
control flow anywhere.
"""
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from megatron_clip_tpu.config import TransformerCfg
from megatron_clip_tpu.models.gpt import GPTCfg
from megatron_clip_tpu.nn.transformer import (
    init_transformer, init_block, init_layer_norm, apply_block, apply_norm)
from megatron_clip_tpu.ops import multi_head_attention
from megatron_clip_tpu.ops.cross_entropy import cross_entropy


@dataclass(frozen=True)
class RetroCfg:
    gpt: GPTCfg = field(default_factory=lambda: GPTCfg())
    chunk_length: int = 64          # m (reference retro chunk size)
    retrieved_length: int = 128     # r = neighbor + continuation tokens
    num_neighbors: int = 2          # k
    encoder_layers: int = 2
    encoder_width: int = 0          # 0 = same as decoder hidden
    # decoder layers with CCA (reference: every 3rd from 6, 1-indexed there)
    cca_layers: Tuple[int, ...] = (5, 8, 11)

    @property
    def enc_width(self):
        return self.encoder_width or self.gpt.hidden_size

    def encoder_cfg(self) -> TransformerCfg:
        return TransformerCfg(layers=self.encoder_layers,
                              width=self.enc_width,
                              heads=max(1, self.enc_width // 64),
                              act="gelu_tanh")


def init_retro(key, cfg: RetroCfg, dtype=jnp.float32):
    from megatron_clip_tpu.models.gpt import init_gpt
    kg, ke, kb, kc, kp = jax.random.split(key, 5)
    params = init_gpt(kg, cfg.gpt, dtype)
    enc_cfg = cfg.encoder_cfg()
    params["retro_encoder"] = {
        "embed": (0.02 * jax.random.normal(
            ke, (cfg.gpt.vocab_size, cfg.enc_width))).astype(dtype),
        "pos": (0.02 * jax.random.normal(
            kp, (cfg.retrieved_length, cfg.enc_width))).astype(dtype),
        "blocks": init_transformer(kb, enc_cfg, dtype),
        "ln_f": init_layer_norm(cfg.enc_width, dtype),
    }
    w = cfg.gpt.hidden_size
    std = w ** -0.5
    cca = {}
    for li in cfg.cca_layers:
        k1, k2, k3, kc = jax.random.split(kc, 4)
        cca[str(li)] = {
            "ln": init_layer_norm(w, dtype),
            "attn": {
                "wq": (std * jax.random.normal(k1, (w, w))).astype(dtype),
                "bq": jnp.zeros((w,), dtype=dtype),
                "wkv": (std * jax.random.normal(
                    k2, (cfg.enc_width, 2 * w))).astype(dtype),
                "bkv": jnp.zeros((2 * w,), dtype=dtype),
                "wo": (std * jax.random.normal(k3, (w, w))).astype(dtype),
                "bo": jnp.zeros((w,), dtype=dtype),
            },
        }
    params["retro_cca"] = cca
    return params


def encode_neighbors(params, neighbors, cfg: RetroCfg, compute_dtype):
    """neighbors [B, L, K, R] int32 -> [B, L, K*R, enc_width]."""
    b, l, k, r = neighbors.shape
    enc = params["retro_encoder"]
    x = enc["embed"][neighbors.reshape(b * l * k, r)].astype(compute_dtype)
    x = x + enc["pos"][:r].astype(compute_dtype)[None]
    from megatron_clip_tpu.nn.transformer import apply_transformer
    x = apply_transformer(enc["blocks"], x, cfg.encoder_cfg(), causal=False)
    x = apply_norm(enc["ln_f"], x)
    return x.reshape(b, l, k * r, -1)


def _chunked_cross_attention(cca, h, enc, cfg: RetroCfg, heads):
    """h [B, S, W] decoder hidden; enc [B, L, K*R, We] encoded neighbors.
    Positions in chunk u attend enc[u-1]; chunk 0 gated to zero."""
    b, s, w = h.shape
    m = cfg.chunk_length
    l = s // m
    q_in = h.reshape(b * l, m, w)
    # shift neighbors by one chunk (causal retrieval offset)
    enc_shift = jnp.concatenate(
        [jnp.zeros_like(enc[:, :1]), enc[:, :-1]], axis=1)
    kv = enc_shift.reshape(b * l, enc.shape[2], enc.shape[3])
    out = multi_head_attention(
        apply_norm(cca["ln"], q_in), cca["attn"], heads, kv=kv,
        use_flash=False)
    out = out.reshape(b, l, m, w)
    gate = (jnp.arange(l) > 0).astype(out.dtype)[None, :, None, None]
    return (out * gate).reshape(b, s, w)


def apply_retro(params, tokens, neighbors, cfg: RetroCfg, *,
                compute_dtype=jnp.bfloat16):
    """tokens [B, S] (S % chunk_length == 0), neighbors [B, L, K, R]
    -> logits [B, S, V]."""
    g = cfg.gpt
    tcfg = g.transformer(scan_layers=False)
    s = tokens.shape[1]
    assert s % cfg.chunk_length == 0, (s, cfg.chunk_length)
    x = params["tok_embed"][tokens].astype(compute_dtype)
    if "pos_embed" in params:
        x = x + params["pos_embed"][:s].astype(compute_dtype)[None]
    enc = encode_neighbors(params, neighbors, cfg, compute_dtype)

    n_layers = jax.tree.leaves(params["blocks"])[0].shape[0]
    for i in range(n_layers):
        block = jax.tree.map(lambda t: t[i], params["blocks"])
        x = apply_block(block, x, tcfg, causal=True)
        if str(i) in params["retro_cca"]:
            x = x + _chunked_cross_attention(
                params["retro_cca"][str(i)], x, enc, cfg, g.num_heads)
    x = apply_norm(params["ln_f"], x, g.normalization)
    if g.tie_embeddings:
        logits = jnp.einsum("bsw,vw->bsv", x,
                            params["tok_embed"].astype(x.dtype))
    else:
        logits = jnp.einsum("bsw,wv->bsv", x,
                            params["lm_head"].astype(x.dtype))
    return logits.astype(jnp.float32)


def retro_loss(params, tokens, neighbors, cfg: RetroCfg, *,
               compute_dtype=jnp.bfloat16):
    """Next-token CE; logits computed on the full (chunk-aligned) sequence,
    labels shifted (so S stays divisible by chunk_length)."""
    logits = apply_retro(params, tokens, neighbors, cfg,
                         compute_dtype=compute_dtype)
    return cross_entropy(logits[:, :-1], tokens[:, 1:]).mean()
