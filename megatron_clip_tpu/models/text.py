"""Text transformer tower (CLIP-style).

Semantics follow open_CLIP's inline CLIP text stack and TextTransformer
(open_CLIP/src/open_clip/model.py:178-243, transformer.py:516-654) and the
fork's CLIPTextModel (megatron/model/CLIP_model.py:126-160):
  token embed + learned pos embed -> causal pre-LN blocks -> ln_final ->
  argmax-EOT pooling -> text projection.

Init follows CLIP.init_parameters: token embed std 0.02, pos embed std 0.01,
text_projection std width**-0.5.
"""
from typing import Optional

import jax
import jax.numpy as jnp

from megatron_clip_tpu.config import TextCfg, TransformerCfg
from megatron_clip_tpu.nn.transformer import (
    init_transformer, apply_transformer, init_layer_norm)
from megatron_clip_tpu.ops import layer_norm


def init_text(key, cfg: TextCfg, embed_dim: int, act: str = "gelu",
              dtype=jnp.float32):
    w = cfg.width
    keys = jax.random.split(key, 5)
    # embed_cls (CoCa towers): one CLS token appended after the caption, so
    # the position table holds context_length + 1 rows (open_CLIP
    # transformer.py:548-557 TextTransformer num_pos)
    num_pos = cfg.context_length + (1 if cfg.embed_cls else 0)
    params = {
        "tok_embed": (0.02 * jax.random.normal(keys[0], (cfg.vocab_size, w))).astype(dtype),
        "pos_embed": (0.01 * jax.random.normal(keys[1], (num_pos, w))).astype(dtype),
        "ln_final": init_layer_norm(w, dtype),
        "proj": {"w": ((w ** -0.5) * jax.random.normal(keys[3], (w, embed_dim))).astype(dtype)},
        "blocks": init_transformer(keys[2], cfg.transformer(act=act), dtype),
    }
    if cfg.embed_cls:
        params["cls_emb"] = (0.01 * jax.random.normal(keys[4], (w,))).astype(dtype)
    if cfg.proj_bias:
        params["proj"]["b"] = jnp.zeros((embed_dim,), dtype=dtype)
    return params


def text_pool(x, text_ids, pool_type: str):
    """Pooling over token features. 'argmax' picks the EOT position — the
    highest token id (EOT=49407) — exactly open_CLIP's
    `x[torch.arange(N), text.argmax(dim=-1)]` (model.py:243)."""
    if pool_type == "argmax":
        idx = jnp.argmax(text_ids, axis=-1)
        return jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]
    if pool_type == "first":
        return x[:, 0]
    if pool_type == "last":
        return x[:, -1]
    return x  # 'none'


def apply_text(params, text_ids, cfg: TextCfg, embed_dim: int, *,
               act: str = "gelu", tcfg: Optional[TransformerCfg] = None,
               compute_dtype=jnp.bfloat16, output_tokens: bool = False,
               layers_fn=None):
    """text_ids: [B, S] int32 token ids (context_length padded with pad_id).

    embed_cls (CoCa): a learned CLS embedding is appended AFTER the caption
    (position S); the attention mask is causal plus a per-example key-
    visibility mask derived from the pad positions, reproducing open_CLIP
    TextTransformer.build_cls_mask exactly — including its one-off key
    alignment (transformer.py:602-609: the pad mask is prepended a True at
    key 0, so key k>0 checks text[k-1]). pooled = ln_final(CLS) @ proj;
    `tokens` are the S caption positions, un-normalized (they feed the CoCa
    decoder raw, transformer.py:636-640)."""
    tcfg = tcfg or cfg.transformer(act=act)
    s = text_ids.shape[1]
    x = params["tok_embed"][text_ids].astype(compute_dtype)
    if cfg.embed_cls:
        b = x.shape[0]
        cls = params["cls_emb"].astype(compute_dtype)[None, None].repeat(b, 0)
        x = jnp.concatenate([x, cls], axis=1)              # [B, S+1, W]
        sp = s + 1
        x = x + params["pos_embed"][:sp].astype(compute_dtype)[None]
        causal = jnp.triu(jnp.full((sp, sp), -jnp.inf, jnp.float32), k=1)
        keyvis = jnp.concatenate(
            [jnp.ones((b, 1), bool), text_ids != cfg.pad_id], axis=1)  # [B, S+1]
        addmask = jnp.where(keyvis[:, None, :], 0.0, -jnp.inf)
        bias = (causal[None] + addmask)[:, None]           # [B, 1, S+1, S+1]
        run = (lambda *a, **k: apply_transformer(*a, **k)) \
            if layers_fn is None else layers_fn
        x = run(params["blocks"], x, tcfg, causal=False, bias=bias)
        pooled, tokens = x[:, -1], x[:, :-1]
        pooled = layer_norm(pooled, params["ln_final"]["scale"],
                            params["ln_final"]["bias"])
        pooled = pooled @ params["proj"]["w"].astype(pooled.dtype)
        if "b" in params["proj"]:
            pooled = pooled + params["proj"]["b"].astype(pooled.dtype)
        if output_tokens:
            return pooled, tokens
        return pooled
    x = x + params["pos_embed"][:s].astype(compute_dtype)[None]
    if layers_fn is None:
        x = apply_transformer(params["blocks"], x, tcfg,
                              causal=not cfg.no_causal_mask)
    else:
        x = layers_fn(params["blocks"], x, tcfg,
                      causal=not cfg.no_causal_mask)
    x = layer_norm(x, params["ln_final"]["scale"], params["ln_final"]["bias"])
    pooled = text_pool(x, text_ids, cfg.pool_type)
    pooled = pooled @ params["proj"]["w"].astype(pooled.dtype)
    if "b" in params["proj"]:
        pooled = pooled + params["proj"]["b"].astype(pooled.dtype)
    if output_tokens:
        return pooled, x
    return pooled
