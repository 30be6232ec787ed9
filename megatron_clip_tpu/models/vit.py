"""Vision transformer tower (CLIP-style).

Semantics follow open_CLIP's VisionTransformer
(open_CLIP/src/open_clip/transformer.py:325-513) and the fork's
CLIP_VitBackbone (megatron/model/vision/vit_backbone.py:275-434):
  patchify -> linear patch embed (conv, no bias) -> [cls] + learned pos embed
  -> ln_pre -> pre-LN blocks -> ln_post -> pool (tok/avg/attentional) -> proj.

TPU notes: images are NHWC; the non-overlapping patch conv is expressed as
reshape+matmul so it lands on the MXU as one big GEMM (the reference uses
einops rearrange + linear the same way, vit_backbone.py:389-394).
"""
from typing import Optional

import jax
import jax.numpy as jnp

from megatron_clip_tpu.config import VisionCfg, TransformerCfg
from megatron_clip_tpu.nn.transformer import (
    init_transformer, apply_transformer, init_layer_norm)
from megatron_clip_tpu.ops import layer_norm, multi_head_attention


def relative_position_index(grid: int, trained_grid: int = None):
    """BEiT/timm-RelPosBias gather map for a cls-token ViT.

    Returns [S, S] int32 (S = grid*grid + 1) indexing a learned bias table
    of size (2*G-1)^2 + 3 where G = trained_grid (displacements flattened in
    the TRAINED grid's coordinate system, so smaller eval grids — e.g. DINO
    local crops — index a valid subset). The 3 extra slots are the BEiT
    cls entries: cls->token (N-3), token->cls (N-2), cls->cls (N-1).
    Mirrors timm's gen_relative_position_index (pos_embed_rel.py), the
    relative-position machinery behind the reference zoo's
    vit_relpos_medium_patch16_cls_224 (timm_model.py tower).
    """
    import numpy as np
    g_t = trained_grid or grid
    assert grid <= g_t, "eval grid larger than the trained bias table"
    span = 2 * g_t - 1
    n = span * span + 3
    coords = np.stack(np.meshgrid(np.arange(grid), np.arange(grid),
                                  indexing="ij")).reshape(2, -1)
    rel = (coords[:, :, None] - coords[:, None, :]).transpose(1, 2, 0)
    flat = (rel[..., 0] + g_t - 1) * span + (rel[..., 1] + g_t - 1)
    s = grid * grid + 1
    idx = np.zeros((s, s), dtype=np.int32)
    idx[1:, 1:] = flat
    idx[0, :] = n - 3   # cls attends to tokens
    idx[:, 0] = n - 2   # tokens attend to cls
    idx[0, 0] = n - 1   # cls to itself
    return jnp.asarray(idx), n


def patchify(images, patch_size: int):
    """[B, H, W, C] -> [B, gh*gw, p*p*C] for non-overlapping patches."""
    b, h, w, c = images.shape
    gh, gw = h // patch_size, w // patch_size
    x = images.reshape(b, gh, patch_size, gw, patch_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B gh gw p p C
    return x.reshape(b, gh * gw, patch_size * patch_size * c)


def init_vit(key, cfg: VisionCfg, embed_dim: int, act: str = "gelu",
             dtype=jnp.float32):
    w = cfg.width
    scale = w ** -0.5
    keys = jax.random.split(key, 6)
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    params = {
        # conv patch embed == linear over flattened patch, bias=False
        "patch_embed": {"w": (jax.random.normal(keys[0], (patch_dim, w))
                              * patch_dim ** -0.5).astype(dtype)},
        "cls": (scale * jax.random.normal(keys[1], (w,))).astype(dtype),
        "blocks": init_transformer(keys[3], cfg.transformer(act=act), dtype),
    }
    if cfg.attentional_pool:
        # open_CLIP attn-pool layout (transformer.py:387-390): ln_post and
        # the final projection live in the pooled space (output_dim), the
        # proj init std still derives from the tower width
        params["ln_post"] = init_layer_norm(embed_dim, dtype)
        params["proj"] = (scale * jax.random.normal(
            keys[4], (embed_dim, embed_dim))).astype(dtype)
    else:
        params["ln_post"] = init_layer_norm(w, dtype)
        params["proj"] = (scale * jax.random.normal(
            keys[4], (w, embed_dim))).astype(dtype)
    if cfg.rel_pos_bias:
        # per-layer learned relative-position bias table replaces the
        # absolute position embedding (timm vit_relpos; trunc-normal .02
        # init like timm RelPosBias). Lives inside the stacked blocks so
        # lax.scan / pipeline stage-slicing thread it per layer for free.
        _, n_idx = relative_position_index(cfg.grid)
        params["blocks"]["rel_pos"] = (
            0.02 * jax.random.normal(keys[2], (cfg.layers, n_idx, cfg.heads))
        ).astype(dtype)
    else:
        params["pos_embed"] = (
            scale * jax.random.normal(keys[2], (cfg.seq_len, w))).astype(dtype)
    if not cfg.no_ln_pre:
        params["ln_pre"] = init_layer_norm(w, dtype)
    if cfg.attentional_pool:
        params["attn_pool"] = init_attentional_pooler(
            keys[5], d_model=embed_dim, context_dim=w,
            n_queries=cfg.attn_pooler_queries, dtype=dtype)
    return params


def init_attentional_pooler(key, d_model: int, context_dim: int,
                            n_queries: int, dtype=jnp.float32):
    """open_CLIP AttentionalPooler (transformer.py): learned queries cross-attend
    to the token sequence."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    std = d_model ** -0.5
    return {
        "query": (std * jax.random.normal(k1, (n_queries, d_model))).astype(dtype),
        "attn": {
            "wq": (std * jax.random.normal(k2, (d_model, d_model))).astype(dtype),
            "bq": jnp.zeros((d_model,), dtype=dtype),
            "wkv": (std * jax.random.normal(k3, (context_dim, 2 * d_model))).astype(dtype),
            "bkv": jnp.zeros((2 * d_model,), dtype=dtype),
            "wo": (std * jax.random.normal(k4, (d_model, d_model))).astype(dtype),
            "bo": jnp.zeros((d_model,), dtype=dtype),
        },
        "ln_q": init_layer_norm(d_model, dtype),
        "ln_k": init_layer_norm(context_dim, dtype),
    }


def apply_attentional_pooler(pool, x, heads: int):
    q = layer_norm(pool["query"].astype(x.dtype)[None].repeat(x.shape[0], axis=0),
                   pool["ln_q"]["scale"], pool["ln_q"]["bias"])
    k = layer_norm(x, pool["ln_k"]["scale"], pool["ln_k"]["bias"])
    return multi_head_attention(q, pool["attn"], heads, kv=k, use_flash=False)


def _global_pool(x, pool_type: str):
    if pool_type == "tok":
        return x[:, 0], x[:, 1:]
    if pool_type == "avg":
        return jnp.mean(x[:, 1:], axis=1), x[:, 1:]
    return x, x  # 'none'


def apply_vit(params, images, cfg: VisionCfg, embed_dim: int, *,
              act: str = "gelu", tcfg: Optional[TransformerCfg] = None,
              compute_dtype=jnp.bfloat16, patch_dropout_rng=None,
              output_tokens: bool = False, layers_fn=None):
    """images: [B, H, W, C] float (already normalized). Returns [B, embed_dim]
    (or (pooled, tokens) when output_tokens)."""
    tcfg = tcfg or cfg.transformer(act=act)
    x = patchify(images.astype(compute_dtype), cfg.patch_size)
    x = jnp.einsum("bnp,pw->bnw", x, params["patch_embed"]["w"].astype(compute_dtype))
    b = x.shape[0]
    cls = params["cls"].astype(compute_dtype)[None, None].repeat(b, axis=0)
    x = jnp.concatenate([cls, x], axis=1)
    rel_index = None
    if cfg.rel_pos_bias:
        g_in = int(round((x.shape[1] - 1) ** 0.5))
        rel_index, _ = relative_position_index(g_in, cfg.grid)
    else:
        pe = params["pos_embed"]
        if pe.shape[0] != x.shape[1]:
            # input grid differs from the trained grid (e.g. DINO local
            # crops): bilinear-interpolate the 2D position table (DeiT/DINO
            # interpolate_pos_encoding)
            g_from = int(round((pe.shape[0] - 1) ** 0.5))
            g_to = int(round((x.shape[1] - 1) ** 0.5))
            grid = pe[1:].reshape(g_from, g_from, -1)
            grid = jax.image.resize(grid, (g_to, g_to, grid.shape[-1]),
                                    method="bilinear")
            pe = jnp.concatenate([pe[:1], grid.reshape(g_to * g_to, -1)],
                                 axis=0)
        x = x + pe.astype(compute_dtype)[None]

    if patch_dropout_rng is not None and cfg.patch_dropout > 0.0:
        # open_CLIP PatchDropout (transformer.py): keep cls, keep a random
        # (1 - rate) fraction of patches, same count per example.
        n = x.shape[1] - 1
        keep = max(1, int(n * (1.0 - cfg.patch_dropout)))
        noise = jax.random.uniform(patch_dropout_rng, (b, n))
        ids = jnp.argsort(noise, axis=1)[:, :keep]
        patches = jnp.take_along_axis(x[:, 1:], ids[..., None], axis=1)
        x = jnp.concatenate([x[:, :1], patches], axis=1)
        if rel_index is not None:
            # relpos + patch dropout: gather the bias map per KEPT token —
            # each example keeps different patches, so the [S, S] relative-
            # position index becomes per-example [B, S', S'] (apply_block
            # builds a [B, H, S', S'] logits bias; the pipeline schedules
            # microbatch the per-example map and index it per tick)
            tok = jnp.concatenate(
                [jnp.zeros((b, 1), ids.dtype), ids + 1], axis=1)
            rel_index = rel_index[tok[:, :, None], tok[:, None, :]]

    if "ln_pre" in params:
        x = layer_norm(x, params["ln_pre"]["scale"], params["ln_pre"]["bias"])
    if layers_fn is None:
        x = apply_transformer(params["blocks"], x, tcfg, causal=False,
                              rel_index=rel_index)
    elif rel_index is not None:
        # the per-layer rel_pos tables ride the stacked blocks (already
        # stage-sharded); only the layer-independent [S, S] gather map
        # crosses into the schedule
        x = layers_fn(params["blocks"], x, tcfg, causal=False,
                      rel_index=rel_index)
    else:
        x = layers_fn(params["blocks"], x, tcfg, causal=False)

    if "attn_pool" in params:
        # open_CLIP attentional-pool order (transformer.py:498-508): pool the
        # raw token sequence (the pooler ln_k-normalizes internally), ln_post
        # over the pooled queries, split query 0 / rest, project query 0.
        # CoCa reads query 0 as the contrastive embedding and queries 1..n
        # as the caption context (coca_model.py _encode_image).
        x = apply_attentional_pooler(params["attn_pool"], x, cfg.attn_pooler_heads)
        x = layer_norm(x, params["ln_post"]["scale"], params["ln_post"]["bias"])
        pooled, tokens = x[:, 0], x[:, 1:]
        pooled = pooled @ params["proj"].astype(pooled.dtype)
    elif cfg.pool_type == "tok":
        # reference semantics (transformer.py:502-508): pool, then ln_post
        # on the pooled vector; `tokens` stay un-normalized (CoCa's caption
        # context for the no-attn-pool configs). LN is per-token, so for
        # cls pooling LN-then-slice == slice-then-LN — and the seq-wide LN
        # schedules ~30% faster on v5e (287 vs 379 ms/step ViT-L bs64:
        # slicing x[:, 0] out of the last block's output before the LN
        # breaks XLA's epilogue fusion; measured round 5)
        pooled = layer_norm(x, params["ln_post"]["scale"],
                            params["ln_post"]["bias"])[:, 0]
        tokens = x[:, 1:]
        pooled = pooled @ params["proj"].astype(pooled.dtype)
    else:
        pooled, tokens = _global_pool(x, cfg.pool_type)
        pooled = layer_norm(pooled, params["ln_post"]["scale"], params["ln_post"]["bias"])
        pooled = pooled @ params["proj"].astype(pooled.dtype)

    if output_tokens:
        return pooled, tokens
    return pooled
