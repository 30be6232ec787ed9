"""Swin Transformer backbone (shifted-window attention).

Covers the reference's swin family (megatron/model/vision/swin_backbone.py
~625 LoC, used by classification and as the EsViT student/teacher). Design
is TPU-idiomatic: windows are pure reshapes/transposes (static shapes),
the cyclic shift is jnp.roll, the shifted-window attention mask and the
relative-position-bias gather indices are precomputed numpy constants —
everything under jit is dense batched attention over [num_windows*B, w*w]
tokens, which XLA tiles onto the MXU.
"""
from dataclasses import dataclass, field
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from megatron_clip_tpu.nn.transformer import init_layer_norm
from megatron_clip_tpu.ops import layer_norm
from megatron_clip_tpu.ops.activations import bias_act


@dataclass(frozen=True)
class SwinCfg:
    image_size: int = 224
    patch_size: int = 4
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0

    @property
    def num_features(self) -> int:
        return self.embed_dim * 2 ** (len(self.depths) - 1)

    def stage_resolution(self, stage: int) -> int:
        return self.image_size // self.patch_size // (2 ** stage)


def _rel_pos_index(w: int) -> np.ndarray:
    """[w*w, w*w] gather indices into the (2w-1)^2 relative bias table."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]          # [2, ww, ww]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(res: int, w: int, shift: int) -> np.ndarray:
    """Additive mask [nW, w*w, w*w] isolating the wrapped regions after a
    cyclic shift (the standard shifted-window construction)."""
    img = np.zeros((res, res), np.int32)
    cnt = 0
    slices = (slice(0, -w), slice(-w, -shift), slice(-shift, None))
    for hs in slices:
        for ws in slices:
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(res // w, w, res // w, w).transpose(0, 2, 1, 3)
    win = win.reshape(-1, w * w)
    diff = win[:, :, None] != win[:, None, :]
    return np.where(diff, -1e30, 0.0).astype(np.float32)


def _init_block(key, dim, heads, w, mlp_ratio, dtype):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    hid = int(dim * mlp_ratio)
    std = 0.02
    return {
        "ln_1": init_layer_norm(dim, dtype),
        "attn": {
            "wqkv": (std * jax.random.normal(k1, (dim, 3 * dim))).astype(dtype),
            "bqkv": jnp.zeros((3 * dim,), dtype=dtype),
            "wo": (std * jax.random.normal(k2, (dim, dim))).astype(dtype),
            "bo": jnp.zeros((dim,), dtype=dtype),
            "rel_bias": (std * jax.random.normal(
                k3, ((2 * w - 1) ** 2, heads))).astype(dtype),
        },
        "ln_2": init_layer_norm(dim, dtype),
        "mlp": {
            "w1": (std * jax.random.normal(k4, (dim, hid))).astype(dtype),
            "b1": jnp.zeros((hid,), dtype=dtype),
            "w2": (std * jax.random.normal(k5, (hid, dim))).astype(dtype),
            "b2": jnp.zeros((dim,), dtype=dtype),
        },
    }


def init_swin(key, cfg: SwinCfg, num_classes: int = 0, dtype=jnp.float32):
    keys = jax.random.split(key, 8)
    p = cfg.patch_size
    params = {
        "patch_embed": {
            "w": (0.02 * jax.random.normal(
                keys[0], (p * p * 3, cfg.embed_dim))).astype(dtype),
            "b": jnp.zeros((cfg.embed_dim,), dtype=dtype),
            "ln": init_layer_norm(cfg.embed_dim, dtype),
        },
        "stages": [],
        "ln_f": init_layer_norm(cfg.num_features, dtype),
    }
    kb = keys[1]
    for si, depth in enumerate(cfg.depths):
        dim = cfg.embed_dim * 2 ** si
        blocks = []
        for d in range(depth):
            kb, kk = jax.random.split(kb)
            blocks.append(_init_block(kk, dim, cfg.num_heads[si],
                                      cfg.window_size, cfg.mlp_ratio, dtype))
        stage = {"blocks": blocks}
        if si < len(cfg.depths) - 1:
            kb, kk = jax.random.split(kb)
            stage["merge"] = {
                "w": (0.02 * jax.random.normal(
                    kk, (4 * dim, 2 * dim))).astype(dtype),
                "ln": init_layer_norm(4 * dim, dtype),
            }
        params["stages"].append(stage)
    if num_classes:
        params["head"] = {
            "w": (0.02 * jax.random.normal(
                keys[2], (cfg.num_features, num_classes))).astype(dtype),
            "b": jnp.zeros((num_classes,), dtype=dtype),
        }
    return params


def _window_attention(block, x, heads, w, res, shift, compute_dtype):
    """x: [B, H, W, C] -> same, one (shifted-)window attention block."""
    b, hh, ww, c = x.shape
    hd = c // heads
    shortcut = x
    x = layer_norm(x, block["ln_1"]["scale"], block["ln_1"]["bias"])
    if shift:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    # partition into windows: [B*nW, w*w, C]
    nw = res // w
    xw = x.reshape(b, nw, w, nw, w, c).transpose(0, 1, 3, 2, 4, 5)
    xw = xw.reshape(b * nw * nw, w * w, c)

    qkv = xw @ block["attn"]["wqkv"].astype(xw.dtype) \
        + block["attn"]["bqkv"].astype(xw.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    sp = lambda t: t.reshape(t.shape[0], w * w, heads, hd).transpose(0, 2, 1, 3)
    q, k, v = sp(q), sp(k), sp(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * hd ** -0.5
    rel = block["attn"]["rel_bias"].astype(jnp.float32)[
        jnp.asarray(_rel_pos_index(w))]                    # [ww, ww, H]
    logits = logits + rel.transpose(2, 0, 1)[None]
    if shift:
        mask = jnp.asarray(_shift_attn_mask(res, w, shift))  # [nW, ww, ww]
        logits = logits.reshape(b, nw * nw, heads, w * w, w * w)
        logits = logits + mask[None, :, None]
        logits = logits.reshape(b * nw * nw, heads, w * w, w * w)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                     preferred_element_type=jnp.float32).astype(xw.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b * nw * nw, w * w, c)
    out = out @ block["attn"]["wo"].astype(out.dtype) \
        + block["attn"]["bo"].astype(out.dtype)
    out = out.reshape(b, nw, nw, w, w, c).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(b, res, res, c)
    if shift:
        out = jnp.roll(out, (shift, shift), axis=(1, 2))
    x = shortcut + out

    h = layer_norm(x, block["ln_2"]["scale"], block["ln_2"]["bias"])
    h = h @ block["mlp"]["w1"].astype(h.dtype)
    h = bias_act(h, block["mlp"]["b1"].astype(h.dtype), "gelu")
    h = h @ block["mlp"]["w2"].astype(h.dtype) \
        + block["mlp"]["b2"].astype(h.dtype)
    return x + h


def apply_swin(params, images, cfg: SwinCfg, *, compute_dtype=jnp.bfloat16,
               return_features: bool = False, return_tokens: bool = False):
    """images [B, H, W, 3] -> logits [B, num_classes] (head) or pooled
    features [B, num_features]; return_tokens adds the final token grid
    [B, res*res, num_features] (EsViT's region-level views)."""
    b = images.shape[0]
    p = cfg.patch_size
    x = images.astype(compute_dtype)
    grid = cfg.image_size // p
    x = x.reshape(b, grid, p, grid, p, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, grid, grid, p * p * 3)
    x = x @ params["patch_embed"]["w"].astype(compute_dtype) \
        + params["patch_embed"]["b"].astype(compute_dtype)
    x = layer_norm(x, params["patch_embed"]["ln"]["scale"],
                   params["patch_embed"]["ln"]["bias"])

    for si, stage in enumerate(params["stages"]):
        res = cfg.stage_resolution(si)
        w = min(cfg.window_size, res)
        if res % w:
            # window must tile the grid (at 224px the standard 7 divides
            # every stage; odd image sizes fall back to full-res attention)
            w = res
        for di, block in enumerate(stage["blocks"]):
            shift = 0 if di % 2 == 0 or w == res else w // 2
            x = _window_attention(block, x, cfg.num_heads[si], w, res,
                                  shift, compute_dtype)
        if "merge" in stage:
            # 2x2 patch merging
            r2 = res // 2
            c = x.shape[-1]
            x = x.reshape(b, r2, 2, r2, 2, c).transpose(0, 1, 3, 2, 4, 5)
            x = x.reshape(b, r2, r2, 4 * c)
            x = layer_norm(x, stage["merge"]["ln"]["scale"],
                           stage["merge"]["ln"]["bias"])
            x = x @ stage["merge"]["w"].astype(x.dtype)

    x = layer_norm(x, params["ln_f"]["scale"], params["ln_f"]["bias"])
    tokens = x.reshape(b, -1, x.shape[-1])
    pooled = tokens.mean(axis=1)
    if return_tokens:
        return pooled.astype(jnp.float32), tokens.astype(jnp.float32)
    if return_features or "head" not in params:
        return pooled.astype(jnp.float32)
    return (pooled @ params["head"]["w"].astype(pooled.dtype)
            + params["head"]["b"].astype(pooled.dtype)).astype(jnp.float32)
