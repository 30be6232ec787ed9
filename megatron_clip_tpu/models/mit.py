"""MiT (mix transformer, SegFormer family) backbone.

Covers the reference's mit backbone (megatron/model/vision/mit_backbone.py
~415 LoC): four stages of overlapping conv patch embeddings (stride
4/2/2/2), efficient self-attention with spatially-reduced K/V (sr_ratio
8/4/2/1), and Mix-FFN (fc -> 3x3 depthwise conv -> gelu -> fc). Convs use
lax.conv_general_dilated in NHWC; everything static-shaped.
"""
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from megatron_clip_tpu.nn.transformer import init_layer_norm
from megatron_clip_tpu.ops import layer_norm
from megatron_clip_tpu.ops.activations import bias_act


@dataclass(frozen=True)
class MiTCfg:
    """Defaults = MiT-B0; B2 = dims (64,128,320,512), depths (3,4,6,3)."""
    image_size: int = 224
    dims: Tuple[int, ...] = (32, 64, 160, 256)
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    heads: Tuple[int, ...] = (1, 2, 5, 8)
    sr_ratios: Tuple[int, ...] = (8, 4, 2, 1)
    mlp_ratio: float = 4.0

    @property
    def num_features(self):
        return self.dims[-1]


def _conv(x, w, stride, padding):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _dwconv(x, w):
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def _init_stage_embed(key, cin, cout, kernel, dtype):
    std = (kernel * kernel * cin) ** -0.5
    return {
        "w": (std * jax.random.normal(key, (kernel, kernel, cin, cout))
              ).astype(dtype),
        "b": jnp.zeros((cout,), dtype=dtype),
        "ln": init_layer_norm(cout, dtype),
    }


def _init_block(key, dim, heads, sr, mlp_ratio, dtype):
    ks = jax.random.split(key, 8)
    hid = int(dim * mlp_ratio)
    std = 0.02
    p = {
        "ln_1": init_layer_norm(dim, dtype),
        "attn": {
            "wq": (std * jax.random.normal(ks[0], (dim, dim))).astype(dtype),
            "wkv": (std * jax.random.normal(ks[1], (dim, 2 * dim))).astype(dtype),
            "wo": (std * jax.random.normal(ks[2], (dim, dim))).astype(dtype),
            "bq": jnp.zeros((dim,), dtype=dtype),
            "bkv": jnp.zeros((2 * dim,), dtype=dtype),
            "bo": jnp.zeros((dim,), dtype=dtype),
        },
        "ln_2": init_layer_norm(dim, dtype),
        "mlp": {
            "w1": (std * jax.random.normal(ks[3], (dim, hid))).astype(dtype),
            "b1": jnp.zeros((hid,), dtype=dtype),
            "dw": (std * jax.random.normal(ks[4], (3, 3, 1, hid))).astype(dtype),
            "w2": (std * jax.random.normal(ks[5], (hid, dim))).astype(dtype),
            "b2": jnp.zeros((dim,), dtype=dtype),
        },
    }
    if sr > 1:
        p["attn"]["sr"] = {
            "w": (std * jax.random.normal(ks[6], (sr, sr, dim, dim))
                  ).astype(dtype),
            "b": jnp.zeros((dim,), dtype=dtype),
            "ln": init_layer_norm(dim, dtype),
        }
    return p


def init_mit(key, cfg: MiTCfg, num_classes: int = 0, dtype=jnp.float32):
    keys = jax.random.split(key, 2 + len(cfg.dims))
    params = {"stages": [], "ln_f": init_layer_norm(cfg.num_features, dtype)}
    cin = 3
    kb = keys[0]
    for si, dim in enumerate(cfg.dims):
        kernel = 7 if si == 0 else 3
        kb, ke = jax.random.split(kb)
        stage = {"embed": _init_stage_embed(ke, cin, dim, kernel, dtype),
                 "blocks": []}
        for _ in range(cfg.depths[si]):
            kb, kk = jax.random.split(kb)
            stage["blocks"].append(_init_block(
                kk, dim, cfg.heads[si], cfg.sr_ratios[si], cfg.mlp_ratio,
                dtype))
        params["stages"].append(stage)
        cin = dim
    if num_classes:
        params["head"] = {
            "w": (0.02 * jax.random.normal(
                keys[1], (cfg.num_features, num_classes))).astype(dtype),
            "b": jnp.zeros((num_classes,), dtype=dtype),
        }
    return params


def _efficient_attention(blk, x, heads, sr, res):
    """x: [B, N, C] with N = res*res; K/V spatially reduced by sr."""
    b, n, c = x.shape
    hd = c // heads
    q = x @ blk["wq"].astype(x.dtype) + blk["bq"].astype(x.dtype)
    kv_in = x
    if sr > 1:
        img = x.reshape(b, res, res, c)
        img = _conv(img, blk["sr"]["w"], sr, "VALID") \
            + blk["sr"]["b"].astype(x.dtype)
        kv_in = img.reshape(b, -1, c)
        kv_in = layer_norm(kv_in, blk["sr"]["ln"]["scale"],
                           blk["sr"]["ln"]["bias"])
    kv = kv_in @ blk["wkv"].astype(x.dtype) + blk["bkv"].astype(x.dtype)
    k, v = jnp.split(kv, 2, axis=-1)
    sp = lambda t: t.reshape(b, t.shape[1], heads, hd).transpose(0, 2, 1, 3)
    q, k, v = sp(q), sp(k), sp(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * hd ** -0.5
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
    return out @ blk["wo"].astype(x.dtype) + blk["bo"].astype(x.dtype)


def apply_mit_features(params, images, cfg: MiTCfg, *,
                       compute_dtype=jnp.bfloat16):
    """Hierarchical feature maps, one per stage: [B, H/4, W/4, C1] ...
    [B, H/32, W/32, C4] — the pyramid a SegFormer decode head consumes
    (reference tasks/vision/segmentation/finetune_segformer.py backbone
    contract)."""
    b = images.shape[0]
    x = images.astype(compute_dtype)
    res = cfg.image_size
    feats = []
    for si, stage in enumerate(params["stages"]):
        stride = 4 if si == 0 else 2
        x = _conv(x, stage["embed"]["w"], stride, "SAME") \
            + stage["embed"]["b"].astype(x.dtype)
        res = res // stride
        c = x.shape[-1]
        x = x.reshape(b, res * res, c)
        x = layer_norm(x, stage["embed"]["ln"]["scale"],
                       stage["embed"]["ln"]["bias"])
        for blk in stage["blocks"]:
            h = layer_norm(x, blk["ln_1"]["scale"], blk["ln_1"]["bias"])
            x = x + _efficient_attention(blk["attn"], h, cfg.heads[si],
                                         cfg.sr_ratios[si], res)
            h = layer_norm(x, blk["ln_2"]["scale"], blk["ln_2"]["bias"])
            h = h @ blk["mlp"]["w1"].astype(h.dtype) \
                + blk["mlp"]["b1"].astype(h.dtype)
            h = _dwconv(h.reshape(b, res, res, -1),
                        blk["mlp"]["dw"]).reshape(b, res * res, -1)
            h = bias_act(h, None, "gelu")
            h = h @ blk["mlp"]["w2"].astype(h.dtype) \
                + blk["mlp"]["b2"].astype(h.dtype)
            x = x + h
        x = x.reshape(b, res, res, c)
        feats.append(x)
    return feats


def apply_mit(params, images, cfg: MiTCfg, *, compute_dtype=jnp.bfloat16,
              return_features: bool = False):
    x = apply_mit_features(params, images, cfg,
                           compute_dtype=compute_dtype)[-1]
    b, res = x.shape[0], x.shape[1]
    x = x.reshape(b, res * res, cfg.num_features)
    x = layer_norm(x, params["ln_f"]["scale"], params["ln_f"]["bias"])
    pooled = x.mean(axis=1).astype(jnp.float32)
    if return_features or "head" not in params:
        return pooled
    return (pooled @ params["head"]["w"].astype(jnp.float32)
            + params["head"]["b"].astype(jnp.float32))
