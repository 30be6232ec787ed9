"""ConvNeXt vision tower (native JAX, NHWC).

The reference's convnext CLIP configs delegate the tower to timm
(open_CLIP/src/open_clip/model_configs/convnext_*.json `timm_model_name`,
timm_model.py TimmModel). Here the architecture (Liu et al. 2022,
"A ConvNet for the 2020s") is implemented natively, TPU-first:

  - channels_last everywhere (NHWC is XLA's native conv layout);
  - the 7x7 depthwise conv lowers to an MXU-friendly grouped conv;
  - the two pointwise convs are plain GEMMs, fused with GELU by XLA;
  - LayerNorm over the channel dim (timm's LayerNorm2d in channels_last).

Stage plan: stem 4x4/s4 conv + LN, then 4 stages of `depths[i]` blocks with
LN + 2x2/s2 downsample convs between stages. Block: dw7x7 -> LN -> pw 4x ->
GELU -> pw -> layer-scale gamma -> residual. Head: global average pool ->
LN -> projection to embed_dim (timm_proj 'linear' | 'mlp' | 'none').
"""
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# timm model name -> (depths, dims) (architecture facts)
CONVNEXT_ARCHS = {
    "convnext_atto": ((2, 2, 6, 2), (40, 80, 160, 320)),
    "convnext_femto": ((2, 2, 6, 2), (48, 96, 192, 384)),
    "convnext_pico": ((2, 2, 6, 2), (64, 128, 256, 512)),
    "convnext_nano": ((2, 2, 8, 2), (80, 160, 320, 640)),
    "convnext_tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "convnext_base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "convnext_large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
    "convnext_xlarge": ((3, 3, 27, 3), (256, 512, 1024, 2048)),
    "convnext_xxlarge": ((3, 4, 30, 3), (384, 768, 1536, 3072)),
}


@dataclass(frozen=True)
class ConvNeXtCfg:
    depths: Tuple[int, ...] = (3, 3, 27, 3)
    dims: Tuple[int, ...] = (128, 256, 512, 1024)
    image_size: int = 224
    ls_init: float = 1e-6          # layer-scale gamma init
    proj: str = "linear"           # linear | mlp | none (timm_proj)
    drop_path: float = 0.0         # stochastic depth (train-time only)


def _conv_init(key, kh, kw, cin, cout, std=None):
    std = std or (kh * kw * cin) ** -0.5
    return jax.random.truncated_normal(
        key, -2, 2, (kh, kw, cin, cout), jnp.float32) * std


def _ln_params(dim):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def _ln(p, x):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def init_convnext(key, cfg: ConvNeXtCfg, embed_dim: Optional[int] = None,
                  dtype=jnp.float32):
    keys = iter(jax.random.split(key, 8 + 2 * sum(cfg.depths)))
    params = {
        "stem": {"conv": _conv_init(next(keys), 4, 4, 3, cfg.dims[0],
                                    std=0.02).astype(dtype),
                 "bias": jnp.zeros((cfg.dims[0],), dtype),
                 "ln": _ln_params(cfg.dims[0])},
        "stages": [],
        "downsample": [],
        "head_ln": _ln_params(cfg.dims[-1]),
    }
    for i, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
        if i > 0:
            params["downsample"].append({
                "ln": _ln_params(cfg.dims[i - 1]),
                "conv": _conv_init(next(keys), 2, 2, cfg.dims[i - 1],
                                   dim, std=0.02).astype(dtype),
                "bias": jnp.zeros((dim,), dtype)})
        blocks = []
        for _ in range(depth):
            k1, k2, k3 = jax.random.split(next(keys), 3)
            blocks.append({
                "dwconv": _conv_init(k1, 7, 7, 1, dim, std=0.02).astype(dtype),
                "dwbias": jnp.zeros((dim,), dtype),
                "ln": _ln_params(dim),
                "pw1": (0.02 * jax.random.normal(
                    k2, (dim, 4 * dim))).astype(dtype),
                "b1": jnp.zeros((4 * dim,), dtype),
                "pw2": (0.02 * jax.random.normal(
                    k3, (4 * dim, dim))).astype(dtype),
                "b2": jnp.zeros((dim,), dtype),
                "gamma": jnp.full((dim,), cfg.ls_init, dtype),
            })
        # stack block pytrees (leading axis = depth) for lax.scan
        params["stages"].append(
            jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
            if depth > 1 else jax.tree.map(lambda x: x[None], blocks[0]))
    if embed_dim is not None and cfg.proj != "none":
        kp = next(keys)
        if cfg.proj == "mlp":
            ka, kb = jax.random.split(kp)
            params["proj"] = {
                "w1": (cfg.dims[-1] ** -0.5 * jax.random.normal(
                    ka, (cfg.dims[-1], cfg.dims[-1]))).astype(dtype),
                "b1": jnp.zeros((cfg.dims[-1],), dtype),
                "w2": (cfg.dims[-1] ** -0.5 * jax.random.normal(
                    kb, (cfg.dims[-1], embed_dim))).astype(dtype),
                "b2": jnp.zeros((embed_dim,), dtype)}
        else:
            params["proj"] = {
                "w": (cfg.dims[-1] ** -0.5 * jax.random.normal(
                    kp, (cfg.dims[-1], embed_dim))).astype(dtype),
                "b": jnp.zeros((embed_dim,), dtype)}
    return params


def _conv(x, w, bias, stride, groups=1):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    return y + bias.astype(x.dtype)


def _block(bp, x, *, drop_path=0.0, rng=None):
    """dw7x7 -> LN -> pw(4x) -> GELU -> pw -> gamma -> (+)"""
    c = x.shape[-1]
    h = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    h = _conv(h, bp["dwconv"], bp["dwbias"], 1, groups=c)
    h = _ln(bp["ln"], h)
    h = jnp.einsum("bhwc,cd->bhwd", h, bp["pw1"].astype(h.dtype))
    h = jax.nn.gelu(h + bp["b1"].astype(h.dtype), approximate=False)
    h = jnp.einsum("bhwc,cd->bhwd", h, bp["pw2"].astype(h.dtype))
    h = (h + bp["b2"].astype(h.dtype)) * bp["gamma"].astype(h.dtype)
    if drop_path > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - drop_path,
                                    (x.shape[0], 1, 1, 1))
        h = jnp.where(keep, h / (1.0 - drop_path), 0.0)
    return x + h


def apply_convnext(params, images, cfg: ConvNeXtCfg,
                   embed_dim: Optional[int] = None, *,
                   compute_dtype=jnp.bfloat16, drop_path_rng=None):
    """images [B, H, W, 3] -> pooled features [B, embed_dim or dims[-1]]."""
    x = images.astype(compute_dtype)
    x = _conv(x, params["stem"]["conv"], params["stem"]["bias"], 4)
    x = _ln(params["stem"]["ln"], x)
    for i, stage in enumerate(params["stages"]):
        if i > 0:
            ds = params["downsample"][i - 1]
            x = _ln(ds["ln"], x)
            x = _conv(x, ds["conv"], ds["bias"], 2)
        depth = jax.tree.leaves(stage)[0].shape[0]
        rngs = (jax.random.split(drop_path_rng, depth)
                if (drop_path_rng is not None and cfg.drop_path > 0)
                else [None] * depth)
        for d in range(depth):
            bp = jax.tree.map(lambda t: t[d], stage)
            x = _block(bp, x, drop_path=cfg.drop_path, rng=rngs[d])
    x = x.mean(axis=(1, 2))                    # global average pool
    x = _ln(params["head_ln"], x)
    if "proj" in params and cfg.proj != "none":
        p = params["proj"]
        if cfg.proj == "mlp":
            x = jnp.einsum("bc,cd->bd", x, p["w1"].astype(x.dtype))
            x = jax.nn.gelu(x + p["b1"].astype(x.dtype), approximate=False)
            x = jnp.einsum("bc,cd->bd", x, p["w2"].astype(x.dtype))
            x = x + p["b2"].astype(x.dtype)
        else:
            x = jnp.einsum("bc,cd->bd", x, p["w"].astype(x.dtype))
            x = x + p["b"].astype(x.dtype)
    return x
