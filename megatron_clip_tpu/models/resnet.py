"""ModifiedResNet vision tower (CLIP RN50/RN101/RN50x4/x16/x64).

Follows open_CLIP's ModifiedResNet (open_CLIP/src/open_clip/
modified_resnet.py): 3-conv stem with avgpool, anti-aliased bottleneck
blocks (stride moved into an AvgPool before the last 1x1 conv), and the
attention-pool head (mean-query multi-head attention with a learned 2D
positional embedding).

BatchNorm in a functional stack: params carry (scale, bias, mean, var) per
BN. `train=False` (default) uses the stored running stats — exactly what
loading a torch checkpoint's frozen statistics needs, giving inference /
zero-shot parity. `train=True` normalizes with batch statistics and also
returns an EMA-updated stats tree; the caller merges it back into params
(the same pattern as the DINO center buffer).
"""
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

BN_MOMENTUM = 0.1  # torch BatchNorm2d default


@dataclass(frozen=True)
class ResNetCfg:
    layers: Tuple[int, ...] = (3, 4, 6, 3)   # RN50
    width: int = 64
    image_size: int = 224
    heads: int = 32  # attn-pool heads = vision_width * 32 // 64 for RN50


def _conv_init(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    return (jax.random.normal(key, (kh, kw, cin, cout))
            * (2.0 / fan_in) ** 0.5).astype(jnp.float32)


def _bn_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def conv2d(x, w, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def batch_norm(x, bn, train: bool, eps: float = 1e-5):
    """Returns (y, batch_stats or None)."""
    if train:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.var(xf, axis=(0, 1, 2))
        stats = (mean, var)
    else:
        mean, var = bn["mean"], bn["var"]
        stats = None
    y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps)
    y = y * bn["scale"] + bn["bias"]
    return y.astype(x.dtype), stats


def avg_pool(x, k, stride=None):
    stride = stride or k
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, stride, stride, 1),
        "VALID") / (k * k)


def _init_bottleneck(key, cin, cout, stride):
    # stride is structural (python int), not a param: apply derives it from
    # block position so the tree holds only arrays
    ks = jax.random.split(key, 4)
    exp = cout * 4
    p = {
        "conv1": _conv_init(ks[0], 1, 1, cin, cout), "bn1": _bn_init(cout),
        "conv2": _conv_init(ks[1], 3, 3, cout, cout), "bn2": _bn_init(cout),
        "conv3": _conv_init(ks[2], 1, 1, cout, exp), "bn3": _bn_init(exp),
    }
    if stride > 1 or cin != exp:
        p["down_conv"] = _conv_init(ks[3], 1, 1, cin, exp)
        p["down_bn"] = _bn_init(exp)
    return p


def _apply_bottleneck(p, x, stride, train, stats_out):
    relu = jax.nn.relu
    h, s = batch_norm(conv2d(x, p["conv1"]), p["bn1"], train)
    stats_out.append(s)
    h = relu(h)
    h, s = batch_norm(conv2d(h, p["conv2"]), p["bn2"], train)
    stats_out.append(s)
    h = relu(h)
    if stride > 1:
        h = avg_pool(h, stride)               # anti-aliased downsample
    h, s = batch_norm(conv2d(h, p["conv3"]), p["bn3"], train)
    stats_out.append(s)
    if "down_conv" in p:
        idn = x
        if stride > 1:
            idn = avg_pool(idn, stride)
        idn, s = batch_norm(conv2d(idn, p["down_conv"]), p["down_bn"], train)
        stats_out.append(s)
    else:
        idn = x
    return relu(h + idn)


def init_modified_resnet(key, cfg: ResNetCfg, embed_dim: int):
    w = cfg.width
    ks = jax.random.split(key, 8 + len(cfg.layers))
    params = {
        "stem": {
            "conv1": _conv_init(ks[0], 3, 3, 3, w // 2), "bn1": _bn_init(w // 2),
            "conv2": _conv_init(ks[1], 3, 3, w // 2, w // 2), "bn2": _bn_init(w // 2),
            "conv3": _conv_init(ks[2], 3, 3, w // 2, w), "bn3": _bn_init(w),
        },
        "stages": [],
    }
    cin = w
    for i, n_blocks in enumerate(cfg.layers):
        cout = w * (2 ** i)
        stage = []
        for b in range(n_blocks):
            stride = 2 if (b == 0 and i > 0) else 1
            stage.append(_init_bottleneck(
                jax.random.split(ks[3 + i], n_blocks)[b], cin, cout, stride))
            cin = cout * 4
        params["stages"].append(stage)
    # attention pool: spacial_dim = image_size // 32
    sd = cfg.image_size // 32
    feat = cin
    kq, kk, kv, kc, kp = jax.random.split(ks[-1], 5)
    std = feat ** -0.5
    params["attnpool"] = {
        "pos_embed": (std * jax.random.normal(kp, (sd * sd + 1, feat))),
        "wq": std * jax.random.normal(kq, (feat, feat)),
        "wk": std * jax.random.normal(kk, (feat, feat)),
        "wv": std * jax.random.normal(kv, (feat, feat)),
        "bq": jnp.zeros((feat,)), "bk": jnp.zeros((feat,)),
        "bv": jnp.zeros((feat,)),
        "wo": std * jax.random.normal(kc, (feat, embed_dim)),
        "bo": jnp.zeros((embed_dim,)),
    }
    return params


def _attention_pool(p, x, heads):
    """x: [B, H, W, C] -> [B, embed_dim]. Mean token is the query
    (modified_resnet.py AttentionPool2d)."""
    b, h_, w_, c = x.shape
    t = x.reshape(b, h_ * w_, c).astype(jnp.float32)
    t = jnp.concatenate([t.mean(1, keepdims=True), t], axis=1)
    t = t + p["pos_embed"][None]
    q = (t[:, :1] @ p["wq"] + p["bq"])
    k = (t @ p["wk"] + p["bk"])
    v = (t @ p["wv"] + p["bv"])
    hd = c // heads
    q = q.reshape(b, 1, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
    a = jax.nn.softmax((q @ k.transpose(0, 1, 3, 2)) * hd ** -0.5, axis=-1)
    o = (a @ v).transpose(0, 2, 1, 3).reshape(b, 1, c)[:, 0]
    return o @ p["wo"] + p["bo"]


def apply_modified_resnet(params, images, cfg: ResNetCfg, *, train=False,
                          compute_dtype=jnp.bfloat16):
    """images [B, H, W, 3] -> features [B, embed_dim] (fp32).
    With train=True returns (features, bn_batch_stats list in apply order)."""
    stats = []
    x = images.astype(compute_dtype)
    st = params["stem"]
    for i in (1, 2, 3):
        x = conv2d(x, st[f"conv{i}"], stride=2 if i == 1 else 1)
        x, s = batch_norm(x, st[f"bn{i}"], train)
        stats.append(s)
        x = jax.nn.relu(x)
    x = avg_pool(x, 2)
    for i, stage in enumerate(params["stages"]):
        for b, block in enumerate(stage):
            stride = 2 if (b == 0 and i > 0) else 1
            x = _apply_bottleneck(block, x, stride, train, stats)
    feats = _attention_pool(params["attnpool"], x, cfg.heads)
    if train:
        return feats.astype(jnp.float32), stats
    return feats.astype(jnp.float32)


def merge_bn_stats(params, stats, momentum: float = BN_MOMENTUM):
    """EMA-merge batch stats (from apply(..., train=True)) back into params,
    in the same traversal order."""
    stats = list(stats)
    # merge in the same order as apply: stem bn1..3, then stage blocks
    new = {"stem": {}, "stages": [], "attnpool": params["attnpool"]}
    st = params["stem"]
    new_stem = dict(st)
    for i in (1, 2, 3):
        s = stats.pop(0)
        bn = st[f"bn{i}"]
        if s is not None:
            mean, var = s
            bn = dict(bn, mean=(1 - momentum) * bn["mean"] + momentum * mean,
                      var=(1 - momentum) * bn["var"] + momentum * var)
        new_stem[f"bn{i}"] = bn
    new["stem"] = new_stem
    for stage in params["stages"]:
        new_stage = []
        for block in stage:
            nb = dict(block)
            for name in ("bn1", "bn2", "bn3") + (("down_bn",) if "down_bn" in block else ()):
                s = stats.pop(0)
                bn = block[name]
                if s is not None:
                    mean, var = s
                    bn = dict(bn, mean=(1 - momentum) * bn["mean"] + momentum * mean,
                              var=(1 - momentum) * bn["var"] + momentum * var)
                nb[name] = bn
            new_stage.append(nb)
        new["stages"].append(new_stage)
    assert not stats, f"{len(stats)} unmerged stats"
    return new
