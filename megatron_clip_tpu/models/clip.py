"""The two-tower CLIP model.

Combines the ViT vision tower and the text transformer with a learned
temperature, matching open_CLIP's CLIP/CustomTextCLIP
(open_CLIP/src/open_clip/model.py:178-320) and the fork's CLIPModel
(megatron/model/CLIP_model.py:259-326). `logit_scale` is initialized to
ln(1/0.07) and clamped to ln(100) at use (train.py:470-471).
"""
import math

import jax
import jax.numpy as jnp

from megatron_clip_tpu.config import CLIPCfg
from megatron_clip_tpu.models.vit import init_vit, apply_vit
from megatron_clip_tpu.models.text import init_text, apply_text

LOGIT_SCALE_MAX = math.log(100.0)


def _resnet_cfg(cfg: CLIPCfg):
    from megatron_clip_tpu.models.resnet import ResNetCfg
    return ResNetCfg(layers=tuple(cfg.resnet_layers),
                     width=cfg.resnet_width,
                     image_size=cfg.vision.image_size,
                     heads=cfg.resnet_width * 32 // 64)


# timm swin arch table (swin_transformer.py published hyperparameters)
_SWIN_ARCHS = {
    "tiny": (96, (2, 2, 6, 2), (3, 6, 12, 24)),
    "small": (96, (2, 2, 18, 2), (3, 6, 12, 24)),
    "base": (128, (2, 2, 18, 2), (4, 8, 16, 32)),
    "large": (192, (2, 2, 18, 2), (6, 12, 24, 48)),
}


def _swin_cfg(cfg: CLIPCfg):
    """SwinCfg from a timm swin model name, e.g.
    swin_base_patch4_window7_224 (open_CLIP swin configs delegate to timm;
    native tower here — models/swin.py)."""
    import re
    from megatron_clip_tpu.models.swin import SwinCfg
    m = re.match(r"swin_(tiny|small|base|large)_patch(\d+)_window(\d+)_(\d+)",
                 cfg.swin)
    if not m:
        raise ValueError(f"unrecognized swin arch name {cfg.swin!r}")
    embed, depths, heads = _SWIN_ARCHS[m.group(1)]
    return SwinCfg(image_size=int(m.group(4)), patch_size=int(m.group(2)),
                   embed_dim=embed, depths=depths, num_heads=heads,
                   window_size=int(m.group(3)))


def _init_swin_tower(key, cfg: CLIPCfg, dtype):
    from megatron_clip_tpu.models.swin import init_swin
    scfg = _swin_cfg(cfg)
    k1, k2, k3 = jax.random.split(key, 3)
    nf, e = scfg.num_features, cfg.embed_dim
    visual = {"trunk": init_swin(k1, scfg, dtype=dtype)}
    if cfg.swin_proj == "linear":
        visual["proj"] = {"w": (nf ** -0.5 * jax.random.normal(
            k2, (nf, e))).astype(dtype)}
    elif cfg.swin_proj == "mlp":
        visual["proj"] = {
            "w1": (nf ** -0.5 * jax.random.normal(k2, (nf, nf))).astype(dtype),
            "b1": jnp.zeros((nf,), dtype),
            "w2": (nf ** -0.5 * jax.random.normal(k3, (nf, e))).astype(dtype),
        }
    return visual


def _apply_swin_tower(params, images, cfg: CLIPCfg, compute_dtype):
    from megatron_clip_tpu.models.swin import apply_swin
    f = apply_swin(params["visual"]["trunk"], images, _swin_cfg(cfg),
                   compute_dtype=compute_dtype)
    pr = params["visual"].get("proj")
    if pr is None:
        return f.astype(jnp.float32)
    if "w1" in pr:
        h = jax.nn.gelu(f @ pr["w1"].astype(f.dtype) + pr["b1"].astype(f.dtype))
        return (h @ pr["w2"].astype(h.dtype)).astype(jnp.float32)
    return (f @ pr["w"].astype(f.dtype)).astype(jnp.float32)


def _convnext_cfg(cfg: CLIPCfg):
    from megatron_clip_tpu.models.convnext import CONVNEXT_ARCHS, ConvNeXtCfg
    depths, dims = CONVNEXT_ARCHS[cfg.convnext]
    return ConvNeXtCfg(depths=depths, dims=dims,
                       image_size=cfg.vision.image_size,
                       proj=cfg.convnext_proj,
                       drop_path=cfg.convnext_drop_path)


def _hf_is_t5(d: dict) -> bool:
    """T5/mT5-family text tower? (open_CLIP hf_configs.py arch_dict keys
    't5'/'mt5')."""
    if d.get("arch"):
        return d["arch"] == "t5"
    name = (d.get("model_name") or "").lower().split("/")[-1]
    # token match, not substring — and never route to T5 when the name
    # carries an explicit non-T5 family token ('roberta-distilled-from-mt5'
    # is a RoBERTa; 'flan-t5-base' / 'google/t5-v1_1-large' are T5s)
    import re
    tokens = set(re.split(r"[-_.]", name))
    non_t5 = {"roberta", "bert", "xlm", "electra", "deberta", "distilbert",
              "camembert", "albert", "gpt", "gpt2", "llama", "mistral"}
    if tokens & non_t5:
        return False
    return bool(tokens & {"t5", "mt5", "umt5", "byt5", "t5x"})


def _hf_t5_cfg(cfg: CLIPCfg):
    from megatron_clip_tpu.models.hf_t5_text import T5TextCfg
    d = cfg.hf_text
    t = cfg.text
    fields = ("vocab_size", "d_model", "d_kv", "d_ff", "heads", "layers",
              "layer_norm_eps", "rel_buckets", "rel_max_distance",
              "gated_ff", "pad_token_id")
    kw = {f: d[f] for f in fields if f in d}
    return T5TextCfg(
        vocab_size=kw.get("vocab_size", t.vocab_size),
        d_model=kw.get("d_model", t.width),
        d_kv=kw.get("d_kv", t.width // t.heads),
        d_ff=kw.get("d_ff", 4 * t.width),
        heads=kw.get("heads", t.heads), layers=kw.get("layers", t.layers),
        layer_norm_eps=kw.get("layer_norm_eps", 1e-6),
        rel_buckets=kw.get("rel_buckets", 32),
        rel_max_distance=kw.get("rel_max_distance", 128),
        gated_ff=kw.get("gated_ff", True),
        pad_token_id=kw.get("pad_token_id", 0),
        pooler=d.get("pooler", "mean_pooler"),
        proj=d.get("proj", "linear"), output_dim=cfg.embed_dim)


def _persist_t5(d: dict, tcfg) -> None:
    d["arch"] = "t5"
    for f in ("vocab_size", "d_model", "d_kv", "d_ff", "heads", "layers",
              "layer_norm_eps", "rel_buckets", "rel_max_distance",
              "gated_ff", "pad_token_id"):
        d[f] = getattr(tcfg, f)


def _hf_text_cfg(cfg: CLIPCfg):
    from megatron_clip_tpu.models.hf_text import (
        HFTextCfg, hf_text_cfg_from_dict)
    d = cfg.hf_text
    fallback = HFTextCfg(
        vocab_size=cfg.text.vocab_size, width=cfg.text.width,
        heads=cfg.text.heads, layers=cfg.text.layers,
        mlp_hidden=4 * cfg.text.width,
        max_positions=cfg.text.context_length + 2,
        pad_token_id=d.get("pad_token_id", 0),
        position_offset=bool(d.get("position_offset", False)),
        pooler=d.get("pooler", "mean_pooler"),
        proj=d.get("proj", "linear"), output_dim=cfg.embed_dim)
    # arch fields resolved from the actual HF checkpoint (persisted at load
    # or lazily here) override the text_cfg-derived defaults
    return hf_text_cfg_from_dict(d, fallback=fallback)


def init_clip(key, cfg: CLIPCfg, dtype=jnp.float32):
    kv, kt = jax.random.split(key)
    if cfg.resnet_layers is not None:
        from megatron_clip_tpu.models.resnet import init_modified_resnet
        visual = init_modified_resnet(kv, _resnet_cfg(cfg), cfg.embed_dim)
    elif cfg.convnext is not None:
        from megatron_clip_tpu.models.convnext import init_convnext
        visual = init_convnext(kv, _convnext_cfg(cfg), cfg.embed_dim,
                               dtype=dtype)
    elif cfg.swin is not None:
        visual = _init_swin_tower(kv, cfg, dtype)
    else:
        visual = init_vit(kv, cfg.vision, cfg.embed_dim, act=cfg.act,
                          dtype=dtype)
    if cfg.hf_text is not None:
        name = cfg.hf_text.get("model_name", "")
        is_t5 = _hf_is_t5(cfg.hf_text)
        if cfg.hf_text.get("pretrained") and name:
            if is_t5:
                from megatron_clip_tpu.models.hf_t5_text import \
                    load_hf_t5_text_tower
                tcfg5, text = load_hf_t5_text_tower(
                    name, output_dim=cfg.embed_dim,
                    proj=cfg.hf_text.get("proj", "linear"),
                    pooler=cfg.hf_text.get("pooler"))
                _persist_t5(cfg.hf_text, tcfg5)
            else:
                from megatron_clip_tpu.models.hf_text import (
                    load_hf_text_tower, persist_hf_text_cfg)
                hcfg, text = load_hf_text_tower(
                    name, output_dim=cfg.embed_dim,
                    proj=cfg.hf_text.get("proj", "linear"),
                    pooler=cfg.hf_text.get("pooler"))
                # record the checkpoint's true architecture so encode_text
                # rebuilds the same HFTextCfg (not text_cfg defaults)
                persist_hf_text_cfg(cfg.hf_text, hcfg)
        elif is_t5:
            from megatron_clip_tpu.models.hf_t5_text import init_hf_t5_text
            text = init_hf_t5_text(kt, _hf_t5_cfg(cfg), dtype)
        else:
            from megatron_clip_tpu.models.hf_text import init_hf_text
            text = init_hf_text(kt, _hf_text_cfg(cfg), dtype)
    else:
        text = init_text(kt, cfg.text, cfg.embed_dim, act=cfg.act,
                         dtype=dtype)
    params = {
        "visual": visual,
        "text": text,
        "logit_scale": jnp.asarray(cfg.init_logit_scale, dtype=jnp.float32),
    }
    if cfg.init_logit_bias is not None:
        params["logit_bias"] = jnp.asarray(cfg.init_logit_bias, dtype=jnp.float32)
    return params


def _l2_normalize(x, eps: float = 1e-12):
    # F.normalize semantics; do the norm in fp32 for stability.
    xf = x.astype(jnp.float32)
    n = jnp.maximum(jnp.linalg.norm(xf, axis=-1, keepdims=True), eps)
    return xf / n


def encode_image(params, images, cfg: CLIPCfg, *, normalize: bool = True,
                 compute_dtype=jnp.bfloat16, patch_dropout_rng=None,
                 remat: str = "none", sequence_parallel: bool = False,
                 scan_layers: bool = True, layers_fn=None):
    if layers_fn is not None and (cfg.resnet_layers is not None
                                  or cfg.convnext is not None
                                  or cfg.swin is not None):
        raise ValueError("pipeline parallelism (layers_fn) requires a "
                         "uniform transformer vision tower; ResNet/ConvNeXt/"
                         "Swin towers have no uniform layer stack to shard "
                         "over stages")
    if cfg.resnet_layers is not None:
        # ModifiedResNet tower. NOTE: through this generic path BatchNorm
        # runs on stored running stats (frozen-BN training regime); full
        # batch-stat training uses models/resnet.py's train=True API.
        from megatron_clip_tpu.models.resnet import apply_modified_resnet
        f = apply_modified_resnet(params["visual"], images, _resnet_cfg(cfg),
                                  compute_dtype=compute_dtype)
        return _l2_normalize(f) if normalize else f.astype(jnp.float32)
    if cfg.convnext is not None:
        from megatron_clip_tpu.models.convnext import apply_convnext
        f = apply_convnext(params["visual"], images, _convnext_cfg(cfg),
                           cfg.embed_dim, compute_dtype=compute_dtype)
        return _l2_normalize(f) if normalize else f.astype(jnp.float32)
    if cfg.swin is not None:
        f = _apply_swin_tower(params, images, cfg, compute_dtype)
        return _l2_normalize(f) if normalize else f
    f = apply_vit(params["visual"], images, cfg.vision, cfg.embed_dim,
                  act=cfg.act, compute_dtype=compute_dtype,
                  tcfg=cfg.vision.transformer(act=cfg.act, remat=remat,
                                              sequence_parallel=sequence_parallel,
                                              scan_layers=scan_layers),
                  patch_dropout_rng=patch_dropout_rng, layers_fn=layers_fn)
    return _l2_normalize(f) if normalize else f.astype(jnp.float32)


def encode_text(params, text_ids, cfg: CLIPCfg, *, normalize: bool = True,
                compute_dtype=jnp.bfloat16, remat: str = "none",
                sequence_parallel: bool = False, scan_layers: bool = True,
                layers_fn=None):
    if cfg.hf_text is not None:
        if layers_fn is not None:
            raise ValueError("pipeline parallelism (layers_fn) is not "
                             "supported for HF text towers (post-LN stack "
                             "outside the stacked-pytree layer format)")
        if _hf_is_t5(cfg.hf_text):
            from megatron_clip_tpu.models.hf_t5_text import apply_hf_t5_text
            f = apply_hf_t5_text(params["text"], text_ids, _hf_t5_cfg(cfg),
                                 compute_dtype=compute_dtype)
        else:
            from megatron_clip_tpu.models.hf_text import apply_hf_text
            f = apply_hf_text(params["text"], text_ids, _hf_text_cfg(cfg),
                              compute_dtype=compute_dtype)
        return _l2_normalize(f) if normalize else f.astype(jnp.float32)
    f = apply_text(params["text"], text_ids, cfg.text, cfg.embed_dim,
                   act=cfg.act, compute_dtype=compute_dtype,
                   tcfg=cfg.text.transformer(act=cfg.act, remat=remat,
                                             sequence_parallel=sequence_parallel,
                                             scan_layers=scan_layers),
                   layers_fn=layers_fn)
    return _l2_normalize(f) if normalize else f.astype(jnp.float32)


def apply_clip(params, images, text_ids, cfg: CLIPCfg, *,
               compute_dtype=jnp.bfloat16, patch_dropout_rng=None,
               remat: str = "none", sequence_parallel: bool = False,
               scan_layers: bool = True, layers_fn=None):
    """Forward both towers. Returns the dict shape open_CLIP's CLIP.forward
    emits (model.py:232-243): normalized features + clamped logit_scale.

    `layers_fn` (e.g. parallel/pipeline.make_pipelined_layers_fn) replaces
    apply_transformer inside BOTH towers — the joint-mesh pipelined CLIP,
    the reference's flagship config shape (schedules.py:1043 under
    pretrain_CLIP.py)."""
    out = {}
    if images is not None:
        out["image_features"] = encode_image(
            params, images, cfg, compute_dtype=compute_dtype,
            patch_dropout_rng=patch_dropout_rng, remat=remat,
            sequence_parallel=sequence_parallel, scan_layers=scan_layers,
            layers_fn=layers_fn)
    if text_ids is not None:
        out["text_features"] = encode_text(
            params, text_ids, cfg, compute_dtype=compute_dtype, remat=remat,
            sequence_parallel=sequence_parallel, scan_layers=scan_layers,
            layers_fn=layers_fn)
    out["logit_scale"] = jnp.exp(
        jnp.minimum(params["logit_scale"], LOGIT_SCALE_MAX))
    if "logit_bias" in params:
        out["logit_bias"] = params["logit_bias"]
    return out


def clamp_logit_scale(params):
    """Post-step clamp, matching open_CLIP train loop's
    `logit_scale.clamp_(0, ln(100))` (train.py:470-471)."""
    params = dict(params)
    params["logit_scale"] = jnp.clip(params["logit_scale"], 0.0, LOGIT_SCALE_MAX)
    return params
