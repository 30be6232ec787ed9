"""Model factory & config registry.

Public API matches open_CLIP's factory (open_CLIP/src/open_clip/factory.py:
108-338): `create_model`, `create_model_and_transforms`, `create_loss`,
`list_models`, `get_model_config`. The JSON schema of
`model_configs/*.json` ({embed_dim, vision_cfg, text_cfg[, multimodal_cfg]})
is accepted verbatim; the built-in registry below encodes the standard CLIP
architecture ladder (ViT-S → ViT-e) in code.

ResNet (ModifiedResNet) and ConvNeXt towers are native (models/resnet.py,
models/convnext.py). Remaining timm/HF-text tower families raise a clear
NotImplementedError.
"""
import json
import os
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax

from megatron_clip_tpu.config import (
    CLIPCfg, VisionCfg, TextCfg, MultimodalCfg, Precision, BF16)
from megatron_clip_tpu.models.clip import init_clip, apply_clip, encode_image, encode_text
from megatron_clip_tpu.losses import ClipLoss, CoCaLoss, SigLipLoss, DistillClipLoss


def _vit(embed_dim, v_layers, v_width, patch, t_width, t_heads, t_layers,
         image_size=224, head_width=64, mlp_ratio=4.0, context=77, **extra):
    cfg = {
        "embed_dim": embed_dim,
        "vision_cfg": {"image_size": image_size, "layers": v_layers,
                       "width": v_width, "patch_size": patch},
        "text_cfg": {"context_length": context, "vocab_size": 49408,
                     "width": t_width, "heads": t_heads, "layers": t_layers},
    }
    if head_width != 64:
        cfg["vision_cfg"]["head_width"] = head_width
    if mlp_ratio != 4.0:
        cfg["vision_cfg"]["mlp_ratio"] = mlp_ratio
    cfg.update(extra)
    return cfg


# The standard open-CLIP ViT ladder (architecture facts, not copied files).
_BUILTIN: Dict[str, dict] = {
    "ViT-S-32": _vit(384, 12, 384, 32, 384, 6, 12),
    "ViT-S-16": _vit(384, 12, 384, 16, 384, 6, 12),
    "ViT-M-32": _vit(512, 12, 512, 32, 512, 8, 12),
    "ViT-M-16": _vit(512, 12, 512, 16, 512, 8, 12),
    "ViT-B-32": _vit(512, 12, 768, 32, 512, 8, 12),
    "ViT-B-32-plus-256": _vit(640, 12, 896, 32, 640, 10, 12, image_size=256),
    "ViT-B-16": _vit(512, 12, 768, 16, 512, 8, 12),
    "ViT-B-16-plus-240": _vit(640, 12, 896, 16, 640, 10, 12, image_size=240),
    "ViT-L-14": _vit(768, 24, 1024, 14, 768, 12, 12),
    "ViT-L-14-336": _vit(768, 24, 1024, 14, 768, 12, 12, image_size=336),
    "ViT-L-16": _vit(768, 24, 1024, 16, 768, 12, 12),
    "ViT-H-14": _vit(1024, 32, 1280, 14, 1024, 16, 24, head_width=80),
    "ViT-H-16": _vit(1024, 32, 1280, 16, 1024, 16, 24, head_width=80),
    "ViT-g-14": _vit(1024, 40, 1408, 14, 1024, 16, 24, head_width=88,
                     mlp_ratio=4.3637),
    "ViT-G-14": _vit(1280, 48, 1664, 14, 1280, 20, 32, head_width=104,
                     mlp_ratio=4.9231),
    "ViT-e-14": _vit(1280, 56, 1792, 14, 1280, 20, 36, head_width=112,
                     mlp_ratio=8.5715),
}
def _rn(embed_dim, layers, width, image_size, t_width, t_heads,
        t_layers=12):
    return {
        "embed_dim": embed_dim,
        "vision_cfg": {"image_size": image_size, "layers": list(layers),
                       "width": width},
        "text_cfg": {"context_length": 77, "vocab_size": 49408,
                     "width": t_width, "heads": t_heads, "layers": t_layers},
    }


_BUILTIN.update({
    "RN50": _rn(1024, (3, 4, 6, 3), 64, 224, 512, 8),
    "RN101": _rn(512, (3, 4, 23, 3), 64, 224, 512, 8),
    "RN50x4": _rn(640, (4, 6, 10, 6), 80, 288, 640, 10),
    "RN50x16": _rn(768, (6, 8, 18, 8), 96, 384, 768, 12),
    "RN50x64": _rn(1024, (3, 15, 36, 10), 128, 448, 1024, 16),
})
for _name in ("RN50", "RN101"):
    _c = dict(_BUILTIN[_name])
    _c["quick_gelu"] = True
    _BUILTIN[_name + "-quickgelu"] = _c

# quickgelu variants (OpenAI-trained checkpoints use QuickGELU)
for _name in ["ViT-B-32", "ViT-B-16", "ViT-L-14"]:
    _c = dict(_BUILTIN[_name])
    _c["quick_gelu"] = True
    _BUILTIN[_name + "-quickgelu"] = _c

# tiny config for tests/smoke runs (CPU-friendly; real vocab for tokenizer ids)
_BUILTIN["test-tiny"] = {
    "embed_dim": 64,
    "vision_cfg": {"image_size": 32, "layers": 2, "width": 64,
                   "head_width": 32, "patch_size": 8},
    "text_cfg": {"context_length": 32, "vocab_size": 49408, "width": 64,
                 "heads": 2, "layers": 2},
}

# the remaining reference model_configs/*.json shapes (same published
# hyperparameters; megatron_clip_tpu towers are native re-implementations)
_BUILTIN["ViT-B-16-plus"] = _vit(640, 12, 896, 16, 640, 10, 12)
_BUILTIN["ViT-L-14-280"] = _vit(768, 24, 1024, 14, 768, 12, 12,
                                image_size=280)
_BUILTIN["ViT-L-16-320"] = _vit(768, 24, 1024, 16, 768, 12, 12,
                                image_size=320)
_BUILTIN["ViT-L-16-bigT"] = _vit(768, 24, 1408, 16, 1024, 16, 24)
_BUILTIN["ViT-L-16-bigT-backup"] = _vit(768, 24, 1024, 16, 768, 12, 24)
_BUILTIN["ViT-L-16-tiny"] = _vit(768, 2, 1024, 16, 1536, 12, 2)
_BUILTIN["ViT-M-16-alt"] = _vit(384, 12, 512, 16, 384, 6, 12)
_BUILTIN["ViT-M-16-alt"]["vision_cfg"]["ls_init_value"] = 1e-4
_BUILTIN["ViT-M-32-alt"] = _vit(384, 12, 512, 32, 384, 6, 12)
_BUILTIN["ViT-S-16-alt"] = _vit(256, 12, 384, 16, 256, 4, 10)
_BUILTIN["ViT-S-32-alt"] = _vit(256, 12, 384, 32, 256, 4, 10)

# HF-text-tower pairs (native towers: models/hf_text.py RoBERTa/XLM-R arch,
# models/hf_t5_text.py mT5 encoder). text_cfg carries the checkpoint's arch
# dims so from-scratch/offline init builds the right shapes.
def _hf_pair(embed_dim, vjson, hf_name, width, heads, layers, vocab,
             max_pos=514, proj="mlp", quick_gelu=False):
    cfg = {
        "embed_dim": embed_dim,
        "vision_cfg": vjson,
        "text_cfg": {"hf_model_name": hf_name, "proj": proj,
                     "pooler_type": "mean_pooler", "width": width,
                     "heads": heads, "layers": layers, "vocab_size": vocab,
                     "context_length": max_pos},
    }
    if quick_gelu:
        cfg["quick_gelu"] = True
    return cfg


_VITB32 = {"image_size": 224, "layers": 12, "width": 768, "patch_size": 32}
_VITH14 = {"image_size": 224, "layers": 32, "width": 1280, "head_width": 80,
           "patch_size": 14}
_BUILTIN["roberta-ViT-B-32"] = _hf_pair(
    512, _VITB32, "roberta-base", 768, 12, 12, 50265, quick_gelu=True)
_BUILTIN["xlm-roberta-base-ViT-B-32"] = _hf_pair(
    512, _VITB32, "xlm-roberta-base", 768, 12, 12, 250002)
_BUILTIN["xlm-roberta-large-ViT-H-14"] = _hf_pair(
    1024, _VITH14, "xlm-roberta-large", 1024, 16, 24, 250002)
_BUILTIN["mt5-base-ViT-B-32"] = _hf_pair(
    512, _VITB32, "google/mt5-base", 768, 12, 12, 250112)
_BUILTIN["mt5-xl-ViT-H-14"] = _hf_pair(
    1024, _VITH14, "google/mt5-xl", 2048, 32, 24, 250112)

# CoCa with an HF RoBERTa unimodal text tower (reference
# model_configs/coca_roberta-ViT-B-32.json; arch dims added so offline
# init builds roberta-base shapes)
_BUILTIN["coca_roberta-ViT-B-32"] = {
    "embed_dim": 512,
    "vision_cfg": {"image_size": 224, "layers": 12, "width": 768,
                   "patch_size": 32, "output_tokens": True},
    "text_cfg": {"hf_model_name": "roberta-base", "proj": "linear",
                 "pooler_type": "mean_pooler", "width": 768, "heads": 12,
                 "layers": 12, "vocab_size": 50265, "context_length": 76,
                 "output_tokens": True},
    "multimodal_cfg": {"context_length": 76, "width": 768, "heads": 8,
                       "layers": 12},
    "custom_text": True,
}

# timm-named towers on the native swin / GAP-ViT implementations
_BUILTIN["swin_base_patch4_window7_224"] = {
    "embed_dim": 640,
    "vision_cfg": {"timm_model_name": "swin_base_patch4_window7_224",
                   "timm_proj": "linear", "image_size": 224},
    "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 640,
                 "heads": 10, "layers": 12},
}
_BUILTIN["vit_medium_patch16_gap_256"] = {
    "embed_dim": 512,
    "vision_cfg": {"timm_model_name": "vit_medium_patch16_gap_256",
                   "timm_proj": "linear", "image_size": 256},
    "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 512,
                 "heads": 8, "layers": 12},
}
# reference vit_relpos_medium_patch16_cls_224.json (relative-position ViT)
_BUILTIN["vit_relpos_medium_patch16_cls_224"] = {
    "embed_dim": 512,
    "vision_cfg": {"timm_model_name": "vit_relpos_medium_patch16_cls_224",
                   "timm_proj": "linear", "image_size": 224},
    "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 512,
                 "heads": 8, "layers": 12},
}

# CoCa variants (vision/text flags verbatim from the reference JSONs:
# coca_ViT-B-32/L-14 pool the vision tokens attentionally; coca_base feeds
# the raw patch tokens; every text tower uses embed_cls + output_tokens)
_BUILTIN["coca_base"] = {
    "embed_dim": 512,
    "vision_cfg": {"image_size": 288, "layers": 12, "width": 768,
                   "patch_size": 18, "output_tokens": True},
    "text_cfg": {"context_length": 76, "vocab_size": 64000, "width": 768,
                 "heads": 12, "layers": 12, "embed_cls": True,
                 "output_tokens": True},
    "multimodal_cfg": {"context_length": 76, "vocab_size": 64000,
                       "width": 768, "heads": 12, "layers": 12,
                       "attn_pooler_heads": 8},
    "custom_text": True,
}
_BUILTIN["coca_test-tiny"] = {
    "embed_dim": 64,
    "vision_cfg": {"image_size": 32, "layers": 2, "width": 64,
                   "head_width": 32, "patch_size": 8,
                   "attentional_pool": True, "attn_pooler_heads": 2,
                   "attn_pooler_queries": 16, "output_tokens": True},
    "text_cfg": {"context_length": 32, "vocab_size": 49408, "width": 64,
                 "heads": 2, "layers": 2, "embed_cls": True,
                 "output_tokens": True},
    "multimodal_cfg": {"context_length": 32, "width": 64, "heads": 2,
                       "layers": 2, "attn_pooler_heads": 2},
    "custom_text": True,
}
_BUILTIN["coca_ViT-B-32"] = {
    "embed_dim": 512,
    "vision_cfg": {"image_size": 224, "layers": 12, "width": 768,
                   "patch_size": 32, "attentional_pool": True,
                   "attn_pooler_heads": 8, "output_tokens": True},
    "text_cfg": {"context_length": 76, "vocab_size": 49408, "width": 512,
                 "heads": 8, "layers": 12, "embed_cls": True,
                 "output_tokens": True},
    "multimodal_cfg": {"context_length": 76, "vocab_size": 49408,
                       "width": 512, "heads": 8, "layers": 12,
                       "attn_pooler_heads": 8},
    "custom_text": True,
}
_BUILTIN["coca_ViT-L-14"] = {
    "embed_dim": 768,
    "vision_cfg": {"image_size": 224, "layers": 24, "width": 1024,
                   "patch_size": 14, "attentional_pool": True,
                   "attn_pooler_heads": 8, "output_tokens": True},
    "text_cfg": {"context_length": 76, "vocab_size": 49408, "width": 768,
                 "heads": 12, "layers": 12, "embed_cls": True,
                 "output_tokens": True},
    "multimodal_cfg": {"context_length": 76, "vocab_size": 49408,
                       "width": 768, "heads": 12, "layers": 12,
                       "attn_pooler_heads": 12},
    "custom_text": True,
}

# ConvNeXt CLIP ladder (the reference's convnext_*.json configs delegate the
# tower to timm; here the tower is native — models/convnext.py)
def _convnext(embed_dim, arch, image_size, t_width, t_heads, t_layers=12,
              proj="linear", drop_path=0.1):
    return {
        "embed_dim": embed_dim,
        "vision_cfg": {"timm_model_name": arch, "timm_proj": proj,
                       "timm_drop_path": drop_path, "image_size": image_size},
        "text_cfg": {"context_length": 77, "vocab_size": 49408,
                     "width": t_width, "heads": t_heads, "layers": t_layers},
    }


_BUILTIN.update({
    "convnext_tiny": _convnext(512, "convnext_tiny", 224, 512, 8),
    "convnext_small": _convnext(512, "convnext_small", 224, 512, 8),
    "convnext_base": _convnext(512, "convnext_base", 224, 512, 8),
    "convnext_base_w": _convnext(640, "convnext_base", 256, 640, 10),
    "convnext_base_w_320": _convnext(640, "convnext_base", 320, 640, 10),
    "convnext_large": _convnext(768, "convnext_large", 224, 768, 12),
    "convnext_large_d": _convnext(768, "convnext_large", 256, 768, 12,
                                  proj="mlp"),
    "convnext_large_d_320": _convnext(768, "convnext_large", 320, 768, 12,
                                      proj="mlp"),
    "convnext_xlarge": _convnext(1024, "convnext_xlarge", 256, 1024, 16, 20),
    "convnext_xxlarge": _convnext(1024, "convnext_xxlarge", 256, 1024, 16,
                                  24),
    "convnext_xxlarge_320": _convnext(1024, "convnext_xxlarge", 320, 1024,
                                      16, 24),
})

_UNSUPPORTED_PREFIXES = ("swin", "vit_", "mt5", "roberta",
                         "xlm-roberta", "nllb")

# extra JSON config dirs (open_CLIP compatibility)
_CONFIG_DIRS = [Path(__file__).parent / "model_configs"]
if os.environ.get("MCT_MODEL_CONFIG_DIR"):
    _CONFIG_DIRS.append(Path(os.environ["MCT_MODEL_CONFIG_DIR"]))


def list_models():
    names = set(_BUILTIN)
    for d in _CONFIG_DIRS:
        if d.is_dir():
            names.update(p.stem for p in d.glob("*.json"))
    return sorted(names)


def get_model_config(name: str) -> Optional[dict]:
    for d in _CONFIG_DIRS:
        p = d / f"{name}.json"
        if p.is_file():
            with open(p) as f:
                return json.load(f)
    if name in _BUILTIN:
        return json.loads(json.dumps(_BUILTIN[name]))  # deep copy
    return None


def _filter_fields(d: dict, cls) -> dict:
    import dataclasses
    names = {f.name for f in dataclasses.fields(cls)}
    known = {k: v for k, v in d.items() if k in names}
    return known


# timm's plain-ViT size vocabulary (timm vision_transformer.py model
# registry): width / depth / heads; head_width = width // heads. giant and
# gigantic carry timm's fractional SoViT mlp ratios.
_TIMM_VIT_SIZES = {
    "tiny": (192, 12, 3), "small": (384, 12, 6), "medium": (512, 12, 8),
    "base": (768, 12, 12), "large": (1024, 24, 16), "huge": (1280, 32, 16),
    "giant": (1408, 40, 16), "gigantic": (1664, 48, 16),
}
_TIMM_VIT_MLP_RATIO = {"giant": 48 / 11, "gigantic": 64 / 13}


def _parse_timm_vit_name(name: str):
    """Derive a VisionCfg dict from a timm plain-ViT model name.

    The reference's TimmModel consumes ANY timm arch by name
    (open_CLIP/src/open_clip/timm_model.py:30-90); the plain-ViT family
    follows the naming grammar `vit[_relpos]_<size>_patch<P>[_gap|_cls]
    _<res>` (timm vision_transformer.py / vision_transformer_relpos.py
    registries), so names outside the explicit table are parsed
    structurally. Names with modifiers this framework can't honor
    faithfully (siglip/dinov2/sam/... pretrained-specific variants)
    return None and fall through to the explicit-table error."""
    toks = name.split("_")
    if not toks or toks[0] != "vit":
        return None
    toks = toks[1:]
    rel_pos = False
    if toks and toks[0] == "relpos":
        rel_pos = True
        toks = toks[1:]
    if not toks or toks[0] not in _TIMM_VIT_SIZES:
        return None
    size = toks[0]
    toks = toks[1:]
    if not toks or not toks[0].startswith("patch") \
            or not toks[0][5:].isdigit():
        return None
    patch = int(toks[0][5:])
    toks = toks[1:]
    if not toks or not toks[-1].isdigit():
        return None
    res = int(toks[-1])
    pool = "tok"
    for mod in toks[:-1]:
        if mod == "gap":
            pool = "avg"       # global-average-pool variant, no CLS token
        elif mod == "cls":
            pool = "tok"
        else:
            return None        # unknown modifier: don't guess the arch
    if res % patch:
        return None
    width, depth, heads = _TIMM_VIT_SIZES[size]
    cfg = dict(layers=depth, width=width, head_width=width // heads,
               patch_size=patch, image_size=res, pool_type=pool)
    if size in _TIMM_VIT_MLP_RATIO:
        cfg["mlp_ratio"] = _TIMM_VIT_MLP_RATIO[size]
    if rel_pos:
        cfg["rel_pos_bias"] = True
    return cfg


def parse_model_cfg(cfg_dict: dict) -> CLIPCfg:
    vcfg_in = dict(cfg_dict.get("vision_cfg", {}))
    resnet_layers = None
    resnet_width = 64
    convnext = None
    convnext_proj = "linear"
    convnext_drop_path = 0.0
    swin = None
    swin_proj = "linear"
    if isinstance(vcfg_in.get("layers"), (list, tuple)):
        # open_CLIP marks ResNet towers with a list-typed layers field
        resnet_layers = tuple(vcfg_in.pop("layers"))
        resnet_width = vcfg_in.pop("width", 64)
    # timm ViT names -> the native ViT tower (the reference's TimmModel
    # wraps arbitrary timm backbones, timm_model.py; the families that are
    # plain ViTs map directly onto VisionCfg)
    _TIMM_VIT = {
        "vit_tiny_patch16_224": dict(layers=12, width=192, head_width=64,
                                     patch_size=16, image_size=224),
        "vit_small_patch16_224": dict(layers=12, width=384, head_width=64,
                                      patch_size=16, image_size=224),
        "vit_base_patch16_224": dict(layers=12, width=768, head_width=64,
                                     patch_size=16, image_size=224),
        "vit_base_patch32_224": dict(layers=12, width=768, head_width=64,
                                     patch_size=32, image_size=224),
        "vit_large_patch14_224": dict(layers=24, width=1024, head_width=64,
                                      patch_size=14, image_size=224),
        # GAP variant: no-CLS timm arch approximated with avg-pooled patches
        "vit_medium_patch16_gap_256": dict(layers=12, width=512,
                                           head_width=64, patch_size=16,
                                           image_size=256, pool_type="avg"),
        # relative-position ViT: learned BEiT-style relpos attention bias
        # instead of absolute position embeddings (timm
        # vision_transformer_relpos.py; medium = 512 wide, 12 deep, 8 heads)
        "vit_relpos_medium_patch16_cls_224": dict(
            layers=12, width=512, head_width=64, patch_size=16,
            image_size=224, rel_pos_bias=True),
    }
    if vcfg_in.get("timm_model_name"):
        timm_name = vcfg_in.pop("timm_model_name")
        if timm_name not in _TIMM_VIT and timm_name.startswith("vit_"):
            parsed = _parse_timm_vit_name(timm_name)
            if parsed is not None:
                _TIMM_VIT[timm_name] = parsed
        if timm_name in _TIMM_VIT:
            vcfg_in.pop("timm_proj", None)
            vcfg_in.pop("timm_drop_path", None)
            vcfg_in.pop("timm_pool", None)
            vt = dict(_TIMM_VIT[timm_name])
            if vcfg_in.get("image_size"):
                vt["image_size"] = vcfg_in["image_size"]
            vcfg_in.update(vt)
        elif timm_name.startswith("convnext"):
            from megatron_clip_tpu.models.convnext import CONVNEXT_ARCHS
            if timm_name not in CONVNEXT_ARCHS:
                raise NotImplementedError(
                    f"unknown convnext arch {timm_name!r}")
            convnext = timm_name
            convnext_proj = vcfg_in.pop("timm_proj", "linear") or "none"
            convnext_drop_path = vcfg_in.pop("timm_drop_path", 0.0)
        elif timm_name.startswith("swin"):
            swin = timm_name
            swin_proj = vcfg_in.pop("timm_proj", "linear") or "none"
            vcfg_in.pop("timm_pool", None)
            vcfg_in.pop("timm_drop_path", None)
        else:
            raise NotImplementedError(
                f"timm tower {timm_name!r} is not implemented (native "
                "families here: vit_* ViTs — explicit table + the timm "
                "plain-ViT naming grammar vit[_relpos]_<size>_patch<P>"
                "[_gap|_cls]_<res> — convnext_*, swin_*; plus "
                "ModifiedResNet via list-typed layers; pretrained-"
                "specific variants like siglip/dinov2 need an explicit "
                "config)")
    v = _filter_fields(vcfg_in, VisionCfg)
    tcfg_in = dict(cfg_dict.get("text_cfg", {}))
    hf_text = None
    if tcfg_in.get("hf_model_name"):
        # open_CLIP HFTextEncoder text tower (hf_model.py) — native BERT/
        # RoBERTa arch here (models/hf_text.py)
        hf_text = {
            "model_name": tcfg_in.pop("hf_model_name"),
            "pretrained": bool(tcfg_in.pop("hf_model_pretrained", True)),
            "proj": tcfg_in.pop("proj", "linear"),
            "pooler": tcfg_in.pop("pooler_type", "mean_pooler"),
        }
        tcfg_in.pop("hf_tokenizer_name", None)
        if hf_text["model_name"] == "__random_tiny__":
            hf_text["pretrained"] = False
    t = _filter_fields(tcfg_in, TextCfg)
    mm = None
    if cfg_dict.get("multimodal_cfg"):
        mm = MultimodalCfg(**_filter_fields(cfg_dict["multimodal_cfg"], MultimodalCfg))
    return CLIPCfg(
        embed_dim=cfg_dict["embed_dim"],
        vision=VisionCfg(**v),
        text=TextCfg(**t),
        quick_gelu=bool(cfg_dict.get("quick_gelu", False)),
        resnet_layers=resnet_layers,
        resnet_width=resnet_width,
        convnext=convnext,
        convnext_proj=convnext_proj,
        convnext_drop_path=convnext_drop_path,
        swin=swin,
        swin_proj=swin_proj,
        hf_text=hf_text,
        init_logit_bias=cfg_dict.get("init_logit_bias"),
        multimodal=mm,
    )


@dataclass
class CLIPModel:
    """Functional model handle: config + precision; params are explicit.

    This is the JAX-idiomatic replacement for open_CLIP's nn.Module — all
    methods are pure and jittable with `params` as the first argument.
    """

    cfg: CLIPCfg
    precision: Precision = BF16
    name: str = ""
    remat: str = "none"  # none | selective | full (megatron --recompute-granularity)
    sequence_parallel: bool = False  # megatron --sequence-parallel
    scan_layers: bool = True  # lax.scan over layers (False = unrolled; ~15%
    # faster on v5e for 12-layer towers at the cost of compile time)
    layers_fn: Any = None  # pipeline schedule adapter for BOTH towers
    # (parallel/pipeline.make_pipelined_layers_fn) — set via
    # dataclasses.replace when pp > 1 on the joint mesh
    mm_layers_fn: Any = None  # CoCa decoder pipeline adapter (PLAIN
    # schedule: the self+cross blocks stage-shard with the image context as
    # the per-microbatch side input) — set alongside layers_fn when pp > 1

    @property
    def is_coca(self) -> bool:
        return self.cfg.multimodal is not None

    def init(self, rng) -> Any:
        if self.is_coca:
            from megatron_clip_tpu.models.coca import init_coca
            return init_coca(rng, self.cfg, dtype=self.precision.param_jnp)
        return init_clip(rng, self.cfg, dtype=self.precision.param_jnp)

    def __call__(self, params, images, text_ids, **kw):
        if self.is_coca:
            # CoCa forward: adds {logits, labels} for the captioning loss
            # (open_CLIP coca_model.py forward); under pp > 1 both towers
            # AND the multimodal decoder run stage-sharded
            from megatron_clip_tpu.models.coca import apply_coca
            return apply_coca(params, images, text_ids, self.cfg,
                              compute_dtype=self.precision.compute_jnp,
                              layers_fn=self.layers_fn,
                              mm_layers_fn=self.mm_layers_fn)
        kw.setdefault("remat", self.remat)
        kw.setdefault("sequence_parallel", self.sequence_parallel)
        kw.setdefault("scan_layers", self.scan_layers)
        kw.setdefault("layers_fn", self.layers_fn)
        return apply_clip(params, images, text_ids, self.cfg,
                          compute_dtype=self.precision.compute_jnp, **kw)

    def encode_image(self, params, images, normalize=True):
        if self.is_coca:
            from megatron_clip_tpu.models.coca import _vision_context
            feats, _ = _vision_context(params, images, self.cfg,
                                       self.precision.compute_jnp)
            return feats  # _vision_context returns the normalized query-0
        return encode_image(params, images, self.cfg, normalize=normalize,
                            compute_dtype=self.precision.compute_jnp)

    def encode_text(self, params, text_ids, normalize=True):
        if self.is_coca:
            # CoCa.encode_text (coca_model.py:147, embed_cls=True): the
            # caption loses its last slot to the appended CLS token
            text_ids = text_ids[:, :-1]
        return encode_text(params, text_ids, self.cfg, normalize=normalize,
                           compute_dtype=self.precision.compute_jnp)

    @property
    def image_size(self) -> int:
        return self.cfg.vision.image_size

    @property
    def context_length(self) -> int:
        return self.cfg.text.context_length


def _precision_from_str(precision: str) -> Precision:
    # open_CLIP --precision values (params.py): amp, amp_bf16, bf16, fp16, fp32...
    if precision == "pure_bf16":
        # open_CLIP pure_bf16: weights themselves in bf16 (main.py:281-287).
        # Halves param+grad+optimizer HBM — fits ViT-H-class models on one
        # 16G chip.
        return Precision("bfloat16", "bfloat16")
    if precision in ("amp_bf16", "bf16", "amp_bfloat16", "amp"):
        return Precision("float32", "bfloat16")
    if precision in ("fp32", "float32"):
        return Precision("float32", "float32")
    if precision in ("fp16", "float16"):
        # bf16 is strictly better on TPU; honor the request anyway
        return Precision("float32", "float16")
    raise ValueError(f"unknown precision {precision!r}")


def create_model(model_name: str, precision: str = "bf16", *, seed: int = 0,
                 init_params: bool = True, force_quick_gelu: bool = False,
                 force_image_size=None, **overrides) -> Tuple[CLIPModel, Any]:
    model_name = model_name.replace("/", "-")  # ViT-B/32 -> ViT-B-32
    cfg_dict = get_model_config(model_name)
    if cfg_dict is None:
        if model_name.startswith(_UNSUPPORTED_PREFIXES):
            # a tower-family NAME with no JSON config: point at the config
            # registry rather than "not found" (every shipped open_CLIP
            # config resolves; ResNet/ConvNeXt/Swin/HF-text families are
            # all implemented — arbitrary timm/HF archs outside them need
            # a model_configs entry mapping onto the native towers)
            raise NotImplementedError(
                f"no model config named {model_name!r}; the native tower "
                "families (ViT/ResNet/ConvNeXt/Swin, BERT/RoBERTa/mT5 "
                "text) are selected via model_configs/*.json — add a "
                "config (MCT_MODEL_CONFIG_DIR) mapping this name onto "
                "them")
        raise RuntimeError(f"model config for {model_name!r} not found; "
                           f"available: {list_models()}")
    if force_quick_gelu:
        cfg_dict["quick_gelu"] = True
    if force_image_size:
        # open_CLIP factory.py force_image_size; a pretrained position table
        # is resized to the new grid at load (torch_interop._resize_pos_embed)
        if isinstance(force_image_size, (list, tuple)):
            force_image_size = int(force_image_size[0])
        v = dict(cfg_dict.get("vision_cfg", {}))
        v["image_size"] = int(force_image_size)
        cfg_dict["vision_cfg"] = v
    cfg_dict.update(overrides)
    cfg = parse_model_cfg(cfg_dict)
    model = CLIPModel(cfg=cfg, precision=_precision_from_str(precision),
                      name=model_name)
    params = model.init(jax.random.PRNGKey(seed)) if init_params else None
    return model, params


def create_model_and_transforms(model_name: str, pretrained: str = "",
                                precision: str = "bf16", *, seed: int = 0,
                                image_mean=None, image_std=None,
                                aug_cfg=None, **kw):
    """Returns (model, params, preprocess_train, preprocess_val) — the JAX
    analogue of factory.py:286 (params explicit instead of inside a Module).
    aug_cfg / force_image_size / image_mean / image_std match the reference
    signature (factory.py:286-338)."""
    from megatron_clip_tpu.data.transforms import image_transform
    model, params = create_model(model_name, precision, seed=seed, **kw)
    if pretrained:
        from megatron_clip_tpu.checkpoints.torch_interop import load_openclip_checkpoint
        from megatron_clip_tpu.pretrained import resolve_pretrained
        path = resolve_pretrained(model_name.replace("/", "-"), pretrained)
        params = load_openclip_checkpoint(path, model.cfg, params)
    pp_train = image_transform(model.image_size, is_train=True,
                               mean=image_mean, std=image_std, aug_cfg=aug_cfg)
    pp_val = image_transform(model.image_size, is_train=False,
                             mean=image_mean, std=image_std)
    return model, params, pp_train, pp_val


def create_loss(args, model=None):
    """Dispatch mirroring open_CLIP create_loss (factory.py:250-283).
    `args` may be an argparse Namespace or any object with the same fields.
    `model` (a CLIPModel) makes the CoCa dispatch shape-based — a custom
    JSON config with multimodal_cfg gets CoCaLoss regardless of its name."""
    get = lambda k, d=None: getattr(args, k, d)
    axis = get("loss_axis_name")
    if (model is not None and getattr(model, "is_coca", False)) \
            or get("model", "").startswith("coca"):
        return CoCaLoss(
            caption_loss_weight=get("coca_caption_loss_weight", 2.0),
            clip_loss_weight=get("coca_contrastive_loss_weight", 1.0),
            local_loss=get("local_loss", True),
            gather_with_grad=get("gather_with_grad", True), axis_name=axis)
    if get("siglip"):
        return SigLipLoss(axis_name=axis)
    if get("distill_model") or get("distill"):
        return DistillClipLoss(local_loss=get("local_loss", True),
                               gather_with_grad=get("gather_with_grad", True),
                               axis_name=axis)
    return ClipLoss(local_loss=get("local_loss", True),
                    gather_with_grad=get("gather_with_grad", True),
                    axis_name=axis)
