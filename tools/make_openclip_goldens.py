"""Generate cross-implementation golden fixtures from the *actual* open_CLIP
reference implementation (torch).

Two fixture families:

1. `openclip_tiny.pt` + `openclip_tiny_expected.npz` — a 2-layer random-init
   torch checkpoint exercising the torch-free .pt reader end to end.

2. Full-size goldens (`tests/goldens/full/*.npz`) for real zoo configs —
   ViT-B-32-quickgelu (224px and force_image_size=160 via the reference's
   resize_pos_embed), coca_ViT-B-32 (attentional pool + embed_cls +
   multimodal decoder), roberta-ViT-B-32 (HF RoBERTa text tower). A
   full-size checkpoint is ~600 MB, so these fixtures store only the
   state_dict (key, shape) manifest plus the reference outputs: every weight
   is regenerated deterministically on both sides from its state_dict key
   (megatron_clip_tpu/utils/det_weights.py, bit-stable numpy Philox).

This mirrors open_CLIP's own golden-regression discipline
(open_CLIP/tests/util_test.py:12-50: seeded inputs -> saved expected encode
outputs), applied across implementations: the expected values come from the
reference torch model, the regression test evaluates ours
(tests/test_openclip_goldens.py) without needing torch or the reference.

Run on a host with torch + the reference checkout:
    python tools/make_openclip_goldens.py [--full-only]
"""
import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from megatron_clip_tpu.utils.det_weights import (  # noqa: E402
    det_tensor, det_images, det_texts)

TINY = dict(
    embed_dim=64,
    vision_cfg=dict(image_size=32, patch_size=8, width=64, head_width=32,
                    layers=2),
    text_cfg=dict(context_length=16, vocab_size=512, width=64, heads=2,
                  layers=2),
)

VITB32_VISION = dict(image_size=224, layers=12, width=768, patch_size=32)
VITB32_TEXT = dict(context_length=77, vocab_size=49408, width=512, heads=8,
                   layers=12)


def _stub_modules():
    """The image lacks torchvision/ftfy; open_clip only touches symbols."""
    import types
    import importlib.machinery
    import torch

    tv = types.ModuleType("torchvision")
    tv_ops = types.ModuleType("torchvision.ops")
    tv_misc = types.ModuleType("torchvision.ops.misc")
    tv_misc.FrozenBatchNorm2d = torch.nn.BatchNorm2d
    tv_tr = types.ModuleType("torchvision.transforms")
    tv_f = types.ModuleType("torchvision.transforms.functional")

    class _Stub:
        def __init__(self, *a, **k):
            pass

    class _Interp:
        BICUBIC = BILINEAR = NEAREST = None

    for n in ("Normalize", "Compose", "RandomResizedCrop", "ToTensor",
              "Resize", "CenterCrop", "ColorJitter", "Grayscale"):
        setattr(tv_tr, n, _Stub)
    tv_tr.InterpolationMode = _Interp
    tv_tr.__path__ = []
    tv_tr.functional = tv_f
    tv.ops, tv_ops.misc, tv.transforms = tv_ops, tv_misc, tv_tr
    ftfy = types.ModuleType("ftfy")
    ftfy.fix_text = lambda s: s
    for name, mod in [("torchvision", tv), ("torchvision.ops", tv_ops),
                      ("torchvision.ops.misc", tv_misc),
                      ("torchvision.transforms", tv_tr),
                      ("torchvision.transforms.functional", tv_f),
                      ("ftfy", ftfy)]:
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules.setdefault(name, mod)


def _det_fill(model, tag: str):
    """Overwrite every float state_dict entry with det_tensor(tag, key).
    Returns the (key, shape) manifest of the filled entries."""
    import torch
    sd = model.state_dict()
    manifest = []
    new = {}
    for k, v in sd.items():
        if v.is_floating_point():
            new[k] = torch.from_numpy(det_tensor(tag, k, tuple(v.shape)))
            manifest.append((k, list(v.shape)))
        else:
            new[k] = v
    model.load_state_dict(new)
    return manifest


def _save(out_dir, name, manifest, arrays):
    os.makedirs(out_dir, exist_ok=True)
    np.savez_compressed(os.path.join(out_dir, f"{name}.npz"),
                        manifest=np.frombuffer(
                            json.dumps(manifest).encode(), dtype=np.uint8),
                        **arrays)
    sizes = {k: list(v.shape) for k, v in arrays.items()}
    print(f"wrote {name}.npz  outputs: {sizes}")


def gen_tiny(out_dir: str):
    import torch
    from open_clip.model import CLIP

    torch.manual_seed(0)
    model = CLIP(embed_dim=TINY["embed_dim"],
                 vision_cfg=TINY["vision_cfg"], text_cfg=TINY["text_cfg"],
                 quick_gelu=False)
    model.eval()

    rng = np.random.RandomState(0)
    images = rng.randn(4, 3, 32, 32).astype(np.float32)
    texts = rng.randint(1, 500, size=(4, 16)).astype(np.int64)
    texts[:, 0] = 0
    texts[:, 10] = 511          # max id = argmax pooling position (EOT)

    with torch.no_grad():
        img_feat = model.encode_image(torch.from_numpy(images),
                                      normalize=True).numpy()
        txt_feat = model.encode_text(torch.from_numpy(texts),
                                     normalize=True).numpy()

    os.makedirs(out_dir, exist_ok=True)
    torch.save({"state_dict": model.state_dict()},
               os.path.join(out_dir, "openclip_tiny.pt"))
    np.savez(os.path.join(out_dir, "openclip_tiny_expected.npz"),
             images=images, texts=texts.astype(np.int32),
             image_features=img_feat, text_features=txt_feat,
             logit_scale=float(model.logit_scale.detach()))
    print("wrote tiny goldens |", np.linalg.norm(img_feat, axis=-1))


def gen_vitb32(out_dir: str):
    """Full-size ViT-B-32-quickgelu: QuickGELU at depth 12, 49408-vocab
    argmax-EOT pooling, 224px — plus a force_image_size=160 leg through the
    reference's resize_pos_embed (bicubic antialias)."""
    import torch
    from open_clip.model import CLIP, resize_pos_embed

    tag = "vitb32"
    model = CLIP(embed_dim=512, vision_cfg=VITB32_VISION,
                 text_cfg=VITB32_TEXT, quick_gelu=True)
    model.eval()
    manifest = _det_fill(model, tag)

    images = det_images(tag, 4, 224)                       # NHWC
    texts = det_texts(tag, 4, 77, 49408, sot=49406, eot=49407, pad_tail=2)
    with torch.no_grad():
        img_feat = model.encode_image(
            torch.from_numpy(images.transpose(0, 3, 1, 2)), normalize=True)
        txt_feat = model.encode_text(torch.from_numpy(texts), normalize=True)
    _save(out_dir, "vitb32", manifest, dict(
        image_features=img_feat.numpy(), text_features=txt_feat.numpy()))

    # force_image_size leg: rebuild at 160px, load the 224px weights through
    # the reference's own resize_pos_embed (model.py:417, antialias bicubic)
    model160 = CLIP(embed_dim=512,
                    vision_cfg={**VITB32_VISION, "image_size": 160},
                    text_cfg=VITB32_TEXT, quick_gelu=True)
    model160.eval()
    sd = {k: v.clone() for k, v in model.state_dict().items()}
    resize_pos_embed(sd, model160)
    model160.load_state_dict(sd)
    images160 = det_images(tag + "_fis160", 4, 160)
    with torch.no_grad():
        img160 = model160.encode_image(
            torch.from_numpy(images160.transpose(0, 3, 1, 2)), normalize=True)
    _save(out_dir, "vitb32_fis160", manifest, dict(
        image_features=img160.numpy()))


def gen_coca(out_dir: str):
    """coca_ViT-B-32: attentional pool, embed_cls text tower, multimodal
    decoder logits."""
    import torch
    from open_clip.coca_model import CoCa

    tag = "coca_vitb32"
    import open_clip
    with open(os.path.join(os.path.dirname(open_clip.__file__),
                           "model_configs", "coca_ViT-B-32.json")) as f:
        cfg = json.load(f)
    model = CoCa(embed_dim=cfg["embed_dim"],
                 multimodal_cfg=cfg["multimodal_cfg"],
                 text_cfg=cfg["text_cfg"], vision_cfg=cfg["vision_cfg"],
                 quick_gelu=False)
    model.eval()
    manifest = _det_fill(model, tag)

    images = det_images(tag, 4, 224)
    texts = det_texts(tag, 4, 76, 49408, sot=49406, eot=49407, pad_tail=2)
    with torch.no_grad():
        out = model(torch.from_numpy(images.transpose(0, 3, 1, 2)),
                    torch.from_numpy(texts))
    # the raw [4, 75, 49408] logits are ~59 MB; store a deterministic
    # 64-dim random projection (a dense full-vocab parity signal) plus the
    # argmax token ids instead
    logits = out["logits"].numpy()
    proj = det_tensor(tag, "__logit_proj__", (logits.shape[-1], 64))
    _save(out_dir, "coca_vitb32", manifest, dict(
        image_features=out["image_features"].numpy(),
        text_features=out["text_features"].numpy(),
        logits_proj=logits @ proj,
        logits_argmax=logits.argmax(-1).astype(np.int32),
        labels=out["labels"].numpy().astype(np.int32)))


def gen_roberta(out_dir: str):
    """roberta-ViT-B-32: HF RoBERTa text tower (mean pooler + mlp proj) +
    QuickGELU vision tower. RobertaConfig is constructed locally (roberta-
    base dims) so no hub access is needed."""
    import torch
    import transformers
    from transformers import RobertaConfig

    rcfg = RobertaConfig(vocab_size=50265, hidden_size=768,
                         num_hidden_layers=12, num_attention_heads=12,
                         intermediate_size=3072, max_position_embeddings=514,
                         type_vocab_size=1, layer_norm_eps=1e-5,
                         pad_token_id=1)
    orig = transformers.AutoConfig.from_pretrained.__func__

    def _local(cls, name, *a, **k):
        if name == "roberta-base":
            return rcfg
        return orig(cls, name, *a, **k)

    transformers.AutoConfig.from_pretrained = classmethod(_local)
    try:
        from open_clip.model import CustomTextCLIP
        tag = "roberta_vitb32"
        model = CustomTextCLIP(
            embed_dim=512, vision_cfg=VITB32_VISION,
            text_cfg={"hf_model_name": "roberta-base",
                      "hf_model_pretrained": False, "proj": "mlp",
                      "pooler_type": "mean_pooler"},
            quick_gelu=True)
        model.eval()
        manifest = _det_fill(model, tag)

        images = det_images(tag, 4, 224)
        texts = det_texts(tag, 4, 64, 50265, sot=0, eot=2, pad_tail=4,
                          pad_id=1, low=3)
        with torch.no_grad():
            img_feat = model.encode_image(
                torch.from_numpy(images.transpose(0, 3, 1, 2)),
                normalize=True)
            txt_feat = model.encode_text(torch.from_numpy(texts))
            txt_feat = torch.nn.functional.normalize(txt_feat, dim=-1)
        _save(out_dir, "roberta_vitb32", manifest, dict(
            image_features=img_feat.numpy(), text_features=txt_feat.numpy()))
    finally:
        transformers.AutoConfig.from_pretrained = classmethod(orig)


def main(ref_src: str, out_dir: str, full_only: bool = False):
    sys.path.insert(0, ref_src)
    _stub_modules()
    if not full_only:
        gen_tiny(out_dir)
    full = os.path.join(out_dir, "full")
    gen_vitb32(full)
    gen_coca(full)
    gen_roberta(full)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-src", default="/root/reference/open_CLIP/src")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "tests", "goldens"))
    ap.add_argument("--full-only", action="store_true")
    a = ap.parse_args()
    main(a.ref_src, a.out, a.full_only)
