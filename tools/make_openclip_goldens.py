"""Generate cross-implementation golden fixtures from the *actual* open_CLIP
reference implementation (torch).

Run once on a host with torch + the reference checkout; the outputs are
committed so the regression test (tests/test_openclip_goldens.py) runs
anywhere without torch or the reference:

  tests/goldens/openclip_tiny.pt            torch zip checkpoint (state_dict)
  tests/goldens/openclip_tiny_expected.npz  inputs + reference encode outputs

This mirrors open_CLIP's own golden-regression discipline
(open_CLIP/tests/util_test.py:12-50: seeded inputs -> saved expected
encode_image/encode_text outputs), but across implementations: the expected
values come from the reference torch model, the test evaluates ours.
"""
import argparse
import os
import sys

import numpy as np

TINY = dict(
    embed_dim=64,
    vision_cfg=dict(image_size=32, patch_size=8, width=64, head_width=32,
                    layers=2),
    text_cfg=dict(context_length=16, vocab_size=512, width=64, heads=2,
                  layers=2),
)


def main(ref_src: str, out_dir: str):
    sys.path.insert(0, ref_src)
    import torch

    # the image lacks torchvision; open_clip.utils only needs this symbol
    import types
    tv = types.ModuleType("torchvision")
    tv_ops = types.ModuleType("torchvision.ops")
    tv_misc = types.ModuleType("torchvision.ops.misc")
    tv_misc.FrozenBatchNorm2d = torch.nn.BatchNorm2d
    tv_tr = types.ModuleType("torchvision.transforms")
    tv_f = types.ModuleType("torchvision.transforms.functional")

    class _Stub:  # transform classes are referenced but unused here
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
    import importlib.machinery
    for name, mod in [("torchvision", tv), ("torchvision.ops", tv_ops),
                      ("torchvision.ops.misc", tv_misc),
                      ("torchvision.transforms", tv_tr),
                      ("torchvision.transforms.functional", tv_f),
                      ("ftfy", ftfy)]:
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules.setdefault(name, mod)

    from open_clip.model import CLIP  # the reference implementation

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
    print("wrote goldens to", out_dir,
          "| img_feat norm", np.linalg.norm(img_feat, axis=-1))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-src", default="/root/reference/open_CLIP/src")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "tests", "goldens"))
    a = ap.parse_args()
    main(a.ref_src, a.out)
