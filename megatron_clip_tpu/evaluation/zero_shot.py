"""Zero-shot classification eval.

Replaces open_CLIP's zero_shot.py:12-93: build a text classifier by encoding
prompt-template ensembles per class (mean of normalized embeddings), then
classify image features by cosine similarity; report top-1/top-5.

The 1000 ImageNet class names and the full 80-prompt OpenAI template ensemble
are vendored as JSON under `evaluation/assets/imagenet_zeroshot.json`
(open_CLIP/src/training/imagenet_zeroshot_data.py as data, not code).
$MCT_IMAGENET_METADATA overrides with a custom JSON or python data module.
A small built-in template set is provided for smoke tests.
"""
import importlib.util
import json
import os
from typing import Callable, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# A compact, well-known prompt subset (CLIP paper's simple ensemble); the full
# 80-template ensemble should be loaded as data for accuracy parity.
SIMPLE_IMAGENET_TEMPLATES: List[Callable[[str], str]] = [
    lambda c: f"itap of a {c}.",
    lambda c: f"a bad photo of the {c}.",
    lambda c: f"a origami {c}.",
    lambda c: f"a photo of the large {c}.",
    lambda c: f"a {c} in a video game.",
    lambda c: f"art of the {c}.",
    lambda c: f"a photo of the small {c}.",
]


def load_imagenet_metadata(path: Optional[str] = None):
    """Load (classnames, templates).

    Accepts: a JSON file {"classnames": [...], "templates": ["a photo of a {}."]}
    or a python file defining imagenet_classnames + openai_imagenet_template
    (the reference's open_CLIP/src/training/imagenet_zeroshot_data.py works).
    """
    explicit = path or os.environ.get("MCT_IMAGENET_METADATA", "")
    path = explicit
    if not path:
        path = os.path.join(os.path.dirname(__file__), "assets",
                            "imagenet_zeroshot.json")
    if not path or not os.path.isfile(path):
        if explicit:
            # a user-supplied path that can't be read must not silently
            # degrade to folder names + the 7-template SIMPLE set (the
            # reported top-1 would be quietly non-comparable)
            raise FileNotFoundError(
                f"imagenet metadata not found: {explicit!r} "
                "(from the argument or $MCT_IMAGENET_METADATA)")
        return None, None
    if path.endswith(".json"):
        with open(path) as f:
            meta = json.load(f)
        templates = [t if callable(t) else (lambda s, t=t: t.format(s))
                     for t in meta["templates"]]
        return meta["classnames"], templates
    spec = importlib.util.spec_from_file_location("_imagenet_meta", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return (getattr(mod, "imagenet_classnames"),
            getattr(mod, "openai_imagenet_template"))


def build_zero_shot_classifier(model, params, classnames: Sequence[str],
                               templates: Sequence[Callable[[str], str]],
                               tokenizer, *, batch_size: int = 64) -> jax.Array:
    """Returns [D, C] classifier: per class, mean of the normalized template
    embeddings, re-normalized (zero_shot.py:12-41)."""
    encode = jax.jit(lambda p, t: model.encode_text(p, t))
    weights = []
    for lo in range(0, len(classnames), batch_size):
        chunk = classnames[lo:lo + batch_size]
        texts = [tpl(c) for c in chunk for tpl in templates]
        ids = jnp.asarray(tokenizer(texts, model.context_length))
        emb = encode(params, ids)                      # [n*T, D] normalized
        emb = emb.reshape(len(chunk), len(templates), -1).mean(axis=1)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        weights.append(emb)
    return jnp.concatenate(weights, axis=0).T          # [D, C]


def zero_shot_classification(model, params, classifier, images) -> jax.Array:
    """logits [B, C] = 100 * img_feats @ classifier (zero_shot.py:49)."""
    feats = model.encode_image(params, images)
    return 100.0 * feats @ classifier


def zero_shot_eval(model, params, classifier,
                   batches: Iterable[Tuple[np.ndarray, np.ndarray]]
                   ) -> dict:
    """batches yield (images, integer labels). Returns top1/top5 accuracy
    (zero_shot.py:42-67)."""
    fn = jax.jit(lambda p, im: zero_shot_classification(model, p, classifier, im))
    n = top1 = top5 = 0
    for images, labels in batches:
        logits = np.asarray(fn(params, jnp.asarray(images)))
        order = np.argsort(-logits, axis=-1)
        top1 += (order[:, 0] == labels).sum()
        top5 += (order[:, :5] == labels[:, None]).any(axis=1).sum()
        n += len(labels)
    return {"imagenet-zeroshot-val-top1": top1 / max(n, 1),
            "imagenet-zeroshot-val-top5": top5 / max(n, 1)}
