"""Pretrained-weights registry, cache, and download.

Covers open_CLIP's pretrained surface (open_CLIP/src/open_clip/
pretrained.py ~375 LoC + openai.py loader + factory.py:286-338
`pretrained=` resolution): named tags per model resolve to checkpoint URLs;
`create_model(pretrained=...)` accepts a tag ("openai", "laion400m_e32",
...), a URL, or a local path. Checkpoints are torch zip `.pt` files loaded
with the torch-free reader (checkpoints/pt_reader.py).

Offline-first: resolution order is local path -> cache hit
($MCT_CACHE_DIR or ~/.cache/megatron_clip_tpu) -> download (urllib). On a
zero-egress host the error names the tag, the URL, and the cache path to
drop the file into.

The registry lists the most-used open_clip tags; `register_pretrained`
extends it at runtime (the mechanism, not the full ~100-entry URL table,
is the capability).
"""
import hashlib
import os
import urllib.error
import urllib.request
from typing import Dict, List, Optional

_HF_BASE = "https://huggingface.co/{repo}/resolve/main/open_clip_pytorch_model.bin"
_OPENAI_BASE = "https://openaipublic.azureedge.net/clip/models/{blob}"

# model name -> tag -> url (open_CLIP pretrained.py _PRETRAINED shape)
_PRETRAINED: Dict[str, Dict[str, str]] = {
    "ViT-B-32": {
        "openai": _OPENAI_BASE.format(
            blob="40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58"
                 "eba950af/ViT-B-32.pt"),
        "laion400m_e32": _HF_BASE.format(
            repo="laion/CLIP-ViT-B-32-laion400M-e32"),
        "laion2b_s34b_b79k": _HF_BASE.format(
            repo="laion/CLIP-ViT-B-32-laion2B-s34B-b79K"),
    },
    "ViT-B-16": {
        "openai": _OPENAI_BASE.format(
            blob="5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988"
                 "df416f/ViT-B-16.pt"),
        "laion400m_e32": _HF_BASE.format(
            repo="laion/CLIP-ViT-B-16-laion400M-e32"),
        "laion2b_s34b_b88k": _HF_BASE.format(
            repo="laion/CLIP-ViT-B-16-laion2B-s34B-b88K"),
    },
    "ViT-L-14": {
        "openai": _OPENAI_BASE.format(
            blob="b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737"
                 "a03836/ViT-L-14.pt"),
        "laion400m_e32": _HF_BASE.format(
            repo="laion/CLIP-ViT-L-14-laion400M-e32"),
        "laion2b_s32b_b82k": _HF_BASE.format(
            repo="laion/CLIP-ViT-L-14-laion2B-s32B-b82K"),
    },
    "ViT-H-14": {
        "laion2b_s32b_b79k": _HF_BASE.format(
            repo="laion/CLIP-ViT-H-14-laion2B-s32B-b79K"),
    },
    "ViT-g-14": {
        "laion2b_s12b_b42k": _HF_BASE.format(
            repo="laion/CLIP-ViT-g-14-laion2B-s12B-b42K"),
    },
    "ViT-bigG-14": {
        "laion2b_s39b_b160k": _HF_BASE.format(
            repo="laion/CLIP-ViT-bigG-14-laion2B-39B-b160k"),
    },
    # multilingual towers (open_CLIP pretrained.py roberta/xlm entries)
    "roberta-ViT-B-32": {
        "laion2b_s12b_b32k": _HF_BASE.format(
            repo="laion/CLIP-ViT-B-32-roberta-base-laion2B-s12B-b32k"),
    },
    "xlm-roberta-base-ViT-B-32": {
        "laion5b_s13b_b90k": _HF_BASE.format(
            repo="laion/CLIP-ViT-B-32-xlm-roberta-base-laion5B-s13B-b90k"),
    },
    "xlm-roberta-large-ViT-H-14": {
        "frozen_laion5b_s13b_b90k": _HF_BASE.format(
            repo="laion/CLIP-ViT-H-14-frozen-xlm-roberta-large-laion5B"
                 "-s13B-b90k"),
    },
}


def register_pretrained(model: str, tag: str, url: str) -> None:
    _PRETRAINED.setdefault(model, {})[tag] = url


def list_pretrained(as_str: bool = False) -> List:
    """open_CLIP list_pretrained: (model, tag) pairs or 'model:tag' strings."""
    out = [(m, t) for m, tags in sorted(_PRETRAINED.items())
           for t in tags]
    return [f"{m}:{t}" for m, t in out] if as_str else out


def list_pretrained_tags_by_model(model: str) -> List[str]:
    return list(_PRETRAINED.get(model, {}))


def get_pretrained_url(model: str, tag: str) -> Optional[str]:
    return _PRETRAINED.get(model, {}).get(tag)


def cache_dir() -> str:
    return os.environ.get(
        "MCT_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "megatron_clip_tpu"))


def _cache_path(url: str) -> str:
    name = os.path.basename(url.split("?")[0]) or "checkpoint.pt"
    digest = hashlib.sha256(url.encode()).hexdigest()[:12]
    return os.path.join(cache_dir(), f"{digest}-{name}")


def download_pretrained(url: str, *, progress: bool = True) -> str:
    """Fetch `url` into the cache (open_CLIP download_pretrained). Returns
    the local path; raises a descriptive error on offline hosts."""
    path = _cache_path(url)
    if os.path.isfile(path) and os.path.getsize(path) > 0:
        return path
    os.makedirs(cache_dir(), exist_ok=True)
    tmp = path + ".tmp"
    try:
        def _hook(blocks, bs, total):  # pragma: no cover — needs egress
            if progress and total > 0 and blocks % 512 == 0:
                print(f"\rdownloading {os.path.basename(path)}: "
                      f"{100 * blocks * bs / total:.0f}%", end="", flush=True)
        urllib.request.urlretrieve(url, tmp, reporthook=_hook)
        os.replace(tmp, path)
        if progress:
            print()
        return path
    except (urllib.error.URLError, OSError) as e:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise RuntimeError(
            f"could not download pretrained weights from {url} "
            f"({e}). On an offline host, place the file at {path} "
            f"(or set MCT_CACHE_DIR) and retry.") from e


def resolve_pretrained(model: str, pretrained: str) -> str:
    """Tag / URL / local path -> local checkpoint path
    (open_CLIP factory.py:286-338 resolution order)."""
    if os.path.isfile(pretrained):
        return pretrained
    if pretrained.startswith(("http://", "https://")):
        return download_pretrained(pretrained)
    url = get_pretrained_url(model, pretrained)
    if url is None:
        tags = list_pretrained_tags_by_model(model)
        raise ValueError(
            f"{pretrained!r} is neither a local file nor a known tag for "
            f"{model}. Known tags: {tags or 'none registered'} "
            f"(register_pretrained() adds more).")
    cached = _cache_path(url)
    if os.path.isfile(cached) and os.path.getsize(cached) > 0:
        return cached
    return download_pretrained(url)
