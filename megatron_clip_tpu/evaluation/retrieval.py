"""Contrastive validation metrics: val loss + cross-modal retrieval recall@K.

Replaces open_CLIP's get_clip_metrics / evaluate loss accumulation
(open_CLIP/src/training/train.py:543-648).
"""
from typing import Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from megatron_clip_tpu.losses import clip_loss


def recall_at_k(logits_per_image: np.ndarray,
                ks=(1, 5, 10)) -> Dict[str, float]:
    """logits [N, N] with matching pairs on the diagonal — both directions
    (train.py:631-648: image_to_text_R@K / text_to_image_R@K + mean rank)."""
    out = {}
    n = logits_per_image.shape[0]
    gold = np.arange(n)
    for name, logits in (("image_to_text", logits_per_image),
                         ("text_to_image", logits_per_image.T)):
        ranking = np.argsort(-logits, axis=1)
        where = np.argmax(ranking == gold[:, None], axis=1)
        out[f"{name}_mean_rank"] = float(where.mean() + 1)
        out[f"{name}_median_rank"] = float(np.floor(np.median(where)) + 1)
        for k in ks:
            out[f"{name}_R@{k}"] = float((where < k).mean())
    return out


def recall_at_k_device(img_features, txt_features, scale: float,
                       ks=(1, 5, 10), chunk: int = 1024) -> Dict[str, float]:
    """Device-side recall@K for large val sets: the N x N logits never
    materialize on host. Each row's gold rank = #entries with a strictly
    higher score + #ties at an earlier index — the position the host
    path's stable argsort gives the gold item. Counting only strictly
    greater would hand a COLLAPSED model (all features equal, all logits
    tied) rank 0 everywhere, reporting R@1 = 1.0 exactly when the monitor
    should read ~1/N. O(N^2 / chunk) device steps of [chunk, N] logits —
    HBM use is O(chunk * N), not O(N^2)."""
    img = jnp.asarray(img_features, jnp.float32)
    txt = jnp.asarray(txt_features, jnp.float32)
    n = img.shape[0]

    @jax.jit
    def chunk_ranks(q, gallery, gold_idx):
        logits = scale * (q @ gallery.T)                  # [C, N]
        gold = jnp.take_along_axis(logits, gold_idx[:, None], axis=1)
        earlier = jnp.arange(logits.shape[1])[None] < gold_idx[:, None]
        return jnp.sum(logits > gold, axis=1) \
            + jnp.sum((logits == gold) & earlier, axis=1)  # rank (0-based)

    out = {}
    for name, q, gallery in (("image_to_text", img, txt),
                             ("text_to_image", txt, img)):
        ranks = []
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            idx = jnp.arange(s, e, dtype=jnp.int32)
            ranks.append(np.asarray(chunk_ranks(q[s:e], gallery, idx)))
        where = np.concatenate(ranks)
        out[f"{name}_mean_rank"] = float(where.mean() + 1)
        out[f"{name}_median_rank"] = float(np.floor(np.median(where)) + 1)
        for k in ks:
            out[f"{name}_R@{k}"] = float((where < k).mean())
    return out


# above this gallery size the host argsort path is replaced by the chunked
# device ranking (an N x N fp32 argsort at N=100k would be 40 GB host RAM)
_DEVICE_RANK_THRESHOLD = 8192


def contrastive_eval_metrics(model, params,
                             batches: Iterable[Tuple[np.ndarray, np.ndarray]]
                             ) -> Dict[str, float]:
    """Accumulate features over the val set; report val loss + recall@K."""
    fwd = jax.jit(lambda p, im, tx: model(p, im, tx))
    img_f, txt_f, scale = [], [], 1.0
    n, loss_sum = 0, 0.0
    for images, texts in batches:
        out = fwd(params, jnp.asarray(images), jnp.asarray(texts))
        img_f.append(np.asarray(out["image_features"]))
        txt_f.append(np.asarray(out["text_features"]))
        scale = float(out["logit_scale"])
        b = images.shape[0]
        loss_sum += float(clip_loss(out["image_features"],
                                    out["text_features"],
                                    out["logit_scale"])) * b
        n += b
    img = np.concatenate(img_f)
    txt = np.concatenate(txt_f)
    if img.shape[0] > _DEVICE_RANK_THRESHOLD:
        metrics = recall_at_k_device(img, txt, scale)
    else:
        metrics = recall_at_k(scale * img @ txt.T)
    metrics["clip_val_loss"] = loss_sum / max(n, 1)
    metrics["num_samples"] = n
    return metrics
