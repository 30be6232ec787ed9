"""Weighted-kNN monitor for self-supervised vision pretraining (DINO).

Reference: megatron/model/vision/knn_monitor.py (InstDisc-style weighted kNN
over a bank of L2-normalized teacher features of the train ImageFolder;
knn_predict) and pretrain_vision_dino.py:35-62 (eval loss_func reporting
knn_acc_{10,20,100,200} at temperature 0.07).

TPU-native form: the bank is a dense [N, D] device array and prediction is
one jitted matmul + top_k per eval batch — no FAISS, no per-rank all-gather
(the bank is built once on host and broadcast by jit).
"""
from functools import partial
from typing import Callable, Iterable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_KS = (10, 20, 100, 200)


@partial(jax.jit, static_argnames=("knn_k",))
def _topk_neighbors(feature, feature_bank, feature_labels, *, knn_k: int):
    """One [B,N] similarity GEMM + top_k (descending); (weights, labels)."""
    sim = jnp.einsum("bd,nd->bn", feature.astype(jnp.float32),
                     feature_bank.astype(jnp.float32))
    w, idx = jax.lax.top_k(sim, knn_k)                     # [B, K] sorted
    return w, feature_labels[idx]


def _weighted_vote(w, lbl, classes: int, knn_t: float):
    onehot = jax.nn.one_hot(lbl, classes, dtype=jnp.float32)
    scores = jnp.sum(onehot * jnp.exp(w / knn_t)[..., None], axis=1)
    return jnp.argmax(scores, axis=-1).astype(jnp.int32)


def knn_predict(feature, feature_bank, feature_labels, *, classes: int,
                knn_k: int, knn_t: float = 0.07):
    """InstDisc weighted kNN (knn_monitor.py:104-131).

    feature: [B, D] L2-normalized query features.
    feature_bank: [N, D] L2-normalized bank (the reference stores [D, N];
    row-major here so top_k reads contiguous similarity rows).
    Returns [B] int32 predicted labels (the reference returns the full
    ranking and takes column 0 — same top-1).
    """
    w, lbl = _topk_neighbors(feature, feature_bank, feature_labels,
                             knn_k=knn_k)
    return _weighted_vote(w, lbl, classes, knn_t)


def _l2n(x):
    x = np.asarray(x, np.float32)
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def compute_feature_bank(encode_fn: Callable,
                         batches: Iterable[Tuple[np.ndarray, np.ndarray]],
                         max_samples: int = 0) -> Tuple[np.ndarray,
                                                        np.ndarray]:
    """Build the normalized feature bank (knn_monitor.compute_feature_bank).

    encode_fn(images) -> [B, D] features (teacher backbone output). Batches
    yield (images, labels). `max_samples` > 0 caps the bank (the reference
    always embeds the full train set; the cap keeps monitor cost bounded on
    huge corpora). Returns (bank [N, D] f32 normalized, labels [N] i32).
    """
    feats, labels = [], []
    n = 0
    for images, lab in batches:
        feats.append(_l2n(encode_fn(jnp.asarray(images))))
        labels.append(np.asarray(lab, np.int32))
        n += feats[-1].shape[0]
        if max_samples and n >= max_samples:
            break
    if not feats:
        raise ValueError("empty feature-bank source")
    bank = np.concatenate(feats, axis=0)
    lbl = np.concatenate(labels, axis=0)
    if max_samples:
        bank, lbl = bank[:max_samples], lbl[:max_samples]
    return bank, lbl


def knn_eval(encode_fn: Callable,
             bank: np.ndarray, bank_labels: np.ndarray, classes: int,
             batches: Iterable[Tuple[np.ndarray, np.ndarray]],
             ks: Sequence[int] = DEFAULT_KS, knn_t: float = 0.07) -> dict:
    """Accuracy of weighted-kNN predictions over eval batches for each K
    (pretrain_vision_dino.py loss_func eval branch). Ks larger than the
    bank are clamped (and deduplicated) so tiny runs still report."""
    bank_j = jnp.asarray(bank)
    lbl_j = jnp.asarray(bank_labels)
    eff = sorted({min(int(k), bank.shape[0]) for k in ks})
    name = {min(int(k), bank.shape[0]): int(k) for k in reversed(ks)}
    correct = {k: 0 for k in eff}
    total = 0
    kmax = eff[-1]
    for images, lab in batches:
        f = jnp.asarray(_l2n(encode_fn(jnp.asarray(images))))
        lab = np.asarray(lab, np.int32)
        total += lab.shape[0]
        # ONE similarity GEMM + top_k at max(K); smaller Ks vote over a
        # prefix of the sorted ranking (what the reference loop reuses too)
        w, nb_lbl = _topk_neighbors(f, bank_j, lbl_j, knn_k=kmax)
        for k in eff:
            pred = np.asarray(_weighted_vote(w[:, :k], nb_lbl[:, :k],
                                             classes, knn_t))
            correct[k] += int((pred == lab).sum())
    if total == 0:
        raise ValueError("empty kNN eval source")
    return {f"knn_acc_{name[k]}": correct[k] / total for k in eff}
