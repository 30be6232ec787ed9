"""Weighted-kNN monitor (reference megatron/model/vision/knn_monitor.py +
pretrain_vision_dino.py eval branch)."""
import numpy as np
import pytest


def _folder(tmp_path_factory, name, seed):
    from PIL import Image
    root = tmp_path_factory.mktemp(name)
    rng = np.random.RandomState(seed)
    colors = [(220, 40, 40), (40, 220, 40), (40, 40, 220)]
    for ci, col in enumerate(colors):
        d = root / f"class{ci}"
        d.mkdir()
        for i in range(8):
            img = np.clip(np.asarray(col, np.float32)[None, None]
                          + rng.randn(24, 24, 3) * 15, 0, 255
                          ).astype(np.uint8)
            Image.fromarray(img).save(d / f"{i}.png")
    return str(root)


def test_knn_predict_weighted():
    """Three tight clusters on the unit sphere: kNN recovers the cluster
    label; a near-duplicate query outvotes k-1 farther wrong-class
    neighbors through the exp(sim/t) weighting (InstDisc semantics)."""
    import jax.numpy as jnp
    from megatron_clip_tpu.evaluation.knn import knn_predict

    rng = np.random.RandomState(0)
    centers = np.eye(3, 8, dtype=np.float32)
    bank, labels = [], []
    for c in range(3):
        pts = centers[c][None] + 0.05 * rng.randn(20, 8).astype(np.float32)
        bank.append(pts)
        labels += [c] * 20
    bank = np.concatenate(bank)
    bank /= np.linalg.norm(bank, axis=1, keepdims=True)
    labels = np.asarray(labels, np.int32)

    q = centers + 0.05 * rng.randn(3, 8).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    pred = knn_predict(jnp.asarray(q), jnp.asarray(bank),
                       jnp.asarray(labels), classes=3, knn_k=10)
    assert list(np.asarray(pred)) == [0, 1, 2]

    # weighting: one exact-duplicate neighbor of class 2 must beat two
    # distant class-0 neighbors at k=3 (unweighted majority would say 0)
    b2 = np.stack([q[2], -q[2] * 0.0 + centers[0], centers[0]])
    b2[1:] += 0.3 * rng.randn(2, 8).astype(np.float32)
    b2 /= np.linalg.norm(b2, axis=1, keepdims=True)
    p = knn_predict(q[2:3], jnp.asarray(b2),
                    jnp.asarray(np.asarray([2, 0, 0], np.int32)),
                    classes=3, knn_k=3)
    assert int(p[0]) == 2


def test_dino_knn_monitor_e2e(tmp_path_factory):
    """DINO entry with --knn-eval-dir: bank from the train folder, eval on
    a second folder with fresh noise — trivially color-separable classes
    must score far above chance (1/3) even for a near-random teacher."""
    train = _folder(tmp_path_factory, "knn_train", 0)
    val = _folder(tmp_path_factory, "knn_val", 1)
    import pretrain_vision_dino as dino
    out = dino.run(dino.parse_args([
        "--num-layers", "2", "--hidden-size", "64", "--patch-size", "8",
        "--img-size", "24", "--out-dim", "32", "--batch-size", "8",
        "--train-steps", "3", "--eval-interval", "2", "--precision", "fp32",
        "--data-dir", train, "--knn-eval-dir", val]))
    knn = out["knn"]
    # 24-sample bank: k=100/200 clamp+dedupe to 24, reported as the
    # smallest clamped requested K
    assert set(knn) == {"knn_acc_10", "knn_acc_20", "knn_acc_100"}
    assert knn["knn_acc_10"] > 0.6, knn
