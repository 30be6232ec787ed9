"""Zero-shot + retrieval eval harness tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from megatron_clip_tpu.config import CLIPCfg, VisionCfg, TextCfg, Precision
from megatron_clip_tpu.factory import CLIPModel
from megatron_clip_tpu.models.clip import init_clip
from megatron_clip_tpu.evaluation import (
    build_zero_shot_classifier, zero_shot_eval, SIMPLE_IMAGENET_TEMPLATES,
    contrastive_eval_metrics, recall_at_k)
from megatron_clip_tpu.tokenizer import find_bpe_vocab

TINY = CLIPCfg(
    embed_dim=64,
    vision=VisionCfg(layers=2, width=64, head_width=32, patch_size=8, image_size=32),
    text=TextCfg(context_length=16, vocab_size=49408, width=64, heads=2, layers=2),
)


def _model():
    return CLIPModel(cfg=TINY, precision=Precision("float32", "float32"))


def test_recall_at_k_perfect():
    logits = np.eye(8) * 10 + np.random.RandomState(0).randn(8, 8) * 0.01
    m = recall_at_k(logits)
    assert m["image_to_text_R@1"] == 1.0
    assert m["text_to_image_R@5"] == 1.0
    assert m["image_to_text_mean_rank"] == 1.0


@pytest.mark.skipif(find_bpe_vocab() is None, reason="no BPE vocab")
def test_zero_shot_pipeline():
    from megatron_clip_tpu.tokenizer import get_tokenizer
    model = _model()
    params = init_clip(jax.random.PRNGKey(0), TINY)
    classnames = ["cat", "dog", "car"]
    clf = build_zero_shot_classifier(model, params, classnames,
                                     SIMPLE_IMAGENET_TEMPLATES,
                                     get_tokenizer(), batch_size=2)
    assert clf.shape == (64, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(clf), axis=0), 1.0,
                               rtol=1e-5)
    rng = np.random.RandomState(0)
    batches = [(rng.randn(4, 32, 32, 3).astype(np.float32),
                rng.randint(0, 3, 4)) for _ in range(2)]
    m = zero_shot_eval(model, params, clf, batches)
    assert 0.0 <= m["imagenet-zeroshot-val-top1"] <= 1.0
    assert m["imagenet-zeroshot-val-top5"] == 1.0  # only 3 classes


def test_contrastive_eval_metrics():
    model = _model()
    params = init_clip(jax.random.PRNGKey(0), TINY)
    rng = np.random.RandomState(0)
    batches = [(rng.randn(4, 32, 32, 3).astype(np.float32),
                rng.randint(1, 49407, (4, 16)).astype(np.int32))
               for _ in range(2)]
    m = contrastive_eval_metrics(model, params, batches)
    assert m["num_samples"] == 8
    assert np.isfinite(m["clip_val_loss"])
    assert 0.0 <= m["image_to_text_R@1"] <= 1.0


def test_imagenet_metadata_loader():
    from megatron_clip_tpu.evaluation.zero_shot import load_imagenet_metadata
    names, templates = load_imagenet_metadata()
    if names is None:
        pytest.skip("no imagenet metadata available")
    assert len(names) == 1000
    assert len(templates) == 80
    assert isinstance(templates[0]("dog"), str)


def test_recall_at_k_device_matches_host():
    """Chunked device ranking == host argsort ranking (no-ties regime)."""
    from megatron_clip_tpu.evaluation import recall_at_k_device
    rng = np.random.RandomState(0)
    img = rng.randn(37, 16).astype(np.float32)
    txt = (img + 0.3 * rng.randn(37, 16)).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=1, keepdims=True)
    host = recall_at_k(10.0 * img @ txt.T)
    dev = recall_at_k_device(img, txt, 10.0, chunk=8)
    for k, v in host.items():
        np.testing.assert_allclose(dev[k], v, atol=1e-6, err_msg=k)
