"""ModifiedResNet (RN50 family) tests."""
import jax
import jax.numpy as jnp
import numpy as np

from megatron_clip_tpu.models.resnet import (
    ResNetCfg, init_modified_resnet, apply_modified_resnet, merge_bn_stats)

TINY = ResNetCfg(layers=(1, 1, 1, 1), width=16, image_size=64, heads=4)


def test_forward_shapes():
    params = init_modified_resnet(jax.random.PRNGKey(0), TINY, 64)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    f = apply_modified_resnet(params, x, TINY, compute_dtype=jnp.float32)
    assert f.shape == (2, 64)
    assert np.all(np.isfinite(np.asarray(f)))


def test_train_mode_stats_and_grads():
    params = init_modified_resnet(jax.random.PRNGKey(0), TINY, 64)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 3)) * 2 + 1

    def loss(p):
        f, stats = apply_modified_resnet(p, x, TINY, train=True,
                                         compute_dtype=jnp.float32)
        return jnp.sum(f ** 2), stats

    (l, stats), g = jax.value_and_grad(loss, has_aux=True)(params)
    assert np.isfinite(float(l))
    assert all(np.all(np.isfinite(a)) for a in jax.tree.leaves(g))
    # stats recorded for every BN (stem 3 + per-block 3/4)
    assert all(s is not None for s in stats)
    new = merge_bn_stats(params, stats)
    # running mean moved toward the batch mean (input mean ~1 after conv)
    assert not np.allclose(np.asarray(new["stem"]["bn1"]["mean"]),
                           np.asarray(params["stem"]["bn1"]["mean"]))
    # scale/bias untouched
    np.testing.assert_array_equal(np.asarray(new["stem"]["bn1"]["scale"]),
                                  np.asarray(params["stem"]["bn1"]["scale"]))


def test_eval_uses_running_stats():
    params = init_modified_resnet(jax.random.PRNGKey(0), TINY, 64)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    f1 = apply_modified_resnet(params, x, TINY, compute_dtype=jnp.float32)
    # batch-size independence in eval mode
    f2 = apply_modified_resnet(params, x[:1], TINY, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(f1[:1]), np.asarray(f2),
                               rtol=1e-5, atol=1e-5)


def test_rn50_factory_geometry():
    """RN50 true config builds and downsamples 224 -> 7x7 before pooling."""
    cfg = ResNetCfg()  # (3,4,6,3), width 64, 224
    params = init_modified_resnet(jax.random.PRNGKey(0), cfg, 1024)
    assert params["attnpool"]["pos_embed"].shape == (50, 2048)
    n = sum(x.size for x in jax.tree.leaves(params))
    # RN50 visual is ~38M params
    assert 30e6 < n < 50e6, n


def test_rn_clip_factory_end_to_end():
    """RN50-family names resolve in the factory; the RN-CLIP two-tower
    forward + grads work (list-typed layers selects ModifiedResNet, matching
    open_CLIP's config convention)."""
    from megatron_clip_tpu.factory import create_model, list_models
    assert "RN50" in list_models() and "RN50x4" in list_models()
    model, params = create_model(
        "RN50", precision="fp32",
        embed_dim=64,
        vision_cfg={"image_size": 64, "layers": [1, 1, 1, 1], "width": 16},
        text_cfg={"context_length": 16, "vocab_size": 512, "width": 64,
                  "heads": 2, "layers": 2})
    images = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    texts = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 1, 510)
    out = model(params, images, texts)
    assert out["image_features"].shape == (2, 64)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["image_features"]), axis=-1), 1.0,
        rtol=1e-5)
    from megatron_clip_tpu.losses import clip_loss
    g = jax.grad(lambda p: clip_loss(
        model(p, images, texts)["image_features"],
        model(p, images, texts)["text_features"], 10.0))(params)
    assert all(np.all(np.isfinite(x)) for x in jax.tree.leaves(g))
