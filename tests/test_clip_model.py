"""Model construction + forward-pass unit tests (CPU, tiny configs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from megatron_clip_tpu.config import CLIPCfg, VisionCfg, TextCfg
from megatron_clip_tpu.models.clip import init_clip, apply_clip, clamp_logit_scale
from megatron_clip_tpu.factory import create_model, list_models, get_model_config

TINY = CLIPCfg(
    embed_dim=64,
    vision=VisionCfg(layers=2, width=64, head_width=32, patch_size=8, image_size=32),
    text=TextCfg(context_length=16, vocab_size=512, width=64, heads=2, layers=2),
)


def _batch(key, cfg, b=4):
    ki, kt = jax.random.split(key)
    images = jax.random.normal(ki, (b, cfg.vision.image_size, cfg.vision.image_size, 3))
    text = jax.random.randint(kt, (b, cfg.text.context_length), 1, cfg.text.vocab_size - 2)
    # place an EOT-like max token somewhere to exercise argmax pooling
    text = text.at[:, 10].set(cfg.text.vocab_size - 1)
    return images, text.astype(jnp.int32)


def test_forward_shapes_and_norms():
    params = init_clip(jax.random.PRNGKey(0), TINY)
    images, text = _batch(jax.random.PRNGKey(1), TINY)
    out = apply_clip(params, images, text, TINY, compute_dtype=jnp.float32)
    assert out["image_features"].shape == (4, 64)
    assert out["text_features"].shape == (4, 64)
    np.testing.assert_allclose(
        np.linalg.norm(out["image_features"], axis=-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(out["text_features"], axis=-1), 1.0, rtol=1e-5)
    # logit_scale = exp(ln(1/0.07)) = 1/0.07
    np.testing.assert_allclose(float(out["logit_scale"]), 1 / 0.07, rtol=1e-5)


def test_grad_flows_through_both_towers():
    params = init_clip(jax.random.PRNGKey(0), TINY)
    images, text = _batch(jax.random.PRNGKey(1), TINY)

    def loss_fn(p):
        out = apply_clip(p, images, text, TINY, compute_dtype=jnp.float32)
        from megatron_clip_tpu.losses import clip_loss
        return clip_loss(out["image_features"], out["text_features"],
                         out["logit_scale"])

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(g)) for g in leaves)
    # every leaf should receive some gradient signal somewhere
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert total > 0


def test_scan_vs_unrolled_equivalence():
    import dataclasses
    params = init_clip(jax.random.PRNGKey(0), TINY)
    images, text = _batch(jax.random.PRNGKey(1), TINY)
    out_scan = apply_clip(params, images, text, TINY, compute_dtype=jnp.float32)
    # same params, unrolled python loop
    tiny2 = dataclasses.replace(
        TINY,
        vision=dataclasses.replace(TINY.vision),
        text=dataclasses.replace(TINY.text))
    from megatron_clip_tpu.models import vit, text as text_mod
    f1 = vit.apply_vit(params["visual"], images, TINY.vision, TINY.embed_dim,
                       tcfg=TINY.vision.transformer(scan_layers=False),
                       compute_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(f1), np.asarray(
            vit.apply_vit(params["visual"], images, TINY.vision, TINY.embed_dim,
                          compute_dtype=jnp.float32)), rtol=2e-5, atol=2e-5)


def test_remat_matches_no_remat():
    params = init_clip(jax.random.PRNGKey(0), TINY)
    images, text = _batch(jax.random.PRNGKey(1), TINY)
    from megatron_clip_tpu.models import vit

    def feats(remat):
        return vit.apply_vit(params["visual"], images, TINY.vision, TINY.embed_dim,
                             tcfg=TINY.vision.transformer(remat=remat),
                             compute_dtype=jnp.float32)

    a = feats("none")
    for mode in ("full", "selective", "mlp"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(feats(mode)),
                                   rtol=1e-6, atol=1e-6)


def test_logit_scale_clamp():
    params = init_clip(jax.random.PRNGKey(0), TINY)
    params["logit_scale"] = jnp.asarray(99.0)
    params = clamp_logit_scale(params)
    assert float(params["logit_scale"]) <= np.log(100.0) + 1e-6


def test_factory_registry():
    names = list_models()
    assert "ViT-B-32" in names and "ViT-L-14" in names and "ViT-H-14" in names
    cfg = get_model_config("ViT-B-32")
    assert cfg["embed_dim"] == 512
    assert cfg["vision_cfg"]["width"] == 768
    model, params = create_model("ViT-B-32", init_params=False)
    assert model.image_size == 224 and model.context_length == 77
    # convnext, swin, and relpos-ViT are native towers now
    # (models/convnext.py, models/swin.py, models/vit.py rel_pos_bias)
    model, _ = create_model("convnext_base", init_params=False)
    assert model.cfg.convnext == "convnext_base"
    model, _ = create_model("swin_base_patch4_window7_224",
                            init_params=False)
    assert model.cfg.swin == "swin_base_patch4_window7_224"
    model, _ = create_model("vit_relpos_medium_patch16_cls_224",
                            init_params=False)
    assert model.cfg.vision.rel_pos_bias
    with pytest.raises(NotImplementedError):
        create_model("ViT-B-32", init_params=False, vision_cfg={
            "timm_model_name": "vit_srelpos_unknown_arch",
            "image_size": 224})


def test_quick_gelu_variant_differs():
    params = init_clip(jax.random.PRNGKey(0), TINY)
    images, text = _batch(jax.random.PRNGKey(1), TINY)
    import dataclasses
    qg = dataclasses.replace(TINY, quick_gelu=True)
    a = apply_clip(params, images, text, TINY, compute_dtype=jnp.float32)
    b = apply_clip(params, images, text, qg, compute_dtype=jnp.float32)
    assert not np.allclose(np.asarray(a["image_features"]),
                           np.asarray(b["image_features"]))
