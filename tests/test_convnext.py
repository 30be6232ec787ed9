"""ConvNeXt vision tower tests (reference: open_CLIP convnext_*.json configs
delegating to timm; here a native tower, models/convnext.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from megatron_clip_tpu.models.convnext import (
    CONVNEXT_ARCHS, ConvNeXtCfg, apply_convnext, init_convnext)

TINY = ConvNeXtCfg(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64), image_size=32)


def test_forward_shape_and_grads():
    params = init_convnext(jax.random.PRNGKey(0), TINY, embed_dim=24)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    out = apply_convnext(params, x, TINY, 24, compute_dtype=jnp.float32)
    assert out.shape == (2, 24)
    assert np.isfinite(np.asarray(out)).all()
    g = jax.grad(lambda p: (apply_convnext(p, x, TINY, 24,
                                           compute_dtype=jnp.float32) ** 2
                            ).sum())(params)
    gnorm = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
    assert gnorm > 0


def test_mlp_proj_head():
    cfg = ConvNeXtCfg(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
                      image_size=32, proj="mlp")
    params = init_convnext(jax.random.PRNGKey(0), cfg, embed_dim=24)
    assert "w1" in params["proj"] and "w2" in params["proj"]
    x = jnp.zeros((1, 32, 32, 3))
    assert apply_convnext(params, x, cfg, 24,
                          compute_dtype=jnp.float32).shape == (1, 24)


def test_factory_parses_timm_convnext_config():
    """open_CLIP's convnext JSON schema (timm_model_name/timm_proj) loads."""
    from megatron_clip_tpu.factory import parse_model_cfg
    cfg = parse_model_cfg({
        "embed_dim": 640,
        "vision_cfg": {"timm_model_name": "convnext_base",
                       "timm_model_pretrained": False, "timm_pool": "",
                       "timm_proj": "linear", "timm_drop": 0.0,
                       "timm_drop_path": 0.1, "image_size": 256},
        "text_cfg": {"context_length": 77, "vocab_size": 49408,
                     "width": 640, "heads": 10, "layers": 12}})
    assert cfg.convnext == "convnext_base"
    assert cfg.vision.image_size == 256
    assert cfg.convnext_drop_path == 0.1


def test_factory_end_to_end_tiny_convnext():
    """Both towers through the factory + clip loss on a shrunken convnext."""
    from megatron_clip_tpu.factory import create_model
    from megatron_clip_tpu.losses import clip_loss

    model, params = create_model(
        "convnext_tiny", precision="fp32", seed=0,
        vision_cfg={"timm_model_name": "convnext_atto", "timm_proj": "linear",
                    "image_size": 64},
        embed_dim=64,
        text_cfg={"context_length": 16, "vocab_size": 512, "width": 64,
                  "heads": 2, "layers": 2})
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    txts = jnp.full((2, 16), 3, jnp.int32).at[:, 10].set(511)
    out = model(params, imgs, txts)
    assert out["image_features"].shape == (2, 64)
    loss = clip_loss(out["image_features"], out["text_features"],
                     out["logit_scale"])
    assert np.isfinite(float(loss))


def test_builtin_ladder_registered():
    from megatron_clip_tpu.factory import get_model_config
    for name in ("convnext_base", "convnext_base_w", "convnext_large_d",
                 "convnext_xxlarge"):
        c = get_model_config(name)
        assert c is not None
        arch = c["vision_cfg"]["timm_model_name"]
        assert arch in CONVNEXT_ARCHS
