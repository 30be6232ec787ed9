"""CoCa with an HF RoBERTa unimodal text tower — the reference's
coca_roberta-ViT-B-32.json (open_CLIP coca_model.py + hf_model.py
output_tokens), the last model-zoo config without a counterpart here."""
import jax
import jax.numpy as jnp
import numpy as np

from megatron_clip_tpu.factory import create_model, get_model_config

TINY = dict(
    embed_dim=64,
    vision_cfg={"image_size": 32, "layers": 2, "width": 64, "head_width": 32,
                "patch_size": 8},
    text_cfg={"hf_model_name": "__random_tiny__", "proj": "linear",
              "pooler_type": "mean_pooler", "width": 64, "heads": 2,
              "layers": 2, "vocab_size": 512, "context_length": 16},
    multimodal_cfg={"context_length": 16, "width": 64, "heads": 2,
                    "layers": 2})


def test_config_resolves_full_size():
    cfg = get_model_config("coca_roberta-ViT-B-32")
    assert cfg["text_cfg"]["hf_model_name"] == "roberta-base"
    assert cfg["multimodal_cfg"]["width"] == 768


def test_forward_reference_label_alignment():
    """CoCa.forward truncates the caption by one for EVERY tower type
    (coca_model.py:139 text[:, :-1], embed_cls=True); the mean pooler keeps
    every remaining token state, so labels = text[:, -len(tokens):] =
    text[:, 1:] (coca_model.py:156)."""
    m, p = create_model("coca_roberta-ViT-B-32", precision="fp32", seed=0,
                        **TINY)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3),
                             jnp.float32)
    txts = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 2,
                              500).astype(jnp.int32)
    out = m(p, imgs, txts)
    assert out["logits"].shape == (2, 15, 512)
    assert np.array_equal(np.asarray(out["labels"]), np.asarray(txts[:, 1:]))
    assert np.isfinite(np.asarray(out["logits"])).all()
    assert out["image_features"].shape == (2, 64)
    assert out["text_features"].shape == (2, 64)


def test_train_step_reduces_coca_loss():
    import optax

    from megatron_clip_tpu.losses import CoCaLoss

    m, p = create_model("coca_roberta-ViT-B-32", precision="fp32", seed=0,
                        **TINY)
    loss_obj = CoCaLoss(caption_loss_weight=2.0, clip_loss_weight=1.0)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3),
                             jnp.float32)
    txts = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 2,
                              500).astype(jnp.int32)
    tx = optax.adam(1e-3)
    opt = tx.init(p)

    @jax.jit
    def step(p, opt):
        def lf(p):
            out = m(p, imgs, txts)
            clip_l, cap_l = loss_obj(out["image_features"],
                                     out["text_features"], out["logits"],
                                     out["labels"], out["logit_scale"])
            return clip_l + cap_l
        loss, g = jax.value_and_grad(lf)(p)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(p, upd), opt, loss

    losses = []
    for _ in range(5):
        p, opt, loss = step(p, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_generate_runs():
    from megatron_clip_tpu.models.coca import coca_generate
    m, p = create_model("coca_roberta-ViT-B-32", precision="fp32", seed=0,
                        **TINY)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3),
                             jnp.float32)
    toks = np.asarray(coca_generate(p, imgs, m.cfg, sot_id=1, eos_id=2,
                                    max_len=8))
    assert toks.shape == (2, 8)
    assert (toks[:, 0] == 1).all()
