"""CoCa model tests: forward shapes, both loss terms trainable."""
import jax
import jax.numpy as jnp
import numpy as np

from megatron_clip_tpu.config import CLIPCfg, VisionCfg, TextCfg, MultimodalCfg
from megatron_clip_tpu.models.coca import init_coca, apply_coca
from megatron_clip_tpu.losses import CoCaLoss

TINY = CLIPCfg(
    embed_dim=64,
    vision=VisionCfg(layers=2, width=64, head_width=32, patch_size=8,
                     image_size=32, attentional_pool=True,
                     attn_pooler_heads=2, attn_pooler_queries=8,
                     output_tokens=True),
    text=TextCfg(context_length=16, vocab_size=512, width=64, heads=2,
                 layers=2, embed_cls=True),
    multimodal=MultimodalCfg(context_length=16, width=64, heads=2, layers=2),
)


def _batch(b=4):
    k = jax.random.PRNGKey(1)
    ki, kt = jax.random.split(k)
    images = jax.random.normal(ki, (b, 32, 32, 3))
    texts = jax.random.randint(kt, (b, 16), 1, 510).astype(jnp.int32)
    return images, texts.at[:, 12].set(511)


def test_forward_shapes():
    params = init_coca(jax.random.PRNGKey(0), TINY)
    images, texts = _batch()
    out = apply_coca(params, images, texts, TINY, compute_dtype=jnp.float32)
    assert out["image_features"].shape == (4, 64)
    assert out["text_features"].shape == (4, 64)
    assert out["logits"].shape == (4, 15, 512)
    np.testing.assert_array_equal(np.asarray(out["labels"]),
                                  np.asarray(texts[:, 1:]))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["image_features"]), axis=-1), 1.0,
        rtol=1e-5)


def test_coca_generate_sampling_modes():
    from megatron_clip_tpu.models.coca import coca_generate
    params = init_coca(jax.random.PRNGKey(0), TINY)
    images, _ = _batch(2)
    for kw in ({"temperature": 0.0}, {"temperature": 1.0, "top_k": 8},
               {"temperature": 0.9, "top_p": 0.9}):
        out = coca_generate(params, images, TINY, sot_id=509, eos_id=511,
                            max_len=10, **kw)
        arr = np.asarray(out)
        assert arr.shape == (2, 10)
        assert (arr[:, 0] == 509).all()
        assert (arr >= 0).all() and (arr < 512).all()
        # after the first eos everything is pad
        for row in arr:
            hits = np.where(row == 511)[0]
            if len(hits):
                assert (row[hits[0] + 1:] == 0).all()


def test_coca_generate_beam():
    from megatron_clip_tpu.models.coca import coca_generate
    params = init_coca(jax.random.PRNGKey(0), TINY)
    images, _ = _batch(2)
    out = coca_generate(params, images, TINY, sot_id=509, eos_id=511,
                        max_len=10, num_beams=3)
    arr = np.asarray(out)
    assert arr.shape == (2, 10)
    assert (arr[:, 0] == 509).all()
    # beam must match greedy's first token (both maximize the first step)
    greedy = np.asarray(coca_generate(params, images, TINY, sot_id=509,
                                      eos_id=511, max_len=10))
    np.testing.assert_array_equal(arr[:, 1], greedy[:, 1])


def test_coca_loss_trains():
    params = init_coca(jax.random.PRNGKey(0), TINY)
    images, texts = _batch()
    loss_obj = CoCaLoss(caption_loss_weight=2.0, clip_loss_weight=1.0)

    def loss_fn(p):
        o = apply_coca(p, images, texts, TINY, compute_dtype=jnp.float32)
        d = loss_obj(o["image_features"], o["text_features"], o["logits"],
                     o["labels"], o["logit_scale"], output_dict=True)
        return d["contrastive_loss"] + d["caption_loss"]

    loss, g = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    # both branches receive gradient
    assert float(jnp.abs(g["mm_blocks"]["cross"]["attn"]["wq"]).sum()) > 0
    assert float(jnp.abs(g["visual"]["attn_pool"]["query"]).sum()) > 0
    assert float(jnp.abs(g["lm_head"]["w"]).sum()) > 0


def test_coca_accum_freq_matches_full_batch():
    """CoCa under --accum-freq == the full-batch CoCa step: contrastive via
    the feature cache (full negative pool), caption CE accumulated
    per-block / M — summed block gradients reconstruct the exact full-batch
    CoCaLoss gradient (round-4 lift of the accum gate)."""
    from megatron_clip_tpu.factory import CLIPModel
    from megatron_clip_tpu.config import Precision
    from megatron_clip_tpu.training import (make_train_step, make_optimizer,
                                            cosine_lr)
    from megatron_clip_tpu.training.train_step import TrainState

    model = CLIPModel(cfg=TINY, precision=Precision("float32", "float32"))
    assert model.is_coca
    loss_obj = CoCaLoss(caption_loss_weight=2.0, clip_loss_weight=1.0)
    images, texts = _batch(8)

    results = []
    for mb in (1, 2):
        params = init_coca(jax.random.PRNGKey(0), TINY)
        tx = make_optimizer(params, cosine_lr(1e-3, 2, 100))
        state = TrainState.create(params, tx)
        step = make_train_step(model, tx, loss_obj=loss_obj,
                               microbatches=mb)
        losses = []
        for _ in range(2):
            state, m = step(state, images, texts)
            losses.append(float(m["loss"]))
        results.append((losses, state.params))

    (l1, p1), (l2, p2) = results
    np.testing.assert_allclose(l1, l2, rtol=2e-5, atol=2e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_coca_pipeline_matches_unpipelined(devices8):
    """CoCa under pp2 (round-5 gate removal): both contrastive towers ride
    the stage schedule AND the multimodal decoder stage-shards through
    pipeline_transformer's apply_fn/extra path (self+cross pairs, image
    context as the per-microbatch side input). Outputs and parameter
    gradients must match the unpipelined forward."""
    from megatron_clip_tpu.config import ParallelCfg
    from megatron_clip_tpu.losses import CoCaLoss
    from megatron_clip_tpu.parallel.mesh import build_mesh
    from megatron_clip_tpu.parallel.pipeline import make_pipelined_layers_fn

    mesh = build_mesh(ParallelCfg(dp=2, tp=2, pp=2, microbatches=2))
    params = init_coca(jax.random.PRNGKey(0), TINY)
    images, texts = _batch(8)
    lf = make_pipelined_layers_fn(mesh, 2, 1)

    ref = apply_coca(params, images, texts, TINY, compute_dtype=jnp.float32)
    got = apply_coca(params, images, texts, TINY, compute_dtype=jnp.float32,
                     layers_fn=lf, mm_layers_fn=lf)
    for k in ("image_features", "text_features", "logits"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=2e-5, atol=2e-5, err_msg=k)
    np.testing.assert_array_equal(np.asarray(got["labels"]),
                                  np.asarray(ref["labels"]))

    loss_obj = CoCaLoss(caption_loss_weight=2.0, clip_loss_weight=1.0)

    def loss(p, **kw):
        o = apply_coca(p, images, texts, TINY, compute_dtype=jnp.float32,
                       **kw)
        d = loss_obj(o["image_features"], o["text_features"], o["logits"],
                     o["labels"], o["logit_scale"], output_dict=True)
        return d["contrastive_loss"] + d["caption_loss"]

    g_ref = jax.grad(loss)(params)
    g_pp = jax.grad(lambda p: loss(p, layers_fn=lf, mm_layers_fn=lf))(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pp = jax.tree.leaves(g_pp)
    for (path, a), b in zip(flat_ref, flat_pp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=jax.tree_util.keystr(path))
