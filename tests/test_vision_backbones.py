"""Swin / MiT / inpainting / EsViT tests (reference surface:
megatron/model/vision/{swin,mit,esvit_swin}_backbone.py + inpainting.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from megatron_clip_tpu.models.swin import SwinCfg, init_swin, apply_swin
from megatron_clip_tpu.models.mit import MiTCfg, init_mit, apply_mit

TINY_SWIN = SwinCfg(image_size=32, patch_size=4, embed_dim=32,
                    depths=(1, 1), num_heads=(2, 4), window_size=4)
TINY_MIT = MiTCfg(image_size=32, dims=(16, 32), depths=(1, 1), heads=(1, 2),
                  sr_ratios=(4, 1))


def test_swin_forward_and_grads():
    params = init_swin(jax.random.PRNGKey(0), TINY_SWIN, num_classes=10)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    logits = apply_swin(params, x, TINY_SWIN, compute_dtype=jnp.float32)
    assert logits.shape == (2, 10)
    feats, tokens = apply_swin(params, x, TINY_SWIN,
                               compute_dtype=jnp.float32, return_tokens=True)
    assert feats.shape == (2, TINY_SWIN.num_features)
    assert tokens.shape[0] == 2 and tokens.shape[2] == TINY_SWIN.num_features

    g = jax.grad(lambda p: jnp.sum(
        apply_swin(p, x, TINY_SWIN, compute_dtype=jnp.float32) ** 2))(params)
    # shifted-window branch params receive gradient (stage 0 block 0 bias)
    gn = float(sum(jnp.abs(l).sum() for l in jax.tree.leaves(g)))
    assert np.isfinite(gn) and gn > 0
    rel = g["stages"][0]["blocks"][0]["attn"]["rel_bias"]
    assert float(jnp.abs(rel).sum()) > 0


def test_swin_shifted_windows_change_output():
    """With 2 blocks in a stage, block 1 uses shifted windows — the output
    must differ from running block 0's windowing twice (sanity that the
    shift path is live)."""
    cfg = SwinCfg(image_size=32, patch_size=4, embed_dim=32, depths=(2,),
                  num_heads=(2,), window_size=4)
    params = init_swin(jax.random.PRNGKey(0), cfg)
    # make both blocks identical: output difference can only come from shift
    params["stages"][0]["blocks"][1] = jax.tree.map(
        lambda x: x, params["stages"][0]["blocks"][0])
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    out = apply_swin(params, x, cfg, compute_dtype=jnp.float32)

    cfg_res = SwinCfg(image_size=32, patch_size=4, embed_dim=32, depths=(2,),
                      num_heads=(2,), window_size=8)  # window == res: no shift
    out2 = apply_swin(params, x, cfg_res, compute_dtype=jnp.float32)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_mit_forward_and_grads():
    params = init_mit(jax.random.PRNGKey(0), TINY_MIT, num_classes=7)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    logits = apply_mit(params, x, TINY_MIT, compute_dtype=jnp.float32)
    assert logits.shape == (2, 7)
    g = jax.grad(lambda p: jnp.sum(
        apply_mit(p, x, TINY_MIT, compute_dtype=jnp.float32) ** 2))(params)
    sr = g["stages"][0]["blocks"][0]["attn"]["sr"]["w"]
    assert float(jnp.abs(sr).sum()) > 0   # spatial-reduction conv trains


def test_inpaint_reconstruction_learns():
    from pretrain_vision_inpaint import parse_args, run
    m = run(parse_args([
        "--num-layers", "2", "--hidden-size", "64", "--head-width", "32",
        "--patch-size", "8", "--image-size", "32", "--batch-size", "8",
        "--train-steps", "25", "--warmup", "3", "--precision", "fp32",
        "--lr", "3e-3", "--mask-ratio", "0.5", "--log-interval", "25"]))
    # random-noise images have patch variance ~1/12; reconstruction should
    # at least approach predicting the mean (mse < variance)
    assert m["loss"] < 0.12, m


def test_inpaint_loss_only_counts_masked():
    from megatron_clip_tpu.config import VisionCfg
    from megatron_clip_tpu.models.inpaint import (
        init_inpaint, inpaint_loss, random_patch_mask)
    cfg = VisionCfg(layers=1, width=32, head_width=16, patch_size=8,
                    image_size=16)
    params = init_inpaint(jax.random.PRNGKey(0), cfg)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    none = jnp.zeros((2, 4), bool)
    all_ = jnp.ones((2, 4), bool)
    l0 = float(inpaint_loss(params, img, none, cfg, compute_dtype=jnp.float32))
    l1 = float(inpaint_loss(params, img, all_, cfg, compute_dtype=jnp.float32))
    assert l0 == 0.0 and l1 > 0.0

    mask = random_patch_mask(jax.random.PRNGKey(2), 4, 16, 0.25)
    assert np.asarray(mask.sum(-1) == 4).all()


def test_esvit_trains_one_step():
    import optax
    from megatron_clip_tpu.models.esvit import (
        EsViTCfg, init_esvit, esvit_loss, esvit_update_teacher)
    cfg = EsViTCfg(swin=TINY_SWIN, out_dim=32, region_out_dim=32)
    student, state = init_esvit(jax.random.PRNGKey(0), cfg)
    v1 = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    v2 = v1 + 0.05 * jax.random.normal(jax.random.PRNGKey(2), v1.shape)

    def loss_fn(p):
        total, aux = esvit_loss(p, state, v1, v2, cfg)
        return total, aux

    (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(student)
    assert np.isfinite(float(loss))
    assert float(sum(jnp.abs(l).sum()
                     for l in jax.tree.leaves(g["region_head"]))) > 0
    tx = optax.adamw(1e-3)
    opt = tx.init(student)
    upd, opt = tx.update(g, opt, student)
    student2 = optax.apply_updates(student, upd)
    state2 = esvit_update_teacher(state, student2, cfg, aux[2], aux[3])
    # teacher moved toward student
    d0 = jax.tree.leaves(state["teacher"])[0]
    d2 = jax.tree.leaves(state2["teacher"])[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d2))
