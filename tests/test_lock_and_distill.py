"""Tower locking (open_CLIP --lock-image/--lock-text, LiT) and teacher
distillation (--distill-model) — reference: open_CLIP/src/training/main.py:
259-267, open_clip/model.py:263-268, transformer.py:398-429, loss.py:185-221.
"""
import jax
import jax.numpy as jnp
import pytest

from megatron_clip_tpu import factory
from megatron_clip_tpu.losses import DistillClipLoss
from megatron_clip_tpu.training.optim import (
    make_optimizer, tower_lock_mask, cosine_lr)
from megatron_clip_tpu.training.train_step import TrainState, make_train_step


_CACHE = {}


def tiny_model(seed=0):
    if seed not in _CACHE:
        _CACHE[seed] = factory.create_model("test-tiny", precision="fp32",
                                            seed=seed)
    model, params = _CACHE[seed]
    return model, jax.tree.map(jnp.copy, params)


def _batch(model, n=4, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    images = jax.random.normal(
        k1, (n, model.image_size, model.image_size, 3), jnp.float32)
    texts = jax.random.randint(k2, (n, model.context_length), 0, 1000)
    return images, texts


_STEP_CACHE = {}


def _step(model, params, lock_mask=None, teacher=None, cache_key=None):
    if cache_key is not None and cache_key in _STEP_CACHE:
        return _STEP_CACHE[cache_key]
    tx = make_optimizer(params, cosine_lr(1e-3, 1, 10), lock_mask=lock_mask)
    loss_obj = DistillClipLoss() if teacher is not None else None
    step = make_train_step(model, tx, teacher=teacher, jit=False,
                           loss_obj=loss_obj)
    state = TrainState.create(params, tx)
    images, texts = _batch(model)
    out = step(state, images, texts)
    if cache_key is not None:
        _STEP_CACHE[cache_key] = out
    return out


def _changed(a, b):
    return {k: not jax.tree.all(jax.tree.map(jnp.allclose, a[k], b[k]))
            for k in a}


class TestTowerLock:
    def test_lock_image_freezes_visual_only(self):
        model, params = tiny_model()
        mask = tower_lock_mask(params, lock_image=True)
        new_state, _ = _step(model, params, lock_mask=mask, cache_key="lock_image")
        ch = _changed(params, new_state.params)
        assert not ch["visual"], "locked vision tower moved"
        assert ch["text"], "text tower should still train"

    def test_lock_text_freezes_text_only(self):
        model, params = tiny_model()
        mask = tower_lock_mask(params, lock_text=True)
        new_state, _ = _step(model, params, lock_mask=mask, cache_key="lock_text")
        ch = _changed(params, new_state.params)
        assert ch["visual"]
        assert not ch["text"]

    def test_unlocked_groups_trains_tail_only(self):
        model, params = tiny_model()
        # unlock proj + (last block, ln_post): groups G-1 and G-2
        mask = tower_lock_mask(params, lock_image=True,
                               image_unlocked_groups=2)
        new_state, _ = _step(model, params, lock_mask=mask,
                             cache_key="unlocked2")
        v0, v1 = params["visual"], new_state.params["visual"]
        L = v0["blocks"]["ln_1"]["scale"].shape[0]
        # embeddings + pre-LN frozen
        assert jnp.allclose(v0["pos_embed"], v1["pos_embed"])
        assert jnp.allclose(v0["ln_pre"]["scale"], v1["ln_pre"]["scale"])
        # proj + ln_post trainable
        assert not jnp.allclose(v0["proj"], v1["proj"])
        assert not jnp.allclose(v0["ln_post"]["scale"], v1["ln_post"]["scale"])
        # last block trainable, earlier blocks frozen
        w0, w1 = v0["blocks"]["mlp"]["w1"], v1["blocks"]["mlp"]["w1"]
        assert not jnp.allclose(w0[L - 1], w1[L - 1])
        assert jnp.allclose(w0[: L - 1], w1[: L - 1])

    def test_weight_decay_blocked_on_frozen(self):
        """A frozen param with zero grad must ALSO skip weight decay (the
        whole point of masking final updates, not grads)."""
        model, params = tiny_model()
        mask = tower_lock_mask(params, lock_image=True, lock_text=True)
        new_state, _ = _step(model, params, lock_mask=mask,
                             cache_key="both_locked")
        same = jax.tree.all(jax.tree.map(
            jnp.array_equal, params["visual"], new_state.params["visual"]))
        assert same

    def test_unlocked_groups_requires_blocks(self):
        model, params = tiny_model()
        no_blocks = {"visual": {"proj": params["visual"]["proj"]},
                     "logit_scale": params["logit_scale"]}
        with pytest.raises(ValueError):
            tower_lock_mask(no_blocks, lock_image=True,
                            image_unlocked_groups=1)

    def test_vpp_layout_permutes_per_layer_mask(self):
        """Under the interleaved pipeline's physical weight placement
        (vpp_arrange), the per-layer lock vector must be permuted to the
        same order — physical row i gets the logical layer order[i]'s
        lock bit (training/loop.py _JointRunner builds its optimizer on
        arranged params)."""
        import numpy as np
        from megatron_clip_tpu.parallel.pipeline import (vpp_arrange,
                                                         vpp_layer_order)
        L, pp, vpp = 8, 2, 2
        params = {"text": {"blocks": {"w": jnp.zeros((L, 4, 4))},
                           "proj": jnp.zeros((4, 4))}}
        logical = tower_lock_mask(params, lock_text=True,
                                  text_unlocked_layers=4)
        arranged = tower_lock_mask(
            {"text": {"blocks": vpp_arrange(params["text"]["blocks"],
                                            pp, vpp),
                      "proj": params["text"]["proj"]}},
            lock_text=True, text_unlocked_layers=4, vpp_layout=(pp, vpp))
        order = vpp_layer_order(L, pp, vpp)
        got = np.asarray(arranged["text"]["blocks"]["w"]).reshape(L)
        want = np.asarray(logical["text"]["blocks"]["w"]).reshape(L)[order]
        assert (got == want).all()
        # and the physical mask must differ from the un-permuted one
        # (otherwise this test would pass vacuously)
        assert not (want == np.asarray(
            logical["text"]["blocks"]["w"]).reshape(L)).all()

    def test_tower_subtree_mask_via_tower_name(self):
        """Branch-parallel optimizes each tower subtree separately; wrapping
        the subtree under its tower name must reproduce the full-tree mask
        (without it --lock-* silently no-ops in branch mode)."""
        model, params = tiny_model()
        full = tower_lock_mask(params, lock_image=True,
                               image_unlocked_groups=2)
        sub = tower_lock_mask({"visual": params["visual"]},
                              lock_image=True, image_unlocked_groups=2)
        assert jax.tree.all(jax.tree.map(
            jnp.array_equal, full["visual"], sub["visual"]))


class TestDistill:
    def test_distill_step_runs_and_teacher_fixed(self):
        model, params = tiny_model()
        _, tparams = tiny_model(seed=1)
        new_state, metrics = _step(model, params,
                                   teacher=(model, tparams),
                                   cache_key="distill")
        assert jnp.isfinite(metrics["loss"])
        # student moved
        assert not jnp.allclose(params["visual"]["proj"],
                                new_state.params["visual"]["proj"])

    def test_distill_loss_larger_than_plain(self):
        """With a disagreeing teacher the total loss includes a positive
        distill term on top of the contrastive term."""
        model, params = tiny_model()
        _, tparams = tiny_model(seed=1)
        _, m_plain = _step(model, params, cache_key="plain")
        _, m_dist = _step(model, params, teacher=(model, tparams),
                          cache_key="distill")
        assert float(m_dist["loss"]) > float(m_plain["loss"])

    def test_distill_composes_with_accum_freq(self):
        """--distill-model + --accum-freq: the feature-cached accumulation
        path must include the distill term (it used to silently train
        contrastive-only) and stay exact — loss equals the microbatches=1
        distill step."""
        import numpy as np
        model, params = tiny_model()
        _, tparams = tiny_model(seed=1)
        images, texts = _batch(model, n=4)
        losses = {}
        for m in (1, 2):
            p = jax.tree.map(jnp.copy, params)
            tx = make_optimizer(p, cosine_lr(1e-3, 1, 10))
            step = make_train_step(model, tx, teacher=(model, tparams),
                                   jit=False, loss_obj=DistillClipLoss(),
                                   microbatches=m)
            _, metrics = step(TrainState.create(p, tx), images, texts)
            losses[m] = float(metrics["loss"])
        _, m_plain = _step(model, params, cache_key="plain")
        assert losses[2] > float(m_plain["loss"])  # distill term present
        np.testing.assert_allclose(losses[2], losses[1], rtol=1e-5)

    def test_identical_teacher_distill_term_near_zero(self):
        model, params = tiny_model()
        images, texts = _batch(model)
        out = model(params, images, texts)
        loss_obj = DistillClipLoss()
        d = loss_obj(out["image_features"], out["text_features"],
                     out["logit_scale"],
                     dist_image_features=out["image_features"],
                     dist_text_features=out["text_features"],
                     dist_logit_scale=out["logit_scale"], output_dict=True)
        # distill term = soft-xent(p, p) = entropy of p > 0, but the
        # KL part is zero: soft-xent(s, t) - H(t) == 0 when s == t
        lpi, lpt = loss_obj.get_logits(out["image_features"],
                                       out["text_features"],
                                       out["logit_scale"])
        def ent(lg):
            p = jax.nn.softmax(lg.astype(jnp.float32), axis=-1)
            return -(p * jnp.log(p + 1e-20)).sum(-1).mean()
        expected = 0.5 * (ent(lpi) + ent(lpt))
        assert float(d["distill_loss"]) == pytest.approx(float(expected),
                                                         rel=1e-3)


class TestCLIFlags:
    def test_params_accept_lock_and_distill(self):
        from megatron_clip_tpu.training.params import parse_args
        ns = parse_args([
            "--lock-image", "--lock-image-unlocked-groups", "2",
            "--lock-text", "--lock-text-unlocked-layers", "1",
            "--distill-model", "ViT-B-32",
            "--distill-pretrained", "laion400m_e32"])
        assert ns.lock_image and ns.lock_image_unlocked_groups == 2
        assert ns.lock_text and ns.lock_text_unlocked_layers == 1
        assert ns.distill_model == "ViT-B-32"
