"""ViT image classification + DINO self-supervised heads.

Covers pretrain_vision_classify.py (megatron/model/vision/classification.py:
ViT backbone + MLP class head) and pretrain_vision_dino.py
(megatron/model/vision/dino.py: student/teacher EMA, centering + sharpened
cross-entropy on projector outputs).
"""
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from megatron_clip_tpu.config import VisionCfg
from megatron_clip_tpu.models.vit import init_vit, apply_vit
from megatron_clip_tpu.ops.cross_entropy import cross_entropy


def init_vit_classifier(key, cfg: VisionCfg, num_classes: int,
                        dtype=jnp.float32):
    kb, kh = jax.random.split(key)
    params = {
        # backbone reuses the CLIP ViT with an identity-sized projection
        "backbone": init_vit(kb, cfg, cfg.width, dtype=dtype),
        "head": {"w": (cfg.width ** -0.5
                       * jax.random.normal(kh, (cfg.width, num_classes))).astype(dtype),
                 "b": jnp.zeros((num_classes,), dtype=dtype)},
    }
    # classification uses the raw pooled feature; neutralize the CLIP proj
    params["backbone"]["proj"] = jnp.eye(cfg.width, dtype=dtype)
    return params


def apply_vit_classifier(params, images, cfg: VisionCfg, *,
                         compute_dtype=jnp.bfloat16, layers_fn=None):
    feats = apply_vit(params["backbone"], images, cfg, cfg.width,
                      compute_dtype=compute_dtype, layers_fn=layers_fn)
    logits = feats @ params["head"]["w"].astype(feats.dtype) \
        + params["head"]["b"].astype(feats.dtype)
    return logits.astype(jnp.float32)


def classification_loss(params, images, labels, cfg: VisionCfg, *,
                        compute_dtype=jnp.bfloat16, layers_fn=None):
    logits = apply_vit_classifier(params, images, cfg,
                                  compute_dtype=compute_dtype,
                                  layers_fn=layers_fn)
    return cross_entropy(logits, labels).mean()


# ----------------------------- DINO ------------------------------------------

@dataclass(frozen=True)
class DinoCfg:
    out_dim: int = 4096              # prototype count (dino head output)
    teacher_temp: float = 0.04
    student_temp: float = 0.1
    center_momentum: float = 0.9
    ema_momentum: float = 0.996
    # the DINOHead projector (dino.py:82-115): 3-layer gelu MLP ->
    # bottleneck -> l2 normalize -> weight-normed prototype layer
    head_hidden: int = 2048          # --dino-head-hidden-size
    bottleneck: int = 256            # --dino-bottleneck-size
    norm_last_layer: bool = False    # --dino-norm-last-layer: freeze the
    #                                  weight-norm gain at 1


def _init_linear(key, d_in, d_out, dtype):
    return {"w": (0.02 * jax.random.truncated_normal(
        key, -2.0, 2.0, (d_in, d_out))).astype(dtype),
        "b": jnp.zeros((d_out,), dtype)}


def init_dino(key, vcfg: VisionCfg, dcfg: DinoCfg, dtype=jnp.float32):
    kb, k1, k2, k3, kl = jax.random.split(key, 5)
    head = {
        "fc1": _init_linear(k1, vcfg.width, dcfg.head_hidden, dtype),
        "fc2": _init_linear(k2, dcfg.head_hidden, dcfg.head_hidden, dtype),
        "fc3": _init_linear(k3, dcfg.head_hidden, dcfg.bottleneck, dtype),
        # weight-norm decomposition of the prototype layer: direction v +
        # gain g (initialized to 1, dino.py:100-103)
        "last_v": (0.02 * jax.random.truncated_normal(
            kl, -2.0, 2.0, (dcfg.bottleneck, dcfg.out_dim))).astype(dtype),
        "last_g": jnp.ones((dcfg.out_dim,), dtype),
    }
    student = {
        "backbone": init_vit(kb, vcfg, vcfg.width, dtype=dtype),
        "head": head,
    }
    student["backbone"]["proj"] = jnp.eye(vcfg.width, dtype=dtype)
    teacher = jax.tree.map(jnp.copy, student)
    center = jnp.zeros((dcfg.out_dim,), jnp.float32)
    return {"student": student, "teacher": teacher, "center": center}


def _dino_head(net, images, vcfg, compute_dtype, dcfg: DinoCfg = None,
               freeze_last=None):
    """Backbone CLS -> DINOHead (dino.py:111-115): gelu MLP, l2-normalized
    bottleneck, weight-normed prototypes.
    `freeze_last` (traced 0/1 float): gates gradients off the prototype
    layer (dino.py cancel_gradients_last_layer / --dino-freeze-last-layer)."""
    f = apply_vit(net["backbone"], images, vcfg, vcfg.width,
                  compute_dtype=compute_dtype)
    h = net["head"]
    x = f
    for name in ("fc1", "fc2"):
        p = h[name]
        x = jax.nn.gelu(x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype))
    x = x @ h["fc3"]["w"].astype(x.dtype) + h["fc3"]["b"].astype(x.dtype)
    x = x.astype(jnp.float32)
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-6)
    v = h["last_v"].astype(jnp.float32)
    g = h["last_g"].astype(jnp.float32)
    if dcfg is not None and dcfg.norm_last_layer:
        g = jax.lax.stop_gradient(g)   # frozen gain (requires_grad=False)
    if freeze_last is not None:
        # grad-gate: value is unchanged, gradient scales by (1 - freeze)
        v = v * (1.0 - freeze_last) + jax.lax.stop_gradient(v) * freeze_last
        g = g * (1.0 - freeze_last) + jax.lax.stop_gradient(g) * freeze_last
    w = g[None, :] * v / jnp.maximum(
        jnp.linalg.norm(v, axis=0, keepdims=True), 1e-6)
    return x @ w


def dino_loss(student_params, state, views1, views2, vcfg: VisionCfg,
              dcfg: DinoCfg, *, compute_dtype=jnp.bfloat16,
              teacher_temp=None, local_views=None, local_vcfg=None,
              freeze_last=None):
    """Cross-view DINO loss: student(view_a) matches sharpened+centered
    teacher(view_b), symmetrized (dino.py loss semantics).
    `teacher_temp` overrides dcfg.teacher_temp with a traced value — the
    linear warmup schedule (megatron --dino-warmup-teacher-temp[-epochs],
    dino.py teacher_temp_schedule).
    `local_views` [L*B, s, s, 3] with `local_vcfg` (image_size=s): the
    multi-crop student views (--dino-local-crops-number; dino.py
    MultiCropWrapper). The teacher sees only the two global views; every
    local view matches both teacher views."""
    teacher, center = state["teacher"], state["center"]
    tt = dcfg.teacher_temp if teacher_temp is None else teacher_temp
    s1 = _dino_head(student_params, views1, vcfg, compute_dtype, dcfg,
                    freeze_last)
    s2 = _dino_head(student_params, views2, vcfg, compute_dtype, dcfg,
                    freeze_last)
    t1 = jax.lax.stop_gradient(
        _dino_head(teacher, views1, vcfg, compute_dtype, dcfg))
    t2 = jax.lax.stop_gradient(
        _dino_head(teacher, views2, vcfg, compute_dtype, dcfg))

    def ce(s, t):
        pt = jax.nn.softmax((t - center) / tt, axis=-1)
        logps = jax.nn.log_softmax(s / dcfg.student_temp, axis=-1)
        return -(pt * logps).sum(-1).mean()

    loss = ce(s1, t2) + ce(s2, t1)
    n_terms = 2
    if local_views is not None:
        sl = _dino_head(student_params, local_views, local_vcfg,
                        compute_dtype, dcfg, freeze_last)   # [L*B, out]
        reps = sl.shape[0] // t1.shape[0]
        # each of the L local crops is its own (student, teacher) pair —
        # the tiled ce is the MEAN over the L pairs, so scale by L to
        # average over 2 + 2L individual pairs like dino.py n_loss_terms
        loss = loss + reps * (ce(sl, jnp.tile(t1, (reps, 1)))
                              + ce(sl, jnp.tile(t2, (reps, 1))))
        n_terms += 2 * reps
    loss = loss / n_terms
    batch_center = 0.5 * (t1.mean(0) + t2.mean(0))
    new_center = dcfg.center_momentum * center \
        + (1 - dcfg.center_momentum) * batch_center
    return loss, new_center


def dino_update_teacher(state, student_params, dcfg: DinoCfg,
                        momentum=None):
    """EMA teacher update. `momentum` overrides dcfg.ema_momentum with a
    traced value — the cosine base→1.0 schedule (dino.py
    momentum_schedule / cosine_scheduler)."""
    m = dcfg.ema_momentum if momentum is None else momentum
    teacher = jax.tree.map(lambda t, s: m * t + (1 - m) * s,
                           state["teacher"], student_params)
    return dict(state, teacher=teacher)
