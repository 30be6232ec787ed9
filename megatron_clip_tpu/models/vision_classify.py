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
    out_dim: int = 4096              # projector output (dino head)
    teacher_temp: float = 0.04
    student_temp: float = 0.1
    center_momentum: float = 0.9
    ema_momentum: float = 0.996


def init_dino(key, vcfg: VisionCfg, dcfg: DinoCfg, dtype=jnp.float32):
    kb, kh = jax.random.split(key)
    student = {
        "backbone": init_vit(kb, vcfg, vcfg.width, dtype=dtype),
        "head": {"w": (vcfg.width ** -0.5 * jax.random.normal(
            kh, (vcfg.width, dcfg.out_dim))).astype(dtype)},
    }
    student["backbone"]["proj"] = jnp.eye(vcfg.width, dtype=dtype)
    teacher = jax.tree.map(jnp.copy, student)
    center = jnp.zeros((dcfg.out_dim,), jnp.float32)
    return {"student": student, "teacher": teacher, "center": center}


def _dino_head(net, images, vcfg, compute_dtype):
    f = apply_vit(net["backbone"], images, vcfg, vcfg.width,
                  compute_dtype=compute_dtype)
    return (f @ net["head"]["w"].astype(f.dtype)).astype(jnp.float32)


def dino_loss(student_params, state, views1, views2, vcfg: VisionCfg,
              dcfg: DinoCfg, *, compute_dtype=jnp.bfloat16):
    """Cross-view DINO loss: student(view_a) matches sharpened+centered
    teacher(view_b), symmetrized (dino.py loss semantics)."""
    teacher, center = state["teacher"], state["center"]
    s1 = _dino_head(student_params, views1, vcfg, compute_dtype)
    s2 = _dino_head(student_params, views2, vcfg, compute_dtype)
    t1 = jax.lax.stop_gradient(_dino_head(teacher, views1, vcfg, compute_dtype))
    t2 = jax.lax.stop_gradient(_dino_head(teacher, views2, vcfg, compute_dtype))

    def ce(s, t):
        pt = jax.nn.softmax((t - center) / dcfg.teacher_temp, axis=-1)
        logps = jax.nn.log_softmax(s / dcfg.student_temp, axis=-1)
        return -(pt * logps).sum(-1).mean()

    loss = 0.5 * (ce(s1, t2) + ce(s2, t1))
    batch_center = 0.5 * (t1.mean(0) + t2.mean(0))
    new_center = dcfg.center_momentum * center \
        + (1 - dcfg.center_momentum) * batch_center
    return loss, new_center


def dino_update_teacher(state, student_params, dcfg: DinoCfg):
    """EMA teacher update (dino.py momentum schedule, fixed momentum here)."""
    m = dcfg.ema_momentum
    teacher = jax.tree.map(lambda t, s: m * t + (1 - m) * s,
                           state["teacher"], student_params)
    return dict(state, teacher=teacher)
