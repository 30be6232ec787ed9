"""EsViT: efficient self-supervised vision transformer (swin + DINO with a
region-level objective).

Covers the reference's esvit backbone/workload (megatron/model/vision/
esvit_swin_backbone.py ~849 LoC): a swin student/teacher pair trained with
the DINO cross-entropy on the pooled (view-level) projections PLUS the
region-level term — per-token projections of one view matched against the
best-aligned tokens of the other view. Teacher is the EMA of the student;
teacher outputs are sharpened+centered as in DINO.
"""
from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp

from megatron_clip_tpu.models.swin import SwinCfg, init_swin, apply_swin


@dataclass(frozen=True)
class EsViTCfg:
    swin: SwinCfg = field(default_factory=lambda: SwinCfg())
    out_dim: int = 1024
    region_out_dim: int = 1024
    teacher_temp: float = 0.04
    student_temp: float = 0.1
    ema_decay: float = 0.996
    region_weight: float = 1.0


def _init_head(key, d_in, d_out, dtype):
    k1, k2 = jax.random.split(key)
    hid = 2048
    return {
        "w1": (0.02 * jax.random.normal(k1, (d_in, hid))).astype(dtype),
        "b1": jnp.zeros((hid,), dtype=dtype),
        "w2": (0.02 * jax.random.normal(k2, (hid, d_out))).astype(dtype),
        "b2": jnp.zeros((d_out,), dtype=dtype),
    }


def _apply_head(h, x):
    x = x @ h["w1"].astype(x.dtype) + h["b1"].astype(x.dtype)
    x = jax.nn.gelu(x)
    return x @ h["w2"].astype(x.dtype) + h["b2"].astype(x.dtype)


def init_esvit(key, cfg: EsViTCfg, dtype=jnp.float32):
    kb, kh, kr = jax.random.split(key, 3)
    student = {
        "backbone": init_swin(kb, cfg.swin, num_classes=0, dtype=dtype),
        "head": _init_head(kh, cfg.swin.num_features, cfg.out_dim, dtype),
        "region_head": _init_head(kr, cfg.swin.num_features,
                                  cfg.region_out_dim, dtype),
    }
    state = {
        "teacher": jax.tree.map(jnp.copy, student),
        "center": jnp.zeros((cfg.out_dim,), jnp.float32),
        "region_center": jnp.zeros((cfg.region_out_dim,), jnp.float32),
    }
    return student, state


def _forward(net, images, cfg: EsViTCfg, compute_dtype):
    pooled, tokens = apply_swin(net["backbone"], images, cfg.swin,
                                compute_dtype=compute_dtype,
                                return_tokens=True)
    view = _apply_head(net["head"], pooled)
    region = _apply_head(net["region_head"], tokens)
    return view.astype(jnp.float32), region.astype(jnp.float32)


def esvit_loss(student, state, view1, view2, cfg: EsViTCfg, *,
               compute_dtype=jnp.float32):
    """Cross-view DINO CE on the pooled projections + the region term:
    each student token of one view matches the most-similar teacher token
    of the other view (EsViT's dense correspondence)."""
    s1v, s1r = _forward(student, view1, cfg, compute_dtype)
    s2v, s2r = _forward(student, view2, cfg, compute_dtype)
    t1v, t1r = _forward(state["teacher"], view1, cfg, compute_dtype)
    t2v, t2r = _forward(state["teacher"], view2, cfg, compute_dtype)
    t1v, t2v = jax.lax.stop_gradient(t1v), jax.lax.stop_gradient(t2v)
    t1r, t2r = jax.lax.stop_gradient(t1r), jax.lax.stop_gradient(t2r)

    def view_ce(s, t):
        tprob = jax.nn.softmax((t - state["center"]) / cfg.teacher_temp, -1)
        slog = jax.nn.log_softmax(s / cfg.student_temp, -1)
        return -(tprob * slog).sum(-1).mean()

    view_loss = 0.5 * (view_ce(s1v, t2v) + view_ce(s2v, t1v))

    def region_ce(s_tok, t_tok):
        # best-aligned teacher token per student token (cosine matching)
        sn = s_tok / (jnp.linalg.norm(s_tok, axis=-1, keepdims=True) + 1e-6)
        tn = t_tok / (jnp.linalg.norm(t_tok, axis=-1, keepdims=True) + 1e-6)
        sim = jnp.einsum("bqd,bkd->bqk", sn, tn)
        match = jnp.argmax(sim, axis=-1)                   # [B, Nq]
        t_sel = jnp.take_along_axis(t_tok, match[..., None], axis=1)
        tprob = jax.nn.softmax(
            (t_sel - state["region_center"]) / cfg.teacher_temp, -1)
        slog = jax.nn.log_softmax(s_tok / cfg.student_temp, -1)
        return -(tprob * slog).sum(-1).mean()

    region_loss = 0.5 * (region_ce(s1r, t2r) + region_ce(s2r, t1r))
    total = view_loss + cfg.region_weight * region_loss
    batch_center = 0.5 * (t1v.mean(0) + t2v.mean(0))
    region_batch_center = 0.5 * (t1r.mean((0, 1)) + t2r.mean((0, 1)))
    return total, (view_loss, region_loss, batch_center, region_batch_center)


def esvit_update_teacher(state, student, cfg: EsViTCfg, batch_center,
                         region_batch_center, center_momentum: float = 0.9):
    teacher = jax.tree.map(
        lambda t, s: cfg.ema_decay * t + (1 - cfg.ema_decay) * s,
        state["teacher"], student)
    return {
        "teacher": teacher,
        "center": center_momentum * state["center"]
        + (1 - center_momentum) * batch_center,
        "region_center": center_momentum * state["region_center"]
        + (1 - center_momentum) * region_batch_center,
    }
