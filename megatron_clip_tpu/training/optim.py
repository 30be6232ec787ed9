"""Optimizer + LR schedules.

Replaces the reference's two optimizer stacks:
  - open_CLIP: AdamW with gain/bias params excluded from weight decay
    (main.py:302-317), cosine/const/const-cooldown schedules (scheduler.py).
  - megatron: apex FusedAdam wrapped in Float16Optimizer with dynamic loss
    scaling + global-norm clip (optimizer/optimizer.py, clip_grads.py:17,
    grad_scaler.py). On TPU: optax adamw (XLA fuses the update), bf16 makes
    loss scaling unnecessary, global-norm clip is optax.clip_by_global_norm,
    and the distributed-optimizer ZeRO-1 sharding (distrib_optimizer.py:995LoC)
    is simply the optimizer state inheriting the params' fsdp sharding.
"""
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax


def _no_decay_mask(params):
    """True = apply weight decay. Matches open_CLIP main.py's param grouping
    exactly: `exclude = p.ndim < 2 or 'bn'/'ln'/'bias'/'logit_scale' in name`.
    Note 2-D positional embeddings therefore DO get weight decay (they are
    ndim>=2 and not name-excluded in open_CLIP)."""
    def rule(path, leaf):
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", ""))) for p in path)
        if leaf.ndim < 2:
            return False
        if "logit_scale" in name:
            return False
        return True
    return jax.tree_util.tree_map_with_path(rule, params)


def cosine_lr(base_lr: float, warmup: int, total_steps: int,
              min_lr: float = 0.0) -> Callable[[int], float]:
    """open_CLIP scheduler.py cosine_lr semantics: linear warmup then cosine."""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1) / max(warmup, 1)
        prog = (step - warmup) / max(total_steps - warmup, 1)
        cos = min_lr + 0.5 * (base_lr - min_lr) * (1 + jnp.cos(jnp.pi * prog))
        return jnp.where(step < warmup, warm, cos)
    return schedule


def const_lr(base_lr: float, warmup: int) -> Callable[[int], float]:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return jnp.where(step < warmup, base_lr * (step + 1) / max(warmup, 1),
                         base_lr)
    return schedule


def const_lr_cooldown(base_lr: float, warmup: int, total_steps: int,
                      cooldown_steps: int, cooldown_power: float = 1.0,
                      cooldown_end_lr: float = 0.0) -> Callable[[int], float]:
    """open_CLIP const-cooldown (scheduler.py): const then polynomial decay."""
    start = total_steps - cooldown_steps
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1) / max(warmup, 1)
        decay_prog = jnp.clip((step - start) / max(cooldown_steps, 1), 0.0, 1.0)
        decay = cooldown_end_lr + (base_lr - cooldown_end_lr) * \
            (1 - decay_prog) ** cooldown_power
        out = jnp.where(step < warmup, warm, base_lr)
        return jnp.where(step >= start, decay, out)
    return schedule


def make_optimizer(params, lr: Callable, *, beta1: float = 0.9,
                   beta2: float = 0.98, eps: float = 1e-6,
                   weight_decay: float = 0.2,
                   grad_clip_norm: Optional[float] = None,
                   moment_dtype=None) -> optax.GradientTransformation:
    """AdamW with the CLIP training recipe defaults (open_CLIP params.py:
    beta2=0.98, eps=1e-6, wd=0.2) and megatron-style global-norm clipping.

    moment_dtype: storage dtype for the first moment (optax mu_dtype).
    bfloat16 halves the mu read/write stream in the fused update — the
    update math still runs in fp32 (megatron's Float16Optimizer keeps fp32
    master state; here only mu storage is reduced, variance stays fp32)."""
    chain = []
    if grad_clip_norm:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    chain.append(optax.adamw(learning_rate=lr, b1=beta1, b2=beta2, eps=eps,
                             weight_decay=weight_decay,
                             mu_dtype=moment_dtype,
                             mask=_no_decay_mask(params)))
    return optax.chain(*chain)
