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


def tower_lock_mask(params, *, lock_image: bool = False,
                    image_unlocked_groups: int = 0,
                    lock_text: bool = False,
                    text_unlocked_layers: int = 0,
                    vpp_layout=None):
    """Build a pytree of float multipliers (1.0 = trainable, 0.0 = frozen)
    implementing open_CLIP's LiT-style tower locking
    (open_CLIP/src/open_clip/model.py:263-268, transformer.py:398-429).

    open_CLIP freezes via `requires_grad = False`; the JAX equivalent is a
    mask applied to the *final* optimizer updates (so weight decay is blocked
    too). Group layout matches VisionTransformer.lock: group 0 = patch/token
    embeddings + pos embed + ln_pre, then one group per transformer block
    with the LAST block merged with ln_post/ln_final, and the projection as
    the final group; `unlocked_groups=k` unfreezes the last k groups.

    Because blocks are a stacked pytree (leading dim = layers), partial
    unlocking is a per-layer [L,1,..]-shaped multiplier on each block leaf.
    """
    def n_layers(tower):
        for leaf in jax.tree.leaves(tower.get("blocks", {})):
            return leaf.shape[0]
        return 0

    def tower_mask(tower, unlocked: int):
        L = n_layers(tower)
        if unlocked > 0 and L == 0:
            raise ValueError(
                "unlocked groups/layers need a block-stacked tower "
                "(ViT/TextTransformer); this tower has no 'blocks'")
        # groups: [0]=pre, [1+i]=block_i (i<L-1), [L]=last block + post
        # norms, [L+1]=proj  -> G = L + 2
        G = L + 2
        first_unlocked = G - unlocked  # group indices >= this are trainable

        def leaf_mask(path_names, leaf):
            name = "/".join(path_names)
            if "blocks" in path_names:
                layer_group = jnp.concatenate(
                    [jnp.arange(1, L), jnp.array([L])]) if L > 1 else \
                    jnp.array([L])
                m = (layer_group >= first_unlocked).astype(leaf.dtype)
                return m.reshape((L,) + (1,) * (leaf.ndim - 1))
            if "proj" in name:
                g = G - 1
            elif any(k in name for k in ("ln_post", "ln_final")):
                g = L
            else:  # embeddings, cls, pos_embed, ln_pre, conv stems, ...
                g = 0
            return jnp.asarray(1.0 if g >= first_unlocked else 0.0, leaf.dtype)

        return jax.tree_util.tree_map_with_path(
            lambda p, x: leaf_mask(
                [str(getattr(q, "key", getattr(q, "idx", ""))) for q in p], x),
            tower)

    mask = {}
    for key, val in params.items():
        if key == "visual" and lock_image:
            mask[key] = tower_mask(val, image_unlocked_groups)
        elif key == "text" and lock_text:
            mask[key] = tower_mask(val, text_unlocked_layers)
        else:
            mask[key] = jax.tree.map(lambda x: jnp.asarray(1.0, x.dtype), val)
    if vpp_layout is not None:
        # the stacked blocks in `params` are in vpp_arrange PHYSICAL order
        # (interleaved pipeline's zero-copy placement) — the per-layer group
        # vector above was computed in LOGICAL layer order, so permute it
        # the same way; without this --lock-*-unlocked-layers freezes the
        # wrong layers under pp>1, vpp>1
        from megatron_clip_tpu.parallel.pipeline import vpp_arrange
        pp_, vpp_ = vpp_layout
        for key, locked in (("visual", lock_image), ("text", lock_text)):
            if locked and isinstance(mask.get(key), dict) \
                    and "blocks" in mask[key]:
                mask[key] = dict(mask[key], blocks=vpp_arrange(
                    mask[key]["blocks"], pp_, vpp_))
    return mask


def apply_update_mask(mask) -> optax.GradientTransformation:
    """Multiply final updates by `mask`. Placed LAST in the optax chain so a
    0.0 entry blocks both the adam step and its weight-decay term — the
    requires_grad=False equivalent."""
    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        return jax.tree.map(lambda u, m: u * m, updates, mask), state

    return optax.GradientTransformation(init, update)


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


def megatron_lr(base_lr: float, warmup: int, total_steps: int, *,
                decay_style: str = "cosine", min_lr: float = 0.0,
                decay_steps: int = None) -> Callable[[int], float]:
    """megatron OptimizerParamScheduler.get_lr semantics
    (megatron/optimizer_param_scheduler.py): linear warmup, then
    constant | linear | cosine | inverse-square-root decay to min_lr over
    `decay_steps` (--lr-decay-iters; defaults to the full run)."""
    decay_steps = decay_steps or total_steps
    span = max(decay_steps - warmup, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1) / max(warmup, 1)
        prog = jnp.clip((step - warmup) / span, 0.0, 1.0)
        if decay_style == "constant":
            dec = jnp.full_like(prog, base_lr)
        elif decay_style == "linear":
            dec = min_lr + (base_lr - min_lr) * (1.0 - prog)
        elif decay_style == "cosine":
            dec = min_lr + 0.5 * (base_lr - min_lr) * \
                (1 + jnp.cos(jnp.pi * prog))
        elif decay_style == "inverse-square-root":
            # lr = max_lr * sqrt(warmup) / sqrt(step), floored at min_lr
            dec = jnp.maximum(
                min_lr,
                base_lr * jnp.sqrt(float(max(warmup, 1)))
                / jnp.sqrt(jnp.maximum(step, 1.0)))
            dec = jnp.minimum(dec, base_lr)
        else:
            raise ValueError(f"unknown lr decay style {decay_style!r}")
        return jnp.where(step < warmup, warm, dec)
    return schedule


def megatron_wd(start_wd: float, end_wd: float, total_steps: int,
                incr_style: str = "constant") -> Callable[[int], float]:
    """megatron OptimizerParamScheduler.get_wd: weight decay ramps from
    start to end over the run (--weight-decay-incr-style constant | linear
    | cosine, --start-weight-decay/--end-weight-decay)."""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        p = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
        if incr_style == "constant":
            coeff = jnp.ones_like(p)
            return start_wd * coeff
        if incr_style == "linear":
            coeff = p
        elif incr_style == "cosine":
            coeff = 0.5 * (jnp.cos(jnp.pi * (1.0 - p)) + 1.0)
        else:
            raise ValueError(f"unknown wd incr style {incr_style!r}")
        return start_wd + coeff * (end_wd - start_wd)
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


def scale_by_adam_lowbits(b1: float = 0.9, b2: float = 0.999,
                          eps: float = 1e-8, mu_dtype=jnp.bfloat16,
                          nu_dtype=jnp.bfloat16):
    """Adam moment tracking with BOTH moments stored in a reduced dtype.

    optax.scale_by_adam only reduces mu; the second moment nu is the same
    size as the params and is what gates billion-param rungs on one 16G
    chip (1.3b: nu fp32 = 5.3 GB). bf16 nu costs ~0.4% relative error on
    the variance (8 mantissa bits) -> ~0.2% on the update scale, with the
    update math still in fp32 — the single-chip analogue of megatron's
    --use-distributed-optimizer sharding the fp32 state across ranks
    (megatron/optimizer/distrib_optimizer.py)."""

    def init(params):
        mu = jax.tree.map(lambda p: jnp.zeros_like(p, dtype=mu_dtype), params)
        nu = jax.tree.map(lambda p: jnp.zeros_like(p, dtype=nu_dtype), params)
        return optax.ScaleByAdamState(count=jnp.zeros([], jnp.int32),
                                      mu=mu, nu=nu)

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        c = count.astype(jnp.float32)

        def upd(g, mu, nu):
            g32 = g.astype(jnp.float32)
            mu32 = b1 * mu.astype(jnp.float32) + (1 - b1) * g32
            nu32 = b2 * nu.astype(jnp.float32) + (1 - b2) * g32 * g32
            mu_hat = mu32 / (1 - b1 ** c)
            nu_hat = nu32 / (1 - b2 ** c)
            step = mu_hat / (jnp.sqrt(nu_hat) + eps)
            return step.astype(g.dtype), mu32.astype(mu_dtype), \
                nu32.astype(nu_dtype)

        out = jax.tree.map(upd, updates, state.mu, state.nu)
        steps = jax.tree.map(lambda t: t[0], out, is_leaf=lambda t:
                             isinstance(t, tuple))
        mu = jax.tree.map(lambda t: t[1], out, is_leaf=lambda t:
                          isinstance(t, tuple))
        nu = jax.tree.map(lambda t: t[2], out, is_leaf=lambda t:
                          isinstance(t, tuple))
        return steps, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def adamw_lowbits(learning_rate, *, b1: float = 0.9, b2: float = 0.999,
                  eps: float = 1e-8, weight_decay: float = 0.0,
                  mu_dtype=jnp.bfloat16, nu_dtype=jnp.bfloat16,
                  mask=None):
    """AdamW with bf16 moment storage (see scale_by_adam_lowbits)."""
    return optax.chain(
        scale_by_adam_lowbits(b1=b1, b2=b2, eps=eps, mu_dtype=mu_dtype,
                              nu_dtype=nu_dtype),
        optax.add_decayed_weights(weight_decay, mask=mask),
        optax.scale_by_learning_rate(learning_rate),
    )


def make_optimizer(params, lr: Callable, *, beta1: float = 0.9,
                   beta2: float = 0.98, eps: float = 1e-6,
                   weight_decay: float = 0.2,
                   grad_clip_norm: Optional[float] = None,
                   moment_dtype=None, nu_dtype=None,
                   lock_mask=None, optimizer: str = "adam",
                   sgd_momentum: float = 0.9,
                   weight_decay_schedule: Optional[Callable] = None,
                   ) -> optax.GradientTransformation:
    """AdamW with the CLIP training recipe defaults (open_CLIP params.py:
    beta2=0.98, eps=1e-6, wd=0.2) and megatron-style global-norm clipping.

    optimizer="sgd" switches to momentum SGD with decoupled weight decay
    (megatron --optimizer sgd / --sgd-momentum, optimizer/__init__.py).

    moment_dtype: storage dtype for the first moment (optax mu_dtype).
    bfloat16 halves the mu read/write stream in the fused update — the
    update math still runs in fp32 (megatron's Float16Optimizer keeps fp32
    master state; here only mu storage is reduced, variance stays fp32).
    nu_dtype: bf16 second moment too (adamw_lowbits) — fully-bf16 state,
    what fits a 1.3b-param model on one 16G chip."""
    chain = []
    if grad_clip_norm:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    if weight_decay_schedule is not None and nu_dtype is not None:
        raise ValueError("--weight-decay-incr-style does not compose with "
                         "--nu-dtype bf16 (adamw_lowbits has no injected "
                         "hyperparameters)")
    if weight_decay_schedule is not None and optimizer != "sgd":
        # scheduled weight decay (megatron --weight-decay-incr-style):
        # inject_hyperparams re-evaluates callable args per step
        chain.append(optax.inject_hyperparams(
            optax.adamw, static_args="mask")(
                learning_rate=lr, b1=beta1, b2=beta2, eps=eps,
                weight_decay=weight_decay_schedule,
                mask=_no_decay_mask(params)))
    elif optimizer == "sgd":
        if weight_decay_schedule is not None:
            chain.append(optax.inject_hyperparams(
                optax.add_decayed_weights, static_args="mask")(
                    weight_decay=weight_decay_schedule,
                    mask=_no_decay_mask(params)))
        else:
            chain.append(optax.add_decayed_weights(
                weight_decay, mask=_no_decay_mask(params)))
        chain.append(optax.sgd(learning_rate=lr, momentum=sgd_momentum))
    elif nu_dtype is not None:
        chain.append(adamw_lowbits(
            learning_rate=lr, b1=beta1, b2=beta2, eps=eps,
            weight_decay=weight_decay,
            mu_dtype=moment_dtype or jnp.bfloat16, nu_dtype=nu_dtype,
            mask=_no_decay_mask(params)))
    else:
        chain.append(optax.adamw(learning_rate=lr, b1=beta1, b2=beta2,
                                 eps=eps, weight_decay=weight_decay,
                                 mu_dtype=moment_dtype,
                                 mask=_no_decay_mask(params)))
    if lock_mask is not None:
        chain.append(apply_update_mask(lock_mask))
    return optax.chain(*chain)
