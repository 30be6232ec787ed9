"""The jitted CLIP train step (data/tensor/fsdp-parallel path).

Replaces the reference's train_step orchestration (megatron/training.py:414-501:
zero grad buffers -> forward_backward_func -> DP all-reduce -> clip -> adam)
and open_CLIP's train_one_epoch inner loop (train.py:338-471). Under `jit`
with sharded params/batch, gradient synchronization, the contrastive feature
all-gather, and TP collectives are all inserted by XLA — there is no DDP
wrapper, grad-buffer bucketing (core/distributed.py:301-499), or loss scaling
to port.

Gradient accumulation (megatron's num_microbatches / open_CLIP --accum-freq)
is a `lax.scan` over microbatch slices with summed grads — one compiled step,
no host round-trips.
"""
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from megatron_clip_tpu.losses import ClipLoss
from megatron_clip_tpu.models.clip import LOGIT_SCALE_MAX
from megatron_clip_tpu.parallel.mesh import DATA, FSDP
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array

    @classmethod
    def create(cls, params, tx):
        return cls(params=params, opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32))


def make_train_step(model, tx, *, loss_obj: Optional[Callable] = None,
                    mesh: Optional[Mesh] = None, microbatches: int = 1,
                    teacher=None,
                    jit: bool = True, seed: int = 0) -> Callable:
    """Build `step(state, images, texts) -> (state, metrics)`.

    model: factory.CLIPModel; tx: optax transformation.
    With a mesh, inputs are constrained to batch sharding;
    sequence-parallel activation sharding is a model property
    (dataclasses.replace(model, sequence_parallel=True)), not a step flag.
    teacher: optional `(teacher_model, teacher_params)` for distillation
    (open_CLIP --distill-model/--distill-pretrained, train.py dist_model
    forward + DistillClipLoss). The teacher runs under stop_gradient inside
    the same jit — no separate dispatch.
    """
    loss_obj = loss_obj or ClipLoss()
    # patch dropout (open_CLIP vision_cfg.patch_dropout / FLIP): train-only,
    # keyed by the step counter. The key is BUILT inside the trace (not a
    # captured ArrayImpl closure const — those break jax 0.9's fastpath on
    # donated steps; see training/workload.py _step)
    pd_on = (getattr(model.cfg.vision, "patch_dropout", 0.0) or 0.0) > 0 \
        and not getattr(model, "is_coca", False)

    def _pd_kw(step, mb_index=None):
        if not pd_on:
            return {}
        key = jax.random.fold_in(jax.random.PRNGKey(seed + 1013), step)
        if mb_index is not None:
            key = jax.random.fold_in(key, mb_index)
        return {"patch_dropout_rng": key}

    def loss_fn(params, images, texts, step):
        out = model(params, images, texts, **_pd_kw(step))
        if "logits" in out:
            # CoCa: contrastive + captioning terms (open_CLIP loss.py
            # CoCaLoss; create_loss dispatched the right loss_obj)
            loss = loss_obj(out["image_features"], out["text_features"],
                            out["logits"], out["labels"],
                            out["logit_scale"], output_dict=True)
            return sum(loss.values()), out["logit_scale"]
        if teacher is not None:
            tmodel, tparams = teacher
            tout = jax.lax.stop_gradient(tmodel(tparams, images, texts))
            loss = loss_obj(out["image_features"], out["text_features"],
                            out["logit_scale"],
                            dist_image_features=tout["image_features"],
                            dist_text_features=tout["text_features"],
                            dist_logit_scale=tout["logit_scale"],
                            output_dict=True)
        else:
            loss = loss_obj(out["image_features"], out["text_features"],
                            out["logit_scale"])
        if isinstance(loss, dict):
            loss = sum(loss.values())
        return loss, out["logit_scale"]

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step_fn(state: TrainState, images, texts):
        if mesh is not None:
            bspec = NamedSharding(mesh, P((DATA, FSDP)))
            images = jax.lax.with_sharding_constraint(images, bspec)
            texts = jax.lax.with_sharding_constraint(texts, bspec)

        if microbatches > 1:
            # open_CLIP --accum-freq semantics (train.py:405-443): a first
            # no-grad pass caches all microbatch features, then each
            # microbatch recomputes its own features WITH grad inside the
            # full global-batch loss (cached features substituted for the
            # other blocks). Summing those per-block gradients reconstructs
            # the exact gradient of the full-batch contrastive loss — unlike
            # naive grad accumulation, the negative pool is never shrunk.
            def split(x):
                return x.reshape(microbatches, x.shape[0] // microbatches,
                                 *x.shape[1:])
            ims, txs = split(images), split(texts)

            def collect(i, xs):
                im, tx_ = xs
                out = model(state.params, im, tx_,
                            **_pd_kw(state.step, i))
                return i + 1, (out["image_features"], out["text_features"])

            _, (all_fi, all_ft) = jax.lax.scan(
                collect, jnp.zeros((), jnp.int32), (ims, txs))
            all_fi = jax.lax.stop_gradient(all_fi)   # [M, mb, D]
            all_ft = jax.lax.stop_gradient(all_ft)
            d = all_fi.shape[-1]

            # distillation composes with accum-freq: the teacher's features
            # are grad-free, so one scanned full-batch pass feeds every
            # block's loss (without this the accum path silently trained
            # contrastive-only)
            dist_kw = {}
            if teacher is not None:
                tmodel, tparams = teacher

                def tcollect(c, xs):
                    tout = tmodel(tparams, xs[0], xs[1])
                    return c, (tout["image_features"],
                               tout["text_features"], tout["logit_scale"])

                _, (tfi, tft, tls) = jax.lax.scan(
                    tcollect, jnp.zeros((), jnp.int32), (ims, txs))
                dist_kw = dict(
                    dist_image_features=jax.lax.stop_gradient(
                        tfi.reshape(-1, d)),
                    dist_text_features=jax.lax.stop_gradient(
                        tft.reshape(-1, d)),
                    dist_logit_scale=jax.lax.stop_gradient(tls[-1]),
                    output_dict=True)

            is_coca = getattr(model, "is_coca", False)

            def block_loss(params, im, tx_, i):
                # the same (step, i) dropout key as the cache pass: the
                # recomputed block-i features must equal the cached ones
                out = model(params, im, tx_, **_pd_kw(state.step, i))
                fi = jax.lax.dynamic_update_index_in_dim(
                    all_fi, out["image_features"], i, 0)
                ft = jax.lax.dynamic_update_index_in_dim(
                    all_ft, out["text_features"], i, 0)
                if is_coca:
                    # CoCa under accum: the contrastive term uses the
                    # feature-cache scheme (exact full-batch negatives);
                    # the captioning CE is per-sample decomposable, so
                    # block i contributes its own caption loss / M — the
                    # blocks sum to the exact full-batch CoCaLoss gradient
                    ld = loss_obj(fi.reshape(-1, d), ft.reshape(-1, d),
                                  out["logits"], out["labels"],
                                  out["logit_scale"], output_dict=True)
                    cap = ld.get("caption_loss", 0.0) / microbatches
                    return ld["contrastive_loss"] + cap, \
                        (out["logit_scale"], cap)
                loss = loss_obj(fi.reshape(-1, d), ft.reshape(-1, d),
                                out["logit_scale"], **dist_kw)
                if isinstance(loss, dict):
                    loss = sum(loss.values())
                return loss, (out["logit_scale"],
                              jnp.zeros((), jnp.float32))

            block_grad = jax.value_and_grad(block_loss, has_aux=True)

            def mb(carry, xs):
                i, im, tx_ = xs
                (l, (s, cap)), g = block_grad(state.params, im, tx_, i)
                acc_g, _, acc_cap = carry
                return (jax.tree.map(jnp.add, acc_g, g), l - cap,
                        acc_cap + cap), s

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (grads, loss, cap_total), scales = jax.lax.scan(
                mb, (zeros, jnp.zeros((), jnp.float32),
                     jnp.zeros((), jnp.float32)),
                (jnp.arange(microbatches), ims, txs))
            # metric: full contrastive (any block carries it whole) + the
            # block-summed caption mean
            loss = loss + cap_total
            scale = scales[-1]
            # every block's loss contains the FULL dL/d(logit_scale), so the
            # sum is M x the true gradient — rescale to keep the summed
            # gradient exact (open_CLIP train.py:405-443 has this quirk;
            # here the exactness claim above is made good)
            grads = dict(grads)
            grads["logit_scale"] = grads["logit_scale"] / microbatches
        else:
            (loss, scale), grads = grad_fn(state.params, images, texts,
                                           state.step)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # open_CLIP post-step clamp: logit_scale in [0, ln 100] (train.py:470)
        params = dict(params)
        params["logit_scale"] = jnp.clip(params["logit_scale"], 0.0,
                                         LOGIT_SCALE_MAX)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
        metrics = {
            "loss": loss,
            "logit_scale": scale,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    if jit:
        step_fn = jax.jit(step_fn, donate_argnums=(0,))
    if mesh is not None:
        inner = step_fn

        def step_fn(state, images, texts):  # noqa: F811
            # set_mesh makes bare PartitionSpec sharding constraints (e.g.
            # sequence-parallel hints) resolvable inside the jit trace
            with jax.sharding.set_mesh(mesh):
                return inner(state, images, texts)
    return step_fn


def shard_train_state(state: TrainState, mesh: Mesh, param_specs) -> TrainState:
    """Place params AND optimizer state on the mesh. Optimizer moments inherit
    the param shardings — this is the distributed-optimizer/ZeRO capability
    (megatron/optimizer/distrib_optimizer.py) falling out of fsdp sharding."""
    from megatron_clip_tpu.parallel.sharding import make_sharding_tree

    pshard = make_sharding_tree(mesh, param_specs)
    params = jax.device_put(state.params, pshard)

    # optax state is a pytree mixing param-shaped moment TREES (mu/nu share
    # the params' structure) and scalars. Match whole subtrees structurally
    # first — a (shape, dtype) lookup would give same-shaped params with
    # different PartitionSpecs the first-seen sharding, forcing XLA to
    # reshard those moments against their param every step.
    flat_params, treedef = jax.tree.flatten(state.params)
    flat_shard = jax.tree.leaves(pshard)
    shape_to_shard = {}
    for p, s in zip(flat_params, flat_shard):
        shape_to_shard.setdefault((p.shape, p.dtype), s)

    def place(x):
        if hasattr(x, "shape"):
            s = shape_to_shard.get((x.shape, x.dtype))
            if s is None:
                s = NamedSharding(mesh, P())
            return jax.device_put(x, s)
        return x

    def _is_param_tree(node):
        try:
            return jax.tree.structure(node) == treedef
        except Exception:  # noqa: BLE001 — unhashable/odd nodes
            return False

    opt_state = jax.tree.map(
        lambda node: jax.device_put(node, pshard) if _is_param_tree(node)
        else jax.tree.map(place, node),
        state.opt_state, is_leaf=_is_param_tree)
    step = jax.device_put(state.step, NamedSharding(mesh, P()))
    return TrainState(params=params, opt_state=opt_state, step=step)
