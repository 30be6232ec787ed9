"""Mixture-of-Experts switch MLP (top-1 routing).

Replaces megatron's SwitchMLP (megatron/model/transformer.py:170-280,
megatron/core/transformer/switch_mlp.py:33) and its expert-parallel groups
(parallel_state.py:516-555, `--num-experts`, `--expert-model-parallel-size`).

TPU-native design: dense one-hot dispatch/combine einsums (the Switch
Transformer formulation) instead of gather/scatter over ranks — under `jit`
with the expert axis of the weights sharded over the mesh (see
`moe_param_specs`), XLA lowers the dispatch einsum to an all-to-all over ICI,
which *is* expert parallelism; capacity limiting keeps shapes static.

Routing: softmax top-1 with either an auxiliary load-balance loss (Switch
Transformer) or sinkhorn balancing (megatron's choice, switch_mlp.py
sinkhorn routine).
"""
from typing import Tuple

import jax
import jax.numpy as jnp

from megatron_clip_tpu.ops.activations import get_act


def sinkhorn(cost, iters: int = 8):
    """Sinkhorn normalization over [N, E] routing scores (megatron
    switch_mlp.py:sinkhorn, fixed iteration count for static shapes)."""
    cost = jnp.exp(cost.astype(jnp.float32))
    d0 = jnp.ones(cost.shape[0], jnp.float32)
    d1 = jnp.ones(cost.shape[1], jnp.float32)
    eps = 1e-8
    for _ in range(iters):
        d0 = (1.0 / cost.shape[0]) / (jnp.sum(d1[None] * cost, 1) + eps)
        d1 = (1.0 / cost.shape[1]) / (jnp.sum(d0[:, None] * cost, 0) + eps)
    return d1[None] * cost * d0[:, None]


def init_switch_mlp(key, width: int, hidden: int, num_experts: int,
                    dtype=jnp.float32, use_bias: bool = True,
                    swiglu: bool = False):
    """swiglu doubles the expert fc width (value + gate halves), matching
    the dense MLP's megatron --swiglu sizing (transformer.py:94-106)."""
    kr, k1, k2 = jax.random.split(key, 3)
    fc_std = (2 * width) ** -0.5
    proj_std = width ** -0.5
    fc_out = hidden * (2 if swiglu else 1)
    p = {
        "router": (jax.random.normal(kr, (width, num_experts))
                   * width ** -0.5).astype(dtype),
        "w1": (jax.random.normal(k1, (num_experts, width, fc_out))
               * fc_std).astype(dtype),
        "w2": (jax.random.normal(k2, (num_experts, hidden, width))
               * proj_std).astype(dtype),
    }
    if use_bias:
        p["b1"] = jnp.zeros((num_experts, fc_out), dtype=dtype)
        p["b2"] = jnp.zeros((num_experts, width), dtype=dtype)
    return p


def apply_switch_mlp(params, x, *, act: str = "gelu",
                     capacity_factor: float = 1.25,
                     router_mode: str = "sinkhorn",
                     train: bool = True) -> Tuple[jax.Array, jax.Array]:
    """x: [B, S, W] -> (y [B, S, W], aux_loss scalar).

    Tokens over capacity are dropped (residual connection carries them),
    matching switch-style capacity semantics.
    """
    b, s, w = x.shape
    n = b * s
    e = params["router"].shape[1]
    xt = x.reshape(n, w)

    logits = (xt.astype(jnp.float32) @ params["router"].astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)                  # [N, E]
    if router_mode == "sinkhorn" and train:
        # route by sinkhorn-balanced scores, gate by plain softmax prob
        route = sinkhorn(logits)
        expert = jnp.argmax(route, axis=-1)
    else:
        expert = jnp.argmax(probs, axis=-1)
    gate = jnp.take_along_axis(probs, expert[:, None], axis=-1)[:, 0]  # [N]

    if not train:
        # Eval = megatron SwitchMLP semantics exactly: every token through
        # its argmax expert, NO capacity drops (the capacity queue below is
        # batch-dependent — a token's fate would change with what else is in
        # the batch). All-experts compute (E x the MLP flops) keeps shapes
        # static, but scanned one expert at a time so the live activation is
        # [N, H] — a dense [N, E, H] einsum is E x that and OOMs configs
        # whose TRAINING fits (e.g. 64 experts).
        onehot = jax.nn.one_hot(expert, e, dtype=jnp.float32)

        def one_expert(y, packed):
            ei, w1, w2, b1, b2 = packed
            h = xt @ w1.astype(x.dtype)
            if b1 is not None:
                h = h + b1.astype(x.dtype)
            if act == "swiglu":
                from megatron_clip_tpu.ops.activations import \
                    swiglu as _swiglu
                h = _swiglu(h)
            else:
                h = get_act(act)(h)
            o = h @ w2.astype(x.dtype)
            if b2 is not None:
                o = o + b2.astype(x.dtype)
            sel = jnp.where(expert == ei, gate, 0.0).astype(x.dtype)
            return y + sel[:, None] * o, None

        xs = (jnp.arange(e), params["w1"], params["w2"],
              params.get("b1"), params.get("b2"))
        y, _ = jax.lax.scan(one_expert, jnp.zeros_like(xt), xs)
        frac_tokens = jnp.mean(onehot, axis=0)
        aux = e * jnp.sum(frac_tokens * jnp.mean(probs, axis=0))
        return y.reshape(b, s, w), aux

    capacity = max(1, int(capacity_factor * n / e))
    onehot = jax.nn.one_hot(expert, e, dtype=jnp.float32)    # [N, E]
    # position of each token within its expert queue
    pos = (jnp.cumsum(onehot, axis=0) - 1.0) * onehot        # [N, E]
    keep = (pos < capacity).astype(jnp.float32) * onehot
    pos_clamped = jnp.minimum(pos, capacity - 1).astype(jnp.int32)
    # dispatch tensor [N, E, C]
    dispatch = keep[..., None] * jax.nn.one_hot(pos_clamped, capacity,
                                                dtype=jnp.float32)
    combine = dispatch * gate[:, None, None]

    xe = jnp.einsum("nec,nw->ecw", dispatch.astype(x.dtype), xt)   # [E, C, W]
    h = jnp.einsum("ecw,ewh->ech", xe, params["w1"].astype(x.dtype))
    if "b1" in params:
        h = h + params["b1"].astype(x.dtype)[:, None]
    if act == "swiglu":
        from megatron_clip_tpu.ops.activations import swiglu as _swiglu
        h = _swiglu(h)   # splits the doubled fc width into value & gate
    else:
        h = get_act(act)(h)
    ye = jnp.einsum("ech,ehw->ecw", h, params["w2"].astype(x.dtype))
    if "b2" in params:
        ye = ye + params["b2"].astype(x.dtype)[:, None]
    y = jnp.einsum("nec,ecw->nw", combine.astype(x.dtype), ye)     # [N, W]

    # Switch Transformer aux load-balance loss: E * sum(frac_tokens * frac_prob)
    frac_tokens = jnp.mean(onehot, axis=0)
    frac_probs = jnp.mean(probs, axis=0)
    aux = e * jnp.sum(frac_tokens * frac_probs)
    return y.reshape(b, s, w), aux


def moe_param_specs(num_experts: int, stacked: bool = True):
    """PartitionSpecs: expert axis over `fsdp` (megatron's data-modulo-expert
    EP group), hidden dims tensor-parallel — together the
    tensor_and_expert_parallel layout (parallel_state.py:699)."""
    from jax.sharding import PartitionSpec as P

    def spec(*dims):
        return P(*( (None,) if stacked else () ), *dims)
    return {
        "router": spec(None, None),
        "w1": spec("fsdp", None, "tensor"),
        "b1": spec("fsdp", "tensor"),
        "w2": spec("fsdp", "tensor", None),
        "b2": spec("fsdp", None),
    }
