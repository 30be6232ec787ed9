"""Pre-LN transformer stack as pure functions over param pytrees.

Design: instead of the reference's nn.Module hierarchy
(open_CLIP/src/open_clip/transformer.py:190-323 ResidualAttentionBlock/
Transformer; megatron/model/transformer.py:1402 ParallelTransformer), each
layer is a dict of arrays and the stack is a *stacked* pytree (leading axis =
layer) consumed by `lax.scan`. This gives O(1) compile time in depth, makes
pipeline-stage slicing a pure array slice, and lets tensor-parallel sharding
be expressed as PartitionSpecs on the stacked leaves (see parallel/sharding.py).

Initialization follows open_CLIP's CLIP.init_parameters scheme
(open_CLIP/src/open_clip/model.py:
    proj_std = width**-0.5 * (2*layers)**-0.5, attn_std = width**-0.5,
    fc_std = (2*width)**-0.5), biases zero.
"""
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from megatron_clip_tpu.config import TransformerCfg
from megatron_clip_tpu.ops import multi_head_attention, layer_norm, rms_norm
from megatron_clip_tpu.ops.activations import bias_act, swiglu


# ------------------------------- init --------------------------------------

def init_linear(key, d_in: int, d_out: int, std: float, bias: bool = True,
                dtype=jnp.float32):
    w = jax.random.normal(key, (d_in, d_out), dtype=jnp.float32) * std
    p = {"w": w.astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype=dtype)
    return p


def init_layer_norm(width: int, dtype=jnp.float32, norm: str = "layernorm"):
    p = {"scale": jnp.ones((width,), dtype=dtype)}
    if norm == "layernorm":
        p["bias"] = jnp.zeros((width,), dtype=dtype)
    return p


def apply_norm(p, x, norm: str = "layernorm"):
    if norm == "rmsnorm":
        return rms_norm(x, p["scale"])
    return layer_norm(x, p["scale"], p["bias"])


def init_block(key, cfg: TransformerCfg, dtype=jnp.float32):
    """One pre-LN residual block: ln_1 -> attn -> (+) -> ln_2 -> mlp -> (+)."""
    w = cfg.width
    if cfg.init_std is not None:
        # megatron init_method_normal(--init-method-std) for inputs +
        # scaled_init_method (std / sqrt(2L)) for the residual-output
        # projections (megatron/model/utils.py)
        attn_std = fc_std = cfg.init_std
        proj_std = cfg.init_std * ((2 * cfg.layers) ** -0.5)
    else:
        # open_CLIP transformer init scheme (transformer.py init_parameters)
        proj_std = (w ** -0.5) * ((2 * cfg.layers) ** -0.5)
        attn_std = w ** -0.5
        fc_std = (2 * w) ** -0.5
    k_qkv, k_o, k_fc, k_proj = jax.random.split(key, 4)
    mlp_in = cfg.mlp_hidden * (2 if cfg.act == "swiglu" else 1)
    hkv = cfg.kv_heads or cfg.heads
    qkv_out = (cfg.heads + 2 * hkv) * cfg.head_dim
    block = {
        "ln_1": init_layer_norm(w, dtype, cfg.norm),
        "attn": {
            "wqkv": (jax.random.normal(k_qkv, (w, qkv_out)) * attn_std).astype(dtype),
            # wo input is heads*head_dim — equal to w unless --kv-channels
            # overrides the per-head dim (megatron kv_channels)
            "wo": (jax.random.normal(
                k_o, (cfg.heads * cfg.head_dim, w)) * proj_std).astype(dtype),
        },
        "ln_2": init_layer_norm(w, dtype, cfg.norm),
        "mlp": {
            "w1": (jax.random.normal(k_fc, (w, mlp_in)) * fc_std).astype(dtype),
            "w2": (jax.random.normal(k_proj, (cfg.mlp_hidden, w)) * proj_std).astype(dtype),
        },
    }
    if cfg.num_experts:
        from megatron_clip_tpu.ops.moe import init_switch_mlp
        del block["mlp"]
        block["moe"] = init_switch_mlp(k_fc, w, cfg.mlp_hidden,
                                       cfg.num_experts, dtype, cfg.use_bias,
                                       swiglu=cfg.act == "swiglu")
    if cfg.use_bias:
        block["attn"]["bqkv"] = jnp.zeros((qkv_out,), dtype=dtype)
        block["attn"]["bo"] = jnp.zeros((w,), dtype=dtype)
        if "mlp" in block:
            block["mlp"]["b1"] = jnp.zeros((mlp_in,), dtype=dtype)
            block["mlp"]["b2"] = jnp.zeros((w,), dtype=dtype)
    if cfg.ls_init_value is not None:
        block["ls_1"] = jnp.full((w,), cfg.ls_init_value, dtype=dtype)
        block["ls_2"] = jnp.full((w,), cfg.ls_init_value, dtype=dtype)
    return block


def init_transformer(key, cfg: TransformerCfg, dtype=jnp.float32):
    """Returns stacked blocks: every leaf has leading axis = cfg.layers."""
    keys = jax.random.split(key, cfg.layers)
    blocks = [init_block(k, cfg, dtype) for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)


# ------------------------------- apply -------------------------------------

def _sp_constraint(x, cfg):
    """Sequence/context parallelism of between-block activations.

    - Sequence parallelism (Korthikanti-style; megatron --sequence-parallel,
      SURVEY §2.1): activations sharded along seq over the `tensor` axis, so
      LN/dropout/residual work is 1/tp per device; XLA inserts the all-gather
      before each TP matmul and the reduce-scatter after the row-parallel one
      — exactly mappings.py:246-341.
    - Context parallelism (megatron --context-parallel-size, plumbing-only in
      the reference): activations sharded along seq over the `context` axis;
      attention itself runs as a ppermute ring (ops/ring_attention.py).
    Both compose: seq shards over (context, tensor). Requires an active mesh
    (jax.sharding.set_mesh) at trace time."""
    from megatron_clip_tpu.parallel.mesh import CONTEXT, DATA, FSDP, TENSOR
    seq_axes = []
    if cfg.context_parallel:
        seq_axes.append(CONTEXT)
    if cfg.sequence_parallel:
        seq_axes.append(TENSOR)
    if not seq_axes:
        return x
    amesh = jax.sharding.get_abstract_mesh()
    names = set(amesh.axis_names) if amesh is not None else set()
    # axes manualized by an enclosing shard_map (cp inside the pipeline's
    # stage region) cannot appear in sharding constraints — the data is
    # already the local shard there
    from megatron_clip_tpu.parallel.mesh import manual_axes
    names -= manual_axes()
    seq_axes = [a for a in seq_axes if a in names]
    batch_axes = tuple(a for a in (DATA, FSDP) if a in names)
    if not seq_axes:
        return x
    from jax.sharding import PartitionSpec as P
    return jax.lax.with_sharding_constraint(
        x, P(batch_axes or None, tuple(seq_axes), None))


def dropout(x, rate: float, key):
    """Inverted dropout. Under jit with sharded activations each device
    draws its shard of one global mask, so the reference's per-TP-rank RNG
    fork (megatron/core/tensor_parallel/random.py:69-258) has no analogue to
    port — SPMD gives consistent masks by construction. Deterministic under
    remat: the key is an input, recompute replays the same bits."""
    if rate == 0.0 or key is None:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros((), x.dtype))


def apply_block(block, x, cfg: TransformerCfg, *, causal: bool = False,
                bias: Optional[jax.Array] = None, rope=None, rng=None,
                rel_index: Optional[jax.Array] = None):
    """x: [B, S, W] in compute dtype. `rng`: per-layer PRNG key enabling
    dropout (training); None = eval / dropout-free. Sites match megatron:
    attention-prob dropout (CoreAttention) and hidden dropout before each
    residual add (bias_dropout_add, model/transformer.py:813-841).

    `rel_index` ([S, S] int32): gather map into the block's learned
    relative-position bias table (`block["rel_pos"]` [N, H], timm
    vit_relpos / BEiT style) — the per-layer bias is added to the
    attention logits."""
    k_attn = k_h1 = k_h2 = None
    if rng is not None and (cfg.attention_dropout > 0 or cfg.hidden_dropout > 0):
        k_attn, k_h1, k_h2 = jax.random.split(rng, 3)
    if "rel_pos" in block and rel_index is not None:
        # [N, H] table gathered via [S, S] -> [1, H, S, S] logits bias, or
        # via a per-example [B, S, S] map (patch dropout keeps different
        # patches per example) -> [B, H, S, S]
        rb = block["rel_pos"][rel_index]
        rb = (jnp.transpose(rb, (2, 0, 1))[None] if rb.ndim == 3
              else jnp.transpose(rb, (0, 3, 1, 2)))
        bias = rb if bias is None else bias + rb.astype(bias.dtype)
    x = _sp_constraint(x, cfg)
    h = apply_norm(block["ln_1"], x, cfg.norm)
    h = multi_head_attention(h, block["attn"], cfg.heads, causal=causal,
                             bias=bias, use_flash=cfg.use_flash, rope=rope,
                             kv_heads=cfg.kv_heads,
                             dropout_rate=cfg.attention_dropout,
                             dropout_rng=k_attn,
                             context_parallel=cfg.context_parallel,
                             cp_layout=cfg.context_parallel_layout)
    if "ls_1" in block:
        h = h * block["ls_1"].astype(h.dtype)
    h = dropout(h, cfg.hidden_dropout, k_h1)
    x = x + h
    h = apply_norm(block["ln_2"], x, cfg.norm)
    aux = jnp.zeros((), jnp.float32)
    if "moe" in block:
        from megatron_clip_tpu.ops.moe import apply_switch_mlp
        h, aux = apply_switch_mlp(
            block["moe"], h, act=cfg.act,
            capacity_factor=cfg.moe_capacity_factor,
            router_mode=cfg.moe_router, train=cfg.train)
    else:
        if cfg.quantize == "int8":
            from megatron_clip_tpu.ops.quant import quant_dense
            dense = lambda x, w: quant_dense(x, w)
        else:
            dense = lambda x, w: jnp.einsum("bsw,wd->bsd", x,
                                            w.astype(x.dtype))

        mlp = block["mlp"]
        h = dense(h, mlp["w1"])
        b1 = mlp.get("b1")
        if cfg.act == "swiglu":
            h = swiglu(h, None if b1 is None else b1.astype(h.dtype))
        else:
            h = bias_act(h, None if b1 is None else b1.astype(h.dtype),
                         cfg.act)
        h = dense(h, mlp["w2"])
        if mlp.get("b2") is not None:
            h = h + mlp["b2"].astype(h.dtype)
    if "ls_2" in block:
        h = h * block["ls_2"].astype(h.dtype)
    h = dropout(h, cfg.hidden_dropout, k_h2)
    if cfg.num_experts:
        return x + h, aux
    return x + h


def _flash_residuals_policy():
    """Save the flash-attention kernel's named (out, lse) outputs so its
    backward does not replay the forward kernel (see
    ops/pallas/flash_attention._flash_fwd_rule)."""
    return jax.checkpoint_policies.save_only_these_names(
        "flash_out", "flash_lse")


def _selective_policy():
    """megatron --recompute-granularity selective on TPU: save all
    activation matmul outputs (dots) plus the flash kernel's (out, lse)
    pair — what flash_attn's CUDA selective recompute keeps
    (megatron/model/transformer.py:419-479 FlashSelfAttention)."""
    return jax.checkpoint_policies.save_from_both_policies(
        jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        _flash_residuals_policy())


def _dots_except_mlp_up_policy(cfg: TransformerCfg):
    """remat='mlp': the dots-saveable policy minus the MLP up-projection —
    the [*, 4W] (or [*, 2*ffn] for swiglu) tensor that is 4W of the 9W
    dots-saveable residual bytes per token-layer. Its dgrad replays one
    matmul in backward (+~8w^2/token-layer, ~11% of the dense 72w^2)
    in exchange for ~45% less activation memory — the trade that fits
    760m-class GPT at batch 8 on one 16G chip. The up-projection dot is
    identified by its rhs weight shape [W, mlp_in]; a nested
    jax.checkpoint around the MLP does NOT work for this (the outer
    policy's partial-eval reaches inside and saves the dot anyway —
    verified with jax.ad_checkpoint.print_saved_residuals)."""
    from jax._src.lax import lax as lax_internal
    base = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    mlp_in = cfg.mlp_hidden * (2 if cfg.act == "swiglu" else 1)
    up_shape = (cfg.width, mlp_in)

    def policy(prim, *avals, **params):
        if prim is lax_internal.dot_general_p and len(avals) >= 2:
            rhs = avals[1]
            if tuple(getattr(rhs, "shape", ())) == up_shape:
                return False
        return base(prim, *avals, **params)

    return policy


def apply_transformer(blocks, x, cfg: TransformerCfg, *, causal: bool = False,
                      bias: Optional[jax.Array] = None, rope=None, rng=None,
                      layer_keys=None, position_ids=None, rel_index=None):
    """Run the stacked blocks. `blocks` leaves have leading layer axis.

    Activation recompute: cfg.remat
      - 'full'      == megatron --recompute-granularity full (every block
                       rematerialized; transformer.py:1625-1700)
      - 'selective' == recompute only attention internals; approximated here by
                       jax.checkpoint with dots_saveable policy
      - 'mlp'       == 'selective' + full remat of the MLP (drops the 4W
                       up-projection from the residuals; the middle rung
                       between selective and full)
      - 'none'

    `layer_keys` ([L, 2] uint32): explicit per-layer dropout keys, overriding
    the split of `rng` — the pipeline schedule passes each stage its slice of
    the global key array so pp>1 reproduces pp=1 masks exactly.
    `position_ids` ([S] int32): global token positions for the rope tables
    when the array order differs from position order (zigzag context-parallel
    layout, ops/ring_attention.zigzag_shard).
    `rel_index` ([S, S] int32): relative-position gather map for blocks that
    carry a learned `rel_pos` bias table (timm vit_relpos towers; see
    models/vit.relative_position_index).
    """
    if rope is None and cfg.rope:
        if (cfg.context_parallel and position_ids is None
                and cfg.context_parallel_layout == "zigzag"):
            # ring attention masks with zigzag global positions; natural-
            # order rope tables would silently give wrong rotary phases
            raise ValueError(
                "context_parallel_layout='zigzag' with rope requires "
                "position_ids in zigzag array order "
                "(ops/ring_attention.zigzag_shard; see pretrain_gpt.py)")
        from megatron_clip_tpu.ops.rope import rope_cos_sin
        rkw = dict(rotary_percent=cfg.rotary_percent,
                   seq_len_interpolation_factor=cfg.rope_interpolation)
        if position_ids is not None:
            # [S] global positions (zigzag CP) or [B, S] per-row document
            # restarts (--reset-position-ids); values < table length either
            # way
            cos, sin = rope_cos_sin(int(position_ids.shape[-1]),
                                    cfg.head_dim, cfg.rope_theta, **rkw)
            rope = (cos[position_ids], sin[position_ids])
        else:
            rope = rope_cos_sin(x.shape[1], cfg.head_dim, cfg.rope_theta,
                                **rkw)
    has_rng = (rng is not None or layer_keys is not None) and (
        cfg.attention_dropout > 0 or cfg.hidden_dropout > 0)

    def block_fn(block, x, key):
        return apply_block(block, x, cfg=cfg, causal=causal, bias=bias,
                           rope=rope, rng=key if has_rng else None,
                           rel_index=rel_index)

    if cfg.remat == "full":
        block_fn = jax.checkpoint(block_fn)
    elif cfg.remat == "selective":
        block_fn = jax.checkpoint(block_fn, policy=_selective_policy())
    elif cfg.remat == "mlp":
        block_fn = jax.checkpoint(
            block_fn,
            policy=jax.checkpoint_policies.save_from_both_policies(
                _dots_except_mlp_up_policy(cfg), _flash_residuals_policy()))

    n = jax.tree.leaves(blocks)[0].shape[0]
    if has_rng:
        keys = layer_keys if layer_keys is not None else jax.random.split(rng, n)
    else:
        keys = jnp.zeros((n, 2), jnp.uint32)
    moe = cfg.num_experts > 0
    # aux-carry zero derived from x so it inherits x's varying manual axes
    # (required when running inside a shard_map region, e.g. the pipeline)
    aux_zero = (x[(0,) * x.ndim] * 0).astype(jnp.float32)
    if cfg.scan_layers:
        def body(carry, xs):
            block, key = xs
            if moe:
                x, aux = carry
                x, a = block_fn(block, x, key)
                return (x, aux + a), None
            return block_fn(block, carry, key), None
        if moe:
            (x, aux), _ = jax.lax.scan(
                body, (x, aux_zero), (blocks, keys))
            return x, aux
        x, _ = jax.lax.scan(body, x, (blocks, keys))
        return x
    else:
        aux = aux_zero
        for i in range(n):
            out = block_fn(jax.tree.map(lambda t: t[i], blocks), x, keys[i])
            if moe:
                x, a = out
                aux = aux + a
            else:
                x = out
        return (x, aux) if moe else x
