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
            "wo": (jax.random.normal(k_o, (w, w)) * proj_std).astype(dtype),
        },
        "ln_2": init_layer_norm(w, dtype, cfg.norm),
        "mlp": {
            "w1": (jax.random.normal(k_fc, (w, mlp_in)) * fc_std).astype(dtype),
            "w2": (jax.random.normal(k_proj, (cfg.mlp_hidden, w)) * proj_std).astype(dtype),
        },
    }
    if cfg.use_bias:
        block["attn"]["bqkv"] = jnp.zeros((qkv_out,), dtype=dtype)
        block["attn"]["bo"] = jnp.zeros((w,), dtype=dtype)
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

def apply_block(block, x, cfg: TransformerCfg, *, causal: bool = False,
                bias: Optional[jax.Array] = None, rope=None):
    """x: [B, S, W] in compute dtype."""
    h = apply_norm(block["ln_1"], x, cfg.norm)
    h = multi_head_attention(h, block["attn"], cfg.heads, causal=causal,
                             bias=bias, use_flash=cfg.use_flash, rope=rope,
                             kv_heads=cfg.kv_heads)
    if "ls_1" in block:
        h = h * block["ls_1"].astype(h.dtype)
    x = x + h
    h = apply_norm(block["ln_2"], x, cfg.norm)
    h = jnp.einsum("bsw,wd->bsd", h, block["mlp"]["w1"].astype(h.dtype))
    b1 = block["mlp"].get("b1")
    if cfg.act == "swiglu":
        h = swiglu(h, None if b1 is None else b1.astype(h.dtype))
    else:
        h = bias_act(h, None if b1 is None else b1.astype(h.dtype), cfg.act)
    h = jnp.einsum("bsw,wd->bsd", h, block["mlp"]["w2"].astype(h.dtype))
    if block["mlp"].get("b2") is not None:
        h = h + block["mlp"]["b2"].astype(h.dtype)
    if "ls_2" in block:
        h = h * block["ls_2"].astype(h.dtype)
    return x + h


def apply_transformer(blocks, x, cfg: TransformerCfg, *, causal: bool = False,
                      bias: Optional[jax.Array] = None, rope=None):
    """Run the stacked blocks. `blocks` leaves have leading layer axis.

    Activation recompute: cfg.remat
      - 'full'      == megatron --recompute-granularity full (every block
                       rematerialized; transformer.py:1625-1700)
      - 'selective' == recompute only attention internals; approximated here by
                       jax.checkpoint with dots_saveable policy
      - 'none'
    """
    if rope is None and cfg.rope:
        from megatron_clip_tpu.ops.rope import rope_cos_sin
        rope = rope_cos_sin(x.shape[1], cfg.head_dim, cfg.rope_theta)
    block_fn = partial(apply_block, cfg=cfg, causal=causal, bias=bias, rope=rope)
    if cfg.remat == "full":
        block_fn = jax.checkpoint(block_fn)
    elif cfg.remat == "selective":
        block_fn = jax.checkpoint(
            block_fn, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)

    if cfg.scan_layers:
        def body(carry, block):
            return block_fn(block, carry), None
        x, _ = jax.lax.scan(body, x, blocks)
        return x
    else:
        n = jax.tree.leaves(blocks)[0].shape[0]
        for i in range(n):
            x = block_fn(jax.tree.map(lambda t: t[i], blocks), x)
        return x
