"""Quantized matmuls: the TPU-native answer to TransformerEngine's fp8 path.

The reference's optional fp8 stack (megatron/core/transformer/custom_layers/
transformer_engine.py, fp8 amax groups in parallel_state.py:670-681) exists
for H100 fp8 tensor cores. TPU's MXU natively accelerates **int8 x int8 ->
int32** instead, so the equivalent capability here is AQT-style int8
quantization-aware matmuls:

  - weights: symmetric per-output-channel int8 (scale = max|w| / 127);
  - activations: symmetric per-row dynamic int8 (the "delayed scaling"
    amax bookkeeping of TE is unnecessary — dynamic scales are one cheap
    row-max on TPU);
  - backward: straight-through estimator (gradients flow as if the matmul
    were full-precision), via jax.custom_vjp.

`quantize_params` pre-quantizes a weight pytree for serving (int8 storage =
4x HBM saving on the weight-bound decode path).
"""
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def quantize_symmetric(x, axis=0, bits: int = 8):
    """Symmetric per-channel quantization. `axis` = the contraction axis
    that is *reduced* when computing scales (for a [in, out] weight use
    axis=0: one scale per output channel)."""
    qmax = 2 ** (bits - 1) - 1
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / qmax
    q = jnp.clip(jnp.round(x / scale), -qmax, qmax).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def int8_matmul(x, w_q, w_scale):
    """x [..., K] fp  @  w_q [K, N] int8 (w_scale [1, N]) -> [..., N] fp.

    The activation is quantized dynamically per row; the int8 x int8 dot
    accumulates in int32 on the MXU; scales are applied to the int32 result.
    """
    qmax = 127
    x_amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    x_scale = jnp.maximum(x_amax.astype(jnp.float32), 1e-8) / qmax
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale),
                   -qmax, qmax).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, w_q,
        (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * x_scale * w_scale.reshape(
        (1,) * (acc.ndim - 1) + (-1,))
    return out.astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=())
def quant_dense(x, w):
    """Quantization-aware dense: forward runs int8 x int8 -> int32 on the
    MXU; backward is the straight-through estimator (full-precision grads).
    """
    w_q, w_scale = quantize_symmetric(w.astype(jnp.float32), axis=0)
    return int8_matmul(x, w_q, w_scale)


def _qd_fwd(x, w):
    return quant_dense(x, w), (x, w)


def _qd_bwd(res, g):
    x, w = res
    gx = jnp.einsum("...n,kn->...k", g, w.astype(g.dtype))
    gw = jnp.einsum("...k,...n->kn",
                    x.astype(jnp.float32), g.astype(jnp.float32)
                    ).astype(w.dtype)
    return gx.astype(x.dtype), gw


quant_dense.defvjp(_qd_fwd, _qd_bwd)


def quantize_params(params, *, min_size: int = 1 << 12):
    """Pre-quantize every >=2D weight leaf to (int8, scale) pairs for
    serving. Leaves smaller than `min_size` or non-matmul-shaped stay fp."""
    def q(leaf):
        if (hasattr(leaf, "ndim") and leaf.ndim >= 2
                and leaf.size >= min_size
                and jnp.issubdtype(leaf.dtype, jnp.floating)):
            w_q, scale = quantize_symmetric(
                leaf.astype(jnp.float32).reshape(-1, leaf.shape[-1]), axis=0)
            return {"q": w_q.reshape(leaf.shape), "scale": scale[0],
                    "__quant__": jnp.ones((), jnp.int8)}
        return leaf
    return jax.tree.map(q, params)


def quantize_decode_weights(params):
    """Serving-side int8 quantization for the GPT decode path
    (inference/generation.py): per-(layer, out-channel) scales for the
    scan-stacked block weights [L, K, N] (a shared-across-layers scale —
    what quantize_params computes — loses precision when layer magnitudes
    differ), plus the untied lm_head. The tied token embedding stays fp:
    its lm-head matmul contracts over the scaled axis, so per-channel
    scales do not factor out of the logits."""
    def q_leaf(leaf):
        if not (hasattr(leaf, "ndim") and leaf.ndim >= 2
                and jnp.issubdtype(leaf.dtype, jnp.floating)):
            return leaf
        qmax = 127
        red = tuple(range(1, leaf.ndim - 1)) if leaf.ndim >= 3 else (0,)
        w = leaf.astype(jnp.float32)
        amax = jnp.max(jnp.abs(w), axis=red, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) / qmax
        q = jnp.clip(jnp.round(w / scale), -qmax, qmax).astype(jnp.int8)
        # scale carried as [L, N] for stacked leaves, [N] for 2D. No
        # sentinel array: every value needs the layer dim to scan, so
        # quantized leaves are detected structurally ({"q","scale"} dict,
        # is_quantized_weight) instead.
        return {"q": q, "scale": jnp.squeeze(scale, axis=red)}

    out = dict(params)
    out["blocks"] = jax.tree.map(
        lambda l: q_leaf(l) if hasattr(l, "ndim") and l.ndim >= 3 else l,
        params["blocks"])
    if "lm_head" in params:
        out["lm_head"] = q_leaf(params["lm_head"])
    return out


def is_quantized_weight(w) -> bool:
    """Structural test for a quantize_decode_weights leaf."""
    return isinstance(w, dict) and set(w.keys()) == {"q", "scale"}


def dequantize_params(qparams):
    def dq(leaf):
        if isinstance(leaf, dict) and "__quant__" in leaf:
            q = leaf["q"].astype(jnp.float32)
            scale = leaf["scale"].reshape((1,) * (q.ndim - 1) + (-1,))
            return q * scale
        return leaf
    return jax.tree.map(dq, qparams,
                        is_leaf=lambda l: isinstance(l, dict)
                        and "__quant__" in l)
