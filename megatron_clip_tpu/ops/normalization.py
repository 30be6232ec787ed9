"""LayerNorm / RMSNorm.

Replaces apex `fused_layer_norm_cuda` / `FastLayerNormFN`
(megatron/core/fusions/fused_layer_norm.py:13-41) and megatron RMSNorm
(megatron/model/rms_norm.py). Statistics are computed in fp32 regardless of
input dtype (matching the reference's fp32 residual/LN policy); a Pallas
fused kernel lives in ops/pallas/layernorm.py and is dispatched on TPU for
large rows.
"""
import os

import jax
import jax.numpy as jnp

# opt-in Pallas fused-LN dispatch (measured ~neutral vs XLA's own fusion on
# v5e; kept as a switch for kernel-sandwich cases)
_USE_PALLAS_LN = os.environ.get("MCT_PALLAS_LN", "0") == "1"


def layer_norm(x, scale, bias, eps: float = 1e-5):
    """y = (x - mean)/sqrt(var+eps) * scale + bias, stats in fp32."""
    if _USE_PALLAS_LN and bias is not None and x.ndim >= 2:
        from megatron_clip_tpu.ops import use_pallas
        if use_pallas():
            from megatron_clip_tpu.ops.pallas.layernorm import fused_layer_norm
            return fused_layer_norm(x, scale, bias, eps)
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def rms_norm(x, scale, eps: float = 1e-6):
    """RMSNorm (megatron/model/rms_norm.py semantics), stats in fp32."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(ms + eps) * scale.astype(jnp.float32)
    return y.astype(dtype)
