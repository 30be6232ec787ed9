"""LayerNorm / RMSNorm.

Replaces apex `fused_layer_norm_cuda` / `FastLayerNormFN`
(megatron/core/fusions/fused_layer_norm.py:13-41) and megatron RMSNorm
(megatron/model/rms_norm.py). Statistics are computed in fp32 regardless of
input dtype (matching the reference's fp32 residual/LN policy); a Pallas
fused kernel lives in ops/pallas/layernorm.py and is dispatched on TPU for
large rows.
"""
import jax
import jax.numpy as jnp


def layer_norm(x, scale, bias, eps: float = 1e-5):
    """y = (x - mean)/sqrt(var+eps) * scale + bias, stats in fp32."""
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
