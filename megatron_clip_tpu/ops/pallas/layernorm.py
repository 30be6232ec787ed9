"""Pallas fused LayerNorm / RMSNorm.

Replaces apex `fused_layer_norm_cuda` / `FastLayerNormFN`
(megatron/core/fusions/fused_layer_norm.py:13-41) and megatron RMSNorm
(megatron/model/rms_norm.py). One VMEM pass computes stats + normalization in
fp32 and writes in the input dtype. The backward uses the standard LN
gradient identities in jnp (memory-bound; XLA fuses it with neighbours).

Note: XLA already fuses the jnp layer_norm in ops/normalization.py well; this
kernel exists for the hot path where LN is sandwiched between Pallas ops and
for API/inventory parity. Dispatch is opt-in via ops.normalization.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret():
    return jax.default_backend() not in ("tpu", "axon")


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps, rms):
    x = x_ref[:].astype(jnp.float32)
    if rms:
        nrm = x * jax.lax.rsqrt(jnp.mean(x * x, -1, keepdims=True) + eps)
    else:
        mean = jnp.mean(x, -1, keepdims=True)
        xc = x - mean
        var = jnp.mean(xc * xc, -1, keepdims=True)
        nrm = xc * jax.lax.rsqrt(var + eps)
    y = nrm * scale_ref[:].astype(jnp.float32)
    if bias_ref is not None:
        y = y + bias_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


def _ln_fwd(x, scale, bias, *, eps, rms, block_rows=256):
    orig_shape = x.shape
    w = x.shape[-1]
    rows = x.size // w
    x2 = x.reshape(rows, w)
    br = min(block_rows, rows)
    # pad rows to a multiple of the block
    rows_pad = -(-rows // br) * br
    if rows_pad != rows:
        x2 = jnp.pad(x2, ((0, rows_pad - rows), (0, 0)))
    args = [x2, scale] + ([bias] if bias is not None else [])
    in_specs = [pl.BlockSpec((br, w), lambda i: (i, 0)),
                pl.BlockSpec((w,), lambda i: (0,))]
    if bias is not None:
        in_specs.append(pl.BlockSpec((w,), lambda i: (0,)))
    kernel = functools.partial(_ln_kernel, eps=eps, rms=rms)
    if bias is None:
        kernel = functools.partial(
            lambda x_ref, scale_ref, o_ref, **kw:
                _ln_kernel(x_ref, scale_ref, None, o_ref, **kw),
            eps=eps, rms=rms)
    out = pl.pallas_call(
        kernel,
        grid=(rows_pad // br,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((br, w), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows_pad, w), x.dtype),
        interpret=_interpret(),
    )(*args)
    return out[:rows].reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layer_norm(x, scale, bias, eps: float = 1e-5):
    """y = LN(x) * scale + bias, single fused VMEM pass."""
    return _ln_fwd(x, scale, bias, eps=eps, rms=False)


def _fln_fwd(x, scale, bias, eps):
    return _ln_fwd(x, scale, bias, eps=eps, rms=False), (x, scale)


def _fln_bwd(eps, res, dy):
    x, scale = res
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    mean = jnp.mean(xf, -1, keepdims=True)
    xc = xf - mean
    rstd = jax.lax.rsqrt(jnp.mean(xc * xc, -1, keepdims=True) + eps)
    xhat = xc * rstd
    g = dyf * scale.astype(jnp.float32)
    dx = rstd * (g - jnp.mean(g, -1, keepdims=True)
                 - xhat * jnp.mean(g * xhat, -1, keepdims=True))
    red = tuple(range(x.ndim - 1))
    dscale = jnp.sum(dyf * xhat, axis=red)
    dbias = jnp.sum(dyf, axis=red)
    return (dx.astype(x.dtype), dscale.astype(scale.dtype),
            dbias.astype(scale.dtype))


fused_layer_norm.defvjp(_fln_fwd, _fln_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_rms_norm(x, scale, eps: float = 1e-6):
    return _ln_fwd(x, scale, None, eps=eps, rms=True)


def _frms_fwd(x, scale, eps):
    return _ln_fwd(x, scale, None, eps=eps, rms=True), (x, scale)


def _frms_bwd(eps, res, dy):
    x, scale = res
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    rstd = jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
    xhat = xf * rstd
    g = dyf * scale.astype(jnp.float32)
    dx = rstd * (g - xhat * jnp.mean(g * xhat, -1, keepdims=True))
    red = tuple(range(x.ndim - 1))
    dscale = jnp.sum(dyf * xhat, axis=red)
    return dx.astype(x.dtype), dscale.astype(scale.dtype)


fused_rms_norm.defvjp(_frms_fwd, _frms_bwd)
