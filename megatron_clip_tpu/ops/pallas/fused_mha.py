"""Fused multi-head attention for short sequences (Pallas, TPU).

Motivation (measured on v5e, CLIP ViT-B/32 bs256): XLA's decomposed
attention spends ~17ms/step on pure layout work — splitting the packed QKV
GEMM output into q/k/v and transposing [B,S,H,D]->[B,H,S,D] and back. The
attention *math* at CLIP sequence lengths (50..257) is tiny; the copies
dominate. The flash-attention kernel (flash_attention.py) doesn't help
here: its online-softmax block machinery only wins at long sequences
(>=2048).

This kernel removes the copies instead:
  - input is the raw QKV projection output [B, S, 3*H*D] — no reshape, no
    transpose, no q/k/v split ever materializes in HBM;
  - grid is (batch-tile,); each cell holds its full rows in VMEM and slices
    per-head q/k/v at static lane offsets (in-register relayouts, not HBM
    copies);
  - S is small, so the whole S×S score matrix lives in VMEM: plain fp32
    softmax, no online rescaling;
  - backward recomputes scores from the saved qkv (memory-light: the only
    residual is the projection output, which the layer keeps anyway) and
    writes the gradient back as packed [B, S, 3*H*D], feeding the QKV GEMM
    transpose-free for dWqkv/dx.

Replaces the same reference surface as ops/attention.sdpa: CoreAttention's
fused scaled-masked-softmax + batched matmuls (megatron/model/
transformer.py:282-417) and the `flash_attn` path (:419-479), for the
short-sequence regime every CLIP workload here actually runs in.
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Above this sequence length fall back to flash attention / XLA: the S×S
# score block (fp32) stops fitting comfortably in VMEM alongside q/k/v.
MAX_FUSED_SEQ = 1024


def _pick_batch_tile(b: int, s: int, w3: int, heads: int) -> int:
    """Largest power-of-two batch tile keeping the cell's VMEM footprint
    (qkv+o rows bf16 + fp32 per-head scratch) under ~4MB so Mosaic can
    double-buffer the DMA."""
    bt = 1
    while bt < b:
        nxt = bt * 2
        if b % nxt != 0:
            break
        foot = nxt * (s * w3 * 2 + s * (w3 // 3) * 2 + 2 * s * s * 4)
        if foot > 4 * 1024 * 1024:
            break
        bt = nxt
    return bt


def _batched_dot(a, b, dims, prec=None):
    return jax.lax.dot_general(a, b, (dims, ((0,), (0,))),
                               preferred_element_type=jnp.float32,
                               precision=prec)


def _softmax_rows(s):
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _causal_mask(s):
    n = s.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.where((row >= col)[None], s, -1e30)


def _fwd_kernel(qkv_ref, o_ref, *, heads, scale, causal, prec):
    # qkv_ref: [BT, S, 3*H*D]; o_ref: [BT, S, H*D]
    hd = o_ref.shape[-1] // heads
    for h in range(heads):
        q = qkv_ref[:, :, h * hd:(h + 1) * hd]
        k = qkv_ref[:, :, (heads + h) * hd:(heads + h + 1) * hd]
        v = qkv_ref[:, :, (2 * heads + h) * hd:(2 * heads + h + 1) * hd]
        s = _batched_dot(q, k, ((2,), (2,)), prec) * scale
        if causal:
            s = _causal_mask(s)
        p = _softmax_rows(s)
        o = _batched_dot(p.astype(v.dtype), v, ((2,), (1,)), prec)
        o_ref[:, :, h * hd:(h + 1) * hd] = o.astype(o_ref.dtype)


def _bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, heads, scale, causal, prec):
    hd = do_ref.shape[-1] // heads
    for h in range(heads):
        q = qkv_ref[:, :, h * hd:(h + 1) * hd]
        k = qkv_ref[:, :, (heads + h) * hd:(heads + h + 1) * hd]
        v = qkv_ref[:, :, (2 * heads + h) * hd:(2 * heads + h + 1) * hd]
        do = do_ref[:, :, h * hd:(h + 1) * hd]
        s = _batched_dot(q, k, ((2,), (2,)), prec) * scale
        if causal:
            s = _causal_mask(s)
        p = _softmax_rows(s)                         # [BT, Sq, Sk] fp32
        pc = p.astype(v.dtype)
        # dv = p^T @ do (contract query dim); dp = do @ v^T
        dv = _batched_dot(pc, do, ((1,), (1,)), prec)
        dp = _batched_dot(do, v, ((2,), (2,)), prec)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
        ds = ds.astype(q.dtype)
        dq = _batched_dot(ds, k, ((2,), (1,)), prec)
        dk = _batched_dot(ds, q, ((1,), (1,)), prec)
        dqkv_ref[:, :, h * hd:(h + 1) * hd] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, (heads + h) * hd:(heads + h + 1) * hd] = \
            dk.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, (2 * heads + h) * hd:(2 * heads + h + 1) * hd] = \
            dv.astype(dqkv_ref.dtype)


def _precision_for(dtype):
    # fp32 inputs need HIGHEST on the TPU MXU or parity degrades to ~1e-3
    # (default is a single bf16 pass) — same finding as flash_attention.py.
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None)


def _fwd(qkv, heads, scale, causal, interpret):
    b, s, w3 = qkv.shape
    w = w3 // 3
    bt = _pick_batch_tile(b, s, w3, heads)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, scale=scale,
                          causal=causal, prec=_precision_for(qkv.dtype)),
        grid=(b // bt,),
        in_specs=[pl.BlockSpec((bt, s, w3), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((bt, s, w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, w), qkv.dtype),
        interpret=interpret,
    )(qkv)
    return out


def _bwd(qkv, do, heads, scale, causal, interpret):
    b, s, w3 = qkv.shape
    w = w3 // 3
    bt = _pick_batch_tile(b, s, w3, heads)
    dqkv = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, scale=scale,
                          causal=causal, prec=_precision_for(qkv.dtype)),
        grid=(b // bt,),
        in_specs=[pl.BlockSpec((bt, s, w3), lambda i: (i, 0, 0)),
                  pl.BlockSpec((bt, s, w), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((bt, s, w3), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, w3), qkv.dtype),
        interpret=interpret,
    )(qkv, do)
    return dqkv


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def fused_mha_packed(qkv, heads: int, scale: float, causal: bool = False,
                     interpret: bool = False):
    """qkv: [B, S, 3*H*D] raw QKV GEMM output (q|k|v each H*D wide).
    Returns attention output [B, S, H*D].

    Softmax in fp32; matmuls accumulate fp32. The backward pass recomputes
    the score matrix from qkv (no softmax residuals are stored)."""
    return _fwd(qkv, heads, scale, causal, interpret)


def _fused_fwd(qkv, heads, scale, causal, interpret):
    return _fwd(qkv, heads, scale, causal, interpret), qkv


def _fused_bwd(heads, scale, causal, interpret, qkv, do):
    return (_bwd(qkv, do, heads, scale, causal, interpret),)


fused_mha_packed.defvjp(_fused_fwd, _fused_bwd)


def fused_attention_from_qkv(qkv_flat, heads: int, *, causal: bool = False,
                             scale: Optional[float] = None,
                             interpret: bool = False):
    """Dispatch wrapper with the default 1/sqrt(D) scale."""
    d = qkv_flat.shape[-1] // (3 * heads)
    if scale is None:
        scale = d ** -0.5
    return fused_mha_packed(qkv_flat, heads, scale, causal, interpret)
