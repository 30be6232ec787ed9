"""Fused lm-head + softmax-cross-entropy Pallas kernel.

The GPT loss pipeline `logits = h @ W; ce(logits, labels)` is the single
largest non-tower cost at small model sizes: fp32 logits for a 50k vocab
are [T, V] ~ 3.3 GB at bs8/s2048 — they don't even fit one 16G chip, and
the sequence-chunked fallback (models/gpt.py loss_seq_chunk) still streams
~0.8 GB of logits per chunk through HBM twice (softmax read/write) plus a
full recompute in backward. The reference leans on vocab-parallel
cross-entropy to shrink the per-GPU logits slab
(megatron/core/tensor_parallel/cross_entropy.py); on one chip the right
tool is fusion: never materialize logits at all.

This kernel streams vocab tiles through VMEM with an online softmax
(flash-attention structure, W playing the role of keys):

  forward:  per (token-block, vocab-tile): logits_tile = X W_tile on the
            MXU; running max/sum-exp + the label logit accumulate in VMEM
            scratch; emits per-token loss and logsumexp. HBM traffic for
            logits: zero.
  backward: two kernels recompute logits tiles and contract the softmax
            residual (p - onehot) * dloss on the fly:
              dX kernel (token-blocks outer): acc += dlogits @ W_tile^T
              dW kernel (vocab-tiles outer):  acc += X_blk^T @ dlogits

Five matmul passes total (vs 4 for the chunked path) but no logits HBM
traffic and no stored chunk activations — measured faster end-to-end at
GPT-345m/seq2048 (see README perf table).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30   # python scalar: jnp constants cannot be captured by kernels


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _cdiv(a, b):
    return -(-a // b)


# ------------------------------ forward -------------------------------------

def _fwd_kernel(x_ref, w_ref, lbl_ref, loss_ref, lse_ref,
                m_scr, l_scr, g_scr, *, block_v, num_v_blocks, vocab):
    vi = pl.program_id(1)

    @pl.when(vi == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr[:], NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr[:])
        g_scr[:] = jnp.zeros_like(g_scr[:])

    x = x_ref[:]
    logits = jax.lax.dot(x, w_ref[:].astype(x.dtype),
                         preferred_element_type=jnp.float32)
    bt, bv = logits.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (bt, bv), 1) + vi * block_v
    logits = jnp.where(cols < vocab, logits, NEG_INF)   # padded vocab tail

    lbl = lbl_ref[:]                                    # [bt, 1]
    onehot = cols == lbl
    g_scr[:] = g_scr[:] + jnp.sum(
        jnp.where(onehot, logits, 0.0), axis=1, keepdims=True)

    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, logits.max(axis=1, keepdims=True))
    l_scr[:] = l_scr[:] * jnp.exp(m_prev - m_new) + \
        jnp.sum(jnp.exp(logits - m_new), axis=1, keepdims=True)
    m_scr[:] = m_new

    @pl.when(vi == num_v_blocks - 1)
    def _emit():
        lse = m_scr[:] + jnp.log(jnp.maximum(l_scr[:], 1e-30))
        lse_ref[:] = lse
        loss_ref[:] = lse - g_scr[:]


# ------------------------------ backward ------------------------------------

def _softmax_resid(x, w_ref, lbl, lse, dloss, vi, block_v, vocab):
    """dlogits tile = (softmax - onehot) * dloss, recomputed from scratch."""
    logits = jax.lax.dot(x, w_ref[:].astype(x.dtype),
                         preferred_element_type=jnp.float32)
    bt, bv = logits.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (bt, bv), 1) + vi * block_v
    p = jnp.where(cols < vocab, jnp.exp(logits - lse), 0.0)
    return (p - (cols == lbl).astype(jnp.float32)) * dloss


def _dx_kernel(x_ref, w_ref, lbl_ref, lse_ref, dloss_ref, dx_ref, acc_scr,
               *, block_v, num_v_blocks, vocab):
    vi = pl.program_id(1)

    @pl.when(vi == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr[:])

    x = x_ref[:]
    dlog = _softmax_resid(x, w_ref, lbl_ref[:], lse_ref[:], dloss_ref[:],
                          vi, block_v, vocab)
    # [bt, bv] x [w, bv] -> [bt, w]  (contract the vocab tile)
    acc_scr[:] = acc_scr[:] + jax.lax.dot_general(
        dlog.astype(x.dtype), w_ref[:].astype(x.dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(vi == num_v_blocks - 1)
    def _emit():
        dx_ref[:] = acc_scr[:].astype(dx_ref.dtype)


def _dw_kernel(x_ref, w_ref, lbl_ref, lse_ref, dloss_ref, dw_ref, acc_scr,
               *, block_v, num_t_blocks, vocab):
    vi, ti = pl.program_id(0), pl.program_id(1)

    @pl.when(ti == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr[:])

    x = x_ref[:]
    dlog = _softmax_resid(x, w_ref, lbl_ref[:], lse_ref[:], dloss_ref[:],
                          vi, block_v, vocab)
    # [bt, w] x [bt, bv] -> [w, bv]  (contract the token block)
    acc_scr[:] = acc_scr[:] + jax.lax.dot_general(
        x, dlog.astype(x.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ti == num_t_blocks - 1)
    def _emit():
        dw_ref[:] = acc_scr[:].astype(dw_ref.dtype)


# ------------------------------ wrapper -------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flce(x, w, labels, block_t: int, block_v: int):
    loss, _ = _fwd(x, w, labels, block_t, block_v)
    return loss


def fused_linear_cross_entropy(x, w, labels, block_t: int = 0,
                               block_v: int = 0):
    """x: [T, W] hidden states; w: [W, V] head weights; labels: [T] int32.
    Returns per-token loss [T] (fp32) without ever materializing [T, V]
    logits. Differentiable in x and w (labels are constants).

    Default blocks adapt to the hidden width: the dW kernel's live VMEM is
    ~ x(bt*wd) + w/dw tiles + fp32 acc(wd*bv), so wd*bv is capped at 512K
    elements (bv 512 up to wd 1024, 256 at 2048, 128 at 4096) to stay
    under the 16M scoped-vmem limit with double buffering."""
    import os
    wd = x.shape[1]
    if not block_t:
        block_t = int(os.environ.get("MCT_FLCE_BT", "0")) or 256
    if not block_v:
        block_v = int(os.environ.get("MCT_FLCE_BV", "0")) or \
            max(128, min(512, (512 * 1024 // wd) // 128 * 128))
    return _flce(x, w, labels, block_t, block_v)


def _pad_t(a, t_pad, value=0):
    if t_pad:
        pad = [(0, t_pad)] + [(0, 0)] * (a.ndim - 1)
        a = jnp.pad(a, pad, constant_values=value)
    return a


def _prep(x, w, labels, block_t, block_v):
    t, wd = x.shape
    v = w.shape[1]
    t_pad = (-t) % block_t
    v_pad = (-v) % block_v
    x = _pad_t(x, t_pad)
    lbl = _pad_t(labels.astype(jnp.int32), t_pad).reshape(-1, 1)
    if v_pad:
        w = jnp.pad(w, ((0, 0), (0, v_pad)))
    return x, w, lbl, t, v, t_pad


def _fwd(x, w, labels, block_t, block_v):
    xp, wp, lbl, t, v, _ = _prep(x, w, labels, block_t, block_v)
    tp, wd = xp.shape
    nt, nv = tp // block_t, wp.shape[1] // block_v
    kernel = functools.partial(_fwd_kernel, block_v=block_v,
                               num_v_blocks=nv, vocab=v)
    loss, lse = pl.pallas_call(
        kernel,
        grid=(nt, nv),
        in_specs=[
            pl.BlockSpec((block_t, wd), lambda i, j: (i, 0)),
            pl.BlockSpec((wd, block_v), lambda i, j: (0, j)),
            pl.BlockSpec((block_t, 1), lambda i, j: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_t, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((block_t, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, 1), jnp.float32),
            jax.ShapeDtypeStruct((tp, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_t, 1), jnp.float32),
            pltpu.VMEM((block_t, 1), jnp.float32),
            pltpu.VMEM((block_t, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_interpret(),
    )(xp, wp, lbl)
    return loss[:t, 0], lse[:, 0]


def _vjp_fwd(x, w, labels, block_t, block_v):
    loss, lse = _fwd(x, w, labels, block_t, block_v)
    return loss, (x, w, labels, lse)


def _vjp_bwd(block_t, block_v, res, dloss):
    x, w, labels, lse = res
    xp, wp, lbl, t, v, t_pad = _prep(x, w, labels, block_t, block_v)
    tp, wd = xp.shape
    nt, nv = tp // block_t, wp.shape[1] // block_v
    lse_p = _pad_t(lse.reshape(-1, 1), t_pad)
    # padded rows carry zero dloss -> contribute nothing to dX/dW
    dl_p = _pad_t(dloss.astype(jnp.float32).reshape(-1, 1), t_pad)

    dx = pl.pallas_call(
        functools.partial(_dx_kernel, block_v=block_v, num_v_blocks=nv,
                          vocab=v),
        grid=(nt, nv),
        in_specs=[
            pl.BlockSpec((block_t, wd), lambda i, j: (i, 0)),
            pl.BlockSpec((wd, block_v), lambda i, j: (0, j)),
            pl.BlockSpec((block_t, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((block_t, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((block_t, 1), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_t, wd), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((tp, wd), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_t, wd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_interpret(),
    )(xp, wp, lbl, lse_p, dl_p)

    dw = pl.pallas_call(
        functools.partial(_dw_kernel, block_v=block_v, num_t_blocks=nt,
                          vocab=v),
        grid=(nv, nt),
        in_specs=[
            pl.BlockSpec((block_t, wd), lambda j, i: (i, 0)),
            pl.BlockSpec((wd, block_v), lambda j, i: (0, j)),
            pl.BlockSpec((block_t, 1), lambda j, i: (i, 0)),
            pl.BlockSpec((block_t, 1), lambda j, i: (i, 0)),
            pl.BlockSpec((block_t, 1), lambda j, i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((wd, block_v), lambda j, i: (0, j)),
        out_shape=jax.ShapeDtypeStruct((wd, wp.shape[1]), w.dtype),
        scratch_shapes=[pltpu.VMEM((wd, block_v), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_interpret(),
    )(xp, wp, lbl, lse_p, dl_p)

    return dx[:t], dw[:, :v], None


_flce.defvjp(_vjp_fwd, _vjp_bwd)
