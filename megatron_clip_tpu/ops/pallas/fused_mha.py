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


def _pick_batch_tile(b: int, s: int, w3: int, heads: int,
                     budget: int = 4 * 1024 * 1024,
                     extra_per_row: int = 0) -> int:
    """Largest power-of-two batch tile keeping the cell's VMEM footprint
    (qkv+o rows bf16 + fp32 per-head scratch, plus any `extra_per_row`
    operand bytes) under `budget` so Mosaic can double-buffer the DMA and
    the kernel stack fits scoped vmem."""
    bt = 1
    while bt < b:
        nxt = bt * 2
        if b % nxt != 0:
            break
        foot = nxt * (s * w3 * 2 + s * (w3 // 3) * 2 + 2 * s * s * 4
                      + extra_per_row)
        if foot > budget:
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


def _fwd_kernel(qkv_ref, o_ref, p_ref, *, heads, scale, causal, prec):
    # qkv_ref: [BT, S, 3*H*D]; o_ref: [BT, S, H*D]; p_ref: [BT, S, H*S]
    # (softmax probabilities in the compute dtype, saved for the backward
    # pass — recomputing them costs ~30% of the bwd kernel; at CLIP seq
    # lengths the extra HBM is tiny).
    hd = o_ref.shape[-1] // heads
    sk = p_ref.shape[-1] // heads
    for h in range(heads):
        q = qkv_ref[:, :, h * hd:(h + 1) * hd]
        k = qkv_ref[:, :, (heads + h) * hd:(heads + h + 1) * hd]
        v = qkv_ref[:, :, (2 * heads + h) * hd:(2 * heads + h + 1) * hd]
        s = _batched_dot(q, k, ((2,), (2,)), prec) * scale
        if causal:
            s = _causal_mask(s)
        p = _softmax_rows(s)
        pc = p.astype(v.dtype)
        o = _batched_dot(pc, v, ((2,), (1,)), prec)
        o_ref[:, :, h * hd:(h + 1) * hd] = o.astype(o_ref.dtype)
        p_ref[:, :, h * sk:(h + 1) * sk] = pc.astype(p_ref.dtype)


def _bwd_head(q, k, v, do, p, dqkv_ref, h, heads, hd, scale, prec):
    pc = p.astype(v.dtype)
    pf = p.astype(jnp.float32)
    # dv = p^T @ do (contract query dim); dp = do @ v^T
    dv = _batched_dot(pc, do, ((1,), (1,)), prec)
    dp = _batched_dot(do, v, ((2,), (2,)), prec)
    ds = pf * (dp - jnp.sum(dp * pf, axis=-1, keepdims=True)) * scale
    ds = ds.astype(q.dtype)
    dq = _batched_dot(ds, k, ((2,), (1,)), prec)
    dk = _batched_dot(ds, q, ((1,), (1,)), prec)
    dqkv_ref[:, :, h * hd:(h + 1) * hd] = dq.astype(dqkv_ref.dtype)
    dqkv_ref[:, :, (heads + h) * hd:(heads + h + 1) * hd] = \
        dk.astype(dqkv_ref.dtype)
    dqkv_ref[:, :, (2 * heads + h) * hd:(2 * heads + h + 1) * hd] = \
        dv.astype(dqkv_ref.dtype)


def _bwd_kernel(qkv_ref, do_ref, p_ref, dqkv_ref, *, heads, scale, causal,
                prec):
    hd = do_ref.shape[-1] // heads
    sk = p_ref.shape[-1] // heads
    for h in range(heads):
        q = qkv_ref[:, :, h * hd:(h + 1) * hd]
        k = qkv_ref[:, :, (heads + h) * hd:(heads + h + 1) * hd]
        v = qkv_ref[:, :, (2 * heads + h) * hd:(2 * heads + h + 1) * hd]
        do = do_ref[:, :, h * hd:(h + 1) * hd]
        p = p_ref[:, :, h * sk:(h + 1) * sk]         # [BT, Sq, Sk] saved
        _bwd_head(q, k, v, do, p, dqkv_ref, h, heads, hd, scale, prec)


def _bwd_kernel_recompute(qkv_ref, do_ref, dqkv_ref, *, heads, scale,
                          causal, prec):
    """Memory-light variant: recompute scores+softmax from qkv instead of
    reading saved probabilities (MCT_MHA_SAVE_PROBS=0 — preferable when HBM
    is the binding constraint, e.g. max-batch runs)."""
    hd = do_ref.shape[-1] // heads
    for h in range(heads):
        q = qkv_ref[:, :, h * hd:(h + 1) * hd]
        k = qkv_ref[:, :, (heads + h) * hd:(heads + h + 1) * hd]
        v = qkv_ref[:, :, (2 * heads + h) * hd:(2 * heads + h + 1) * hd]
        do = do_ref[:, :, h * hd:(h + 1) * hd]
        sc = _batched_dot(q, k, ((2,), (2,)), prec) * scale
        if causal:
            sc = _causal_mask(sc)
        p = _softmax_rows(sc)
        _bwd_head(q, k, v, do, p, dqkv_ref, h, heads, hd, scale, prec)


def _fwd_kernel_sm(q_ref, k_ref, v_ref, o_ref, *, scale, causal, prec):
    # S-major variant: refs are [S, BT, 2*D] — a 128-lane block holding TWO
    # heads of the [S, B, 3*H*D] packed array (the layout XLA already uses
    # for 3-D GEMM activations: {2,0,1} on [B,S,W] == [S,B,W] row-major, so
    # the host-side transposes are free bitcasts and no layout copies appear
    # at the custom-call boundary). Two heads per cell keeps the kernel
    # stack small; Mosaic needs dot batch dims at position 0, so slices are
    # transposed to [BT, S, D] in VMEM (major-dim permute).
    d = q_ref.shape[-1] // 2
    for hh in range(2):
        q = q_ref[:, :, hh * d:(hh + 1) * d].transpose(1, 0, 2)
        k = k_ref[:, :, hh * d:(hh + 1) * d].transpose(1, 0, 2)
        v = v_ref[:, :, hh * d:(hh + 1) * d].transpose(1, 0, 2)
        s = _batched_dot(q, k, ((2,), (2,)), prec) * scale       # [BT, S, S]
        if causal:
            s = _causal_mask(s)
        p = _softmax_rows(s).astype(v.dtype)
        o = _batched_dot(p, v, ((2,), (1,)), prec)               # [BT, S, D]
        o_ref[:, :, hh * d:(hh + 1) * d] = \
            o.transpose(1, 0, 2).astype(o_ref.dtype)


def _bwd_kernel_sm(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                   scale, causal, prec):
    d = q_ref.shape[-1] // 2
    for hh in range(2):
        q = q_ref[:, :, hh * d:(hh + 1) * d].transpose(1, 0, 2)
        k = k_ref[:, :, hh * d:(hh + 1) * d].transpose(1, 0, 2)
        v = v_ref[:, :, hh * d:(hh + 1) * d].transpose(1, 0, 2)
        do = do_ref[:, :, hh * d:(hh + 1) * d].transpose(1, 0, 2)
        s = _batched_dot(q, k, ((2,), (2,)), prec) * scale       # [BT,Sq,Sk]
        if causal:
            s = _causal_mask(s)
        p = _softmax_rows(s)
        pc = p.astype(v.dtype)
        dv = _batched_dot(pc, do, ((1,), (1,)), prec)            # [BT,Sk,D]
        dp = _batched_dot(do, v, ((2,), (2,)), prec)             # [BT,Sq,Sk]
        ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
              * scale).astype(q.dtype)
        dq = _batched_dot(ds, k, ((2,), (1,)), prec)             # [BT,Sq,D]
        dk = _batched_dot(ds, q, ((1,), (1,)), prec)             # [BT,Sk,D]
        dq_ref[:, :, hh * d:(hh + 1) * d] = \
            dq.transpose(1, 0, 2).astype(dq_ref.dtype)
        dk_ref[:, :, hh * d:(hh + 1) * d] = \
            dk.transpose(1, 0, 2).astype(dk_ref.dtype)
        dv_ref[:, :, hh * d:(hh + 1) * d] = \
            dv.transpose(1, 0, 2).astype(dv_ref.dtype)


def _sm_tile(b, s, w3):
    bt = _pick_batch_tile(b, s, w3, 0, budget=2 * 1024 * 1024)
    return max(bt, 8)


def _sm_specs(s, bt, heads, d, grid_w):
    """Input views selecting the q/k/v lane blocks of [S, B, 3*H*D] for
    grid cell (i, j): j-th pair of heads, i-th batch tile. Index maps are in
    units of the (s, bt, 2*d) block."""
    def spec(plane):
        return pl.BlockSpec(
            (s, bt, 2 * d),
            lambda i, j, plane=plane: (0, i, plane * (heads // 2) + j))
    return [spec(0), spec(1), spec(2)]


def _fwd_sm(qkv_t, heads, scale, causal, interpret):
    s, b, w3 = qkv_t.shape
    w = w3 // 3
    d = w // heads
    bt = _sm_tile(b, s, w3)
    grid = (b // bt, heads // 2)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_sm, scale=scale, causal=causal,
                          prec=_precision_for(qkv_t.dtype)),
        grid=grid,
        in_specs=_sm_specs(s, bt, heads, d, grid[1]),
        out_specs=pl.BlockSpec((s, bt, 2 * d), lambda i, j: (0, i, j)),
        out_shape=jax.ShapeDtypeStruct((s, b, w), qkv_t.dtype),
        interpret=interpret,
    )(qkv_t, qkv_t, qkv_t)


def _bwd_sm(qkv_t, do_t, heads, scale, causal, interpret):
    s, b, w3 = qkv_t.shape
    w = w3 // 3
    d = w // heads
    bt = _sm_tile(b, s, w3)
    grid = (b // bt, heads // 2)
    io_spec = pl.BlockSpec((s, bt, 2 * d), lambda i, j: (0, i, j))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel_sm, scale=scale, causal=causal,
                          prec=_precision_for(qkv_t.dtype)),
        grid=grid,
        in_specs=_sm_specs(s, bt, heads, d, grid[1]) + [io_spec],
        out_specs=[io_spec, io_spec, io_spec],
        out_shape=[jax.ShapeDtypeStruct((s, b, w), qkv_t.dtype)] * 3,
        interpret=interpret,
    )(qkv_t, qkv_t, qkv_t, do_t)
    return jnp.concatenate([dq, dk, dv], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def fused_mha_packed_sm(qkv, heads: int, scale: float, causal: bool = False,
                        interpret: bool = False):
    """S-major twin of fused_mha_packed: same [B,S,3W]->[B,S,W] contract,
    but the kernel operates on [S,B,*] views so the transposes on either
    side cancel against XLA's {2,0,1} activation layout (bitcasts)."""
    return _fwd_sm(qkv.transpose(1, 0, 2), heads, scale, causal,
                   interpret).transpose(1, 0, 2)


def _fused_sm_fwd(qkv, heads, scale, causal, interpret):
    return fused_mha_packed_sm(qkv, heads, scale, causal, interpret), qkv


def _fused_sm_bwd(heads, scale, causal, interpret, qkv, do):
    dqkv_t = _bwd_sm(qkv.transpose(1, 0, 2), do.transpose(1, 0, 2),
                     heads, scale, causal, interpret)
    return (dqkv_t.transpose(1, 0, 2),)


fused_mha_packed_sm.defvjp(_fused_sm_fwd, _fused_sm_bwd)


def _precision_for(dtype):
    # fp32 inputs need HIGHEST on the TPU MXU or parity degrades to ~1e-3
    # (default is a single bf16 pass) — same finding as flash_attention.py.
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None)


def _save_probs_default() -> bool:
    import os
    return os.environ.get("MCT_MHA_SAVE_PROBS", "1") == "1"


def _fwd(qkv, heads, scale, causal, interpret):
    """Returns (o [B,S,W], p [B,S,H*S] saved softmax probabilities)."""
    b, s, w3 = qkv.shape
    w = w3 // 3
    bt = _pick_batch_tile(b, s, w3, heads)
    out, p = pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, scale=scale,
                          causal=causal, prec=_precision_for(qkv.dtype)),
        grid=(b // bt,),
        in_specs=[pl.BlockSpec((bt, s, w3), lambda i: (i, 0, 0))],
        out_specs=[pl.BlockSpec((bt, s, w), lambda i: (i, 0, 0)),
                   pl.BlockSpec((bt, s, heads * s), lambda i: (i, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((b, s, w), qkv.dtype),
                   jax.ShapeDtypeStruct((b, s, heads * s), qkv.dtype)],
        interpret=interpret,
    )(qkv)
    return out, p


def _bwd(qkv, do, p, heads, scale, causal, interpret):
    b, s, w3 = qkv.shape
    w = w3 // 3
    # The bwd cell additionally streams the saved probabilities (when kept)
    # and the packed dqkv output: account for them so the stack fits the
    # 16M scoped-vmem limit (observed overflow: ViT-L text tower, s=77
    # w3=2304 H=12 at bt=8 -> 16.54M). A slightly larger budget keeps every
    # previously-working shape at its measured-fast tile.
    extra = s * w3 * 2 + (s * heads * s * 2 if p is not None else 0)
    bt = _pick_batch_tile(b, s, w3, heads, budget=6 * 1024 * 1024,
                          extra_per_row=extra)
    in_specs = [pl.BlockSpec((bt, s, w3), lambda i: (i, 0, 0)),
                pl.BlockSpec((bt, s, w), lambda i: (i, 0, 0))]
    operands = [qkv, do]
    if p is not None:
        kern = _bwd_kernel
        in_specs.append(pl.BlockSpec((bt, s, heads * s), lambda i: (i, 0, 0)))
        operands.append(p)
    else:
        kern = _bwd_kernel_recompute
    dqkv = pl.pallas_call(
        functools.partial(kern, heads=heads, scale=scale,
                          causal=causal, prec=_precision_for(qkv.dtype)),
        grid=(b // bt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bt, s, w3), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, w3), qkv.dtype),
        interpret=interpret,
    )(*operands)
    return dqkv


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def fused_mha_packed(qkv, heads: int, scale: float, causal: bool = False,
                     interpret: bool = False):
    """qkv: [B, S, 3*H*D] raw QKV GEMM output (q|k|v each H*D wide).
    Returns attention output [B, S, H*D].

    Softmax in fp32; matmuls accumulate fp32. The softmax probabilities are
    saved (bf16) for the backward pass."""
    return _fwd(qkv, heads, scale, causal, interpret)[0]


def _fused_fwd(qkv, heads, scale, causal, interpret):
    out, p = _fwd(qkv, heads, scale, causal, interpret)
    if not _save_probs_default():
        p = None
    return out, (qkv, p)


def _fused_bwd(heads, scale, causal, interpret, res, do):
    qkv, p = res
    return (_bwd(qkv, do, p, heads, scale, causal, interpret),)


fused_mha_packed.defvjp(_fused_fwd, _fused_bwd)


def _fwd_kernel_dropout(q_ref, k_ref, v_ref, m_ref, o_ref, *, hp, scale,
                        causal, prec):
    """Forward with attention-probability dropout. Grid is (batch-tile,
    head-group): each cell sees `hp` heads' q/k/v [BT,S,hp*D] (hp chosen so
    the lane block is a 128 multiple — TPU block rule) plus their
    [BT,hp,S,S] mask of pre-scaled keep multipliers (0.0 or 1/(1-rate))
    applied to the softmax probabilities before the AV matmul — megatron
    CoreAttention attention_dropout semantics (ops/attention._drop_probs).
    Small cells keep the mask block inside the kernel stack (a whole-row
    cell overflows scoped vmem at s=512/h=12)."""
    hd = q_ref.shape[-1] // hp
    for hh in range(hp):
        q = q_ref[:, :, hh * hd:(hh + 1) * hd]
        k = k_ref[:, :, hh * hd:(hh + 1) * hd]
        v = v_ref[:, :, hh * hd:(hh + 1) * hd]
        s = _batched_dot(q, k, ((2,), (2,)), prec) * scale
        if causal:
            s = _causal_mask(s)
        p = _softmax_rows(s)
        u = (p * m_ref[:, hh].astype(jnp.float32)).astype(v.dtype)
        o = _batched_dot(u, v, ((2,), (1,)), prec)
        o_ref[:, :, hh * hd:(hh + 1) * hd] = o.astype(o_ref.dtype)


def _bwd_kernel_dropout(q_ref, k_ref, v_ref, do_ref, m_ref, dq_ref, dk_ref,
                        dv_ref, *, hp, scale, causal, prec):
    """Backward with dropout: o = (P∘M)V, so dV = (P∘M)^T dO and the
    softmax vjp runs on dP = (dO V^T)∘M. Scores/probs recomputed from qkv
    (the mask is regenerated host-side from the saved PRNG key)."""
    hd = q_ref.shape[-1] // hp
    for hh in range(hp):
        q = q_ref[:, :, hh * hd:(hh + 1) * hd]
        k = k_ref[:, :, hh * hd:(hh + 1) * hd]
        v = v_ref[:, :, hh * hd:(hh + 1) * hd]
        do = do_ref[:, :, hh * hd:(hh + 1) * hd]
        m = m_ref[:, hh].astype(jnp.float32)
        sc = _batched_dot(q, k, ((2,), (2,)), prec) * scale
        if causal:
            sc = _causal_mask(sc)
        p = _softmax_rows(sc)
        u = (p * m).astype(v.dtype)
        dv = _batched_dot(u, do, ((1,), (1,)), prec)
        dp = _batched_dot(do, v, ((2,), (2,)), prec) * m
        ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
              * scale).astype(q.dtype)
        dq_ref[:, :, hh * hd:(hh + 1) * hd] = \
            _batched_dot(ds, k, ((2,), (1,)), prec).astype(dq_ref.dtype)
        dk_ref[:, :, hh * hd:(hh + 1) * hd] = \
            _batched_dot(ds, q, ((1,), (1,)), prec).astype(dk_ref.dtype)
        dv_ref[:, :, hh * hd:(hh + 1) * hd] = dv.astype(dv_ref.dtype)


def _dropout_mask(key, b, s, heads, rate, dtype):
    """Pre-scaled keep multipliers [B, H, S, S]. Deterministic in `key`: the
    backward regenerates the identical mask instead of saving it (3.3 GB at
    ViT-L-scale) — the residual is just the key."""
    keep = jax.random.bernoulli(key, 1.0 - rate, (b, heads, s, s))
    return keep.astype(dtype) * (1.0 / (1.0 - rate))


def _heads_per_cell(heads: int, hd: int):
    """Head-group size making the q/k/v lane block a multiple of 128 (TPU
    block-shape rule); None if the geometry can't satisfy it."""
    if 128 % hd != 0:
        return None
    hp = max(1, 128 // hd)
    return hp if heads % hp == 0 else None


def dropout_kernel_eligible(s: int, heads: int, hd: int,
                            budget: int = 10 * 1024 * 1024) -> bool:
    """Dropout-kernel dispatch gate: lane geometry must work and one cell
    (hp mask planes + fp32 [S,S] scratch) must fit the kernel stack at
    batch-tile 1; anything else falls back to the XLA path."""
    hp = _heads_per_cell(heads, hd)
    if hp is None:
        return False
    return hp * s * s * 2 + 3 * s * s * 4 <= budget


def dropout_mask_fits(s: int, heads: int, budget: int = 8 * 1024 * 1024):
    """Back-compat shim (older gate); prefer dropout_kernel_eligible."""
    return s * s * (2 + 3 * 4) <= budget


def _dropout_tile(b, s, hd, hp):
    # per-row cell bytes: q/k/v/do/out blocks + hp mask planes + ~3 fp32
    # [S,S] scratch
    per_row = 5 * s * hp * hd * 2 + hp * s * s * 2 + 3 * s * s * 4
    bt = 1
    while bt < b and b % (bt * 2) == 0 and (bt * 2) * per_row <= 4 * 1024 * 1024:
        bt *= 2
    return bt


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def fused_mha_packed_dropout(qkv, key, heads: int, scale: float,
                             causal: bool = False, rate: float = 0.1,
                             interpret: bool = False):
    """fused_mha_packed with attention-probability dropout (rate > 0,
    `key` a jax PRNG key). Megatron trains GPT/BERT with
    --attention-dropout 0.1 by default (arguments.py); this keeps those
    workloads on the fused kernel instead of the decomposed XLA path."""
    out, _ = _fwd_dropout(qkv, key, heads, scale, causal, rate, interpret)
    return out


def _dropout_specs(bt, s, hd, hp, groups):
    """Head-group q/k/v views of the packed [B,S,3*H*D] array + the group's
    [BT,hp,S,S] mask planes of [B,H,S,S]."""
    return [
        pl.BlockSpec((bt, s, hp * hd), lambda i, j: (i, 0, j)),
        pl.BlockSpec((bt, s, hp * hd), lambda i, j, G=groups: (i, 0, G + j)),
        pl.BlockSpec((bt, s, hp * hd),
                     lambda i, j, G=groups: (i, 0, 2 * G + j)),
        pl.BlockSpec((bt, hp, s, s), lambda i, j: (i, j, 0, 0)),
    ]


def _fwd_dropout(qkv, key, heads, scale, causal, rate, interpret):
    b, s, w3 = qkv.shape
    w = w3 // 3
    hd = w // heads
    hp = _heads_per_cell(heads, hd)
    if hp is None:
        raise ValueError(f"dropout kernel ineligible for heads={heads} "
                         f"hd={hd}; gate with dropout_kernel_eligible")
    groups = heads // hp
    mask = _dropout_mask(key, b, s, heads, rate, qkv.dtype)
    bt = _dropout_tile(b, s, hd, hp)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_dropout, hp=hp, scale=scale,
                          causal=causal, prec=_precision_for(qkv.dtype)),
        grid=(b // bt, groups),
        in_specs=_dropout_specs(bt, s, hd, hp, groups),
        out_specs=pl.BlockSpec((bt, s, hp * hd), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, s, w), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv, qkv, mask)
    return out, (qkv, key)


def _vjp_fwd_dropout(qkv, key, heads, scale, causal, rate, interpret):
    return _fwd_dropout(qkv, key, heads, scale, causal, rate, interpret)


def _vjp_bwd_dropout(heads, scale, causal, rate, interpret, res, do):
    qkv, key = res
    b, s, w3 = qkv.shape
    w = w3 // 3
    hd = w // heads
    hp = _heads_per_cell(heads, hd)
    groups = heads // hp
    mask = _dropout_mask(key, b, s, heads, rate, qkv.dtype)
    bt = _dropout_tile(b, s, hd, hp)
    specs = _dropout_specs(bt, s, hd, hp, groups)
    io = pl.BlockSpec((bt, s, hp * hd), lambda i, j: (i, 0, j))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel_dropout, hp=hp, scale=scale,
                          causal=causal, prec=_precision_for(qkv.dtype)),
        grid=(b // bt, groups),
        in_specs=specs[:3] + [io] + specs[3:],
        out_specs=[io, io, io],
        out_shape=[jax.ShapeDtypeStruct((b, s, w), qkv.dtype)] * 3,
        interpret=interpret,
    )(qkv, qkv, qkv, do, mask)
    return jnp.concatenate([dq, dk, dv], axis=-1), None


fused_mha_packed_dropout.defvjp(_vjp_fwd_dropout, _vjp_bwd_dropout)


def fused_attention_from_qkv(qkv_flat, heads: int, *, causal: bool = False,
                             scale: Optional[float] = None,
                             dropout_rate: float = 0.0, dropout_rng=None,
                             interpret: bool = False):
    """Dispatch wrapper with the default 1/sqrt(D) scale. Layout variant:
    batch-major by default. MCT_MHA_LAYOUT=sm selects the S-major kernel,
    which matches XLA's {2,0,1} GEMM activation layout in principle but
    measured *slower* on v5e (153ms vs 118ms CLIP step: the in-kernel VMEM
    transposes and dq/dk/dv lane concat outweigh the saved boundary
    copies) — kept for future Mosaic versions with batch-dim!=0 dots."""
    import os
    d = qkv_flat.shape[-1] // (3 * heads)
    if scale is None:
        scale = d ** -0.5
    b = qkv_flat.shape[0]
    if dropout_rate > 0.0 and dropout_rng is not None:
        return fused_mha_packed_dropout(qkv_flat, dropout_rng, heads, scale,
                                        causal, dropout_rate, interpret)
    if (os.environ.get("MCT_MHA_LAYOUT", "bm") == "sm"
            and heads % 2 == 0 and b % 8 == 0):
        return fused_mha_packed_sm(qkv_flat, heads, scale, causal, interpret)
    return fused_mha_packed(qkv_flat, heads, scale, causal, interpret)
