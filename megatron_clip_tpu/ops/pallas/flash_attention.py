"""Pallas TPU flash attention — forward and backward.

Replaces the external `flash_attn` CUDA package the reference wraps in
`FlashSelfAttention` (megatron/model/transformer.py:30-35,419-479) and the
fused scaled-masked-softmax kernels it subsumes
(megatron/core/fusions/fused_softmax.py). Supports the reference's two mask
regimes: full (ViT) and causal (text/GPT). Online-softmax tiling keeps the
S×S logits out of HBM; backward recomputes probabilities from the saved
log-sum-exp (standard flash-attention-2 style), all in fp32 accumulation on
the MXU.

Layout: q,k,v [B, H, S, D]; the kernels run on [B*H, S, D] with a
(bh, q_block, k_block) grid. Sequence lengths are padded to the 128 block;
padded key columns are masked to -inf, padded query rows are sliced off.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 128
NEG_INF = -1e30


def _cdiv(a, b):
    return -(-a // b)


def _drop_keep(seed_ref, b, qi, kj, shape, rate):
    """Per-tile dropout keep multipliers {0, 1/(1-rate)} from the on-core
    PRNG, seeded by (base_seed, bh, q-block, k-block) — the same tile in the
    forward, dq and dkv kernels draws the IDENTICAL mask, so nothing is
    saved to HBM. (megatron attention_dropout semantics; flash_attn's CUDA
    kernel uses the same per-tile philox trick.)"""
    # Mosaic caps prng_seed at 2 values: fold the batch*head index into the
    # seed word with an odd multiplicative hash (injective mod 2^32 — no
    # aliasing at any B*H, unlike packing bh into high bits which overflows
    # at bh >= 2^11) and pack (q-block, k-block) into the second word
    # (collision-free below seq 2^17 at the 128 block minimum).
    tile = qi * (1 << 10) + kj
    pltpu.prng_seed(seed_ref[0] ^ (b * jnp.int32(-1640531527)), tile)
    bits = pltpu.prng_random_bits(shape)
    # prng_random_bits yields int32; bitcast to uint32 for a clean threshold
    u = pltpu.bitcast(bits, jnp.uint32)
    thresh = jnp.uint32(min(int((1.0 - rate) * 2**32), 2**32 - 1))
    return jnp.where(u < thresh, jnp.float32(1.0 / (1.0 - rate)),
                     jnp.float32(0.0))


def _prec(dtype):
    # fp32 inputs need 3-pass (HIGHEST) MXU precision; bf16 uses the fast path
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def _interpret() -> bool:
    # run kernels in interpreter mode off-TPU (CPU tests)
    return jax.default_backend() not in ("tpu", "axon")


# --------------------------- forward kernel ---------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, seed_ref, o_ref, lse_ref, m_scr, l_scr,
                acc_scr, *, scale, causal, block_q, block_k, num_k_blocks,
                kv_len, rate):
    kj = pl.program_id(2)
    qi = pl.program_id(1)

    @pl.when(kj == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    def _compute():
        q = q_ref[0]                    # [BQ, D]
        k = k_ref[0]                    # [BK, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(q.dtype)) * scale  # [BQ, BK]
        col = kj * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        if causal:
            row = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            s = jnp.where(row >= col, s, NEG_INF)
        if kv_len % block_k:
            s = jnp.where(col < kv_len, s, NEG_INF)  # mask padded key columns

        m_prev = m_scr[:]               # [BQ, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)          # [BQ, BK]
        corr = jnp.exp(m_prev - m_new)  # [BQ, 1]
        # dropout multiplies the NORMALIZED probabilities; since the final
        # division by l is linear, mask the unnormalized p in the AV
        # accumulation while l keeps the undropped sum
        l_scr[:] = corr * l_scr[:] + jnp.sum(p, axis=1, keepdims=True)
        pd = p
        if rate > 0.0:
            pd = p * _drop_keep(seed_ref, pl.program_id(0), qi, kj,
                                (block_q, block_k), rate)
        pv = jax.lax.dot_general(
            pd.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_prec(v_ref.dtype))
        acc_scr[:] = corr * acc_scr[:] + pv
        m_scr[:] = m_new

    if causal:
        # skip blocks fully above the diagonal
        @pl.when(kj * block_k <= qi * block_q + block_q - 1)
        def _():
            _compute()
    else:
        _compute()

    @pl.when(kj == num_k_blocks - 1)
    def _finalize():
        l = l_scr[:]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
        lse_ref[0, 0, pl.ds(qi * block_q, block_q)] = \
            (m_scr[:] + jnp.log(l_safe))[:, 0]


def _flash_fwd(q, k, v, seed, *, scale, causal, block_q, block_k, kv_len,
               rate=0.0):
    bh, sq, d = q.shape
    sk = k.shape[1]
    nq, nk = sq // block_q, sk // block_k
    kernel = functools.partial(
        _fwd_kernel, scale=scale, causal=causal, block_q=block_q,
        block_k=block_k, num_k_blocks=nk, kv_len=kv_len, rate=rate)
    out, lse = pl.pallas_call(
        kernel,
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1, sq), lambda b, i, j: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, sq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(q, k, v, seed)
    return out, lse


# --------------------------- backward kernels --------------------------------

def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, seed_ref,
                   dq_ref, dq_scr, *, scale, causal, block_q, block_k,
                   num_k_blocks, kv_len, rate):
    kj = pl.program_id(2)
    qi = pl.program_id(1)

    @pl.when(kj == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=_prec(q.dtype)) * scale
        col = kj * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        if causal:
            row = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            s = jnp.where(row >= col, s, NEG_INF)
        if kv_len % block_k:
            s = jnp.where(col < kv_len, s, NEG_INF)
        lse_q = lse_ref[0, 0, pl.ds(qi * block_q, block_q)].reshape(block_q, 1)
        delta_q = delta_ref[0, 0, pl.ds(qi * block_q, block_q)].reshape(block_q, 1)
        p = jnp.exp(s - lse_q)                                   # [BQ, BK]
        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(v_ref.dtype))                        # [BQ, BK]
        if rate > 0.0:
            # o = (P.M)V => dP = (dO V^T).M; the delta term is unchanged:
            # sum_k P.M dP = dO.o = delta (derivation in the dropout tests)
            dp = dp * _drop_keep(seed_ref, pl.program_id(0), qi, kj,
                                 (block_q, block_k), rate)
        ds = p * (dp - delta_q) * scale
        dq_scr[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_prec(k.dtype))

    if causal:
        @pl.when(kj * block_k <= qi * block_q + block_q - 1)
        def _():
            _compute()
    else:
        _compute()

    @pl.when(kj == num_k_blocks - 1)
    def _finalize():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, seed_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr,
                    *, scale, causal, block_q, block_k, num_q_blocks, kv_len,
                    rate):
    qi = pl.program_id(2)
    kj = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    def _compute():
        q = q_ref[0]                                              # [BQ, D]
        k = k_ref[0]                                              # [BK, D]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=_prec(q.dtype)) * scale
        col = kj * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        if causal:
            row = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            s = jnp.where(row >= col, s, NEG_INF)
        if kv_len % block_k:
            s = jnp.where(col < kv_len, s, NEG_INF)
        lse_q = lse_ref[0, 0, pl.ds(qi * block_q, block_q)].reshape(block_q, 1)
        delta_q = delta_ref[0, 0, pl.ds(qi * block_q, block_q)].reshape(block_q, 1)
        p = jnp.exp(s - lse_q)                                    # [BQ, BK]
        do = do_ref[0]                                            # [BQ, D]
        pd = p
        if rate > 0.0:
            keep = _drop_keep(seed_ref, pl.program_id(0), qi, kj,
                              (block_q, block_k), rate)
            pd = p * keep
        dv_scr[:] += jax.lax.dot_general(
            pd.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(do.dtype))                            # [BK, D]
        dp = jax.lax.dot_general(do, v_ref[0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=_prec(do.dtype))
        if rate > 0.0:
            dp = dp * keep
        ds = p * (dp - delta_q) * scale                           # [BQ, BK]
        dk_scr[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(q.dtype))                             # [BK, D]

    if causal:
        # skip q blocks fully above the diagonal for this k block
        @pl.when(qi * block_q + block_q - 1 >= kj * block_k)
        def _():
            _compute()
    else:
        _compute()

    @pl.when(qi == num_q_blocks - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_fused_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                      seed_ref, dqp_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                      *, scale, causal, block_q, block_k, num_q_blocks,
                      kv_len, rate):
    """One pass over (k-block, q-block) tiles producing dk/dv (VMEM
    accumulators over the inner q sweep) AND per-k-block dq partials
    (summed outside). vs the split dq/dkv kernels this recomputes the
    score matrix and dP once instead of twice — 5 MXU passes per tile
    instead of 7 — and reads q/k/v/do from HBM once instead of twice."""
    qi = pl.program_id(2)
    kj = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    def _compute():
        q = q_ref[0]                                              # [BQ, D]
        k = k_ref[0]                                              # [BK, D]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=_prec(q.dtype)) * scale
        col = kj * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        if causal:
            row = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            s = jnp.where(row >= col, s, NEG_INF)
        if kv_len % block_k:
            s = jnp.where(col < kv_len, s, NEG_INF)
        lse_q = lse_ref[0, 0, pl.ds(qi * block_q, block_q)].reshape(block_q, 1)
        delta_q = delta_ref[0, 0, pl.ds(qi * block_q, block_q)].reshape(
            block_q, 1)
        p = jnp.exp(s - lse_q)                                    # [BQ, BK]
        do = do_ref[0]                                            # [BQ, D]
        pd = p
        keep = None
        if rate > 0.0:
            keep = _drop_keep(seed_ref, pl.program_id(0), qi, kj,
                              (block_q, block_k), rate)
            pd = p * keep
        dv_scr[:] += jax.lax.dot_general(
            pd.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(do.dtype))                            # [BK, D]
        dp = jax.lax.dot_general(do, v_ref[0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=_prec(do.dtype))
        if rate > 0.0:
            dp = dp * keep
        ds = p * (dp - delta_q) * scale                           # [BQ, BK]
        dk_scr[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(q.dtype))                             # [BK, D]
        dqp_ref[0, 0] = jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(k.dtype))                             # [BQ, D]

    if causal:
        live = qi * block_q + block_q - 1 >= kj * block_k

        @pl.when(live)
        def _():
            _compute()

        # skipped tiles above the diagonal must still zero their dq partial
        @pl.when(jnp.logical_not(live))
        def _zero():
            dqp_ref[0, 0] = jnp.zeros_like(dqp_ref[0, 0])
    else:
        _compute()

    @pl.when(qi == num_q_blocks - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd_fused(q, k, v, out, lse, do, seed, *, scale, causal, block_q,
                     block_k, kv_len, rate=0.0):
    bh, sq, d = q.shape
    sk = k.shape[1]
    nq, nk = sq // block_q, sk // block_k
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)[:, None, :]                           # [BH, 1, S]

    dqp, dk, dv = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, scale=scale, causal=causal,
                          block_q=block_q, block_k=block_k, num_q_blocks=nq,
                          kv_len=kv_len, rate=rate),
        grid=(bh, nk, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, 1, sq), lambda b, j, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, sq), lambda b, j, i: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b, j, i: (b, j, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nk, sq, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, sk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, sk, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(q, k, v, do, lse, delta, seed)
    dq = jnp.sum(dqp, axis=1).astype(q.dtype)
    return dq, dk, dv


def _use_fused_bwd() -> bool:
    import os
    return os.environ.get("MCT_FLASH_SPLIT_BWD", "0") != "1"


def _flash_bwd(q, k, v, out, lse, do, seed, *, scale, causal, block_q,
               block_k, kv_len, rate=0.0):
    # the fused kernel's fp32 dq-partials buffer is nk x the dq size; gate
    # on nk so very long sequences (s 8k+ at small blocks) fall back to the
    # split kernels instead of ballooning transient HBM
    if _use_fused_bwd() and k.shape[1] // block_k <= 4:
        return _flash_bwd_fused(q, k, v, out, lse, do, seed, scale=scale,
                                causal=causal, block_q=block_q,
                                block_k=block_k, kv_len=kv_len, rate=rate)
    bh, sq, d = q.shape
    sk = k.shape[1]
    nq, nk = sq // block_q, sk // block_k
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)[:, None, :]                           # [BH, 1, S]

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, causal=causal,
                          block_q=block_q, block_k=block_k, num_k_blocks=nk,
                          kv_len=kv_len, rate=rate),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1, sq), lambda b, i, j: (b, 0, 0)),
            pl.BlockSpec((1, 1, sq), lambda b, i, j: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(q, k, v, do, lse, delta, seed)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, causal=causal,
                          block_q=block_q, block_k=block_k, num_q_blocks=nq,
                          kv_len=kv_len, rate=rate),
        grid=(bh, nk, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, 1, sq), lambda b, j, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, sq), lambda b, j, i: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, sk, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(q, k, v, do, lse, delta, seed)
    return dq, dk, dv


# --------------------------- public op ---------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _flash(q, k, v, seed, scale, causal, block_q, block_k, kv_len, rate):
    out, _ = _flash_fwd(q, k, v, seed, scale=scale, causal=causal,
                        block_q=block_q, block_k=block_k, kv_len=kv_len,
                        rate=rate)
    return out


def _flash_fwd_rule(q, k, v, seed, scale, causal, block_q, block_k, kv_len,
                    rate):
    out, lse = _flash_fwd(q, k, v, seed, scale=scale, causal=causal,
                          block_q=block_q, block_k=block_k, kv_len=kv_len,
                          rate=rate)
    # Name the kernel outputs so a remat policy can save them: under the
    # plain dots policy the pallas outputs are not saveable and backward
    # replays the whole forward kernel just to rebuild (out, lse). Saving
    # them costs 1W/token + a row of lse and removes 2 of the 9 attention
    # MXU passes — megatron's flash selective-recompute saves exactly this
    # pair (flash_attn softmax_lse + out).
    from jax.ad_checkpoint import checkpoint_name
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, seed, out, lse)


def _flash_bwd_rule(scale, causal, block_q, block_k, kv_len, rate, res, do):
    q, k, v, seed, out, lse = res
    dq, dk, dv = _flash_bwd(q, k, v, out, lse, do, seed, scale=scale,
                            causal=causal, block_q=block_q, block_k=block_k,
                            kv_len=kv_len, rate=rate)
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(q, k, v, *, causal: bool = False, scale=None,
                    block_q: int = 0, block_k: int = 0,
                    dropout_rate: float = 0.0, dropout_seed=None):
    """q,k,v: [B, H, S, D] -> [B, H, S, D]. Pads S to the block size (padded
    key columns are masked; padded query rows sliced off). Block sizes auto-
    tune to min(1024, padded seq) — measured 6x faster than 128x128 at s8192
    on v5e (VMEM easily holds the 1024x1024 fp32 score tile).

    dropout_rate > 0 applies attention-probability dropout (megatron
    --attention-dropout) with the on-core PRNG: each (bh, q-block, k-block)
    tile draws its mask from (dropout_seed, tile id), identically in the
    forward and both backward kernels — no mask is ever materialized. TPU
    only (CPU interpret mode has no prng lowering): callers gate on
    flash_dropout_supported()."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    # 1024 blocks win at every measured config, including causal: the
    # tighter triangle tiling of 512 blocks (10/16 of the square vs 3/4)
    # does NOT pay for the smaller MXU tiles — measured 32.4% vs 37.2% MFU
    # on GPT-345m/seq2048/v5e. MCT_FLASH_BLOCK overrides for tuning.
    import os
    env_blk = int(os.environ.get("MCT_FLASH_BLOCK", "0"))
    default_blk = env_blk if env_blk else 1024
    if not block_q:
        block_q = min(default_blk, _cdiv(sq, DEFAULT_BLOCK) * DEFAULT_BLOCK)
    if not block_k:
        block_k = min(default_blk, _cdiv(sk, DEFAULT_BLOCK) * DEFAULT_BLOCK)

    sq_pad = _cdiv(sq, block_q) * block_q
    sk_pad = _cdiv(sk, block_k) * block_k

    def flat(t, s_pad, s):
        t = t.reshape(b * h, t.shape[2], d)
        if s_pad != s:
            t = jnp.pad(t, ((0, 0), (0, s_pad - s), (0, 0)))
        return t

    rate = float(dropout_rate)
    if rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    if dropout_seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(dropout_seed, jnp.int32).reshape((1,))

    qf, kf, vf = flat(q, sq_pad, sq), flat(k, sk_pad, sk), flat(v, sk_pad, sk)
    out = _flash(qf, kf, vf, seed, float(scale), bool(causal),
                 min(block_q, sq_pad), min(block_k, sk_pad), sk, rate)
    out = out[:, :sq].reshape(b, h, sq, d)
    return out


def flash_dropout_supported() -> bool:
    """In-kernel PRNG needs a real TPU backend (no interpret lowering)."""
    return not _interpret()
