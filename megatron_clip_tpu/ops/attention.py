"""Attention ops.

`sdpa` is the numerics oracle (plain jnp, softmax in fp32) replacing the
reference's CoreAttention (megatron/model/transformer.py:282-417: fused
scaled-masked-softmax CUDA kernel + batched matmuls) and open_CLIP's
nn.MultiheadAttention path. The Pallas flash-attention kernel
(ops/pallas/flash_attention.py) replaces the external `flash_attn` CUDA
package (megatron/model/transformer.py:30-35,419-479) and is used on TPU.

Both mask regimes of the reference are supported:
  - causal (text tower / GPT)
  - full / no mask (ViT)
  - additive bias masks (padding) for generality
"""
import os
from typing import Optional

import jax
import jax.numpy as jnp


def _drop_probs(probs, rate, rng):
    """Attention-probability dropout (megatron CoreAttention's
    attention_dropout, model/transformer.py:282-417)."""
    if rate == 0.0 or rng is None:
        return probs
    keep = jax.random.bernoulli(rng, 1.0 - rate, probs.shape)
    return jnp.where(keep, probs / (1.0 - rate), jnp.zeros((), probs.dtype))


def sdpa(q, k, v, *, causal: bool = False, bias: Optional[jax.Array] = None,
         scale: Optional[float] = None, dropout_rate: float = 0.0,
         dropout_rng=None):
    """Scaled dot-product attention, softmax in fp32.

    q: [B, H, Sq, D], k/v: [B, H, Sk, D], bias broadcastable to [B, H, Sq, Sk].
    """
    dtype = q.dtype
    head_dim = q.shape[-1]
    if scale is None:
        scale = head_dim ** -0.5
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=prec,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if causal:
        sq, sk = logits.shape[-2], logits.shape[-1]
        row = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        # offset handles sq != sk (KV-cache decode)
        causal_mask = row + (sk - sq) >= col
        logits = jnp.where(causal_mask, logits, jnp.float32(-1e30))
    probs = _drop_probs(jax.nn.softmax(logits, axis=-1), dropout_rate,
                        dropout_rng)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(dtype), v,
                     precision=prec, preferred_element_type=jnp.float32)
    return out.astype(dtype)


def sdpa_bshd(q, k, v, *, causal: bool = False,
              bias: Optional[jax.Array] = None,
              scale: Optional[float] = None, dropout_rate: float = 0.0,
              dropout_rng=None):
    """Attention with [B, S, H, D] operands — no head transposes: the
    post-attention head merge is a free reshape (profiling showed the BHSD
    path's transpose copies cost ~15% of the CLIP step on v5e)."""
    dtype = q.dtype
    head_dim = q.shape[-1]
    if scale is None:
        scale = head_dim ** -0.5
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, precision=prec,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if causal:
        sq, sk = logits.shape[-2], logits.shape[-1]
        row = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        logits = jnp.where(row + (sk - sq) >= col, logits, jnp.float32(-1e30))
    probs = _drop_probs(jax.nn.softmax(logits, axis=-1), dropout_rate,
                        dropout_rng)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dtype), v,
                     precision=prec, preferred_element_type=jnp.float32)
    return out.astype(dtype)


# below this sequence length XLA's fused attention beats the Pallas kernel's
# padding/tiling overhead (measured on v5e: s2048 comparable, s<256 XLA wins,
# s8192 XLA cannot even materialize the logits)
MIN_FLASH_SEQ = 256


def multi_head_attention(x, params, heads: int, *, causal: bool = False,
                         bias: Optional[jax.Array] = None, use_flash: bool = True,
                         kv: Optional[jax.Array] = None, rope=None,
                         kv_heads: Optional[int] = None,
                         dropout_rate: float = 0.0, dropout_rng=None,
                         context_parallel: bool = False,
                         cp_layout: str = "contiguous"):
    """Full MHA block: fused qkv projection -> attention -> output projection.

    x: [B, S, W]. params: {'wqkv': [W, (H+2Hkv)*hd], 'bqkv', 'wo', 'bo'}.
    `rope`: optional (cos, sin) rotary tables applied to q/k after head split
    (megatron rotary_pos_embedding). `kv_heads` < heads enables grouped-query
    attention (megatron --group-query-attention): k/v heads are shared across
    query-head groups. When `kv` is given (cross-attention, CoCa), params must
    instead hold 'wq' [W, W] and 'wkv' [Wkv, 2W].
    """
    b, s, w = x.shape
    hkv = kv_heads or heads
    if context_parallel:
        if dropout_rate > 0.0 and dropout_rng is not None:
            raise ValueError("context_parallel attention does not support "
                             "attention-prob dropout")
    if kv is None:
        head_dim = params["wqkv"].shape[1] // (heads + 2 * hkv)

        # Short-seq fused path: consume the packed GEMM output directly in a
        # single Pallas kernel (no q/k/v split or head-transpose copies —
        # they cost ~12% of the CLIP step, see ops/pallas/fused_mha.py).
        from megatron_clip_tpu.ops.pallas.fused_mha import (
            MAX_FUSED_SEQ, dropout_kernel_eligible)
        wants_dropout = dropout_rate > 0.0 and dropout_rng is not None
        if (not context_parallel
                and use_flash and bias is None and rope is None and hkv == heads
                and s <= MAX_FUSED_SEQ and head_dim <= 128
                and (not wants_dropout
                     or dropout_kernel_eligible(s, heads, head_dim))):
            from megatron_clip_tpu.ops import use_pallas
            if use_pallas():
                from megatron_clip_tpu.ops.pallas.fused_mha import (
                    fused_attention_from_qkv)
                qkv = jnp.einsum("bsw,wd->bsd", x,
                                 params["wqkv"].astype(x.dtype))
                if params.get("bqkv") is not None:
                    qkv = qkv + params["bqkv"].astype(x.dtype)
                out = fused_attention_from_qkv(
                    qkv, heads, causal=causal,
                    dropout_rate=dropout_rate if wants_dropout else 0.0,
                    dropout_rng=dropout_rng if wants_dropout else None)
                out = jnp.einsum("bsw,wd->bsd", out,
                                 params["wo"].astype(x.dtype))
                if params.get("bo") is not None:
                    out = out + params["bo"].astype(x.dtype)
                return out

        # flash decision BEFORE the packed GEMM: the BHSD flash projection
        # replaces it entirely (leaving a dead packed GEMM would double the
        # QKV FLOPs in eager execution, where there is no DCE)
        head_dim_q = head_dim
        _wants_drop = wants_dropout
        flash_path = (not context_parallel and use_flash and bias is None
                      and s >= MIN_FLASH_SEQ and head_dim <= 128)
        if flash_path:
            from megatron_clip_tpu.ops import use_pallas
            flash_path = use_pallas()
            if flash_path and _wants_drop:
                # in-kernel PRNG dropout needs a real TPU backend
                from megatron_clip_tpu.ops.pallas.flash_attention import (
                    flash_dropout_supported)
                flash_path = flash_dropout_supported()
        bhsd_proj = (flash_path and
                     os.environ.get("MCT_FLASH_PROJ_BHSD", "1") == "1")
        if not bhsd_proj:
            qkv = jnp.einsum("bsw,wd->bsd", x,
                             params["wqkv"].astype(x.dtype))
            if params.get("bqkv") is not None:
                qkv = qkv + params["bqkv"].astype(x.dtype)
            q = qkv[..., :heads * head_dim]
            k = qkv[..., heads * head_dim:(heads + hkv) * head_dim]
            v = qkv[..., (heads + hkv) * head_dim:]
    else:
        q = jnp.einsum("bsw,wd->bsd", x, params["wq"].astype(x.dtype))
        if params.get("bq") is not None:
            q = q + params["bq"].astype(x.dtype)
        kvp = jnp.einsum("bsw,wd->bsd", kv, params["wkv"].astype(kv.dtype))
        if params.get("bkv") is not None:
            kvp = kvp + params["bkv"].astype(kv.dtype)
        k, v = jnp.split(kvp, 2, axis=-1)
        head_dim_q = q.shape[-1] // heads
        _wants_drop = dropout_rate > 0.0 and dropout_rng is not None
        flash_path = bhsd_proj = False

    if context_parallel:
        # Context parallelism: seq is sharded over the `context` mesh axis;
        # attention runs as a ppermute ring with online softmax so each
        # device only ever holds an [S/cp, S/cp] logits tile
        # (ops/ring_attention.py; completes megatron's plumbing-only CP).
        from megatron_clip_tpu.ops.ring_attention import ring_attention
        qh = q.reshape(b, q.shape[1], heads, -1)
        kh = k.reshape(b, k.shape[1], hkv, -1)
        vh = v.reshape(b, v.shape[1], hkv, -1)
        if rope is not None:
            from megatron_clip_tpu.ops.rope import apply_rope_bshd
            cos, sin = rope
            qh = apply_rope_bshd(qh, cos, sin)
            kh = apply_rope_bshd(kh, cos, sin)
        if hkv != heads:
            rep = heads // hkv
            kh = jnp.repeat(kh, rep, axis=2)
            vh = jnp.repeat(vh, rep, axis=2)
        out = ring_attention(qh, kh, vh, causal=causal, layout=cp_layout,
                             bias=bias)
        out = out.reshape(b, s, -1)  # heads*head_dim (== w unless kv_channels)
    elif not flash_path:
        # BSHD layout: no [B,S,H,D]->[B,H,S,D] transposes; head merge after
        # attention is a free reshape
        qh = q.reshape(b, q.shape[1], heads, -1)
        kh = k.reshape(b, k.shape[1], hkv if kv is None else heads, -1)
        vh = v.reshape(b, v.shape[1], hkv if kv is None else heads, -1)
        if rope is not None:
            from megatron_clip_tpu.ops.rope import apply_rope_bshd
            cos, sin = rope
            qh = apply_rope_bshd(qh, cos, sin)
            kh = apply_rope_bshd(kh, cos, sin)
        if kv is None and hkv != heads:
            rep = heads // hkv
            kh = jnp.repeat(kh, rep, axis=2)
            vh = jnp.repeat(vh, rep, axis=2)
        out = sdpa_bshd(qh, kh, vh, causal=causal, bias=bias,
                        dropout_rate=dropout_rate, dropout_rng=dropout_rng)
        out = out.reshape(b, s, -1)  # heads*head_dim (== w unless kv_channels)
    else:
        if bhsd_proj:
            # Project straight into [B,H,S,D] so the head split/transpose is
            # fused into the QKV GEMM epilogue instead of a separate HBM
            # copy pass (the packed GEMM is skipped entirely on this path).
            # Measured +0.6pt MFU on GPT-345m seq2048 (429 vs 435 ms/step);
            # MCT_FLASH_PROJ_BHSD=0 restores the packed layout for A/B.
            hd = head_dim
            wqkv = params["wqkv"].astype(x.dtype)
            wq_ = wqkv[:, :heads * hd].reshape(w, heads, hd)
            wk_ = wqkv[:, heads * hd:(heads + hkv) * hd].reshape(w, hkv, hd)
            wv_ = wqkv[:, (heads + hkv) * hd:].reshape(w, hkv, hd)
            qh = jnp.einsum("bsw,whd->bhsd", x, wq_)
            kh = jnp.einsum("bsw,whd->bhsd", x, wk_)
            vh = jnp.einsum("bsw,whd->bhsd", x, wv_)
            if params.get("bqkv") is not None:
                bqkv = params["bqkv"].astype(x.dtype)
                qh = qh + bqkv[:heads * hd].reshape(1, heads, 1, hd)
                kh = kh + bqkv[heads * hd:(heads + hkv) * hd].reshape(
                    1, hkv, 1, hd)
                vh = vh + bqkv[(heads + hkv) * hd:].reshape(1, hkv, 1, hd)
        else:
            def split_heads(t, h):
                return t.reshape(b, t.shape[1], h, -1).transpose(0, 2, 1, 3)

            qh = split_heads(q, heads)
            kh = split_heads(k, hkv)
            vh = split_heads(v, hkv)
        if rope is not None:
            from megatron_clip_tpu.ops.rope import apply_rope
            cos, sin = rope
            qh = apply_rope(qh, cos, sin)
            kh = apply_rope(kh, cos, sin)
        if hkv != heads:
            rep = heads // hkv
            kh = jnp.repeat(kh, rep, axis=1)
            vh = jnp.repeat(vh, rep, axis=1)
        from megatron_clip_tpu.ops.pallas.flash_attention import flash_attention
        if _wants_drop:
            seed = jax.random.randint(dropout_rng, (), 0, 2**31 - 1,
                                      dtype=jnp.int32)
            out = flash_attention(qh, kh, vh, causal=causal,
                                  dropout_rate=dropout_rate,
                                  dropout_seed=seed)
        else:
            out = flash_attention(qh, kh, vh, causal=causal)
        if bhsd_proj:
            # fuse the inverse transpose into the output-projection GEMM
            wo_ = params["wo"].astype(x.dtype).reshape(heads, head_dim_q, -1)
            out = jnp.einsum("bhsd,hdw->bsw", out, wo_)
            if params.get("bo") is not None:
                out = out + params["bo"].astype(x.dtype)
            return out
        out = out.transpose(0, 2, 1, 3).reshape(b, s, -1)
    out = jnp.einsum("bsw,wd->bsd", out, params["wo"].astype(x.dtype))
    if params.get("bo") is not None:
        out = out + params["bo"].astype(x.dtype)
    return out
