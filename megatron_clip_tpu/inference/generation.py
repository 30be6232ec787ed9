"""Autoregressive generation with a static KV cache.

Replaces the reference's text-generation stack (megatron/text_generation/
generation.py + forward_step.py InferenceParams KV cache + sampling.py):
  - the KV cache is a preallocated [L, B, Hkv, S_max, D] array pair (static
    shapes — XLA-friendly; the reference's InferenceParams does the same with
    torch buffers);
  - prefill runs the whole prompt once and fills the cache;
  - decode is a `lax.scan` of single-token steps, entirely inside one jit —
    no per-token host round-trips (the reference dispatches per token and
    broadcasts logits between pipeline stages, communication.py:185);
  - sampling: greedy / temperature / top-k / top-p (sampling.py semantics).
"""
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from megatron_clip_tpu.config import TransformerCfg
from megatron_clip_tpu.models.gpt import GPTCfg
from megatron_clip_tpu.nn.transformer import apply_norm
from megatron_clip_tpu.ops.attention import sdpa
from megatron_clip_tpu.ops.activations import bias_act, swiglu
from megatron_clip_tpu.ops.rope import rope_cos_sin, apply_rope


class KVCache(NamedTuple):
    k: jax.Array  # [L, B, Hkv, S_max, D]
    v: jax.Array

    @classmethod
    def create(cls, cfg: GPTCfg, batch: int, max_len: int, dtype=jnp.bfloat16):
        t = cfg.transformer()
        hkv = t.kv_heads or t.heads
        shape = (t.layers, batch, hkv, max_len, t.head_dim)
        k = jnp.zeros(shape, dtype)
        return cls(_cache_constraint(k), _cache_constraint(jnp.zeros_like(k)))


def _cache_constraint(c):
    """Serving under a mesh (megatron's TP inference,
    text_generation/communication.py): pin the KV cache to kv-heads over
    `tensor` and batch over the data axes so the decode scan keeps the same
    layout as the TP-sharded attention instead of gathering per step. No-op
    without an active mesh."""
    amesh = jax.sharding.get_abstract_mesh()
    names = set(amesh.axis_names) if amesh is not None else set()
    from megatron_clip_tpu.parallel.mesh import DATA, FSDP, TENSOR
    if TENSOR not in names:
        return c
    from jax.sharding import PartitionSpec as P
    batch = c.shape[1]
    # only shard the batch dim if it divides evenly (a single-prompt decode
    # on a dp>1 serving mesh must not crash on the constraint)
    baxes = tuple(a for a in (DATA, FSDP) if a in names)
    bsz = 1
    for a in baxes:
        bsz *= amesh.shape[a]
    batch_axes = baxes if baxes and batch % bsz == 0 else None
    hkv = c.shape[2]
    tp = amesh.shape[TENSOR]
    head_axis = TENSOR if hkv % tp == 0 else None
    return jax.lax.with_sharding_constraint(
        c, P(None, batch_axes, head_axis, None, None))


def _dense(x, w):
    """Decode projection: fp einsum, or int8 x int8 -> int32 MXU matmul when
    `w` is a quantize_decode_weights leaf ({"q","scale"}) — int8 weights
    halve the weight-streaming bound that dominates decode latency."""
    from megatron_clip_tpu.ops.quant import is_quantized_weight
    if is_quantized_weight(w):
        from megatron_clip_tpu.ops.quant import int8_matmul
        return int8_matmul(x, w["q"], w["scale"].reshape(1, -1))
    return jnp.einsum("btw,wd->btd", x, w.astype(x.dtype))


def _block_decode(block, x, cache_k, cache_v, pos, cfg: TransformerCfg, rope):
    """One block, one (or P prompt) tokens, reading/writing the cache.
    x: [B, T, W]; cache_[kv]: [B, Hkv, S_max, D]; pos: scalar write offset
    shared by all rows, or a [B] int32 vector of per-row offsets (ragged
    prompts: each row in-fills at its own length, megatron
    text_generation/generation.py semantics)."""
    per_row = getattr(pos, "ndim", 0) == 1
    b, t, w = x.shape
    hkv = cfg.kv_heads or cfg.heads
    hd = cfg.head_dim
    h = apply_norm(block["ln_1"], x, cfg.norm)
    qkv = _dense(h, block["attn"]["wqkv"])
    if block["attn"].get("bqkv") is not None:
        qkv = qkv + block["attn"]["bqkv"].astype(h.dtype)
    q = qkv[..., :cfg.heads * hd].reshape(b, t, cfg.heads, hd).transpose(0, 2, 1, 3)
    k = qkv[..., cfg.heads * hd:(cfg.heads + hkv) * hd].reshape(
        b, t, hkv, hd).transpose(0, 2, 1, 3)
    v = qkv[..., (cfg.heads + hkv) * hd:].reshape(b, t, hkv, hd).transpose(0, 2, 1, 3)
    if rope is not None:
        cos, sin = rope  # already sliced for these positions: [T, D]
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
    if per_row:
        upd = lambda c, u, p_: jax.lax.dynamic_update_slice(c, u, (0, p_, 0))
        cache_k = jax.vmap(upd)(cache_k, k.astype(cache_k.dtype), pos)
        cache_v = jax.vmap(upd)(cache_v, v.astype(cache_v.dtype), pos)
    else:
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, k.astype(cache_k.dtype), (0, 0, pos, 0))
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, v.astype(cache_v.dtype), (0, 0, pos, 0))
    s_max = cache_k.shape[2]
    # valid keys: col <= pos + t - 1, plus causality within the new tokens.
    # With per-row pos this also excludes the stale pad-prompt cache entries
    # in [prompt_len, padded_len): they sit beyond each row's frontier.
    col = jax.lax.broadcasted_iota(jnp.int32, (t, s_max), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (t, s_max), 0)
    if per_row:
        mask = col[None] <= (pos[:, None, None] + row[None])   # [B, T, S]
        bias = jnp.where(mask, 0.0, -1e30)[:, None]
    else:
        mask = col <= (pos + row)
        bias = jnp.where(mask, 0.0, -1e30)[None, None]
    kh, vh = cache_k.astype(x.dtype), cache_v.astype(x.dtype)
    if hkv != cfg.heads:
        kh = jnp.repeat(kh, cfg.heads // hkv, axis=1)
        vh = jnp.repeat(vh, cfg.heads // hkv, axis=1)
    att = sdpa(q, kh, vh, bias=bias)
    # heads*head_dim == w unless cfg.kv_channels overrides the per-head dim
    att = att.transpose(0, 2, 1, 3).reshape(b, t, -1)
    att = _dense(att, block["attn"]["wo"])
    if block["attn"].get("bo") is not None:
        att = att + block["attn"]["bo"].astype(x.dtype)
    x = x + att

    h = apply_norm(block["ln_2"], x, cfg.norm)
    h = _dense(h, block["mlp"]["w1"])
    b1 = block["mlp"].get("b1")
    if cfg.act == "swiglu":
        h = swiglu(h, None if b1 is None else b1.astype(h.dtype))
    else:
        h = bias_act(h, None if b1 is None else b1.astype(h.dtype), cfg.act)
    h = _dense(h, block["mlp"]["w2"])
    if block["mlp"].get("b2") is not None:
        h = h + block["mlp"]["b2"].astype(h.dtype)
    return x + h, cache_k, cache_v


def _forward_cached(params, tokens, pos, cache: KVCache, cfg: GPTCfg,
                    compute_dtype):
    """Run tokens [B, T] starting at position `pos` through all blocks with
    cache update. Returns (logits [B, T, V], cache)."""
    tcfg = cfg.transformer()
    per_row = getattr(pos, "ndim", 0) == 1
    t = tokens.shape[1]
    x = params["tok_embed"][tokens].astype(compute_dtype)
    if "pos_embed" in params:
        if per_row:
            positions = pos[:, None] + jnp.arange(t)[None]      # [B, T]
            x = x + params["pos_embed"][positions].astype(compute_dtype)
        else:
            pe = jax.lax.dynamic_slice_in_dim(params["pos_embed"], pos, t, 0)
            x = x + pe.astype(compute_dtype)[None]
    rope = None
    if tcfg.rope:
        cos_full, sin_full = rope_cos_sin(
            cache.k.shape[3], tcfg.head_dim, tcfg.rope_theta,
            rotary_percent=tcfg.rotary_percent,
            seq_len_interpolation_factor=tcfg.rope_interpolation)
        if per_row:
            positions = pos[:, None] + jnp.arange(t)[None]
            rope = (cos_full[positions], sin_full[positions])   # [B, T, D]
        else:
            rope = (jax.lax.dynamic_slice_in_dim(cos_full, pos, t, 0),
                    jax.lax.dynamic_slice_in_dim(sin_full, pos, t, 0))

    def layer(carry, xs):
        x = carry
        block, ck, cv = xs
        x, ck, cv = _block_decode(block, x, ck, cv, pos, tcfg, rope)
        return x, (ck, cv)

    x, (new_k, new_v) = jax.lax.scan(layer, x, (params["blocks"],
                                                cache.k, cache.v))
    x = apply_norm(params["ln_f"], x, cfg.normalization)
    if cfg.tie_embeddings:
        logits = jnp.einsum("btw,vw->btv", x, params["tok_embed"].astype(x.dtype))
    else:
        logits = _dense(x, params["lm_head"])
    return logits.astype(jnp.float32), KVCache(new_k, new_v)


def _sample(logits, rng, temperature, top_k, top_p):
    """logits [B, V] -> token ids [B] (megatron sampling.py semantics).
    top_p may be None (off), a python float, or a traced scalar (the
    per-step decayed threshold of --top-p-decay)."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = logits / temperature
    if top_k:
        kth = jax.lax.top_k(logits, top_k)[0][:, -1:]
        logits = jnp.where(logits < kth, -1e30, logits)
    if top_p is not None:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # smallest set with cumulative prob >= top_p; mask the rest
        cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -1e30, logits)
    return jax.random.categorical(rng, logits, axis=-1)


def _decode_program(fwd, params, prompt, prompt_len, cache, cfg: GPTCfg, *,
                    max_new_tokens, temperature, top_k, top_p, eos_id, seed,
                    return_lengths, top_p_decay, top_p_bound,
                    return_logprobs: bool = False):
    """Shared prefill + decode-scan body. `fwd(params, tokens, pos, cache)
    -> (logits, cache)` is the model forward (plain `_forward_cached`, or
    the pipeline-staged forward in pp_generation.py).

    With return_logprobs, also returns `lp` [B, P+max_new-1] where lp[:, j]
    is the log-probability of out[:, j+1] given its prefix — megatron's
    output_log_probs over the whole padded sequence
    (text_generation/generation.py:78 gather of selected-token log-probs);
    entries in each row's pad gap (between prompt_len and P) are undefined,
    exactly like the reference's pad positions."""
    b, p = prompt.shape
    max_len = p + max_new_tokens

    # Prefill the padded prompt at shared positions 0..P-1: correct for every
    # row's real tokens; the pad region's cache entries are masked out during
    # decode (per-row frontier) and overwritten as generation in-fills them.
    logits, cache = fwd(params, prompt, 0, cache)
    # next-token logits come from each row's last real prompt token
    last = jnp.take_along_axis(logits, (prompt_len - 1)[:, None, None], axis=1)[:, 0]

    lp = None
    if return_logprobs:
        lp = jnp.zeros((b, max_len - 1), jnp.float32)
        # prompt-position logprobs: lp[:, j] = logP(prompt[:, j+1] | prefix)
        plp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        lp = lp.at[:, :p - 1].set(
            jnp.take_along_axis(plp, prompt[:, 1:, None], axis=-1)[..., 0])

    out = jnp.zeros((b, max_len), jnp.int32)
    out = jax.lax.dynamic_update_slice(out, prompt, (0, 0))
    rng = jax.random.PRNGKey(seed)
    row_write = jax.vmap(
        lambda o, t_, p_: jax.lax.dynamic_update_slice(o, t_, (p_,)))

    # top_p as _sample expects it: None = off; with --top-p-decay the
    # threshold shrinks per step, floored at top_p_bound (megatron
    # sampling.py modify_logits_for_top_p_filtering + decay in generation.py)
    tp0 = top_p if (top_p and top_p < 1.0) else None

    def step_fixed(carry, i):
        out, cache, last_logits, rng, done, n_gen, lp = carry
        rng, sub = jax.random.split(rng)
        tp_i = tp0
        if tp0 is not None and top_p_decay:
            tp_i = jnp.maximum(top_p_bound,
                               tp0 * jnp.power(top_p_decay,
                                               i.astype(jnp.float32)))
        tok = _sample(last_logits, sub, temperature, top_k, tp_i).astype(jnp.int32)
        tok = jnp.where(done, jnp.zeros_like(tok), tok)
        wpos = prompt_len + i                       # per-row write position
        out = row_write(out, tok[:, None], wpos)
        if lp is not None:
            step_lp = jnp.take_along_axis(
                jax.nn.log_softmax(last_logits, axis=-1), tok[:, None],
                axis=-1)
            lp = row_write(lp, step_lp, wpos - 1)
        n_gen = n_gen + (~done).astype(jnp.int32)
        done = done | (tok == eos_id)

        logits, cache2 = fwd(params, tok[:, None], wpos, cache)
        return (out, cache2, logits[:, 0], rng, done, n_gen, lp), None

    init = (out, cache, last, rng, jnp.zeros((b,), bool),
            jnp.zeros((b,), jnp.int32), lp)
    (out, _, _, _, _, n_gen, lp), _ = jax.lax.scan(step_fixed, init,
                                                   jnp.arange(max_new_tokens))
    res = (out,)
    if return_lengths:
        res += (n_gen,)
    if return_logprobs:
        res += (lp,)
    return res if len(res) > 1 else out


@partial(jax.jit, static_argnames=("cfg", "max_new_tokens", "temperature",
                                   "top_k", "top_p", "eos_id",
                                   "return_lengths", "top_p_decay",
                                   "top_p_bound", "return_logprobs"))
def generate(params, prompt, prompt_len, cfg: GPTCfg, *,
             max_new_tokens: int = 32, temperature: float = 1.0,
             top_k: int = 0, top_p: float = 0.0, eos_id: int = -1,
             seed: int = 0, return_lengths: bool = False,
             top_p_decay: float = 0.0, top_p_bound: float = 0.0,
             return_logprobs: bool = False):
    """prompt: [B, P] right-padded; prompt_len: [B] actual lengths.
    Returns tokens [B, P + max_new_tokens] with generations in-filled at each
    row's own prompt_len (megatron text_generation/generation.py semantics:
    a short row's first generated token lands at position prompt_len, with
    per-row rope/pos-embed indices, never attending to the pad region of the
    cache). With return_lengths=True also returns [B] counts of generated
    tokens (including the EOS, when one was produced).
    One compiled computation: prefill + scan of decode steps.
    """
    b, p = prompt.shape
    cache = KVCache.create(cfg, b, p + max_new_tokens)
    compute = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    fwd = lambda prm, toks, pos, c: _forward_cached(prm, toks, pos, c, cfg,
                                                    compute)
    return _decode_program(
        fwd, params, prompt, prompt_len, cache, cfg,
        max_new_tokens=max_new_tokens, temperature=temperature, top_k=top_k,
        top_p=top_p, eos_id=eos_id, seed=seed, return_lengths=return_lengths,
        top_p_decay=top_p_decay, top_p_bound=top_p_bound,
        return_logprobs=return_logprobs)


def greedy_generate(params, prompt, cfg: GPTCfg, max_new_tokens: int = 32,
                    eos_id: int = -1):
    b, p = prompt.shape
    prompt_len = jnp.full((b,), p, jnp.int32)
    return generate(params, prompt, prompt_len, cfg,
                    max_new_tokens=max_new_tokens, temperature=0.0,
                    eos_id=eos_id)
