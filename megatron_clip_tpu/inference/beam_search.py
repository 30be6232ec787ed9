"""Beam search decoding, fully inside one jit.

Replaces megatron's beam_search (megatron/text_generation/api.py:184 +
generation.py beam loop with per-step host sync): static beam width, scan
over decode steps, KV cache reindexed with the beam parents each step.

`pp_beam_search` runs the same beam program with the layer stack sharded
over the mesh's `stage` axis (the reference's beam loop runs through its PP
forward/communication path, generation.py + communication.py:185): the
staged cached forward from pp_generation powers the per-step logits, the
psum-broadcast hidden states make every stage pick identical beams, and the
stage-local KV shards are reindexed with the same parent map.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from megatron_clip_tpu.models.gpt import GPTCfg
from megatron_clip_tpu.inference.generation import KVCache, _forward_cached

NEG = -1e9


def _beam_program(fwd, params, prompt, cache, *, beam_size: int,
                  max_new_tokens: int, eos_id: int, length_penalty: float):
    """The beam loop over a cached forward `fwd(params, tokens, pos, cache)
    -> (logits, cache)`. cache rows are beam-flattened [.., B*K, ..];
    returns (tokens [B, K, P+N], scores [B, K]) sorted best-first."""
    b, p = prompt.shape
    k = beam_size
    max_len = p + max_new_tokens

    # expand prompt to beams: [B*K, P]
    prompt_k = jnp.repeat(prompt, k, axis=0)
    logits, cache = fwd(params, prompt_k, 0, cache)
    logp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)
    logp = logp.reshape(b, k, -1)

    v = logp.shape[-1]
    # first step: only beam 0 is live (others duplicate the prompt)
    first = logp[:, 0]                                   # [B, V]
    scores, tok = jax.lax.top_k(first, k)                # [B, K]
    out = jnp.zeros((b, k, max_len), jnp.int32)
    out = out.at[:, :, :p].set(prompt[:, None, :])
    out = out.at[:, :, p].set(tok)
    finished = tok == eos_id

    def reindex_cache(cache, parents):
        """parents: [B, K] beam indices; cache arrays [L(/S), B*K, H, S, D]."""
        flat = (jnp.arange(b)[:, None] * k + parents).reshape(-1)  # [B*K]
        return KVCache(cache.k[:, flat], cache.v[:, flat])

    gen_len = jnp.ones((b, k), jnp.float32)  # first token already emitted

    def step(carry, i):
        out, scores, cache, finished, gen_len, last_tok = carry
        logits, cache = fwd(params, last_tok.reshape(b * k, 1), p + i, cache)
        logp = jax.nn.log_softmax(logits[:, 0].astype(jnp.float32), axis=-1)
        logp = logp.reshape(b, k, v)
        # finished beams only extend with eos at zero extra cost
        frozen = jnp.full((v,), NEG).at[eos_id].set(0.0)
        logp = jnp.where(finished[..., None], frozen[None, None], logp)
        total = scores[..., None] + logp                 # [B, K, V]
        flat = total.reshape(b, k * v)
        scores, idx = jax.lax.top_k(flat, k)             # [B, K]
        parents = idx // v
        tok = idx % v
        out = jnp.take_along_axis(out, parents[..., None], axis=1)
        out = out.at[:, :, p + 1 + i].set(tok)
        was_done = jnp.take_along_axis(finished, parents, axis=1)
        # beam length = tokens up to and including the first eos; frozen
        # beams' eos padding does not count (token-value tests like
        # `!= 0` are wrong for eos_id != 0 and can divide by zero)
        gen_len = jnp.take_along_axis(gen_len, parents, axis=1) \
            + (1.0 - was_done.astype(jnp.float32))
        finished = was_done | (tok == eos_id)
        cache = reindex_cache(cache, parents)
        return (out, scores, cache, finished, gen_len, tok), None

    init = (out, scores, cache, finished, gen_len, tok)
    (out, scores, _, finished, gen_len, _), _ = jax.lax.scan(
        step, init, jnp.arange(max_new_tokens - 1))

    # megatron's beam scorer divides by length**penalty unconditionally
    # (text_generation/beam_utils.py), including the default penalty 1
    scores = scores / (gen_len ** length_penalty)
    order = jnp.argsort(-scores, axis=1)
    scores = jnp.take_along_axis(scores, order, axis=1)
    out = jnp.take_along_axis(out, order[..., None], axis=1)
    return out, scores


@partial(jax.jit, static_argnames=("cfg", "beam_size", "max_new_tokens",
                                   "eos_id", "length_penalty"))
def beam_search(params, prompt, cfg: GPTCfg, *, beam_size: int = 4,
                max_new_tokens: int = 32, eos_id: int = 0,
                length_penalty: float = 1.0):
    """prompt: [B, P] (fixed length). Returns (tokens [B, K, P+N], scores [B, K])
    sorted best-first per row."""
    b, p = prompt.shape
    max_len = p + max_new_tokens
    compute = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    cache = KVCache.create(cfg, b * beam_size, max_len)
    fwd = lambda prm, toks, pos, c: _forward_cached(prm, toks, pos, c, cfg,
                                                    compute)
    return _beam_program(fwd, params, prompt, cache, beam_size=beam_size,
                         max_new_tokens=max_new_tokens, eos_id=eos_id,
                         length_penalty=length_penalty)


@partial(jax.jit, static_argnames=("cfg", "mesh", "beam_size",
                                   "max_new_tokens", "eos_id",
                                   "length_penalty"))
def pp_beam_search(params, prompt, cfg: GPTCfg, mesh: jax.sharding.Mesh, *,
                   beam_size: int = 4, max_new_tokens: int = 32,
                   eos_id: int = 0, length_penalty: float = 1.0):
    """beam_search with the layer stack pipelined over mesh's `stage` axis
    (params placed like pp_generate: blocks [L, ...] stage-sharded on the
    layer dim; tp specs compose). Token-for-token identical to the
    single-program beam_search."""
    from megatron_clip_tpu.inference.pp_generation import (
        _staged_forward, stage_in_specs)
    from megatron_clip_tpu.parallel.mesh import STAGE

    n_stages = mesh.shape[STAGE]
    tcfg = cfg.transformer()
    if tcfg.layers % n_stages:
        raise ValueError(f"{tcfg.layers} layers not divisible by "
                         f"{n_stages} stages")
    b, p = prompt.shape
    max_len = p + max_new_tokens
    compute = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32

    def staged(params, prompt):
        hkv = tcfg.kv_heads or tcfg.heads
        shape = (tcfg.layers // n_stages, b * beam_size, hkv, max_len,
                 tcfg.head_dim)
        # bf16 cache on every backend — KVCache.create parity (see
        # pp_generation.pp_generate)
        cache = KVCache(jnp.zeros(shape, jnp.bfloat16),
                        jnp.zeros(shape, jnp.bfloat16))
        fwd = lambda prm, toks, pos, c: _staged_forward(
            prm, toks, pos, c, cfg, compute, n_stages, max_len)
        return _beam_program(fwd, params, prompt, cache,
                             beam_size=beam_size,
                             max_new_tokens=max_new_tokens, eos_id=eos_id,
                             length_penalty=length_penalty)

    return jax.shard_map(
        staged, mesh=mesh,
        in_specs=(stage_in_specs(params), P()),
        out_specs=(P(), P()),
        axis_names={STAGE}, check_vma=False,
    )(params, prompt)
