"""Pipeline-parallel serving: decode with the layer stack sharded over the
mesh's `stage` axis.

The reference serves under TP×PP: each pipeline rank runs its layer slice
per generated token and logits are broadcast from the last stage back to the
first (megatron/text_generation/communication.py:185, forward_step.py).
TPU-native form here: the whole prefill+decode program is ONE jit; inside a
`shard_map` over `stage`, each stage holds L/S layers and the matching
KV-cache shard, activations hop stage->stage+1 by `ppermute`, and the final
hidden states are psum-broadcast so the (replicated) lm head + sampler run
identically on every device — token selection needs no further
communication (the reference's logits broadcast, without a host round-trip).

What PP buys serving is HBM capacity: each chip stores 1/S of the layer
weights and 1/S of the KV cache, so models (and batch×context volumes)
beyond one chip's memory serve at all; a decode step still serializes the S
stages (inherent to PP — the reference pays the same p2p chain per token).
TP remains the lower-latency axis; the two compose (mesh tp×stage — the
`tensor` axis stays auto inside the stage-manual region, so TP-sharded
weights keep their collectives).
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from megatron_clip_tpu.inference.generation import (
    KVCache, _block_decode, _decode_program)
from megatron_clip_tpu.models.gpt import GPTCfg
from megatron_clip_tpu.nn.transformer import apply_norm
from megatron_clip_tpu.ops.rope import rope_cos_sin
from megatron_clip_tpu.parallel.mesh import STAGE


def stage_in_specs(params):
    """shard_map in_specs for decode params: the stacked blocks sharded over
    `stage` on the layer dim, embeddings/final-norm/lm-head replicated."""
    return {k: (P(STAGE) if k == "blocks" else P()) for k in params}


def _staged_forward(params, tokens, pos, cache: KVCache, cfg: GPTCfg,
                    compute_dtype, n_stages: int, max_len: int):
    """`_forward_cached` with the layer scan split across pipeline stages:
    stage s runs its local L/S blocks at turn s, activations ppermute to the
    next stage, and the last stage's output (which the final hop wraps to
    stage 0) is psum-broadcast. cache leaves are stage-local [L/S, ...]."""
    tcfg = cfg.transformer()
    per_row = getattr(pos, "ndim", 0) == 1
    t = tokens.shape[1]
    x = params["tok_embed"][tokens].astype(compute_dtype)
    if "pos_embed" in params:
        if per_row:
            positions = pos[:, None] + jnp.arange(t)[None]
            x = x + params["pos_embed"][positions].astype(compute_dtype)
        else:
            pe = jax.lax.dynamic_slice_in_dim(params["pos_embed"], pos, t, 0)
            x = x + pe.astype(compute_dtype)[None]
    rope = None
    if tcfg.rope:
        cos_full, sin_full = rope_cos_sin(
            max_len, tcfg.head_dim, tcfg.rope_theta,
            rotary_percent=tcfg.rotary_percent,
            seq_len_interpolation_factor=tcfg.rope_interpolation)
        if per_row:
            positions = pos[:, None] + jnp.arange(t)[None]
            rope = (cos_full[positions], sin_full[positions])
        else:
            rope = (jax.lax.dynamic_slice_in_dim(cos_full, pos, t, 0),
                    jax.lax.dynamic_slice_in_dim(sin_full, pos, t, 0))

    stage = jax.lax.axis_index(STAGE)
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def run_local(x, ck, cv):
        def layer(h, xs):
            blk, k1, v1 = xs
            h, k1, v1 = _block_decode(blk, h, k1, v1, pos, tcfg, rope)
            return h, (k1, v1)

        x, (ck, cv) = jax.lax.scan(layer, x, (params["blocks"], ck, cv))
        return x, ck, cv

    def turn(s, carry):
        x, ck, cv = carry
        # Every stage runs its local slice each turn and keeps the result
        # only on its own turn (masked uniform execution). SPMD requires
        # this: gating with `lax.cond` on the device-varying stage index
        # would let devices diverge on the collectives the tensor axis
        # inserts inside the layers, deadlocking the ring. Wall-clock cost
        # is the same as the serialized stage chain (stages are otherwise
        # idle while the token passes through), so this trades wasted
        # off-turn FLOPs for a uniform program — the masked analogue of the
        # reference's per-rank p2p chain (communication.py:185).
        y, ck2, cv2 = run_local(x, ck, cv)
        keep = stage == s
        x = jnp.where(keep, y, x)
        ck = jnp.where(keep, ck2, ck)
        cv = jnp.where(keep, cv2, cv)
        x = jax.lax.ppermute(x, STAGE, perm)
        return x, ck, cv

    x, ck, cv = jax.lax.fori_loop(0, n_stages, turn,
                                  (x, cache.k, cache.v))
    # stage S-1's output wrapped to stage 0 on the final hop; broadcast it
    x = jax.lax.psum(jnp.where(stage == 0, x, jnp.zeros_like(x)), STAGE)
    x = apply_norm(params["ln_f"], x, cfg.normalization)
    if cfg.tie_embeddings:
        logits = jnp.einsum("btw,vw->btv", x,
                            params["tok_embed"].astype(x.dtype))
    else:
        from megatron_clip_tpu.inference.generation import _dense
        logits = _dense(x, params["lm_head"])
    return logits.astype(jnp.float32), KVCache(ck, cv)


@partial(jax.jit, static_argnames=("cfg", "mesh", "max_new_tokens",
                                   "temperature", "top_k", "top_p", "eos_id",
                                   "return_lengths", "top_p_decay",
                                   "top_p_bound", "return_logprobs"))
def pp_generate(params, prompt, prompt_len, cfg: GPTCfg,
                mesh: jax.sharding.Mesh, *,
                max_new_tokens: int = 32, temperature: float = 1.0,
                top_k: int = 0, top_p: float = 0.0, eos_id: int = -1,
                seed: int = 0, return_lengths: bool = False,
                top_p_decay: float = 0.0, top_p_bound: float = 0.0,
                return_logprobs: bool = False):
    """`generate()` with the layer stack pipelined over mesh's `stage` axis.

    params: GPT param tree placed with
    `make_sharding_tree(mesh, gpt_param_specs(params, stage_axis=STAGE))`
    (blocks [L, ...] sharded over stage on the layer dim; tp/fsdp specs
    compose). Token-for-token identical to the single-program `generate()`.
    """
    n_stages = mesh.shape[STAGE]
    tcfg = cfg.transformer()
    if tcfg.layers % n_stages:
        raise ValueError(f"{tcfg.layers} layers not divisible by "
                         f"{n_stages} stages")
    b, p = prompt.shape
    max_len = p + max_new_tokens
    compute = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32

    def staged(params, prompt, prompt_len):
        hkv = tcfg.kv_heads or tcfg.heads
        shape = (tcfg.layers // n_stages, b, hkv, max_len, tcfg.head_dim)
        # bf16 cache on EVERY backend, matching KVCache.create in the
        # single-program generate(): an fp32 cache on CPU would read back
        # higher-precision K/V and break the token-for-token parity the
        # pp tests assert
        cache = KVCache(jnp.zeros(shape, jnp.bfloat16),
                        jnp.zeros(shape, jnp.bfloat16))
        fwd = lambda prm, toks, pos, c: _staged_forward(
            prm, toks, pos, c, cfg, compute, n_stages, max_len)
        return _decode_program(
            fwd, params, prompt, prompt_len, cache, cfg,
            max_new_tokens=max_new_tokens, temperature=temperature,
            top_k=top_k, top_p=top_p, eos_id=eos_id, seed=seed,
            return_lengths=return_lengths, top_p_decay=top_p_decay,
            top_p_bound=top_p_bound,
            return_logprobs=return_logprobs)

    n_out = 1 + int(return_lengths) + int(return_logprobs)
    out_specs = tuple([P()] * n_out) if n_out > 1 else P()
    return jax.shard_map(
        staged, mesh=mesh,
        in_specs=(stage_in_specs(params), P(), P()),
        out_specs=out_specs,
        axis_names={STAGE}, check_vma=False,
    )(params, prompt, prompt_len)
