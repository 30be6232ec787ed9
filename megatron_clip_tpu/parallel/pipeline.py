"""Pipeline parallelism over a `stage` mesh axis.

Replaces the reference's 1F1B/interleaved schedulers + NCCL p2p transport
(megatron/core/pipeline_parallel/schedules.py:370-1289,
p2p_communication.py:22-571) with the XLA-native construction:

  - the stacked layer params are sharded on their leading (layer) axis over
    the `stage` axis — each stage holds its contiguous slice of layers (the
    mesh form of megatron's per-stage layer offsets, transformer.py:1557-1605);
  - a `shard_map` manual over `stage` (data/fsdp/tensor stay auto, so TP/DP
    sharding inside each stage is still XLA-managed) runs the microbatch
    schedule as a `lax.scan` of ticks, shifting activations to the next stage
    with `ppermute` — the ICI analogue of batched isend/irecv;
  - reverse-mode AD transposes the schedule (ppermute transposes to the
    reverse permutation), giving the backward pipeline for free — no
    `deallocate_output_tensor`/`custom_backward` memory hacks
    (schedules.py:104-147) are needed in a functional program.

Two schedules:
  - `pipeline_transformer`: GPipe-style fill/drain (bubble (S-1)/(M+S-1));
    the reference's 1F1B has the same bubble and differs only in activation
    liveness, which `jax.checkpoint` already bounds here;
  - `pipeline_transformer_interleaved`: the circular virtual-pipeline
    schedule (megatron VPP), bubble cut by the chunk count V.
"""
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from megatron_clip_tpu.config import TransformerCfg
from megatron_clip_tpu.nn.transformer import apply_transformer
from megatron_clip_tpu.parallel.mesh import STAGE


def _microbatch_bias(bias, m, b):
    """Split an additive attention bias [B, ...] (padding masks etc.) into
    microbatches alongside x; broadcast shapes ([1,...] / [H,S,S]) are
    replicated per microbatch."""
    if bias is None:
        return None
    if bias.shape[0] == b:
        return bias.reshape(m, b // m, *bias.shape[1:])
    return jnp.broadcast_to(bias[None], (m, *bias.shape))


def pipeline_transformer(blocks, x, cfg: TransformerCfg, *, mesh: Mesh,
                         num_microbatches: int, causal: bool = False,
                         bias=None):
    """Run the stacked transformer blocks pipelined over the mesh's `stage`
    axis. blocks leaves: [L, ...] with L % n_stages == 0; x: [B, S, W] with
    B % num_microbatches == 0. `bias` (additive attention mask, e.g. BERT
    padding) travels with its microbatch through the ring. Numerically
    identical to apply_transformer.

    Memory profile: with the fixed global batch B, per-stage activation
    residuals total ~B * (1 + (S-1)/M) block-inputs regardless of M —
    GPipe's storage, bounded by jax.checkpoint at block granularity
    (cfg.remat) instead of megatron's deallocate_output_tensor surgery;
    see tests/test_pipeline_memory.py for the measured curve.
    """
    n_stages = mesh.shape[STAGE]
    if n_stages == 1:
        return apply_transformer(blocks, x, cfg, causal=causal, bias=bias)

    n_layers = jax.tree.leaves(blocks)[0].shape[0]
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers not divisible by {n_stages} stages")
    m = num_microbatches
    b = x.shape[0]
    if b % m:
        raise ValueError(f"batch {b} not divisible by {m} microbatches")
    xm = x.reshape(m, b // m, *x.shape[1:])
    bm = _microbatch_bias(bias, m, b)

    def staged(stage_blocks, xm, bm):
        stage = jax.lax.axis_index(STAGE)
        fwd = partial(apply_transformer, stage_blocks, cfg=cfg, causal=causal)
        ticks = m + n_stages - 1
        shift = [(i, i + 1) for i in range(n_stages - 1)]

        def tick(carry, t):
            state, state_bias, out_buf = carry
            mb_idx = jnp.clip(t - stage, 0, m - 1)
            inp = jax.lax.dynamic_index_in_dim(
                xm, jnp.minimum(t, m - 1), 0, keepdims=False)
            cur = jnp.where(stage == 0, inp, state)
            # fill/drain ticks carry no real microbatch on this stage: feed
            # zeros (LN/softmax-safe) instead of stale ring garbage
            active = (t >= stage) & (t - stage < m)
            cur = jnp.where(active, cur, jnp.zeros_like(cur))
            if bm is not None:
                bias_in = jax.lax.dynamic_index_in_dim(
                    bm, jnp.minimum(t, m - 1), 0, keepdims=False)
                cur_bias = jnp.where(stage == 0, bias_in, state_bias)
                y = fwd(x=cur, bias=cur_bias)
                state_bias = jax.lax.ppermute(cur_bias, STAGE, shift)
            else:
                y = fwd(x=cur)
            # the last stage writes microbatch t-(S-1) into the output slot
            write = (stage == n_stages - 1) & active
            prev = jax.lax.dynamic_index_in_dim(out_buf, mb_idx, 0,
                                                keepdims=False)
            out_buf = jax.lax.dynamic_update_index_in_dim(
                out_buf, jnp.where(write, y, prev), mb_idx, 0)
            state = jax.lax.ppermute(y, STAGE, shift)
            return (state, state_bias, out_buf), None

        zero = jax.lax.pcast(jnp.zeros_like(xm[0]), (STAGE,), to="varying")
        zero_bias = None if bm is None else jax.lax.pcast(
            jnp.zeros_like(bm[0]), (STAGE,), to="varying")
        out0 = jax.lax.pcast(jnp.zeros_like(xm), (STAGE,), to="varying")
        (_, _, outs), _ = jax.lax.scan(tick, (zero, zero_bias, out0),
                                       jnp.arange(ticks))
        # only the last stage's buffer holds data; broadcast to every stage
        mask = (stage == n_stages - 1).astype(outs.dtype)
        return jax.lax.psum(outs * mask, STAGE)

    out = jax.shard_map(
        staged, mesh=mesh,
        in_specs=(P(STAGE), P(), P()),
        out_specs=P(),
        axis_names={STAGE},
    )(blocks, xm, bm)
    return out.reshape(b, *x.shape[1:])


def make_pipelined_layers_fn(mesh: Mesh, num_microbatches: int,
                             num_chunks: int = 1) -> Callable:
    """Adapter for towers: returns layers_fn(blocks, x, cfg, causal) that the
    model applies in place of apply_transformer when pp > 1. num_chunks > 1
    selects the interleaved (virtual-pipeline) schedule."""
    def layers_fn(blocks, x, cfg, *, causal=False, bias=None):
        if getattr(cfg, "num_experts", 0):
            raise ValueError(
                "pipeline parallelism (pp>1) does not support MoE layers yet: "
                "the SwitchMLP aux loss cannot be threaded through the "
                "pipeline schedule. Use tp/fsdp/sp with --num-experts, or "
                "pp without experts.")
        if num_chunks > 1:
            return pipeline_transformer_interleaved(
                blocks, x, cfg, mesh=mesh, num_microbatches=num_microbatches,
                num_chunks=num_chunks, causal=causal, bias=bias)
        return pipeline_transformer(blocks, x, cfg, mesh=mesh,
                                    num_microbatches=num_microbatches,
                                    causal=causal, bias=bias)
    return layers_fn


def pipeline_transformer_interleaved(blocks, x, cfg: TransformerCfg, *,
                                     mesh: Mesh, num_microbatches: int,
                                     num_chunks: int, causal: bool = False,
                                     bias=None):
    """Interleaved (virtual-pipeline) schedule — megatron's
    `forward_backward_pipelining_with_interleaving` (schedules.py:370-935)
    done as a circular ring.

    Each stage holds `num_chunks` non-contiguous layer chunks (global chunk v
    lives on stage v % S — the VPP layer assignment, training.py:227-242);
    activations circulate the ring num_chunks times, so the pipeline bubble
    shrinks from (S-1)/(M+S-1) to ~(S-1)/(M*V+S-1) per unit work.

    Schedule law: at tick t, stage s advances the activation whose chunk is
    ((t-s)//S) mod V; stage 0 injects microbatch (t//(S*V))*S + t%S whenever
    (t//S) % V == 0; the final activation exits stage S-1 on chunk V-1.
    Requires M % S == 0 and layers % (S*V) == 0.
    """
    n_stages = mesh.shape[STAGE]
    v = num_chunks
    if n_stages == 1 or v == 1:
        return pipeline_transformer(blocks, x, cfg, mesh=mesh,
                                    num_microbatches=num_microbatches,
                                    causal=causal, bias=bias)
    m = num_microbatches
    if m % n_stages:
        raise ValueError(f"microbatches {m} must be divisible by "
                         f"stages {n_stages} for the interleaved schedule")
    n_layers = jax.tree.leaves(blocks)[0].shape[0]
    if n_layers % (n_stages * v):
        raise ValueError(f"{n_layers} layers not divisible by "
                         f"stages*chunks {n_stages * v}")
    lc = n_layers // (n_stages * v)
    b = x.shape[0]
    if b % m:
        raise ValueError(f"batch {b} not divisible by {m} microbatches")
    xm = x.reshape(m, b // m, *x.shape[1:])
    bm = _microbatch_bias(bias, m, b)

    # rearrange stacked layers [L,...] -> [S, V, Lc, ...] with global chunk
    # k*S + s at [s, k] (round-robin chunk placement)
    def arrange(leaf):
        chunks = leaf.reshape(n_stages * v, lc, *leaf.shape[1:])
        idx = jnp.asarray([[k * n_stages + s for k in range(v)]
                           for s in range(n_stages)])
        return chunks[idx]                   # [S, V, Lc, ...]

    stage_major = jax.tree.map(arrange, blocks)
    sv = n_stages * v
    ticks = m * v + n_stages - 1

    def staged(stage_blocks, xm, bm):
        # shard_map divides the leading S axis to size 1; squeeze it
        stage_blocks = jax.tree.map(lambda l: l[0], stage_blocks)  # [V, Lc,...]
        stage = jax.lax.axis_index(STAGE)
        shift = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(carry, t):
            state, state_bias = carry
            rel = t - stage
            chunk = jnp.where(rel >= 0, (rel // n_stages) % v, 0)
            inject = (stage == 0) & ((t // n_stages) % v == 0)
            m_in = jnp.clip((t // sv) * n_stages + t % n_stages, 0, m - 1)
            inp = jax.lax.dynamic_index_in_dim(xm, m_in, 0, keepdims=False)
            cur = jnp.where(inject, inp, state)
            # zero-feed ticks carrying no real activation on this stage
            # (each stage advances m*v real activations over the run)
            active = (rel >= 0) & (rel < m * v)
            cur = jnp.where(active, cur, jnp.zeros_like(cur))
            chunk_blocks = jax.tree.map(
                lambda l: jax.lax.dynamic_index_in_dim(l, chunk, 0,
                                                       keepdims=False),
                stage_blocks)
            if bm is not None:
                bias_in = jax.lax.dynamic_index_in_dim(bm, m_in, 0,
                                                       keepdims=False)
                cur_bias = jnp.where(inject, bias_in, state_bias)
                y = apply_transformer(chunk_blocks, cur, cfg, causal=causal,
                                      bias=cur_bias)
                state_bias = jax.lax.ppermute(cur_bias, STAGE, shift)
            else:
                y = apply_transformer(chunk_blocks, cur, cfg, causal=causal)
            state = jax.lax.ppermute(y, STAGE, shift)
            return (state, state_bias), y

        init = jax.lax.pcast(jnp.zeros_like(xm[0]), (STAGE,), to="varying")
        init_bias = None if bm is None else jax.lax.pcast(
            jnp.zeros_like(bm[0]), (STAGE,), to="varying")
        _, ys = jax.lax.scan(tick, (init, init_bias), jnp.arange(ticks))

        # final outputs leave the last stage on chunk V-1: ticks where
        # ((t - (S-1))//S) % V == V-1, in microbatch order — static indices
        out_ticks = []
        for t in range(ticks):
            rel = t - (n_stages - 1)
            if rel >= 0 and (rel // n_stages) % v == v - 1 \
                    and rel // sv < m // n_stages:
                out_ticks.append(t)
        assert len(out_ticks) == m, (out_ticks, m)
        outs = ys[jnp.asarray(out_ticks)]
        mask = (stage == n_stages - 1).astype(outs.dtype)
        return jax.lax.psum(outs * mask, STAGE)

    out = jax.shard_map(
        staged, mesh=mesh,
        in_specs=(P(STAGE), P(), P()),
        out_specs=P(),
        axis_names={STAGE},
    )(stage_major, xm, bm)
    return out.reshape(b, *x.shape[1:])
