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

Schedule: GPipe-style fill/drain (M microbatches over S stages, bubble
fraction (S-1)/(M+S-1)). An interleaved/circular schedule is a planned
optimization; the reference's 1F1B has the same bubble as GPipe and differs
only in activation liveness, which `jax.checkpoint` already bounds here.
"""
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from megatron_clip_tpu.config import TransformerCfg
from megatron_clip_tpu.nn.transformer import apply_transformer
from megatron_clip_tpu.parallel.mesh import STAGE


def pipeline_transformer(blocks, x, cfg: TransformerCfg, *, mesh: Mesh,
                         num_microbatches: int, causal: bool = False):
    """Run the stacked transformer blocks pipelined over the mesh's `stage`
    axis. blocks leaves: [L, ...] with L % n_stages == 0; x: [B, S, W] with
    B % num_microbatches == 0. Numerically identical to apply_transformer.
    """
    n_stages = mesh.shape[STAGE]
    if n_stages == 1:
        return apply_transformer(blocks, x, cfg, causal=causal)

    n_layers = jax.tree.leaves(blocks)[0].shape[0]
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers not divisible by {n_stages} stages")
    m = num_microbatches
    b = x.shape[0]
    if b % m:
        raise ValueError(f"batch {b} not divisible by {m} microbatches")
    xm = x.reshape(m, b // m, *x.shape[1:])

    def staged(stage_blocks, xm):
        stage = jax.lax.axis_index(STAGE)
        fwd = partial(apply_transformer, stage_blocks, cfg=cfg, causal=causal)
        ticks = m + n_stages - 1
        shift = [(i, i + 1) for i in range(n_stages - 1)]

        def tick(state, t):
            inp = jax.lax.dynamic_index_in_dim(
                xm, jnp.minimum(t, m - 1), 0, keepdims=False)
            cur = jnp.where(stage == 0, inp, state)
            y = fwd(x=cur)
            state = jax.lax.ppermute(y, STAGE, shift)
            return state, y

        init = jax.lax.pcast(jnp.zeros_like(xm[0]), (STAGE,), to="varying")
        _, ys = jax.lax.scan(tick, init, jnp.arange(ticks))
        # the last stage's outputs for microbatch i appear at tick i+S-1;
        # broadcast them to every stage (psum of a masked copy)
        outs = ys[n_stages - 1:]
        mask = (stage == n_stages - 1).astype(outs.dtype)
        return jax.lax.psum(outs * mask, STAGE)

    out = jax.shard_map(
        staged, mesh=mesh,
        in_specs=(P(STAGE), P()),
        out_specs=P(),
        axis_names={STAGE},
    )(blocks, xm)
    return out.reshape(b, *x.shape[1:])


def make_pipelined_layers_fn(mesh: Mesh, num_microbatches: int) -> Callable:
    """Adapter for towers: returns layers_fn(blocks, x, cfg, causal) that the
    model applies in place of apply_transformer when pp > 1."""
    def layers_fn(blocks, x, cfg, *, causal=False, bias=None):
        assert bias is None, "additive masks not yet supported in the pipeline"
        return pipeline_transformer(blocks, x, cfg, mesh=mesh,
                                    num_microbatches=num_microbatches,
                                    causal=causal)
    return layers_fn
