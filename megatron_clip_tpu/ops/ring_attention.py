"""Context parallelism: ring attention over a `context` mesh axis.

The reference ships CP *plumbing only* — process groups and config knobs with
no attention kernel (megatron/core/parallel_state.py:360-387,642-655;
`context_parallel_size` in model_parallel_config.py; mcore 0.4 delegated the
actual CP attention to TransformerEngine, which is absent from the snapshot).
This module completes the capability the TPU way:

  - the sequence dim of activations is sharded over a ``context`` mesh axis;
  - attention runs as a **ring**: each device holds its Q shard and rotates
    the K/V shards around the axis with `jax.lax.ppermute` (ICI
    neighbour hops), accumulating the softmax online (flash-attention-style
    running max / normalizer), so the full [S, S] logits never materialize
    and each device only ever holds a [S/cp, S/cp] tile;
  - causal masking uses *global* positions carried with the rotating K/V,
    which also enables the load-balanced "zigzag" layout (each device holds
    chunks i and 2cp-1-i, megatron-LM's cp_rank scheme) so late ring steps
    aren't idle under a causal mask.

Everything is differentiable (scan + ppermute transpose = reverse ring), so
the backward pass is itself a ring — no hand-written VJP needed.
"""
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

# Python float, NOT jnp.float32(...): a module-level concrete array becomes
# a captured ArrayImpl const in every trace that uses ring attention, and
# jax 0.9's fastpath mishandles hoisted consts across multiple pipelined
# runs in one process (see workload.py _step docstring)
NEG_INF = -1e30


def contiguous_positions(rank, sloc):
    """Global positions of a rank's sequence shard under contiguous layout."""
    return rank * sloc + jnp.arange(sloc, dtype=jnp.int32)


def zigzag_positions(rank, cp, sloc):
    """Load-balanced layout: rank holds chunks (rank, 2cp-1-rank) of size
    sloc/2 each, so under a causal mask every rank does ~equal work
    (megatron-LM context-parallel chunk assignment)."""
    half = sloc // 2
    lo = rank * half + jnp.arange(half, dtype=jnp.int32)
    hi = (2 * cp - 1 - rank) * half + jnp.arange(half, dtype=jnp.int32)
    return jnp.concatenate([lo, hi])


def zigzag_shard(x, cp, axis=1):
    """Reorder a global [.., S, ..] array so that a plain contiguous split
    over `cp` devices yields the zigzag chunk assignment."""
    s = x.shape[axis]
    if s % (2 * cp):
        raise ValueError(f"zigzag layout needs seq {s} divisible by "
                         f"2*cp = {2 * cp}")
    chunks = jnp.split(x, 2 * cp, axis=axis)
    order = []
    for r in range(cp):
        order += [chunks[r], chunks[2 * cp - 1 - r]]
    return jnp.concatenate(order, axis=axis)


def zigzag_unshard(x, cp, axis=1):
    """Inverse of zigzag_shard."""
    chunks = jnp.split(x, 2 * cp, axis=axis)
    inv = [None] * (2 * cp)
    j = 0
    for r in range(cp):
        inv[r] = chunks[j]
        inv[2 * cp - 1 - r] = chunks[j + 1]
        j += 2
    return jnp.concatenate(inv, axis=axis)


def ring_attention_local(q, k, v, axis_name: str, *, causal: bool = False,
                         scale: Optional[float] = None,
                         layout: str = "contiguous", bias=None):
    """Per-device ring attention body — call inside `shard_map`.

    q, k, v: local shards [B, Sloc, H, D] (BSHD layout, matching
    ops/attention.py `sdpa_bshd`). The sequence dim is sharded over
    ``axis_name``; batch/head dims may be sharded over other mesh axes
    (they are untouched here). Returns [B, Sloc, H, D].

    `bias` (additive attention mask, e.g. BERT padding / document
    boundaries): the LOCAL-query-rows slice [B|1, H|1, Sloc, S_global]
    with the column dim in GLOBAL position order — each ring step gathers
    the rotating block's columns by its carried global positions, so the
    full [S, S] matrix still never materializes per device (rows are 1/cp).
    -inf entries are clamped to the finite NEG_INF and fully-masked rows
    contribute zero mass (same guard as the causal path).
    """
    cp = jax.lax.axis_size(axis_name)
    rank = jax.lax.axis_index(axis_name)
    b, sloc, h, d = q.shape
    if scale is None:
        scale = d ** -0.5
    if layout == "zigzag":
        pos = zigzag_positions(rank, cp, sloc)
    else:
        pos = contiguous_positions(rank, sloc)
    q32 = q.astype(jnp.float32)

    # running accumulators (flash-attention online softmax, fp32), derived
    # from q so they inherit its varying mesh axes (shard_map vma tracking)
    zero = q32.transpose(0, 2, 1, 3) * 0.0          # [B, H, Sloc, D]
    o = zero
    m = zero[..., 0] + NEG_INF                       # [B, H, Sloc]
    l = zero[..., 0]
    perm = [(i, (i + 1) % cp) for i in range(cp)]

    def body(carry, _):
        o, m, l, k_blk, v_blk, k_pos = carry
        logits = jnp.einsum("bqhd,bkhd->bhqk", q32,
                            k_blk.astype(jnp.float32)) * scale
        if bias is not None:
            blk = jnp.take(bias.astype(jnp.float32), k_pos, axis=-1)
            logits = logits + jnp.maximum(blk, NEG_INF)
        if causal:
            mask = pos[:, None] >= k_pos[None, :]          # [Sq, Sk]
            logits = jnp.where(mask[None, None], logits, NEG_INF)
        m_new = jnp.maximum(m, logits.max(axis=-1))
        # corr == 1 when both m and m_new are NEG_INF (fully-masked so far)
        corr = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new[..., None])
        if causal:
            # zero masked probs explicitly: when an entire row is masked,
            # exp(NEG_INF - NEG_INF) above would contribute spurious mass
            p = jnp.where(mask[None, None], p, 0.0)
        if bias is not None:
            # same guard for bias-masked entries (a fully-masked row's
            # m_new == NEG_INF would otherwise put unit mass everywhere)
            p = jnp.where(logits > 0.5 * NEG_INF, p, 0.0)
        l = l * corr + p.sum(axis=-1)
        o = o * corr[..., None] + jnp.einsum(
            "bhqk,bkhd->bhqd", p, v_blk.astype(jnp.float32))
        m = m_new
        # rotate K/V (and their global positions) to the next device
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        k_pos = jax.lax.ppermute(k_pos, axis_name, perm)
        return (o, m, l, k_blk, v_blk, k_pos), None

    (o, m, l, *_), _ = jax.lax.scan(body, (o, m, l, k, v, pos), None,
                                    length=cp)
    out = o / jnp.maximum(l, 1e-30)[..., None]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def ring_attention(q, k, v, *, axis: str = "context", causal: bool = False,
                   scale: Optional[float] = None, layout: str = "contiguous",
                   batch_axes=("data", "fsdp"), head_axis: str = "tensor",
                   mesh=None, bias=None):
    """Global-view ring attention: q/k/v [B, S, H, D] with S sharded over
    ``axis``. Works inside `jit` with an active mesh (`jax.sharding.set_mesh`)
    or with an explicit `mesh`. Batch is sharded over `batch_axes` and heads
    over `head_axis` when those axes exist in the mesh.

    `bias` [B|1, H|1, S, S]: additive attention mask. The query-row dim is
    sharded over `axis` alongside q; columns stay global (each ring step
    gathers the rotating block's columns). Contiguous layout only — zigzag
    would need the caller to zigzag-reorder the bias rows, and no caller
    does; inside a manual region the caller passes the already-local rows.
    """
    from megatron_clip_tpu.parallel.mesh import manual_axes
    if bias is not None:
        if layout != "contiguous":
            raise ValueError("additive bias with ring attention requires "
                             "the contiguous layout (zigzag rows would "
                             "need a matching bias-row reorder)")
        if bias.ndim != 4:
            raise ValueError("ring-attention bias must be 4-D "
                             "[B|1, H|1, Sq|1, S] (got "
                             f"{bias.shape})")
    if axis in manual_axes():
        # already inside a manual region over `axis` (e.g. the pipeline's
        # stage shard_map manualizes context too for cp+pp): inputs are the
        # local seq shards — run the ring body directly
        return ring_attention_local(q, k, v, axis_name=axis, causal=causal,
                                    scale=scale, layout=layout, bias=bias)
    amesh = mesh if mesh is not None else jax.sharding.get_abstract_mesh()
    names = set(amesh.axis_names) if amesh is not None else set()
    bspec = tuple(a for a in batch_axes if a in names) or None
    hspec = head_axis if head_axis in names else None
    spec = P(bspec, axis, hspec, None)
    kwargs = {} if mesh is None else {"mesh": mesh}
    if bias is None:
        fn = partial(ring_attention_local, axis_name=axis, causal=causal,
                     scale=scale, layout=layout)
        return jax.shard_map(fn, in_specs=(spec, spec, spec),
                             out_specs=spec, **kwargs)(q, k, v)
    bias_spec = P(bspec if bias.shape[0] > 1 else None, None,
                  axis if bias.shape[2] > 1 else None, None)

    def fn(q, k, v, bias):
        return ring_attention_local(q, k, v, axis_name=axis, causal=causal,
                                    scale=scale, layout=layout, bias=bias)

    return jax.shard_map(fn, in_specs=(spec, spec, spec, bias_spec),
                         out_specs=spec, **kwargs)(q, k, v, bias)
