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

Feature composition (the reference scheduler handles all of these;
schedules.py forward_step carries losses/rng implicitly via torch autograd
and per-rank RNG states — here they are explicit scan state):
  - dropout: per-(microbatch, layer) keys precomputed as
    split(fold_in(rng, mb), L); each stage consumes its layer-slice, so the
    masks are IDENTICAL to a pp=1 run applying fold_in(rng, mb) per
    microbatch (megatron's tensor_parallel/random.py determinism, the SPMD
    way);
  - MoE: each stage accumulates its layers' aux loss over its active ticks;
    the psum over stages / mean over microbatches is returned alongside the
    activations (the analogue of megatron's per-rank moe loss reduction,
    distrib_grad.py:85);
  - context parallelism composes because the `context` axis stays auto
    inside the stage shard_map (ring attention opens its own inner
    shard_map over `context`).
"""
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from megatron_clip_tpu.config import TransformerCfg
from megatron_clip_tpu.nn.transformer import apply_transformer
from megatron_clip_tpu.parallel.mesh import CONTEXT, STAGE


def _cpu_promotes(*arrays):
    """XLA CPU's AllReducePromotion pass CHECK-fails cloning some bf16
    all-reduces in the pipelined train-step graphs ("Invalid binary
    instruction opcode copy", hlo_instruction.cc:1585). The bf16
    all-reduces come from (a) the final output psum and (b) the transposes
    of the stage-replicated shard_map inputs (d(x)/d(bias) sum over STAGE
    in the backward). Workaround: on the CPU backend, carry those inputs
    across the shard_map boundary in f32 and cast back inside — the compute
    stays bf16, only the boundary dtype changes. TPU is untouched."""
    promote = jax.default_backend() == "cpu"
    outs, dts = [], []
    for a in arrays:
        if promote and a is not None and a.dtype == jnp.bfloat16:
            outs.append(a.astype(jnp.float32))
            dts.append(jnp.bfloat16)
        else:
            outs.append(a)
            dts.append(None)
    return outs, tuple(dts)


def _output_psum(x):
    """Final output gather: psum the last stage's masked buffer to every
    stage. On the CPU backend the all-reduce runs in f32: XLA CPU's
    AllReducePromotion pass CHECK-fails cloning this bf16 all-reduce
    ("Invalid binary instruction opcode copy", hlo_instruction.cc:1585) in
    the pipelined-train-step graphs, so we promote manually there. TPU
    keeps the native bf16 psum (half the gather bytes)."""
    if jax.default_backend() == "cpu" and x.dtype != jnp.float32:
        return jax.lax.psum(x.astype(jnp.float32), STAGE).astype(x.dtype)
    return jax.lax.psum(x, STAGE)


def _microbatch_bias(bias, m, b):
    """Split an additive attention bias [B, ...] (padding masks etc.) into
    microbatches alongside x; broadcast shapes ([1,...] / [H,S,S]) are
    replicated per microbatch. Per-batch biases must be 4-D [B, H|1, S, S]:
    ndim alone disambiguates them from a 3-D [H, S, S] head bias whose H
    happens to equal the global batch."""
    if bias is None:
        return None
    if bias.ndim == 4 and bias.shape[0] == b:
        return bias.reshape(m, b // m, *bias.shape[1:])
    return jnp.broadcast_to(bias[None], (m, *bias.shape))


def _microbatch_keys(rng, cfg: TransformerCfg, m: int, n_layers: int):
    """[M, L, 2] dropout keys: split(fold_in(rng, mb), L) — the law a pp=1
    reference reproduces by folding the microbatch index into its rng."""
    if rng is None or (cfg.attention_dropout == 0 and cfg.hidden_dropout == 0):
        return None
    return jax.vmap(
        lambda i: jax.random.split(jax.random.fold_in(rng, i), n_layers)
    )(jnp.arange(m))


def _context_setup(mesh, cfg: TransformerCfg, x, bias, position_ids):
    """Context parallelism inside the pipeline: the stage shard_map also
    manualizes `context`, activations enter seq-sharded, and ring attention
    (which detects the already-manual axis) runs on the local shards. The
    rope tables are precomputed globally (honoring a zigzag position_ids
    reorder) and sliced per context rank inside the region — x.shape[1]
    there is the LOCAL seq, so apply_transformer cannot rebuild them.

    Returns (cp_size, axis_names, x_seq_spec_axis, (cos, sin) or None)."""
    cp_in = (getattr(cfg, "context_parallel", False)
             and CONTEXT in mesh.shape and mesh.shape[CONTEXT] > 1)
    if not cp_in:
        return 1, {STAGE}, None, None
    if bias is not None and getattr(cfg, "context_parallel_layout",
                                    "contiguous") != "contiguous":
        raise ValueError("additive attention bias with context parallelism "
                         "requires the contiguous layout (zigzag would "
                         "need a matching bias-row reorder)")
    rope_tabs = None
    if cfg.rope:
        if (getattr(cfg, "context_parallel_layout", "contiguous") == "zigzag"
                and position_ids is None):
            # ring attention masks with zigzag global positions; natural-
            # order rope tables would give every token the wrong rotary
            # phase with no error (pretrain_gpt threads zigzag position_ids)
            raise ValueError(
                "context_parallel_layout='zigzag' with rope requires "
                "position_ids in zigzag array order (see "
                "ops/ring_attention.zigzag_shard and pretrain_gpt.py)")
        from megatron_clip_tpu.ops.rope import rope_cos_sin
        cos, sin = rope_cos_sin(
            x.shape[1], cfg.head_dim, cfg.rope_theta,
            rotary_percent=cfg.rotary_percent,
            seq_len_interpolation_factor=cfg.rope_interpolation)
        if position_ids is not None:
            cos, sin = cos[position_ids], sin[position_ids]
        rope_tabs = (cos, sin)
    return mesh.shape[CONTEXT], {STAGE, CONTEXT}, CONTEXT, rope_tabs


def _vary(x, axes):
    """pcast to varying over `axes`, skipping axes x already varies over
    (pcast rejects re-varying; zeros derived from seq-sharded inputs arrive
    already context-varying)."""
    try:
        cur = x.aval.vma
    except AttributeError:
        cur = frozenset()
    need = tuple(a for a in axes if a not in cur)
    return jax.lax.pcast(x, need, to="varying") if need else x


def _local_rope(rope_tabs, cp_size: int, s_global: int):
    """Slice the global rope tables to this context rank's seq shard."""
    if rope_tabs is None or cp_size == 1:
        return rope_tabs
    cos, sin = rope_tabs
    sloc = s_global // cp_size
    crank = jax.lax.axis_index(CONTEXT)
    return (jax.lax.dynamic_slice_in_dim(cos, crank * sloc, sloc, 0),
            jax.lax.dynamic_slice_in_dim(sin, crank * sloc, sloc, 0))


def pipeline_transformer(blocks, x, cfg: TransformerCfg, *, mesh: Mesh,
                         num_microbatches: int, causal: bool = False,
                         bias=None, rng=None, position_ids=None,
                         rel_index=None, apply_fn=None, extra=None):
    """Run the stacked transformer blocks pipelined over the mesh's `stage`
    axis. blocks leaves: [L, ...] with L % n_stages == 0; x: [B, S, W] with
    B % num_microbatches == 0. `bias` (additive attention mask, e.g. BERT
    padding) travels with its microbatch through the ring. Returns the same
    contract as apply_transformer: activations, or (activations, moe_aux)
    when cfg.num_experts (aux = mean over microbatches of the per-microbatch
    layer-summed aux). Numerically identical to a microbatched
    apply_transformer.

    `apply_fn` replaces apply_transformer as the per-stage layer runner for
    non-standard block structures (the CoCa multimodal decoder's self+cross
    pairs, models/coca.py _mm_stage_apply) — same keyword contract, applied
    to the stage's local slice of the stacked blocks. `extra` [B, ...] is a
    per-sample side input every stage needs in full (the decoder's
    cross-attention image context): microbatched alongside x, resident on
    every stage (it does NOT travel the ring), indexed by the tick's
    microbatch and passed through as extra=.

    Memory profile: with the fixed global batch B, per-stage activation
    residuals total ~B * (1 + (S-1)/M) block-inputs regardless of M —
    GPipe's storage, bounded by jax.checkpoint at block granularity
    (cfg.remat) instead of megatron's deallocate_output_tensor surgery;
    see tests/test_pipeline.py for the compile-time memory check.
    """
    n_stages = mesh.shape[STAGE]
    if n_stages == 1:
        kw = {} if extra is None else {"extra": extra}
        return (apply_fn or apply_transformer)(
            blocks, x, cfg, causal=causal, bias=bias, rng=rng,
            position_ids=position_ids, rel_index=rel_index, **kw)

    n_layers = jax.tree.leaves(blocks)[0].shape[0]
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers not divisible by {n_stages} stages")
    lc = n_layers // n_stages
    m = num_microbatches
    b = x.shape[0]
    if b % m:
        raise ValueError(f"batch {b} not divisible by {m} microbatches")
    xm = x.reshape(m, b // m, *x.shape[1:])
    bm = _microbatch_bias(bias, m, b)
    km = _microbatch_keys(rng, cfg, m, n_layers)
    em = None
    if extra is not None:
        if extra.shape[0] != b:
            raise ValueError(f"extra side input batch {extra.shape[0]} != "
                             f"x batch {b}")
        em = extra.reshape(m, b // m, *extra.shape[1:])
    rm = None
    if rel_index is not None and getattr(rel_index, "ndim", 2) == 3:
        # per-example relative-position gather map [B, S', S'] (relpos ViT
        # under patch dropout keeps different patches per example):
        # microbatched and indexed per tick like the bias
        rm = rel_index.reshape(m, b // m, *rel_index.shape[1:])
        rel_index = None
    moe = cfg.num_experts > 0
    cp_size, axis_names, seq_axis, rope_tabs = _context_setup(
        mesh, cfg, x, bias, position_ids)
    if cp_size > 1 and (apply_fn is not None or extra is not None):
        # the CP branch rebuilds the per-stage forward around the ring-
        # attention rope slices and would otherwise silently drop a custom
        # stage runner (CoCa's decoder) — refuse loudly instead
        raise NotImplementedError(
            "custom apply_fn/extra (CoCa decoder) is not supported with "
            "context parallelism in the pipeline — run the decoder with "
            "--context-parallel-size 1")
    s_global = x.shape[1]
    # per-row [B, S] position ids (--reset-position-ids document packing):
    # microbatched like the bias, indexed by the stage's current microbatch
    pm = None
    if position_ids is not None and getattr(position_ids, "ndim", 1) == 2:
        if cp_size > 1:
            raise ValueError("per-row [B, S] position_ids are not "
                             "supported with context parallelism in the "
                             "pipeline (the rope tables are sliced by seq "
                             "shard, which a per-row reorder breaks)")
        pm = position_ids.reshape(m, b // m, position_ids.shape[1])
        position_ids = None   # the per-tick kw carries them instead

    def staged(stage_blocks, xm, bm, km, pm, em, rm, rope_tabs):
        # under _cpu_promotes the scan state/buffers stay f32 (any bf16
        # pvary/psum_invariant CHECK-fails XLA CPU's AllReducePromotion);
        # the per-tick compute is cast back to the model dtype below
        mdt, bias_dt, extra_dt = _boundary_dts
        stage = jax.lax.axis_index(STAGE)
        if cp_size > 1:
            fwd = partial(apply_transformer, stage_blocks, cfg=cfg,
                          causal=causal, rel_index=rel_index,
                          rope=_local_rope(rope_tabs, cp_size, s_global))
            assert apply_fn is None  # guarded below before tracing
        else:
            fwd = partial(apply_fn or apply_transformer, stage_blocks,
                          cfg=cfg, causal=causal, position_ids=position_ids,
                          rel_index=rel_index)
        ticks = m + n_stages - 1
        shift = [(i, i + 1) for i in range(n_stages - 1)]

        def tick(carry, t):
            state, state_bias, out_buf, acc_aux = carry
            mb_idx = jnp.clip(t - stage, 0, m - 1)
            inp = jax.lax.dynamic_index_in_dim(
                xm, jnp.minimum(t, m - 1), 0, keepdims=False)
            cur = jnp.where(stage == 0, inp, state)
            # fill/drain ticks carry no real microbatch on this stage: feed
            # zeros (LN/softmax-safe) instead of stale ring garbage
            active = (t >= stage) & (t - stage < m)
            cur = jnp.where(active, cur, jnp.zeros_like(cur))
            kw = {}
            if km is not None:
                lkeys = jax.lax.dynamic_index_in_dim(km, mb_idx, 0,
                                                     keepdims=False)
                kw["layer_keys"] = jax.lax.dynamic_slice_in_dim(
                    lkeys, stage * lc, lc, 0)
            if pm is not None:
                kw["position_ids"] = jax.lax.dynamic_index_in_dim(
                    pm, mb_idx, 0, keepdims=False)
            if em is not None:
                # per-microbatch side input (decoder cross-attn context):
                # stage-resident, indexed — never rides the ring
                ex = jax.lax.dynamic_index_in_dim(em, mb_idx, 0,
                                                  keepdims=False)
                kw["extra"] = ex if extra_dt is None else ex.astype(extra_dt)
            if rm is not None:
                kw["rel_index"] = jax.lax.dynamic_index_in_dim(
                    rm, mb_idx, 0, keepdims=False)
            x_in = cur if mdt is None else cur.astype(mdt)
            if bm is not None:
                bias_in = jax.lax.dynamic_index_in_dim(
                    bm, jnp.minimum(t, m - 1), 0, keepdims=False)
                cur_bias = jnp.where(stage == 0, bias_in, state_bias)
                out = fwd(x=x_in, bias=cur_bias if bias_dt is None
                          else cur_bias.astype(bias_dt), **kw)
                state_bias = jax.lax.ppermute(cur_bias, STAGE, shift)
            else:
                out = fwd(x=x_in, **kw)
            if moe:
                y, aux_t = out
                acc_aux = acc_aux + jnp.where(active, aux_t, 0.0)
            else:
                y = out
            y = y.astype(xm.dtype)      # back to the (possibly f32) carry
            # the last stage writes microbatch t-(S-1) into the output slot
            write = (stage == n_stages - 1) & active
            prev = jax.lax.dynamic_index_in_dim(out_buf, mb_idx, 0,
                                                keepdims=False)
            out_buf = jax.lax.dynamic_update_index_in_dim(
                out_buf, jnp.where(write, y, prev), mb_idx, 0)
            state = jax.lax.ppermute(y, STAGE, shift)
            return (state, state_bias, out_buf, acc_aux), None

        vary = tuple(axis_names)
        zero = _vary(jnp.zeros_like(xm[0]), vary)
        zero_bias = None if bm is None else _vary(jnp.zeros_like(bm[0]),
                                                  (STAGE,))
        out0 = _vary(jnp.zeros_like(xm), vary)
        aux0 = _vary(jnp.zeros((), jnp.float32), vary)
        (_, _, outs, acc_aux), _ = jax.lax.scan(
            tick, (zero, zero_bias, out0, aux0), jnp.arange(ticks))
        # only the last stage's buffer holds data; broadcast to every stage
        mask = (stage == n_stages - 1).astype(outs.dtype)
        acc_aux = jax.lax.psum(acc_aux, STAGE) / m
        if cp_size > 1:
            # each context rank saw only its seq shard's router decisions
            acc_aux = jax.lax.pmean(acc_aux, CONTEXT)
        return _output_psum(outs * mask), acc_aux

    xspec = P(None, None, seq_axis)       # [M, mb, S(/cp), W]
    # under cp the bias's query-row dim shards with the activations (ring
    # attention gathers the rotating block's columns by global position);
    # query-broadcast biases ([.., 1, S]) stay replicated
    bm_spec = P()
    if bm is not None and cp_size > 1 and bm.shape[-2] > 1:
        bm_spec = P(*([None] * (bm.ndim - 2)), CONTEXT, None)
    (xm, bm, em), _boundary_dts = _cpu_promotes(xm, bm, em)
    if cp_size > 1:
        # with context parallelism manualized inside the region, ring
        # attention's own psums run in the per-tick COMPUTE dtype — casting
        # back to bf16 re-creates the bf16 all-reduces _cpu_promotes exists
        # to avoid (XLA CPU AllReducePromotion CHECK-fail, one level
        # deeper). Keep the whole per-tick compute f32 on CPU; on TPU the
        # dts are already None and this is a no-op.
        _boundary_dts = tuple(None for _ in _boundary_dts)
    out, aux = jax.shard_map(
        staged, mesh=mesh,
        in_specs=(P(STAGE), xspec, bm_spec, P(), P(), P(), P(), P()),
        out_specs=(xspec, P()),
        axis_names=axis_names,
    )(blocks, xm, bm, km, pm, em, rm, rope_tabs)
    out = out.reshape(b, *x.shape[1:]).astype(x.dtype)
    return (out, aux) if moe else out


def make_pipelined_layers_fn(mesh: Mesh, num_microbatches: int,
                             num_chunks: int = 1,
                             vpp_prearranged: bool = False) -> Callable:
    """Adapter for towers: returns layers_fn(blocks, x, cfg, causal) that the
    model applies in place of apply_transformer when pp > 1. num_chunks > 1
    selects the interleaved (virtual-pipeline) schedule; vpp_prearranged
    declares the stacked layers already in `vpp_arrange` physical order (see
    the interleaved docstring — skips the per-step cross-stage weight
    permute)."""
    def layers_fn(blocks, x, cfg, *, causal=False, bias=None, rng=None,
                  position_ids=None, rel_index=None, apply_fn=None,
                  extra=None):
        if num_chunks > 1:
            if apply_fn is not None or extra is not None:
                raise NotImplementedError(
                    "custom apply_fn/extra (CoCa decoder) is supported by "
                    "the plain pipeline schedule only — build the decoder's "
                    "layers_fn with num_chunks=1 (the towers may still "
                    "interleave)")
            return pipeline_transformer_interleaved(
                blocks, x, cfg, mesh=mesh, num_microbatches=num_microbatches,
                num_chunks=num_chunks, causal=causal, bias=bias, rng=rng,
                position_ids=position_ids, rel_index=rel_index,
                prearranged=vpp_prearranged)
        return pipeline_transformer(blocks, x, cfg, mesh=mesh,
                                    num_microbatches=num_microbatches,
                                    causal=causal, bias=bias, rng=rng,
                                    position_ids=position_ids,
                                    rel_index=rel_index, apply_fn=apply_fn,
                                    extra=extra)
    return layers_fn


def vpp_layer_order(n_layers: int, n_stages: int, num_chunks: int):
    """Physical layer order for zero-copy interleaved placement: stage s's
    CONTIGUOUS leading-dim shard holds its round-robin chunks k*S+s for
    k = 0..V-1 (megatron's per-rank non-contiguous VPP layer assignment,
    training.py:227-242, expressed as a one-time permutation so the
    PartitionSpec over `stage` stays a plain contiguous split).

    Returns order such that physical[i] = logical[order[i]]."""
    import numpy as np
    lc = n_layers // (n_stages * num_chunks)
    if lc * n_stages * num_chunks != n_layers:
        raise ValueError(f"{n_layers} layers not divisible by "
                         f"stages*chunks {n_stages * num_chunks}")
    return np.asarray([(k * n_stages + s) * lc + i
                       for s in range(n_stages)
                       for k in range(num_chunks)
                       for i in range(lc)])


def vpp_arrange(blocks, n_stages: int, num_chunks: int):
    """Permute stacked layer params logical -> physical (one-time, outside
    the train step). Pair with layers_fn(vpp_prearranged=True)."""
    n_layers = jax.tree.leaves(blocks)[0].shape[0]
    order = vpp_layer_order(n_layers, n_stages, num_chunks)
    return jax.tree.map(lambda l: l[order], blocks)


def vpp_restore(blocks, n_stages: int, num_chunks: int):
    """Inverse of vpp_arrange (physical -> logical, e.g. for checkpoints,
    which stay layout-independent in logical layer order)."""
    import numpy as np
    n_layers = jax.tree.leaves(blocks)[0].shape[0]
    inv = np.argsort(vpp_layer_order(n_layers, n_stages, num_chunks))
    return jax.tree.map(lambda l: l[inv], blocks)


def pipeline_transformer_interleaved(blocks, x, cfg: TransformerCfg, *,
                                     mesh: Mesh, num_microbatches: int,
                                     num_chunks: int, causal: bool = False,
                                     bias=None, rng=None, position_ids=None,
                                     rel_index=None,
                                     prearranged: bool = False):
    """Interleaved (virtual-pipeline) schedule — megatron's
    `forward_backward_pipelining_with_interleaving` (schedules.py:370-935)
    done as a circular ring.

    Each stage holds `num_chunks` non-contiguous layer chunks (global chunk v
    lives on stage v % S — the VPP layer assignment, training.py:227-242);
    activations circulate the ring num_chunks times, so the pipeline bubble
    shrinks from (S-1)/(M+S-1) to ~(S-1)/(M*V+S-1) per unit work.

    Weight placement: with `prearranged=False` (logical [L,...] layer order,
    contiguous over `stage`), the round-robin chunk gather re-permutes
    ~(V-1)/V of the block weights across stages inside EVERY step (fwd + the
    transposed scatter in bwd) — correct but costly at scale. Training
    runtimes should place params with `vpp_arrange` once and pass
    `prearranged=True` (physical order: stage s's contiguous shard = its
    chunks k*S+s), which makes the chunk lookup a local reshape with zero
    cross-stage traffic; checkpoints stay logical via `vpp_restore`.

    Schedule law: at tick t, stage s advances the activation whose chunk is
    ((t-s)//S) mod V; stage 0 injects microbatch (t//(S*V))*S + t%S whenever
    (t//S) % V == 0; the final activation exits stage S-1 on chunk V-1.
    The microbatch at (t, s) is recovered as t0 = t - s - S*chunk (its
    injection tick), mb = (t0//(S*V))*S + t0%S — used to pick dropout keys.
    Requires M % S == 0 and layers % (S*V) == 0.
    """
    n_stages = mesh.shape[STAGE]
    v = num_chunks
    if n_stages == 1 or v == 1:
        return pipeline_transformer(blocks, x, cfg, mesh=mesh,
                                    num_microbatches=num_microbatches,
                                    causal=causal, bias=bias, rng=rng,
                                    position_ids=position_ids,
                                    rel_index=rel_index)
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
    km = _microbatch_keys(rng, cfg, m, n_layers)
    rm = None
    if rel_index is not None and getattr(rel_index, "ndim", 2) == 3:
        # per-example gather map (relpos + patch dropout): per-microbatch
        rm = rel_index.reshape(m, b // m, *rel_index.shape[1:])
        rel_index = None
    moe = cfg.num_experts > 0
    cp_size, axis_names, seq_axis, rope_tabs = _context_setup(
        mesh, cfg, x, bias, position_ids)
    s_global = x.shape[1]
    pm = None
    if position_ids is not None and getattr(position_ids, "ndim", 1) == 2:
        if cp_size > 1:
            raise ValueError("per-row [B, S] position_ids are not "
                             "supported with context parallelism in the "
                             "pipeline")
        pm = position_ids.reshape(m, b // m, position_ids.shape[1])
        position_ids = None

    if prearranged:
        # physical vpp_arrange order: each stage's contiguous [L/S] shard is
        # already its round-robin chunks — zero cross-stage weight movement
        stage_major = blocks
    else:
        # rearrange stacked layers [L,...] -> [S, V, Lc, ...] with global
        # chunk k*S + s at [s, k] (round-robin chunk placement). NOTE: on a
        # stage-sharded array this gather is a cross-stage weight permute
        # paid inside every step — see the docstring; prefer prearranged.
        def arrange(leaf):
            chunks = leaf.reshape(n_stages * v, lc, *leaf.shape[1:])
            idx = jnp.asarray([[k * n_stages + s for k in range(v)]
                               for s in range(n_stages)])
            return chunks[idx]                   # [S, V, Lc, ...]

        stage_major = jax.tree.map(arrange, blocks)
    sv = n_stages * v
    ticks = m * v + n_stages - 1

    def staged(stage_blocks, xm, bm, km, pm, rm, rope_tabs):
        # under _cpu_promotes the scan state/buffers stay f32 (any bf16
        # pvary/psum_invariant CHECK-fails XLA CPU's AllReducePromotion);
        # the per-tick compute is cast back to the model dtype below
        mdt, bias_dt = _boundary_dts
        if prearranged:
            # the contiguous local [L/S, ...] shard is chunks k=0..V-1
            stage_blocks = jax.tree.map(
                lambda l: l.reshape(v, lc, *l.shape[1:]), stage_blocks)
        else:
            # shard_map divides the leading S axis to size 1; squeeze it
            stage_blocks = jax.tree.map(lambda l: l[0],
                                        stage_blocks)      # [V, Lc, ...]
        stage = jax.lax.axis_index(STAGE)
        shift = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        local_rope = (_local_rope(rope_tabs, cp_size, s_global)
                      if cp_size > 1 else None)
        # pm (per-row ids) arrives via the per-tick kw instead
        pos_ids = None if cp_size > 1 else position_ids
        assert not (pos_ids is not None and pm is not None)

        def tick(carry, t):
            state, state_bias, out_buf, acc_aux = carry
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
            # microbatch being advanced: injected at t0 = t - s - S*chunk
            t0 = t - stage - n_stages * chunk
            m_cur = jnp.clip((t0 // sv) * n_stages + t0 % n_stages,
                             0, m - 1)
            kw = {}
            if km is not None:
                lkeys = jax.lax.dynamic_index_in_dim(km, m_cur, 0,
                                                     keepdims=False)
                # global chunk g = chunk*S + stage holds layers
                # [g*lc, (g+1)*lc)
                kw["layer_keys"] = jax.lax.dynamic_slice_in_dim(
                    lkeys, (chunk * n_stages + stage) * lc, lc, 0)
            if pm is not None:
                kw["position_ids"] = jax.lax.dynamic_index_in_dim(
                    pm, m_cur, 0, keepdims=False)
            elif pos_ids is not None:
                kw["position_ids"] = pos_ids
            ri = rel_index
            if rm is not None:
                ri = jax.lax.dynamic_index_in_dim(rm, m_cur, 0,
                                                  keepdims=False)
            x_in = cur if mdt is None else cur.astype(mdt)
            if bm is not None:
                bias_in = jax.lax.dynamic_index_in_dim(bm, m_in, 0,
                                                       keepdims=False)
                cur_bias = jnp.where(inject, bias_in, state_bias)
                out = apply_transformer(chunk_blocks, x_in, cfg,
                                        causal=causal,
                                        bias=cur_bias if bias_dt is None
                                        else cur_bias.astype(bias_dt),
                                        rel_index=ri,
                                        rope=local_rope, **kw)
                state_bias = jax.lax.ppermute(cur_bias, STAGE, shift)
            else:
                out = apply_transformer(chunk_blocks, x_in, cfg,
                                        causal=causal, rel_index=ri,
                                        rope=local_rope, **kw)
            if moe:
                y, aux_t = out
                acc_aux = acc_aux + jnp.where(active, aux_t, 0.0)
            else:
                y = out
            y = y.astype(xm.dtype)      # back to the (possibly f32) carry
            # final outputs leave the last stage on chunk V-1; write them
            # into an [M, ...] buffer indexed by microbatch instead of
            # scan-stacking all (M*V + S - 1) tick outputs — ~V+1x less
            # per-stage output HBM, matching the GPipe schedule's storage
            write = (stage == n_stages - 1) & (chunk == v - 1) & active
            prev = jax.lax.dynamic_index_in_dim(out_buf, m_cur, 0,
                                                keepdims=False)
            out_buf = jax.lax.dynamic_update_index_in_dim(
                out_buf, jnp.where(write, y, prev), m_cur, 0)
            state = jax.lax.ppermute(y, STAGE, shift)
            return (state, state_bias, out_buf, acc_aux), None

        vary = tuple(axis_names)
        init = _vary(jnp.zeros_like(xm[0]), vary)
        init_bias = None if bm is None else _vary(jnp.zeros_like(bm[0]),
                                                  (STAGE,))
        out0 = _vary(jnp.zeros_like(xm), vary)
        aux0 = _vary(jnp.zeros((), jnp.float32), vary)
        (_, _, outs, acc_aux), _ = jax.lax.scan(
            tick, (init, init_bias, out0, aux0), jnp.arange(ticks))

        mask = (stage == n_stages - 1).astype(outs.dtype)
        acc_aux = jax.lax.psum(acc_aux, STAGE) / m
        if cp_size > 1:
            acc_aux = jax.lax.pmean(acc_aux, CONTEXT)
        return _output_psum(outs * mask), acc_aux

    xspec = P(None, None, seq_axis)
    bm_spec = P()
    if bm is not None and cp_size > 1 and bm.shape[-2] > 1:
        bm_spec = P(*([None] * (bm.ndim - 2)), CONTEXT, None)
    (xm, bm), _boundary_dts = _cpu_promotes(xm, bm)
    if cp_size > 1:
        # see the plain schedule: ring attention's psums must not run in
        # bf16 on the CPU backend; f32 per-tick compute under CP (no-op on
        # TPU where the dts are already None)
        _boundary_dts = tuple(None for _ in _boundary_dts)
    out, aux = jax.shard_map(
        staged, mesh=mesh,
        in_specs=(P(STAGE), xspec, bm_spec, P(), P(), P(), P()),
        out_specs=(xspec, P()),
        axis_names=axis_names,
    )(stage_major, xm, bm, km, pm, rm, rope_tabs)
    out = out.reshape(b, *x.shape[1:]).astype(x.dtype)
    return (out, aux) if moe else out
