"""Parameter sharding rules — the TPU form of Megatron tensor parallelism.

The reference implements TP as explicit sharded modules with hand-placed
collectives (`ColumnParallelLinear`/`RowParallelLinear`/`VocabParallelEmbedding`,
megatron/core/tensor_parallel/layers.py:146-960, mappings.py:325-357). On TPU
the same math falls out of *weight shardings*: annotate

    wqkv [.., W, 3W]  -> P(..., fsdp, tensor)     (column-parallel)
    wo   [.., W, W]   -> P(..., tensor, fsdp)     (row-parallel)
    mlp.w1 [.., W, H] -> P(..., fsdp, tensor)     (column-parallel)
    mlp.w2 [.., H, W] -> P(..., tensor, fsdp)     (row-parallel)
    tok_embed [V, W]  -> P(tensor, fsdp)          (vocab-parallel)

and XLA's SPMD partitioner inserts exactly the all-reduce after the
row-parallel matmul (and the all-gathers for fsdp) that
f/g regions (mappings.py) hand-code — fused with the GEMMs and overlapped
with compute by the latency-hiding scheduler. Sequence parallelism
(Korthikanti-style activation sharding, SURVEY §2.1) is applied with
`with_sharding_constraint` on activations in the train step.

Rules are matched on param-tree paths so the same function covers the ViT
tower, the text tower, GPT, and stacked (scanned) block leaves.
"""
from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from megatron_clip_tpu.parallel.mesh import FSDP, TENSOR


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
    return "/".join(parts)


def transformer_block_specs(path: str, ndim: int, *, stacked: bool,
                            stage_axis: Optional[str] = None) -> P:
    """PartitionSpec for one leaf inside a transformer block tree.

    `stacked` leaves carry a leading layer axis; when `stage_axis` is given
    that layer axis is additionally sharded over pipeline stages (each stage
    holds its slice of layers — the mesh-native form of megatron's per-stage
    layer construction, transformer.py:1557-1605).
    """
    lead = (stage_axis,) if stacked else ()

    def spec(*dims):
        return P(*lead, *dims)

    if "attn/wqkv" in path or "mlp/w1" in path or "attn/wq" in path \
            or "attn/wkv" in path:
        return spec(FSDP, TENSOR)          # column-parallel
    if "attn/bqkv" in path or "mlp/b1" in path or "attn/bq" in path \
            or "attn/bkv" in path:
        return spec(TENSOR)
    if "attn/wo" in path or "mlp/w2" in path:
        return spec(TENSOR, FSDP)          # row-parallel
    # MoE expert weights: expert axis over fsdp (megatron's data-modulo-expert
    # EP groups, parallel_state.py:516-555), hidden dims tensor-parallel
    if "moe/w1" in path:
        return spec(FSDP, None, TENSOR)
    if "moe/w2" in path:
        return spec(FSDP, TENSOR, None)
    if "moe/b1" in path:
        return spec(FSDP, TENSOR)
    if "moe/b2" in path:
        return spec(FSDP, None)
    # layernorms, biases of row-parallel layers, layer-scale: replicated
    # (sharded only over stages when stacked)
    return spec(*([None] * (ndim - len(lead))))


def clip_param_specs(params: Any, *, stage_axis: Optional[str] = None) -> Any:
    """PartitionSpec tree for CLIP params (both towers + logit scale).

    Covers: stacked transformer blocks, patch/token embeddings, position
    embeddings, projections. `stage_axis` enables pipeline layer sharding.
    """
    def rule(path, leaf):
        p = _path_str(path)
        nd = leaf.ndim
        if "/blocks/" in p or p.startswith("blocks/"):
            return transformer_block_specs(p, nd, stacked=True,
                                           stage_axis=stage_axis)
        if "mm_blocks/" in p:
            # CoCa decoder (self+cross block pairs): same TP rules; the
            # stacked layer axis stage-shards under pp like the towers
            return transformer_block_specs(p, nd, stacked=True,
                                           stage_axis=stage_axis)
        if p.endswith("tok_embed"):
            return P(TENSOR, FSDP)          # vocab-parallel embedding
        if "patch_embed" in p and nd == 2:
            return P(None, FSDP)
        if p.endswith("proj/w") or p.endswith("proj"):
            if nd == 2:
                return P(FSDP, None)
        if "pos_embed" in p and nd == 2:
            return P()                       # small; replicate
        return P(*([None] * nd))

    return jax.tree_util.tree_map_with_path(rule, params)


def generic_param_specs(params: Any, *,
                        stage_axis: Optional[str] = None) -> Any:
    """PartitionSpec tree for any model built on the stacked-block stack
    (BERT/T5/ICT/RETRO/vision workloads): transformer blocks get the TP/FSDP
    rules, token embeddings go vocab-parallel, and everything else (heads,
    poolers, norms, small embeds) replicates. The one rule set megatron
    spreads across each model's ColumnParallel/RowParallel/VocabParallel
    constructor choices (megatron/model/*.py)."""
    def rule(path, leaf):
        p = _path_str(path)
        nd = leaf.ndim
        if "blocks/" in p:
            return transformer_block_specs(p, nd, stacked=True,
                                           stage_axis=stage_axis)
        if p.endswith("tok_embed") or p.endswith("word_embed"):
            return P(TENSOR, FSDP)          # vocab-parallel embedding
        if p.endswith("lm_head") and nd == 2:
            return P(FSDP, TENSOR)
        return P(*([None] * nd))

    return jax.tree_util.tree_map_with_path(rule, params)


def make_sharding_tree(mesh: Mesh, spec_tree: Any) -> Any:
    return jax.tree.map(lambda s: NamedSharding(mesh, s), spec_tree,
                        is_leaf=lambda x: isinstance(x, P))


def shard_params(params: Any, mesh: Mesh, spec_tree: Optional[Any] = None,
                 *, stage_axis: Optional[str] = None) -> Any:
    """Place a param tree onto the mesh with TP/FSDP shardings."""
    if spec_tree is None:
        spec_tree = clip_param_specs(params, stage_axis=stage_axis)
    shardings = make_sharding_tree(mesh, spec_tree)
    return jax.device_put(params, shardings)
