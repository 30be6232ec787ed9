"""GPT decoder-only language model.

Covers the reference's GPT workload surface (megatron/model/gpt_model.py:43,
megatron/core/models/gpt/gpt_model.py:20, pretrain_gpt.py): token embedding
(+ learned positions or rotary), causal pre-LN blocks with optional
swiglu/rmsnorm/GQA (the megatron llama-style flags), final norm, and logits
via the tied embedding (megatron's shared embedding, model/module.py) or an
untied lm head.
"""
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from megatron_clip_tpu.config import TransformerCfg
from megatron_clip_tpu.nn.transformer import (
    init_transformer, apply_transformer, init_layer_norm, apply_norm)
from megatron_clip_tpu.ops.cross_entropy import cross_entropy


@dataclass(frozen=True)
class GPTCfg:
    num_layers: int = 12
    hidden_size: int = 768
    num_heads: int = 12
    vocab_size: int = 50304        # megatron pads vocab to a friendly multiple
    seq_length: int = 1024
    mlp_ratio: float = 4.0
    position_embedding: str = "learned"  # learned | rope
    rope_theta: float = 10000.0
    rotary_percent: float = 1.0          # megatron --rotary-percent
    rope_interpolation: Optional[float] = None  # --rotary-seq-len-interpolation-factor
    swiglu: bool = False
    squared_relu: bool = False           # megatron --squared-relu
    normalization: str = "layernorm"     # layernorm | rmsnorm
    use_bias: bool = True
    kv_heads: Optional[int] = None       # GQA
    kv_channels: Optional[int] = None    # per-head dim override (--kv-channels)
    max_position_embeddings: Optional[int] = None  # learned-pos table length
                                         # (megatron --max-position-embeddings;
                                         # defaults to seq_length)
    num_experts: int = 0                 # SwitchMLP MoE (--num-experts)
    moe_aux_loss_coeff: float = 0.01
    tie_embeddings: bool = True
    init_std: float = 0.02

    def transformer(self, **overrides) -> TransformerCfg:
        return TransformerCfg(
            layers=self.num_layers, width=self.hidden_size,
            heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            act="swiglu" if self.swiglu
            else ("squared_relu" if self.squared_relu else "gelu_tanh"),
            norm=self.normalization, use_bias=self.use_bias,
            rope=self.position_embedding == "rope",
            rope_theta=self.rope_theta,
            rotary_percent=self.rotary_percent,
            rope_interpolation=self.rope_interpolation,
            kv_heads=self.kv_heads,
            kv_channels=self.kv_channels,
            init_std=self.init_std,
            num_experts=self.num_experts, **overrides)


def init_gpt(key, cfg: GPTCfg, dtype=jnp.float32):
    keys = jax.random.split(key, 4)
    params = {
        "tok_embed": (cfg.init_std * jax.random.normal(
            keys[0], (cfg.vocab_size, cfg.hidden_size))).astype(dtype),
        "ln_f": init_layer_norm(cfg.hidden_size, dtype, cfg.normalization),
        "blocks": init_transformer(keys[2], cfg.transformer(), dtype),
    }
    if cfg.position_embedding == "learned":
        if cfg.max_position_embeddings is not None \
                and cfg.max_position_embeddings < cfg.seq_length:
            # megatron asserts seq_length <= max_position_embeddings;
            # silently widening the table would produce a checkpoint whose
            # pos_embed no longer matches the declared flag
            raise ValueError(
                f"max_position_embeddings {cfg.max_position_embeddings} < "
                f"seq_length {cfg.seq_length}")
        n_pos = cfg.max_position_embeddings or cfg.seq_length
        params["pos_embed"] = (cfg.init_std * jax.random.normal(
            keys[1], (n_pos, cfg.hidden_size))).astype(dtype)
    if not cfg.tie_embeddings:
        params["lm_head"] = (cfg.init_std * jax.random.normal(
            keys[3], (cfg.hidden_size, cfg.vocab_size))).astype(dtype)
    return params


def apply_gpt(params, tokens, cfg: GPTCfg, *, compute_dtype=jnp.bfloat16,
              tcfg: Optional[TransformerCfg] = None, layers_fn=None,
              return_hidden: bool = False, rng=None, position_ids=None,
              attn_bias=None):
    """tokens [B, S] int32 -> logits [B, S, V] (fp32).

    `rng` enables dropout (training): embedding dropout at hidden_dropout
    rate (megatron language_model.py Embedding) plus the per-block
    attention/hidden dropout threaded through apply_transformer.
    `position_ids` [S]: global token positions when array order differs
    from position order (zigzag context-parallel layout); or [B, S]
    per-row positions restarting at document boundaries (megatron
    --reset-position-ids) — indexes the learned pos-embed / rope tables.
    `attn_bias` [B, 1, S, S]: additive attention mask composed with the
    causal mask (megatron --reset-attention-mask document isolation)."""
    tcfg = tcfg or cfg.transformer()
    if (tcfg.context_parallel and position_ids is None
            and tcfg.context_parallel_layout == "zigzag"):
        # the learned pos-embed / rope tables and the LM loss shift all
        # assume array order == position order; the zigzag CP layout breaks
        # that, so explicit zigzag position_ids are mandatory
        raise ValueError(
            "context_parallel_layout='zigzag' requires position_ids in "
            "zigzag array order (ops/ring_attention.zigzag_shard; see "
            "pretrain_gpt.py for the integrated data path)")
    s = tokens.shape[1]
    x = params["tok_embed"][tokens].astype(compute_dtype)
    if "pos_embed" in params:
        if position_ids is None:
            x = x + params["pos_embed"][:s].astype(compute_dtype)[None]
        else:
            pe = params["pos_embed"][position_ids].astype(compute_dtype)
            # [S, W] shared positions broadcast over batch; [B, S, W]
            # per-row positions add directly
            x = x + (pe if pe.ndim == 3 else pe[None])
    k_embed = k_blocks = None
    if rng is not None:
        k_embed, k_blocks = jax.random.split(rng)
        from megatron_clip_tpu.nn.transformer import dropout
        x = dropout(x, tcfg.hidden_dropout, k_embed)
    aux = None
    if layers_fn is None:
        x = apply_transformer(params["blocks"], x, tcfg, causal=True,
                              rng=k_blocks, position_ids=position_ids,
                              bias=attn_bias)
    else:
        x = layers_fn(params["blocks"], x, tcfg, causal=True, rng=k_blocks,
                      position_ids=position_ids, bias=attn_bias)
    if cfg.num_experts:
        x, aux = x
    x = apply_norm(params["ln_f"], x, cfg.normalization)
    if return_hidden:
        return x
    if cfg.tie_embeddings:
        logits = jnp.einsum("bsw,vw->bsv", x,
                            params["tok_embed"].astype(x.dtype))
    else:
        logits = jnp.einsum("bsw,wv->bsv", x,
                            params["lm_head"].astype(x.dtype))
    logits = logits.astype(jnp.float32)
    if cfg.num_experts:
        return logits, aux
    return logits


def get_ltor_masks_and_position_ids(tokens, eod_token: int, *,
                                    reset_position_ids: bool = False,
                                    reset_attention_mask: bool = False,
                                    eod_mask_loss: bool = False):
    """Document-boundary handling over packed token streams — megatron
    utils.py:get_ltor_masks_and_position_ids, vectorized for jit (no
    per-row python loops over eod indices).

    tokens: [B, S] the model INPUTS. Returns (attn_bias, loss_mask,
    position_ids), each None when its flag is off:
      - attn_bias [B, 1, S, S]: 0 where query and key fall in the same
        document, -1e30 across documents (composes with the causal mask) —
        --reset-attention-mask
      - loss_mask [B, S] over input positions: 0 where the input token is
        EOD (don't train the prediction made from an EOD slot) —
        --eod-mask-loss
      - position_ids [B, S] restarting at 0 after each EOD —
        --reset-position-ids
    """
    b, s = tokens.shape
    e = tokens == eod_token
    loss_mask = jnp.where(e, 0.0, 1.0) if eod_mask_loss else None
    idx = jax.lax.iota(jnp.int32, s)
    attn_bias = None
    if reset_attention_mask:
        # document index per position: the token AFTER an eod starts a new
        # document (the eod itself closes the current one)
        doc = jnp.cumsum(e.astype(jnp.int32), axis=1) - e.astype(jnp.int32)
        same = doc[:, :, None] == doc[:, None, :]
        attn_bias = jnp.where(same, 0.0, -1e30)[:, None]   # [B, 1, S, S]
    position_ids = None
    if reset_position_ids:
        # distance from the start of the current document: subtract the
        # (exclusive) running max of eod-boundary positions
        boundary = jnp.where(e, idx[None] + 1, 0)
        last = jax.lax.cummax(boundary, axis=1)
        last = jnp.pad(last[:, :-1], ((0, 0), (1, 0)))     # exclusive
        position_ids = idx[None] - last                    # [B, S]
    return attn_bias, loss_mask, position_ids


def gpt_loss(params, tokens, cfg: GPTCfg, *, loss_mask=None,
             compute_dtype=jnp.bfloat16, tcfg=None, layers_fn=None,
             rng=None, loss_seq_chunk: int = 0, position_ids=None,
             targets=None, fused_ce: bool = False, attn_bias=None):
    """Next-token LM loss: predict tokens[:, 1:] from tokens[:, :-1]
    (pretrain_gpt.py loss_func semantics, with loss-mask averaging).

    loss_seq_chunk > 0 computes the lm-head projection + cross-entropy in
    sequence chunks of that size under `jax.checkpoint`: peak logits memory
    drops from [B,S,V] (3.3 GB fp32 at bs8/s2048/v50k — an HBM blowout on
    one chip) to [B,C,V], with the chunk logits recomputed in backward. The
    single-chip analogue of megatron's vocab-parallel cross-entropy memory
    relief (tensor_parallel/cross_entropy.py). MoE models (aux loss) use the
    unchunked path.

    `targets` (with `position_ids`): pre-shifted inputs/targets for the
    zigzag context-parallel layout, where the next-token shift must happen
    in natural order BEFORE the zigzag reorder — `tokens` are then the model
    inputs [B, S] directly and `loss_mask` is already aligned to targets."""
    if targets is None:
        targets = tokens[:, 1:]
        inputs = tokens[:, :-1]
        # loss_mask follows megatron --eod-mask-loss semantics: 0 where the
        # INPUT token is EOD (don't train the prediction made FROM an EOD
        # slot) — align it to the input positions, not the targets
        mask = None if loss_mask is None else \
            loss_mask[:, :-1].astype(jnp.float32)
    else:
        inputs = tokens
        mask = None if loss_mask is None else loss_mask.astype(jnp.float32)
    if tcfg is None:
        # gpt_loss IS the training objective: default to train=True so MoE
        # routes with sinkhorn balancing + capacity (megatron SwitchMLP
        # self.training semantics) — the bare cfg.transformer() default of
        # train=False is for inference (apply_gpt). Callers wanting eval
        # loss pass an explicit tcfg (pretrain_gpt.py tcfg_eval).
        tcfg = cfg.transformer(train=True)
    if fused_ce and not cfg.num_experts:
        # fused lm-head + CE Pallas kernel: logits never hit HBM
        # (ops/pallas/fused_ce.py — the single-chip answer to megatron's
        # vocab-parallel cross-entropy memory relief)
        from megatron_clip_tpu.ops.pallas.fused_ce import \
            fused_linear_cross_entropy
        h = apply_gpt(params, inputs, cfg,
                      compute_dtype=compute_dtype, tcfg=tcfg,
                      layers_fn=layers_fn, rng=rng, return_hidden=True,
                      position_ids=position_ids, attn_bias=attn_bias)
        b, s, wd = h.shape
        wh = (params["tok_embed"].T if cfg.tie_embeddings
              else params["lm_head"]).astype(h.dtype)
        per = fused_linear_cross_entropy(
            h.reshape(b * s, wd), wh, targets.reshape(-1))
        m = (jnp.ones((b * s,), jnp.float32) if mask is None
             else mask.reshape(-1))
        return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)

    if loss_seq_chunk and not cfg.num_experts:
        h = apply_gpt(params, inputs, cfg,
                      compute_dtype=compute_dtype, tcfg=tcfg,
                      layers_fn=layers_fn, rng=rng, return_hidden=True,
                      position_ids=position_ids, attn_bias=attn_bias)
        b, s, w = h.shape
        c = min(loss_seq_chunk, s)
        pad = (-s) % c
        m = jnp.ones((b, s), jnp.float32) if mask is None else mask
        if pad:
            h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
            targets = jnp.pad(targets, ((0, 0), (0, pad)))
            m = jnp.pad(m, ((0, 0), (0, pad)))
        n = (s + pad) // c
        hs = h.reshape(b, n, c, w).transpose(1, 0, 2, 3)
        ts = targets.reshape(b, n, c).transpose(1, 0, 2)
        ms = m.reshape(b, n, c).transpose(1, 0, 2)
        wh = params["tok_embed"] if cfg.tie_embeddings else params["lm_head"]
        eq = "bcw,vw->bcv" if cfg.tie_embeddings else "bcw,wv->bcv"

        @jax.checkpoint
        def chunk(carry, xs):
            xc, tc, mc = xs
            logits = jnp.einsum(eq, xc, wh.astype(xc.dtype)
                                ).astype(jnp.float32)
            per = cross_entropy(logits, tc)
            tot, cnt = carry
            return (tot + jnp.sum(per * mc), cnt + jnp.sum(mc)), None

        (tot, cnt), _ = jax.lax.scan(
            chunk, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)),
            (hs, ts, ms))
        return tot / jnp.maximum(cnt, 1.0)

    out = apply_gpt(params, inputs, cfg,
                    compute_dtype=compute_dtype, tcfg=tcfg,
                    layers_fn=layers_fn, rng=rng, position_ids=position_ids,
                    attn_bias=attn_bias)
    aux = jnp.zeros((), jnp.float32)
    if cfg.num_experts:
        logits, aux = out
    else:
        logits = out
    per_tok = cross_entropy(logits, targets)
    if mask is None:
        loss = per_tok.mean()
    else:
        loss = jnp.sum(per_tok * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return loss + cfg.moe_aux_loss_coeff * aux


def gpt_param_specs(params, *, stage_axis=None):
    """TP/FSDP PartitionSpecs for GPT params (mirrors clip_param_specs)."""
    from jax.sharding import PartitionSpec as P
    from megatron_clip_tpu.parallel.sharding import transformer_block_specs, _path_str
    import jax.tree_util as jtu

    def rule(path, leaf):
        p = _path_str(path)
        nd = leaf.ndim
        if "blocks/" in p or p.startswith("blocks"):
            return transformer_block_specs(p, nd, stacked=True,
                                           stage_axis=stage_axis)
        if p.endswith("tok_embed"):
            return P("tensor", "fsdp")      # vocab-parallel embedding + head
        if p.endswith("lm_head"):
            return P("fsdp", "tensor")
        return P(*([None] * nd))

    return jtu.tree_map_with_path(rule, params)
