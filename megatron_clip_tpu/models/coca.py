"""CoCa: Contrastive Captioner (two-tower CLIP + multimodal text decoder).

Architecture-exact to open_CLIP's CoCa (open_CLIP/src/open_clip/
coca_model.py:79-458 + transformer.py:656-736 MultimodalTransformer):
  - vision tower (models/vit.py) with `output_tokens`: pooled contrastive
    embedding + raw caption-context tokens. With `attentional_pool`
    (coca_ViT-B-32/L-14) the pooler's query 0 is the contrastive embedding
    and queries 1..n the context; without it (coca_base, coca_roberta) the
    context is the raw patch-token states.
  - text tower with `embed_cls` (transformer.py:516-654): the caption is
    truncated by one, a learned CLS token appended; CLS output -> contrastive
    text embedding, the un-normalized token states feed the decoder.
  - multimodal decoder: per layer a causal self-attention residual block
    followed by a cross-attention residual block (EACH with its own MLP,
    transformer.py:680-691), then ln_final and a bias-free LM head
    (`text_projection` [width, vocab]).
  - losses: InfoNCE on the pooled pair + caption cross-entropy (CoCaLoss).

Width adapters (`mm_proj`, `img_proj`) are created ONLY when a tower's token
width differs from the decoder width — in every reference config they are
equal (the torch implementation would fail otherwise), so reference
checkpoints round-trip without extra parameters.
"""
import jax
import jax.numpy as jnp

from megatron_clip_tpu.config import CLIPCfg, MultimodalCfg
from megatron_clip_tpu.models.vit import init_vit, apply_vit
from megatron_clip_tpu.models.text import init_text, apply_text
from megatron_clip_tpu.models.clip import LOGIT_SCALE_MAX, _l2_normalize
from megatron_clip_tpu.nn.transformer import init_layer_norm
from megatron_clip_tpu.ops import layer_norm, multi_head_attention
from megatron_clip_tpu.ops.activations import bias_act


def _init_mm_layer(key, cfg: MultimodalCfg, dtype=jnp.float32):
    """One decoder layer: self resblock + cross resblock, each with an MLP
    (reference MultimodalTransformer pairs resblocks[i] with cross_attn[i])."""
    w = cfg.width
    std = w ** -0.5
    proj_std = std * ((2 * cfg.layers) ** -0.5)
    fc_std = (2 * w) ** -0.5
    hid = int(w * cfg.mlp_ratio)
    ks = jax.random.split(key, 10)

    def mlp(k1, k2):
        return {
            "w1": (jax.random.normal(k1, (w, hid)) * fc_std).astype(dtype),
            "b1": jnp.zeros((hid,), dtype=dtype),
            "w2": (jax.random.normal(k2, (hid, w)) * proj_std).astype(dtype),
            "b2": jnp.zeros((w,), dtype=dtype),
        }

    return {
        "self": {
            "ln_1": init_layer_norm(w, dtype),
            "attn": {
                "wqkv": (jax.random.normal(ks[0], (w, 3 * w)) * std).astype(dtype),
                "bqkv": jnp.zeros((3 * w,), dtype=dtype),
                "wo": (jax.random.normal(ks[1], (w, w)) * proj_std).astype(dtype),
                "bo": jnp.zeros((w,), dtype=dtype),
            },
            "ln_2": init_layer_norm(w, dtype),
            "mlp": mlp(ks[2], ks[3]),
        },
        "cross": {
            "ln_1": init_layer_norm(w, dtype),
            "ln_1_kv": init_layer_norm(w, dtype),
            "attn": {
                "wq": (jax.random.normal(ks[4], (w, w)) * std).astype(dtype),
                "bq": jnp.zeros((w,), dtype=dtype),
                "wkv": (jax.random.normal(ks[5], (w, 2 * w)) * std).astype(dtype),
                "bkv": jnp.zeros((2 * w,), dtype=dtype),
                "wo": (jax.random.normal(ks[6], (w, w)) * proj_std).astype(dtype),
                "bo": jnp.zeros((w,), dtype=dtype),
            },
            "ln_2": init_layer_norm(w, dtype),
            "mlp": mlp(ks[7], ks[8]),
        },
    }


def _hf_coca_cfg(cfg: CLIPCfg):
    """HFTextCfg for a CoCa unimodal HF text tower (the reference's
    coca_roberta-ViT-B-32.json: open_CLIP hf_model.py tower feeding the
    multimodal decoder). T5-family towers have no CoCa pairing in the
    reference zoo."""
    from megatron_clip_tpu.models.clip import _hf_is_t5, _hf_text_cfg
    if _hf_is_t5(cfg.hf_text):
        raise ValueError("CoCa with a T5/mT5 text tower has no reference "
                         "config; use a BERT/RoBERTa-family hf_model_name")
    return _hf_text_cfg(cfg)


def _img_ctx_width(cfg: CLIPCfg) -> int:
    """Width of the caption-context tokens the decoder cross-attends to:
    the pooled space (embed_dim) under attentional pooling, the raw tower
    width otherwise."""
    return cfg.embed_dim if cfg.vision.attentional_pool else cfg.vision.width


def init_coca(key, cfg: CLIPCfg, dtype=jnp.float32):
    assert cfg.multimodal is not None, "CoCa needs multimodal_cfg"
    mm = cfg.multimodal
    kv, kt, km, kp, kh, kl = jax.random.split(key, 6)
    text_vocab = cfg.text.vocab_size
    if cfg.hf_text is not None:
        # HF unimodal tower (coca_roberta-ViT-B-32): pretrained checkpoint
        # when asked for, else offline init at the recorded arch dims
        hcfg = _hf_coca_cfg(cfg)
        if cfg.hf_text.get("pretrained") and cfg.hf_text.get("model_name"):
            from megatron_clip_tpu.models.hf_text import (
                load_hf_text_tower, persist_hf_text_cfg)
            hcfg, text = load_hf_text_tower(
                cfg.hf_text["model_name"], output_dim=cfg.embed_dim,
                proj=cfg.hf_text.get("proj", "linear"),
                pooler=cfg.hf_text.get("pooler"))
            persist_hf_text_cfg(cfg.hf_text, hcfg)
        else:
            from megatron_clip_tpu.models.hf_text import init_hf_text
            text = init_hf_text(kt, hcfg, dtype)
        text_width, text_vocab = hcfg.width, hcfg.vocab_size
    else:
        text = init_text(kt, cfg.text, cfg.embed_dim, act=cfg.act,
                         dtype=dtype)
        text_width = cfg.text.width
    params = {
        "visual": init_vit(kv, cfg.vision, cfg.embed_dim, act=cfg.act,
                           dtype=dtype),
        "text": text,
        "logit_scale": jnp.asarray(cfg.init_logit_scale, jnp.float32),
        "mm_ln": init_layer_norm(mm.width, dtype),
        # the reference's MultimodalTransformer.text_projection: bias-free
        # LM head [width, vocab] (transformer.py:696)
        "lm_head": {
            "w": (jax.random.normal(km, (mm.width, text_vocab))
                  * mm.width ** -0.5).astype(dtype),
        },
    }
    img_w = _img_ctx_width(cfg)
    if text_width != mm.width:
        # width adapter beyond the reference (its configs always match)
        params["mm_proj"] = {
            "w": (jax.random.normal(kp, (text_width, mm.width))
                  * text_width ** -0.5).astype(dtype)}
    if img_w != mm.width:
        params["img_proj"] = {
            "w": (jax.random.normal(kh, (img_w, mm.width))
                  * img_w ** -0.5).astype(dtype)}
    keys = jax.random.split(kl, mm.layers)
    layers = [_init_mm_layer(k, mm, dtype) for k in keys]
    params["mm_blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return params


def _apply_mm_layer(block, x, img_tokens, heads, act):
    """Self resblock then cross resblock (transformer.py:729-736)."""
    def mlp(m, h):
        h = jnp.einsum("bsw,wd->bsd", h, m["w1"].astype(h.dtype))
        h = bias_act(h, m["b1"].astype(h.dtype), act)
        h = jnp.einsum("bsw,wd->bsd", h, m["w2"].astype(h.dtype))
        return h + m["b2"].astype(h.dtype)

    s = block["self"]
    h = layer_norm(x, s["ln_1"]["scale"], s["ln_1"]["bias"])
    x = x + multi_head_attention(h, s["attn"], heads, causal=True,
                                 use_flash=False)
    x = x + mlp(s["mlp"], layer_norm(x, s["ln_2"]["scale"], s["ln_2"]["bias"]))

    c = block["cross"]
    h = layer_norm(x, c["ln_1"]["scale"], c["ln_1"]["bias"])
    kvn = layer_norm(img_tokens, c["ln_1_kv"]["scale"], c["ln_1_kv"]["bias"])
    x = x + multi_head_attention(h, c["attn"], heads, kv=kvn,
                                 use_flash=False)
    x = x + mlp(c["mlp"], layer_norm(x, c["ln_2"]["scale"], c["ln_2"]["bias"]))
    return x


def _vision_context(params, images, cfg: CLIPCfg, compute_dtype,
                    layers_fn=None):
    """Run the vision tower once: (normalized contrastive features, raw
    caption-context tokens) — coca_model.py _encode_image."""
    pooled, tokens = apply_vit(
        params["visual"], images, cfg.vision, cfg.embed_dim, act=cfg.act,
        compute_dtype=compute_dtype, output_tokens=True,
        layers_fn=layers_fn)
    if "img_proj" in params:
        tokens = tokens @ params["img_proj"]["w"].astype(tokens.dtype)
    return _l2_normalize(pooled), tokens


def _mm_stage_apply(act: str):
    """Per-stage layer runner for the pipelined decoder
    (parallel/pipeline.pipeline_transformer apply_fn contract): scan the
    stage's local slice of the self+cross block pairs; `extra` carries the
    microbatch's image context (stage-resident, indexed per tick)."""
    def apply(stage_blocks, x, cfg=None, *, causal=True, bias=None,
              rng=None, layer_keys=None, position_ids=None, rel_index=None,
              extra=None):
        def body(carry, block):
            return _apply_mm_layer(block, carry, extra, cfg.heads, act), None

        x, _ = jax.lax.scan(body, x, stage_blocks)
        return x
    return apply


def _decode_logits(params, tok_out, img_ctx, mm, act="gelu",
                   layers_fn=None):
    """Multimodal decoder over unimodal token states -> vocab logits.
    `layers_fn` (pipeline adapter, plain schedule) runs the self+cross
    block pairs stage-sharded with the image context as the per-microbatch
    side input."""
    x = tok_out
    if "mm_proj" in params:
        x = x @ params["mm_proj"]["w"].astype(x.dtype)

    if layers_fn is not None:
        from megatron_clip_tpu.config import TransformerCfg
        dcfg = TransformerCfg(layers=mm.layers, width=mm.width,
                              heads=mm.heads, mlp_ratio=mm.mlp_ratio)
        x = layers_fn(params["mm_blocks"], x, dcfg, causal=True,
                      apply_fn=_mm_stage_apply(act), extra=img_ctx)
    else:
        def body(carry, block):
            return _apply_mm_layer(block, carry, img_ctx, mm.heads, act), None

        x, _ = jax.lax.scan(body, x, params["mm_blocks"])
    x = layer_norm(x, params["mm_ln"]["scale"], params["mm_ln"]["bias"])
    logits = x @ params["lm_head"]["w"].astype(x.dtype)
    if "b" in params["lm_head"]:
        logits = logits + params["lm_head"]["b"].astype(x.dtype)
    return logits.astype(jnp.float32)


def apply_coca(params, images, texts, cfg: CLIPCfg, *,
               compute_dtype=jnp.bfloat16, layers_fn=None,
               mm_layers_fn=None):
    """Returns {image_features, text_features, logits, labels, logit_scale}.

    Follows coca_model.py forward (embed_cls=True): the caption loses its
    last position to make room for CLS, the decoder predicts
    texts[:, -tokens:] — i.e. labels = texts[:, 1:] for the native tower.

    `layers_fn` pipelines the two contrastive towers over the stage axis
    (same adapter as apply_clip); `mm_layers_fn` (a PLAIN-schedule pipeline
    adapter) stage-shards the multimodal decoder with the image context as
    its per-microbatch side input."""
    mm = cfg.multimodal
    image_features, img_ctx = _vision_context(params, images, cfg,
                                              compute_dtype,
                                              layers_fn=layers_fn)

    # forward always truncates the caption by one (coca_model.py:139
    # `text[:, :-1] if embed_cls` — embed_cls=True for every tower type)
    txt_in = texts[:, :-1]
    if cfg.hf_text is not None:
        # HF unimodal tower (reference hf_model.py:138-151 output_tokens):
        # cls_pooler drops the CLS position from the token states, mean
        # pooler keeps all; labels are the last len(tokens) text positions
        # (coca_model.py:156 labels = text[:, -token_embs.shape[1]:])
        if layers_fn is not None:
            raise ValueError("pipeline parallelism is not supported for HF "
                             "CoCa text towers (post-LN stack outside the "
                             "stacked-pytree layer format)")
        from megatron_clip_tpu.models.hf_text import apply_hf_text
        hcfg = _hf_coca_cfg(cfg)
        pooled_txt, tok_out = apply_hf_text(params["text"], txt_in, hcfg,
                                            compute_dtype=compute_dtype,
                                            return_tokens=True)
        if hcfg.pooler == "cls_pooler":
            tok_out = tok_out[:, 1:]
    else:
        # native embed_cls tower: CLS appended inside the tower; token
        # states come back raw (un-normalized)
        pooled_txt, tok_out = apply_text(params["text"], txt_in,
                                         cfg.text, cfg.embed_dim,
                                         act=cfg.act,
                                         compute_dtype=compute_dtype,
                                         output_tokens=True,
                                         layers_fn=layers_fn)
    labels = texts[:, -tok_out.shape[1]:]
    text_features = _l2_normalize(pooled_txt)

    logits = _decode_logits(params, tok_out, img_ctx, mm, act=cfg.act,
                            layers_fn=mm_layers_fn)

    return {
        "image_features": image_features,
        "text_features": text_features,
        "logits": logits,
        "labels": labels,
        "logit_scale": jnp.exp(jnp.minimum(params["logit_scale"],
                                           LOGIT_SCALE_MAX)),
    }


def coca_generate(params, images, cfg: CLIPCfg, *, sot_id: int,
                  eos_id: int, max_len: int = None, temperature: float = 0.0,
                  top_k: int = 0, top_p: float = 0.0, seed: int = 0,
                  num_beams: int = 1, compute_dtype=jnp.float32):
    """Caption generation (open_CLIP coca_model.py:170-290 `generate`):
    greedy / temperature / top-k / top-p when num_beams == 1, otherwise
    length-normalized beam search. Like the reference, each step re-runs
    the text tower + decoder on the growing (fixed-size, padded) sequence —
    one compiled scan, no KV cache (captions are <=76 tokens).

    The reference generates with embed_cls=False — no truncation; the tower
    still appends CLS internally, so token states cover every caption
    position and logits[:, i] predicts token i+1.

    Returns tokens [B, max_len] starting with sot_id; positions after the
    first eos are 0."""
    from megatron_clip_tpu.inference.generation import _sample
    mm = cfg.multimodal
    max_len = max_len or cfg.text.context_length
    b = images.shape[0]
    _, img_ctx = _vision_context(params, images, cfg, compute_dtype)

    # With the reference's training alignment (forward truncates; labels =
    # texts[:, -len(tok_out):]) every tower learns "state of token j
    # predicts token j+1". Generation runs un-truncated (reference
    # embed_cls=False), so the prediction for the token after position i
    # sits at logits index i for the native tower and the HF mean pooler.
    # (A cls_pooler CoCa — no reference config exists — would be off by
    # one at index i-1; we keep 0 and note the gap.)
    pos_off = 0

    def step_logits(tokens, img_ctx_):
        """tokens [N, L] -> per-position next-token logits."""
        if cfg.hf_text is not None:
            from megatron_clip_tpu.models.hf_text import apply_hf_text
            hcfg = _hf_coca_cfg(cfg)
            _, tok_out = apply_hf_text(params["text"], tokens, hcfg,
                                       compute_dtype=compute_dtype,
                                       return_tokens=True)
            if hcfg.pooler == "cls_pooler":
                tok_out = tok_out[:, 1:]
            return _decode_logits(params, tok_out, img_ctx_, mm, act=cfg.act)
        _, tok_out = apply_text(params["text"], tokens, cfg.text,
                                cfg.embed_dim, act=cfg.act,
                                compute_dtype=compute_dtype,
                                output_tokens=True)
        return _decode_logits(params, tok_out, img_ctx_, mm, act=cfg.act)

    if num_beams <= 1:
        tokens = jnp.zeros((b, max_len), jnp.int32).at[:, 0].set(sot_id)
        rng = jax.random.PRNGKey(seed)

        def step(carry, i):
            tokens, rng, done = carry
            logits = step_logits(tokens, img_ctx)
            nxt_logits = jnp.take_along_axis(
                logits, (i + pos_off)[None, None, None].repeat(b, 0),
                axis=1)[:, 0]
            rng, sub = jax.random.split(rng)
            tok = _sample(nxt_logits, sub, temperature, top_k,
                          top_p if (top_p and top_p < 1.0) else None
                          ).astype(jnp.int32)
            tok = jnp.where(done, 0, tok)
            tokens = jax.lax.dynamic_update_slice(
                tokens, tok[:, None], (0, i + 1))
            done = done | (tok == eos_id)
            return (tokens, rng, done), None

        (tokens, _, _), _ = jax.lax.scan(
            step, (tokens, rng, jnp.zeros((b,), bool)),
            jnp.arange(max_len - 1))
        return tokens

    # beam search: beams flattened into the batch dim; scores length-
    # normalized at the end (HF/open_CLIP beam semantics, simplified: no
    # early-stop groups)
    k = num_beams
    tokens = jnp.zeros((b, k, max_len), jnp.int32).at[:, :, 0].set(sot_id)
    scores = jnp.full((b, k), -1e30).at[:, 0].set(0.0)   # only beam 0 live
    done = jnp.zeros((b, k), bool)
    img_ctx_k = jnp.repeat(img_ctx, k, axis=0)

    def bstep(carry, i):
        tokens, scores, done = carry
        logits = step_logits(tokens.reshape(b * k, max_len), img_ctx_k)
        nxt = jax.nn.log_softmax(
            logits.reshape(b, k, logits.shape[1], -1)[:, :, i + pos_off],
            axis=-1)
        v = nxt.shape[-1]
        # finished beams only extend with pad (id 0) at no cost
        pad_only = jnp.full((b, k, v), -1e30).at[:, :, 0].set(0.0)
        nxt = jnp.where(done[:, :, None], pad_only, nxt)
        cand = scores[:, :, None] + nxt                   # [B, K, V]
        flat = cand.reshape(b, k * v)
        top_scores, top_idx = jax.lax.top_k(flat, k)
        beam_idx = top_idx // v
        tok = (top_idx % v).astype(jnp.int32)
        tokens = jnp.take_along_axis(tokens, beam_idx[:, :, None], axis=1)
        done = jnp.take_along_axis(done, beam_idx, axis=1)
        tokens = jax.lax.dynamic_update_slice(
            tokens, tok[:, :, None], (0, 0, i + 1))
        done = done | (tok == eos_id)
        return (tokens, top_scores, done), None

    (tokens, scores, done), _ = jax.lax.scan(
        bstep, (tokens, scores, done), jnp.arange(max_len - 1))
    lengths = jnp.maximum((tokens != 0).sum(-1), 1)
    best = jnp.argmax(scores / lengths, axis=-1)
    return jnp.take_along_axis(tokens, best[:, None, None], axis=1)[:, 0]
