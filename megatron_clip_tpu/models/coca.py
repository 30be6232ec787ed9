"""CoCa: Contrastive Captioner (two-tower CLIP + multimodal text decoder).

Follows open_CLIP's CoCa (open_CLIP/src/open_clip/coca_model.py:79-458):
  - vision tower with attentional pooling: query 0 -> contrastive embedding,
    remaining queries -> caption context tokens;
  - text tower with an appended CLS token (embed_cls=True,
    transformer.py:516-654): CLS output -> contrastive text embedding, token
    outputs feed the decoder;
  - multimodal decoder (coca_model.py MultimodalTransformer): causal
    self-attention + cross-attention over image tokens + MLP per layer,
    predicting the caption autoregressively;
  - losses: InfoNCE on the pooled pair + caption cross-entropy (CoCaLoss).
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


def _init_mm_block(key, cfg: MultimodalCfg, dtype=jnp.float32):
    """Decoder block: self-attn + cross-attn + mlp (all pre-LN)."""
    w = cfg.width
    std = w ** -0.5
    proj_std = std * ((2 * cfg.layers) ** -0.5)
    fc_std = (2 * w) ** -0.5
    ks, kc, kf, kp, kq, kk = jax.random.split(key, 6)
    hid = int(w * cfg.mlp_ratio)
    return {
        "ln_1": init_layer_norm(w, dtype),
        "attn": {
            "wqkv": (jax.random.normal(ks, (w, 3 * w)) * std).astype(dtype),
            "bqkv": jnp.zeros((3 * w,), dtype=dtype),
            "wo": (jax.random.normal(kp, (w, w)) * proj_std).astype(dtype),
            "bo": jnp.zeros((w,), dtype=dtype),
        },
        "ln_1_kv": init_layer_norm(w, dtype),
        "cross": {
            "wq": (jax.random.normal(kq, (w, w)) * std).astype(dtype),
            "bq": jnp.zeros((w,), dtype=dtype),
            "wkv": (jax.random.normal(kk, (w, 2 * w)) * std).astype(dtype),
            "bkv": jnp.zeros((2 * w,), dtype=dtype),
            "wo": (jax.random.normal(kc, (w, w)) * proj_std).astype(dtype),
            "bo": jnp.zeros((w,), dtype=dtype),
        },
        "ln_2": init_layer_norm(w, dtype),
        "mlp": {
            "w1": (jax.random.normal(kf, (w, hid)) * fc_std).astype(dtype),
            "b1": jnp.zeros((hid,), dtype=dtype),
            "w2": (jax.random.normal(kp, (hid, w)) * proj_std).astype(dtype),
            "b2": jnp.zeros((w,), dtype=dtype),
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


def init_coca(key, cfg: CLIPCfg, dtype=jnp.float32):
    assert cfg.multimodal is not None, "CoCa needs multimodal_cfg"
    mm = cfg.multimodal
    kv, kt, km, kp, kh, kc = jax.random.split(key, 6)
    import dataclasses
    # vision tower pools with 1 + n_queries attentional queries
    vcfg = dataclasses.replace(cfg.vision, attentional_pool=True,
                               attn_pooler_queries=mm.attn_pooler_queries + 1)
    text_width, text_vocab = cfg.text.width, cfg.text.vocab_size
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
    params = {
        "visual": init_vit(kv, vcfg, cfg.embed_dim, act=cfg.act, dtype=dtype),
        "text": text,
        "logit_scale": jnp.asarray(cfg.init_logit_scale, jnp.float32),
        # text pooling uses argmax-EOT (same contract as open_CLIP's CLS-at-
        # end: one position summarizes the caption for the contrastive head)
        "mm_blocks": [],
        "mm_ln": init_layer_norm(mm.width, dtype),
        "mm_proj": {
            # text-width -> decoder-width adapters when sizes differ
            "w": (jax.random.normal(kp, (text_width, mm.width))
                  * text_width ** -0.5).astype(dtype),
        },
        "img_proj": {
            "w": (jax.random.normal(kh, (cfg.embed_dim, mm.width))
                  * cfg.embed_dim ** -0.5).astype(dtype),
        },
        "lm_head": {
            "w": (jax.random.normal(km, (mm.width, text_vocab))
                  * mm.width ** -0.5).astype(dtype),
            "b": jnp.zeros((text_vocab,), dtype=dtype),
        },
    }
    keys = jax.random.split(km, mm.layers)
    blocks = [_init_mm_block(k, mm, dtype) for k in keys]
    params["mm_blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return params


def _apply_mm_block(block, x, img_tokens, heads):
    h = layer_norm(x, block["ln_1"]["scale"], block["ln_1"]["bias"])
    x = x + multi_head_attention(h, block["attn"], heads, causal=True,
                                 use_flash=False)
    h = layer_norm(x, block["ln_1_kv"]["scale"], block["ln_1_kv"]["bias"])
    x = x + multi_head_attention(h, block["cross"], heads, kv=img_tokens,
                                 use_flash=False)
    h = layer_norm(x, block["ln_2"]["scale"], block["ln_2"]["bias"])
    h = jnp.einsum("bsw,wd->bsd", h, block["mlp"]["w1"].astype(h.dtype))
    h = bias_act(h, block["mlp"]["b1"].astype(h.dtype), "gelu")
    h = jnp.einsum("bsw,wd->bsd", h, block["mlp"]["w2"].astype(h.dtype))
    return x + h + block["mlp"]["b2"].astype(h.dtype)


def _vision_context(params, images, cfg: CLIPCfg, compute_dtype):
    """Run the vision tower once: (contrastive features, caption context)."""
    import dataclasses
    mm = cfg.multimodal
    vcfg = dataclasses.replace(cfg.vision, attentional_pool=True,
                               attn_pooler_queries=mm.attn_pooler_queries + 1)
    img_queries, pool_tokens = apply_vit(
        params["visual"], images, vcfg, cfg.embed_dim, act=cfg.act,
        compute_dtype=compute_dtype, output_tokens=True)
    img_ctx = pool_tokens[:, 1:]                      # [B, nq, E]
    img_ctx = img_ctx @ params["img_proj"]["w"].astype(img_ctx.dtype)
    return _l2_normalize(img_queries), img_ctx


def _decode_logits(params, tok_out, img_ctx, mm):
    """Multimodal decoder over unimodal token states -> vocab logits."""
    x = tok_out @ params["mm_proj"]["w"].astype(tok_out.dtype)

    def body(carry, block):
        return _apply_mm_block(block, carry, img_ctx, mm.heads), None

    x, _ = jax.lax.scan(body, x, params["mm_blocks"])
    x = layer_norm(x, params["mm_ln"]["scale"], params["mm_ln"]["bias"])
    logits = x @ params["lm_head"]["w"].astype(x.dtype) \
        + params["lm_head"]["b"].astype(x.dtype)
    return logits.astype(jnp.float32)


def apply_coca(params, images, texts, cfg: CLIPCfg, *,
               compute_dtype=jnp.bfloat16):
    """Returns {image_features, text_features, logits, labels, logit_scale}.

    logits predict texts[:, 1:] from texts[:, :-1] through the multimodal
    decoder (coca_model.py forward)."""
    mm = cfg.multimodal
    # vision attentional pool: query 0 -> contrastive, rest -> caption context
    image_features, img_ctx = _vision_context(params, images, cfg,
                                              compute_dtype)

    if cfg.hf_text is not None:
        # HF unimodal tower (reference hf_model.py:138-151 output_tokens):
        # cls_pooler drops the CLS position from the token states, mean
        # pooler keeps all; labels are the last len(tokens) text positions
        # (coca_model.py:156 labels = text[:, -token_embs.shape[1]:])
        from megatron_clip_tpu.models.hf_text import apply_hf_text
        hcfg = _hf_coca_cfg(cfg)
        pooled_txt, tok_out = apply_hf_text(params["text"], texts, hcfg,
                                            compute_dtype=compute_dtype,
                                            return_tokens=True)
        if hcfg.pooler == "cls_pooler":
            tok_out = tok_out[:, 1:]
        labels = texts[:, -tok_out.shape[1]:]
    else:
        # text: tokens through the unimodal tower; CLS appended at the end
        pooled_txt, tok_out = apply_text(params["text"], texts, cfg.text,
                                         cfg.embed_dim, act=cfg.act,
                                         compute_dtype=compute_dtype,
                                         output_tokens=True)
        # decoder input: unimodal token states (teacher forcing, drop last)
        tok_out = tok_out[:, :-1]
        labels = texts[:, 1:]
    text_features = _l2_normalize(pooled_txt)

    logits = _decode_logits(params, tok_out, img_ctx, mm)

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
    """Caption generation (open_CLIP coca_model.py:79-458 `generate`):
    greedy / temperature / top-k / top-p when num_beams == 1, otherwise
    length-normalized beam search. Like the reference, each step re-runs
    the text tower + decoder on the growing (fixed-size, padded) sequence —
    one compiled scan, no KV cache (captions are <=76 tokens).

    Returns tokens [B, max_len] starting with sot_id; positions after the
    first eos are 0."""
    from megatron_clip_tpu.inference.generation import _sample
    mm = cfg.multimodal
    max_len = max_len or cfg.text.context_length
    b = images.shape[0]
    _, img_ctx = _vision_context(params, images, cfg, compute_dtype)

    # position holding the logits for token i+1 at scan step i: the native
    # tower's logits[j] predicts token j+1 (pos = i); the HF tower follows
    # the reference's labels = text[:, -len(tokens):] alignment, so with the
    # mean pooler (all token states kept) logits[j] predicts token j
    # (pos = i + 1), with cls_pooler (CLS state dropped) pos = i again.
    pos_off = 0
    if cfg.hf_text is not None:
        pos_off = 0 if _hf_coca_cfg(cfg).pooler == "cls_pooler" else 1

    def step_logits(tokens, img_ctx_):
        """tokens [N, L] -> per-position next-token logits ([N, L-1, V]
        native; [N, L or L-1, V] for an HF tower, see pos_off)."""
        if cfg.hf_text is not None:
            from megatron_clip_tpu.models.hf_text import apply_hf_text
            hcfg = _hf_coca_cfg(cfg)
            _, tok_out = apply_hf_text(params["text"], tokens, hcfg,
                                       compute_dtype=compute_dtype,
                                       return_tokens=True)
            if hcfg.pooler == "cls_pooler":
                tok_out = tok_out[:, 1:]
            return _decode_logits(params, tok_out, img_ctx_, mm)
        _, tok_out = apply_text(params["text"], tokens, cfg.text,
                                cfg.embed_dim, act=cfg.act,
                                compute_dtype=compute_dtype,
                                output_tokens=True)
        return _decode_logits(params, tok_out[:, :-1], img_ctx_, mm)

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
