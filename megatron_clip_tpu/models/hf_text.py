"""HuggingFace text-tower adapter (BERT/RoBERTa family), native JAX.

The reference wraps `transformers.AutoModel` as a CLIP text tower
(open_CLIP/src/open_clip/hf_model.py HFTextEncoder: AutoModel + mean/cls
pooler + linear/mlp projection; arch metadata in hf_configs.py). A torch
nn.Module cannot run on the TPU path here, so this module implements the
BERT/RoBERTa encoder architecture natively (post-LN blocks, learned
positions with the RoBERTa padding-offset rule) and converts HF checkpoints
into the JAX param tree with `load_hf_text_tower` (torch CPU used only to
read the checkpoint). Parity vs `transformers` is tested to <=1e-4
(tests/test_hf_text.py).
"""
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class HFTextCfg:
    vocab_size: int = 50265
    width: int = 768
    heads: int = 12
    layers: int = 12
    mlp_hidden: int = 3072
    max_positions: int = 514
    type_vocab_size: int = 1
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1          # roberta: 1; bert: 0
    position_offset: bool = True   # roberta position-id rule; False for bert
    pooler: str = "mean_pooler"    # mean_pooler | cls_pooler (hf_model.py)
    proj: str = "linear"           # linear | mlp | none
    output_dim: Optional[int] = None


def _ln(p, x, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _dense(p, x):
    y = jnp.einsum("...c,cd->...d", x, p["w"].astype(x.dtype))
    return y + p["b"].astype(x.dtype)


def init_hf_text(key, cfg: HFTextCfg, dtype=jnp.float32):
    """Random init (HF default trunc-normal 0.02) — used when
    hf_model_pretrained=false, matching the reference config knob."""
    def lin(k, i, o):
        return {"w": (0.02 * jax.random.normal(k, (i, o))).astype(dtype),
                "b": jnp.zeros((o,), dtype)}

    def lnp(d):
        return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    keys = jax.random.split(key, 6 * cfg.layers + 4)
    it = iter(keys)
    w = cfg.width
    params = {
        "embeddings": {
            "word": (0.02 * jax.random.normal(
                next(it), (cfg.vocab_size, w))).astype(dtype),
            "position": (0.02 * jax.random.normal(
                next(it), (cfg.max_positions, w))).astype(dtype),
            "token_type": (0.02 * jax.random.normal(
                next(it), (cfg.type_vocab_size, w))).astype(dtype),
            "ln": lnp(w),
        },
        "layers": [],
    }
    for _ in range(cfg.layers):
        params["layers"].append({
            "q": lin(next(it), w, w), "k": lin(next(it), w, w),
            "v": lin(next(it), w, w), "attn_out": lin(next(it), w, w),
            "attn_ln": lnp(w),
            "fc1": lin(next(it), w, cfg.mlp_hidden),
            "fc2": lin(next(it), cfg.mlp_hidden, w),
            "mlp_ln": lnp(w),
        })
    if cfg.output_dim and cfg.proj != "none":
        if cfg.proj == "mlp":
            hidden = (w + cfg.output_dim) // 2
            params["proj"] = {"fc1": lin(next(it), w, hidden),
                              "fc2": lin(next(it), hidden, cfg.output_dim)}
        else:
            params["proj"] = lin(next(it), w, cfg.output_dim)
    return params


def _position_ids(ids, attention_mask, cfg: HFTextCfg):
    if not cfg.position_offset:
        return jnp.arange(ids.shape[1], dtype=jnp.int32)[None, :]
    # RoBERTa create_position_ids_from_input_ids: cumsum of the mask times
    # the mask, plus padding_idx
    mask = attention_mask.astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + cfg.pad_token_id


def apply_hf_text(params, ids, cfg: HFTextCfg, *, attention_mask=None,
                  compute_dtype=jnp.bfloat16, return_tokens: bool = False):
    """ids [B, S] -> pooled/projected features (and last_hidden if asked).

    Post-LN encoder exactly as transformers BertModel/RobertaModel (eval
    mode, no dropout): emb = LN(word+pos+type); per layer
    attn -> +res -> LN -> mlp -> +res -> LN."""
    if attention_mask is None:
        attention_mask = (ids != cfg.pad_token_id).astype(jnp.int32)
    pos_ids = _position_ids(ids, attention_mask, cfg)
    emb = params["embeddings"]
    x = (emb["word"][ids] + emb["position"][pos_ids]
         + emb["token_type"][jnp.zeros_like(ids)])
    x = _ln(emb["ln"], x.astype(compute_dtype), cfg.layer_norm_eps)

    b, s, w = x.shape
    hd = w // cfg.heads
    bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0,
                     -1e30).astype(jnp.float32)
    for lp in params["layers"]:
        q = _dense(lp["q"], x).reshape(b, s, cfg.heads, hd)
        k = _dense(lp["k"], x).reshape(b, s, cfg.heads, hd)
        v = _dense(lp["v"], x).reshape(b, s, cfg.heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits * (hd ** -0.5) + bias
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, w)
        x = _ln(lp["attn_ln"], x + _dense(lp["attn_out"], ctx),
                cfg.layer_norm_eps)
        h = jax.nn.gelu(_dense(lp["fc1"], x), approximate=False)
        x = _ln(lp["mlp_ln"], x + _dense(lp["fc2"], h), cfg.layer_norm_eps)

    if cfg.pooler == "cls_pooler":
        pooled = x[:, 0]
    else:  # mean_pooler: masked mean (hf_model.py MeanPooler)
        m = attention_mask[..., None].astype(x.dtype)
        pooled = (x * m).sum(1) / jnp.maximum(m.sum(1), 1)
    if "proj" in params and cfg.proj != "none":
        if cfg.proj == "mlp":
            pooled = _dense(params["proj"]["fc2"], jax.nn.gelu(
                _dense(params["proj"]["fc1"], pooled), approximate=False))
        else:
            pooled = _dense(params["proj"], pooled)
    if return_tokens:
        return pooled, x
    return pooled


_ARCH_FIELDS = ("vocab_size", "width", "heads", "layers", "mlp_hidden",
                "max_positions", "type_vocab_size", "layer_norm_eps",
                "pad_token_id", "position_offset")

# Published architecture facts for the HF checkpoints the reference zoo
# pairs with CLIP towers — lets hf_model_pretrained=false / offline init
# build the exact arch (incl. the RoBERTa pad-token/position-offset rule,
# which text_cfg defaults cannot express).
KNOWN_HF_ARCHS = {
    "roberta-base": dict(vocab_size=50265, width=768, heads=12, layers=12,
                         mlp_hidden=3072, max_positions=514,
                         type_vocab_size=1, layer_norm_eps=1e-5,
                         pad_token_id=1, position_offset=True),
    "xlm-roberta-base": dict(vocab_size=250002, width=768, heads=12,
                             layers=12, mlp_hidden=3072, max_positions=514,
                             type_vocab_size=1, layer_norm_eps=1e-5,
                             pad_token_id=1, position_offset=True),
    "xlm-roberta-large": dict(vocab_size=250002, width=1024, heads=16,
                              layers=24, mlp_hidden=4096, max_positions=514,
                              type_vocab_size=1, layer_norm_eps=1e-5,
                              pad_token_id=1, position_offset=True),
}


def persist_hf_text_cfg(d: dict, cfg: "HFTextCfg") -> None:
    """Write the resolved architecture fields into the factory's hf_text
    dict so later `encode_text` calls rebuild the SAME HFTextCfg the params
    were created with (a pretrained RoBERTa must keep its position-id rule,
    pad token and head count — not text_cfg defaults)."""
    for f in _ARCH_FIELDS + ("pooler",):
        d[f] = getattr(cfg, f)


def hf_text_cfg_from_dict(d: dict, *, fallback: "HFTextCfg") -> "HFTextCfg":
    """HFTextCfg from the factory hf_text dict. Arch fields persisted by
    `persist_hf_text_cfg` (or lazily resolved from the HF checkpoint config
    here) win over the text_cfg-derived fallback. The lazy path covers
    model handles rebuilt from a config (e.g. checkpoint restore) that never
    ran `load_hf_text_tower`."""
    name = d.get("model_name", "")
    if "width" not in d and name in KNOWN_HF_ARCHS:
        d.update(KNOWN_HF_ARCHS[name])
    if ("width" not in d and d.get("pretrained") and name
            and name != "__random_tiny__"):
        try:
            from transformers import AutoConfig
            resolved = hf_cfg_from_transformers(
                AutoConfig.from_pretrained(name),
                pooler=d.get("pooler"), proj=d.get("proj", "linear"),
                output_dim=fallback.output_dim)
            persist_hf_text_cfg(d, resolved)
        except Exception:  # noqa: BLE001 — offline/missing checkpoint: keep
            pass           # the fallback rather than failing the forward
    kw = {f: d[f] for f in _ARCH_FIELDS if f in d}
    return HFTextCfg(
        pooler=d.get("pooler", fallback.pooler),
        proj=d.get("proj", fallback.proj),
        output_dim=fallback.output_dim,
        **{f: kw.get(f, getattr(fallback, f)) for f in _ARCH_FIELDS})


# ----------------------- HF checkpoint conversion ---------------------------

def hf_cfg_from_transformers(config, pooler=None, proj="linear",
                             output_dim=None) -> HFTextCfg:
    """Map a transformers PretrainedConfig to HFTextCfg
    (reference hf_configs.py arch_dict config_names)."""
    mt = getattr(config, "model_type", "bert")
    return HFTextCfg(
        vocab_size=config.vocab_size,
        width=config.hidden_size,
        heads=config.num_attention_heads,
        layers=config.num_hidden_layers,
        mlp_hidden=config.intermediate_size,
        max_positions=config.max_position_embeddings,
        type_vocab_size=getattr(config, "type_vocab_size", 1),
        layer_norm_eps=getattr(config, "layer_norm_eps", 1e-5),
        pad_token_id=getattr(config, "pad_token_id", None) or 0,
        position_offset=mt in ("roberta", "xlm-roberta", "camembert"),
        pooler=pooler or ("mean_pooler" if "roberta" in mt else "cls_pooler"),
        proj=proj, output_dim=output_dim)


def convert_hf_state_dict(sd, cfg: HFTextCfg, dtype=jnp.float32):
    """transformers BertModel/RobertaModel state_dict -> JAX param tree.
    torch Linear weights are [out, in] and transposed here."""
    def g(*names):
        for n in names:
            if n in sd:
                return jnp.asarray(np.asarray(sd[n]), dtype)
        raise KeyError(names[0])

    def lin(prefix):
        return {"w": g(prefix + ".weight").T, "b": g(prefix + ".bias")}

    def lnp(prefix):
        return {"scale": g(prefix + ".weight"), "bias": g(prefix + ".bias")}

    p = {"embeddings": {
        "word": g("embeddings.word_embeddings.weight"),
        "position": g("embeddings.position_embeddings.weight"),
        "token_type": g("embeddings.token_type_embeddings.weight"),
        "ln": lnp("embeddings.LayerNorm")},
        "layers": []}
    for i in range(cfg.layers):
        pre = f"encoder.layer.{i}"
        p["layers"].append({
            "q": lin(f"{pre}.attention.self.query"),
            "k": lin(f"{pre}.attention.self.key"),
            "v": lin(f"{pre}.attention.self.value"),
            "attn_out": lin(f"{pre}.attention.output.dense"),
            "attn_ln": lnp(f"{pre}.attention.output.LayerNorm"),
            "fc1": lin(f"{pre}.intermediate.dense"),
            "fc2": lin(f"{pre}.output.dense"),
            "mlp_ln": lnp(f"{pre}.output.LayerNorm"),
        })
    return p


def load_hf_text_tower(model_name_or_path: str, *, output_dim=None,
                       proj="linear", pooler=None, seed=0,
                       dtype=jnp.float32):
    """Load a local HF checkpoint (or hub name when network allows) as a
    (HFTextCfg, params) pair. The projection head is fresh-initialized —
    open_CLIP's HFTextEncoder does the same (hf_model.py proj head)."""
    from transformers import AutoConfig, AutoModel
    config = AutoConfig.from_pretrained(model_name_or_path)
    cfg = hf_cfg_from_transformers(config, pooler=pooler, proj=proj,
                                   output_dim=output_dim)
    model = AutoModel.from_pretrained(model_name_or_path)
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    # strip a potential "bert."/"roberta." prefix
    prefixes = {k.split(".")[0] for k in sd}
    if "embeddings" not in prefixes:
        root = next(iter(prefixes))
        sd = {k[len(root) + 1:]: v for k, v in sd.items()
              if k.startswith(root + ".")}
    params = convert_hf_state_dict(sd, cfg, dtype)
    if output_dim and proj != "none":
        init = init_hf_text(jax.random.PRNGKey(seed), cfg, dtype)
        params["proj"] = init["proj"]
    return cfg, params
