"""open_CLIP `.pt` checkpoint import/export.

The converter the reference ecosystem expects (open_CLIP factory's
`pretrained=` loading, factory.py:286-338; megatron's checkpoint reshard
tools, tools/checkpoint/loader_megatron.py). Maps open_CLIP's torch
state_dict layout (model.py:178-243 CLIP module tree) onto our param pytree:

  torch                                   ours
  visual.conv1.weight [W,3,p,p]           visual/patch_embed/w [p*p*3, W]
  visual.class_embedding                  visual/cls
  visual.positional_embedding             visual/pos_embed
  visual.ln_pre|ln_post.{weight,bias}     visual/ln_pre|ln_post/{scale,bias}
  visual.proj [W,E]                       visual/proj
  *.resblocks.i.attn.in_proj_weight       blocks/attn/wqkv[i] (transposed)
  *.resblocks.i.attn.out_proj.weight      blocks/attn/wo[i]   (transposed)
  *.resblocks.i.mlp.c_fc|c_proj.weight    blocks/mlp/w1|w2[i] (transposed)
  token_embedding.weight                  text/tok_embed
  positional_embedding                    text/pos_embed
  ln_final.{weight,bias}                  text/ln_final
  text_projection [W,E]                   text/proj/w
  logit_scale                             logit_scale

Weight matrices transpose because torch Linear computes x @ W.T while we
store x @ W layouts.
"""
from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp

from megatron_clip_tpu.config import CLIPCfg


def _t(x):
    return np.asarray(x, dtype=np.float32)


def _stack_blocks(sd: Dict[str, np.ndarray], prefix: str, layers: int) -> dict:
    def get(i, name):
        return _t(sd[f"{prefix}.resblocks.{i}.{name}"])

    out = {
        "ln_1": {"scale": [], "bias": []},
        "attn": {"wqkv": [], "bqkv": [], "wo": [], "bo": []},
        "ln_2": {"scale": [], "bias": []},
        "mlp": {"w1": [], "b1": [], "w2": [], "b2": []},
    }
    for i in range(layers):
        out["ln_1"]["scale"].append(get(i, "ln_1.weight"))
        out["ln_1"]["bias"].append(get(i, "ln_1.bias"))
        out["attn"]["wqkv"].append(get(i, "attn.in_proj_weight").T)
        out["attn"]["bqkv"].append(get(i, "attn.in_proj_bias"))
        out["attn"]["wo"].append(get(i, "attn.out_proj.weight").T)
        out["attn"]["bo"].append(get(i, "attn.out_proj.bias"))
        out["ln_2"]["scale"].append(get(i, "ln_2.weight"))
        out["ln_2"]["bias"].append(get(i, "ln_2.bias"))
        out["mlp"]["w1"].append(get(i, "mlp.c_fc.weight").T)
        out["mlp"]["b1"].append(get(i, "mlp.c_fc.bias"))
        out["mlp"]["w2"].append(get(i, "mlp.c_proj.weight").T)
        out["mlp"]["b2"].append(get(i, "mlp.c_proj.bias"))
    return {
        k: {kk: jnp.asarray(np.stack(vv)) for kk, vv in sub.items()}
        for k, sub in out.items()
    }


def _resize_pos_embed(pe, new_len: int):
    """Bicubic-resize a [1+g*g, W] learned position table to a new grid
    (open_CLIP model.py:417 resize_pos_embed; cls token kept as-is).
    Torch-exact: the reference uses F.interpolate(mode='bicubic',
    antialias=True) — ops/image_resize reproduces that kernel bit-for-bit,
    so a checkpoint loaded at --force-image-size matches the reference's
    features at the new resolution."""
    from megatron_clip_tpu.ops.image_resize import resize_grid_bicubic
    g_from = int(round((pe.shape[0] - 1) ** 0.5))
    g_to = int(round((new_len - 1) ** 0.5))
    grid = jnp.asarray(pe[1:], jnp.float32).reshape(g_from, g_from, -1)
    grid = resize_grid_bicubic(grid, g_to, g_to, antialias=True)
    return jnp.concatenate([jnp.asarray(pe[:1], jnp.float32),
                            grid.reshape(g_to * g_to, -1)], axis=0)


def params_from_openclip_state_dict(sd: Dict[str, Any], cfg: CLIPCfg) -> dict:
    """Build our param tree from an open_CLIP CLIP state_dict (numpy/torch).
    Dispatches to the CoCa / CustomTextCLIP(HF-text) converters when the
    config asks for those module trees."""
    if cfg.multimodal is not None:
        return params_from_openclip_coca_state_dict(sd, cfg)
    if cfg.hf_text is not None:
        return params_from_openclip_hf_state_dict(sd, cfg)
    sd = _np_sd(sd)
    visual = _visual_from_sd(sd, cfg)
    text = {
        "tok_embed": jnp.asarray(_t(sd["token_embedding.weight"])),
        "pos_embed": jnp.asarray(_t(sd["positional_embedding"])),
        "ln_final": {"scale": jnp.asarray(_t(sd["ln_final.weight"])),
                     "bias": jnp.asarray(_t(sd["ln_final.bias"]))},
        "proj": {"w": jnp.asarray(_t(sd["text_projection"]))},
        "blocks": _stack_blocks(sd, "transformer", cfg.text.layers),
    }
    # some checkpoints store logit_scale as shape (1,): reshape to a scalar
    # (float() on a 1-element array is a NumPy deprecation -> future error)
    return {"visual": visual, "text": text,
            "logit_scale": jnp.asarray(
                np.asarray(_t(sd["logit_scale"]),
                           np.float32).reshape(()))}


def openclip_state_dict_from_params(params: dict, cfg: CLIPCfg) -> Dict[str, np.ndarray]:
    """Inverse conversion (export for open_CLIP/torch consumers)."""
    sd = {}
    v = params["visual"]
    p = cfg.vision.patch_size
    w = np.asarray(v["patch_embed"]["w"])
    sd["visual.conv1.weight"] = w.reshape(p, p, 3, -1).transpose(3, 2, 0, 1)
    sd["visual.class_embedding"] = np.asarray(v["cls"])
    sd["visual.positional_embedding"] = np.asarray(v["pos_embed"])
    if "ln_pre" in v:
        sd["visual.ln_pre.weight"] = np.asarray(v["ln_pre"]["scale"])
        sd["visual.ln_pre.bias"] = np.asarray(v["ln_pre"]["bias"])
    sd["visual.ln_post.weight"] = np.asarray(v["ln_post"]["scale"])
    sd["visual.ln_post.bias"] = np.asarray(v["ln_post"]["bias"])
    sd["visual.proj"] = np.asarray(v["proj"])

    def unstack(blocks, prefix):
        n = np.asarray(blocks["ln_1"]["scale"]).shape[0]
        for i in range(n):
            sd[f"{prefix}.resblocks.{i}.ln_1.weight"] = np.asarray(blocks["ln_1"]["scale"][i])
            sd[f"{prefix}.resblocks.{i}.ln_1.bias"] = np.asarray(blocks["ln_1"]["bias"][i])
            sd[f"{prefix}.resblocks.{i}.attn.in_proj_weight"] = np.asarray(blocks["attn"]["wqkv"][i]).T
            sd[f"{prefix}.resblocks.{i}.attn.in_proj_bias"] = np.asarray(blocks["attn"]["bqkv"][i])
            sd[f"{prefix}.resblocks.{i}.attn.out_proj.weight"] = np.asarray(blocks["attn"]["wo"][i]).T
            sd[f"{prefix}.resblocks.{i}.attn.out_proj.bias"] = np.asarray(blocks["attn"]["bo"][i])
            sd[f"{prefix}.resblocks.{i}.ln_2.weight"] = np.asarray(blocks["ln_2"]["scale"][i])
            sd[f"{prefix}.resblocks.{i}.ln_2.bias"] = np.asarray(blocks["ln_2"]["bias"][i])
            sd[f"{prefix}.resblocks.{i}.mlp.c_fc.weight"] = np.asarray(blocks["mlp"]["w1"][i]).T
            sd[f"{prefix}.resblocks.{i}.mlp.c_fc.bias"] = np.asarray(blocks["mlp"]["b1"][i])
            sd[f"{prefix}.resblocks.{i}.mlp.c_proj.weight"] = np.asarray(blocks["mlp"]["w2"][i]).T
            sd[f"{prefix}.resblocks.{i}.mlp.c_proj.bias"] = np.asarray(blocks["mlp"]["b2"][i])

    unstack(v["blocks"], "visual.transformer")
    t = params["text"]
    sd["token_embedding.weight"] = np.asarray(t["tok_embed"])
    sd["positional_embedding"] = np.asarray(t["pos_embed"])
    sd["ln_final.weight"] = np.asarray(t["ln_final"]["scale"])
    sd["ln_final.bias"] = np.asarray(t["ln_final"]["bias"])
    sd["text_projection"] = np.asarray(t["proj"]["w"])
    unstack(t["blocks"], "transformer")
    sd["logit_scale"] = np.asarray(params["logit_scale"])
    return sd


def _np_sd(sd: Dict[str, Any]) -> Dict[str, np.ndarray]:
    return {k: (v.detach().cpu().numpy() if hasattr(v, "detach")
                else np.asarray(v)) for k, v in sd.items()}


def _visual_from_sd(sd: Dict[str, np.ndarray], cfg: CLIPCfg) -> dict:
    """The `visual.*` subtree (shared by CLIP / CustomTextCLIP / CoCa)."""
    p = cfg.vision.patch_size
    conv = _t(sd["visual.conv1.weight"])                  # [W, 3, p, p]
    patch_w = conv.transpose(2, 3, 1, 0).reshape(p * p * 3, -1)
    visual = {
        "patch_embed": {"w": jnp.asarray(patch_w)},
        "cls": jnp.asarray(_t(sd["visual.class_embedding"])),
        "pos_embed": jnp.asarray(_t(sd["visual.positional_embedding"])),
        "ln_post": {"scale": jnp.asarray(_t(sd["visual.ln_post.weight"])),
                    "bias": jnp.asarray(_t(sd["visual.ln_post.bias"]))},
        "proj": jnp.asarray(_t(sd["visual.proj"])),
        "blocks": _stack_blocks(sd, "visual.transformer", cfg.vision.layers),
    }
    if "visual.ln_pre.weight" in sd:
        visual["ln_pre"] = {"scale": jnp.asarray(_t(sd["visual.ln_pre.weight"])),
                            "bias": jnp.asarray(_t(sd["visual.ln_pre.bias"]))}
    if "visual.attn_pool.query" in sd:
        # open_CLIP AttentionalPooler (transformer.py:163-186): separate
        # q/k/v projections (kdim=width != d_model=embed_dim), fused bias
        e = _t(sd["visual.attn_pool.attn.q_proj_weight"]).shape[0]
        bq = _t(sd["visual.attn_pool.attn.in_proj_bias"])
        visual["attn_pool"] = {
            "query": jnp.asarray(_t(sd["visual.attn_pool.query"])),
            "attn": {
                "wq": jnp.asarray(_t(sd["visual.attn_pool.attn.q_proj_weight"]).T),
                "bq": jnp.asarray(bq[:e]),
                # [k; v] row-stack transposed == [k.T | v.T] column concat
                "wkv": jnp.asarray(np.concatenate(
                    [_t(sd["visual.attn_pool.attn.k_proj_weight"]).T,
                     _t(sd["visual.attn_pool.attn.v_proj_weight"]).T], axis=1)),
                "bkv": jnp.asarray(bq[e:]),
                "wo": jnp.asarray(_t(sd["visual.attn_pool.attn.out_proj.weight"]).T),
                "bo": jnp.asarray(_t(sd["visual.attn_pool.attn.out_proj.bias"])),
            },
            "ln_q": {"scale": jnp.asarray(_t(sd["visual.attn_pool.ln_q.weight"])),
                     "bias": jnp.asarray(_t(sd["visual.attn_pool.ln_q.bias"]))},
            "ln_k": {"scale": jnp.asarray(_t(sd["visual.attn_pool.ln_k.weight"])),
                     "bias": jnp.asarray(_t(sd["visual.attn_pool.ln_k.bias"]))},
        }
    want = (cfg.vision.image_size // p) ** 2 + 1
    if visual["pos_embed"].shape[0] != want:
        visual["pos_embed"] = _resize_pos_embed(visual["pos_embed"], want)
    return visual


def params_from_openclip_coca_state_dict(sd: Dict[str, Any],
                                         cfg: CLIPCfg) -> dict:
    """open_CLIP CoCa state_dict (coca_model.py module tree: visual / text /
    text_decoder / logit_scale) -> our CoCa param tree (models/coca.py)."""
    assert cfg.multimodal is not None
    sd = _np_sd(sd)
    mm = cfg.multimodal
    w = mm.width

    text = {
        "tok_embed": jnp.asarray(_t(sd["text.token_embedding.weight"])),
        "pos_embed": jnp.asarray(_t(sd["text.positional_embedding"])),
        "ln_final": {"scale": jnp.asarray(_t(sd["text.ln_final.weight"])),
                     "bias": jnp.asarray(_t(sd["text.ln_final.bias"]))},
        "proj": {"w": jnp.asarray(_t(sd["text.text_projection"]))},
        "blocks": _stack_blocks(sd, "text.transformer", cfg.text.layers),
    }
    if "text.cls_emb" in sd:
        text["cls_emb"] = jnp.asarray(_t(sd["text.cls_emb"]))

    def ln(prefix):
        return {"scale": jnp.asarray(_t(sd[prefix + ".weight"])),
                "bias": jnp.asarray(_t(sd[prefix + ".bias"]))}

    def mlp(prefix):
        return {"w1": jnp.asarray(_t(sd[prefix + ".c_fc.weight"]).T),
                "b1": jnp.asarray(_t(sd[prefix + ".c_fc.bias"])),
                "w2": jnp.asarray(_t(sd[prefix + ".c_proj.weight"]).T),
                "b2": jnp.asarray(_t(sd[prefix + ".c_proj.bias"]))}

    layers = []
    for i in range(mm.layers):
        s_pre = f"text_decoder.resblocks.{i}"
        c_pre = f"text_decoder.cross_attn.{i}"
        cin = _t(sd[f"{c_pre}.attn.in_proj_weight"])
        cb = _t(sd[f"{c_pre}.attn.in_proj_bias"])
        layers.append({
            "self": {
                "ln_1": ln(f"{s_pre}.ln_1"),
                "attn": {
                    "wqkv": jnp.asarray(_t(sd[f"{s_pre}.attn.in_proj_weight"]).T),
                    "bqkv": jnp.asarray(_t(sd[f"{s_pre}.attn.in_proj_bias"])),
                    "wo": jnp.asarray(_t(sd[f"{s_pre}.attn.out_proj.weight"]).T),
                    "bo": jnp.asarray(_t(sd[f"{s_pre}.attn.out_proj.bias"])),
                },
                "ln_2": ln(f"{s_pre}.ln_2"),
                "mlp": mlp(f"{s_pre}.mlp"),
            },
            "cross": {
                "ln_1": ln(f"{c_pre}.ln_1"),
                "ln_1_kv": ln(f"{c_pre}.ln_1_kv"),
                "attn": {
                    "wq": jnp.asarray(cin[:w].T),
                    "bq": jnp.asarray(cb[:w]),
                    "wkv": jnp.asarray(cin[w:].T),
                    "bkv": jnp.asarray(cb[w:]),
                    "wo": jnp.asarray(_t(sd[f"{c_pre}.attn.out_proj.weight"]).T),
                    "bo": jnp.asarray(_t(sd[f"{c_pre}.attn.out_proj.bias"])),
                },
                "ln_2": ln(f"{c_pre}.ln_2"),
                "mlp": mlp(f"{c_pre}.mlp"),
            },
        })
    return {
        "visual": _visual_from_sd(sd, cfg),
        "text": text,
        "mm_blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "mm_ln": ln("text_decoder.ln_final"),
        "lm_head": {"w": jnp.asarray(_t(sd["text_decoder.text_projection"]))},
        "logit_scale": jnp.asarray(
            np.asarray(_t(sd["logit_scale"]), np.float32).reshape(())),
    }


def params_from_openclip_hf_state_dict(sd: Dict[str, Any],
                                       cfg: CLIPCfg) -> dict:
    """open_CLIP CustomTextCLIP-with-HFTextEncoder state_dict (model.py
    CustomTextCLIP: visual / text.transformer (HF model) / text.proj /
    logit_scale) -> our param tree (models/hf_text.py tower)."""
    from megatron_clip_tpu.models.clip import _hf_text_cfg
    from megatron_clip_tpu.models.hf_text import convert_hf_state_dict
    sd = _np_sd(sd)
    hcfg = _hf_text_cfg(cfg)
    hf_sd = {k[len("text.transformer."):]: v for k, v in sd.items()
             if k.startswith("text.transformer.")}
    text = convert_hf_state_dict(hf_sd, hcfg)
    if "text.proj.weight" in sd:                     # linear, bias-free
        text["proj"] = {"w": jnp.asarray(_t(sd["text.proj.weight"]).T),
                        "b": jnp.zeros(sd["text.proj.weight"].shape[0],
                                       jnp.float32)}
    elif "text.proj.0.weight" in sd:                 # mlp: Linear-GELU-Linear
        text["proj"] = {
            "fc1": {"w": jnp.asarray(_t(sd["text.proj.0.weight"]).T),
                    "b": jnp.zeros(sd["text.proj.0.weight"].shape[0],
                                   jnp.float32)},
            "fc2": {"w": jnp.asarray(_t(sd["text.proj.2.weight"]).T),
                    "b": jnp.zeros(sd["text.proj.2.weight"].shape[0],
                                   jnp.float32)},
        }
    return {
        "visual": _visual_from_sd(sd, cfg),
        "text": text,
        "logit_scale": jnp.asarray(
            np.asarray(_t(sd["logit_scale"]), np.float32).reshape(())),
    }


def load_openclip_checkpoint(path: str, cfg: CLIPCfg, params=None) -> dict:
    """Load an open_CLIP .pt file. Torch-free: uses the restricted zip-format
    reader (checkpoints/pt_reader.py), so `pretrained=` works on hosts
    without torch installed.

    `params` (a freshly-initialized tree) provides merge semantics: model
    components absent from the open_CLIP state dict (extra heads on a
    richer config) keep their initialized values instead of being dropped
    and KeyError-ing later at apply time."""
    from megatron_clip_tpu.checkpoints.pt_reader import load_state_dict
    sd = load_state_dict(path)
    loaded = params_from_openclip_state_dict(sd, cfg)
    if params is None:
        return loaded

    def merge(init, new):
        if isinstance(init, dict) and isinstance(new, dict):
            out = dict(init)
            for k, v in new.items():
                out[k] = merge(init.get(k), v) if k in init else v
            return out
        return new if new is not None else init

    return merge(params, loaded)
