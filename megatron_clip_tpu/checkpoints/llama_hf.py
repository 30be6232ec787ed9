"""HuggingFace Llama -> megatron_clip_tpu GPT checkpoint conversion.

The reference ships tools/checkpoint/loader_llama2_hf.py (365 LoC) to import
HF Llama-2 weights into Megatron's GPT. Here the target is the JAX GPT
(models/gpt.py), whose conventions match HF Llama exactly: rotate-half
rope (ops/rope.py), swiglu with silu(gate)*up (ops/activations.py),
RMSNorm, optional GQA. The mapping is therefore a pure relayout:

  model.embed_tokens.weight            -> tok_embed           [V, W]
  layers.i.input_layernorm.weight      -> blocks.ln_1.scale
  layers.i.self_attn.{q,k,v}_proj      -> blocks.attn.wqkv    [W,(H+2Hkv)hd]
  layers.i.self_attn.o_proj            -> blocks.attn.wo      [W, W]
  layers.i.post_attention_layernorm    -> blocks.ln_2.scale
  layers.i.mlp.{up,gate}_proj          -> blocks.mlp.w1       [W, 2*ffn]
  layers.i.mlp.down_proj               -> blocks.mlp.w2       [ffn, W]
  model.norm.weight                    -> ln_f.scale
  lm_head.weight                       -> lm_head             [W, V]

torch (CPU) is used only to read the checkpoint. Logit parity vs
transformers LlamaForCausalLM is tested to <=1e-4 (tests/test_llama_hf.py).
"""
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def gpt_cfg_from_llama_config(config) -> "GPTCfg":
    from megatron_clip_tpu.models.gpt import GPTCfg
    return GPTCfg(
        num_layers=config.num_hidden_layers,
        hidden_size=config.hidden_size,
        num_heads=config.num_attention_heads,
        kv_heads=(config.num_key_value_heads
                  if config.num_key_value_heads != config.num_attention_heads
                  else None),
        vocab_size=config.vocab_size,
        seq_length=config.max_position_embeddings,
        mlp_ratio=config.intermediate_size / config.hidden_size,
        position_embedding="rope",
        rope_theta=getattr(config, "rope_theta", 10000.0),
        swiglu=True, normalization="rmsnorm", use_bias=False,
        tie_embeddings=bool(getattr(config, "tie_word_embeddings", False)))


def convert_llama_state_dict(sd, cfg) -> dict:
    """HF Llama(ForCausalLM) state_dict (numpy values) -> GPT param tree."""
    def g(name):
        return np.asarray(sd[name])

    prefix = "model." if "model.embed_tokens.weight" in sd else ""
    blocks = {"ln_1": {"scale": []}, "ln_2": {"scale": []},
              "attn": {"wqkv": [], "wo": []}, "mlp": {"w1": [], "w2": []}}
    for i in range(cfg.num_layers):
        pre = f"{prefix}layers.{i}."
        q = g(pre + "self_attn.q_proj.weight").T           # [W, H*hd]
        k = g(pre + "self_attn.k_proj.weight").T           # [W, Hkv*hd]
        v = g(pre + "self_attn.v_proj.weight").T
        blocks["attn"]["wqkv"].append(np.concatenate([q, k, v], axis=1))
        blocks["attn"]["wo"].append(g(pre + "self_attn.o_proj.weight").T)
        blocks["ln_1"]["scale"].append(g(pre + "input_layernorm.weight"))
        blocks["ln_2"]["scale"].append(
            g(pre + "post_attention_layernorm.weight"))
        up = g(pre + "mlp.up_proj.weight").T               # value half
        gate = g(pre + "mlp.gate_proj.weight").T           # gate half
        blocks["mlp"]["w1"].append(np.concatenate([up, gate], axis=1))
        blocks["mlp"]["w2"].append(g(pre + "mlp.down_proj.weight").T)

    import jax
    params = {
        "tok_embed": jnp.asarray(g(prefix + "embed_tokens.weight")),
        "ln_f": {"scale": jnp.asarray(g(prefix + "norm.weight"))},
        "blocks": jax.tree.map(lambda *x: None, blocks),  # replaced below
    }
    params["blocks"] = {
        outer: {inner: jnp.asarray(np.stack(leaves))
                for inner, leaves in d.items()}
        for outer, d in blocks.items()
    }
    if not cfg.tie_embeddings:
        if "lm_head.weight" in sd:
            params["lm_head"] = jnp.asarray(g("lm_head.weight").T)
        else:
            params["lm_head"] = params["tok_embed"].T
    return params


def load_llama_hf(model_name_or_path: str) -> Tuple["GPTCfg", dict]:
    """Load a local HF Llama checkpoint dir (or hub name when network
    allows) as (GPTCfg, params)."""
    from transformers import AutoConfig, AutoModelForCausalLM
    config = AutoConfig.from_pretrained(model_name_or_path)
    cfg = gpt_cfg_from_llama_config(config)
    model = AutoModelForCausalLM.from_pretrained(model_name_or_path)
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    return cfg, convert_llama_state_dict(sd, cfg)
