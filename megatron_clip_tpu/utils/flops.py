"""Model FLOPs accounting (the reference's fvcore-based Userprofile.py and
the MFU math of Megatron's README). Matmul FLOPs only, forward; training
multiplies by 3 (fwd + ~2x bwd)."""
from megatron_clip_tpu.config import CLIPCfg, TransformerCfg, VisionCfg, TextCfg


def transformer_forward_flops(cfg: TransformerCfg, seq: int,
                              batch: int = 1) -> float:
    w, h = cfg.width, cfg.mlp_hidden
    hkv = cfg.kv_heads or cfg.heads
    qkv = 2 * w * (cfg.heads + 2 * hkv) * cfg.head_dim
    out = 2 * w * w
    attn = 2 * seq * cfg.head_dim * cfg.heads * 2          # QK^T + PV
    mlp = 2 * w * h * (3 if cfg.act == "swiglu" else 2)
    per_token = cfg.layers * (qkv + out + attn + mlp)
    return float(batch) * seq * per_token


def vision_tower_forward_flops(cfg: VisionCfg, batch: int = 1) -> float:
    t = cfg.transformer()
    s = cfg.seq_len
    embed = 2 * s * (cfg.patch_size ** 2 * 3) * cfg.width
    return float(batch) * embed + transformer_forward_flops(t, s, batch)


def text_tower_forward_flops(cfg: TextCfg, batch: int = 1) -> float:
    t = cfg.transformer()
    return transformer_forward_flops(t, cfg.context_length, batch)


def clip_forward_flops(cfg: CLIPCfg, batch: int = 1) -> float:
    return (vision_tower_forward_flops(cfg.vision, batch)
            + text_tower_forward_flops(cfg.text, batch))


def clip_train_flops(cfg: CLIPCfg, batch: int = 1) -> float:
    return 3.0 * clip_forward_flops(cfg, batch)


def gpt_forward_flops(cfg, batch: int = 1) -> float:
    t = cfg.transformer()
    body = transformer_forward_flops(t, cfg.seq_length, batch)
    head = 2.0 * batch * cfg.seq_length * cfg.hidden_size * cfg.vocab_size
    return body + head


def count_params(params) -> int:
    import jax
    return sum(x.size for x in jax.tree.leaves(params))


def mfu(samples_per_sec: float, flops_per_sample: float,
        peak_flops: float) -> float:
    return samples_per_sec * flops_per_sample / peak_flops
