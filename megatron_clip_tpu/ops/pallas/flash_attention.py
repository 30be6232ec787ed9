"""Pallas flash attention (placeholder — implemented in M2).

Will replace the external `flash_attn` CUDA package
(megatron/model/transformer.py:30-35,419-479) with a TPU splash-style
kernel supporting both the ViT full mask and the text/GPT causal mask.
Until then callers fall back to the jnp sdpa oracle.
"""


def flash_attention(q, k, v, *, causal=False, scale=None):
    raise NotImplementedError("Pallas flash attention lands in M2")
