"""Compute ops. Each op has a pure-jnp reference implementation (always
correct, used on CPU and as the numerics oracle) and, where it pays, a Pallas
TPU kernel. Dispatch is by `use_pallas()` — Pallas only on real TPU backends.

These replace the reference's CUDA fused kernels
(megatron/core/fusions/*, flash_attn — see SURVEY.md §2.2).
"""
import jax


def use_pallas() -> bool:
    """Pallas kernels only on TPU; jnp/XLA fallback elsewhere (tests run on
    CPU). MCT_NO_PALLAS=1 forces the XLA path everywhere (A/B benching)."""
    import os
    if os.environ.get("MCT_NO_PALLAS") == "1":
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


from megatron_clip_tpu.ops.attention import multi_head_attention, sdpa  # noqa: F401,E402
from megatron_clip_tpu.ops.normalization import layer_norm, rms_norm  # noqa: F401,E402
from megatron_clip_tpu.ops.activations import bias_act, get_act  # noqa: F401,E402
