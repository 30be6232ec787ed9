"""megatron_clip_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of Megatron-CLIP (chen-yy20/Megatron-CLIP).

This is a ground-up rebuild, not a port: parallelism is expressed as
`jax.sharding.Mesh` axes + `shard_map`/`pjit` instead of NCCL process groups,
fused CUDA kernels become Pallas kernels, and the reference's unfinished
branch-parallel contrastive join (vision tower on one sub-mesh, text tower on
another, global-batch InfoNCE at the junction) is completed with explicit
`jax.vjp` feature-gradient routing.

Public API mirrors open_CLIP where the reference does
(reference: open_CLIP/src/open_clip/__init__.py):
    create_model_and_transforms, create_loss, ClipLoss, get_tokenizer, tokenize
"""

__version__ = "0.1.0"

from megatron_clip_tpu.factory import (  # noqa: F401
    create_model,
    create_model_and_transforms,
    create_loss,
    list_models,
    get_model_config,
)
from megatron_clip_tpu.losses import (  # noqa: F401
    ClipLoss, SigLipLoss, CoCaLoss, DistillClipLoss)
from megatron_clip_tpu.tokenizer import get_tokenizer, tokenize  # noqa: F401
