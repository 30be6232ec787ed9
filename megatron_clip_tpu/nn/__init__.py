from megatron_clip_tpu.nn.transformer import (  # noqa: F401
    init_transformer,
    apply_transformer,
    init_block,
    apply_block,
    init_linear,
    init_layer_norm,
)
