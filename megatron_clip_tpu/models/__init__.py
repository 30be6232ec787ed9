from megatron_clip_tpu.models.clip import (  # noqa: F401
    init_clip,
    apply_clip,
    encode_image,
    encode_text,
)
