from megatron_clip_tpu.data.transforms import (  # noqa: F401
    image_transform, OPENAI_DATASET_MEAN, OPENAI_DATASET_STD)
