from megatron_clip_tpu.inference.generation import (  # noqa: F401
    generate, greedy_generate, KVCache)
