from megatron_clip_tpu.utils.timers import Timers, tprofile, see_memory_usage  # noqa: F401
