from megatron_clip_tpu.checkpoints.io import (  # noqa: F401
    save_checkpoint, load_checkpoint, latest_checkpoint_step,
    TRACKER_FILENAME)
