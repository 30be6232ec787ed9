from megatron_clip_tpu.checkpoints.io import (  # noqa: F401
    save_checkpoint, load_checkpoint, latest_checkpoint_step,
    load_params_subtree, load_checkpoint_metadata, TRACKER_FILENAME)
