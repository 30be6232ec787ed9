#!/usr/bin/env python
"""Branch-parallel CLIP pretraining entry point.

The TPU counterpart of the reference's `pretrain_CLIP.py` (branch-parallel
megatron path) and `open_CLIP/src/training/main.py` (DDP path) — one CLI
covering both: without `--extra-world-size` the two towers train jointly on
one mesh; with it, vision and text get their own sub-meshes with independent
tp/pp layouts and a gradient-correct contrastive join.

Examples:
  # synthetic smoke (CPU or 1 chip)
  python pretrain_clip.py --dataset-type synthetic --batch-size 32 \\
      --epochs 1 --warmup 2 --log-interval 1

  # webdataset shards, 8-device mesh dp2 x fsdp2 x tp2
  python pretrain_clip.py --train-data '/data/cc3m/{00000..00331}.tar' \\
      --train-num-samples 2905954 --batch-size 1024 \\
      --tensor-model-parallel-size 2 --fsdp-parallel-size 2

  # branch parallel: vision tp1/pp4 on 8 devices, text tp2/pp2 on 8 more
  python pretrain_clip.py --extra-world-size 8 \\
      --pipeline-model-parallel-size 4 --num-microbatches 8 \\
      --xtensor-model-parallel-size 2 --xpipeline-model-parallel-size 2
"""
import os

if os.environ.get("MCT_FORCE_CPU") == "1" or \
        os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon sitecustomize force-registers the TPU plugin regardless of
    # JAX_PLATFORMS; honor a cpu request at the config level too (needed for
    # the virtual 8-device mesh: XLA_FLAGS=--xla_force_host_platform_device_count=N)
    import jax
    jax.config.update("jax_platforms", "cpu")

from megatron_clip_tpu.training.params import parse_args
from megatron_clip_tpu.training.loop import run_training


def main(argv=None):
    args = parse_args(argv)
    metrics = run_training(args)
    print("final:", metrics, flush=True)
    return metrics


if __name__ == "__main__":
    main()
