#!/usr/bin/env python
"""Checkpoint layout conversion.

The reference needs explicit TPxPP resharding tools
(tools/checkpoint/{util,loader_megatron,saver_megatron}.py: load per-rank
mp_rank files, re-split tensors, write new per-rank files). With Orbax
checkpoints the arrays are GLOBAL — "resharding" is simply restoring onto a
different mesh, which happens automatically at load. This tool therefore
covers the remaining conversions:

  orbax -> open_CLIP .pt   (export for torch consumers)
  open_CLIP .pt -> orbax   (import a torch-trained model)

  python tools/checkpoint_reshard.py --model ViT-B-32 \
      --load ckpts/clip --save-torch out/epoch_final.pt
  python tools/checkpoint_reshard.py --model ViT-B-32 \
      --load-torch epoch_32.pt --save ckpts/imported
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--load", help="orbax checkpoint root")
    p.add_argument("--load-torch", help="open_CLIP .pt file")
    p.add_argument("--save", help="orbax checkpoint root to write")
    p.add_argument("--save-torch", help=".pt file to write")
    args = p.parse_args(argv)

    import jax
    import numpy as np
    from megatron_clip_tpu.factory import create_model
    from megatron_clip_tpu.checkpoints import save_checkpoint, load_checkpoint
    from megatron_clip_tpu.checkpoints.torch_interop import (
        load_openclip_checkpoint, openclip_state_dict_from_params)

    model, params = create_model(args.model, init_params=True)
    step = 0
    if args.load:
        tree, meta, step = load_checkpoint(args.load, {"params": params})
        params = tree["params"]
        print(f"loaded orbax checkpoint @ step {step}")
    elif args.load_torch:
        params = load_openclip_checkpoint(args.load_torch, model.cfg)
        print(f"loaded torch checkpoint {args.load_torch}")
    else:
        p.error("need --load or --load-torch")

    if args.save:
        save_checkpoint(args.save, step, {"params": params})
        print(f"wrote orbax checkpoint to {args.save}")
    if args.save_torch:
        import torch
        sd = openclip_state_dict_from_params(params, model.cfg)
        torch.save({"state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                                   for k, v in sd.items()},
                    "epoch": step}, args.save_torch)
        print(f"wrote torch checkpoint to {args.save_torch}")


if __name__ == "__main__":
    main()
