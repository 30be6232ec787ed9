#!/usr/bin/env python
"""Import a HuggingFace Llama checkpoint into a megatron_clip_tpu GPT
checkpoint (the reference's tools/checkpoint/loader_llama2_hf.py job).

  python tools/import_llama_hf.py --hf-path /ckpts/llama-2-7b-hf \\
      --save /ckpts/llama7b_mct
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser("import HF llama -> GPT checkpoint")
    p.add_argument("--hf-path", required=True,
                   help="local HF checkpoint dir (config.json + weights)")
    p.add_argument("--save", required=True, help="output checkpoint root")
    p.add_argument("--iteration", type=int, default=0)
    args = p.parse_args(argv)

    from megatron_clip_tpu.checkpoints.llama_hf import load_llama_hf
    from megatron_clip_tpu.checkpoints import save_checkpoint

    cfg, params = load_llama_hf(args.hf_path)
    n = sum(x.size for x in __import__("jax").tree.leaves(params))
    print(f"loaded llama: {n/1e6:.1f}M params, {cfg.num_layers}L "
          f"x {cfg.hidden_size}")
    save_checkpoint(args.save, args.iteration, {"params": params})
    print(f"saved GPT checkpoint at {args.save} (iteration {args.iteration})")
    print("config:", cfg)


if __name__ == "__main__":
    main()
