#!/usr/bin/env python
"""Launch the REST text-generation server
(reference: tools/run_text_generation_server.py + megatron/
text_generation_server.py). Loads a GPT checkpoint (or random init for
smoke) and serves PUT /api.

  python tools/run_text_generation_server.py --num-layers 12 ... --port 5000
  curl -X PUT http://localhost:5000/api \\
      -d '{"prompts": ["hello"], "tokens_to_generate": 16}'
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    import jax
    from pretrain_gpt import parse_args
    import argparse

    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("--port", type=int, default=5000)
    p.add_argument("--load", type=str, default=None,
                   help="checkpoint root (latest_checkpointed_iteration.txt)")
    srv_args, rest = p.parse_known_args(argv)
    args = parse_args(rest)

    from megatron_clip_tpu.models.gpt import init_gpt
    from megatron_clip_tpu.tokenizer import SimpleTokenizer
    from megatron_clip_tpu.inference.server import GenerationService, run_server
    from pretrain_gpt import gpt_cfg_from_args

    tok = SimpleTokenizer()
    # the full architecture-flag surface (kv_channels, GQA, swiglu, rope,
    # ffn size, ...) — a checkpoint trained through pretrain_gpt.py must
    # produce the same parameter shapes here
    cfg = gpt_cfg_from_args(args)
    params = init_gpt(jax.random.PRNGKey(args.seed), cfg)
    if srv_args.load:
        from megatron_clip_tpu.checkpoints import load_checkpoint
        tree, _, step = load_checkpoint(srv_args.load, {"params": params})
        params = tree["params"]
        print(f"loaded checkpoint @ step {step}")

    # serve under a TP×PP mesh (megatron text_generation/communication.py):
    # --tensor-model-parallel-size shards heads/mlp + the KV cache;
    # --pipeline-model-parallel-size runs the staged decode program
    mesh = None
    tp = getattr(args, "tensor_model_parallel_size", 1) or 1
    pp = getattr(args, "pipeline_model_parallel_size", 1) or 1
    if tp * pp > 1:
        from megatron_clip_tpu.config import ParallelCfg
        from megatron_clip_tpu.models.gpt import gpt_param_specs
        from megatron_clip_tpu.parallel import build_mesh
        from megatron_clip_tpu.parallel.mesh import STAGE
        from megatron_clip_tpu.parallel.sharding import make_sharding_tree
        mesh = build_mesh(ParallelCfg(tp=tp, pp=pp))
        params = jax.device_put(params, make_sharding_tree(
            mesh, gpt_param_specs(params,
                                  stage_axis=STAGE if pp > 1 else None)))
        print(f"serving under mesh tp={tp} pp={pp}")

    service = GenerationService(params, cfg, tok, eos_id=tok.eot_token_id,
                                mesh=mesh)
    server = run_server(service, port=srv_args.port)
    print(f"serving on :{srv_args.port} (PUT /api)", flush=True)
    try:
        import threading
        threading.Event().wait()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
