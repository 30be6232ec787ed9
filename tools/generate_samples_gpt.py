#!/usr/bin/env python
"""Bulk text sampling from a GPT checkpoint to a JSONL file.

The reference's examples/detxoify_lm/generate_samples_gpt.py: read prompts
from --sample-input-file (jsonl with {"prompt": {"text": ...}} or plain
text lines), or sample --num-samples unconditionally, and append
{"prompt": ..., "text": ...} lines to --genfile. Used for the
self-generation step of the detoxify pipeline and for qualitative checks.

  python tools/generate_samples_gpt.py --load ckpt/ --num-layers 12 ... \\
      --num-samples 64 --genfile gens.jsonl --top-p 0.9
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def _read_prompts(path):
    prompts = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            try:
                j = json.loads(line)
                if isinstance(j, dict):
                    p = j.get("prompt", j.get("text", ""))
                    if isinstance(p, dict):
                        p = p.get("text", "")
                    prompts.append(str(p))
                else:
                    prompts.append(str(j))
            except json.JSONDecodeError:
                prompts.append(line)
    return prompts


def main(argv=None):
    import numpy as np

    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("--load", default=None, help="orbax checkpoint root")
    p.add_argument("--genfile", required=True, help="output jsonl")
    p.add_argument("--sample-input-file", default=None,
                   help="prompt file (jsonl or plain lines); unconditional "
                        "sampling when unset")
    p.add_argument("--num-samples", type=int, default=16,
                   help="unconditional sample count (--sample-input-file "
                        "unset)")
    p.add_argument("--out-seq-length", type=int, default=256)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--greedy", action="store_true")
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--top-p", type=float, default=0.0)
    p.add_argument("--gen-batch-size", type=int, default=8)
    p.add_argument("--gen-seed", type=int, default=1234)
    gen_args, rest = p.parse_known_args(argv)

    from pretrain_gpt import parse_args
    args = parse_args(rest)

    import jax
    import jax.numpy as jnp
    from megatron_clip_tpu.inference.generation import generate
    from megatron_clip_tpu.models.gpt import GPTCfg, init_gpt
    from megatron_clip_tpu.tokenizer import SimpleTokenizer

    tok = SimpleTokenizer()
    cfg = GPTCfg(num_layers=args.num_layers, hidden_size=args.hidden_size,
                 num_heads=args.num_heads, vocab_size=args.vocab_size,
                 seq_length=args.seq_length,
                 position_embedding=args.position_embedding)
    params = init_gpt(jax.random.PRNGKey(args.seed), cfg)
    if gen_args.load:
        from megatron_clip_tpu.checkpoints import load_checkpoint
        tree, _, step = load_checkpoint(gen_args.load, {"params": params})
        params = tree["params"]
        print(f"loaded checkpoint @ step {step}", flush=True)

    if gen_args.sample_input_file:
        prompts = _read_prompts(gen_args.sample_input_file)
    else:
        prompts = [""] * gen_args.num_samples
    eot = tok.eot_token_id

    bs = gen_args.gen_batch_size
    new_tokens = min(gen_args.out_seq_length, cfg.seq_length - 1)
    t0 = time.time()
    written = 0
    with open(gen_args.genfile, "a", encoding="utf-8") as out:
        for lo in range(0, len(prompts), bs):
            chunk = prompts[lo:lo + bs]
            # unconditional contexts start from a lone EOT (megatron's
            # convention for context-free sampling)
            ids = [tok.encode(c) if c else [eot] for c in chunk]
            max_len = max(len(i) for i in ids)
            batch = np.full((len(ids), max_len), eot, np.int32)
            lens = np.zeros((len(ids),), np.int32)
            for r, seq in enumerate(ids):
                batch[r, :len(seq)] = seq
                lens[r] = len(seq)
            outp, n_gen = generate(
                params, jnp.asarray(batch), jnp.asarray(lens), cfg,
                max_new_tokens=new_tokens,
                temperature=0.0 if gen_args.greedy else gen_args.temperature,
                top_k=1 if gen_args.greedy else gen_args.top_k,
                top_p=0.0 if gen_args.greedy else gen_args.top_p,
                eos_id=eot, seed=gen_args.gen_seed + lo,
                return_lengths=True)
            outp, n_gen = np.asarray(outp), np.asarray(n_gen)
            for r, c in enumerate(chunk):
                toks = list(outp[r, lens[r]:lens[r] + n_gen[r]])
                if toks and toks[-1] == eot:
                    toks = toks[:-1]
                text = tok.decode([int(t) for t in toks])
                out.write(json.dumps({"prompt": c, "text": text}) + "\n")
                written += 1
            print(f"{written}/{len(prompts)} samples "
                  f"({written / (time.time() - t0):.2f}/s)", flush=True)
    print(f"done: {written} samples -> {gen_args.genfile}", flush=True)


if __name__ == "__main__":
    main()
