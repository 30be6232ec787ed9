"""Multi-Stage Dialogue Prompting (MSDP) — knowledgeable dialogue generation.

Capability parity with the reference's tasks/msdp/ (main.py, prompt.py,
evaluate.py, metrics.py — ~570 LoC of torch/Megatron glue):

  MSDP-PROMPT : few-shot prompt a pretrained GPT to generate either the
      *knowledge* sentence for a dialogue turn or the *response* given
      knowledge, writing one generation per input line
      (tasks/msdp/prompt.py:39-140).
  MSDP-EVAL-F1 : token-level F1 between a guess file and an answer file
      (tasks/msdp/evaluate.py:11-45, metrics.py F1Metric).

Input format (one test sample per line, tab-separated — reference
prompt.py:100-131): `topic \t turn1 [SEP] turn2 ... \t knowledge`.

Generation runs either locally through this repo's jitted KV-cache decoder
(inference/generation.py) or against a REST text-generation server
(--megatron-api-url, the reference's call_model_api path, prompt.py:20-36).
"""
import json
import re
from collections import Counter
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

_RE_ART = re.compile(r"\b(a|an|the)\b")
_RE_PUNC = re.compile(r"[!\"#$%&()*+,\-./:;<=>?@\[\]\\^`{|}~_']")


def normalize_answer(s: str) -> str:
    """Lowercase, strip punctuation/articles/extra whitespace (the ParlAI
    dialogue-metric normalization the reference adopts, metrics.py:18-27)."""
    s = _RE_PUNC.sub(" ", s.lower())
    s = _RE_ART.sub(" ", s)
    return " ".join(s.split())


def _prf(pred: List[str], gold: List[str]) -> Tuple[float, float, float]:
    overlap = sum((Counter(gold) & Counter(pred)).values())
    if overlap == 0:
        return 0.0, 0.0, 0.0
    p = overlap / len(pred)
    r = overlap / len(gold)
    return p, r, 2 * p * r / (p + r)


def f1_score(guess: str, answer: str):
    """Token-level F1 for one pair; None answer-empty pairs are skipped
    (metrics.py compute_each_pair)."""
    if answer == "":
        return None
    if guess == "":
        return 0.0, 0.0, 0.0
    return _prf(normalize_answer(guess).split(), normalize_answer(answer).split())


def corpus_f1(guesses: List[str], answers: List[str]):
    """Mean precision/recall/F1 over all scored pairs (compute_all_pairs)."""
    assert len(guesses) == len(answers), "guess/answer length mismatch"
    scored = [s for s in (f1_score(g, a) for g, a in zip(guesses, answers))
              if s is not None]
    if not scored:
        return 0.0, 0.0, 0.0
    arr = np.asarray(scored)
    return tuple(arr.mean(axis=0))


def evaluate_f1(guess_file: str, answer_file: str) -> Dict[str, float]:
    """MSDP-EVAL-F1 (tasks/msdp/evaluate.py:11-45): strip `<|endoftext|>`
    from guesses; `no_passages_used` golds count as empty (skipped)."""
    with open(guess_file) as f:
        guesses = [ln.strip().replace("<|endoftext|>", "") for ln in f]
    with open(answer_file) as f:
        answers = ["" if ln.strip() == "no_passages_used" else ln.strip()
                   for ln in f]
    p, r, f1 = corpus_f1(guesses, answers)
    print(f"Precision: {p:.4f}; recall: {r:.4f}; f1: {f1:.4f}")
    return {"precision": float(p), "recall": float(r), "f1": float(f1)}


# --------------------------------------------------------------------------
# prompting
# --------------------------------------------------------------------------

def read_prompts(prompt_path: str, prompt_type: str,
                 n_examples: int = 10):
    """Knowledge prompts: JSONL of {key: [example, ...]} -> {key: prompt}.
    Response prompt: first n_examples lines joined (prompt.py:39-73)."""
    if prompt_type == "knowledge":
        out: Dict[str, str] = {}
        with open(prompt_path) as f:
            for line in f:
                d = json.loads(line.strip())
                key = next(iter(d))
                if key not in out:
                    out[key] = "".join(x.strip() + " \n" for x in d[key])
        return out
    with open(prompt_path) as f:
        lines = f.readlines()[:n_examples]
    return "".join(x.strip() + " \n" for x in lines)


def build_prompt(sample_line: str, prompt_type: str, prompts) -> str:
    """Assemble the full few-shot input for one tab-separated test sample
    (prompt.py:100-132)."""
    parts = sample_line.strip().split("\t")
    topic = parts[0]
    turns = parts[1].split(" [SEP] ")
    last_turn = turns[-1].strip()
    if prompt_type == "knowledge":
        key = topic + " " + last_turn
        return prompts[key] + "( " + last_turn + " ) " + topic + " =>"
    knowledge = parts[2].strip()
    return (prompts + "Topic: " + topic + ". "
            + "User says: " + last_turn + " "
            + "We know that: " + knowledge + " "
            + "System replies:")


def postprocess_generation(full_output: str, prompt: str) -> str:
    """Reference api path: drop the echoed prompt, keep the first line
    (prompt.py:32-36)."""
    out = full_output[len(prompt):] if full_output.startswith(prompt) else \
        full_output
    return out.split("\n")[0].strip()


def generate_samples(sample_input_file: str, sample_output_file: str, *,
                     prompt_file: str, prompt_type: str,
                     generate_fn: Callable[[str, int], str],
                     num_prompt_examples: int = 10,
                     out_seq_length: int = 100) -> int:
    """MSDP-PROMPT driver: one generation per input line, written to the
    output file. `generate_fn(prompt, max_tokens) -> full text` abstracts
    local decoding vs the REST server."""
    if prompt_type not in ("knowledge", "response"):
        raise ValueError("prompt_type must be 'knowledge' or 'response'")
    prompts = read_prompts(prompt_file, prompt_type, num_prompt_examples)
    n = 0
    with open(sample_input_file) as fin, open(sample_output_file, "w") as fout:
        for line in fin:
            if not line.strip():
                continue
            prompt = build_prompt(line, prompt_type, prompts)
            raw = generate_fn(prompt, out_seq_length)
            fout.write(postprocess_generation(raw, prompt) + "\n")
            n += 1
    return n


def api_generate_fn(url: str) -> Callable[[str, int], str]:
    """generate_fn hitting a running text-generation REST server (the
    reference's call_model_api; server contract =
    tools/run_text_generation_server.py)."""
    import urllib.request

    def gen(prompt: str, max_tokens: int) -> str:
        body = json.dumps({"prompts": [prompt],
                           "tokens_to_generate": max_tokens,
                           "top_k": 1}).encode()
        req = urllib.request.Request(
            url, data=body, method="PUT",
            headers={"Content-Type": "application/json; charset=UTF-8"})
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())["text"][0]
    return gen


def local_generate_fn(params, cfg, tokenizer,
                      eod: Optional[int] = None) -> Callable[[str, int], str]:
    """generate_fn decoding with the repo's jitted greedy KV-cache decoder."""
    from megatron_clip_tpu.inference.generation import generate

    def gen(prompt: str, max_tokens: int) -> str:
        ids = np.asarray(tokenizer.tokenize(prompt), np.int32)
        p = len(ids)
        out, n_gen = generate(
            params, ids[None, :], np.asarray([p], np.int32), cfg,
            max_new_tokens=max_tokens, temperature=0.0,
            eos_id=eod if eod is not None else -1, return_lengths=True)
        gen_ids = np.asarray(out)[0, p:p + int(np.asarray(n_gen)[0])]
        if eod is not None and len(gen_ids) and gen_ids[-1] == eod:
            gen_ids = gen_ids[:-1]
        return prompt + tokenizer.detokenize(list(gen_ids))
    return gen
