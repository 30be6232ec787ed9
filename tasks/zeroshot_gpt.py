"""Zero-shot GPT evaluation: WikiText-103 perplexity + LAMBADA accuracy.

Re-implements the reference harness (tasks/zeroshot_gpt/evaluate.py:100-210,
datasets.py:29-147, detokenizer.py) as pure functions over the JAX GPT model:

  - WIKITEXT103: sliding-window LM loss with `overlapping_eval` stride; only
    the non-overlapping tail of each window counts. Reports avg loss, ppl,
    and "adjusted ppl" rescaled by the tokenized/original token ratio.
  - LAMBADA: last-word cloze. A prediction is correct iff *every* target
    token is the argmax at its position (evaluate.py:101-107 correct.prod).
    `strict` splits the final whitespace word (datasets.py:87-95); non-strict
    holds out the final token.
"""
import json
import math
import re
from typing import Callable, Dict, Iterable, List, Sequence, Tuple

import numpy as np


# ----------------------------- detokenizers --------------------------------

def wikitext_detokenizer(string: str) -> str:
    """WikiText's tokenized text -> natural text (reference
    tasks/zeroshot_gpt/detokenizer.py wikitext rules)."""
    # contractions
    string = string.replace("s '", "s'")
    string = re.sub(r"/' [0-9]/", r"/'[0-9]/", string)
    # number separators
    string = string.replace(" @-@ ", "-")
    string = string.replace(" @,@ ", ",")
    string = string.replace(" @.@ ", ".")
    # punctuation
    string = string.replace(" : ", ": ")
    string = string.replace(" ; ", "; ")
    string = string.replace(" . ", ". ")
    string = string.replace(" ! ", "! ")
    string = string.replace(" ? ", "? ")
    string = string.replace(" , ", ", ")
    # double brackets
    string = re.sub(r"\(\s*([^\)]*?)\s*\)", r"(\1)", string)
    string = re.sub(r"\[\s*([^\]]*?)\s*\]", r"[\1]", string)
    string = re.sub(r"{\s*([^}]*?)\s*}", r"{\1}", string)
    string = re.sub(r"\"\s*([^\"]*?)\s*\"", r'"\1"', string)
    string = re.sub(r"'\s*([^']*?)\s*'", r"'\1'", string)
    # miscellaneous
    string = string.replace("= = = =", "====")
    string = string.replace("= = =", "===")
    string = string.replace("= =", "==")
    string = string.replace(" " + chr(176) + " ", chr(176))
    string = string.replace(" \n", "\n")
    string = string.replace("\n ", "\n")
    string = string.replace(" N ", " 1 ")
    string = string.replace(" 's", "'s")
    return string


# ----------------------------- datasets ------------------------------------

def lm_eval_windows(tokens: Sequence[int], seq_len: int,
                    pad_id: int, overlapping_eval: int = None
                    ) -> Iterable[Tuple[np.ndarray, np.ndarray]]:
    """Sliding windows over a token stream (reference _LMDataset semantics,
    datasets.py:29-66): yields (window [seq_len+1], pad_mask [seq_len]) where
    pad_mask selects the target positions that count toward the loss —
    everything in window 0, only the last `overlapping_eval` targets after."""
    ov = overlapping_eval or seq_len
    ov = max(1, ov)
    total_targets = len(tokens) - 1
    targets = max(total_targets - ov, 0)
    total_sequences = max(math.ceil(targets / ov) + 1, 1)
    for idx in range(total_sequences):
        start = idx * ov
        window = list(tokens[start:start + seq_len + 1])
        n = len(window)
        mask = [1] * n
        if n < seq_len + 1:
            mask += [0] * (seq_len + 1 - n)
            window += [pad_id] * (seq_len + 1 - n)
        mask = np.array(mask[1:], np.int32)
        if ov != seq_len and idx != 0:
            mask[:-ov] = 0
        yield np.array(window, np.int64), mask


def lambada_example(text: str, tokenize: Callable[[str], List[int]],
                    strict: bool = False) -> Tuple[List[int], List[int]]:
    """Split one LAMBADA line into (context tokens, target tokens)
    (reference _LambadaDataset.get_tokens, datasets.py:87-95)."""
    if not strict:
        toks = tokenize(text)
        return toks[:-1], [toks[-1]]
    last_word = text.split()[-1]
    start = text.rfind(last_word)
    return tokenize(text[:start].strip()), tokenize(" " + last_word)


def load_lambada(path: str, tokenize, strict: bool = False):
    """Read a LAMBADA jsonl file ({"text": ...} per line)."""
    examples = []
    with open(path) as f:
        for line in f:
            if line.strip():
                examples.append(lambada_example(json.loads(line)["text"],
                                                tokenize, strict))
    return examples


# ----------------------------- evaluation ----------------------------------

def _batched(items, batch_size):
    buf = []
    for it in items:
        buf.append(it)
        if len(buf) == batch_size:
            yield buf
            buf = []
    if buf:
        yield buf


def evaluate_wikitext(params, cfg, text: str, tokenize, *, seq_len: int = None,
                      overlapping_eval: int = None, batch_size: int = 8,
                      pad_id: int = 0, compute_dtype=None,
                      detokenize: bool = True) -> Dict[str, float]:
    """WikiText-style LM eval. Returns avg loss / ppl / adjusted ppl
    (reference evaluate.py:151-158: val_loss = sum / (num_tokenized - 1),
    adjusted_ppl = exp(val_loss * token_ratio))."""
    import jax
    import jax.numpy as jnp
    from megatron_clip_tpu.models.gpt import apply_gpt
    from megatron_clip_tpu.ops.cross_entropy import cross_entropy

    seq_len = seq_len or cfg.seq_length
    num_original = len(text.strip().split(" "))
    if detokenize:
        text = wikitext_detokenizer(text)
    tokens = tokenize(text)
    num_tokenized = len(tokens)

    dtype = compute_dtype or jnp.float32

    @jax.jit
    def batch_loss(window, mask):
        logits = apply_gpt(params, window[:, :-1], cfg, compute_dtype=dtype)
        per_tok = cross_entropy(logits, window[:, 1:])
        return jnp.sum(per_tok * mask.astype(jnp.float32))

    total = 0.0
    for batch in _batched(lm_eval_windows(tokens, seq_len, pad_id,
                                          overlapping_eval), batch_size):
        windows = np.stack([b[0] for b in batch]).astype(np.int32)
        masks = np.stack([b[1] for b in batch])
        # pad the final short batch to the compiled batch size
        if len(batch) < batch_size:
            reps = batch_size - len(batch)
            windows = np.concatenate([windows, np.zeros(
                (reps,) + windows.shape[1:], windows.dtype)])
            masks = np.concatenate([masks, np.zeros(
                (reps,) + masks.shape[1:], masks.dtype)])
        total += float(batch_loss(jnp.asarray(windows), jnp.asarray(masks)))

    val_loss = total / (num_tokenized - 1)
    token_ratio = (num_tokenized - 1) / (num_original - 1)
    return {
        "avg_loss": val_loss,
        "ppl": math.exp(min(20, val_loss)),
        "adjusted_ppl": math.exp(min(20, val_loss * token_ratio)),
        "token_ratio": token_ratio,
        "num_tokenized_tokens": num_tokenized,
        "num_original_tokens": num_original,
    }


def evaluate_lambada(params, cfg, examples, *, seq_len: int = None,
                     batch_size: int = 8, pad_id: int = 0,
                     compute_dtype=None) -> Dict[str, float]:
    """LAMBADA cloze accuracy: all target tokens must be argmax-correct
    (reference evaluate.py:100-107)."""
    import jax
    import jax.numpy as jnp
    from megatron_clip_tpu.models.gpt import apply_gpt

    seq_len = seq_len or cfg.seq_length
    dtype = compute_dtype or jnp.float32

    @jax.jit
    def batch_correct(tokens, loss_mask):
        logits = apply_gpt(params, tokens[:, :-1], cfg, compute_dtype=dtype)
        pred = jnp.argmax(logits, -1)
        labels = tokens[:, 1:]
        correct = (pred == labels) | (loss_mask == 0)
        return correct.all(axis=-1)

    n_correct, n_total = 0, 0
    rows = []
    for ctx, tgt in examples:
        toks = list(ctx) + list(tgt)
        mask = [0] * len(ctx) + [1] * len(tgt)
        if len(toks) < seq_len + 1:
            pad = seq_len + 1 - len(toks)
            toks += [pad_id] * pad
            mask += [0] * pad
        # left-truncate the CONTEXT when the example overflows: tail
        # truncation would cut the target and leave an all-zero mask, making
        # `correct.all()` trivially True (inflated accuracy)
        toks, mask = toks[-(seq_len + 1):], mask[-(seq_len + 1):]
        rows.append((np.array(toks, np.int32), np.array(mask[1:], np.int32)))

    for batch in _batched(rows, batch_size):
        real = len(batch)
        toks = np.stack([b[0] for b in batch])
        masks = np.stack([b[1] for b in batch])
        if real < batch_size:
            reps = batch_size - real
            toks = np.concatenate([toks, np.zeros(
                (reps,) + toks.shape[1:], toks.dtype)])
            masks = np.concatenate([masks, np.zeros(
                (reps,) + masks.shape[1:], masks.dtype)])
        ok = np.asarray(batch_correct(jnp.asarray(toks), jnp.asarray(masks)))
        n_correct += int(ok[:real].sum())
        n_total += real
    return {"num_correct": n_correct, "num_examples": n_total,
            "accuracy": n_correct / max(n_total, 1)}
