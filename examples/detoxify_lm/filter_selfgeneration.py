#!/usr/bin/env python
"""Filter self-generated samples to the least-toxic fraction.

The reference's examples/detxoify_lm/annotations/filter-selfgeneration.py:
rank generated samples by toxicity score and keep the least-toxic half for
the domain-adaptive finetune (SGEAT, arXiv:2302.07388 recipe). There the
scores come from the Perspective API (network service); here each jsonl
line may carry its own score —

  {"text": ..., "score": 0.12}            # float, or
  {"text": ..., "score": {"toxicity": 0.12}}

— and lines without one are scored by a small offline lexicon heuristic
(fraction of words in a profanity/slur list; a stand-in scorer so the
pipeline runs with zero egress — swap in Perspective/Detoxify scores by
annotating the jsonl).

  python examples/detoxify_lm/filter_selfgeneration.py \\
      --data-path gens.jsonl --out-path nontoxic.jsonl --keep-fraction 0.5
"""
import argparse
import json

import numpy as np

# Deliberately mild stand-in lexicon: enough to make the heuristic ordering
# real without shipping a slur list in the repo.
_TOXIC_WORDS = frozenset("""
hate stupid idiot dumb kill ugly trash garbage moron loser shut freak
disgusting awful worthless pathetic scum creep jerk
""".split())


def heuristic_toxicity(text: str) -> float:
    words = [w.strip(".,!?;:\"'").lower() for w in text.split()]
    if not words:
        return 0.0
    hits = sum(w in _TOXIC_WORDS for w in words)
    return min(1.0, 4.0 * hits / len(words))


def _score(rec) -> float:
    s = rec.get("score")
    if isinstance(s, dict):
        s = s.get("toxicity")
    if s is None:
        return heuristic_toxicity(str(rec.get("text", "")))
    return float(s)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-path", required=True, help="generated jsonl")
    p.add_argument("--out-path", required=True, help="filtered jsonl")
    p.add_argument("--keep-fraction", type=float, default=0.5,
                   help="least-toxic fraction to keep (reference keeps 1/2)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    corpus, scores = [], []
    with open(args.data_path, encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            rec = json.loads(line)
            corpus.append(rec)
            scores.append(_score(rec))
    scores = np.asarray(scores, np.float64)
    if not len(scores):
        raise SystemExit(f"no samples in {args.data_path}")

    print(f"total valid samples: {len(scores)}")
    print(f"avg toxicity (all): {scores.mean():.4f} +- {scores.std():.4f}")
    toxic = scores > 0.5
    print(f"toxic fraction (>0.5): {toxic.mean():.4f}")

    keep = max(1, int(len(scores) * args.keep_fraction))
    order = np.argsort(scores, kind="stable")[:keep]
    kept = scores[order]
    print(f"after filtering: {keep} samples, avg toxicity "
          f"{kept.mean():.4f}, range {kept.min():.4f}~{kept.max():.4f}")

    rng = np.random.RandomState(args.seed)
    order = order[rng.permutation(keep)]
    with open(args.out_path, "w", encoding="utf-8") as f:
        for i in order:
            f.write(json.dumps(corpus[int(i)]) + "\n")
    print(f"wrote {keep} samples -> {args.out_path}")


if __name__ == "__main__":
    main()
