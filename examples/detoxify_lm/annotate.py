#!/usr/bin/env python
"""Annotate generations with toxicity scores (SGEAT pipeline step 2).

Reference: examples/detxoify_lm/annotations/perspective_api_annotate.py +
perspective_api.py — each jsonl line gains
`"score": {"toxicity": ..., "severe_toxicity": ..., ...}` for
filter_selfgeneration.py to rank on.

Two scorers:
  --scorer lexicon      (default) offline stand-in: the same word-list
                        heuristic filter_selfgeneration.py falls back to;
                        fills only the "toxicity" attribute. Keeps the
                        pipeline runnable with zero egress.
  --scorer perspective  the reference's Google Perspective API via stdlib
                        urllib (no googleapiclient dependency); requires
                        network + PERSPECTIVE_API_KEY in the environment.

  python examples/detoxify_lm/annotate.py \\
      --data-path gens.jsonl --out-path gens_scored.jsonl
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ATTRIBUTES = ["toxicity", "severe_toxicity", "sexually_explicit",
              "threat", "profanity", "identity_attack"]
_PERSPECTIVE_URL = ("https://commentanalyzer.googleapis.com/v1alpha1/"
                    "comments:analyze?key={key}")


class PerspectiveApiScorer:
    """Minimal Perspective API client (perspective_api.py semantics:
    requested attributes -> summary scores; retry on rate-limit)."""

    def __init__(self, api_key=None, attributes=ATTRIBUTES, retries=5):
        self.api_key = api_key or os.environ.get("PERSPECTIVE_API_KEY")
        if not self.api_key:
            raise SystemExit(
                "--scorer perspective needs PERSPECTIVE_API_KEY (see "
                "https://support.perspectiveapi.com/s/docs-get-started); "
                "use --scorer lexicon for the offline pipeline")
        self.attributes = attributes
        self.retries = retries

    def __call__(self, text: str) -> dict:
        import urllib.error
        import urllib.request
        body = json.dumps({
            "comment": {"text": text},
            "requestedAttributes": {a.upper(): {} for a in self.attributes},
            "spanAnnotations": False,
            "languages": ["en"],
        }).encode()
        req = urllib.request.Request(
            _PERSPECTIVE_URL.format(key=self.api_key), data=body,
            headers={"Content-Type": "application/json"})
        for attempt in range(self.retries):
            try:
                with urllib.request.urlopen(req, timeout=30) as r:
                    resp = json.loads(r.read())
                return {a: resp["attributeScores"][a.upper()]
                        ["summaryScore"]["value"] for a in self.attributes}
            except urllib.error.HTTPError as e:
                if e.code == 429 and attempt + 1 < self.retries:
                    time.sleep(2 ** attempt)  # rate limit: back off
                    continue
                raise
        raise RuntimeError("unreachable")


class LexiconScorer:
    def __call__(self, text: str) -> dict:
        from filter_selfgeneration import heuristic_toxicity
        return {"toxicity": heuristic_toxicity(text)}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-path", required=True, help="generations jsonl")
    p.add_argument("--out-path", required=True, help="annotated jsonl")
    p.add_argument("--scorer", choices=["lexicon", "perspective"],
                   default="lexicon")
    p.add_argument("--total", type=int, default=-1,
                   help="annotate at most N lines (reference --total)")
    args = p.parse_args(argv)
    scorer = PerspectiveApiScorer() if args.scorer == "perspective" \
        else LexiconScorer()
    n = 0
    with open(args.data_path, encoding="utf-8") as f, \
            open(args.out_path, "w", encoding="utf-8") as out:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if 0 <= args.total <= n:
                break
            rec = json.loads(line)
            rec["score"] = scorer(str(rec.get("text", "")))
            out.write(json.dumps(rec, ensure_ascii=False) + "\n")
            n += 1
    print(json.dumps({"annotated": n, "scorer": args.scorer}), flush=True)


if __name__ == "__main__":
    main()
