#!/usr/bin/env python
"""Ensemble saved classifier predictions from multiple finetune runs.

The reference's tasks/ensemble_classifier.py: load per-checkpoint
prediction dumps, sum/average the class probabilities per dataset,
optionally calibrate a binary decision threshold on labels, report
accuracy and write <outdir>/<dataset>/<name>.tsv id/label files.

Predictions here are .npz files written by
``tasks/main.py --task glue/race --save-predictions out.npz`` with keys
{name, probs [N,C], labels [N], uid [N]}.

  python tasks/ensemble_classifier.py --paths run1.npz run2.npz --eval
"""
import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def load_predictions(paths):
    """-> {dataset: (summed probs, labels, uid)}; uids must agree."""
    merged = {}
    for path in paths:
        with np.load(path, allow_pickle=False) as z:
            name = str(z["name"])
            probs = np.asarray(z["probs"], np.float64)
            labels = np.asarray(z["labels"])
            uid = np.asarray(z["uid"])
        if name not in merged:
            merged[name] = [probs, labels, uid, 1]
        else:
            acc = merged[name]
            if not np.array_equal(acc[2], uid):
                raise SystemExit(f"uid mismatch for dataset {name!r} "
                                 f"in {path}")
            acc[0] = acc[0] + probs
            acc[3] += 1
    return {k: (v[0] / v[3], v[1], v[2]) for k, v in merged.items()}


def calc_threshold(probs, labels):
    """Best binary decision threshold on P(class 1) in steps of 0.01
    (reference calc_threshold, tasks/ensemble_classifier.py:47-56)."""
    best_t, best_acc = 0.0, -1.0
    for i in range(100):
        t = i / 100.0
        pred = (probs[:, -1] >= t).astype(labels.dtype)
        acc = float((pred == labels).mean())
        if acc > best_acc:
            best_t, best_acc = t, acc
    return best_t


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--paths", required=True, nargs="+",
                   help=".npz prediction files to ensemble")
    p.add_argument("--eval", action="store_true",
                   help="report accuracy against the stored labels")
    p.add_argument("--outdir", default="",
                   help="write <outdir>/<dataset>/predictions.tsv")
    p.add_argument("--calc-threshold", action="store_true",
                   help="calibrate a binary threshold per dataset (2-class)")
    p.add_argument("--threshold", type=float, nargs="+", default=None)
    p.add_argument("--labels", nargs="+", default=None,
                   help="label names for the tsv output")
    args = p.parse_args(argv)

    datasets = load_predictions(args.paths)
    out = {}
    correct = total = 0
    thresholds = list(args.threshold or [])
    for i, (name, (probs, labels, uid)) in enumerate(sorted(datasets.items())):
        if args.calc_threshold:
            if probs.shape[1] != 2:
                raise SystemExit("--calc-threshold needs 2-class predictions")
            t = calc_threshold(probs, labels)
            print(f"{name}: threshold {t:.2f}")
        elif thresholds:
            t = thresholds[min(i, len(thresholds) - 1)]
        else:
            t = None
        if t is None:
            pred = probs.argmax(-1)
        else:
            pred = (probs[:, -1] >= t).astype(np.int64)
        if args.eval:
            acc = float((pred == labels).mean()) if len(labels) else 0.0
            correct += int((pred == labels).sum())
            total += len(labels)
            out[name] = round(acc, 4)
            print(f"{name}: accuracy {acc:.4f} over {len(labels)} "
                  f"({len(args.paths)} runs)")
        if args.outdir:
            names = args.labels or [str(c) for c in range(probs.shape[1])]
            d = os.path.join(args.outdir, name)
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, "predictions.tsv"), "w") as f:
                f.write("id\tlabel\n")
                for u, c in zip(uid.tolist(), pred.tolist()):
                    f.write(f"{u}\t{names[c]}\n")
    if args.eval and total:
        out["overall"] = round(correct / total, 4)
        print(f"overall: {out['overall']:.4f}")
    return out


if __name__ == "__main__":
    main()
