#!/usr/bin/env python
"""Corpus cleaning + near-duplicate detection (openwebtext pipeline).

Reference surface: tools/openwebtext/ (~1500 LoC: cleanup_dataset.py,
find_duplicates.py LSH over url/content, group_duplicate_url.py,
filter_ngrams/blacklist). One tool, three subcommands over jsonl docs
({"text": ..., "url": ...}):

  cleanup   drop short/empty docs, normalize unicode+whitespace, drop
            exact-duplicate URLs, optional blacklist filter
  dedup     MinHash-LSH near-duplicate grouping over word shingles;
            keeps the longest doc of each group
  stats     token/doc counts

  python tools/corpus_cleanup.py cleanup --input raw.jsonl --output clean.jsonl
  python tools/corpus_cleanup.py dedup --input clean.jsonl --output uniq.jsonl
"""
import argparse
import hashlib
import json
import re
import sys
import unicodedata
from collections import defaultdict
from typing import Iterable, List, Set, Tuple


def _normalize_text(text: str) -> str:
    text = unicodedata.normalize("NFC", text)
    text = re.sub(r"[ \t]+", " ", text)
    text = re.sub(r"\n{3,}", "\n\n", text)
    return text.strip()


def iter_docs(path: str) -> Iterable[dict]:
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                yield json.loads(line)


def cleanup_docs(docs: Iterable[dict], *, min_words: int = 128,
                 blacklist: Set[str] = frozenset()) -> Iterable[dict]:
    """cleanup_dataset.py behavior: length filter, unicode fix, exact-URL
    dedup, word blacklist."""
    seen_urls = set()
    for doc in docs:
        text = _normalize_text(doc.get("text", ""))
        if not text:
            continue
        words = text.split()
        if len(words) < min_words:
            continue
        url = doc.get("url")
        if url:
            if url in seen_urls:
                continue
            seen_urls.add(url)
        if blacklist and any(w.lower() in blacklist for w in words):
            continue
        yield {**doc, "text": text}


def _shingles(text: str, n: int = 5) -> List[str]:
    words = re.findall(r"\w+", text.lower())
    if len(words) < n:
        return [" ".join(words)] if words else []
    return [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]


def _minhash(shingles: List[str], num_perm: int) -> List[int]:
    """num_perm independent min-hashes via salted sha1 (deterministic,
    dependency-free; the reference uses the LSH package's MinHash)."""
    sigs = [2 ** 64] * num_perm
    for sh in shingles:
        base = hashlib.sha1(sh.encode()).digest()
        for p in range(num_perm):
            h = int.from_bytes(
                hashlib.blake2b(base, digest_size=8,
                                salt=p.to_bytes(8, "little")).digest(),
                "little")
            if h < sigs[p]:
                sigs[p] = h
    return sigs


def find_near_duplicates(texts: List[str], *, num_perm: int = 32,
                         bands: int = 8, jaccard: float = 0.7
                         ) -> List[Tuple[int, int]]:
    """MinHash-LSH candidate pairs verified by signature similarity
    (find_duplicates.py). Returns (i, j) duplicate pairs, i < j."""
    rows = num_perm // bands
    sigs = [_minhash(_shingles(t), num_perm) for t in texts]
    buckets = defaultdict(list)
    for i, sig in enumerate(sigs):
        for b in range(bands):
            key = (b, tuple(sig[b * rows:(b + 1) * rows]))
            buckets[key].append(i)
    pairs = set()
    for members in buckets.values():
        for ai in range(len(members)):
            for bi in range(ai + 1, len(members)):
                i, j = members[ai], members[bi]
                sim = sum(x == y for x, y in zip(sigs[i], sigs[j])) / num_perm
                if sim >= jaccard:
                    pairs.add((min(i, j), max(i, j)))
    return sorted(pairs)


def dedup_docs(docs: List[dict], **kw) -> List[dict]:
    """Group near-duplicates (union-find over LSH pairs); keep the longest
    doc per group (group_duplicate_url.py policy)."""
    texts = [d.get("text", "") for d in docs]
    parent = list(range(len(docs)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, j in find_near_duplicates(texts, **kw):
        parent[find(j)] = find(i)
    groups = defaultdict(list)
    for i in range(len(docs)):
        groups[find(i)].append(i)
    keep = []
    for members in groups.values():
        keep.append(max(members, key=lambda i: len(texts[i])))
    return [docs[i] for i in sorted(keep)]


def main(argv=None):
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("cleanup", "dedup", "stats"):
        sp = sub.add_parser(name)
        sp.add_argument("--input", required=True)
        if name != "stats":
            sp.add_argument("--output", required=True)
        if name == "cleanup":
            sp.add_argument("--min-words", type=int, default=128)
            sp.add_argument("--blacklist-file", default=None)
        if name == "dedup":
            sp.add_argument("--jaccard", type=float, default=0.7)
    a = ap.parse_args(argv)

    if a.cmd == "cleanup":
        blacklist = set()
        if a.blacklist_file:
            with open(a.blacklist_file) as f:
                blacklist = {w.strip().lower() for w in f if w.strip()}
        n = 0
        with open(a.output, "w", encoding="utf-8") as out:
            for doc in cleanup_docs(iter_docs(a.input),
                                    min_words=a.min_words,
                                    blacklist=blacklist):
                out.write(json.dumps(doc) + "\n")
                n += 1
        print(f"kept {n} docs", flush=True)
    elif a.cmd == "dedup":
        docs = list(iter_docs(a.input))
        kept = dedup_docs(docs, jaccard=a.jaccard)
        with open(a.output, "w", encoding="utf-8") as out:
            for doc in kept:
                out.write(json.dumps(doc) + "\n")
        print(f"{len(docs)} -> {len(kept)} docs after dedup", flush=True)
    else:
        docs = list(iter_docs(a.input))
        words = sum(len(d.get("text", "").split()) for d in docs)
        print(json.dumps({"docs": len(docs), "words": words}))


if __name__ == "__main__":
    main()
