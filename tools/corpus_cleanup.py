#!/usr/bin/env python
"""Corpus cleaning + near-duplicate detection (openwebtext pipeline).

Reference surface: tools/openwebtext/ (~1500 LoC: cleanup_dataset.py,
find_duplicates.py LSH over url/content, group_duplicate_url.py,
filter_ngrams.py, blacklist_urls.py). One tool, four subcommands over
jsonl docs ({"text": ..., "url": ...}):

  cleanup        drop short/empty docs, normalize unicode+whitespace, drop
                 exact-duplicate URLs, optional blacklist filter
  dedup          MinHash-LSH near-duplicate grouping over word shingles;
                 keeps the longest doc of each group
  filter-ngrams  downstream-eval contamination scrub (filter_ngrams.py):
                 build 13-gram set from task files, drop the ngrams that
                 are frequent in the corpus (common phrases, --key-threshold),
                 then split every doc around remaining matches — splits
                 shorter than --filter-text-char-len or docs bursting into
                 more than --splits-count pieces are dropped
  stats          token/doc counts

  python tools/corpus_cleanup.py cleanup --input raw.jsonl --output clean.jsonl
  python tools/corpus_cleanup.py dedup --input clean.jsonl --output uniq.jsonl
  python tools/corpus_cleanup.py filter-ngrams --input uniq.jsonl \
      --task-files lambada.jsonl --output train.jsonl
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


# --------------------- downstream-task ngram filtering ---------------------
# filter_ngrams.py semantics: contamination = a (rare) task ngram appearing
# verbatim in a training doc. The reference scans max-size windows plus the
# lower ngram lengths present in the dictionary; scanning every position for
# every dictionary length (done here) is a clean superset of that order.

def _words_positions(text: str) -> Tuple[List[str], List[int]]:
    """Lowercased \\w+ tokens + their char offsets (filter_ngrams.get_words)."""
    words, pos = [], []
    for m in re.finditer(r"\w+", text.lower()):
        words.append(m.group(0))
        pos.append(m.start())
    return words, pos


def build_task_ngrams(texts: Iterable[str], *, max_n: int = 13,
                      min_n: int = 8) -> Set[str]:
    """All max_n-grams of each task text (whole text when min_n <= len <
    max_n) — filter_ngrams.compute_ngrams_insert_dict."""
    ngrams = set()
    for text in texts:
        words, _ = _words_positions(text)
        if len(words) < min_n:
            continue
        if len(words) < max_n:
            ngrams.add(" ".join(words))
        for i in range(len(words) - max_n + 1):
            ngrams.add(" ".join(words[i:i + max_n]))
    return ngrams


def _first_match(text: str, ngrams: Set[str], lengths: List[int]):
    """(seq, char_position) of the first dictionary hit, or (None, -1)."""
    words, pos = _words_positions(text)
    for i in range(len(words)):
        for n in lengths:
            if i + n > len(words):
                continue
            seq = " ".join(words[i:i + n])
            if seq in ngrams:
                return seq, pos[i]
    return None, -1


def _split_around(text: str, p: int, seq: str, margin: int):
    """filter_ngrams.split_text: cut `margin` chars each side of the match,
    then back off to sentence punctuation."""
    punct = ".!?"
    i = p - margin
    first = ""
    while i > 0 and text[i] not in punct:
        i -= 1
    if i > 0:
        first = text[:i + 1]
    j = p + len(seq) + margin
    second = ""
    while j < len(text) and text[j] not in punct:
        j += 1
    if j + 1 < len(text):
        second = text[j + 1:]
    return first, second


def ngram_free_splits(text: str, ngrams: Set[str], lengths: List[int], *,
                      margin: int = 200, min_chars: int = 200) -> List[str]:
    """Contamination-free pieces of `text` (filter_ngrams.free_ngram clean
    mode): splits around each match; split pieces below min_chars dropped,
    a fully-clean remainder kept regardless of length."""
    buf, free = [text], []
    while buf:
        t = buf.pop(0)
        seq, p = _first_match(t, ngrams, lengths)
        if seq is None:
            free.append(t)
            continue
        first, second = _split_around(t, p, seq, margin)
        if len(first) > min_chars:
            free.append(first)
        if len(second) > min_chars:
            buf.append(second)
    return free


def count_ngram_matches(texts: Iterable[str], ngrams: Set[str],
                        lengths: List[int]) -> dict:
    """Corpus frequency of each task ngram (free_ngram freq-only mode:
    count the first match, resume scanning after it)."""
    freq = {}
    for text in texts:
        t = text
        while True:
            seq, p = _first_match(t, ngrams, lengths)
            if seq is None:
                break
            freq[seq] = freq.get(seq, 0) + 1
            t = t[p + len(seq) + 1:]
    return freq


def filter_ngrams_run(a) -> None:
    task_texts = []
    for tf in a.task_files:
        task_texts += [d.get(a.task_key, "") for d in iter_docs(tf)]
    ngrams = build_task_ngrams(task_texts, max_n=a.max_ngram_size,
                               min_n=a.min_ngram_size)
    lengths = sorted({len(k.split()) for k in ngrams})
    print(f"task ngrams: {len(ngrams)} (lengths {lengths})", flush=True)
    # pass 1: drop ngrams frequent in the corpus — common phrases, not
    # contamination (get_ngrams_below_threshold)
    if a.key_threshold > 0:
        freq = count_ngram_matches(
            (d.get(a.key, "") for d in iter_docs(a.input)), ngrams, lengths)
        ngrams = {k for k in ngrams if freq.get(k, 0) < a.key_threshold}
        lengths = sorted({len(k.split()) for k in ngrams})
        print(f"rare ngrams kept: {len(ngrams)}", flush=True)
    # pass 2: split/scrub (clean_ngrams_below_threshold)
    docs = splitted = dropped = written = 0
    with open(a.output, "w", encoding="utf-8") as out:
        for doc in iter_docs(a.input):
            docs += 1
            pieces = ngram_free_splits(
                doc.get(a.key, ""), ngrams, lengths,
                margin=a.remove_char_each_side,
                min_chars=a.filter_text_char_len)
            if len(pieces) > a.splits_count or not pieces:
                dropped += 1
                continue
            if len(pieces) > 1:
                splitted += 1
            for i, piece in enumerate(pieces):
                d = dict(doc)
                d[a.key] = piece
                if len(pieces) > 1:
                    d["split_id"] = f"{doc.get('split_id', docs)}-{i:04d}"
                out.write(json.dumps(d, ensure_ascii=False) + "\n")
                written += 1
    print(json.dumps({"docs": docs, "splitted": splitted,
                      "dropped": dropped, "written": written}), flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    fp = sub.add_parser("filter-ngrams")
    fp.add_argument("--input", required=True)
    fp.add_argument("--output", required=True)
    fp.add_argument("--task-files", nargs="+", required=True,
                    help="jsonl files of downstream-task texts (e.g. "
                         "lambada) whose ngrams must not leak into training")
    fp.add_argument("--key", default="text")
    fp.add_argument("--task-key", default="text")
    fp.add_argument("--max-ngram-size", type=int, default=13)
    fp.add_argument("--min-ngram-size", type=int, default=8)
    fp.add_argument("--key-threshold", type=int, default=10,
                    help="drop task ngrams appearing at least this often "
                         "in the corpus (0 disables the frequency pass)")
    fp.add_argument("--filter-text-char-len", type=int, default=200)
    fp.add_argument("--remove-char-each-side", type=int, default=200)
    fp.add_argument("--splits-count", type=int, default=10)
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

    if a.cmd == "filter-ngrams":
        filter_ngrams_run(a)
    elif a.cmd == "cleanup":
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
