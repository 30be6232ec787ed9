"""openwebtext-style cleanup/dedup tests (reference: tools/openwebtext/)."""
import json
import subprocess
import sys

sys.path.insert(0, "/root/repo/tools")
from corpus_cleanup import cleanup_docs, dedup_docs, find_near_duplicates


def _doc(text, url=None):
    d = {"text": text}
    if url:
        d["url"] = url
    return d


def test_cleanup_filters():
    long_text = "word " * 130
    docs = [
        _doc(long_text, "http://a"),
        _doc(long_text, "http://a"),          # dup url
        _doc("too short"),
        _doc("", "http://b"),
        _doc(long_text + "\n\n\n\n extra  spaces", "http://c"),
    ]
    kept = list(cleanup_docs(docs, min_words=100))
    assert len(kept) == 2
    assert "\n\n\n" not in kept[1]["text"] and "  " not in kept[1]["text"]


def test_cleanup_blacklist():
    docs = [_doc("fine " * 130), _doc(("fine " * 130) + "verboten")]
    kept = list(cleanup_docs(docs, min_words=100, blacklist={"verboten"}))
    assert len(kept) == 1


def test_near_duplicate_detection():
    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep dark forest to hide from hunters " * 6)
    near = base + " with a short extra tail appended at the very end"
    different = ("completely unrelated content about tensor processing "
                 "units and systolic arrays computing large matrix "
                 "products in bfloat16 precision every cycle " * 6)
    pairs = find_near_duplicates([base, near, different])
    assert (0, 1) in pairs
    assert all(2 not in p for p in pairs)

    docs = [_doc(base), _doc(near), _doc(different)]
    kept = dedup_docs(docs)
    assert len(kept) == 2
    texts = [d["text"] for d in kept]
    assert different in texts
    assert near in texts                       # longest of the pair kept


def test_cli_roundtrip(tmp_path):
    raw = tmp_path / "raw.jsonl"
    body = " ".join(f"word{k}" for k in range(140))
    raw.write_text("\n".join(json.dumps(
        {"text": f"{body} doc {i}", "url": f"u{i % 2}"})
        for i in range(4)))
    clean = tmp_path / "clean.jsonl"
    r = subprocess.run(
        [sys.executable, "tools/corpus_cleanup.py", "cleanup", "--input",
         str(raw), "--output", str(clean), "--min-words", "100"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    assert len(clean.read_text().splitlines()) == 2    # url dedup
    uniq = tmp_path / "uniq.jsonl"
    r = subprocess.run(
        [sys.executable, "tools/corpus_cleanup.py", "dedup", "--input",
         str(clean), "--output", str(uniq)],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    assert len(uniq.read_text().splitlines()) == 1     # near-dup collapsed


def test_filter_ngrams_splits_and_threshold():
    from corpus_cleanup import (build_task_ngrams, ngram_free_splits,
                                count_ngram_matches)
    task = ("the quick brown fox jumps over the lazy dog near the old "
            "river bank")  # 14 words -> two 13-grams
    ngrams = build_task_ngrams([task], max_n=13, min_n=8)
    assert len(ngrams) == 2 and all(len(k.split()) == 13 for k in ngrams)
    lengths = [13]

    # filler needs internal sentence punctuation: the splitter backs off
    # from the match to the previous/next sentence boundary
    filler = ". ".join(" ".join(f"tok{i}" for i in range(j, j + 20))
                       for j in range(0, 80, 20))
    contaminated = f"{filler}. {task}! {filler}."
    pieces = ngram_free_splits(contaminated, ngrams, lengths,
                               margin=5, min_chars=50)
    assert len(pieces) == 2
    joined = " ".join(pieces)
    assert "quick brown fox" not in joined
    assert "tok0" in pieces[0] and "tok79" in pieces[1]

    clean = f"{filler}. totally unrelated text. {filler}."
    assert ngram_free_splits(clean, ngrams, lengths) == [clean]

    # frequency pass: the ngram appears twice in this corpus
    freq = count_ngram_matches([contaminated, contaminated], ngrams, lengths)
    assert sum(freq.values()) == 2


def test_filter_ngrams_cli(tmp_path):
    task_words = " ".join(f"answer{i}" for i in range(13))
    tasks = tmp_path / "task.jsonl"
    tasks.write_text(json.dumps({"text": task_words}) + "\n")
    filler = ". ".join(" ".join(f"w{i}" for i in range(j, j + 30))
                       for j in range(0, 120, 30))
    corpus = tmp_path / "corpus.jsonl"
    docs = [{"text": f"{filler}. {task_words}. {filler}.", "url": "a"},
            {"text": f"{filler} clean doc", "url": "b"}]
    corpus.write_text("\n".join(json.dumps(d) for d in docs))
    out = tmp_path / "out.jsonl"
    r = subprocess.run(
        [sys.executable, "tools/corpus_cleanup.py", "filter-ngrams",
         "--input", str(corpus), "--output", str(out),
         "--task-files", str(tasks), "--key-threshold", "10",
         "--filter-text-char-len", "50", "--remove-char-each-side", "5"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    lines = [json.loads(x) for x in out.read_text().splitlines()]
    # contaminated doc split into 2 clean pieces + the clean doc untouched
    assert len(lines) == 3
    assert sum("split_id" in d for d in lines) == 2
    assert all("answer3" not in d["text"] for d in lines)
