"""SGEAT detoxify pipeline pieces (reference examples/detxoify_lm):
annotate -> filter chain on jsonl, offline lexicon scorer."""
import json
import subprocess
import sys


def _run(script, *args):
    r = subprocess.run([sys.executable, f"examples/detoxify_lm/{script}",
                        *args], capture_output=True, text=True,
                       cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    return r.stdout


def test_annotate_then_filter(tmp_path):
    gens = tmp_path / "gens.jsonl"
    docs = [{"text": "a lovely walk in the park with friends"},
            {"text": "you stupid idiot I hate this trash"},
            {"text": "the weather report says sunshine tomorrow"},
            {"text": "what a dumb ugly pathetic loser"}]
    gens.write_text("\n".join(json.dumps(d) for d in docs))

    scored = tmp_path / "scored.jsonl"
    out = _run("annotate.py", "--data-path", str(gens),
               "--out-path", str(scored))
    assert json.loads(out.splitlines()[-1])["annotated"] == 4
    recs = [json.loads(x) for x in scored.read_text().splitlines()]
    assert all("toxicity" in r["score"] for r in recs)
    assert recs[1]["score"]["toxicity"] > recs[0]["score"]["toxicity"]

    kept = tmp_path / "kept.jsonl"
    _run("filter_selfgeneration.py", "--data-path", str(scored),
         "--out-path", str(kept), "--keep-fraction", "0.5")
    kept_texts = [json.loads(x)["text"]
                  for x in kept.read_text().splitlines()]
    assert len(kept_texts) == 2
    assert all("idiot" not in t and "dumb" not in t for t in kept_texts)


def test_perspective_scorer_gated(monkeypatch):
    sys.path.insert(0, "/root/repo/examples/detoxify_lm")
    import annotate
    monkeypatch.delenv("PERSPECTIVE_API_KEY", raising=False)
    try:
        annotate.PerspectiveApiScorer()
        assert False, "should exit without an API key"
    except SystemExit as e:
        assert "PERSPECTIVE_API_KEY" in str(e)
