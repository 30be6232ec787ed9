"""MSDP dialogue-prompting and ORQA retrieval-QA task harnesses
(reference tasks/msdp/, tasks/orqa/)."""
import json

import jax
import numpy as np
import pytest

from tasks import msdp, orqa


class TestMsdpMetrics:
    def test_normalize(self):
        assert msdp.normalize_answer("The Cat, sat!") == "cat sat"

    def test_f1_perfect(self):
        p, r, f1 = msdp.f1_score("the cat sat", "The cat sat.")
        assert f1 == pytest.approx(1.0)

    def test_f1_partial(self):
        p, r, f1 = msdp.f1_score("cat dog", "cat bird fish")
        assert p == pytest.approx(0.5)
        assert r == pytest.approx(1 / 3)

    def test_empty_answer_skipped(self):
        assert msdp.f1_score("anything", "") is None

    def test_evaluate_f1_files(self, tmp_path):
        g = tmp_path / "guess.txt"
        a = tmp_path / "answer.txt"
        g.write_text("the cat sat<|endoftext|>\nhello world\nx\n")
        a.write_text("the cat sat\nno_passages_used\ny\n")
        m = msdp.evaluate_f1(str(g), str(a))
        # pair 2 skipped (no_passages_used); pairs: f1=1.0 and f1=0.0
        assert m["f1"] == pytest.approx(0.5)


class TestMsdpPrompting:
    def test_knowledge_prompt_roundtrip(self, tmp_path):
        pf = tmp_path / "prompts.jsonl"
        pf.write_text(json.dumps(
            {"music I love songs": ["( do you like music ) music => "
                                    "Music is an art form."]}) + "\n")
        prompts = msdp.read_prompts(str(pf), "knowledge", 10)
        line = "music\thi [SEP] I love songs\tsome knowledge"
        full = msdp.build_prompt(line, "knowledge", prompts)
        assert full.endswith("( I love songs ) music =>")
        assert "Music is an art form." in full

    def test_response_prompt(self, tmp_path):
        pf = tmp_path / "resp.txt"
        pf.write_text("example one\nexample two\nexample three\n")
        prompt = msdp.read_prompts(str(pf), "response", 2)
        assert "example one" in prompt and "example three" not in prompt
        line = "music\thello [SEP] play me a song\tMusic is sound."
        full = msdp.build_prompt(line, "response", prompt)
        assert full.endswith("System replies:")
        assert "We know that: Music is sound." in full

    def test_generate_samples_with_stub(self, tmp_path):
        pf = tmp_path / "resp.txt"
        pf.write_text("demo \n")
        inp = tmp_path / "in.tsv"
        inp.write_text("topic\ta [SEP] b\tknowledge text\n")
        out = tmp_path / "out.txt"

        def fake_gen(prompt, max_tokens):
            return prompt + " generated reply\nsecond line"

        n = msdp.generate_samples(str(inp), str(out),
                                  prompt_file=str(pf),
                                  prompt_type="response",
                                  generate_fn=fake_gen)
        assert n == 1
        assert out.read_text().strip() == "generated reply"


class TestOrqaMatching:
    DOCS = {
        "d1": ("Paris is the capital of France.", "France"),
        "d2": ("Berlin is the capital of Germany.", "Germany"),
        "d3": ("The Nile is a river in Africa.", "Nile"),
    }

    def test_has_answer_string(self):
        assert orqa.has_answer(["the capital"], self.DOCS["d1"][0])
        assert not orqa.has_answer(["Madrid"], self.DOCS["d1"][0])

    def test_has_answer_regex(self):
        assert orqa.has_answer([r"cap\w+al"], self.DOCS["d1"][0],
                               match_type="regex")

    def test_calculate_matches_topk(self):
        answers = [["Paris"], ["Germany"]]
        closest = [(["d3", "d1"], [0.9, 0.8]),
                   (["d2", "d3"], [0.9, 0.8])]
        top_k, hits = orqa.calculate_matches(self.DOCS, answers, closest)
        # q1 hits at rank 2, q2 at rank 1 -> top1=1, top2=2
        assert top_k == [1, 2]
        assert hits[0] == [False, True]

    def test_load_nq_tsv(self, tmp_path):
        f = tmp_path / "nq.tsv"
        f.write_text("question\tanswer\n"
                     "who wrote hamlet?\t['Shakespeare', 'W. Shakespeare']\n")
        qs, ans = orqa.load_nq_tsv(str(f))
        assert qs == ["who wrote hamlet?"]
        assert ans == [["Shakespeare", "W. Shakespeare"]]


@pytest.fixture(scope="module")
def tiny_biencoder():
    from megatron_clip_tpu.models.bert import BertCfg
    from megatron_clip_tpu.models.biencoder import (
        BiencoderCfg, init_biencoder)
    cfg = BiencoderCfg(bert=BertCfg(num_layers=2, hidden_size=32,
                                    num_heads=2, vocab_size=512,
                                    seq_length=16, add_binary_head=False),
                       projection_dim=16)
    params = init_biencoder(jax.random.PRNGKey(0), cfg)
    return params, cfg


def _toy_tokenize(text):
    return [hash(w) % 500 + 1 for w in text.lower().split()][:16]


class TestOrqaEndToEnd:
    def test_evaluator_pipeline(self, tiny_biencoder):
        params, cfg = tiny_biencoder
        docs = TestOrqaMatching.DOCS
        ev = orqa.ORQAEvaluator(params, cfg, _toy_tokenize,
                                seq_len=16).build_index(docs)
        res = ev.evaluate(["capital of France", "river in Africa"],
                          [["Paris"], ["Nile"]], docs, top_k=3)
        assert res.num_questions == 2
        # with top_k == corpus size every answer is found somewhere
        assert res.hit_rate(3) == pytest.approx(1.0)
        assert 0.0 <= res.hit_rate(1) <= 1.0

    def test_finetune_improves_in_batch_accuracy(self, tiny_biencoder):
        params, cfg = tiny_biencoder
        words = ["alpha", "beta", "gamma", "delta", "eps", "zeta",
                 "eta", "theta"]
        # one pair per word: every in-batch negative is a genuinely
        # different document, so top-1 accuracy can reach 1.0
        pairs = [(f"question about {w}",
                  f"document that explains {w} fully", [w]) for w in words]
        new_params, acc = orqa.finetune_biencoder(
            params, cfg, pairs, _toy_tokenize, seq_len=16, batch_size=8,
            epochs=60, lr=1e-3)
        assert acc > 0.8, f"in-batch accuracy should train up, got {acc}"

    def test_load_dpr_json(self, tmp_path):
        f = tmp_path / "nq.json"
        f.write_text(json.dumps([
            {"question": "q1", "answers": ["a1"],
             "positive_ctxs": [{"title": "T", "text": "body"}]},
            {"question": "q2", "answers": [], "positive_ctxs": []},
        ]))
        pairs = orqa.load_dpr_json(str(f))
        assert pairs == [("q1", "T body", ["a1"])]
