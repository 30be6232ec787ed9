"""MSDP preprocessing chain (reference tasks/msdp/preprocessing.py):
WoW/WoI raw -> tsv -> knowledge/response prompt files -> prepare-input,
feeding tasks/msdp.py's prompt builders."""
import json

import numpy as np


def _wow_raw(tmp_path):
    dialog = [
        {"speaker": "0_Apprentice", "text": "i love rock climbing"},
        {"speaker": "1_Wizard", "text": "Me too! It is a great sport",
         "checked_sentence": {"s1": "Rock climbing is a sport where "
                                    "participants climb up rock walls."},
         "checked_passage": {"p1": "Rock climbing"}},
        {"speaker": "0_Apprentice", "text": "how do I start?"},
        {"speaker": "1_Wizard", "text": "Find a local climbing gym.",
         "checked_sentence": {}, "checked_passage": {}},
    ]
    raw = tmp_path / "wow.json"
    raw.write_text(json.dumps(
        [{"chosen_topic": "Rock climbing", "dialog": dialog}]))
    return str(raw)


def test_process_wow_and_prompt_chain(tmp_path):
    from tasks.msdp_preprocess import (
        process_wow, knowledge_prompts, response_prompts, prepare_input)
    raw = _wow_raw(tmp_path)
    proc = tmp_path / "proc.tsv"
    knwl = tmp_path / "knwl.txt"
    resp = tmp_path / "resp.txt"
    n = process_wow(raw, str(proc), str(knwl), str(resp))
    assert n == 2
    lines = proc.read_text().splitlines()
    topic, ctx, knowledge, response = lines[0].split("\t")
    assert topic == "Rock climbing"
    assert "[SEP]" not in ctx  # single-turn context for the first wizard turn
    assert knowledge.startswith("Rock climbing is a sport")
    # second wizard turn: no checked sentence -> no_passages_used, context
    # accumulated with [SEP]
    t2, ctx2, k2, r2 = lines[1].split("\t")
    assert k2 == "no_passages_used" and " [SEP] " in ctx2
    assert len(knwl.read_text().splitlines()) == 2
    assert "climbing gym" in resp.read_text().splitlines()[1]

    # knowledge prompts: same file as train and test -> same-topic branch
    prompts = tmp_path / "kp.jsonl"
    n = knowledge_prompts(str(proc), str(proc), "wow_seen", str(prompts))
    assert n == 2
    d = json.loads(prompts.read_text().splitlines()[0])
    key = next(iter(d))
    assert key.startswith("Rock climbing ")
    assert all(" => " in ex for ex in d[key])

    # the output feeds tasks/msdp.py's reader/builder directly
    from tasks.msdp import read_prompts, build_prompt
    p = read_prompts(str(prompts), "knowledge")
    full = build_prompt(lines[0], "knowledge", p)
    assert full.endswith("=>") and "( i love rock climbing" in full

    # response prompts: the overlap filter passes a response that quotes
    # >=10 knowledge tokens
    # 11 of 17 response tokens quote the knowledge: inside the 60-90% band
    quoted = ("Rock climbing is a sport where participants climb up rock "
              "walls yes and honestly quite fun")
    tsv2 = tmp_path / "train2.tsv"
    tsv2.write_text("\t".join((
        "Rock climbing", "ctx", "Rock climbing is a sport where "
        "participants climb up rock walls.", quoted)) + "\n"
        + lines[1] + "\n")
    rp = tmp_path / "rp.txt"
    n = response_prompts(str(tsv2), str(rp))
    assert n == 1
    assert rp.read_text().startswith("Topic: Rock climbing. User says:")

    # prepare-input: generated knowledge replaces the golden column
    gen = tmp_path / "gen.txt"
    gen.write_text("generated knowledge one<|endoftext|>\ngen two\n")
    out = tmp_path / "test_in.tsv"
    n = prepare_input(str(proc), str(gen), str(out))
    assert n == 2
    assert out.read_text().splitlines()[0].split("\t")[2] == \
        "generated knowledge one"


def test_process_woi(tmp_path):
    from tasks.msdp_preprocess import process_woi
    hist = [
        {"action": "Apprentice => Wizard", "text": "tell me about pasta"},
        {"action": "Wizard => SearchAgent", "text": "pasta"},
        {"action": "SearchAgent => Wizard", "text": "(results)"},
        {"action": "Wizard => Apprentice", "text": "Pasta is Italian.",
         "context": {"contents": [
             {"content": ["Pasta is a staple food of Italian cuisine.",
                          "Unrelated sentence."]}],
             "selected_contents": [[False], [True, False]]}},
    ]
    raw = tmp_path / "woi.jsonl"
    raw.write_text(json.dumps({"42": {"dialog_history": hist}}) + "\n")
    proc = tmp_path / "woi.tsv"
    n = process_woi(str(raw), str(proc))
    assert n == 1
    topic, ctx, knowledge, response = \
        proc.read_text().splitlines()[0].split("\t")
    assert topic == "pasta" and response == "Pasta is Italian."
    assert knowledge == "Pasta is a staple food of Italian cuisine."
    assert ctx == "tell me about pasta"


def test_hash_embed_similarity():
    from tasks.msdp_preprocess import hash_embed
    e = hash_embed(["rock climbing is fun", "rock climbing is great",
                    "quantum physics homework"])
    np.testing.assert_allclose(np.linalg.norm(e, axis=1), 1.0, rtol=1e-5)
    assert e[0] @ e[1] > e[0] @ e[2]
