#!/usr/bin/env python
"""MSDP data preprocessing — Wizard-of-Wikipedia / Wizard-of-Internet.

Capability parity with the reference's tasks/msdp/preprocessing.py (582 LoC):

  process-wow      WoW json -> `topic \\t ctx [SEP] ... \\t knowledge \\t
                   response` tsv (+ knowledge/response reference files)
  process-woi      WoI jsonl (dialog_history action stream) -> same tsv
  knowledge-prompts  per-test-sample few-shot prompt selection by embedding
                   similarity over the train database
                   (prompt_selection_for_knowledge_generation) ->
                   JSONL {topic+" "+last_turn: [example, ...]} consumed by
                   tasks/msdp.py read_prompts("knowledge")
  response-prompts  knowledge-grounded-ness filtered + shuffled 20-line
                   prompt file (prompt_selection_for_response_generation)
  prepare-input    splice generated knowledge into the test tsv for the
                   response stage (prepare_input_for_response_generation)

Divergences from the reference, on purpose:
  - the similarity encoder is pluggable; the default is a deterministic
    hashed bag-of-words embedding (offline, dependency-free) instead of a
    downloaded DPR encoder — inject `encode_fn` for a learned encoder
    (e.g. the ICT biencoder, tasks/orqa.ORQAEvaluator._encode).
  - tokenization uses a \\w+/punct regex instead of nltk.word_tokenize.
  - the no-train-topic branch picks the MOST similar examples (the paper's
    intent; the reference iterates torch.sort's ascending order, taking the
    least similar — kept here as a note, not a behavior).
"""
import argparse
import json
import re
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

_TOKEN_RE = re.compile(r"\w+|[^\w\s]")


def word_tokenize(text: str) -> List[str]:
    return _TOKEN_RE.findall(text)


def _clean(s: str) -> str:
    return s.replace("\n", "").replace("\r", "").replace("\t", "")


def _end_punct(text: str) -> str:
    return text if text.endswith(("?", ".", "!")) else text + "."


# ------------------------------ wow / woi ----------------------------------

def process_wow(raw_file: str, processed_file: str,
                knwl_ref_file: Optional[str] = None,
                resp_ref_file: Optional[str] = None) -> int:
    """preprocessing.process_wow_dataset: every wizard turn with its checked
    knowledge sentence becomes one tsv sample; apprentice turns only extend
    the context."""
    with open(raw_file) as f:
        dialog_data = json.load(f)
    n = 0
    fknwl = open(knwl_ref_file, "w") if knwl_ref_file else None
    fresp = open(resp_ref_file, "w") if resp_ref_file else None
    with open(processed_file, "w") as fproc:
        for sample in dialog_data:
            turn_list: List[str] = []
            for j, turn in enumerate(sample["dialog"]):
                text = _end_punct(turn["text"])
                if j == 0:
                    turn_list.append(text)
                    continue
                if "wizard" in turn["speaker"].lower():
                    sent = list(turn["checked_sentence"].values())
                    passage = list(turn["checked_passage"].values())
                    knowledge = sent[0] if sent else "no_passages_used"
                    topic = passage[0] if len(passage) == 1 \
                        else sample["chosen_topic"]
                    fproc.write("\t".join(map(_clean, (
                        topic, " [SEP] ".join(turn_list), knowledge,
                        text))) + "\n")
                    n += 1
                    if fknwl:
                        fknwl.write(_clean(knowledge) + "\n")
                    if fresp:
                        fresp.write(" ".join(word_tokenize(_clean(text)))
                                    + "\n")
                    turn_list.append(text)
                else:
                    turn_list.append(text)
    for f in (fknwl, fresp):
        if f:
            f.close()
    return n


def process_woi(raw_file: str, processed_file: str,
                knwl_ref_file: Optional[str] = None,
                resp_ref_file: Optional[str] = None) -> int:
    """preprocessing.process_woi_dataset: walk the action stream; the last
    SearchAgent query is the topic, the selected content the knowledge."""
    n = 0
    fknwl = open(knwl_ref_file, "w") if knwl_ref_file else None
    fresp = open(resp_ref_file, "w") if resp_ref_file else None
    with open(processed_file, "w") as fproc, open(raw_file) as fr:
        for line in fr:
            line = line.strip()
            if not line:
                continue
            item = next(iter(json.loads(line).values()))
            turn_list: List[str] = []
            search_text = ""
            for entry in item["dialog_history"]:
                action = entry["action"]
                if action == "Wizard => SearchAgent":
                    search_text = entry["text"]
                elif action == "Wizard => Apprentice":
                    if not turn_list:
                        turn_list.append(entry["text"])
                        continue
                    contents = entry["context"]["contents"]
                    selects = entry["context"]["selected_contents"]
                    no_knowledge = selects[0][0]
                    knwl_sent = ""
                    if not no_knowledge:
                        for content, select in zip(contents, selects[1:]):
                            for c, s in zip(content["content"], select):
                                if s:
                                    knwl_sent = c
                                    break
                            if knwl_sent:
                                break
                    topic = search_text if knwl_sent else "no_topic"
                    response = entry["text"]
                    if topic != "no_topic":
                        fproc.write("\t".join(map(_clean, (
                            topic, " [SEP] ".join(turn_list), knwl_sent,
                            response))) + "\n")
                        n += 1
                        if fknwl:
                            fknwl.write(_clean(knwl_sent) + "\n")
                        if fresp:
                            fresp.write(
                                " ".join(word_tokenize(_clean(response)))
                                + "\n")
                    turn_list.append(response)
                elif action == "Apprentice => Wizard":
                    turn_list.append(entry["text"])
    for f in (fknwl, fresp):
        if f:
            f.close()
    return n


# --------------------------- prompt selection -------------------------------

def get_database(test_path: str, train_path: str, data_type: str):
    """preprocessing.get_database: per-topic prompt instances from the train
    tsv, filtered by knowledge quality; `(last_turn) topic => knowledge`
    instances + the dialog text used for similarity.

    Note (reference-faithful): the knowledge-length/pronoun filters apply
    only to examples whose topic is NOT in the test set — test-topic
    instances enter both the per-topic store and the global example pool
    unfiltered, exactly as in preprocessing.py:297-319."""
    assert data_type in ("wow_seen", "wow_unseen", "woi")
    with open(test_path) as f:
        test_topics = {line.split("\t")[0] for line in f if line.strip()}
    train_by_topic: Dict[str, List[str]] = {}
    dialog_by_topic: Dict[str, List[str]] = {}
    examples: List[Tuple[str, str, str]] = []
    with open(train_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            topic, ctx, knowledge, response = line.split("\t")[:4]
            turns = ctx.split(" [SEP] ")[-3:]
            if knowledge == "no_passages_used":
                continue
            if data_type != "wow_seen" and ("(" in knowledge
                                            or ")" in knowledge):
                continue
            if data_type != "wow_seen" and topic not in knowledge:
                continue
            instance = "( " + turns[-1] + " ) " + topic + " => " + knowledge
            dialog = ""
            if data_type != "wow_seen":
                dialog += "( " + topic + " ) "
            dialog += " ".join(turns)
            if topic in test_topics:
                train_by_topic.setdefault(topic, []).append(instance)
                dialog_by_topic.setdefault(topic, []).append(dialog)
            else:
                if len(knowledge.split()) > 20:
                    continue
                if knowledge.lower().startswith(("it", "this")):
                    continue
            examples.append((topic, dialog, instance))
    return train_by_topic, dialog_by_topic, examples


def hash_embed(texts: Sequence[str], dim: int = 256) -> np.ndarray:
    """Deterministic hashed bag-of-words embedding, L2-normalized. The
    offline stand-in for the reference's DPR encoder."""
    import zlib
    out = np.zeros((len(texts), dim), np.float32)
    for i, t in enumerate(texts):
        for w in word_tokenize(t.lower()):
            h = zlib.crc32(w.encode())  # stable across processes (not hash())
            out[i, h % dim] += 1.0 if (h >> 16) % 2 else -1.0
    out /= np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-12)
    return out


def knowledge_prompts(test_path: str, train_path: str, data_type: str,
                      out_path: str, *,
                      encode_fn: Callable[[Sequence[str]], np.ndarray]
                      = hash_embed, n_prompts: int = 10) -> int:
    """prompt_selection_for_knowledge_generation: for each test sample pick
    n examples — same-topic by similarity when the topic exists in train,
    otherwise the most-similar unique-topic examples globally. Output order
    is least→most similar (the reference reverses so the most similar sits
    right above the query in the prompt)."""
    train_by_topic, dialog_by_topic, examples = get_database(
        test_path, train_path, data_type)
    all_emb = encode_fn([e[1] for e in examples]) if examples else \
        np.zeros((0, 1), np.float32)
    topic_emb: Dict[str, np.ndarray] = {}
    n = 0
    with open(test_path) as f, open(out_path, "w") as out:
        for line in f:
            line = line.strip()
            if not line:
                continue
            topic, ctx = line.split("\t")[:2]
            turns = ctx.split(" [SEP] ")[-3:]
            query = ""
            if data_type != "wow_seen":
                query += "( " + topic + " ) "
            query += " ".join(turns)
            q = encode_fn([query])[0]
            if topic in train_by_topic:
                if topic not in topic_emb:
                    topic_emb[topic] = encode_fn(dialog_by_topic[topic])
                sims = topic_emb[topic] @ q
                k = min(n_prompts, len(sims))
                idx = np.argsort(sims)[-k:]          # ascending similarity
                selected = [train_by_topic[topic][i] for i in idx]
            else:
                sims = all_emb @ q
                seen_topics, selected = set(), []
                for i in np.argsort(sims)[::-1]:     # most similar first
                    t = examples[i][0]
                    if t in seen_topics:
                        continue
                    seen_topics.add(t)
                    selected.append(examples[i][2])
                    if len(selected) == n_prompts:
                        break
                selected = selected[::-1]            # least->most similar
            key = topic + " " + turns[-1]
            out.write(json.dumps({key: selected}) + "\n")
            n += 1
    return n


def response_prompts(input_path: str, output_path: str, seed: int = 1234,
                     n_prompts: int = 20) -> int:
    """prompt_selection_for_response_generation: keep samples whose response
    overlaps the knowledge in long (>=10-token) runs covering 60-90% of the
    response and >=80% of the knowledge; shuffle; write n prompt lines."""
    rng = np.random.RandomState(seed)
    prompts = []
    with open(input_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            topic, ctx, knowledge, response = line.split("\t")[:4]
            if knowledge == "no_passages_used":
                continue
            turns = ctx.split(" [SEP] ")[-3:]
            k_toks = word_tokenize(knowledge)
            k_set = set(k_toks)
            r_toks = word_tokenize(response)
            overlap = run = 0
            for tok in r_toks:
                if tok in k_set:
                    run += 1
                else:
                    if run >= 10:
                        overlap += run
                    run = 0
            if run >= 10:
                overlap += run
            if overlap > len(r_toks) * 0.9 or overlap < len(r_toks) * 0.6:
                continue
            if overlap < len(k_toks) * 0.8:
                continue
            prompts.append(
                "Topic: " + topic + ". "
                + "User says: " + " ".join(word_tokenize(turns[-1])) + " "
                + "We know that: " + " ".join(k_toks) + " "
                + "System replies: " + " ".join(r_toks))
    rng.shuffle(prompts)
    prompts = prompts[:n_prompts]
    with open(output_path, "w") as f:
        for p in prompts:
            f.write(p + "\n")
    return len(prompts)


def prepare_input(test_file: str, knwl_gen_file: str,
                  processed_file: str) -> int:
    """prepare_input_for_response_generation: swap golden knowledge for the
    generated one, line-aligned."""
    with open(knwl_gen_file) as f:
        knowledge = [k.strip().replace("<|endoftext|>", "")
                     for k in f.readlines()]
    n = 0
    with open(test_file) as fr, open(processed_file, "w") as fw:
        for line in fr:
            line = line.strip()
            if not line:
                continue
            topic, ctx, _, response = line.split("\t")[:4]
            # index by sample count, not raw line number: blank test-file
            # lines must not shift the knowledge alignment
            fw.write("\t".join((topic, ctx, knowledge[n], response)) + "\n")
            n += 1
    return n


def main(argv=None):
    ap = argparse.ArgumentParser("MSDP preprocessing")
    sub = ap.add_subparsers(dest="func", required=True)
    for name in ("process-wow", "process-woi"):
        sp = sub.add_parser(name)
        sp.add_argument("--raw-file", required=True)
        sp.add_argument("--processed-file", required=True)
        sp.add_argument("--knwl-ref-file", default=None)
        sp.add_argument("--resp-ref-file", default=None)
    sp = sub.add_parser("knowledge-prompts")
    sp.add_argument("--test-file", required=True)
    sp.add_argument("--train-file", required=True)
    sp.add_argument("--data-type", default="wow_seen",
                    choices=("wow_seen", "wow_unseen", "woi"))
    sp.add_argument("--processed-file", required=True)
    sp.add_argument("--n-prompts", type=int, default=10)
    sp = sub.add_parser("response-prompts")
    sp.add_argument("--train-file", required=True)
    sp.add_argument("--processed-file", required=True)
    sp.add_argument("--seed", type=int, default=1234)
    sp = sub.add_parser("prepare-input")
    sp.add_argument("--test-file", required=True)
    sp.add_argument("--knwl-gen-file", required=True)
    sp.add_argument("--processed-file", required=True)
    a = ap.parse_args(argv)
    if a.func == "process-wow":
        n = process_wow(a.raw_file, a.processed_file, a.knwl_ref_file,
                        a.resp_ref_file)
    elif a.func == "process-woi":
        n = process_woi(a.raw_file, a.processed_file, a.knwl_ref_file,
                        a.resp_ref_file)
    elif a.func == "knowledge-prompts":
        n = knowledge_prompts(a.test_file, a.train_file, a.data_type,
                              a.processed_file, n_prompts=a.n_prompts)
    elif a.func == "response-prompts":
        n = response_prompts(a.train_file, a.processed_file, a.seed)
    else:
        n = prepare_input(a.test_file, a.knwl_gen_file, a.processed_file)
    print(json.dumps({"func": a.func, "written": n}), flush=True)


if __name__ == "__main__":
    main()
