"""ORQA — open-retrieval question answering over a biencoder + MIPS index.

Capability parity with the reference's tasks/orqa/ (~2600 LoC):
  - unsupervised eval (evaluate_orqa.py + evaluate_utils.py ORQAEvaluator +
    unsupervised/nq.py + qa_utils.py): embed an evidence corpus with the
    context encoder, build a MIPS index, encode NQ-style questions with the
    query encoder, retrieve top-k, and score top-k *answer-containment* hit
    rates (qa_utils.calculate_matches/has_answer: normalized-token substring
    match, or regex match).
  - supervised biencoder finetune (supervised/finetune.py + data.py): NQ
    question/positive-context pairs trained with the in-batch retrieval
    softmax (same objective as ICT, models/biencoder.ict_loss), reporting
    top-1 in-batch accuracy.

TPU-native differences: FAISS is replaced by the repo's MIPSIndex (jitted
chunked matmul top-k on device, indexer.py) and the multiprocess answer
matcher by a vectorized normalized-token scan (evidence sets here are far
smaller than full Wikipedia; the matcher is O(docs * answers)).
"""
import json
import re
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

_RE_ART = re.compile(r"\b(a|an|the)\b")
_RE_PUNC = re.compile(r"[!\"#$%&()*+,\-./:;<=>?@\[\]\\^`{|}~_']")


def _norm_tokens(text: str) -> List[str]:
    text = _RE_PUNC.sub(" ", text.lower())
    text = _RE_ART.sub(" ", text)
    return text.split()


def has_answer(answers: Sequence[str], text: str,
               match_type: str = "string") -> bool:
    """qa_utils.has_answer semantics: 'string' = normalized-token
    subsequence containment; 'regex' = any answer regex matches."""
    if match_type == "regex":
        for a in answers:
            try:
                if re.search(a, text, flags=re.IGNORECASE | re.UNICODE):
                    return True
            except re.error:
                continue
        return False
    doc = _norm_tokens(text)
    for a in answers:
        ans = _norm_tokens(a)
        if not ans:
            continue
        n = len(ans)
        for i in range(len(doc) - n + 1):
            if doc[i:i + n] == ans:
                return True
    return False


def calculate_matches(all_docs: Dict[object, Tuple[str, str]],
                      answers: List[List[str]],
                      closest_docs: List[Tuple[Sequence[object], Sequence[float]]],
                      match_type: str = "string"):
    """qa_utils.calculate_matches: per-question top-k hit flags, cumulated
    into top_k_hits[i] = #questions whose answer appears in their top-(i+1)."""
    question_hits = []
    for ans, (doc_ids, _scores) in zip(answers, closest_docs):
        hits = [has_answer(ans, all_docs[d][0], match_type)
                if all_docs.get(d) is not None else False for d in doc_ids]
        question_hits.append(hits)
    n_docs = len(closest_docs[0][0]) if closest_docs else 0
    top_k_hits = [0] * n_docs
    for hits in question_hits:
        best = next((i for i, h in enumerate(hits) if h), None)
        if best is not None:
            for i in range(best, n_docs):
                top_k_hits[i] += 1
    return top_k_hits, question_hits


def load_nq_tsv(path: str) -> Tuple[List[str], List[List[str]]]:
    """unsupervised/nq.py data format: TSV `question \t ['answer', ...]`
    (answers column is a python-literal list)."""
    import ast
    questions, answers = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("question\t"):
                continue
            q, a = line.split("\t", 1)
            questions.append(q)
            try:
                parsed = ast.literal_eval(a)
            except (ValueError, SyntaxError):
                parsed = [a]
            answers.append([str(x) for x in (
                parsed if isinstance(parsed, (list, tuple)) else [parsed])])
    return questions, answers


@dataclass
class ORQAEvalResult:
    top_k_hits: List[int]
    num_questions: int

    def hit_rate(self, k: int) -> float:
        if self.num_questions == 0:
            return 0.0
        return self.top_k_hits[min(k, len(self.top_k_hits)) - 1] / \
            self.num_questions


class ORQAEvaluator:
    """evaluate_utils.ORQAEvaluator, TPU-native: the evidence index lives
    on device as sharded matmul blocks (indexer.MIPSIndex), not FAISS."""

    def __init__(self, params, cfg, tokenize: Callable[[str], List[int]],
                 *, seq_len: int = 64, batch_size: int = 32):
        self.params = params
        self.cfg = cfg
        self.tokenize = tokenize
        self.seq_len = seq_len
        self.batch_size = batch_size
        self.index: Optional[object] = None
        self.doc_ids: List[object] = []

    def _encode(self, texts: List[str], which: str) -> np.ndarray:
        import jax.numpy as jnp
        from megatron_clip_tpu.models.biencoder import (
            encode_context, encode_query)
        fn = encode_query if which == "query" else encode_context
        out = []
        for i in range(0, len(texts), self.batch_size):
            chunk = texts[i:i + self.batch_size]
            toks = np.zeros((len(chunk), self.seq_len), np.int32)
            for j, t in enumerate(chunk):
                ids = self.tokenize(t)[: self.seq_len]
                toks[j, : len(ids)] = ids
            emb = fn(self.params, jnp.asarray(toks), self.cfg,
                     pad_mask=jnp.asarray(toks != 0))
            out.append(np.asarray(emb, np.float32))
        return np.concatenate(out) if out else np.zeros((0, 1), np.float32)

    def build_index(self, docs: Dict[object, Tuple[str, str]]):
        """Embed evidence (text + title like orqa_wiki_dataset) and build
        the device MIPS index."""
        from megatron_clip_tpu.indexer import MIPSIndex
        self.doc_ids = list(docs.keys())
        texts = [f"{docs[d][1]} {docs[d][0]}".strip() for d in self.doc_ids]
        emb = self._encode(texts, "context")
        self.index = MIPSIndex(emb)
        return self

    def evaluate(self, questions: List[str], answers: List[List[str]],
                 docs: Dict[object, Tuple[str, str]], *, top_k: int = 10,
                 match_type: str = "string") -> ORQAEvalResult:
        assert self.index is not None, "call build_index first"
        q = self._encode(questions, "query")
        k = min(top_k, len(self.doc_ids))
        scores, idx = self.index.search(q, k)
        closest = [([self.doc_ids[j] for j in row], list(srow))
                   for row, srow in zip(np.asarray(idx), np.asarray(scores))]
        top_k_hits, _ = calculate_matches(docs, answers, closest, match_type)
        return ORQAEvalResult(top_k_hits, len(questions))


# --------------------------------------------------------------------------
# supervised finetune (tasks/orqa/supervised/finetune.py)
# --------------------------------------------------------------------------

def load_dpr_json(path: str):
    """supervised/data.py NQ format: JSON list of {question, answers,
    positive_ctxs: [{title, text}, ...], ...}; one positive per question."""
    with open(path) as f:
        data = json.load(f)
    out = []
    for row in data:
        pos = row.get("positive_ctxs") or []
        if not pos:
            continue
        out.append((row["question"],
                    f"{pos[0].get('title', '')} {pos[0]['text']}".strip(),
                    [str(a) for a in row.get("answers", [])]))
    return out


def finetune_biencoder(params, cfg, pairs, tokenize, *, seq_len: int = 64,
                       batch_size: int = 8, epochs: int = 1,
                       lr: float = 2e-5, seed: int = 0):
    """In-batch-negative retrieval finetune (the reference trains the same
    softmax-over-B×B objective, supervised/finetune.py cross_entropy over
    retrieval scores). Returns (params, final_top1_accuracy)."""
    import jax
    import jax.numpy as jnp
    import optax
    from megatron_clip_tpu.models.biencoder import ict_loss

    def tok_batch(texts):
        toks = np.zeros((len(texts), seq_len), np.int32)
        for j, t in enumerate(texts):
            ids = tokenize(t)[:seq_len]
            toks[j, : len(ids)] = ids
        return jnp.asarray(toks)

    tx = optax.adamw(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, q_toks, c_toks):
        def loss_fn(p):
            loss, acc = ict_loss(p, q_toks, c_toks, cfg,
                                 compute_dtype=jnp.float32)
            return loss, acc
        (loss, acc), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss, acc

    rng = np.random.default_rng(seed)
    acc = 0.0
    for _ in range(epochs):
        order = rng.permutation(len(pairs))
        for i in range(0, len(order) - batch_size + 1, batch_size):
            batch = [pairs[j] for j in order[i:i + batch_size]]
            q = tok_batch([b[0] for b in batch])
            c = tok_batch([b[1] for b in batch])
            params, opt, loss, acc = step(params, opt, q, c)
    return params, float(acc)
