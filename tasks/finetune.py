"""BERT downstream finetuning: GLUE-style classification and RACE-style
multiple choice.

Reference surface: tasks/main.py --task MNLI/QQP/RACE with
tasks/finetune_utils.py:304 (finetune = build model with a classification
head over the pooled CLS state, cross-entropy train loop, dev-set
accuracy). Data here is offline TSV/JSONL:

  GLUE:  <label>\t<sentence1>[\t<sentence2>]
  RACE:  {"context": ..., "question": ..., "options": [...4...],
          "label": int} per line

The classifier head mirrors megatron's (tanh pooler over CLS -> dropout ->
linear, model/classification.py).
"""
import json
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from megatron_clip_tpu.models.bert import BertCfg, init_bert
from megatron_clip_tpu.nn.transformer import apply_transformer, apply_norm
from megatron_clip_tpu.ops.cross_entropy import cross_entropy


# ---------------------------------------------------------------------------
# model: BERT trunk + classification head

def init_classifier(key, cfg: BertCfg, num_classes: int, dtype=jnp.float32):
    kb, kp, kh = jax.random.split(key, 3)
    params = init_bert(kb, cfg, dtype)
    w = cfg.hidden_size
    params["cls_head"] = {
        "pool": {"w": (cfg.init_std * jax.random.normal(kp, (w, w))).astype(dtype),
                 "b": jnp.zeros((w,), dtype=dtype)},
        "out": {"w": (cfg.init_std * jax.random.normal(kh, (w, num_classes))).astype(dtype),
                "b": jnp.zeros((num_classes,), dtype=dtype)},
    }
    return params


def apply_classifier(params, tokens, token_types, pad_mask, cfg: BertCfg, *,
                     compute_dtype=jnp.float32, rng=None):
    """-> logits [B, num_classes] from the pooled CLS state."""
    tcfg = cfg.transformer()
    s = tokens.shape[1]
    x = params["tok_embed"][tokens].astype(compute_dtype)
    x = x + params["pos_embed"][:s].astype(compute_dtype)[None]
    if token_types is not None:
        x = x + params["type_embed"][token_types].astype(compute_dtype)
    bias = jnp.where(pad_mask[:, None, None, :].astype(bool), 0.0, -1e30)
    x = apply_transformer(params["blocks"], x, tcfg, causal=False, bias=bias,
                          rng=rng)
    x = apply_norm(params["ln_f"], x)
    pooled = jnp.tanh(x[:, 0] @ params["cls_head"]["pool"]["w"].astype(x.dtype)
                      + params["cls_head"]["pool"]["b"].astype(x.dtype))
    return (pooled @ params["cls_head"]["out"]["w"].astype(x.dtype)
            + params["cls_head"]["out"]["b"].astype(x.dtype)
            ).astype(jnp.float32)


# ---------------------------------------------------------------------------
# data

def _encode_pair(tok, a: str, b: Optional[str], seq_len: int):
    if b:
        ids, types = tok.tokenize_pair(a, b)
    else:
        ia = tok.tokenize(a)
        ids = [tok.cls] + ia + [tok.sep]
        types = [0] * len(ids)
    ids, types = ids[:seq_len], types[:seq_len]
    out = np.full(seq_len, tok.pad, np.int32)
    ty = np.zeros(seq_len, np.int32)
    pm = np.zeros(seq_len, np.float32)
    out[:len(ids)] = ids
    ty[:len(types)] = types
    pm[:len(ids)] = 1.0
    return out, ty, pm


def load_glue_tsv(path: str, tok, seq_len: int):
    toks, types, pms, labels = [], [], [], []
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 2:
                continue
            label, a = parts[0], parts[1]
            b = parts[2] if len(parts) > 2 else None
            t, ty, pm = _encode_pair(tok, a, b, seq_len)
            toks.append(t)
            types.append(ty)
            pms.append(pm)
            labels.append(int(label))
    return (np.stack(toks), np.stack(types), np.stack(pms),
            np.asarray(labels, np.int32))


def load_race_jsonl(path: str, tok, seq_len: int):
    """-> tokens [N, C, S], types, pad, labels [N]."""
    toks, types, pms, labels = [], [], [], []
    with open(path, encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            j = json.loads(line)
            rows = [
                _encode_pair(tok, j["context"],
                             f"{j['question']} {opt}", seq_len)
                for opt in j["options"]
            ]
            toks.append(np.stack([r[0] for r in rows]))
            types.append(np.stack([r[1] for r in rows]))
            pms.append(np.stack([r[2] for r in rows]))
            labels.append(int(j["label"]))
    return (np.stack(toks), np.stack(types), np.stack(pms),
            np.asarray(labels, np.int32))


# ---------------------------------------------------------------------------
# train/eval loops (finetune_utils.py train/evaluate shape)

@dataclass
class FinetuneResult:
    train_loss: float
    dev_accuracy: float
    # dev-set class probabilities/labels for tasks/ensemble_classifier.py
    # (the reference saves test_predictions.pt per checkpoint dir:
    # tasks/finetune_utils.py -> tasks/ensemble_classifier.py:14-28)
    dev_probs: Optional[np.ndarray] = None
    dev_labels: Optional[np.ndarray] = None


def _train_eval(params, cfg, train, dev, *, num_classes, epochs, batch_size,
                lr, seed, multichoice=False):
    import optax
    tx = optax.adamw(lr, weight_decay=0.01)
    opt = tx.init(params)

    def logits_fn(p, t, ty, pm):
        if multichoice:
            n, c, s = t.shape
            flat = apply_classifier(p, t.reshape(n * c, s),
                                    ty.reshape(n * c, s),
                                    pm.reshape(n * c, s), cfg)
            return flat.reshape(n, c)      # head has 1 output per choice
        return apply_classifier(p, t, ty, pm, cfg)

    @jax.jit
    def step(p, opt, t, ty, pm, y):
        def loss_fn(p):
            logits = logits_fn(p, t, ty, pm)
            return cross_entropy(logits[None], y[None]).mean()
        loss, g = jax.value_and_grad(loss_fn)(p)
        upd, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, upd), opt, loss

    @jax.jit
    def predict(p, t, ty, pm):
        return jax.nn.softmax(logits_fn(p, t, ty, pm), axis=-1)

    toks, types, pms, labels = train
    n = len(labels)
    rng = np.random.RandomState(seed)
    loss = None
    for _ in range(epochs):
        order = rng.permutation(n)
        for lo in range(0, n - batch_size + 1, batch_size):
            idx = order[lo:lo + batch_size]
            params, opt, loss = step(params, opt,
                                     jnp.asarray(toks[idx]),
                                     jnp.asarray(types[idx]),
                                     jnp.asarray(pms[idx]),
                                     jnp.asarray(labels[idx]))
    dt, dty, dpm, dy = dev
    correct = total = 0
    probs = []
    for lo in range(0, len(dy), batch_size):
        sl = slice(lo, lo + batch_size)
        pb = np.asarray(predict(params, jnp.asarray(dt[sl]),
                                jnp.asarray(dty[sl]),
                                jnp.asarray(dpm[sl])))
        probs.append(pb)
        correct += (pb.argmax(-1) == dy[sl]).sum()
        total += len(dy[sl])
    probs = (np.concatenate(probs) if probs
             else np.zeros((0, num_classes), np.float32))
    return FinetuneResult(float(loss) if loss is not None else float("nan"),
                          correct / max(total, 1), probs, dy), params


def run_glue(tok, cfg: BertCfg, train_path: str, dev_path: str, *,
             num_classes: int, seq_len: int = 128, epochs: int = 3,
             batch_size: int = 16, lr: float = 3e-5, seed: int = 0,
             params=None):
    train = load_glue_tsv(train_path, tok, seq_len)
    dev = load_glue_tsv(dev_path, tok, seq_len)
    if params is None:
        params = init_classifier(jax.random.PRNGKey(seed), cfg, num_classes)
    return _train_eval(params, cfg, train, dev, num_classes=num_classes,
                       epochs=epochs, batch_size=batch_size, lr=lr, seed=seed)


def run_race(tok, cfg: BertCfg, train_path: str, dev_path: str, *,
             seq_len: int = 128, epochs: int = 3, batch_size: int = 4,
             lr: float = 3e-5, seed: int = 0, params=None):
    train = load_race_jsonl(train_path, tok, seq_len)
    dev = load_race_jsonl(dev_path, tok, seq_len)
    if params is None:
        # multichoice scores each option with a single-logit head
        params = init_classifier(jax.random.PRNGKey(seed), cfg, 1)
    return _train_eval(params, cfg, train, dev, num_classes=1,
                       epochs=epochs, batch_size=batch_size, lr=lr,
                       seed=seed, multichoice=True)
