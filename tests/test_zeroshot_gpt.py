"""Zero-shot GPT eval harness tests (reference tasks/zeroshot_gpt)."""
import json

import jax
import jax.numpy as jnp
import numpy as np

from megatron_clip_tpu.models.gpt import GPTCfg, init_gpt, apply_gpt
from megatron_clip_tpu.ops.cross_entropy import cross_entropy
from tasks.zeroshot_gpt import (
    evaluate_lambada, evaluate_wikitext, lambada_example, lm_eval_windows,
    wikitext_detokenizer)

CFG = GPTCfg(num_layers=2, hidden_size=32, num_heads=2, vocab_size=64,
             seq_length=16)


def _params():
    return init_gpt(jax.random.PRNGKey(0), CFG)


def test_lm_windows_cover_every_target_once():
    tokens = list(range(50))
    for ov in (4, 8, 16):
        windows = list(lm_eval_windows(tokens, 16, pad_id=0,
                                       overlapping_eval=ov))
        counted = sum(int(m.sum()) for _, m in windows)
        assert counted == len(tokens) - 1, (ov, counted)


def test_wikitext_eval_matches_direct_loss():
    """Non-overlapping windows: harness total == direct per-token loss sum."""
    params = _params()
    rng = np.random.RandomState(0)
    stream = rng.randint(1, 60, 33).tolist()   # exactly two 16-token windows
    text = " ".join(str(t) for t in stream)
    tokenize = lambda s: [int(x) for x in s.split()]
    m = evaluate_wikitext(params, CFG, text, tokenize, seq_len=16,
                          overlapping_eval=16, batch_size=2, pad_id=0,
                          detokenize=False)
    # direct: loss over the same two windows
    w = np.stack([stream[0:17], stream[16:33]]).astype(np.int32)
    logits = apply_gpt(params, jnp.asarray(w[:, :-1]), CFG,
                       compute_dtype=jnp.float32)
    direct = float(cross_entropy(logits, jnp.asarray(w[:, 1:])).sum())
    np.testing.assert_allclose(m["avg_loss"], direct / 32, rtol=1e-5)
    assert m["ppl"] > 1.0 and np.isfinite(m["adjusted_ppl"])


def test_lambada_accuracy_counts_model_argmax():
    """Targets set to the model's own argmax are scored correct; random
    offsets from it are scored wrong -> accuracy == fraction planted."""
    params = _params()
    rng = np.random.RandomState(1)
    examples = []
    planted = 0
    for i in range(8):
        ctx = rng.randint(1, 60, 10).tolist()
        logits = apply_gpt(params, jnp.asarray([ctx], jnp.int32), CFG,
                           compute_dtype=jnp.float32)
        argmax = int(np.asarray(jnp.argmax(logits[0, -1])))
        if i % 2 == 0:
            examples.append((ctx, [argmax]))
            planted += 1
        else:
            examples.append((ctx, [(argmax + 7) % 64]))
    m = evaluate_lambada(params, CFG, examples, seq_len=16, batch_size=3,
                         pad_id=0)
    assert m["num_examples"] == 8
    assert m["num_correct"] == planted, m


def test_lambada_example_strict_split():
    tok = lambda s: [ord(c) % 64 for c in s]
    ctx, tgt = lambada_example("the quick brown fox", tok, strict=True)
    assert tgt == tok(" fox")
    ctx2, tgt2 = lambada_example("the quick brown fox", tok, strict=False)
    assert len(tgt2) == 1


def test_wikitext_detokenizer_rules():
    assert wikitext_detokenizer("a @-@ b") == "a-b"
    assert wikitext_detokenizer("x , y . z") == "x, y. z"
    assert wikitext_detokenizer("= = heading = =") == "== heading =="


def test_cli_task_lambada(tmp_path):
    from tasks.main import parse_args, run
    rng = np.random.RandomState(2)
    path = tmp_path / "lambada.jsonl"
    with open(path, "w") as f:
        for _ in range(4):
            words = " ".join(str(rng.randint(0, 999)) for _ in range(6))
            f.write(json.dumps({"text": words}) + "\n")
    m = run(parse_args([
        "--task", "lambada", "--valid-data", str(path),
        "--num-layers", "2", "--hidden-size", "32", "--num-heads", "2",
        "--seq-len", "16", "--batch-size", "2", "--vocab-size", "8193"]))
    assert m["num_examples"] == 4
    assert 0.0 <= m["accuracy"] <= 1.0
