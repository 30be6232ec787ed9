"""GLUE/RACE finetune harness tests: a learnable synthetic task (keyword
presence) must be solved; the CLI dispatcher runs both tasks (reference
surface: tasks/main.py + finetune_utils.py)."""
import json

import numpy as np
import pytest

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "good", "bad", "movie", "book", "this", "is", "a", "very",
         "what", "it", "yes", "no", "maybe", "so"]


@pytest.fixture
def vocab_file(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(VOCAB))
    return str(p)


def _glue_files(tmp_path, n=48):
    rng = np.random.RandomState(0)
    rows = []
    for _ in range(n):
        pos = rng.rand() < 0.5
        word = "good" if pos else "bad"
        filler = " ".join(rng.choice(["this", "is", "a", "movie", "book"],
                                     size=4))
        rows.append(f"{int(pos)}\t{filler} {word}\tit is {word}")
    train = tmp_path / "train.tsv"
    dev = tmp_path / "dev.tsv"
    train.write_text("\n".join(rows[: n - 16]))
    dev.write_text("\n".join(rows[n - 16:]))
    return str(train), str(dev)


def test_glue_learns_keyword_task(tmp_path, vocab_file):
    from tasks.main import parse_args, run
    train, dev = _glue_files(tmp_path)
    m = run(parse_args([
        "--task", "glue", "--train-file", train, "--dev-file", dev,
        "--vocab-file", vocab_file, "--num-classes", "2", "--seq-len", "16",
        "--epochs", "12", "--batch-size", "8", "--lr", "3e-4",
        "--num-layers", "2", "--hidden-size", "64", "--num-heads", "4"]))
    assert m["dev_accuracy"] >= 0.9, m


def test_race_multichoice_runs(tmp_path, vocab_file):
    from tasks.main import parse_args, run
    rng = np.random.RandomState(1)
    rows = []
    for _ in range(12):
        label = int(rng.randint(4))
        options = ["bad", "bad", "bad", "bad"]
        options[label] = "good"
        rows.append(json.dumps({
            "context": "this movie is good",
            "question": "what is it",
            "options": options, "label": label}))
    train = tmp_path / "race_train.jsonl"
    dev = tmp_path / "race_dev.jsonl"
    train.write_text("\n".join(rows[:8]))
    dev.write_text("\n".join(rows[8:]))
    m = run(parse_args([
        "--task", "race", "--train-file", str(train), "--dev-file", str(dev),
        "--vocab-file", vocab_file, "--seq-len", "24", "--epochs", "10",
        "--batch-size", "4", "--lr", "5e-4",
        "--num-layers", "2", "--hidden-size", "64", "--num-heads", "4"]))
    assert 0.0 <= m["dev_accuracy"] <= 1.0
    assert np.isfinite(m["train_loss"])


def test_ensemble_classifier(tmp_path, vocab_file):
    """Two finetune runs' saved predictions ensemble to at least the worse
    single-run accuracy (reference tasks/ensemble_classifier.py)."""
    from tasks.main import parse_args, run
    train, dev = _glue_files(tmp_path)
    common = ["--task", "glue", "--train-file", train, "--dev-file", dev,
              "--vocab-file", vocab_file, "--num-classes", "2",
              "--seq-len", "16", "--epochs", "8", "--batch-size", "8",
              "--lr", "3e-4", "--num-layers", "2", "--hidden-size", "64",
              "--num-heads", "4"]
    accs = []
    for seed in (0, 1):
        npz = str(tmp_path / f"pred{seed}.npz")
        m = run(parse_args(common + ["--seed", str(seed),
                                     "--save-predictions", npz,
                                     "--dataset-name", "kw"]))
        accs.append(m["dev_accuracy"])

    from tasks.ensemble_classifier import main as ens_main
    out = ens_main(["--paths", str(tmp_path / "pred0.npz"),
                    str(tmp_path / "pred1.npz"),
                    "--eval", "--outdir", str(tmp_path / "ens")])
    assert out["kw"] >= min(accs) - 1e-6, (out, accs)
    tsv = (tmp_path / "ens" / "kw" / "predictions.tsv").read_text()
    assert tsv.startswith("id\tlabel\n")
    assert len(tsv.strip().split("\n")) == 17  # header + 16 dev rows

    # threshold calibration path (binary)
    out_t = ens_main(["--paths", str(tmp_path / "pred0.npz"),
                      "--eval", "--calc-threshold"])
    assert 0.0 <= out_t["kw"] <= 1.0
