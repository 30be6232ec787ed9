"""Megatron CLI-compat tail: --kv-channels, --max-position-embeddings,
--vocab-extra-ids, --bf16/--fp16/--recompute-activations remaps, accepted
no-op flags, and the jax.profiler --profile window plumbing."""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_kv_channels_changes_projection_shapes():
    from megatron_clip_tpu.models.gpt import GPTCfg, init_gpt, apply_gpt
    cfg = GPTCfg(num_layers=2, hidden_size=64, num_heads=4, kv_channels=24,
                 vocab_size=128, seq_length=16)
    params = init_gpt(jax.random.PRNGKey(0), cfg)
    blocks = params["blocks"]
    # qkv: 3 * heads * kv_channels outputs; wo input heads * kv_channels
    assert blocks["attn"]["wqkv"].shape == (2, 64, 3 * 4 * 24)
    assert blocks["attn"]["wo"].shape == (2, 4 * 24, 64)
    toks = jnp.zeros((2, 16), jnp.int32)
    logits = apply_gpt(params, toks, cfg, compute_dtype=jnp.float32)
    assert logits.shape == (2, 16, 128)
    assert np.isfinite(np.asarray(logits)).all()


def test_kv_channels_default_matches_unset():
    """kv_channels == hidden/heads must be bit-identical to leaving it unset
    (megatron's --kv-channels default, arguments.py)."""
    from megatron_clip_tpu.models.gpt import GPTCfg, init_gpt, apply_gpt
    kw = dict(num_layers=2, hidden_size=64, num_heads=4, vocab_size=128,
              seq_length=16)
    cfg_a = GPTCfg(**kw)
    cfg_b = GPTCfg(kv_channels=16, **kw)
    pa = init_gpt(jax.random.PRNGKey(0), cfg_a)
    pb = init_gpt(jax.random.PRNGKey(0), cfg_b)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 128)
    la = apply_gpt(pa, toks, cfg_a, compute_dtype=jnp.float32)
    lb = apply_gpt(pb, toks, cfg_b, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb))


def test_max_position_embeddings():
    from megatron_clip_tpu.models.gpt import GPTCfg, init_gpt, apply_gpt
    cfg = GPTCfg(num_layers=1, hidden_size=32, num_heads=2, vocab_size=64,
                 seq_length=16, max_position_embeddings=64)
    params = init_gpt(jax.random.PRNGKey(0), cfg)
    assert params["pos_embed"].shape == (64, 32)
    logits = apply_gpt(params, jnp.zeros((1, 16), jnp.int32), cfg,
                       compute_dtype=jnp.float32)
    assert logits.shape == (1, 16, 64)


def test_normalize_megatron_compat_remaps():
    from types import SimpleNamespace
    from megatron_clip_tpu.training.workload import normalize_megatron_compat
    ns = SimpleNamespace(bf16=True, fp16=False, precision="fp32",
                         recompute_granularity="none",
                         checkpoint_activations=False,
                         recompute_activations=True)
    normalize_megatron_compat(ns)
    assert ns.precision == "bf16"
    assert ns.recompute_granularity == "selective"

    ns = SimpleNamespace(bf16=False, fp16=True, precision="fp32",
                         recompute_granularity="none",
                         checkpoint_activations=True,
                         recompute_activations=False)
    with pytest.warns(UserWarning, match="bf16"):
        normalize_megatron_compat(ns)
    assert ns.precision == "bf16"
    assert ns.recompute_granularity == "full"


def test_gpt_entry_accepts_megatron_flags():
    import pretrain_gpt
    args = pretrain_gpt.parse_args([
        "--num-layers", "2", "--hidden-size", "64", "--num-heads", "4",
        "--kv-channels", "24", "--max-position-embeddings", "128",
        "--bf16", "--use-flash-attn", "--no-masked-softmax-fusion",
        "--overlap-grad-reduce", "--attention-softmax-in-fp32",
        "--loss-scale", "4096", "--dataloader-type", "cyclic",
        "--num-workers", "2", "--profile-ranks", "0", "1",
        "--profile", "--profile-step-start", "2", "--profile-step-end", "3"])
    assert args.kv_channels == 24
    assert args.max_position_embeddings == 128
    assert args.bf16 and args.use_flash_attn
    assert args.dataloader_type == "cyclic"
    assert args.profile and args.profile_step_start == 2


def test_t5_vocab_extra_ids():
    import pretrain_t5
    args = pretrain_t5.parse_args(["--vocab-size", "1000",
                                   "--vocab-extra-ids", "50",
                                   "--train-steps", "1"])
    assert args.vocab_extra_ids == 50
    # sentinels occupy the top ids: base = vocab - extra
    rng = np.random.RandomState(0)
    toks = rng.randint(4, 950, (2, 32)).astype(np.int32)
    enc, dec_in, labels, mask = pretrain_t5.span_corrupt(
        rng, toks, 1000, 950, max_dec=16)
    assert enc.max() < 1000 and labels.max() < 1000
    sent = enc[enc >= 950]
    assert sent.size > 0  # at least one span got a sentinel


_BERT_REF_ARGS = [
    "--num-layers", "24", "--hidden-size", "1024",
    "--num-attention-heads", "16", "--seq-length", "512",
    "--max-position-embeddings", "512", "--micro-batch-size", "4",
    "--global-batch-size", "8", "--lr", "0.0001",
    "--train-iters", "2000000", "--lr-decay-iters", "990000",
    "--lr-decay-style", "linear", "--min-lr", "0.00001",
    "--weight-decay", "1e-2", "--lr-warmup-fraction", ".01",
    "--clip-grad", "1.0", "--fp16", "--data-path", "/tmp/x",
    "--vocab-file", "/tmp/v.txt", "--split", "949,50,1",
    "--log-interval", "100", "--save-interval", "10000",
    "--eval-interval", "1000", "--eval-iters", "10",
    "--save", "/tmp/s", "--load", "/tmp/s"]


def test_reference_launch_arg_sets_parse():
    """The stock megatron examples/pretrain_{bert,gpt,t5}.sh flag sets parse
    unmodified on the matching entries."""
    import pretrain_bert
    import pretrain_gpt
    import pretrain_t5
    a = pretrain_bert.parse_args(_BERT_REF_ARGS)
    assert a.vocab_file == "/tmp/v.txt" and a.num_heads == 16
    g = pretrain_gpt.parse_args(_BERT_REF_ARGS + [
        "--merge-file", "/tmp/m.txt"])
    assert g.merge_file == "/tmp/m.txt"
    t = pretrain_t5.parse_args([
        "--num-layers", "12", "--hidden-size", "768",
        "--num-attention-heads", "12", "--kv-channels", "64",
        "--ffn-hidden-size", "3072", "--encoder-seq-length", "512",
        "--decoder-seq-length", "128", "--micro-batch-size", "16",
        "--global-batch-size", "16", "--max-position-embeddings", "512",
        "--lr", "0.0001", "--train-iters", "1000000",
        "--lr-decay-iters", "1000000", "--weight-decay", "1e-2",
        "--lr-warmup-fraction", ".01", "--clip-grad", "1.0", "--fp16",
        "--vocab-extra-ids", "100", "--data-path", "/tmp/x",
        "--vocab-file", "/tmp/v.txt", "--split", "949,50,1",
        "--save", "/tmp/s", "--load", "/tmp/s"])
    assert t.kv_channels == 64 and t.ffn_hidden_size == 3072


def test_vocab_size_from_tokenizer_args(tmp_path):
    """--vocab-file sizes the embedding like megatron build_tokenizer +
    _vocab_size_with_padding (default divisor 128 x tp)."""
    from types import SimpleNamespace
    from megatron_clip_tpu.training.workload import (
        vocab_size_from_tokenizer_args)
    vf = tmp_path / "vocab.txt"
    toks = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + \
        [f"tok{i}" for i in range(995)]   # 1000 pieces
    vf.write_text("\n".join(toks) + "\n")
    ns = SimpleNamespace(vocab_file=str(vf), merge_file=None,
                         tokenizer_model=None, tokenizer_type=None,
                         make_vocab_size_divisible_by=None,
                         tensor_model_parallel_size=2)
    # 1000 -> padded to 128*2=256 multiple -> 1024
    assert vocab_size_from_tokenizer_args(ns) == 1024
    # T5: +100 sentinels first -> 1100 -> 1280
    assert vocab_size_from_tokenizer_args(ns, extra_ids=100) == 1280
    # with_real: datasets that SAMPLE ids (BERT MLM replacement, T5
    # sentinel placement) must see the REAL tokenizer size, not padding
    assert vocab_size_from_tokenizer_args(ns, with_real=True) == (1024, 1000)
    assert vocab_size_from_tokenizer_args(
        ns, extra_ids=100, with_real=True) == (1280, 1100)
    ns.vocab_file = None
    assert vocab_size_from_tokenizer_args(ns) is None
    assert vocab_size_from_tokenizer_args(ns, with_real=True) == (None, None)


def test_noop_warning_skips_entry_real_flags():
    """--max-position-embeddings is behavior-bearing on the GPT entry (it
    sizes the learned pos table); only entries that registered it as a
    compat no-op may warn about it."""
    import argparse
    import warnings
    from pretrain_gpt import parse_args
    from megatron_clip_tpu.training.workload import (
        add_megatron_compat_args, normalize_megatron_compat)

    a = parse_args(["--max-position-embeddings", "2048",
                    "--seq-length", "32"])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        normalize_megatron_compat(a)
    assert not any("--max-position-embeddings" in str(x.message) for x in w)

    p = argparse.ArgumentParser()   # an entry with no real version
    add_megatron_compat_args(p)
    b = p.parse_args(["--max-position-embeddings", "512"])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        normalize_megatron_compat(b)
    assert any("--max-position-embeddings" in str(x.message) for x in w)


def test_rampup_batch_size(tmp_path, capsys):
    """--rampup-batch-size grows the effective batch: the step sees sliced
    batches and the checkpoint metadata records the ramped consumed count
    (megatron microbatches.py:83-144 semantics)."""
    from megatron_clip_tpu.training.workload import RuntimeCfg, run_workload

    seen = []

    def loss_fn(params, batch, rng=None):
        # record the traced batch shape: one trace per distinct size
        seen.append(batch["x"].shape[0])
        return jnp.mean((params["w"] * batch["x"]) ** 2)

    # 2 -> 8 by +2 every 10/3 samples: sizes 2,4,6,8 over the run
    rc = RuntimeCfg(train_steps=8, batch_size=8, lr=1e-2, warmup=0,
                    log_interval=4, rampup_batch_size=(2, 2, 10),
                    save=str(tmp_path / "ck"), save_interval=8)

    def batches():
        while True:
            yield {"x": np.ones((8, 4), np.float32)}

    run_workload({"w": jnp.ones((4,))}, loss_fn, batches(), rc)
    assert set(seen) == {2, 4, 6, 8}, seen
    import json
    metas = sorted((tmp_path / "ck").glob("iter_*/metadata.json"))
    meta = json.loads(metas[-1].read_text())
    # rampup +2 every 10/3 samples: per-step sizes 2,2,4,6,8,8,8,8 -> 46
    assert meta["consumed_samples"] == 46, meta


def test_sigterm_saves_and_exits(tmp_path):
    """SIGTERM mid-run: the workload runtime saves a checkpoint and stops
    (megatron DistributedSignalHandler + training.py:815-821)."""
    import signal
    from megatron_clip_tpu.training.workload import RuntimeCfg, run_workload
    from megatron_clip_tpu.checkpoints import latest_checkpoint_step

    def loss_fn(params, batch, rng=None):
        return jnp.mean((params["w"] * batch["x"]) ** 2)

    rc = RuntimeCfg(train_steps=100, batch_size=2, lr=1e-2, warmup=0,
                    log_interval=50, save=str(tmp_path / "ck"))

    def batches():
        n = 0
        while True:
            n += 1
            if n == 4:
                signal.raise_signal(signal.SIGTERM)
            yield {"x": np.ones((2, 4), np.float32)}

    res = run_workload({"w": jnp.ones((4,))}, loss_fn, batches(), rc)
    assert res["last_step"] < 100
    assert latest_checkpoint_step(str(tmp_path / "ck")) == res["last_step"]


def test_clip_app_fp16_remap():
    """megatron pretrain_CLIP's --fp16 flag maps onto --precision bf16 in
    the open_CLIP-style parser."""
    from megatron_clip_tpu.training.params import parse_args
    with pytest.warns(UserWarning, match="bf16"):
        ns = parse_args(["--fp16", "--train-num-samples", "64"])
    assert ns.precision == "bf16"


def test_profile_window_runs(tmp_path):
    """--profile wraps the step window in jax.profiler start/stop_trace."""
    from megatron_clip_tpu.training.workload import (
        RuntimeCfg, run_workload)

    def loss_fn(params, batch, rng=None):
        return jnp.mean((params["w"] * batch["x"]) ** 2)

    rc = RuntimeCfg(train_steps=4, batch_size=2, lr=1e-2, warmup=0,
                    log_interval=10, profile=True, profile_step_start=2,
                    profile_step_end=3, profile_dir=str(tmp_path / "prof"))

    def batches():
        while True:
            yield {"x": np.ones((2, 4), np.float32)}

    params = {"w": jnp.ones((4,))}
    run_workload(params, loss_fn, batches(), rc)
    import glob
    assert glob.glob(str(tmp_path / "prof" / "**" / "*.trace*"),
                     recursive=True) or \
        glob.glob(str(tmp_path / "prof" / "**" / "*.pb"), recursive=True)
