"""GPT model + vocab-parallel cross entropy tests."""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from megatron_clip_tpu.models.gpt import GPTCfg, init_gpt, apply_gpt, gpt_loss
from megatron_clip_tpu.ops.cross_entropy import (
    cross_entropy, vocab_parallel_cross_entropy)

TINY = GPTCfg(num_layers=2, hidden_size=64, num_heads=4, vocab_size=256,
              seq_length=32)


def test_forward_and_loss():
    params = init_gpt(jax.random.PRNGKey(0), TINY)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 33), 0, 256)
    logits = apply_gpt(params, tokens[:, :-1], TINY, compute_dtype=jnp.float32)
    assert logits.shape == (2, 32, 256) and logits.dtype == jnp.float32
    loss = gpt_loss(params, tokens, TINY, compute_dtype=jnp.float32)
    # random init => loss ~ ln(V)
    assert abs(float(loss) - np.log(256)) < 1.0


@pytest.mark.parametrize("variant", ["rope", "swiglu_rms_nobias", "gqa"])
def test_variants_run_and_train(variant):
    import dataclasses
    cfg = TINY
    if variant == "rope":
        cfg = dataclasses.replace(cfg, position_embedding="rope")
    elif variant == "swiglu_rms_nobias":
        cfg = dataclasses.replace(cfg, swiglu=True, normalization="rmsnorm",
                                  use_bias=False)
    elif variant == "gqa":
        cfg = dataclasses.replace(cfg, kv_heads=2)
    params = init_gpt(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 33), 0, 256)
    g = jax.grad(lambda p: gpt_loss(p, tokens, cfg, compute_dtype=jnp.float32))(params)
    assert all(np.all(np.isfinite(x)) for x in jax.tree.leaves(g))


def test_ltor_masks_and_position_ids():
    """Hand-checked example of the vectorized
    get_ltor_masks_and_position_ids (megatron utils.py semantics)."""
    from megatron_clip_tpu.models.gpt import get_ltor_masks_and_position_ids
    eod = 9
    toks = jnp.array([[1, 2, eod, 3, 4]])
    ab, lm, pid = get_ltor_masks_and_position_ids(
        toks, eod, reset_position_ids=True, reset_attention_mask=True,
        eod_mask_loss=True)
    np.testing.assert_array_equal(np.asarray(pid[0]), [0, 1, 2, 0, 1])
    np.testing.assert_array_equal(np.asarray(lm[0]), [1, 1, 0, 1, 1])
    # positions 3,4 (doc 2) must not see positions 0..2 (doc 1, incl. eod)
    blocked = np.asarray(ab[0, 0]) < -1e20
    expect = np.zeros((5, 5), bool)
    expect[3:, :3] = True
    expect[:3, 3:] = True  # symmetric doc test; causal handles the rest
    np.testing.assert_array_equal(blocked, expect)


@pytest.mark.parametrize("pos_emb", ["learned", "rope"])
def test_reset_masks_isolate_documents(pos_emb):
    """Packed [doc1, EOD, doc2] with --reset-attention-mask +
    --reset-position-ids: the doc2 segment's logits equal running doc2
    alone — the documents are fully isolated (megatron
    get_ltor_masks_and_position_ids contract)."""
    import dataclasses
    from megatron_clip_tpu.models.gpt import get_ltor_masks_and_position_ids
    cfg = dataclasses.replace(TINY, position_embedding=pos_emb, seq_length=16)
    params = init_gpt(jax.random.PRNGKey(0), cfg)
    eod = 255
    k = jax.random.PRNGKey(3)
    doc1 = jax.random.randint(k, (7,), 0, 200)
    doc2 = jax.random.randint(jax.random.fold_in(k, 1), (8,), 0, 200)
    packed = jnp.concatenate([doc1, jnp.array([eod]), doc2])[None]  # [1, 16]
    ab, _, pid = get_ltor_masks_and_position_ids(
        packed, eod, reset_position_ids=True, reset_attention_mask=True)
    lp = apply_gpt(params, packed, cfg, compute_dtype=jnp.float32,
                   attn_bias=ab, position_ids=pid)
    la = apply_gpt(params, doc2[None], cfg, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(lp[0, 8:]), np.asarray(la[0]),
                               atol=2e-4)


def test_rotary_percent_and_interpolation():
    from megatron_clip_tpu.ops.rope import rope_cos_sin, apply_rope
    cos, sin = rope_cos_sin(8, 16, rotary_percent=0.5)
    assert cos.shape == (8, 8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 8, 16))
    y = apply_rope(x, cos, sin)
    # channels past head_dim*percent pass through untouched
    np.testing.assert_array_equal(np.asarray(y[..., 8:]),
                                  np.asarray(x[..., 8:]))
    assert not np.allclose(np.asarray(y[..., :8]), np.asarray(x[..., :8]))
    # interpolation factor f: position 2i with f=2 == position i without
    c2, s2 = rope_cos_sin(16, 16, seq_len_interpolation_factor=2.0)
    c1, s1 = rope_cos_sin(8, 16)
    np.testing.assert_allclose(np.asarray(c2[::2]), np.asarray(c1),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(s2[::2]), np.asarray(s1),
                               atol=1e-6)


def test_squared_relu_variant():
    import dataclasses
    cfg = dataclasses.replace(TINY, squared_relu=True)
    params = init_gpt(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 33), 0, 256)
    g = jax.grad(lambda p: gpt_loss(p, tokens, cfg,
                                    compute_dtype=jnp.float32))(params)
    assert all(np.all(np.isfinite(x)) for x in jax.tree.leaves(g))


def test_vocab_parallel_cross_entropy(devices8):
    """Sharded-vocab CE == full CE (the reference's
    tensor_parallel/cross_entropy.py contract)."""
    mesh = Mesh(np.array(jax.devices()[:8]), ("tensor",))
    logits = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 64)) * 3
    targets = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 64)

    want = cross_entropy(logits, targets)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(None, None, "tensor"), P()), out_specs=P())
    def sharded(l, t):
        return vocab_parallel_cross_entropy(l, t, "tensor")

    got = sharded(logits, targets)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_gpt_cli_synthetic(devices8):
    from pretrain_gpt import parse_args, run
    m = run(parse_args([
        "--num-layers", "2", "--hidden-size", "64", "--num-heads", "4",
        "--seq-length", "32", "--vocab-size", "256", "--batch-size", "8",
        "--train-steps", "6", "--warmup", "2", "--precision", "fp32",
        "--tensor-model-parallel-size", "2", "--fsdp-parallel-size", "2",
        "--log-interval", "3"]))
    assert np.isfinite(m["loss"])


def test_gpt_cli_document_boundary_flags(devices8):
    """--eod-mask-loss/--reset-position-ids/--reset-attention-mask through
    the entry, sharded tp2 (the megatron packed-stream training recipe)."""
    from pretrain_gpt import parse_args, run
    m = run(parse_args([
        "--num-layers", "2", "--hidden-size", "64", "--num-heads", "4",
        "--seq-length", "32", "--vocab-size", "256", "--batch-size", "8",
        "--train-steps", "2", "--warmup", "1", "--precision", "fp32",
        "--tensor-model-parallel-size", "2", "--log-interval", "1",
        "--eod-token", "255", "--eod-mask-loss", "--reset-position-ids",
        "--reset-attention-mask"]))
    assert np.isfinite(m["loss"])
    with pytest.raises(SystemExit):
        run(parse_args(["--eod-mask-loss"]))  # --eod-token required


def test_gpt_pipeline_cli(devices8):
    from pretrain_gpt import parse_args, run
    m = run(parse_args([
        "--num-layers", "4", "--hidden-size", "64", "--num-heads", "4",
        "--seq-length", "32", "--vocab-size", "256", "--batch-size", "8",
        "--train-steps", "4", "--warmup", "2", "--precision", "fp32",
        "--pipeline-model-parallel-size", "4", "--num-microbatches", "4",
        "--log-interval", "2"]))
    assert np.isfinite(m["loss"])
