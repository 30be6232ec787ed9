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


def test_gpt_pipeline_cli(devices8):
    from pretrain_gpt import parse_args, run
    m = run(parse_args([
        "--num-layers", "4", "--hidden-size", "64", "--num-heads", "4",
        "--seq-length", "32", "--vocab-size", "256", "--batch-size", "8",
        "--train-steps", "4", "--warmup", "2", "--precision", "fp32",
        "--pipeline-model-parallel-size", "4", "--num-microbatches", "4",
        "--log-interval", "2"]))
    assert np.isfinite(m["loss"])
