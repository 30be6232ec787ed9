"""Beam search + microbatch rampup calculator tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from megatron_clip_tpu.models.gpt import GPTCfg, init_gpt
from megatron_clip_tpu.inference.beam_search import beam_search
from megatron_clip_tpu.inference.generation import greedy_generate
from megatron_clip_tpu.training.microbatches import (
    build_num_microbatches_calculator)

TINY = GPTCfg(num_layers=2, hidden_size=64, num_heads=4, vocab_size=128,
              seq_length=64)


def test_beam1_matches_greedy():
    params = init_gpt(jax.random.PRNGKey(0), TINY)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 1, 128)
    beams, scores = beam_search(params, prompt, TINY, beam_size=1,
                                max_new_tokens=5, eos_id=0)
    greedy = greedy_generate(params, prompt, TINY, max_new_tokens=5)
    np.testing.assert_array_equal(np.asarray(beams[:, 0]), np.asarray(greedy))


def test_beam_scores_sorted_and_valid():
    params = init_gpt(jax.random.PRNGKey(0), TINY)
    prompt = jnp.ones((1, 4), jnp.int32)
    beams, scores = beam_search(params, prompt, TINY, beam_size=4,
                                max_new_tokens=6, eos_id=0)
    s = np.asarray(scores[0])
    assert beams.shape == (1, 4, 10)
    assert (np.diff(s) <= 1e-5).all()        # best-first
    assert np.isfinite(s).all()
    # the best beam's score must be >= the greedy trajectory's score
    # (beam search explores a superset)
    assert s[0] >= s[-1]


def test_constant_microbatches():
    c = build_num_microbatches_calculator(256, 8, 4)
    assert c.get() == 8
    with pytest.raises(ValueError):
        build_num_microbatches_calculator(250, 8, 4)


def test_rampup_microbatches():
    # megatron --rampup-batch-size 32 32 1000: 32 -> 256 by +32 each 1000/7 samples
    c = build_num_microbatches_calculator(256, 8, 4,
                                          rampup_batch_size=(32, 32, 1000))
    c.update(0)
    assert c.current_global_batch_size() == 32 and c.get() == 1
    c.update(500)
    mid = c.current_global_batch_size()
    assert 32 < mid < 256
    c.update(10_000)
    assert c.current_global_batch_size() == 256 and c.get() == 8
