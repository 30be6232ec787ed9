"""Pipeline-parallel serving (inference/pp_generation.py): decode with the
layer stack sharded over the `stage` axis must be token-for-token identical
to the single-program decode — megatron serves under TP×PP with per-token
stage p2p + logits broadcast (text_generation/communication.py:185)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from megatron_clip_tpu.config import ParallelCfg
from megatron_clip_tpu.inference.generation import generate, greedy_generate
from megatron_clip_tpu.inference.pp_generation import pp_generate
from megatron_clip_tpu.models.gpt import GPTCfg, init_gpt, gpt_param_specs
from megatron_clip_tpu.parallel import build_mesh
from megatron_clip_tpu.parallel.mesh import STAGE
from megatron_clip_tpu.parallel.sharding import make_sharding_tree


def _place(params, mesh):
    return jax.device_put(
        params, make_sharding_tree(mesh, gpt_param_specs(params,
                                                         stage_axis=STAGE)))


@pytest.mark.parametrize("rope", [False, True])
def test_pp_decode_matches_single_program(devices8, rope):
    cfg = GPTCfg(num_layers=4, hidden_size=64, num_heads=4, vocab_size=256,
                 seq_length=64,
                 position_embedding="rope" if rope else "learned")
    params = init_gpt(jax.random.PRNGKey(0), cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 1,
                                255).astype(jnp.int32)
    want = np.asarray(greedy_generate(params, prompt, cfg, max_new_tokens=12))

    mesh = build_mesh(ParallelCfg(pp=4, tp=2))
    plen = jnp.full((4,), 8, jnp.int32)
    got = np.asarray(pp_generate(
        _place(params, mesh), prompt, plen, cfg, mesh,
        max_new_tokens=12, temperature=0.0))
    np.testing.assert_array_equal(got, want)


def test_pp_decode_ragged_prompts_and_sampling(devices8):
    """Ragged prompt in-fill + temperature sampling under pp2×tp2×dp2:
    same rng stream -> same tokens as the unsharded program."""
    cfg = GPTCfg(num_layers=2, hidden_size=64, num_heads=4, vocab_size=256,
                 seq_length=64)
    params = init_gpt(jax.random.PRNGKey(0), cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(2), (4, 8), 1,
                                255).astype(jnp.int32)
    plen = jnp.asarray([3, 8, 5, 6], jnp.int32)
    kw = dict(max_new_tokens=10, temperature=0.8, top_k=8, seed=7,
              return_lengths=True)
    want, want_n = generate(params, prompt, plen, cfg, **kw)

    mesh = build_mesh(ParallelCfg(dp=2, pp=2, tp=2))
    got, got_n = pp_generate(_place(params, mesh), prompt, plen, cfg, mesh,
                             **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(got_n), np.asarray(want_n))


def test_pp_decode_rejects_indivisible_layers(devices8):
    cfg = GPTCfg(num_layers=3, hidden_size=64, num_heads=4, vocab_size=256,
                 seq_length=64)
    params = init_gpt(jax.random.PRNGKey(0), cfg)
    mesh = build_mesh(ParallelCfg(pp=2, tp=4))
    prompt = jnp.ones((2, 4), jnp.int32)
    with pytest.raises(ValueError, match="divisible"):
        pp_generate(_place(params, mesh), prompt,
                    jnp.full((2,), 4, jnp.int32), cfg, mesh)


def test_pp_beam_search_matches_single_program(devices8):
    """Beam search under PP (round-5 gate removal): the staged cached
    forward drives the same beam program, every stage picks identical
    parents off the psum-broadcast logits, and the stage-local KV shards
    reindex with them — tokens AND scores match the single-program beam
    (reference: megatron api.py:184 beam through the PP forward path)."""
    from megatron_clip_tpu.inference.beam_search import (beam_search,
                                                         pp_beam_search)
    cfg = GPTCfg(num_layers=4, hidden_size=64, num_heads=4, vocab_size=256,
                 seq_length=64)
    params = init_gpt(jax.random.PRNGKey(0), cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(3), (1, 8), 1,
                                255).astype(jnp.int32)
    kw = dict(beam_size=4, max_new_tokens=10, eos_id=2, length_penalty=1.0)
    want_t, want_s = beam_search(params, prompt, cfg, **kw)

    mesh = build_mesh(ParallelCfg(pp=4, tp=2))
    got_t, got_s = pp_beam_search(_place(params, mesh), prompt, cfg, mesh,
                                  **kw)
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(want_t))
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=1e-5, atol=1e-5)
