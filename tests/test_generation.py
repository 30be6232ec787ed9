"""KV-cache generation tests: cached decode must match full re-forward
(the reference's InferenceParams contract, megatron/text_generation/
forward_step.py), plus sampling behaviors."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from megatron_clip_tpu.models.gpt import GPTCfg, init_gpt, apply_gpt
from megatron_clip_tpu.inference.generation import (
    generate, greedy_generate, KVCache, _forward_cached)

TINY = GPTCfg(num_layers=2, hidden_size=64, num_heads=4, vocab_size=128,
              seq_length=64)


@pytest.mark.parametrize("variant", ["learned", "rope"])
def test_cached_prefill_matches_full_forward(variant):
    cfg = dataclasses.replace(TINY, position_embedding=variant)
    params = init_gpt(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 128)
    cache = KVCache.create(cfg, 2, 32, dtype=jnp.float32)
    logits_cached, _ = _forward_cached(params, tokens, 0, cache, cfg,
                                       jnp.float32)
    logits_full = apply_gpt(params, tokens, cfg, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(logits_cached),
                               np.asarray(logits_full), rtol=2e-4, atol=2e-4)


def test_greedy_matches_unrolled_argmax():
    """Greedy generation with cache == repeated full forward + argmax."""
    params = init_gpt(jax.random.PRNGKey(0), TINY)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, 128)

    out = greedy_generate(params, prompt, TINY, max_new_tokens=6)
    # oracle: argmax loop with full recompute
    toks = prompt
    for _ in range(6):
        logits = apply_gpt(params, toks, TINY, compute_dtype=jnp.float32)
        nxt = jnp.argmax(logits[:, -1], axis=-1)[:, None]
        toks = jnp.concatenate([toks, nxt.astype(jnp.int32)], axis=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(toks))


@pytest.mark.parametrize("variant", ["learned", "rope"])
def test_ragged_prompts_match_unpadded(variant):
    """A short row in a padded batch must generate exactly what it would
    generate alone, unpadded: in-fill at prompt_len, per-row positions, no
    attention into the pad region of the cache (megatron in-fill semantics)."""
    cfg = dataclasses.replace(TINY, position_embedding=variant)
    params = init_gpt(jax.random.PRNGKey(0), cfg)
    long_p = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 1, 128)
    short_p = jax.random.randint(jax.random.PRNGKey(2), (1, 5), 1, 128)

    batch = jnp.zeros((2, 12), jnp.int32)
    batch = batch.at[0].set(long_p[0])
    batch = batch.at[1, :5].set(short_p[0])
    plen = jnp.array([12, 5], jnp.int32)
    out, n_gen = generate(params, batch, plen, cfg, max_new_tokens=6,
                          temperature=0.0, return_lengths=True)
    out = np.asarray(out)
    assert list(np.asarray(n_gen)) == [6, 6]

    solo = generate(params, short_p, jnp.array([5], jnp.int32), cfg,
                    max_new_tokens=6, temperature=0.0)
    np.testing.assert_array_equal(out[1, 5:11], np.asarray(solo)[0, 5:11])
    solo_long = generate(params, long_p, jnp.array([12], jnp.int32), cfg,
                         max_new_tokens=6, temperature=0.0)
    np.testing.assert_array_equal(out[0], np.asarray(solo_long)[0])


def test_sampling_modes_run():
    params = init_gpt(jax.random.PRNGKey(0), TINY)
    prompt = jnp.ones((2, 4), jnp.int32)
    plen = jnp.full((2,), 4, jnp.int32)
    for kw in ({"temperature": 1.0}, {"temperature": 0.8, "top_k": 10},
               {"temperature": 1.0, "top_p": 0.9}):
        out = generate(params, prompt, plen, TINY, max_new_tokens=4, **kw)
        arr = np.asarray(out)
        assert arr.shape == (2, 8)
        assert (arr[:, 4:] >= 0).all() and (arr[:, 4:] < 128).all()


def test_eos_stops_generation():
    params = init_gpt(jax.random.PRNGKey(0), TINY)
    prompt = jnp.ones((1, 4), jnp.int32)
    plen = jnp.full((1,), 4, jnp.int32)
    out = generate(params, prompt, plen, TINY, max_new_tokens=8,
                   temperature=0.0, eos_id=int(np.asarray(
                       greedy_generate(params, prompt, TINY, 1))[0, 4]))
    arr = np.asarray(out)[0, 4:]
    # first generated token is the eos itself; everything after is padding 0
    assert (arr[1:] == 0).all()


def test_generation_under_tp_mesh(devices8):
    """Serving under a TP-sharded mesh (megatron's TP inference,
    text_generation/communication.py): greedy decode with tensor-parallel
    params + sharded KV cache must match the single-device decode
    token-for-token."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from megatron_clip_tpu.config import ParallelCfg
    from megatron_clip_tpu.models.gpt import GPTCfg, init_gpt, gpt_param_specs
    from megatron_clip_tpu.inference.generation import greedy_generate
    from megatron_clip_tpu.parallel import build_mesh
    from megatron_clip_tpu.parallel.sharding import make_sharding_tree

    cfg = GPTCfg(num_layers=2, hidden_size=64, num_heads=4, vocab_size=256,
                 seq_length=64)
    params = init_gpt(jax.random.PRNGKey(0), cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 1,
                                255).astype(jnp.int32)
    want = np.asarray(greedy_generate(params, prompt, cfg,
                                      max_new_tokens=12))

    mesh = build_mesh(ParallelCfg(dp=2, tp=2, fsdp=2))
    sparams = jax.device_put(params,
                             make_sharding_tree(mesh, gpt_param_specs(params)))
    with jax.sharding.set_mesh(mesh):
        got = np.asarray(greedy_generate(sparams, prompt, cfg,
                                         max_new_tokens=12))
    np.testing.assert_array_equal(got, want)


def test_int8_decode_weights_close_to_fp():
    """quantize_decode_weights + the int8 _dense path: per-(layer,channel)
    int8 weights must keep decode logits close to the fp path (serving
    quantization — the reference's fp8/TE inference analogue)."""
    from megatron_clip_tpu.models.gpt import GPTCfg, init_gpt
    from megatron_clip_tpu.inference.generation import (
        KVCache, _forward_cached)
    from megatron_clip_tpu.ops.quant import quantize_decode_weights

    cfg = GPTCfg(num_layers=2, hidden_size=64, num_heads=4, vocab_size=256,
                 seq_length=32, tie_embeddings=False)
    params = init_gpt(jax.random.PRNGKey(0), cfg)
    qparams = quantize_decode_weights(params)

    # structure: block matmul weights and lm_head quantized, norms/embeds fp
    assert set(qparams["blocks"]["attn"]["wqkv"].keys()) == {"q", "scale"}
    assert qparams["blocks"]["attn"]["wqkv"]["q"].dtype == jnp.int8
    assert qparams["blocks"]["attn"]["wqkv"]["scale"].shape == \
        (2, 3 * cfg.hidden_size)                # per-(layer, out-channel)
    assert set(qparams["lm_head"].keys()) == {"q", "scale"}
    assert qparams["tok_embed"].dtype == params["tok_embed"].dtype

    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 1,
                              255).astype(jnp.int32)
    cache = KVCache.create(cfg, 2, 32, dtype=jnp.float32)
    ref, _ = _forward_cached(params, toks, 0, cache, cfg, jnp.float32)
    got, _ = _forward_cached(qparams, toks, 0, cache, cfg, jnp.float32)
    ref, got = np.asarray(ref), np.asarray(got)
    denom = np.abs(ref).max()
    assert np.abs(got - ref).max() / denom < 0.08, \
        (np.abs(got - ref).max(), denom)
    # and top-1 next-token choice agrees for most positions
    agree = (ref.argmax(-1) == got.argmax(-1)).mean()
    assert agree > 0.9, agree


def test_int8_greedy_generate_runs():
    from megatron_clip_tpu.models.gpt import GPTCfg, init_gpt
    from megatron_clip_tpu.inference.generation import greedy_generate
    from megatron_clip_tpu.ops.quant import quantize_decode_weights

    cfg = GPTCfg(num_layers=2, hidden_size=64, num_heads=4, vocab_size=256,
                 seq_length=64)
    params = quantize_decode_weights(init_gpt(jax.random.PRNGKey(0), cfg))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 1,
                                255).astype(jnp.int32)
    out = np.asarray(greedy_generate(params, prompt, cfg, max_new_tokens=8))
    assert out.shape == (2, 16)
    assert (out[:, 8:] > 0).all()


def test_return_logprobs_matches_recompute():
    """generate(return_logprobs=True): lp[:, j] must equal the log-softmax
    probability of out[:, j+1] under a fresh full-sequence forward
    (megatron text_generation/generation.py:78 output_log_probs)."""
    from megatron_clip_tpu.inference.generation import (
        KVCache, _forward_cached, generate)

    cfg = TINY
    params = init_gpt(jax.random.PRNGKey(3), cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(4), (2, 6), 1,
                                200).astype(jnp.int32)
    plen = jnp.asarray([6, 4], jnp.int32)
    out, n_gen, lp = generate(params, prompt, plen, cfg, max_new_tokens=5,
                              temperature=0.0, return_lengths=True,
                              return_logprobs=True)
    out, n_gen, lp = np.asarray(out), np.asarray(n_gen), np.asarray(lp)

    full = jnp.asarray(out)
    cache = KVCache.create(cfg, 2, out.shape[1])
    logits, _ = _forward_cached(params, full, 0, cache, cfg, jnp.float32)
    want = np.asarray(jax.nn.log_softmax(np.asarray(logits), axis=-1))
    for r in range(2):
        # contiguous real region: prompt [0, plen) then in-filled generation
        for j in list(range(int(plen[r]) - 1)) + \
                list(range(int(plen[r]) - 1,
                           int(plen[r]) - 1 + int(n_gen[r]))):
            tgt = out[r, j + 1] if j + 1 < out.shape[1] else None
            if tgt is None:
                continue
            # positions inside the pad gap of row 1 are undefined; for row
            # layout here generation in-fills at plen so [plen-1, ...) are
            # the generated-token logprobs
            if j >= int(plen[r]) - 1:
                tgt = out[r, int(plen[r]) + (j - (int(plen[r]) - 1))]
            np.testing.assert_allclose(
                lp[r, j], want[r, j, int(tgt)], rtol=2e-4, atol=2e-4)
