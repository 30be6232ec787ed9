"""REST generation server tests (reference: text_generation_server API)."""
import json
import urllib.request

import jax
import numpy as np
import pytest

from megatron_clip_tpu.models.gpt import GPTCfg, init_gpt
from megatron_clip_tpu.tokenizer import find_bpe_vocab

pytestmark = pytest.mark.skipif(find_bpe_vocab() is None,
                                reason="no BPE vocab")

TINY = GPTCfg(num_layers=2, hidden_size=64, num_heads=4, vocab_size=49408,
              seq_length=64)


@pytest.fixture(scope="module")
def server():
    from megatron_clip_tpu.tokenizer import SimpleTokenizer
    from megatron_clip_tpu.inference.server import GenerationService, run_server
    tok = SimpleTokenizer()
    params = init_gpt(jax.random.PRNGKey(0), TINY)
    service = GenerationService(params, TINY, tok, eos_id=tok.eot_token_id)
    srv = run_server(service, host="127.0.0.1", port=0)
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _put(url, payload):
    req = urllib.request.Request(url + "/api", method="PUT",
                                 data=json.dumps(payload).encode(),
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_generate_endpoint(server):
    status, out = _put(server, {"prompts": ["a photo of"],
                                "tokens_to_generate": 4,
                                "temperature": 0.0})
    assert status == 200
    assert isinstance(out["text"], list) and len(out["text"]) == 1
    assert isinstance(out["text"][0], str)


def test_bad_request(server):
    status, out = _put(server, {"prompts": []})
    assert status == 400 and "message" in out


def test_empty_prompt_rejected(server):
    """A prompt that tokenizes to zero tokens is a clean 400, not a
    silently-wrong generation (the next-token gather index would be -1,
    clamped to position 0). Beam path too."""
    status, out = _put(server, {"prompts": [""], "tokens_to_generate": 4})
    assert status == 400 and "empty prompt" in out["message"]
    status, out = _put(server, {"prompts": [""], "beam_width": 2})
    assert status == 400 and "empty prompt" in out["message"]


def test_multi_prompt_batch(server):
    status, out = _put(server, {"prompts": ["one", "two three"],
                                "tokens_to_generate": 3,
                                "temperature": 1.0, "top_k": 5})
    assert status == 200 and len(out["text"]) == 2


def test_reference_api_fields(server):
    """The megatron text_generation_server JSON surface: add_BOS,
    top_p_decay/bound, stop_token, random_seed."""
    status, out = _put(server, {
        "prompts": ["a photo of"], "tokens_to_generate": 4,
        "temperature": 0.8, "top_p": 0.9, "top_p_decay": 0.9,
        "top_p_bound": 0.1, "add_BOS": True, "random_seed": 7,
        "stop_token": 0})
    assert status == 200 and len(out["text"]) == 1


def test_beam_endpoint(server):
    status, out = _put(server, {"prompts": ["a photo of"],
                                "tokens_to_generate": 4, "beam_width": 2,
                                "length_penalty": 0.9})
    assert status == 200 and len(out["text"]) == 1 and "scores" in out
    # batch > 1 with beam is a clean 400, like the reference's assert
    status, out = _put(server, {"prompts": ["a", "b"], "beam_width": 2})
    assert status == 400


def test_prevent_newline_after_colon_rejected(server):
    status, out = _put(server, {"prompts": ["x"],
                                "prevent_newline_after_colon": True})
    assert status == 400 and "not supported" in out["message"]


def test_segments_and_logprobs_fields(server):
    """Reference response surface (text_generation_server.py:224-226):
    text = prompt+generation, segments = per-token pieces, logprobs =
    selected-token log-probs of length len(segments) - 1."""
    status, out = _put(server, {"prompts": ["a photo of"],
                                "tokens_to_generate": 4,
                                "temperature": 0.0, "logprobs": True})
    assert status == 200
    assert isinstance(out["segments"], list)
    segs = out["segments"][0]
    assert all(isinstance(s, str) for s in segs)
    # text includes the prompt (megatron prompts_plus_generations)
    assert out["text"][0].startswith("a photo of")
    lps = out["logprobs"][0]
    assert len(lps) == len(segs) - 1
    assert all(isinstance(v, float) and v <= 0.0 for v in lps)


def test_segments_without_logprobs(server):
    status, out = _put(server, {"prompts": ["a photo of"],
                                "tokens_to_generate": 2,
                                "temperature": 0.0})
    assert status == 200 and out["logprobs"] is None
    assert isinstance(out["segments"][0], list)


def test_segments_are_decoded_text(server):
    """Segments are byte-decoded surface pieces, not raw decoder-table
    entries (megatron tokenization.py detokenize_generations maps through
    byte_decoder): non-ASCII must round-trip, no mojibake or '</w>'."""
    status, out = _put(server, {"prompts": ["a café photo"],
                                "tokens_to_generate": 2,
                                "temperature": 0.0})
    assert status == 200
    segs = out["segments"][0]
    joined = "".join(segs)
    assert "café" in joined, segs
    assert "Ã" not in joined and "</w>" not in joined, segs


def test_kv_channels_generation():
    """--kv-channels (heads*head_dim != hidden) must decode: the KV-cache
    head merge is heads*head_dim wide, not model width."""
    from megatron_clip_tpu.inference.generation import greedy_generate
    import jax.numpy as jnp
    cfg = GPTCfg(num_layers=2, hidden_size=64, num_heads=4, kv_channels=24,
                 vocab_size=128, seq_length=32)
    params = init_gpt(jax.random.PRNGKey(0), cfg)
    prompt = jnp.array([[5, 6, 7, 8]], jnp.int32)
    out = greedy_generate(params, prompt, cfg, max_new_tokens=4)
    out = np.asarray(out)
    assert out.shape[1] == 8 and (out[:, :4] == np.asarray(prompt)).all()


def test_index_page(server):
    with urllib.request.urlopen(server + "/", timeout=60) as r:
        body = r.read().decode()
    assert r.status == 200 and "Text generation" in body and "/api" in body
    try:
        with urllib.request.urlopen(server + "/nope", timeout=60) as r2:
            status = r2.status
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 404
