"""REST text-generation server.

Replaces the reference's Flask `MegatronServer`
(megatron/text_generation_server.py:234, tools/run_text_generation_server.py)
with a stdlib http.server (no flask in the image). Same API shape:

  PUT /api  {"prompts": [...], "tokens_to_generate": N,
             "temperature": t, "top_k": k, "top_p": p}
  -> {"text": [...], "segments": [...], "logprobs": null}

Generation runs as one compiled computation per (batch, prompt_len,
max_new_tokens) bucket (see inference/generation.py); prompt lengths are
bucketed to powers of two to bound recompilation.
"""
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import jax.numpy as jnp
import numpy as np


def _bucket(n: int) -> int:
    b = 16
    while b < n:
        b *= 2
    return b


class GenerationService:
    """Wraps a GPT model + tokenizer into a prompt->text callable."""

    def __init__(self, params, cfg, tokenizer, eos_id: Optional[int] = None):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.eos_id = eos_id if eos_id is not None else -1
        self._lock = threading.Lock()

    MAX_TOKENS_TO_GENERATE = 1024

    def __call__(self, prompts, tokens_to_generate=32, temperature=1.0,
                 top_k=0, top_p=0.0, seed=0):
        from megatron_clip_tpu.inference.generation import generate
        tokens_to_generate = max(1, min(int(tokens_to_generate),
                                        self.MAX_TOKENS_TO_GENERATE))
        ids = [self.tokenizer.encode(p) for p in prompts]
        max_len = _bucket(max(len(i) for i in ids))
        batch = np.zeros((len(ids), max_len), np.int32)
        lens = np.zeros((len(ids),), np.int32)
        for r, seq in enumerate(ids):
            batch[r, :len(seq)] = seq
            lens[r] = len(seq)
        with self._lock:  # one compiled computation at a time on the chip
            out, n_gen = generate(
                self.params, jnp.asarray(batch), jnp.asarray(lens),
                self.cfg, max_new_tokens=tokens_to_generate,
                temperature=float(temperature), top_k=int(top_k),
                top_p=float(top_p), eos_id=self.eos_id, seed=seed,
                return_lengths=True)
        out, n_gen = np.asarray(out), np.asarray(n_gen)
        texts = []
        for r in range(len(ids)):
            toks = list(out[r, lens[r]:lens[r] + n_gen[r]])
            if toks and toks[-1] == self.eos_id:
                toks = toks[:-1]   # n_gen counts the EOS; don't render it
            texts.append(self.tokenizer.decode([int(t) for t in toks]))
        return texts


def make_handler(service: GenerationService):
    class Handler(BaseHTTPRequestHandler):
        def do_PUT(self):
            if self.path.rstrip("/") != "/api":
                self.send_error(404)
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length))
                prompts = req["prompts"]
                if not isinstance(prompts, list) or not prompts:
                    raise ValueError("prompts must be a non-empty list")
                texts = service(
                    prompts,
                    tokens_to_generate=req.get("tokens_to_generate", 32),
                    temperature=req.get("temperature", 1.0),
                    top_k=req.get("top_k", 0), top_p=req.get("top_p", 0.0),
                    seed=req.get("random_seed", 0))
                body = json.dumps({"text": texts, "segments": None,
                                   "logprobs": None}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception as e:  # noqa: BLE001 — client error surface
                body = json.dumps({"message": str(e)}).encode()
                self.send_response(400)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        do_POST = do_PUT

        def log_message(self, *a):  # quiet
            pass

    return Handler


def run_server(service: GenerationService, host: str = "127.0.0.1",
               port: int = 5000) -> ThreadingHTTPServer:
    server = ThreadingHTTPServer((host, port), make_handler(service))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server
