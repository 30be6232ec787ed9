"""REST text-generation server.

Replaces the reference's Flask `MegatronServer`
(megatron/text_generation_server.py:234, tools/run_text_generation_server.py)
with a stdlib http.server (no flask in the image). Same API shape:

  PUT /api  {"prompts": [...], "tokens_to_generate": N,
             "temperature": t, "top_k": k, "top_p": p,
             "top_p_decay": d, "top_p_bound": b, "add_BOS": bool,
             "stop_token": id, "stop_on_eol": bool,
             "stop_on_double_eol": bool, "random_seed": s,
             "logprobs": bool}
  -> {"text": [prompt+generation, ...], "segments": [[piece, ...], ...],
      "logprobs": [[lp, ...], ...] | null}
  (megatron text_generation_server.py:224-226 response surface: text is the
  detokenized prompt+generation, segments its per-token pieces, logprobs
  the selected-token log-probs, len(segments[i]) - 1 each.)

  PUT /api  {"prompts": [one], "beam_width": K, "length_penalty": a}
  -> {"text": [...], "segments": [...], "scores": [best]}   (batch size 1)

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
    """Wraps a GPT model + tokenizer into a prompt->text callable.

    `mesh`: serve under a device mesh (megatron's TP×PP inference). With a
    `stage` axis > 1 decode runs the pipeline-parallel program
    (inference/pp_generation.py — params must be placed with
    stage_axis=STAGE specs); otherwise the mesh is set as ambient so the
    TP/dp sharding constraints in generation.py apply."""

    def __init__(self, params, cfg, tokenizer, eos_id: Optional[int] = None,
                 mesh=None):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.eos_id = eos_id if eos_id is not None else -1
        self.mesh = mesh
        self._lock = threading.Lock()

    def _pp_stages(self) -> int:
        from megatron_clip_tpu.parallel.mesh import STAGE
        return self.mesh.shape.get(STAGE, 1) if self.mesh is not None else 1

    MAX_TOKENS_TO_GENERATE = 1024

    def _segment(self, token: int) -> str:
        """Per-token surface string (megatron tokenization.py
        detokenize_generations word loop: decoder-table entry mapped back
        through byte_decoder for byte-level BPEs — the raw table entry is
        the byte alphabet ('cafÃ©</w>'), not text)."""
        dec = getattr(self.tokenizer, "decoder", None)
        bd = getattr(self.tokenizer, "byte_decoder", None)
        if isinstance(dec, dict) and token in dec:
            word = dec[token]
            if isinstance(bd, dict):
                word = bytearray(bd[c] for c in word if c in bd).decode(
                    "utf-8", errors="replace")
            # CLIP BPE end-of-word marker renders as a trailing space
            # (clip_bpe.py decode semantics)
            return word.replace("</w>", " ")
        try:
            return self.tokenizer.decode([int(token)])
        except Exception:  # noqa: BLE001
            return str(int(token))

    def __call__(self, prompts, tokens_to_generate=32, temperature=1.0,
                 top_k=0, top_p=0.0, seed=0, add_bos=False,
                 top_p_decay=0.0, top_p_bound=0.0, stop_token=None,
                 stop_on_eol=False, stop_on_double_eol=False,
                 return_logprobs=False):
        """Returns (texts, segments, logprobs) — the reference's
        generate_and_post_process triple (text_generation/api.py:18):
        `text` is the PROMPT + generation detokenized, `segments` the
        per-token pieces of that sequence, `logprobs` the selected-token
        log-probs (length len(segments) - 1) when asked for."""
        from megatron_clip_tpu.inference.generation import generate
        tokens_to_generate = max(1, min(int(tokens_to_generate),
                                        self.MAX_TOKENS_TO_GENERATE))
        ids = [self.tokenizer.encode(p) for p in prompts]
        if add_bos and self.eos_id >= 0:
            # megatron add_BOS prepends tokenizer.eod (tokenization.py)
            ids = [[self.eos_id] + seq for seq in ids]
        if any(len(seq) == 0 for seq in ids):
            # a zero-length prompt makes the next-token gather index -1
            # (clamped to position 0) and produces silently-wrong output;
            # megatron requires add_BOS for empty prompts (tokenization.py)
            if self.eos_id >= 0:
                raise ValueError("empty prompt (tokenizes to zero tokens); "
                                 "pass add_BOS to generate unconditionally")
            # add_BOS prepends tokenizer.eod — with no EOD token the
            # suggested remedy would still 400, so say so instead
            raise ValueError("empty prompt (tokenizes to zero tokens); "
                             "this tokenizer has no BOS/EOD token, so "
                             "empty prompts are unsupported")
        max_len = _bucket(max(len(i) for i in ids))
        batch = np.zeros((len(ids), max_len), np.int32)
        lens = np.zeros((len(ids),), np.int32)
        for r, seq in enumerate(ids):
            batch[r, :len(seq)] = seq
            lens[r] = len(seq)
        kw = dict(max_new_tokens=tokens_to_generate,
                  temperature=float(temperature), top_k=int(top_k),
                  top_p=float(top_p), eos_id=self.eos_id, seed=seed,
                  return_lengths=True, top_p_decay=float(top_p_decay),
                  top_p_bound=float(top_p_bound),
                  return_logprobs=bool(return_logprobs))
        with self._lock:  # one compiled computation at a time on the chip
            if self._pp_stages() > 1:
                from megatron_clip_tpu.inference.pp_generation import \
                    pp_generate
                res = pp_generate(
                    self.params, jnp.asarray(batch), jnp.asarray(lens),
                    self.cfg, self.mesh, **kw)
            elif self.mesh is not None:
                import jax
                with jax.sharding.set_mesh(self.mesh):
                    res = generate(self.params, jnp.asarray(batch),
                                   jnp.asarray(lens), self.cfg, **kw)
            else:
                res = generate(self.params, jnp.asarray(batch),
                               jnp.asarray(lens), self.cfg, **kw)
        if return_logprobs:
            out, n_gen, lp = res
            lp = np.asarray(lp)
        else:
            out, n_gen = res
            lp = None
        out, n_gen = np.asarray(out), np.asarray(n_gen)
        texts, segments, logprobs = [], [], []
        for r in range(len(ids)):
            gen_toks = list(out[r, lens[r]:lens[r] + n_gen[r]])
            if gen_toks and gen_toks[-1] == self.eos_id:
                gen_toks = gen_toks[:-1]  # n_gen counts the EOS; drop it
            if stop_token is not None and int(stop_token) in gen_toks:
                gen_toks = gen_toks[:gen_toks.index(int(stop_token))]
            gen_text = self.tokenizer.decode([int(t) for t in gen_toks])
            # megatron's stop_on_eol/stop_on_double_eol end generation at
            # the marker. Truncate by TOKEN position (keep the sampled ids
            # through the token that completes the marker) so segments and
            # the logprob slice stay aligned with what was actually
            # sampled — re-encoding the cut text can tokenize differently.
            marker = ("\n\n" if stop_on_double_eol else
                      "\n" if stop_on_eol else None)
            if marker is not None and marker in gen_text:
                for k in range(1, len(gen_toks) + 1):
                    prefix = self.tokenizer.decode(
                        [int(t) for t in gen_toks[:k]])
                    if marker in prefix:
                        gen_toks = gen_toks[:k]
                        gen_text = prefix[:prefix.index(marker)]
                        break
            prompt_text = self.tokenizer.decode([int(t)
                                                 for t in ids[r]])
            texts.append(prompt_text + gen_text)
            seq = [int(t) for t in ids[r]] + [int(t) for t in gen_toks]
            segments.append([self._segment(t) for t in seq])
            if lp is not None:
                # row layout: prompt logprobs at [0, len-1), generated at
                # [len-1, len-1+n); trim to len(segments)-1 like api.py:63
                row = list(map(float, lp[r, :lens[r] - 1])) + \
                    list(map(float, lp[r, lens[r] - 1:
                                       lens[r] - 1 + len(gen_toks)]))
                logprobs.append(row[:max(0, len(seq) - 1)])
        return texts, segments, (logprobs if lp is not None else None)

    def beam(self, prompts, tokens_to_generate=32, beam_width=4,
             length_penalty=1.0):
        """megatron text_generation_server beam path (batch size 1, like
        the reference's 'When doing beam_search, batch size must be 1')."""
        from megatron_clip_tpu.inference.beam_search import beam_search
        if len(prompts) != 1:
            raise ValueError("beam search requires exactly one prompt")
        tokens_to_generate = max(1, min(int(tokens_to_generate),
                                        self.MAX_TOKENS_TO_GENERATE))
        ids = self.tokenizer.encode(prompts[0])
        if not ids:
            raise ValueError("empty prompt (tokenizes to zero tokens)")
        with self._lock:
            import contextlib
            ctx = contextlib.nullcontext()
            if self.mesh is not None:
                import jax
                ctx = jax.sharding.set_mesh(self.mesh)
            # beam_search needs a concrete eos id (finished beams are frozen
            # by extending with it at zero cost); when the tokenizer has
            # none, token 0 plays that role — and the SAME id must drive the
            # truncation below, else the frozen beams' padding tokens leak
            # into the returned text
            eff_eos = self.eos_id if self.eos_id >= 0 else 0
            with ctx:
                if self._pp_stages() > 1:
                    # staged beam decode (the reference's beam loop runs
                    # through its PP forward path, api.py:184); token-exact
                    # vs the single-program beam — tests/test_pp_serving.py
                    from megatron_clip_tpu.inference.beam_search import \
                        pp_beam_search
                    toks, scores = pp_beam_search(
                        self.params, jnp.asarray([ids], jnp.int32),
                        self.cfg, self.mesh,
                        beam_size=int(beam_width),
                        max_new_tokens=tokens_to_generate,
                        eos_id=eff_eos,
                        length_penalty=float(length_penalty))
                else:
                    toks, scores = beam_search(
                        self.params, jnp.asarray([ids], jnp.int32), self.cfg,
                        beam_size=int(beam_width),
                        max_new_tokens=tokens_to_generate,
                        eos_id=eff_eos,
                        length_penalty=float(length_penalty))
        best = list(np.asarray(toks)[0, 0, len(ids):])
        if eff_eos in best:
            best = best[:best.index(eff_eos)]
        seq = [int(t) for t in ids] + [int(t) for t in best]
        text = self.tokenizer.decode([int(t) for t in ids]) + \
            self.tokenizer.decode([int(t) for t in best])
        return [text], [[self._segment(t) for t in seq]], \
            float(np.asarray(scores)[0, 0])


_INDEX_HTML = """<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8"/>
<title>megatron_clip_tpu text generation</title>
<style>
 body{font-family:sans-serif;max-width:46rem;margin:2rem auto;padding:0 1rem}
 textarea{width:100%;min-height:14rem;font-family:inherit;padding:.5rem;
          border:1px solid #ccc;border-radius:6px}
 .row{display:flex;gap:1rem;margin:.7rem 0;align-items:center}
 input[type=number]{width:6rem} button{padding:.4rem 1.2rem}
 #status{color:#777;font-size:.85rem}
</style></head><body>
<h1>Text generation</h1>
<p id="status">PUT /api playground (same JSON contract as the REST API;
the reference serves an equivalent page from megatron/static/index.html).</p>
<textarea id="box" placeholder="Type a prompt, then Generate."></textarea>
<div class="row">
 <label>tokens <input id="n" type="number" value="32" min="1"/></label>
 <label>temperature <input id="t" type="number" value="1.0" step="0.1"/></label>
 <label>top_k <input id="k" type="number" value="0" min="0"/></label>
 <button id="go">Generate</button>
</div>
<script>
const el=i=>document.getElementById(i);
el('go').onclick=async()=>{
  el('status').textContent='generating...';
  try{
    const r=await fetch('/api',{method:'PUT',
      headers:{'Content-Type':'application/json'},
      body:JSON.stringify({prompts:[el('box').value],
        tokens_to_generate:+el('n').value,temperature:+el('t').value,
        top_k:+el('k').value})});
    const j=await r.json();
    if(!r.ok){el('status').textContent='error: '+(j.message||r.status);return;}
    el('box').value=j.text[0];
    el('status').textContent='done';
  }catch(e){el('status').textContent='error: '+e;}
};
</script></body></html>
"""


def make_handler(service: GenerationService):
    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            # interactive playground at / (the reference Flask server's
            # static index.html, text_generation_server.py:236)
            if self.path in ("/", "/index.html"):
                body = _INDEX_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

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
                if req.get("prevent_newline_after_colon"):
                    raise ValueError("prevent_newline_after_colon is not "
                                     "supported (GPT2-BPE-specific logit "
                                     "mask in the reference)")
                if req.get("beam_width"):
                    texts, segments, score = service.beam(
                        prompts,
                        tokens_to_generate=req.get("tokens_to_generate", 32),
                        beam_width=req.get("beam_width"),
                        length_penalty=req.get("length_penalty", 1.0))
                    body = json.dumps({"text": texts, "segments": segments,
                                       "logprobs": None,
                                       "scores": [score]}).encode()
                else:
                    texts, segments, logprobs = service(
                        prompts,
                        tokens_to_generate=req.get("tokens_to_generate", 32),
                        temperature=req.get("temperature", 1.0),
                        top_k=req.get("top_k", 0),
                        top_p=req.get("top_p", 0.0),
                        seed=req.get("random_seed", 0),
                        add_bos=req.get("add_BOS", False),
                        top_p_decay=req.get("top_p_decay", 0.0),
                        top_p_bound=req.get("top_p_bound", 0.0),
                        stop_token=req.get("stop_token"),
                        stop_on_eol=req.get("stop_on_eol", False),
                        stop_on_double_eol=req.get("stop_on_double_eol",
                                                   False),
                        return_logprobs=req.get("logprobs", False))
                    body = json.dumps({"text": texts, "segments": segments,
                                       "logprobs": logprobs}).encode()
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
