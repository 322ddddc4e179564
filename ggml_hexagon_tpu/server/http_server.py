"""HTTP inference server — llama-server analog (examples/server/server.cpp).

Endpoints (matching the reference's API surface):
  POST /completion           llama.cpp-native completion (+ SSE streaming)
  POST /v1/completions       OpenAI completions
  POST /v1/chat/completions  OpenAI chat (chat template applied) (+ SSE)
  POST /tokenize /detokenize
  GET  /health /metrics /slots /props

stdlib ThreadingHTTPServer + a scheduler thread driving BatchEngine ticks
(the reference's server_queue::start_loop).  Grammar / JSON-schema
constraints accepted via "grammar" / "json_schema" request fields.
"""
from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..runtime.chat import apply_chat_template, template_from_gguf
from ..runtime.grammar import GrammarSampler, parse_gbnf
from ..runtime.json_schema import json_schema_to_gbnf
from ..runtime.sampling import make_chain
from ..tokenizer import build_tokenizer
from .batch_engine import BatchEngine, SlotState


class InferenceServer:
    def __init__(self, engine: BatchEngine):
        self.engine = engine
        self.tokenizer = build_tokenizer(engine.vocab)
        self.template, self.template_src = template_from_gguf(
            getattr(engine, "metadata", {})
        )
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self.t_start = time.time()

    def _loop(self):
        while not self._stop.is_set():
            with self.engine.lock:
                worked = self.engine.step() if self.engine.has_work() else False
            if not worked:
                time.sleep(0.002)

    def start(self):
        self._thread.start()

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=5)

    # -- request handling ----------------------------------------------------

    def _make_sampler(self, body: dict):
        grammar_sampler = None
        if body.get("json_schema"):
            g = parse_gbnf(json_schema_to_gbnf(body["json_schema"]))
            grammar_sampler = GrammarSampler.from_vocab(g, self.engine.vocab)
        elif body.get("grammar"):
            g = parse_gbnf(body["grammar"])
            grammar_sampler = GrammarSampler.from_vocab(g, self.engine.vocab)
        return make_chain(
            temp=float(body.get("temperature", 0.8)),
            top_k=int(body.get("top_k", 40)),
            top_p=float(body.get("top_p", 0.95)),
            min_p=float(body.get("min_p", 0.05)),
            penalty_repeat=float(body.get("repeat_penalty", 1.0)),
            penalty_last_n=int(body.get("repeat_last_n", 64)),
            seed=int(body.get("seed", 42)),
            grammar_sampler=grammar_sampler,
        )

    def completion(self, body: dict):
        """Returns an iterator of (text_piece, done_payload|None)."""
        prompt = body.get("prompt", "")
        ids = (
            self.tokenizer.encode(prompt)
            if isinstance(prompt, str)
            else [int(t) for t in prompt]
        )
        n_predict = int(body.get("n_predict", body.get("max_tokens", 64)))
        sampler = self._make_sampler(body)
        stop_strings = body.get("stop") or []
        if isinstance(stop_strings, str):
            stop_strings = [stop_strings]
        q = self.engine.submit(
            ids, n_predict=n_predict, sampler=sampler, stop_strings=stop_strings
        )
        t0 = time.perf_counter()
        n = 0

        def gen():
            nonlocal n
            while True:
                tok, fin = q.get(timeout=600)
                if tok is None:
                    yield None, {
                        "stop": True,
                        "stop_type": fin,
                        "tokens_predicted": n,
                        "tokens_evaluated": len(ids),
                        "timings": {
                            "predicted_ms": (time.perf_counter() - t0) * 1e3,
                            "predicted_per_second": n / max(1e-9, time.perf_counter() - t0),
                        },
                    }
                    return
                n += 1
                yield self.tokenizer.decode([tok], skip_special=False), None

        return gen()

    def chat_completion(self, body: dict):
        msgs = list(body["messages"])
        if body.get("tools"):
            # inject the tool list as a leading system block (chat.cpp's
            # per-format prompt additions) so any template carries it
            from ..runtime.toolcall import detect_format, render_tools_prompt

            fmt = detect_format(self.template_src or self.template)
            block = render_tools_prompt(body["tools"], fmt)
            if msgs and msgs[0].get("role") == "system":
                msgs[0] = dict(msgs[0],
                               content=block + (msgs[0].get("content") or ""))
            else:
                msgs.insert(0, {"role": "system", "content": block})
        prompt = apply_chat_template(
            msgs, self.template, add_assistant=True, jinja_source=self.template_src
        )
        sub = dict(body)
        sub["prompt"] = prompt
        sub.setdefault("n_predict", body.get("max_tokens", 128))
        return self.completion(sub)

    def chat_format(self) -> str:
        from ..runtime.toolcall import detect_format

        return detect_format(self.template_src or self.template)

    # -- metrics -------------------------------------------------------------

    def props(self) -> dict:
        c = self.engine.cfg
        return {
            "model": {
                "n_vocab": c.n_vocab, "n_embd": c.n_embd, "n_layer": c.n_layer,
                "n_head": c.n_head, "n_head_kv": c.n_head_kv,
            },
            "total_slots": self.engine.n_slots,
            "chat_template": self.template,
        }

    def slots(self) -> list:
        return [
            {
                "id": s.id,
                "state": s.state.name,
                "n_past": s.n_past,
                "n_decoded": s.n_decoded,
            }
            for s in self.engine.slots
        ]

    def metrics_text(self) -> str:
        m = self.engine.metrics
        lines = [
            f"ghtpu_requests_total {m['n_requests']}",
            f"ghtpu_tokens_generated_total {m['n_tokens_generated']}",
            f"ghtpu_prompt_tokens_total {m['n_prompt_tokens']}",
            f"ghtpu_decode_seconds_total {m['t_decode']:.3f}",
            f"ghtpu_prompt_seconds_total {m['t_prompt']:.3f}",
            f"ghtpu_uptime_seconds {time.time() - self.t_start:.0f}",
        ]
        return "\n".join(lines) + "\n"


def make_handler(server: InferenceServer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _json(self, code: int, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _read_body(self) -> dict:
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n) or b"{}")

        def do_GET(self):
            if self.path == "/health":
                self._json(200, {"status": "ok"})
            elif self.path == "/metrics":
                body = server.metrics_text().encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/slots":
                self._json(200, server.slots())
            elif self.path == "/props":
                self._json(200, server.props())
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            try:
                import re as _re

                m = _re.match(r"^/slots/(\d+)\?action=(save|restore)$", self.path)
                if m:
                    body = self._read_body()
                    sid = int(m.group(1))
                    path = body.get("filename", f"/tmp/slot_{sid}.npz")
                    with server.engine.lock:
                        if m.group(2) == "save":
                            server.engine.save_slot(sid, path)
                        else:
                            server.engine.restore_slot(sid, path)
                    self._json(200, {"id_slot": sid, "filename": path})
                    return
                body = self._read_body()
                if self.path == "/completion":
                    self._completion(body, openai=False)
                elif self.path == "/v1/completions":
                    self._completion(body, openai=True)
                elif self.path == "/v1/chat/completions":
                    self._chat(body)
                elif self.path == "/tokenize":
                    ids = server.tokenizer.encode(body.get("content", ""))
                    self._json(200, {"tokens": ids})
                elif self.path == "/detokenize":
                    text = server.tokenizer.decode(body.get("tokens", []))
                    self._json(200, {"content": text})
                else:
                    self._json(404, {"error": "not found"})
            except Exception as e:  # noqa: BLE001 — surface as HTTP 500
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

        def _stream(self, pieces, wrap):
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.end_headers()
            for piece, done in pieces:
                payload = wrap(piece, done)
                self.wfile.write(b"data: " + json.dumps(payload).encode() + b"\n\n")
                self.wfile.flush()
            self.wfile.write(b"data: [DONE]\n\n")

        def _completion(self, body, openai: bool):
            pieces = server.completion(body)
            if body.get("stream"):
                self._stream(
                    pieces,
                    lambda p, d: (
                        {"content": p or "", "stop": bool(d), **(d or {})}
                        if not openai
                        else {"choices": [{"text": p or "",
                                           "finish_reason": d and d.get("stop_type")}]}
                    ),
                )
                return
            text = ""
            final = {}
            for p, d in pieces:
                if p is not None:
                    text += p
                else:
                    final = d
            if openai:
                self._json(200, {
                    "object": "text_completion",
                    "choices": [{"text": text, "index": 0,
                                 "finish_reason": final.get("stop_type")}],
                    "usage": {
                        "prompt_tokens": final.get("tokens_evaluated", 0),
                        "completion_tokens": final.get("tokens_predicted", 0),
                    },
                })
            else:
                self._json(200, {"content": text, **final})

        def _chat(self, body):
            pieces = server.chat_completion(body)
            if body.get("stream"):
                self._stream(
                    pieces,
                    lambda p, d: {
                        "object": "chat.completion.chunk",
                        "choices": [{
                            "delta": ({"content": p} if p is not None else {}),
                            "finish_reason": d and d.get("stop_type"),
                        }],
                    },
                )
                return
            text = ""
            final = {}
            for p, d in pieces:
                if p is not None:
                    text += p
                else:
                    final = d
            msg = {"role": "assistant", "content": text}
            finish = final.get("stop_type")
            if body.get("tools"):
                from ..runtime.toolcall import (parse_chat_output,
                                                tool_calls_json)

                parsed = parse_chat_output(text, server.chat_format())
                msg["content"] = parsed.content or None
                if parsed.reasoning:
                    msg["reasoning_content"] = parsed.reasoning
                if parsed.tool_calls:
                    msg["tool_calls"] = tool_calls_json(parsed)
                    finish = "tool_calls"
            self._json(200, {
                "object": "chat.completion",
                "choices": [{
                    "index": 0,
                    "message": msg,
                    "finish_reason": finish,
                }],
                "usage": {
                    "prompt_tokens": final.get("tokens_evaluated", 0),
                    "completion_tokens": final.get("tokens_predicted", 0),
                },
            })

    return Handler


def serve(gguf_path: str, host: str = "127.0.0.1", port: int = 8080,
          n_slots: int = 4, max_seq: int = 2048, **engine_kw):
    engine = BatchEngine.from_gguf(gguf_path, n_slots=n_slots, max_seq=max_seq,
                                   **engine_kw)
    srv = InferenceServer(engine)
    srv.start()
    httpd = ThreadingHTTPServer((host, port), make_handler(srv))
    print(f"listening on http://{host}:{port} ({n_slots} slots, ctx {max_seq})")
    try:
        httpd.serve_forever()
    finally:
        srv.stop()


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="inference server")
    p.add_argument("-m", "--model", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--slots", type=int, default=4)
    p.add_argument("-c", "--ctx-size", type=int, default=2048)
    a = p.parse_args(argv)
    serve(a.model, a.host, a.port, a.slots, a.ctx_size)


if __name__ == "__main__":
    main()
