"""Black-box HTTP server tests — the reference's examples/server/tests
strategy: spawn a real server on a tiny model, hit it over HTTP."""
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.models.convert_hf import convert_hf_llama
from ggml_hexagon_tpu.quant.formats import GGMLType
from ggml_hexagon_tpu.server import BatchEngine
from ggml_hexagon_tpu.server.http_server import InferenceServer, make_handler

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def http_server(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=300, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False)
    torch.manual_seed(7)
    m = transformers.LlamaForCausalLM(cfg)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    toks = ["<unk>", "<s>", "</s>"] + [f"<0x{b:02X}>" for b in range(256)] + \
           ["▁a", "▁b", "▁c"] + [f"t{i}" for i in range(38)]
    p = str(tmp_path_factory.mktemp("http") / "m.gguf")
    convert_hf_llama(sd, cfg, p, qtype=GGMLType.F32, tokenizer_fields={
        "tokenizer.ggml.model": "llama", "tokenizer.ggml.tokens": toks[:300],
        "tokenizer.ggml.scores": [0.0]*300,
        "tokenizer.ggml.token_type": [2, 3, 3] + [6]*256 + [1]*41})
    engine = BatchEngine.from_gguf(p, n_slots=2, max_seq=128,
                                   kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    srv = InferenceServer(engine)
    srv.start()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()
    srv.stop()


def post(url, path, payload):
    req = urllib.request.Request(
        url + path, json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def get(url, path):
    with urllib.request.urlopen(url + path, timeout=30) as r:
        return r.read().decode()


def test_health(http_server):
    assert json.loads(get(http_server, "/health")) == {"status": "ok"}


def test_props_and_slots(http_server):
    props = json.loads(get(http_server, "/props"))
    assert props["model"]["n_layer"] == 2
    assert props["total_slots"] == 2
    slots = json.loads(get(http_server, "/slots"))
    assert len(slots) == 2


def test_completion(http_server):
    r = post(http_server, "/completion",
             {"prompt": "a b c", "n_predict": 6, "temperature": 0})
    assert r["stop"] is True
    assert r["tokens_predicted"] >= 1
    assert isinstance(r["content"], str)
    # deterministic: same request -> same output
    r2 = post(http_server, "/completion",
              {"prompt": "a b c", "n_predict": 6, "temperature": 0})
    assert r2["content"] == r["content"]


def test_openai_completions(http_server):
    r = post(http_server, "/v1/completions",
             {"prompt": "a b", "max_tokens": 4, "temperature": 0})
    assert r["object"] == "text_completion"
    assert r["usage"]["completion_tokens"] >= 1


def test_chat_completion(http_server):
    r = post(http_server, "/v1/chat/completions",
             {"messages": [{"role": "user", "content": "a"}],
              "max_tokens": 4, "temperature": 0})
    assert r["object"] == "chat.completion"
    assert r["choices"][0]["message"]["role"] == "assistant"


def test_tokenize_roundtrip(http_server):
    r = post(http_server, "/tokenize", {"content": "a b"})
    assert isinstance(r["tokens"], list) and r["tokens"]
    r2 = post(http_server, "/detokenize", {"tokens": r["tokens"]})
    assert isinstance(r2["content"], str)


def test_concurrent_http_requests(http_server):
    results = {}

    def go(i):
        results[i] = post(http_server, "/completion",
                          {"prompt": f"a b t{i}", "n_predict": 5, "temperature": 0})

    threads = [threading.Thread(target=go, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert len(results) == 4
    for r in results.values():
        assert r["stop"] is True


def test_metrics(http_server):
    m = get(http_server, "/metrics")
    assert "ghtpu_requests_total" in m
    assert "ghtpu_tokens_generated_total" in m


def test_error_handling(http_server):
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as e:
        post(http_server, "/nope", {})
    assert e.value.code == 404


def test_slot_save_restore_endpoint(http_server, tmp_path):
    # run a request so slot 0 has contents, then save/restore via HTTP
    post(http_server, "/completion", {"prompt": "a b", "n_predict": 2, "temperature": 0})
    p = str(tmp_path / "slot0.npz")
    r = post(http_server, "/slots/0?action=save", {"filename": p})
    assert r["filename"] == p
    r2 = post(http_server, "/slots/0?action=restore", {"filename": p})
    assert r2["id_slot"] == 0


def test_chat_completion_tool_calls_wire():
    """HTTP response assembly for tool calls: scripted generation containing
    a hermes-style <tool_call> block must come back as OpenAI tool_calls
    with finish_reason=tool_calls (server.cpp oaicompat parity)."""

    class StubServer:
        template = "chatml"
        template_src = "{% if tools %}<tool_call>{% endif %}"
        api_key = None
        engine = object()  # non-None: completion endpoints enabled

        def chat_format(self):
            from ggml_hexagon_tpu.runtime.toolcall import detect_format

            return detect_format(self.template_src)

        def chat_completion(self, body):
            text = ('Checking.<tool_call>{"name": "get_weather", '
                    '"arguments": {"city": "Paris"}}</tool_call>')
            yield text, None
            yield None, {"stop_type": "eos", "tokens_evaluated": 5,
                         "tokens_predicted": 9}

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(StubServer()))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        res = post(f"http://127.0.0.1:{port}", "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "weather in Paris?"}],
            "tools": [{"type": "function",
                       "function": {"name": "get_weather"}}]})
        msg = res["choices"][0]["message"]
        assert res["choices"][0]["finish_reason"] == "tool_calls"
        assert msg["content"] == "Checking."
        tc = msg["tool_calls"][0]
        assert tc["type"] == "function"
        assert tc["function"]["name"] == "get_weather"
        assert json.loads(tc["function"]["arguments"]) == {"city": "Paris"}
    finally:
        httpd.shutdown()


def test_webui_served_at_root(http_server):
    """The built-in chat page (server/webui.py) serves at / — the
    reference's examples/server/webui analog, closing SURVEY §2.9."""
    import urllib.request

    with urllib.request.urlopen(http_server + "/", timeout=30) as r:
        assert r.status == 200
        assert "text/html" in r.headers["Content-Type"]
        body = r.read().decode()
    assert "/v1/chat/completions" in body and "<form" in body
