"""Server endpoint parity: embeddings, rerank (bert mode), infill,
models/apply-template/lora-adapters, slot erase, API-key auth —
the reference's examples/server/tests/unit/test_{embedding,rerank,
infill,security,lora}.py strategy: real server over HTTP."""
import json
import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.quant.formats import GGMLType

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _spawn(srv):
    from ggml_hexagon_tpu.server.http_server import make_handler

    srv.start()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd, f"http://127.0.0.1:{httpd.server_address[1]}"


def post(url, path, payload, headers=None):
    req = urllib.request.Request(
        url + path, json.dumps(payload).encode(),
        headers={"Content-Type": "application/json", **(headers or {})})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def get(url, path, headers=None):
    req = urllib.request.Request(url + path, headers=headers or {})
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


# --- rank pooling + rerank core ------------------------------------------

def _reranker_gguf(tmp_path, two_layer_head=True):
    from ggml_hexagon_tpu.models.bert import convert_hf_bert

    cfg = transformers.BertConfig(
        vocab_size=384, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, type_vocab_size=2)
    torch.manual_seed(3)
    m = transformers.BertModel(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    rng = np.random.default_rng(5)
    if two_layer_head:
        sd["classifier.dense.weight"] = rng.normal(size=(64, 64)).astype(np.float32) * 0.1
        sd["classifier.dense.bias"] = rng.normal(size=(64,)).astype(np.float32) * 0.1
        sd["classifier.out_proj.weight"] = rng.normal(size=(1, 64)).astype(np.float32) * 0.1
        sd["classifier.out_proj.bias"] = rng.normal(size=(1,)).astype(np.float32) * 0.1
    else:
        sd["classifier.weight"] = rng.normal(size=(1, 64)).astype(np.float32) * 0.1
        sd["classifier.bias"] = rng.normal(size=(1,)).astype(np.float32) * 0.1
    toks = (["[PAD]", "[CLS]", "[SEP]", "[UNK]"]
            + [f"w{i}" for i in range(380)])
    path = str(tmp_path / "rr.gguf")
    convert_hf_bert(sd, cfg, path, qtype=GGMLType.F32, tokenizer_fields={
        "tokenizer.ggml.model": "bert", "tokenizer.ggml.tokens": toks,
        "tokenizer.ggml.scores": [0.0] * len(toks),
        "tokenizer.ggml.token_type": [3, 3, 3, 2] + [1] * 380,
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
        "tokenizer.ggml.seperator_token_id": 2,
        "tokenizer.ggml.unknown_token_id": 3,
    })
    return m, sd, path


def test_rank_pooling_matches_roberta_head(tmp_path):
    """RANK pooling = tanh(dense . h_cls + b) -> out_proj (llama-graph.cpp:1596)."""
    from ggml_hexagon_tpu.gguf import GGUFReader
    from ggml_hexagon_tpu.models.bert import (forward_bert,
                                              load_bert_weights, pool_bert)

    m, sd, path = _reranker_gguf(tmp_path)
    with GGUFReader.open(path) as r:
        cfg, weights = load_bert_weights(r)
    rng = np.random.default_rng(0)
    ids = rng.integers(4, 380, size=(3, 12))
    h = forward_bert(cfg, weights, jnp.asarray(ids, jnp.int32))
    scores = pool_bert(cfg, weights, h, pooling="rank")
    with torch.no_grad():
        ref_h = m(torch.tensor(ids)).last_hidden_state.numpy()
    ref = np.tanh(ref_h[:, 0] @ sd["classifier.dense.weight"].T
                  + sd["classifier.dense.bias"])
    ref = ref @ sd["classifier.out_proj.weight"].T + sd["classifier.out_proj.bias"]
    assert scores.shape == (3, 1)
    assert np.abs(scores - ref).max() < 2e-3


def test_rank_pooling_single_linear_head(tmp_path):
    """jina-style reranker: cls head only, no cls.output."""
    from ggml_hexagon_tpu.gguf import GGUFReader
    from ggml_hexagon_tpu.models.bert import (forward_bert,
                                              load_bert_weights, pool_bert)

    _, sd, path = _reranker_gguf(tmp_path, two_layer_head=False)
    with GGUFReader.open(path) as r:
        cfg, weights = load_bert_weights(r)
    assert weights["cls_out"] is None
    ids = np.arange(4, 16)[None, :]
    h = forward_bert(cfg, weights, jnp.asarray(ids, jnp.int32))
    scores = pool_bert(cfg, weights, h, pooling="rank")
    assert scores.shape == (1, 1) and np.isfinite(scores).all()


def test_format_rerank_layout():
    from ggml_hexagon_tpu.runtime.rerank import format_rerank

    md = {"tokenizer.ggml.bos_token_id": 1, "tokenizer.ggml.eos_token_id": 2,
          "tokenizer.ggml.seperator_token_id": 9}
    assert format_rerank(md, [10, 11], [20]) == [1, 10, 11, 2, 9, 20, 2]


# --- format_infill ---------------------------------------------------------

class _FakeTok:
    def encode(self, s, add_bos=False):
        return [100 + ord(c) % 50 for c in s][:8]


def test_format_infill_layout():
    from ggml_hexagon_tpu.runtime.infill import format_infill

    md = {"tokenizer.ggml.fim_pre_token_id": 5,
          "tokenizer.ggml.fim_suf_token_id": 6,
          "tokenizer.ggml.fim_mid_token_id": 7,
          "tokenizer.ggml.bos_token_id": 1}
    ids = format_infill(md, _FakeTok(), "def f(:", "return x", n_ctx=512)
    assert ids[0] == 1            # bos
    assert ids[1] == 5            # [FIM_PRE]
    assert 6 in ids               # [FIM_SUF]
    assert ids[-1] == 7           # [FIM_MID] last
    assert ids.index(5) < ids.index(6) < len(ids) - 1


def test_format_infill_spm_order_and_extra():
    from ggml_hexagon_tpu.runtime.infill import format_infill

    md = {"tokenizer.ggml.fim_pre_token_id": 5,
          "tokenizer.ggml.fim_suf_token_id": 6,
          "tokenizer.ggml.fim_mid_token_id": 7,
          "tokenizer.ggml.fim_rep_token_id": 8,
          "tokenizer.ggml.fim_sep_token_id": 9,
          "tokenizer.ggml.add_bos_token": False}
    ids = format_infill(md, _FakeTok(), "pre", "suf",
                        input_extra=[{"filename": "a.py", "text": "ctx"}],
                        spm_infill=True, n_batch=64, n_ctx=512)
    assert ids[0] == 8                       # repo-level [FIM_REP] first
    assert ids.index(6) < ids.index(5)       # suffix-first (SPM order)
    assert ids[-1] == 7
    assert 9 in ids                          # [FIM_SEP] per chunk


def test_format_infill_requires_fim_tokens():
    from ggml_hexagon_tpu.runtime.infill import format_infill

    with pytest.raises(ValueError):
        format_infill({}, _FakeTok(), "a", "b")


# --- embedding/rerank HTTP mode -------------------------------------------

@pytest.fixture(scope="module")
def rerank_server(tmp_path_factory):
    from ggml_hexagon_tpu.server.http_server import build_server

    tmp = tmp_path_factory.mktemp("rrsrv")
    _, _, path = _reranker_gguf(tmp)
    srv = build_server(path)
    assert srv.engine is None and srv.embed_core is not None
    httpd, url = _spawn(srv)
    yield url
    httpd.shutdown()
    srv.stop()


def test_rerank_http_jina_format(rerank_server):
    r = post(rerank_server, "/rerank",
             {"query": "w1 w2", "documents": ["w1 w2 w3", "w9", "w1"]})
    assert r["object"] == "list"
    assert len(r["results"]) == 3
    assert {x["index"] for x in r["results"]} == {0, 1, 2}
    assert all(isinstance(x["relevance_score"], float) for x in r["results"])
    assert r["usage"]["prompt_tokens"] > 0


def test_rerank_http_tei_format(rerank_server):
    r = post(rerank_server, "/v1/rerank",
             {"query": "w1", "texts": ["w2", "w3"], "return_text": True})
    assert isinstance(r, list) and len(r) == 2
    assert r[0]["text"] == "w2" and "score" in r[0]


def test_embeddings_http_bert_mode(rerank_server):
    r = post(rerank_server, "/v1/embeddings", {"input": ["w1 w2", "w5"]})
    assert r["object"] == "list" and len(r["data"]) == 2
    v = np.array(r["data"][0]["embedding"])
    assert v.shape == (64,)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5  # normalized
    # native shape
    r2 = post(rerank_server, "/embedding", {"content": "w1"})
    assert r2[0]["index"] == 0 and len(r2[0]["embedding"]) == 64


def test_completion_rejected_in_embedding_mode(rerank_server):
    with pytest.raises(urllib.error.HTTPError) as e:
        post(rerank_server, "/completion", {"prompt": "x"})
    assert e.value.code == 501


def test_props_and_models_bert_mode(rerank_server):
    p = get(rerank_server, "/props")
    assert p["model"]["n_embd"] == 64 and p["pooling"] == "cls"
    m = get(rerank_server, "/v1/models")
    assert m["data"][0]["id"].endswith(".gguf")


# --- decoder-server additions ----------------------------------------------

@pytest.fixture(scope="module")
def decoder_server(tmp_path_factory):
    from ggml_hexagon_tpu.models.convert_hf import convert_hf_llama
    from ggml_hexagon_tpu.server import BatchEngine
    from ggml_hexagon_tpu.server.http_server import InferenceServer

    cfg = transformers.LlamaConfig(
        vocab_size=300, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False)
    torch.manual_seed(7)
    m = transformers.LlamaForCausalLM(cfg)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    toks = ["<unk>", "<s>", "</s>"] + [f"<0x{b:02X}>" for b in range(256)] + \
           ["▁a", "▁b", "▁c"] + [f"t{i}" for i in range(38)]
    p = str(tmp_path_factory.mktemp("dsrv") / "m.gguf")
    convert_hf_llama(sd, cfg, p, qtype=GGMLType.F32, tokenizer_fields={
        "tokenizer.ggml.model": "llama", "tokenizer.ggml.tokens": toks[:300],
        "tokenizer.ggml.scores": [0.0] * 300,
        "tokenizer.ggml.token_type": [2, 3, 3] + [6] * 256 + [1] * 41,
        # FIM specials point at spare vocab slots -> /infill works
        "tokenizer.ggml.fim_pre_token_id": 262,
        "tokenizer.ggml.fim_suf_token_id": 263,
        "tokenizer.ggml.fim_mid_token_id": 264,
    })
    engine = BatchEngine.from_gguf(p, n_slots=2, max_seq=128,
                                   kv_dtype=jnp.float32,
                                   compute_dtype=jnp.float32)
    srv = InferenceServer(engine, api_key="sk-test", model_path=p)
    httpd, url = _spawn(srv)
    yield url
    httpd.shutdown()
    srv.stop()


AUTH = {"Authorization": "Bearer sk-test"}


def test_api_key_required(decoder_server):
    # public endpoints stay open
    assert get(decoder_server, "/health")["status"] == "ok"
    assert get(decoder_server, "/v1/models")["object"] == "list"
    # everything else is 401 without the key
    with pytest.raises(urllib.error.HTTPError) as e:
        post(decoder_server, "/completion", {"prompt": "a"})
    assert e.value.code == 401
    with pytest.raises(urllib.error.HTTPError) as e:
        get(decoder_server, "/props")
    assert e.value.code == 401
    # wrong key
    with pytest.raises(urllib.error.HTTPError) as e:
        post(decoder_server, "/completion", {"prompt": "a"},
             headers={"Authorization": "Bearer wrong"})
    assert e.value.code == 401


def test_completions_alias_with_key(decoder_server):
    r = post(decoder_server, "/completions",
             {"prompt": "a b", "n_predict": 2, "temperature": 0},
             headers=AUTH)
    assert r["stop"] is True


def test_infill_http(decoder_server):
    r = post(decoder_server, "/infill",
             {"input_prefix": "a b", "input_suffix": "c", "n_predict": 2,
              "temperature": 0}, headers=AUTH)
    assert r["stop"] is True and isinstance(r["content"], str)


def test_decoder_embeddings(decoder_server):
    r = post(decoder_server, "/v1/embeddings", {"input": "a b c"},
             headers=AUTH)
    assert len(r["data"][0]["embedding"]) == 64


def test_apply_template(decoder_server):
    r = post(decoder_server, "/apply-template",
             {"messages": [{"role": "user", "content": "hi"}]}, headers=AUTH)
    assert "hi" in r["prompt"]


def test_slot_erase(decoder_server):
    r = post(decoder_server, "/slots/0?action=erase", {}, headers=AUTH)
    assert r["id_slot"] == 0 and "n_erased" in r


def test_lora_adapters_empty(decoder_server):
    assert get(decoder_server, "/lora-adapters", headers=AUTH) == []


def test_tokenize_with_pieces(decoder_server):
    r = post(decoder_server, "/tokenize",
             {"content": "a b", "with_pieces": True}, headers=AUTH)
    assert all("id" in t and "piece" in t for t in r["tokens"])
