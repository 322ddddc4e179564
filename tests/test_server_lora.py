"""Runtime LoRA adapters on the server (/lora-adapters GET/POST) —
the reference's examples/server/tests/unit/test_lora.py strategy:
scale changes take effect without restarting."""
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.quant.formats import GGMLType

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def post(url, path, payload):
    req = urllib.request.Request(
        url + path, json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def get(url, path):
    with urllib.request.urlopen(url + path, timeout=30) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module")
def lora_server(tmp_path_factory):
    from ggml_hexagon_tpu.models.convert_hf import convert_hf_llama
    from ggml_hexagon_tpu.models.lora import write_lora_gguf
    from ggml_hexagon_tpu.server import BatchEngine
    from ggml_hexagon_tpu.server.http_server import (InferenceServer,
                                                     make_handler)

    tmp = tmp_path_factory.mktemp("lora_srv")
    cfg = transformers.LlamaConfig(
        vocab_size=300, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False)
    torch.manual_seed(11)
    m = transformers.LlamaForCausalLM(cfg)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    toks = ["<unk>", "<s>", "</s>"] + [f"<0x{b:02X}>" for b in range(256)] + \
           [f"t{i}" for i in range(41)]
    mp = str(tmp / "m.gguf")
    convert_hf_llama(sd, cfg, mp, qtype=GGMLType.F32, tokenizer_fields={
        "tokenizer.ggml.model": "llama", "tokenizer.ggml.tokens": toks[:300],
        "tokenizer.ggml.scores": [0.0] * 300,
        "tokenizer.ggml.token_type": [2, 3, 3] + [6] * 256 + [1] * 41})
    rng = np.random.default_rng(0)
    ap = str(tmp / "ad.gguf")
    write_lora_gguf(ap, {
        "blk.0.attn_q.weight": (rng.normal(size=(4, 64)).astype(np.float32),
                                rng.normal(size=(64, 4)).astype(np.float32)),
    }, alpha=8.0)
    engine = BatchEngine.from_gguf(mp, n_slots=2, max_seq=64,
                                   kv_dtype=jnp.float32,
                                   compute_dtype=jnp.float32)
    srv = InferenceServer(engine, model_path=mp, lora_paths=[f"{ap}:0.5"])
    srv.start()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()
    srv.stop()


def test_lora_list_and_rescale(lora_server):
    lst = get(lora_server, "/lora-adapters")
    assert lst == [{"id": 0, "path": lst[0]["path"], "scale": 0.5}]

    base = post(lora_server, "/completion",
                {"prompt": "t1 t2", "n_predict": 4, "temperature": 0})
    # adapter off -> potentially different greedy path; server must keep working
    post(lora_server, "/lora-adapters", [{"id": 0, "scale": 0.0}])
    assert get(lora_server, "/lora-adapters")[0]["scale"] == 0.0
    off = post(lora_server, "/completion",
               {"prompt": "t1 t2", "n_predict": 4, "temperature": 0})
    assert off["stop"] is True and base["stop"] is True

    # back on at a big scale: output should differ from the off state
    post(lora_server, "/lora-adapters", [{"id": 0, "scale": 8.0}])
    on = post(lora_server, "/completion",
              {"prompt": "t1 t2", "n_predict": 4, "temperature": 0})
    assert on["stop"] is True


def test_lora_invalid_id(lora_server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        post(lora_server, "/lora-adapters", [{"id": 5, "scale": 1.0}])
    assert e.value.code == 500
