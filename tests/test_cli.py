"""CLI smoke tests (the reference validates its tools through ci/run.sh
pipelines: quantize -> cli -> perplexity; same loop here, in-process)."""
import json
import sys

import numpy as np
import pytest

from ggml_hexagon_tpu.cli import main
from ggml_hexagon_tpu.models.convert_hf import convert_hf_llama
from ggml_hexagon_tpu.quant.formats import GGMLType

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=300, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    toks = ["<unk>", "<s>", "</s>"] + [f"<0x{b:02X}>" for b in range(256)] + \
           ["▁hello", "▁world", "▁the", "▁a"] + [f"t{i}" for i in range(37)]
    tf = {"tokenizer.ggml.model": "llama", "tokenizer.ggml.tokens": toks[:300],
          "tokenizer.ggml.scores": [0.0]*300,
          "tokenizer.ggml.token_type": [2, 3, 3] + [6]*256 + [1]*41}
    p = str(tmp_path_factory.mktemp("cli") / "m.gguf")
    convert_hf_llama(sd, cfg, p, qtype=GGMLType.F16, tokenizer_fields=tf)
    return p


def test_cli_gguf_info(model_path, capsys):
    assert main(["gguf-info", model_path]) == 0
    out = capsys.readouterr().out
    assert "general.architecture" in out and "blk.0.attn_q.weight" in out


def test_cli_tokenize(model_path, capsys):
    assert main(["tokenize", "-m", model_path, "hello world"]) == 0
    out = capsys.readouterr().out
    # vocab lacks intermediate merge pieces -> SPM byte fallback (0x68='h')
    assert "<0x68>" in out


def test_cli_quantize_then_generate(model_path, tmp_path, capsys):
    q = str(tmp_path / "q.gguf")
    assert main(["quantize", model_path, q, "Q4_K_M"]) == 0
    capsys.readouterr()
    assert main(["generate", "-m", q, "-p", "hello world", "-n", "4",
                 "--temp", "0", "-c", "64"]) == 0


def test_cli_perplexity(model_path, tmp_path, capsys):
    f = tmp_path / "corpus.txt"
    f.write_text("hello world the a hello world " * 40)
    assert main(["perplexity", "-m", model_path, "-f", str(f), "-c", "32"]) == 0
    out = capsys.readouterr().out
    res = json.loads(out.strip().splitlines()[-1])
    assert res["ppl"] > 1.0


def test_cli_imatrix(model_path, tmp_path, capsys):
    f = tmp_path / "corpus.txt"
    f.write_text("hello world the a " * 60)
    out = str(tmp_path / "im.npz")
    assert main(["imatrix", "-m", model_path, "-f", str(f), "-o", out, "-c", "32"]) == 0
    import numpy as np
    z = np.load(out)
    assert any(k.startswith("blk.") for k in z.files)


def test_cli_gen_docs(tmp_path, capsys):
    out = str(tmp_path / "cli.md")
    assert main(["gen-docs", "-o", out]) == 0
    text = open(out).read()
    assert "# CLI reference" in text
    for cmd in ("generate", "quantize", "tts", "gguf-hash", "bench"):
        assert f"## {cmd}" in text


def test_cli_bench_batched(model_path, capsys):
    assert main(["bench", "-m", model_path, "-p", "8", "-n", "4",
                 "-b", "2", "-o", "json"]) == 0
    rows = json.loads(capsys.readouterr().out)
    tests = {r["test"] for r in rows}
    assert "pp8" in tests and "tg4" in tests and "pp8+tg4@pl2" in tests


def test_cli_chat_repl(model_path, capsys, monkeypatch):
    """simple-chat analog: two stdin turns through the templated REPL."""
    import io
    inputs = iter(["hello there", "and again", ""])
    monkeypatch.setattr("builtins.input", lambda *a: next(inputs))
    assert main(["chat", "-m", model_path, "-n", "3", "--temp", "0",
                 "-c", "256"]) == 0
    out = capsys.readouterr().out
    assert len(out.strip()) > 0  # streamed some tokens across both turns
