"""Tool-suite parity: gguf-hash/split-merge, quantize-stats, gbnf-validator,
export-lora, cvector-generator, embedding/retrieval/infill/save-load-state
CLIs (reference examples: gguf-hash, gguf-split, quantize-stats,
gbnf-validator, export-lora, cvector-generator, embedding, retrieval,
infill, save-load-state)."""
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
    torch.manual_seed(1)
    model = transformers.LlamaForCausalLM(cfg)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    toks = ["<unk>", "<s>", "</s>", "<fim_pre>", "<fim_suf>", "<fim_mid>"] + \
           [f"<0x{b:02X}>" for b in range(256)] + \
           ["▁hello", "▁world", "▁the", "▁a"] + [f"t{i}" for i in range(34)]
    tf = {"tokenizer.ggml.model": "llama", "tokenizer.ggml.tokens": toks[:300],
          "tokenizer.ggml.scores": [0.0] * 300,
          "tokenizer.ggml.token_type": [2, 3, 3, 3, 3, 3] + [6]*256 + [1]*38,
          "tokenizer.ggml.fim_pre_token_id": 3,
          "tokenizer.ggml.fim_suf_token_id": 4,
          "tokenizer.ggml.fim_mid_token_id": 5}
    p = str(tmp_path_factory.mktemp("tools") / "m.gguf")
    convert_hf_llama(sd, cfg, p, qtype=GGMLType.F16, tokenizer_fields=tf)
    return p


def test_gguf_hash_deterministic(model_path, capsys):
    assert main(["gguf-hash", model_path, "--sha256", "--uuid"]) == 0
    out1 = capsys.readouterr().out
    assert main(["gguf-hash", model_path, "--sha256", "--uuid"]) == 0
    out2 = capsys.readouterr().out
    assert out1 == out2
    assert "sha256" in out1 and "UUIDv5" in out1
    # last sha256 line is the whole-model digest
    lines = [l for l in out1.splitlines() if l.startswith("sha256")]
    assert len(lines) > 3 and lines[-1].split()[2] == model_path


def test_gguf_split_and_merge(model_path, tmp_path, capsys):
    from ggml_hexagon_tpu.gguf import GGUFReader
    from ggml_hexagon_tpu.gguf.ghash import hash_gguf

    base = str(tmp_path / "shard")
    assert main(["gguf-split", model_path, base,
                 "--split-max-tensors", "7"]) == 0
    first = capsys.readouterr().out.splitlines()[0]
    merged = str(tmp_path / "merged.gguf")
    assert main(["gguf-split", "--merge", first, merged]) == 0
    h0 = hash_gguf(model_path, ("sha256",))["sha256"]
    h1 = hash_gguf(merged, ("sha256",))["sha256"]
    assert h0 == h1  # every tensor byte-identical, incl. __model__
    with GGUFReader.open(merged) as r:
        assert r.metadata["general.architecture"] == "llama"
        assert "split.no" not in r.metadata


def test_quantize_stats(model_path, capsys):
    assert main(["quantize-stats", "-m", model_path,
                 "--type", "Q4_0", "--type", "Q8_0"]) == 0
    out = capsys.readouterr().out
    rows = {}
    for line in out.splitlines():
        parts = line.split()
        if parts[1] == "__total__":
            rows[parts[0]] = float(parts[3])
    assert set(rows) == {"Q4_0", "Q8_0"}
    assert rows["Q8_0"] < rows["Q4_0"]  # 8-bit beats 4-bit


def test_gbnf_validator(tmp_path, capsys):
    g = tmp_path / "g.gbnf"
    g.write_text('root ::= "a"+ "b"\n')
    inp = tmp_path / "in.txt"
    inp.write_text("aaab")
    assert main(["gbnf-validator", str(g), str(inp)]) == 0
    assert "valid" in capsys.readouterr().out
    bad = tmp_path / "bad.txt"
    bad.write_text("abc")
    assert main(["gbnf-validator", str(g), str(bad)]) == 1


def test_export_lora_merges_weights(model_path, tmp_path, capsys):
    from ggml_hexagon_tpu.gguf import GGUFReader
    from ggml_hexagon_tpu.models.lora import write_lora_gguf

    rng = np.random.default_rng(0)
    r_ = 4
    a = rng.standard_normal((r_, 256)).astype(np.float32) * 0.05
    b = rng.standard_normal((256, r_)).astype(np.float32) * 0.05
    lora = str(tmp_path / "adapter.gguf")
    write_lora_gguf(lora, {"blk.0.attn_q.weight": (a, b)}, alpha=8.0)
    out = str(tmp_path / "merged.gguf")
    assert main(["export-lora", "-m", model_path, "--lora", lora,
                 "-o", out]) == 0
    with GGUFReader.open(model_path) as r:
        base = r.tensor_f32("blk.0.attn_q.weight")
    with GGUFReader.open(out) as r:
        merged = r.tensor_f32("blk.0.attn_q.weight")
        untouched = r.tensor_f32("blk.1.attn_q.weight")
    expect = base + (8.0 / r_) * (b @ a)
    np.testing.assert_allclose(merged, expect, atol=5e-2)  # f16 requant
    with GGUFReader.open(model_path) as r:
        np.testing.assert_array_equal(untouched,
                                      r.tensor_f32("blk.1.attn_q.weight"))


def test_cvector_generator_and_apply(model_path, tmp_path, capsys):
    pos = tmp_path / "pos.txt"
    neg = tmp_path / "neg.txt"
    pos.write_text("hello world\nthe a hello\nworld the\n")
    neg.write_text("a the\nworld world world\nhello a\n")
    out = str(tmp_path / "cvec.gguf")
    assert main(["cvector-generator", "-m", model_path, "--positive-file",
                 str(pos), "--negative-file", str(neg), "-o", out]) == 0
    from ggml_hexagon_tpu.models.lora import ControlVector

    cv = ControlVector.from_gguf(out)
    assert set(cv.directions) == {0, 1}
    for v in cv.directions.values():
        np.testing.assert_allclose(float(np.linalg.norm(np.asarray(v))), 1.0,
                                   rtol=1e-4)
    # steering must actually change logits
    capsys.readouterr()
    assert main(["generate", "-m", model_path, "-p", "hello", "-n", "2",
                 "--temp", "0", "-c", "32"]) == 0


def test_cli_embedding_and_retrieval(model_path, tmp_path, capsys):
    assert main(["embedding", "-m", model_path, "-p", "hello world",
                 "-p", "the a"]) == 0
    out = capsys.readouterr().out
    assert len(out.strip().splitlines()) == 2
    doc = tmp_path / "doc.txt"
    doc.write_text("hello world greeting\nthe stock market fell\n")
    assert main(["retrieval", "-m", model_path, "--files", str(doc),
                 "--query", "hello", "--chunk-size", "4", "--top-k", "2"]) == 0
    out = capsys.readouterr().out
    assert "doc.txt" in out


def test_cli_infill(model_path, capsys):
    assert main(["infill", "-m", model_path, "--in-prefix", "def add(",
                 "--in-suffix", "return x", "-n", "4", "-c", "128"]) == 0
    assert "def add(" in capsys.readouterr().out


def test_cli_save_load_state(model_path, tmp_path, capsys):
    out = str(tmp_path / "state.bin")
    assert main(["save-load-state", "-m", model_path, "-p", "hello world the",
                 "-n", "4", "-c", "64", "-o", out]) == 0
    assert "round-trip OK" in capsys.readouterr().out


def test_cli_passkey_smoke(model_path, capsys):
    # tiny random model won't retrieve the key; exercise the harness itself
    rc = main(["passkey", "-m", model_path, "--n-junk", "2", "-n", "4",
               "-c", "512", "--passkey", "7"])
    out = capsys.readouterr().out
    assert rc in (0, 1) and "passkey" in out


def test_cli_eval_callback(model_path, capsys):
    assert main(["eval-callback", "-m", model_path, "-p", "hello"]) == 0
    out = capsys.readouterr().out
    assert "blk.0.attn_q.weight" in out and "blk.1.l_out" in out
    assert "tensors dumped" in out


def test_cli_prompt_cache(model_path, tmp_path, capsys):
    cache = str(tmp_path / "session.bin")
    args = ["generate", "-m", model_path, "--prompt-tokens", "1 10 20 30 40",
            "-n", "6", "--temp", "0", "-c", "64", "--prompt-cache", cache]
    assert main(args) == 0
    first = capsys.readouterr().out.strip()
    import os
    assert os.path.exists(cache)
    assert main(args) == 0  # second run restores the session
    cap = capsys.readouterr()
    assert cap.out.strip() == first  # deterministic across restore
