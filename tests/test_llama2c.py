"""convert-llama2c-to-ggml analog: synthetic llama2.c checkpoint built from
an HF model's weights (re-permuted to the adjacent-pair rope convention the
karpathy format uses) must produce logits matching HF; plus the parallel
multi-client simulation CLI."""
import struct

import numpy as np
import pytest

from ggml_hexagon_tpu.quant.formats import GGMLType

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _write_llama2c(path, cfg, w, shared=False):
    """Write header + f32 blobs in checkpoint order (convert-...cpp:155)."""
    with open(path, "wb") as f:
        vs = cfg["vocab_size"] if shared else -cfg["vocab_size"]
        f.write(struct.pack("<7i", cfg["dim"], cfg["hidden_dim"],
                            cfg["n_layers"], cfg["n_heads"],
                            cfg["n_kv_heads"], vs, cfg["seq_len"]))
        order = ["tok_emb", "rms_att", "wq", "wk", "wv", "wo", "rms_ffn",
                 "w1", "w2", "w3", "rms_final"]
        for k in order:
            f.write(np.ascontiguousarray(w[k], "<f4").tobytes())
        head = cfg["dim"] // cfg["n_heads"]
        f.write(np.zeros(cfg["seq_len"] * head, "<f4").tobytes())  # freq_cis
        if not shared:
            f.write(np.ascontiguousarray(w["wcls"], "<f4").tobytes())


def _write_tokenizer_bin(path, tokens, scores):
    with open(path, "wb") as f:
        f.write(struct.pack("<i", max(len(t) for t in tokens)))
        for t, s in zip(tokens, scores):
            b = t.encode()
            f.write(struct.pack("<f", s) + struct.pack("<i", len(b)) + b)


@pytest.fixture(scope="module")
def hf_and_ckpt(tmp_path_factory):
    from ggml_hexagon_tpu.models.convert_hf import permute_qk

    tmp = tmp_path_factory.mktemp("l2c")
    cfg = transformers.LlamaConfig(
        vocab_size=300, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, tie_word_embeddings=False,
        rms_norm_eps=1e-5)
    torch.manual_seed(3)
    m = transformers.LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    c2c = {"dim": 64, "hidden_dim": 128, "n_layers": 2, "n_heads": 4,
           "n_kv_heads": 4, "vocab_size": 300, "seq_len": 128}
    w = {
        "tok_emb": sd["model.embed_tokens.weight"],
        "rms_final": sd["model.norm.weight"],
        "wcls": sd["lm_head.weight"],
        # llama2.c uses adjacent-pair rope = GGUF NORM layout, which is the
        # permuted form of HF's rotate-half weights
        "wq": np.stack([permute_qk(
            sd[f"model.layers.{i}.self_attn.q_proj.weight"], 4)
            for i in range(2)]),
        "wk": np.stack([permute_qk(
            sd[f"model.layers.{i}.self_attn.k_proj.weight"], 4)
            for i in range(2)]),
        "wv": np.stack([sd[f"model.layers.{i}.self_attn.v_proj.weight"]
                        for i in range(2)]),
        "wo": np.stack([sd[f"model.layers.{i}.self_attn.o_proj.weight"]
                        for i in range(2)]),
        "rms_att": np.stack([sd[f"model.layers.{i}.input_layernorm.weight"]
                             for i in range(2)]),
        "rms_ffn": np.stack(
            [sd[f"model.layers.{i}.post_attention_layernorm.weight"]
             for i in range(2)]),
        "w1": np.stack([sd[f"model.layers.{i}.mlp.gate_proj.weight"]
                        for i in range(2)]),
        "w2": np.stack([sd[f"model.layers.{i}.mlp.down_proj.weight"]
                        for i in range(2)]),
        "w3": np.stack([sd[f"model.layers.{i}.mlp.up_proj.weight"]
                        for i in range(2)]),
    }
    ckpt = str(tmp / "model.bin")
    _write_llama2c(ckpt, c2c, w, shared=False)
    toks = ["<unk>", "<s>", "</s>"] + [f"<0x{b:02X}>" for b in range(256)] + \
           [f"tok{i} x" for i in range(41)]
    tokbin = str(tmp / "tokenizer.bin")
    _write_tokenizer_bin(tokbin, toks[:300], [float(-i) for i in range(300)])
    return m, ckpt, tokbin, str(tmp)


def test_llama2c_convert_logits_match_hf(hf_and_ckpt):
    from ggml_hexagon_tpu.gguf.llama2c import convert_llama2c
    from ggml_hexagon_tpu.runtime import Engine

    m, ckpt, tokbin, tmp = hf_and_ckpt
    import jax.numpy as jnp

    from ggml_hexagon_tpu.models.convert_hf import convert_hf_llama

    out = convert_llama2c(ckpt, tokbin, tmp + "/m.gguf")
    eng = Engine.from_gguf(out, max_seq=32, kv_dtype=jnp.float32,
                           compute_dtype=jnp.float32)
    ids = np.array([1, 100, 200, 55, 7], np.int32)
    ours = eng.prefill(ids[None, :])[0]
    with torch.no_grad():
        ref = m(torch.tensor(ids[None].astype(np.int64))
                ).logits[0, -1].numpy()
    err = np.abs(ours - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 5e-3, err

    # and exactly equivalent to the proven HF->GGUF conversion path
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    toks = ["<unk>", "<s>", "</s>"] + [f"t{i}" for i in range(297)]
    hf_path = convert_hf_llama(
        sd, m.config, tmp + "/hf.gguf", qtype=GGMLType.F32,
        tokenizer_fields={"tokenizer.ggml.model": "llama",
                          "tokenizer.ggml.tokens": toks,
                          "tokenizer.ggml.scores": [0.0] * 300,
                          "tokenizer.ggml.token_type": [2, 3, 3] + [1] * 297})
    eng2 = Engine.from_gguf(hf_path, max_seq=32, kv_dtype=jnp.float32,
                            compute_dtype=jnp.float32)
    hf_logits = eng2.prefill(ids[None, :])[0]
    assert np.allclose(ours, hf_logits, atol=1e-4)


def test_llama2c_tokenizer_bin_fields(hf_and_ckpt):
    from ggml_hexagon_tpu.gguf import GGUFReader
    from ggml_hexagon_tpu.gguf.llama2c import convert_llama2c

    _, ckpt, tokbin, tmp = hf_and_ckpt
    out = convert_llama2c(ckpt, tokbin, tmp + "/m2.gguf")
    with GGUFReader.open(out) as r:
        md = r.metadata
    toks = md["tokenizer.ggml.tokens"]
    assert toks[0] == "<unk>" and toks[1] == "<s>" and toks[2] == "</s>"
    assert toks[3] == "<0x00>"
    assert "▁" in toks[259]  # whitespace escaped
    tt = md["tokenizer.ggml.token_type"]
    assert tt[0] == 2 and tt[1] == 3 and tt[3] == 6 and tt[259] == 1
    assert md["llama.attention.head_count"] == 4


def test_llama2c_shared_weights(hf_and_ckpt, tmp_path):
    """vocab_size > 0 => classifier shares the embedding table."""
    from ggml_hexagon_tpu.gguf.llama2c import read_llama2c_checkpoint

    _, ckpt, tokbin, tmp = hf_and_ckpt
    cfg, w = read_llama2c_checkpoint(ckpt)
    assert not cfg["shared"]
    # rewrite as shared
    c2c = dict(cfg)
    c2c["hidden_dim"] = cfg["hidden_dim"]
    _write_llama2c(str(tmp_path / "s.bin"), c2c, w, shared=True)
    cfg2, w2 = read_llama2c_checkpoint(str(tmp_path / "s.bin"))
    assert cfg2["shared"]
    assert np.array_equal(w2["wcls"], w2["tok_emb"])


def test_parallel_cli(hf_and_ckpt, capsys):
    from ggml_hexagon_tpu.cli import main
    from ggml_hexagon_tpu.gguf.llama2c import convert_llama2c

    _, ckpt, tokbin, tmp = hf_and_ckpt
    out = convert_llama2c(ckpt, tokbin, tmp + "/m3.gguf")
    rc = main(["parallel", "-m", out, "-np", "2", "-ns", "3", "-n", "4",
               "-c", "128"])
    assert rc == 0
    captured = capsys.readouterr().out
    assert "n_parallel = 2, n_sequences = 3" in captured
    assert "throughput" in captured
