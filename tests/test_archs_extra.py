"""Smoke tests for architectures without in-tree HF classes (baichuan,
xverse, orion, qwen v1, jais) plus t5encoder vs HF T5EncoderModel.

Synthetic state dicts follow each arch's HF naming; the test asserts the
registry config flags and a finite forward pass (the graph-shape contract
of the reference's llm_build_* builders)."""
from types import SimpleNamespace

import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.gguf import GGUFReader
from ggml_hexagon_tpu.models.convert_hf import convert_hf_model
from ggml_hexagon_tpu.models.llama import forward, init_kv_cache, load_llama_weights
from ggml_hexagon_tpu.quant.formats import GGMLType

D, FF, L, V, H = 256, 512, 2, 256, 4


def rnd(rng, *s):
    return rng.standard_normal(s, dtype=np.float32) * 0.02


def run_smoke(sd, c, tmp_path, name):
    path = str(tmp_path / f"{name}.gguf")
    convert_hf_model(sd, c, path, qtype=GGMLType.F32)
    with GGUFReader.open(path) as r:
        cfg, weights = load_llama_weights(r, dtype=jnp.float32)
    kv = init_kv_cache(cfg, 1, 16, dtype=jnp.float32)
    logits, _ = forward(cfg, weights, jnp.zeros((1, 4), jnp.int32), kv, 0,
                        logits_all=True, compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(logits)).all(), name
    return cfg


def llama_style_sd(rng, w_pack=False):
    sd = {"model.embed_tokens.weight": rnd(rng, V, D),
          "model.norm.weight": np.ones(D, np.float32),
          "lm_head.weight": rnd(rng, V, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        if w_pack:
            sd[p + "self_attn.W_pack.weight"] = rnd(rng, 3 * D, D)
            sd[p + "self_attn.o_proj.weight"] = rnd(rng, D, D)
        else:
            for n in ("q", "k", "v", "o"):
                sd[p + f"self_attn.{n}_proj.weight"] = rnd(rng, D, D)
        sd[p + "mlp.gate_proj.weight"] = rnd(rng, FF, D)
        sd[p + "mlp.up_proj.weight"] = rnd(rng, FF, D)
        sd[p + "mlp.down_proj.weight"] = rnd(rng, D, FF)
    return sd


def test_baichuan_7b_rope(tmp_path):
    rng = np.random.default_rng(40)
    sd = llama_style_sd(rng, w_pack=True)
    c = SimpleNamespace(model_type="baichuan", vocab_size=V, hidden_size=D,
                        intermediate_size=FF, num_hidden_layers=L,
                        num_attention_heads=H, max_position_embeddings=128,
                        rms_norm_eps=1e-6)
    cfg = run_smoke(sd, c, tmp_path, "baichuan")
    assert cfg.rope_mode == "norm" and cfg.alibi_max_bias == 0.0


def test_baichuan_13b_alibi(tmp_path):
    from ggml_hexagon_tpu.models.registry import config_from_gguf

    md = {"general.architecture": "baichuan", "baichuan.block_count": 40,
          "baichuan.embedding_length": D, "baichuan.feed_forward_length": FF,
          "baichuan.attention.head_count": H, "baichuan.vocab_size": V}
    cfg = config_from_gguf(md)
    assert cfg.rope_mode == "none" and cfg.alibi_max_bias == 8.0


def test_xverse(tmp_path):
    rng = np.random.default_rng(41)
    sd = llama_style_sd(rng)
    c = SimpleNamespace(model_type="xverse", vocab_size=V, hidden_size=D,
                        intermediate_size=FF, num_hidden_layers=L,
                        num_attention_heads=H, max_position_embeddings=128,
                        rms_norm_eps=1e-6, rope_scaling=None)
    cfg = run_smoke(sd, c, tmp_path, "xverse")
    assert cfg.rope_mode == "norm" and cfg.norm_type == "rms"


def test_orion(tmp_path):
    rng = np.random.default_rng(42)
    sd = llama_style_sd(rng)
    for k in list(sd):  # orion LayerNorm has biases
        if k.endswith("layernorm.weight") or k == "model.norm.weight":
            sd[k[:-7] + ".bias"] = np.zeros(D, np.float32)
    c = SimpleNamespace(model_type="orion", vocab_size=V, hidden_size=D,
                        intermediate_size=FF, num_hidden_layers=L,
                        num_attention_heads=H, num_key_value_heads=H,
                        max_position_embeddings=128, rms_norm_eps=1e-5,
                        rope_theta=10000.0)
    cfg = run_smoke(sd, c, tmp_path, "orion")
    assert cfg.norm_type == "layer" and cfg.rope_mode == "norm"


def test_qwen_v1(tmp_path):
    rng = np.random.default_rng(43)
    sd = {"transformer.wte.weight": rnd(rng, V, D),
          "transformer.ln_f.weight": np.ones(D, np.float32),
          "lm_head.weight": rnd(rng, V, D)}
    for i in range(L):
        p = f"transformer.h.{i}."
        sd[p + "ln_1.weight"] = np.ones(D, np.float32)
        sd[p + "ln_2.weight"] = np.ones(D, np.float32)
        sd[p + "attn.c_attn.weight"] = rnd(rng, 3 * D, D)
        sd[p + "attn.c_attn.bias"] = rnd(rng, 3 * D)
        sd[p + "attn.c_proj.weight"] = rnd(rng, D, D)
        sd[p + "mlp.w1.weight"] = rnd(rng, FF, D)
        sd[p + "mlp.w2.weight"] = rnd(rng, FF, D)
        sd[p + "mlp.c_proj.weight"] = rnd(rng, D, FF)
    c = SimpleNamespace(model_type="qwen", vocab_size=V, hidden_size=D,
                        intermediate_size=2 * FF, num_hidden_layers=L,
                        num_attention_heads=H, max_position_embeddings=128,
                        layer_norm_epsilon=1e-6, rope_theta=10000.0)
    cfg = run_smoke(sd, c, tmp_path, "qwen")
    assert cfg.rope_mode == "neox" and cfg.n_ff == FF


def test_jais(tmp_path):
    rng = np.random.default_rng(44)
    sd = {"transformer.wte.weight": rnd(rng, V, D),
          "transformer.ln_f.weight": np.ones(D, np.float32),
          "transformer.ln_f.bias": np.zeros(D, np.float32)}
    for i in range(L):
        p = f"transformer.h.{i}."
        for ln in ("ln_1", "ln_2"):
            sd[p + ln + ".weight"] = np.ones(D, np.float32)
            sd[p + ln + ".bias"] = np.zeros(D, np.float32)
        sd[p + "attn.c_attn.weight"] = rnd(rng, D, 3 * D)  # Conv1D layout
        sd[p + "attn.c_attn.bias"] = rnd(rng, 3 * D)
        sd[p + "attn.c_proj.weight"] = rnd(rng, D, D)
        sd[p + "attn.c_proj.bias"] = rnd(rng, D)
        sd[p + "mlp.c_fc.weight"] = rnd(rng, D, FF)
        sd[p + "mlp.c_fc.bias"] = rnd(rng, FF)
        sd[p + "mlp.c_fc2.weight"] = rnd(rng, D, FF)
        sd[p + "mlp.c_fc2.bias"] = rnd(rng, FF)
        sd[p + "mlp.c_proj.weight"] = rnd(rng, FF, D)
        sd[p + "mlp.c_proj.bias"] = rnd(rng, D)
    c = SimpleNamespace(model_type="jais", vocab_size=V, hidden_size=D,
                        n_inner=FF, num_hidden_layers=L,
                        num_attention_heads=H, n_positions=128,
                        max_position_embeddings=128,
                        layer_norm_epsilon=1e-5,
                        mup_embeddings_scale=14.0, mup_output_alpha=2.22,
                        mup_width_scale=0.0625)
    cfg = run_smoke(sd, c, tmp_path, "jais")
    assert cfg.alibi_max_bias == 8.0 and cfg.attn_scale == 1.0 / (D // H)


def test_t5encoder_vs_hf(tmp_path):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from ggml_hexagon_tpu.models.t5 import (
        T5Config, convert_hf_t5encoder, encode, load_t5_weights)

    cfg = transformers.T5Config(
        vocab_size=256, d_model=64, d_kv=16, d_ff=128, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        feed_forward_proj="relu", tie_word_embeddings=True)
    torch.manual_seed(50)
    m = transformers.T5EncoderModel(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    path = str(tmp_path / "t5enc.gguf")
    convert_hf_t5encoder(sd, cfg, path, qtype=GGMLType.F32)
    with GGUFReader.open(path) as r:
        tcfg, weights = load_t5_weights(r)
    assert tcfg.arch == "t5encoder" and "dec_layers" not in weights
    ids = np.arange(12).reshape(1, 12) % 256
    with torch.no_grad():
        ref = m(torch.tensor(ids)).last_hidden_state.numpy()
    ours = np.asarray(encode(tcfg, weights, jnp.asarray(ids, jnp.int32)))
    err = np.abs(ours - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-3, err
