"""Round-4 HF-converter breadth: the remaining reference-registered
decoder families (reference convert_hf_to_gguf.py model classes).

Synthetic state dicts follow each family's HF naming; each test converts
-> loads through the registry -> runs one finite forward (the graph-shape
contract of the reference's llm_build_* builders).  Families with
in-tree HF classes are covered value-exactly in test_archs.py; these are
remote-code-only families."""
from types import SimpleNamespace

import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.gguf import GGUFReader
from ggml_hexagon_tpu.models.convert_hf import convert_hf_model
from ggml_hexagon_tpu.models.llama import (forward, init_kv_cache,
                                           load_llama_weights)
from ggml_hexagon_tpu.quant.formats import GGMLType

D, FF, L, V = 256, 512, 2, 256


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


def test_internlm2(tmp_path, rng):
    nh, nkv, hd = 4, 2, D // 4
    sd = {"model.tok_embeddings.weight": rnd(rng, V, D),
          "model.norm.weight": np.ones(D, np.float32),
          "output.weight": rnd(rng, V, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        sd[p + "attention_norm.weight"] = np.ones(D, np.float32)
        sd[p + "ffn_norm.weight"] = np.ones(D, np.float32)
        sd[p + "attention.wqkv.weight"] = rnd(rng, (nh + 2 * nkv) * hd, D)
        sd[p + "attention.wo.weight"] = rnd(rng, D, D)
        sd[p + "feed_forward.w1.weight"] = rnd(rng, FF, D)
        sd[p + "feed_forward.w3.weight"] = rnd(rng, FF, D)
        sd[p + "feed_forward.w2.weight"] = rnd(rng, D, FF)
    c = SimpleNamespace(model_type="internlm2", num_hidden_layers=L,
                        hidden_size=D, intermediate_size=FF,
                        num_attention_heads=nh, num_key_value_heads=nkv,
                        vocab_size=V, rms_norm_eps=1e-5, rope_theta=1e4,
                        max_position_embeddings=2048)
    cfg = run_smoke(sd, c, tmp_path, "internlm2")
    assert cfg.arch == "internlm2"


def test_openelm(tmp_path, rng):
    hd = 64
    nq, nkv = [4, 4], [2, 2]
    ffm = [1.0, 1.0]
    sd = {"transformer.token_embeddings.weight": rnd(rng, V, D),
          "transformer.norm.weight": np.ones(D, np.float32)}
    from ggml_hexagon_tpu.models.convert_hf import _make_divisible

    for i in range(L):
        p = f"transformer.layers.{i}."
        ffd = _make_divisible(ffm[i] * D, 256)
        sd[p + "attn_norm.weight"] = np.ones(D, np.float32)
        sd[p + "ffn_norm.weight"] = np.ones(D, np.float32)
        sd[p + "attn.qkv_proj.weight"] = rnd(rng, (nq[i] + 2 * nkv[i]) * hd, D)
        sd[p + "attn.out_proj.weight"] = rnd(rng, D, nq[i] * hd)
        sd[p + "attn.q_norm.weight"] = np.ones(hd, np.float32)
        sd[p + "attn.k_norm.weight"] = np.ones(hd, np.float32)
        sd[p + "ffn.proj_1.weight"] = rnd(rng, 2 * ffd, D)
        sd[p + "ffn.proj_2.weight"] = rnd(rng, D, ffd)
    c = SimpleNamespace(model_type="openelm", num_transformer_layers=L,
                        model_dim=D, head_dim=hd, num_query_heads=nq,
                        num_kv_heads=nkv, ffn_multipliers=ffm,
                        ffn_dim_divisor=256, vocab_size=V,
                        max_context_length=2048, rope_freq_constant=1e4)
    cfg = run_smoke(sd, c, tmp_path, "openelm")
    assert cfg.arch == "openelm"


def test_plamo(tmp_path, rng):
    nh, nkv = 8, 2
    sd = {"model.embed_tokens.weight": rnd(rng, V, D),
          "model.norm.weight": np.ones(D, np.float32),
          "lm_head.weight": rnd(rng, V, D)}
    hd = D // nh
    for i in range(L):
        p = f"model.layers.layers.{i}."
        sd[p + "norm.weight"] = np.ones(D, np.float32)
        sd[p + "self_attn.q_proj.weight"] = rnd(rng, D, D)
        sd[p + "self_attn.k_proj.weight"] = rnd(rng, nkv * hd, D)
        sd[p + "self_attn.v_proj.weight"] = rnd(rng, nkv * hd, D)
        sd[p + "self_attn.o_proj.weight"] = rnd(rng, D, D)
        sd[p + "mlp.gate_proj.weight"] = rnd(rng, FF, D)
        sd[p + "mlp.up_proj.weight"] = rnd(rng, FF, D)
        sd[p + "mlp.down_proj.weight"] = rnd(rng, D, FF)
    c = SimpleNamespace(model_type="plamo", num_hidden_layers=L,
                        hidden_size=D, intermediate_size=FF,
                        num_attention_heads=nh, num_key_value_heads=nkv,
                        vocab_size=V, rms_norm_eps=1e-5, rope_theta=1e4,
                        max_position_embeddings=4096)
    cfg = run_smoke(sd, c, tmp_path, "plamo")
    assert cfg.arch == "plamo" and cfg.parallel_residual


def test_codeshell(tmp_path, rng):
    nh, ngrp = 4, 2
    hd = D // nh
    sd = {"transformer.wte.weight": rnd(rng, V, D),
          "transformer.ln_f.weight": np.ones(D, np.float32),
          "transformer.ln_f.bias": np.zeros(D, np.float32),
          "lm_head.weight": rnd(rng, V, D)}
    for i in range(L):
        p = f"transformer.h.{i}."
        for n_ in ("ln_1", "ln_2"):
            sd[p + n_ + ".weight"] = np.ones(D, np.float32)
            sd[p + n_ + ".bias"] = np.zeros(D, np.float32)
        sd[p + "attn.c_attn.weight"] = rnd(rng, (nh + 2 * ngrp) * hd, D)
        sd[p + "attn.c_attn.bias"] = np.zeros((nh + 2 * ngrp) * hd, np.float32)
        sd[p + "attn.c_proj.weight"] = rnd(rng, D, D)
        sd[p + "attn.c_proj.bias"] = np.zeros(D, np.float32)
        sd[p + "mlp.c_fc.weight"] = rnd(rng, 4 * D, D)
        sd[p + "mlp.c_fc.bias"] = np.zeros(4 * D, np.float32)
        sd[p + "mlp.c_proj.weight"] = rnd(rng, D, 4 * D)
        sd[p + "mlp.c_proj.bias"] = np.zeros(D, np.float32)
    c = SimpleNamespace(model_type="codeshell", n_layer=L, n_embd=D,
                        n_head=nh, num_query_groups=ngrp, vocab_size=V,
                        n_positions=2048, layer_norm_epsilon=1e-5)
    cfg = run_smoke(sd, c, tmp_path, "codeshell")
    assert cfg.arch == "codeshell"


def test_refact(tmp_path, rng):
    nh = 4
    hd = D // nh
    ff = 256 * ((int(2 * 4 * D / 3) + 255) // 256)
    sd = {"transformer.wte.weight": rnd(rng, V, D),
          "transformer.ln_f.weight": np.ones(D, np.float32),
          "lm_head.weight": rnd(rng, V, D)}
    for i in range(L):
        p = f"transformer.h.{i}."
        sd[p + "ln_1.weight"] = np.ones(D, np.float32)
        sd[p + "ln_2.weight"] = np.ones(D, np.float32)
        sd[p + "attn.kv.weight"] = rnd(rng, 2 * hd, D)
        sd[p + "attn.q.weight"] = rnd(rng, D, D)
        sd[p + "attn.c_proj.weight"] = rnd(rng, D, D)
        sd[p + "mlp.gate_up_proj.weight"] = rnd(rng, 2 * ff, D)
        sd[p + "mlp.c_proj.weight"] = rnd(rng, D, ff)
    c = SimpleNamespace(model_type="refact", n_layer=L, n_embd=D,
                        n_head=nh, vocab_size=V, n_positions=4096,
                        layer_norm_epsilon=1e-6)
    cfg = run_smoke(sd, c, tmp_path, "refact")
    assert cfg.arch == "refact" and cfg.rope_mode == "none"


def test_grok(tmp_path, rng):
    nh, nkv, E = 4, 2, 4
    hd = D // nh
    sd = {"transformer.in_out_embed.weight": rnd(rng, V, D),
          "transformer.rms_norm.weight": np.ones(D, np.float32),
          "lm_head.weight": rnd(rng, V, D)}
    for i in range(L):
        p = f"transformer.decoder_layer.{i}."
        for n_ in ("rms_norm", "rms_norm_1", "rms_norm_2", "rms_norm_3"):
            sd[p + n_ + ".weight"] = np.ones(D, np.float32)
        sd[p + "multi_head_attention.query.weight"] = rnd(rng, D, D)
        sd[p + "multi_head_attention.key.weight"] = rnd(rng, nkv * hd, D)
        sd[p + "multi_head_attention.value.weight"] = rnd(rng, nkv * hd, D)
        sd[p + "multi_head_attention.linear.weight"] = rnd(rng, D, D)
        sd[p + "router.weight"] = rnd(rng, E, D)
        for e in range(E):
            sd[p + f"moe.{e}.linear.weight"] = rnd(rng, FF, D)
            sd[p + f"moe.{e}.linear_v.weight"] = rnd(rng, FF, D)
            sd[p + f"moe.{e}.linear_1.weight"] = rnd(rng, D, FF)
    c = SimpleNamespace(model_type="grok", num_hidden_layers=L,
                        hidden_size=D, intermediate_size=FF,
                        num_attention_heads=nh, num_key_value_heads=nkv,
                        num_local_experts=E, num_experts_per_tok=2,
                        vocab_size=V, rms_norm_eps=1e-5, rope_theta=1e4,
                        max_position_embeddings=8192)
    cfg = run_smoke(sd, c, tmp_path, "grok")
    assert cfg.arch == "grok"


def test_chameleon(tmp_path, rng):
    nh, nkv = 4, 2
    hd = D // nh
    sd = {"model.embed_tokens.weight": rnd(rng, V, D),
          "model.norm.weight": np.ones(D, np.float32),
          "lm_head.weight": rnd(rng, V, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        for n_, rows in (("q_proj", D), ("k_proj", nkv * hd),
                         ("v_proj", nkv * hd), ("o_proj", D)):
            sd[p + f"self_attn.{n_}.weight"] = rnd(rng, rows, D)
        sd[p + "self_attn.q_norm.weight"] = np.ones(hd, np.float32)
        sd[p + "self_attn.q_norm.bias"] = np.zeros(hd, np.float32)
        sd[p + "self_attn.k_norm.weight"] = np.ones(hd, np.float32)
        sd[p + "self_attn.k_norm.bias"] = np.zeros(hd, np.float32)
        sd[p + "mlp.gate_proj.weight"] = rnd(rng, FF, D)
        sd[p + "mlp.up_proj.weight"] = rnd(rng, FF, D)
        sd[p + "mlp.down_proj.weight"] = rnd(rng, D, FF)
    c = SimpleNamespace(model_type="chameleon", num_hidden_layers=L,
                        hidden_size=D, intermediate_size=FF,
                        num_attention_heads=nh, num_key_value_heads=nkv,
                        vocab_size=V, rms_norm_eps=1e-5, rope_theta=1e4,
                        max_position_embeddings=4096, swin_norm=False)
    cfg = run_smoke(sd, c, tmp_path, "chameleon")
    assert cfg.arch == "chameleon"


def test_bitnet(tmp_path, rng):
    nh, nkv = 4, 2
    hd = D // nh
    sd = {"model.embed_tokens.weight": rnd(rng, V, D),
          "model.norm.weight": np.ones(D, np.float32)}
    for i in range(L):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        sd[p + "self_attn.inner_attn_ln.weight"] = np.ones(D, np.float32)
        sd[p + "mlp.ffn_layernorm.weight"] = np.ones(FF, np.float32)
        for n_, rows in (("q_proj", D), ("k_proj", nkv * hd),
                         ("v_proj", nkv * hd), ("o_proj", D)):
            sd[p + f"self_attn.{n_}.weight"] = rnd(rng, rows, D)
        sd[p + "mlp.gate_proj.weight"] = rnd(rng, FF, D)
        sd[p + "mlp.up_proj.weight"] = rnd(rng, FF, D)
        sd[p + "mlp.down_proj.weight"] = rnd(rng, D, FF)
    c = SimpleNamespace(model_type="bitnet", num_hidden_layers=L,
                        hidden_size=D, intermediate_size=FF,
                        num_attention_heads=nh, num_key_value_heads=nkv,
                        vocab_size=V, rms_norm_eps=1e-5, rope_theta=1e4,
                        max_position_embeddings=2048)
    cfg = run_smoke(sd, c, tmp_path, "bitnet")
    assert cfg.arch == "bitnet"


def test_deci_block_configs(tmp_path, rng):
    nh = 4
    hd = D // nh
    # layer 0: normal attention (2 heads per group -> nkv=2); layer 1:
    # attention-free with dense ffn
    bc = [{"attention": {"n_heads_in_group": 2,
                         "replace_with_linear": False},
           "ffn": {"ffn_mult": 1.0}},
          {"attention": {"n_heads_in_group": None,
                         "replace_with_linear": False},
           "ffn": {"ffn_mult": 1.0}}]
    ff = 256 * ((int(2 * 1.0 * D / 3) + 255) // 256)
    sd = {"model.embed_tokens.weight": rnd(rng, V, D),
          "model.norm.weight": np.ones(D, np.float32),
          "lm_head.weight": rnd(rng, V, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        if i == 0:
            sd[p + "input_layernorm.weight"] = np.ones(D, np.float32)
            sd[p + "self_attn.q_proj.weight"] = rnd(rng, D, D)
            sd[p + "self_attn.k_proj.weight"] = rnd(rng, 2 * hd, D)
            sd[p + "self_attn.v_proj.weight"] = rnd(rng, 2 * hd, D)
            sd[p + "self_attn.o_proj.weight"] = rnd(rng, D, D)
        sd[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        sd[p + "mlp.gate_proj.weight"] = rnd(rng, ff, D)
        sd[p + "mlp.up_proj.weight"] = rnd(rng, ff, D)
        sd[p + "mlp.down_proj.weight"] = rnd(rng, D, ff)
    c = SimpleNamespace(model_type="deci", num_hidden_layers=L,
                        hidden_size=D, num_attention_heads=nh,
                        block_configs=bc, vocab_size=V, rms_norm_eps=1e-5,
                        rope_theta=1e4, max_position_embeddings=4096)
    cfg = run_smoke(sd, c, tmp_path, "deci")
    assert cfg.arch == "deci" and cfg.nhkv(0) == 2 and cfg.nh(1) == 0


def test_arctic(tmp_path, rng):
    nh, nkv, E = 4, 4, 4
    sd = {"model.embed_tokens.weight": rnd(rng, V, D),
          "model.norm.weight": np.ones(D, np.float32),
          "lm_head.weight": rnd(rng, V, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        sd[p + "residual_layernorm.weight"] = np.ones(D, np.float32)
        for n_ in ("q_proj", "k_proj", "v_proj", "o_proj"):
            sd[p + f"self_attn.{n_}.weight"] = rnd(rng, D, D)
        for w_ in ("w1", "w3"):
            sd[p + f"residual_mlp.{w_}.weight"] = rnd(rng, FF, D)
        sd[p + "residual_mlp.w2.weight"] = rnd(rng, D, FF)
        sd[p + "block_sparse_moe.gate.weight"] = rnd(rng, E, D)
        for e in range(E):
            sd[p + f"block_sparse_moe.experts.{e}.w1.weight"] = rnd(rng, FF, D)
            sd[p + f"block_sparse_moe.experts.{e}.w3.weight"] = rnd(rng, FF, D)
            sd[p + f"block_sparse_moe.experts.{e}.w2.weight"] = rnd(rng, D, FF)
    c = SimpleNamespace(model_type="arctic", num_hidden_layers=L,
                        hidden_size=D, intermediate_size=FF,
                        num_attention_heads=nh, num_key_value_heads=nkv,
                        num_local_experts=E, num_experts_per_tok=2,
                        vocab_size=V, rms_norm_eps=1e-5, rope_theta=1e4,
                        max_position_embeddings=4096)
    cfg = run_smoke(sd, c, tmp_path, "arctic")
    assert cfg.arch == "arctic"


def test_minicpm3_mla(tmp_path, rng):
    from ggml_hexagon_tpu.models.deepseek2 import (forward as ds_forward,
                                                   init_deepseek_kv,
                                                   load_deepseek_weights)

    nh, qk_nope, qk_rope, vhd, kvr, qr = 4, 32, 32, 32, 64, 96
    sd = {"model.embed_tokens.weight": rnd(rng, V, D),
          "model.norm.weight": np.ones(D, np.float32),
          "lm_head.weight": rnd(rng, V, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        sd[p + "self_attn.q_a_proj.weight"] = rnd(rng, qr, D)
        sd[p + "self_attn.q_a_layernorm.weight"] = np.ones(qr, np.float32)
        sd[p + "self_attn.q_b_proj.weight"] = rnd(
            rng, nh * (qk_nope + qk_rope), qr)
        sd[p + "self_attn.kv_a_proj_with_mqa.weight"] = rnd(
            rng, kvr + qk_rope, D)
        sd[p + "self_attn.kv_a_layernorm.weight"] = np.ones(kvr, np.float32)
        sd[p + "self_attn.kv_b_proj.weight"] = rnd(
            rng, nh * (qk_nope + vhd), kvr)
        sd[p + "self_attn.o_proj.weight"] = rnd(rng, D, nh * vhd)
        sd[p + "mlp.gate_proj.weight"] = rnd(rng, FF, D)
        sd[p + "mlp.up_proj.weight"] = rnd(rng, FF, D)
        sd[p + "mlp.down_proj.weight"] = rnd(rng, D, FF)
    c = SimpleNamespace(model_type="minicpm3", num_hidden_layers=L,
                        hidden_size=D, intermediate_size=FF,
                        num_attention_heads=nh, num_key_value_heads=nh,
                        vocab_size=V, rms_norm_eps=1e-5, rope_theta=1e4,
                        max_position_embeddings=4096, q_lora_rank=qr,
                        kv_lora_rank=kvr, qk_nope_head_dim=qk_nope,
                        qk_rope_head_dim=qk_rope, v_head_dim=vhd)
    path = str(tmp_path / "minicpm3.gguf")
    convert_hf_model(sd, c, path, qtype=GGMLType.F32)
    with GGUFReader.open(path) as r:
        cfg, weights = load_deepseek_weights(r, dtype=jnp.float32)
    assert cfg.arch == "minicpm3"
    kv = init_deepseek_kv(cfg, 1, 16)
    logits, _ = ds_forward(cfg, weights, jnp.zeros((1, 4), jnp.int32), kv,
                           0, logits_all=True, compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(logits)).all()


def test_qwen2vl(tmp_path, rng):
    nh, nkv = 4, 2
    hd = D // nh
    sd = {"model.embed_tokens.weight": rnd(rng, V, D),
          "model.norm.weight": np.ones(D, np.float32),
          "lm_head.weight": rnd(rng, V, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        for n_, rows in (("q_proj", D), ("k_proj", nkv * hd),
                         ("v_proj", nkv * hd)):
            sd[p + f"self_attn.{n_}.weight"] = rnd(rng, rows, D)
            sd[p + f"self_attn.{n_}.bias"] = np.zeros(rows, np.float32)
        sd[p + "self_attn.o_proj.weight"] = rnd(rng, D, D)
        sd[p + "mlp.gate_proj.weight"] = rnd(rng, FF, D)
        sd[p + "mlp.up_proj.weight"] = rnd(rng, FF, D)
        sd[p + "mlp.down_proj.weight"] = rnd(rng, D, FF)
    c = SimpleNamespace(model_type="qwen2_vl", num_hidden_layers=L,
                        hidden_size=D, intermediate_size=FF,
                        num_attention_heads=nh, num_key_value_heads=nkv,
                        vocab_size=V, rms_norm_eps=1e-5, rope_theta=1e4,
                        max_position_embeddings=4096,
                        rope_scaling={"mrope_section": [8, 12, 12]})
    cfg = run_smoke(sd, c, tmp_path, "qwen2vl")
    assert cfg.arch == "qwen2vl" and cfg.rope_mode == "mrope"
    assert cfg.rope_sections[:3] == (8, 12, 12)


def test_bailingmoe(tmp_path, rng):
    nh, nkv, E = 4, 2, 4
    hd = D // nh
    sd = {"model.word_embeddings.weight": rnd(rng, V, D),
          "model.norm.weight": np.ones(D, np.float32),
          "lm_head.weight": rnd(rng, V, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        sd[p + "attention.query_key_value.weight"] = rnd(
            rng, (nh + 2 * nkv) * hd, D)
        sd[p + "attention.dense.weight"] = rnd(rng, D, D)
        if i == 0:  # dense lead layer
            sd[p + "mlp.gate_proj.weight"] = rnd(rng, FF, D)
            sd[p + "mlp.up_proj.weight"] = rnd(rng, FF, D)
            sd[p + "mlp.down_proj.weight"] = rnd(rng, D, FF)
        else:
            sd[p + "mlp.gate.weight"] = rnd(rng, E, D)
            for e in range(E):
                for hn, rows in (("gate_proj", FF), ("up_proj", FF)):
                    sd[p + f"mlp.experts.{e}.{hn}.weight"] = rnd(rng, rows, D)
                sd[p + f"mlp.experts.{e}.down_proj.weight"] = rnd(rng, D, FF)
            for hn, rows in (("gate_proj", FF), ("up_proj", FF)):
                sd[p + f"mlp.shared_experts.{hn}.weight"] = rnd(rng, rows, D)
            sd[p + "mlp.shared_experts.down_proj.weight"] = rnd(rng, D, FF)
    c = SimpleNamespace(model_type="bailing_moe", num_hidden_layers=L,
                        hidden_size=D, intermediate_size=FF,
                        num_attention_heads=nh, num_key_value_heads=nkv,
                        num_experts=E, num_experts_per_tok=2,
                        first_k_dense_replace=1, num_shared_experts=1,
                        moe_intermediate_size=FF, norm_topk_prob=True,
                        vocab_size=V, rms_norm_eps=1e-5, rope_theta=1e4,
                        max_position_embeddings=4096)
    cfg = run_smoke(sd, c, tmp_path, "bailingmoe")
    assert cfg.arch == "bailingmoe"


def test_rwkv7_converter(tmp_path, rng):
    """HF rwkv7 (fla lora-form naming) -> GGUF -> finite forward."""
    from ggml_hexagon_tpu.models.rwkv6 import (convert_hf_rwkv7,
                                               forward_rwkv7,
                                               init_rwkv7_state,
                                               load_rwkv7_weights)

    Dm, FFm, Lm, Vm, HSm, RK = 64, 256, 2, 80, 16, 8
    sd = {"model.embeddings.weight": rnd(rng, Vm, Dm),
          "model.layers.0.pre_norm.weight": np.ones(Dm, np.float32),
          "model.layers.0.pre_norm.bias": np.zeros(Dm, np.float32),
          "model.norm.weight": np.ones(Dm, np.float32),
          "model.norm.bias": np.zeros(Dm, np.float32),
          "lm_head.weight": rnd(rng, Vm, Dm)}
    for i in range(Lm):
        p = f"model.layers.{i}."
        sd[p + "attn_norm.weight"] = np.ones(Dm, np.float32)  # -> ln1?
        del sd[p + "attn_norm.weight"]
        sd[p + "ln1.weight"] = np.ones(Dm, np.float32)
        sd[p + "ln1.bias"] = np.zeros(Dm, np.float32)
        sd[p + "ln2.weight"] = np.ones(Dm, np.float32)
        sd[p + "ln2.bias"] = np.zeros(Dm, np.float32)
        a = p + "attn."
        sd[a + "g_norm.weight"] = np.ones(Dm, np.float32)
        sd[a + "g_norm.bias"] = np.zeros(Dm, np.float32)
        sd[a + "w0"] = rnd(rng, 1, 1, Dm) - 2.0
        sd[a + "w_lora.lora.0.weight"] = rnd(rng, RK, Dm)
        sd[a + "w_lora.lora.2.weight"] = rnd(rng, Dm, RK)
        sd[a + "a0"] = rnd(rng, 1, 1, Dm)
        sd[a + "a_lora.lora.0.weight"] = rnd(rng, RK, Dm)
        sd[a + "a_lora.lora.2.weight"] = rnd(rng, Dm, RK)
        if i > 0:
            sd[a + "v_lora.lora.0.weight"] = rnd(rng, RK, Dm)
            sd[a + "v_lora.lora.2.weight"] = rnd(rng, Dm, RK)
            sd[a + "v_lora.lora.2.bias"] = rnd(rng, Dm)
        sd[a + "g_lora.lora.0.weight"] = rnd(rng, RK, Dm)
        sd[a + "g_lora.lora.2.weight"] = rnd(rng, Dm, RK)
        for nm in ("x_r", "x_w", "x_k", "x_v", "x_a", "x_g"):
            sd[a + nm] = rnd(rng, 1, 1, Dm)
        sd[a + "k_k"] = 1.0 + rnd(rng, Dm)
        sd[a + "k_a"] = rnd(rng, Dm)
        sd[a + "r_k"] = rnd(rng, Dm // HSm, HSm)
        for nm in ("r_proj", "k_proj", "v_proj", "o_proj"):
            sd[a + nm + ".weight"] = rnd(rng, Dm, Dm)
        f = p + "ffn."
        sd[f + "x_k"] = rnd(rng, 1, 1, Dm)
        sd[f + "key.weight"] = rnd(rng, FFm, Dm)
        sd[f + "value.weight"] = rnd(rng, Dm, FFm)
    c = SimpleNamespace(hidden_size=Dm, num_hidden_layers=Lm,
                        head_size=HSm, layer_norm_epsilon=1e-5,
                        intermediate_size=FFm, vocab_size=Vm,
                        wkv_has_gate=True)
    path = str(tmp_path / "rwkv7.gguf")
    convert_hf_rwkv7(sd, c, path, qtype=GGMLType.F32)
    with GGUFReader.open(path) as r:
        cfg, weights = load_rwkv7_weights(r)
    assert cfg.arch == "rwkv7" and cfg.head_size == HSm
    lw0 = weights["layers"][0]
    assert "time_mix_v0" in lw0  # layer-0 dummy from a0
    assert lw0["time_mix_w1"].shape == (RK, Dm)
    st = init_rwkv7_state(cfg, 1)
    logits, _ = forward_rwkv7(cfg, weights, jnp.zeros((1, 4), jnp.int32),
                              st, logits_all=True)
    assert np.isfinite(np.asarray(logits)).all()
