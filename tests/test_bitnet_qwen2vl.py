"""bitnet (per-tensor quant scales + sub-norms) and qwen2vl (M-RoPE).

bitnet semantics per llm_build_bitnet (src/llama-model.cpp:9731-9895):
`blk.N.<proj>.scale` scalars multiply the projection outputs, and RMS
sub-norms run before wo / ffn_down; verified by scale-folding equivalence
(scale tensor s on W must equal baking s*W with no scale tensor).

qwen2vl M-RoPE per ggml_rope_multi (ggml-cpu.c:8650-8706): pair j reads
position stream (t,h,w,e) by sector; verified against a direct numpy port
with distinct per-stream positions, and text-equivalence to plain NEOX.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.gguf import GGUFReader, GGUFWriter
from ggml_hexagon_tpu.models.llama import forward, init_kv_cache, load_llama_weights
from ggml_hexagon_tpu.ops.basic import RopeParams, apply_rope

D, FF, L, V, H = 64, 96, 2, 80, 4
HD = D // H


def rnd(rng, *s):
    return rng.standard_normal(s, dtype=np.float32) * 0.05


def build_bitnet(tmp_path, name, fold_scales=False):
    """fold_scales=True bakes the scale values into the weights instead of
    emitting .scale tensors — logits must be identical either way."""
    scales = {"attn_q": 2.0, "attn_k": 0.5, "attn_v": 1.5, "attn_output": 0.75,
              "ffn_gate": 1.25, "ffn_up": 0.8, "ffn_down": 1.1}
    w = GGUFWriter()
    w.add("general.architecture", "bitnet")
    w.add("bitnet.block_count", L)
    w.add("bitnet.embedding_length", D)
    w.add("bitnet.feed_forward_length", FF)
    w.add("bitnet.attention.head_count", H)
    w.add("bitnet.attention.head_count_kv", H)
    w.add("bitnet.vocab_size", V)
    w.add("bitnet.context_length", 64)
    rng = np.random.default_rng(5)
    w.add_tensor("token_embd.weight", rnd(rng, V, D))
    w.add_tensor("output_norm.weight", np.ones(D, np.float32))
    for i in range(L):
        p = f"blk.{i}."
        r = np.random.default_rng(60 + i)
        w.add_tensor(p + "attn_norm.weight", np.ones(D, np.float32))
        w.add_tensor(p + "attn_sub_norm.weight",
                     1.0 + 0.1 * rnd(np.random.default_rng(80 + i), D))
        w.add_tensor(p + "ffn_norm.weight", np.ones(D, np.float32))
        w.add_tensor(p + "ffn_sub_norm.weight",
                     1.0 + 0.1 * rnd(np.random.default_rng(90 + i), FF))
        mats = {"attn_q": rnd(r, D, D), "attn_k": rnd(r, D, D),
                "attn_v": rnd(r, D, D), "attn_output": rnd(r, D, D),
                "ffn_gate": rnd(r, FF, D), "ffn_up": rnd(r, FF, D),
                "ffn_down": rnd(r, D, FF)}
        for tn, m in mats.items():
            if fold_scales:
                w.add_tensor(p + tn + ".weight", m * scales[tn])
            else:
                w.add_tensor(p + tn + ".weight", m)
                w.add_tensor(p + tn + ".scale",
                             np.asarray([scales[tn]], np.float32))
    path = str(tmp_path / f"{name}.gguf")
    w.write_file(path)
    return path


def run(path, ids):
    with GGUFReader.open(path) as r:
        cfg, weights = load_llama_weights(r, dtype=jnp.float32)
    kv = init_kv_cache(cfg, ids.shape[0], 16, dtype=jnp.float32)
    logits, _ = forward(cfg, weights, jnp.asarray(ids, jnp.int32), kv, 0,
                        logits_all=True, compute_dtype=jnp.float32)
    return cfg, np.asarray(logits)


def test_bitnet_scale_folding_equivalence(tmp_path):
    rng = np.random.default_rng(0)
    ids = rng.integers(0, V, size=(2, 5))
    cfg, with_scales = run(build_bitnet(tmp_path, "bn_s"), ids)
    _, folded = run(build_bitnet(tmp_path, "bn_f", fold_scales=True), ids)
    assert cfg.arch == "bitnet" and cfg.rope_mode == "neox"
    np.testing.assert_allclose(with_scales, folded, rtol=1e-4, atol=1e-5)
    assert np.isfinite(with_scales).all()


def test_bitnet_tied_head_and_subnorms(tmp_path):
    path = build_bitnet(tmp_path, "bn")
    with GGUFReader.open(path) as r:
        cfg, weights = load_llama_weights(r, dtype=jnp.float32)
    # no output.weight in the GGUF -> tied to token embedding
    assert weights["output"] is weights["tok_embd"] or \
        np.allclose(np.asarray(weights["output"]), np.asarray(weights["tok_embd"]))
    assert "attn_sub_norm" in weights["layers"][0]
    assert "ffn_sub_norm" in weights["layers"][0]
    # incremental decode must match prefill
    ids = np.asarray([[3, 9, 1, 7]])
    kv = init_kv_cache(cfg, 1, 16, dtype=jnp.float32)
    full, _ = forward(cfg, weights, jnp.asarray(ids), kv, 0,
                      logits_all=True, compute_dtype=jnp.float32)
    kv = init_kv_cache(cfg, 1, 16, dtype=jnp.float32)
    a, kv = forward(cfg, weights, jnp.asarray(ids[:, :2]), kv, 0,
                    logits_all=True, compute_dtype=jnp.float32)
    b, kv = forward(cfg, weights, jnp.asarray(ids[:, 2:]), kv, 2,
                    logits_all=True, compute_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(a), np.asarray(b)], 1),
        np.asarray(full), atol=2e-4)


# --- qwen2vl M-RoPE ---------------------------------------------------------


def mrope_numpy(x, pos4, n_dims, sections, freq_base=10000.0):
    """Direct port of ggml_mrope_cache_init + neox rotation
    (ggml-cpu.c:8650-8706, indep_sects=False)."""
    B, T, NH, HD_ = x.shape
    out = x.copy()
    half = n_dims // 2
    sect_dims = sum(sections)
    sec_w = sections[0] + sections[1]
    sec_e = sections[2] + sec_w
    theta_scale = freq_base ** (-2.0 / n_dims)
    for b in range(B):
        for t in range(T):
            th = [float(pos4[k, b, t]) for k in range(4)]
            for i0 in range(0, n_dims, 2):
                sector = (i0 // 2) % sect_dims
                if sector < sections[0]:
                    theta = th[0]
                elif sector < sec_w:
                    theta = th[1]
                elif sector < sec_e:
                    theta = th[2]
                else:
                    theta = th[3]
                c, s = np.cos(theta), np.sin(theta)
                ic = i0 // 2
                for hh in range(NH):
                    x0 = x[b, t, hh, ic]
                    x1 = x[b, t, hh, ic + half]
                    out[b, t, hh, ic] = x0 * c - x1 * s
                    out[b, t, hh, ic + half] = x0 * s + x1 * c
                th = [v * theta_scale for v in th]
    return out


def test_mrope_vs_numpy_port():
    rng = np.random.default_rng(7)
    HD_ = 16
    sections = (3, 2, 2, 1)  # sums to half=8
    x = rng.standard_normal((1, 3, 2, HD_)).astype(np.float32)
    pos4 = np.stack([  # distinct t/h/w/e streams
        np.asarray([[4, 5, 6]]), np.asarray([[1, 2, 3]]),
        np.asarray([[7, 8, 9]]), np.asarray([[0, 0, 0]])]).astype(np.int32)
    params = RopeParams(n_dims=HD_, mode="mrope", sections=sections)
    ours = np.asarray(apply_rope(jnp.asarray(x), jnp.asarray(pos4), params))
    ref = mrope_numpy(x, pos4, HD_, sections)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_mrope_text_equals_neox():
    """Equal t/h/w streams with empty e-section == plain NEOX rope (how
    qwen2vl decodes text, examples/llava/qwen2vl-cli.cpp:100-106)."""
    rng = np.random.default_rng(8)
    HD_ = 16
    x = rng.standard_normal((2, 4, 2, HD_)).astype(np.float32)
    pos = np.asarray([[0, 1, 2, 3], [5, 6, 7, 8]], np.int32)
    m = RopeParams(n_dims=HD_, mode="mrope", sections=(2, 3, 3, 0))
    n = RopeParams(n_dims=HD_, mode="neox")
    a = np.asarray(apply_rope(jnp.asarray(x), jnp.asarray(pos), m))
    b = np.asarray(apply_rope(jnp.asarray(x), jnp.asarray(pos), n))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_qwen2vl_forward(tmp_path):
    w = GGUFWriter()
    w.add("general.architecture", "qwen2vl")
    w.add("qwen2vl.block_count", L)
    w.add("qwen2vl.embedding_length", D)
    w.add("qwen2vl.feed_forward_length", FF)
    w.add("qwen2vl.attention.head_count", H)
    w.add("qwen2vl.attention.head_count_kv", 2)
    w.add("qwen2vl.vocab_size", V)
    w.add("qwen2vl.context_length", 64)
    w.add("qwen2vl.rope.dimension_sections", [HD // 4, HD // 8, HD // 8, 0])
    rng = np.random.default_rng(9)
    w.add_tensor("token_embd.weight", rnd(rng, V, D))
    w.add_tensor("output_norm.weight", np.ones(D, np.float32))
    w.add_tensor("output.weight", rnd(rng, V, D))
    for i in range(L):
        p = f"blk.{i}."
        r = np.random.default_rng(70 + i)
        w.add_tensor(p + "attn_norm.weight", np.ones(D, np.float32))
        w.add_tensor(p + "attn_q.weight", rnd(r, D, D))
        w.add_tensor(p + "attn_q.bias", rnd(r, D))
        w.add_tensor(p + "attn_k.weight", rnd(r, 2 * HD, D))
        w.add_tensor(p + "attn_k.bias", rnd(r, 2 * HD))
        w.add_tensor(p + "attn_v.weight", rnd(r, 2 * HD, D))
        w.add_tensor(p + "attn_v.bias", rnd(r, 2 * HD))
        w.add_tensor(p + "attn_output.weight", rnd(r, D, D))
        w.add_tensor(p + "ffn_norm.weight", np.ones(D, np.float32))
        w.add_tensor(p + "ffn_gate.weight", rnd(r, FF, D))
        w.add_tensor(p + "ffn_up.weight", rnd(r, FF, D))
        w.add_tensor(p + "ffn_down.weight", rnd(r, D, FF))
    path = str(tmp_path / "qwen2vl.gguf")
    w.write_file(path)
    cfg, logits = run_llama(path)
    assert cfg.rope_mode == "mrope"
    assert cfg.rope_sections == (HD // 4, HD // 8, HD // 8, 0)
    assert np.isfinite(logits).all()


def run_llama(path):
    with GGUFReader.open(path) as r:
        cfg, weights = load_llama_weights(r, dtype=jnp.float32)
    kv = init_kv_cache(cfg, 1, 16, dtype=jnp.float32)
    ids = np.arange(5, dtype=np.int32)[None] % V
    logits, _ = forward(cfg, weights, jnp.asarray(ids), kv, 0,
                        logits_all=True, compute_dtype=jnp.float32)
    return cfg, np.asarray(logits)
