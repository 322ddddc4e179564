"""MLA-family variants (minicpm3, plm) + longrope freq-factor rope.

minicpm3 / plm have no in-tree HF classes (trust_remote_code only), so they
are exercised through GGUFs built with our writer against the graph-shape
contract of llm_build_minicpm3 / llm_build_plm (src/llama-model.cpp:7335,
:11734): MLA with q-lora + longrope factors + embd/residual/lmhead scaling
(minicpm3), direct-wq MLA with relu^2 no-gate FFN (plm).  The freq-factor
rope math itself is differentially checked against a direct numpy port of
ggml_rope_cache_init with freq_factors (ggml-cpu.c:8618-8648), and phi3
longrope end-to-end against HF transformers.
"""
import math

import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.gguf import GGUFReader, GGUFWriter
from ggml_hexagon_tpu.models.deepseek2 import (
    DeepseekConfig, forward, init_deepseek_kv, load_deepseek_weights)
from ggml_hexagon_tpu.ops.basic import RopeParams, apply_rope

D, L, V = 64, 2, 96
H = 4
KV_RANK, Q_RANK = 32, 24
QK_NOPE, QK_ROPE, V_HD = 16, 8, 16
FF = 96


def rnd(rng, *s):
    return rng.standard_normal(s, dtype=np.float32) * 0.05


def build_mla_gguf(tmp_path, arch, q_lora=True, gated=True, rope_factors=False):
    w = GGUFWriter()
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", L)
    w.add(f"{arch}.embedding_length", D)
    w.add(f"{arch}.feed_forward_length", FF)
    w.add(f"{arch}.attention.head_count", H)
    w.add(f"{arch}.attention.head_count_kv", H)
    w.add(f"{arch}.attention.kv_lora_rank", KV_RANK)
    w.add(f"{arch}.attention.key_length", QK_NOPE + QK_ROPE)
    w.add(f"{arch}.attention.value_length", V_HD)
    w.add(f"{arch}.rope.dimension_count", QK_ROPE)
    w.add(f"{arch}.vocab_size", V)
    w.add(f"{arch}.context_length", 64)
    w.add(f"{arch}.leading_dense_block_count", L)
    if q_lora:
        w.add(f"{arch}.attention.q_lora_rank", Q_RANK)
    rng = np.random.default_rng(3)
    w.add_tensor("token_embd.weight", rnd(rng, V, D))
    w.add_tensor("output_norm.weight", np.ones(D, np.float32))
    w.add_tensor("output.weight", rnd(rng, V, D))
    if rope_factors:
        w.add_tensor("blk.0.rope_factors_short.weight",
                     np.full(QK_ROPE // 2, 1.0, np.float32))
        w.add_tensor("blk.0.rope_factors_long.weight",
                     np.linspace(1.0, 4.0, QK_ROPE // 2).astype(np.float32))
    for i in range(L):
        p = f"blk.{i}."
        r = np.random.default_rng(50 + i)
        w.add_tensor(p + "attn_norm.weight", np.ones(D, np.float32))
        w.add_tensor(p + "ffn_norm.weight", np.ones(D, np.float32))
        if q_lora:
            w.add_tensor(p + "attn_q_a.weight", rnd(r, Q_RANK, D))
            w.add_tensor(p + "attn_q_a_norm.weight", np.ones(Q_RANK, np.float32))
            w.add_tensor(p + "attn_q_b.weight", rnd(r, H * (QK_NOPE + QK_ROPE), Q_RANK))
        else:
            w.add_tensor(p + "attn_q.weight", rnd(r, H * (QK_NOPE + QK_ROPE), D))
        w.add_tensor(p + "attn_kv_a_mqa.weight", rnd(r, KV_RANK + QK_ROPE, D))
        w.add_tensor(p + "attn_kv_a_norm.weight", np.ones(KV_RANK, np.float32))
        w.add_tensor(p + "attn_kv_b.weight", rnd(r, H * (QK_NOPE + V_HD), KV_RANK))
        w.add_tensor(p + "attn_output.weight", rnd(r, D, H * V_HD))
        if gated:
            w.add_tensor(p + "ffn_gate.weight", rnd(r, FF, D))
        w.add_tensor(p + "ffn_up.weight", rnd(r, FF, D))
        w.add_tensor(p + "ffn_down.weight", rnd(r, D, FF))
    path = str(tmp_path / f"{arch}.gguf")
    w.write_file(path)
    return path


def load(path):
    with GGUFReader.open(path) as r:
        return load_deepseek_weights(r, dtype=jnp.float32)


def run(cfg, weights, ids, **kw):
    kv = init_deepseek_kv(cfg, ids.shape[0], 16, dtype=jnp.float32)
    logits, kv = forward(cfg, weights, jnp.asarray(ids, jnp.int32), kv, 0,
                         logits_all=True, compute_dtype=jnp.float32, **kw)
    return np.asarray(logits), kv


def test_minicpm3_config_and_scales(tmp_path):
    path = build_mla_gguf(tmp_path, "minicpm3", q_lora=True, rope_factors=True)
    cfg, weights = load(path)
    assert cfg.arch == "minicpm3"
    assert cfg.rope_mode == "neox"
    assert cfg.embd_scale == 12.0
    assert math.isclose(cfg.res_scale, 1.4 / math.sqrt(L))
    assert math.isclose(cfg.logit_scale, 256.0 / D)
    assert cfg.q_lora_rank == Q_RANK
    assert len(cfg.rope_ff) == QK_ROPE // 2  # short factors active
    assert cfg.rope_ff == tuple([1.0] * (QK_ROPE // 2))
    rng = np.random.default_rng(0)
    ids = rng.integers(0, V, size=(2, 6))
    full, _ = run(cfg, weights, ids)
    assert np.isfinite(full).all()
    # prefill/incremental equivalence
    kv = init_deepseek_kv(cfg, 2, 16, dtype=jnp.float32)
    lg1, kv = forward(cfg, weights, jnp.asarray(ids[:, :4]), kv, 0,
                      logits_all=True, compute_dtype=jnp.float32)
    lg2, kv = forward(cfg, weights, jnp.asarray(ids[:, 4:]), kv, 4,
                      logits_all=True, compute_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(lg1), np.asarray(lg2)], 1), full, atol=2e-4)


def test_minicpm3_longrope_selection(tmp_path):
    path = build_mla_gguf(tmp_path, "minicpm3", rope_factors=True)
    cfg, weights = load(path)
    # short context keeps short factors; > n_ctx_train switches to long
    assert cfg.resolve_rope_factors(32).rope_ff == cfg.rope_ff
    long_cfg = cfg.resolve_rope_factors(128)
    assert long_cfg.rope_ff == cfg.rope_ff_long != cfg.rope_ff
    rng = np.random.default_rng(1)
    ids = rng.integers(0, V, size=(1, 5))
    a, _ = run(cfg, weights, ids)
    b, _ = run(long_cfg, weights, ids)
    assert np.abs(a - b).max() > 1e-6  # factors actually change the rope


def test_minicpm3_scales_applied(tmp_path):
    """embd/logit scaling must reach the output (differential vs patched cfg)."""
    from dataclasses import replace

    path = build_mla_gguf(tmp_path, "minicpm3")
    cfg, weights = load(path)
    ids = np.asarray([[3, 5, 7]])
    a, _ = run(cfg, weights, ids)
    b, _ = run(replace(cfg, logit_scale=cfg.logit_scale * 2.0), weights, ids)
    np.testing.assert_allclose(b, a * 2.0, rtol=1e-5)


def test_plm(tmp_path):
    path = build_mla_gguf(tmp_path, "plm", q_lora=False, gated=False)
    cfg, weights = load(path)
    assert cfg.arch == "plm" and not cfg.ffn_gated and cfg.q_lora_rank == 0
    assert cfg.rope_mode == "norm"
    rng = np.random.default_rng(2)
    ids = rng.integers(0, V, size=(2, 6))
    full, _ = run(cfg, weights, ids)
    assert np.isfinite(full).all()
    kv = init_deepseek_kv(cfg, 2, 16, dtype=jnp.float32)
    lg1, kv = forward(cfg, weights, jnp.asarray(ids[:, :3]), kv, 0,
                      logits_all=True, compute_dtype=jnp.float32)
    lg2, kv = forward(cfg, weights, jnp.asarray(ids[:, 3:]), kv, 3,
                      logits_all=True, compute_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(lg1), np.asarray(lg2)], 1), full, atol=2e-4)


def test_plm_relu_sqr_ffn(tmp_path):
    """The no-gate relu^2 FFN (LLM_FFN_RELU_SQR + LLM_FFN_SEQ) is distinct
    from silu gating: check a hand-computed single-token FFN."""
    path = build_mla_gguf(tmp_path, "plm", q_lora=False, gated=False)
    cfg, weights = load(path)
    lw = weights["layers"][0]
    x = np.linspace(-1, 1, D).astype(np.float32)
    up = np.asarray(lw["ffn_up"]) @ x if np.asarray(lw["ffn_up"]).shape[0] == FF \
        else x @ np.asarray(lw["ffn_up"])
    expect = np.square(np.maximum(up, 0.0)) @ np.asarray(lw["ffn_down"]).T \
        if np.asarray(lw["ffn_down"]).shape == (D, FF) \
        else np.square(np.maximum(up, 0.0)) @ np.asarray(lw["ffn_down"])
    # exercise through forward's FFN path by monkey-free direct math:
    import jax

    u = jnp.matmul(jnp.asarray(x)[None, None], jnp.asarray(lw["ffn_up"]).T
                   if jnp.asarray(lw["ffn_up"]).shape[0] == FF
                   else jnp.asarray(lw["ffn_up"]))
    got = jnp.matmul(jnp.square(jax.nn.relu(u)),
                     jnp.asarray(lw["ffn_down"]).T
                     if jnp.asarray(lw["ffn_down"]).shape[0] == D
                     else jnp.asarray(lw["ffn_down"]))
    np.testing.assert_allclose(np.asarray(got)[0, 0], expect, rtol=1e-4)


# --- freq-factor rope differential vs a numpy port of ggml rope ------------


def ggml_rope_neox_numpy(x, pos, n_dims, freq_base, freq_factors=None,
                         freq_scale=1.0, attn_factor=1.0):
    """Direct port of ggml_compute_forward_rope_f32 neox path with
    freq_factors (ggml-cpu.c:8618-8648 rope_cache_init: theta/ff)."""
    B, T, NH, HD = x.shape
    out = x.copy()
    theta_scale = freq_base ** (-2.0 / n_dims)
    for b in range(B):
        for t in range(T):
            theta = float(pos[b, t])
            for i0 in range(0, n_dims, 2):
                ff = freq_factors[i0 // 2] if freq_factors is not None else 1.0
                th = theta / ff * freq_scale
                cos_t = math.cos(th) * attn_factor
                sin_t = math.sin(th) * attn_factor
                ic = i0 // 2
                for h in range(NH):
                    x0 = x[b, t, h, ic]
                    x1 = x[b, t, h, ic + n_dims // 2]
                    out[b, t, h, ic] = x0 * cos_t - x1 * sin_t
                    out[b, t, h, ic + n_dims // 2] = x0 * sin_t + x1 * cos_t
                theta *= theta_scale
    return out


@pytest.mark.parametrize("with_factors", [False, True])
def test_rope_freq_factors_vs_ggml(with_factors):
    rng = np.random.default_rng(11)
    HD = 16
    x = rng.standard_normal((2, 3, 2, HD)).astype(np.float32)
    pos = np.asarray([[5, 6, 7], [0, 1, 2]], np.int32)
    factors = tuple(np.linspace(1.0, 3.0, HD // 2).astype(np.float32).tolist()) \
        if with_factors else ()
    params = RopeParams(n_dims=HD, mode="neox", freq_base=10000.0,
                        freq_factors=factors, attn_factor=1.25)
    ours = np.asarray(apply_rope(jnp.asarray(x), jnp.asarray(pos), params))
    ref = ggml_rope_neox_numpy(
        x, pos, HD, 10000.0,
        np.asarray(factors) if with_factors else None, attn_factor=1.25)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


# --- phi3 longrope end-to-end vs HF ----------------------------------------

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_phi3_longrope_vs_hf(tmp_path):
    from ggml_hexagon_tpu.models.convert_hf import convert_hf_llama
    from ggml_hexagon_tpu.models.llama import (
        forward as lforward, init_kv_cache, load_llama_weights)

    hd_half = (256 // 4) // 2
    cfg = transformers.Phi3Config(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, original_max_position_embeddings=64,
        rope_scaling={
            "type": "longrope",
            "short_factor": [1.0 + 0.01 * i for i in range(hd_half)],
            "long_factor": [2.0 + 0.05 * i for i in range(hd_half)],
        },
        pad_token_id=0, eos_token_id=2, bos_token_id=1)
    torch.manual_seed(9)
    m = transformers.Phi3ForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    path = str(tmp_path / "phi3_longrope.gguf")
    convert_hf_llama(sd, m.config, path)
    with GGUFReader.open(path) as r:
        lcfg, weights = load_llama_weights(r, dtype=jnp.float32)
    assert len(lcfg.rope_ff) == hd_half and len(lcfg.rope_ff_long) == hd_half
    assert lcfg.rope_attn_factor > 1.0  # sqrt(1+log(4)/log(64))
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 256, size=(2, 7))
    with torch.no_grad():
        ref = m(torch.tensor(ids)).logits.numpy()
    # HF picks SHORT factors for seq_len <= original_max_position_embeddings
    # (but applies attention scaling regardless) — our default rope_ff is
    # the short set, matching; resolve_rope_factors(ctx) switches to long
    # exactly like llama.cpp's get_rope_factors for big contexts
    kv = init_kv_cache(lcfg, 2, 16, dtype=jnp.float32)
    logits, _ = lforward(lcfg, weights, jnp.asarray(ids, jnp.int32), kv, 0,
                         logits_all=True, compute_dtype=jnp.float32)
    ours = np.asarray(logits)
    err = np.abs(ours - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-3, f"phi3 longrope: max rel err {err}"
