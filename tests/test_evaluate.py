"""Quality-tooling tests: quantize policy, perplexity protocol, KL, imatrix.

The closed loop mirrors the reference's quality pipeline: collect imatrix ->
quantize with it -> lower PPL than without (the property the imatrix
machinery exists for)."""
import math

import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.gguf import GGUFReader
from ggml_hexagon_tpu.models.convert_hf import convert_hf_llama
from ggml_hexagon_tpu.models.llama import load_llama_weights
from ggml_hexagon_tpu.quant.formats import GGMLType
from ggml_hexagon_tpu.quant.policy import QuantPolicy, quantize_model
from ggml_hexagon_tpu.runtime.evaluate import (
    IMatrixCollector,
    kl_divergence,
    perplexity,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def f16_gguf(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(3)
    model = transformers.LlamaForCausalLM(cfg)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path_factory.mktemp("q") / "f16.gguf")
    convert_hf_llama(sd, cfg, path, qtype=GGMLType.F16)
    return path


def test_policy_rules():
    p = QuantPolicy("Q4_K_M", n_layer=32)
    assert p.tensor_type("output.weight", (256, 256)) == GGMLType.Q6_K
    assert p.tensor_type("blk.0.attn_v.weight", (256, 256)) == GGMLType.Q6_K  # first 1/8
    assert p.tensor_type("blk.16.attn_q.weight", (256, 256)) == GGMLType.Q4_K
    assert p.tensor_type("blk.0.attn_norm.weight", (256,)) == GGMLType.F32
    assert p.tensor_type("blk.31.ffn_down.weight", (256, 512)) == GGMLType.Q6_K  # last 1/8


def test_quantize_model_roundtrip(f16_gguf, tmp_path):
    out = str(tmp_path / "q4km.gguf")
    with GGUFReader.open(f16_gguf) as r:
        quantize_model(r, out, "Q4_K_M")
    with GGUFReader.open(out) as r:
        t = r.tensors["blk.0.attn_q.weight"]
        assert t.ggml_type == GGMLType.Q4_K
        assert r.tensors["output.weight"].ggml_type == GGMLType.Q6_K
        assert r.tensors["blk.0.attn_norm.weight"].ggml_type == GGMLType.F32
        # decodes to something close to the original
        with GGUFReader.open(f16_gguf) as rf:
            a = rf.tensor_f32("blk.0.attn_q.weight")
        b = r.tensor_f32("blk.0.attn_q.weight")
        rel = np.abs(a - b).mean() / np.abs(a).mean()
        assert rel < 0.12  # 4-bit on iid gaussian: ~0.075


def test_perplexity_protocol(f16_gguf):
    with GGUFReader.open(f16_gguf) as r:
        cfg, weights = load_llama_weights(r, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    toks = rng.integers(3, 255, size=64).tolist()
    res = perplexity(cfg, weights, toks, n_ctx=32, bos_id=1, compute_dtype=jnp.float32)
    # reference protocol: n_ctx - 1 - first targets per chunk
    # (perplexity.cpp process_logits span; verified vs a CPU build of the
    # reference by tools/parity.py)
    assert res.nll_count == 2 * (32 - 1 - 32 // 2)
    assert 1.0 < res.ppl < 10 * cfg.n_vocab
    assert res.err >= 0
    # untrained model: ppl should be near uniform = n_vocab
    assert res.ppl > 20


def test_kl_divergence_self_is_zero(f16_gguf):
    with GGUFReader.open(f16_gguf) as r:
        cfg, weights = load_llama_weights(r, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    toks = rng.integers(3, 255, size=32).tolist()
    res = kl_divergence(cfg, weights, cfg, weights, toks, n_ctx=32,
                        compute_dtype=jnp.float32)
    assert res["kld_mean"] < 1e-6
    assert res["same_top1"] == 1.0


def test_imatrix_collects_and_improves_quantization(f16_gguf, tmp_path):
    with GGUFReader.open(f16_gguf) as r:
        cfg, weights = load_llama_weights(r, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    col = IMatrixCollector(cfg, weights, compute_dtype=jnp.float32)
    for _ in range(2):
        col.process_chunk(rng.integers(3, 255, size=32).tolist())
    im = col.result()
    assert "blk.0.ffn_down.weight" in im
    assert im["blk.0.ffn_down.weight"].shape == (cfg.n_ff,)
    assert (im["blk.0.ffn_down.weight"] >= 0).all()
    # save/load round trip
    p = str(tmp_path / "im.npz")
    col.save(p)
    im2 = IMatrixCollector.load(p)
    np.testing.assert_allclose(im2["blk.0.attn_q.weight"], im["blk.0.attn_q.weight"])
    # quantize with imatrix runs end-to-end
    out = str(tmp_path / "q2k_im.gguf")
    with GGUFReader.open(f16_gguf) as r:
        quantize_model(r, out, "Q2_K", imatrix=im)
    with GGUFReader.open(out) as r2:
        assert r2.tensors["blk.0.ffn_up.weight"].ggml_type == GGMLType.Q2_K


@pytest.fixture(scope="module")
def mixtral_gguf(tmp_path_factory):
    cfg = transformers.MixtralConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(11)
    model = transformers.MixtralForCausalLM(cfg)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path_factory.mktemp("moe") / "mixtral_f32.gguf")
    convert_hf_llama(sd, cfg, path, qtype=GGMLType.F32)
    return path


def test_imatrix_per_expert_accumulation(mixtral_gguf):
    """MUL_MAT_ID imatrix entries are per-expert (imatrix.cpp:104-169):
    expert-major [E*C] slices where each expert's Σx² sums only its routed
    tokens — verified against an eager recording of the taps."""
    from ggml_hexagon_tpu.models.llama import forward, init_kv_cache

    with GGUFReader.open(mixtral_gguf) as r:
        cfg, weights = load_llama_weights(r, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    toks = rng.integers(3, 255, size=24).tolist()
    col = IMatrixCollector(cfg, weights, compute_dtype=jnp.float32)
    col.process_chunk(toks)
    im = col.result()
    E, C, FF = cfg.n_expert, cfg.n_embd, cfg.n_ff
    assert im["blk.0.ffn_gate_exps.weight"].shape == (E * C,)
    assert im["blk.0.ffn_down_exps.weight"].shape == (E * FF,)
    # every token routes to exactly n_expert_used experts
    cnt = col.counts["blk.0.ffn_gate_exps.weight"]
    assert cnt.shape == (E,)
    assert cnt.sum() == len(toks) * cfg.n_expert_used
    # eager differential oracle of the accumulation math
    rec = {}

    def rtap(name, x, expert=None):
        if expert is None:
            return
        e, _E, sel = expert
        rec.setdefault(name, []).append(
            (np.asarray(x, np.float64), e, np.asarray(sel)))

    kv = init_kv_cache(cfg, 1, len(toks), dtype=jnp.float32)
    forward(cfg, weights, jnp.asarray(np.asarray(toks, np.int32)[None]), kv,
            jnp.int32(0), logits_all=True, compute_dtype=jnp.float32,
            tap=rtap)
    name = "blk.0.ffn_gate_exps.weight"
    want = np.zeros((E, C))
    for x, e, sel in rec[name]:
        want[e] += ((x ** 2) * sel[..., None]).reshape(-1, C).sum(axis=0)
    got = col.sums[name]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_imatrix_moe_quantize_e2e_improves(mixtral_gguf, tmp_path):
    """imatrix -> quantize (per-expert slices) -> the quantized model is
    closer to f32 (in-sample KLD) than quantizing without imatrix."""
    from ggml_hexagon_tpu.runtime.evaluate import kl_divergence

    with GGUFReader.open(mixtral_gguf) as r:
        cfg, weights = load_llama_weights(r, dtype=jnp.float32)
    rng = np.random.default_rng(6)
    toks = rng.integers(3, 255, size=64).tolist()
    col = IMatrixCollector(cfg, weights, compute_dtype=jnp.float32)
    for c in range(2):
        col.process_chunk(toks[c * 32:(c + 1) * 32])
    im = col.result()
    q_plain = str(tmp_path / "q2k.gguf")
    q_im = str(tmp_path / "q2k_im.gguf")
    with GGUFReader.open(mixtral_gguf) as r:
        quantize_model(r, q_plain, "Q2_K")
    with GGUFReader.open(mixtral_gguf) as r:
        quantize_model(r, q_im, "Q2_K", imatrix=im)
    with GGUFReader.open(q_plain) as r:
        assert r.tensors["blk.0.ffn_gate_exps.weight"].ggml_type in (
            GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K)
        cfg_p, w_p = load_llama_weights(r, dtype=jnp.float32)
    with GGUFReader.open(q_im) as r:
        cfg_i, w_i = load_llama_weights(r, dtype=jnp.float32)
    kl_p = kl_divergence(cfg, weights, cfg_p, w_p, toks, n_ctx=32,
                         compute_dtype=jnp.float32)
    kl_i = kl_divergence(cfg, weights, cfg_i, w_i, toks, n_ctx=32,
                         compute_dtype=jnp.float32)
    assert kl_i["kld_mean"] < kl_p["kld_mean"], (kl_i, kl_p)
