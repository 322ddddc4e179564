"""Model-math differential test: our LLaMA forward vs HuggingFace transformers.

transformers (CPU torch) is an independent oracle for the full decoder
semantics — RoPE (incl. the GGUF Q/K permutation), GQA, RMSNorm, SwiGLU,
causal masking, and KV-cache equivalence (prefill+decode == full prefill).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.gguf import GGUFReader
from ggml_hexagon_tpu.models.convert_hf import convert_hf_llama
from ggml_hexagon_tpu.models.llama import (
    LlamaConfig,
    forward,
    init_kv_cache,
    load_llama_weights,
)
from ggml_hexagon_tpu.quant.formats import GGMLType

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_hf_model():
    cfg = transformers.LlamaConfig(
        vocab_size=512,
        hidden_size=256,
        intermediate_size=512,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    return model, cfg


@pytest.fixture(scope="module")
def our_model(tiny_hf_model, tmp_path_factory):
    model, cfg = tiny_hf_model
    path = str(tmp_path_factory.mktemp("gguf") / "tiny_f32.gguf")
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    convert_hf_llama(sd, cfg, path, qtype=GGMLType.F32)
    with GGUFReader.open(path) as r:
        return load_llama_weights(r, dtype=jnp.float32)


def hf_logits(model, ids):
    with torch.no_grad():
        return model(torch.tensor(ids)).logits.numpy()


def test_config_parsing(our_model):
    cfg, _ = our_model
    assert (cfg.n_vocab, cfg.n_embd, cfg.n_layer) == (512, 256, 3)
    assert (cfg.n_head, cfg.n_head_kv, cfg.n_ff) == (4, 2, 512)
    assert cfg.rms_eps == pytest.approx(1e-5)
    assert cfg.rope_theta == pytest.approx(10000.0)
    assert cfg.n_ctx_train == 256
    assert cfg.hd == 64


def test_prefill_logits_match_hf(tiny_hf_model, our_model):
    model, _ = tiny_hf_model
    cfg, weights = our_model
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 512, size=(2, 17))
    ref = hf_logits(model, ids)
    kv = init_kv_cache(cfg, 2, 32, dtype=jnp.float32)
    logits, _ = forward(
        cfg, weights, jnp.asarray(ids, jnp.int32), kv, 0,
        logits_all=True, compute_dtype=jnp.float32,
    )
    ours = np.asarray(logits)
    err = np.abs(ours - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-3, f"max rel err {err}"


def test_kv_cache_decode_equals_prefill(tiny_hf_model, our_model):
    """Prefill T tokens then decode 3 one at a time == prefill T+3."""
    model, _ = tiny_hf_model
    cfg, weights = our_model
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 512, size=(1, 12))
    kv = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    _, kv = forward(cfg, weights, jnp.asarray(ids[:, :9], jnp.int32), kv, 0,
                    compute_dtype=jnp.float32)
    outs = []
    for t in range(9, 12):
        logits, kv = forward(cfg, weights, jnp.asarray(ids[:, t : t + 1], jnp.int32),
                             kv, t, compute_dtype=jnp.float32)
        outs.append(np.asarray(logits))
    full, _ = forward(cfg, weights, jnp.asarray(ids, jnp.int32),
                      init_kv_cache(cfg, 1, 32, dtype=jnp.float32), 0,
                      logits_all=True, compute_dtype=jnp.float32)
    full = np.asarray(full)
    for i, o in enumerate(outs):
        np.testing.assert_allclose(o, full[:, 9 + i], rtol=2e-3, atol=2e-4)


def test_quantized_model_close(tiny_hf_model, tmp_path):
    """Q8_0-quantized weights stay close to the f32 oracle logits."""
    model, hf_cfg = tiny_hf_model
    path = str(tmp_path / "tiny_q8.gguf")
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    convert_hf_llama(sd, hf_cfg, path, qtype=GGMLType.Q8_0)
    with GGUFReader.open(path) as r:
        cfg, weights = load_llama_weights(r)
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 512, size=(1, 8))
    ref = hf_logits(model, ids)
    kv = init_kv_cache(cfg, 1, 16)
    logits, _ = forward(cfg, weights, jnp.asarray(ids, jnp.int32), kv, 0, logits_all=True)
    ours = np.asarray(logits)
    # quantization + bf16: correlation must be extremely high
    c = np.corrcoef(ours.reshape(-1), ref.reshape(-1))[0, 1]
    assert c > 0.999, f"corr {c}"
    assert np.argmax(ours[0, -1]) == np.argmax(ref[0, -1])


def test_quantized_kv_cache_close_to_f32(tiny_hf_model, our_model):
    """Q8_0 KV cache: logits stay within quantization noise of the exact
    cache (the reference's type_k/type_v=Q8_0 capability)."""
    import jax.numpy as jnp
    from ggml_hexagon_tpu.models.llama import forward, init_kv_cache

    model, _ = tiny_hf_model
    cfg, weights = our_model
    rng = np.random.default_rng(5)
    ids = rng.integers(0, 512, size=(1, 12))
    ref, _ = forward(cfg, weights, jnp.asarray(ids, jnp.int32),
                     init_kv_cache(cfg, 1, 16, jnp.float32), 0,
                     logits_all=True, compute_dtype=jnp.float32)
    qkv = init_kv_cache(cfg, 1, 16, "q8_0")
    out, new_kv = forward(cfg, weights, jnp.asarray(ids, jnp.int32), qkv, 0,
                          logits_all=True, compute_dtype=jnp.float32)
    assert set(new_kv) == {"k", "k_d", "v", "v_d"}
    a, b = np.asarray(out), np.asarray(ref)
    # per-row int8 scales (see _kv_quantize) are slightly coarser than the
    # old 32-group planes; correlation stays within quantization noise
    assert np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1] > 0.999
    # prefill+decode equivalence with quantized cache
    _, kv = forward(cfg, weights, jnp.asarray(ids[:, :8], jnp.int32),
                    init_kv_cache(cfg, 1, 16, "q8_0"), 0, compute_dtype=jnp.float32)
    step, _ = forward(cfg, weights, jnp.asarray(ids[:, 8:9], jnp.int32), kv, 8,
                      compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(step), a[:, 8], rtol=2e-2, atol=2e-2)


def test_fused_projections_identical(tiny_hf_model, our_model):
    """fuse_weights (wqkv / w_gateup) must be bit-identical in outputs."""
    import jax.numpy as jnp
    from ggml_hexagon_tpu.models.fuse import fuse_weights
    from ggml_hexagon_tpu.models.llama import forward, init_kv_cache
    from ggml_hexagon_tpu.models.convert_hf import convert_hf_llama
    from ggml_hexagon_tpu.models.llama import load_llama_weights
    import tempfile, os, torch

    model, hf_cfg = tiny_hf_model
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "q.gguf")
        convert_hf_llama(sd, hf_cfg, p, qtype=GGMLType.Q4_K)
        with GGUFReader.open(p) as r:
            cfg, weights = load_llama_weights(r)
    fused = fuse_weights(weights, cfg)
    l0 = fused["layers"][0]
    assert "wqkv" in l0
    # when the decode epilogue qualifies, the fused gate_up is row-permuted
    # into ffn_down's interleaved order (w_gateup_il); the prefill path
    # un-interleaves exactly, so bit-identity still holds below
    assert "w_gateup" in l0 or "w_gateup_il" in l0
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 512, size=(1, 7))
    kv = init_kv_cache(cfg, 1, 8)
    a, _ = forward(cfg, weights, jnp.asarray(ids, jnp.int32), kv, 0, logits_all=True)
    kv2 = init_kv_cache(cfg, 1, 8)
    b, _ = forward(cfg, fused, jnp.asarray(ids, jnp.int32), kv2, 0, logits_all=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_q4_kv_cache(our_model):
    """int4 KV cache (q4_0 semantics): half the KV HBM of q8_0, logits stay
    highly correlated with the f32 cache; dequant is exact q*d (values are
    stored bias-removed).  Reference analog: type_k/type_v=Q4_0 with FA."""
    import jax.numpy as jnp
    from ggml_hexagon_tpu.models.llama import (_kv_dequant, _kv_quantize,
                                               forward, init_kv_cache)

    cfg, weights = our_model
    rng = np.random.default_rng(6)

    # unit check: per-row symmetric int4 round trip (|err| <= amax/14;
    # per-row scales are the TPU-native cache format — _kv_quantize doc)
    x = rng.standard_normal((2, 64)).astype(np.float32)
    q, d = _kv_quantize(jnp.asarray(x), bits=4)
    assert q.dtype == jnp.int4
    back = np.asarray(_kv_dequant(q, d, jnp.float32))
    amax = np.abs(x).max(axis=-1, keepdims=True)
    assert (np.abs(back - x) <= amax / 14.0 + 1e-6).all()

    ids = rng.integers(0, 512, size=(1, 12))
    ref, _ = forward(cfg, weights, jnp.asarray(ids, jnp.int32),
                     init_kv_cache(cfg, 1, 16, jnp.float32), 0,
                     logits_all=True, compute_dtype=jnp.float32)
    out, new_kv = forward(cfg, weights, jnp.asarray(ids, jnp.int32),
                          init_kv_cache(cfg, 1, 16, "q4_0"), 0,
                          logits_all=True, compute_dtype=jnp.float32)
    assert new_kv["k"].dtype == jnp.int4
    a, b = np.asarray(out), np.asarray(ref)
    # 4-bit cache on an untrained random model: looser than q8_0's 0.9999
    assert np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1] > 0.97
    # prefill+decode equivalence with the int4 cache
    _, kv = forward(cfg, weights, jnp.asarray(ids[:, :8], jnp.int32),
                    init_kv_cache(cfg, 1, 16, "q4_0"), 0,
                    compute_dtype=jnp.float32)
    step, _ = forward(cfg, weights, jnp.asarray(ids[:, 8:9], jnp.int32), kv,
                      8, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(step), a[:, 8], rtol=5e-2,
                               atol=5e-2)


def test_moe_indirect_matches_dense_path():
    """Decode MoE through the gathered-expert kernel (MUL_MAT_ID analog)
    must match the dense all-experts evaluation (build_moe_ffn semantics:
    unselected experts weighted 0)."""
    import ggml_hexagon_tpu.models.llama as L
    from ggml_hexagon_tpu.models.llama import LlamaConfig, forward, init_kv_cache
    from ggml_hexagon_tpu.quant import pack as P
    from ggml_hexagon_tpu.quant.formats import GGMLType

    rng = np.random.default_rng(3)
    d, n_ff_e, E = 256, 256, 4
    cfg = LlamaConfig(n_vocab=97, n_embd=d, n_layer=1, n_head=2,
                      n_head_kv=2, n_ff=n_ff_e, n_expert=E, n_expert_used=2,
                      n_ff_exp=n_ff_e)

    def qt(n, k):
        return P.quantize_tensor(
            rng.normal(size=(n, k)).astype(np.float32) * 0.1,
            GGMLType.Q4_K).astype_device()

    lw = {
        "attn_norm": jnp.ones(d, jnp.float32),
        "ffn_norm": jnp.ones(d, jnp.float32),
        "wq": qt(d, d), "wk": qt(d, d), "wv": qt(d, d), "wo": qt(d, d),
        "ffn_gate_inp": jnp.asarray(
            rng.normal(size=(E, d)) * 0.1, jnp.float32),
        "ffn_gate_exps": qt(E * n_ff_e, d),
        "ffn_up_exps": qt(E * n_ff_e, d),
        "ffn_down_exps": qt(E * d, n_ff_e),
    }
    weights = {
        "tok_embd": jnp.asarray(rng.normal(size=(97, d)) * 0.1, jnp.float32),
        "output_norm": jnp.ones(d, jnp.float32),
        "output": qt(97, d),
        "layers": [lw],
    }
    kv = init_kv_cache(cfg, 1, 16)
    tok = jnp.asarray([[5]], jnp.int32)
    old = L.FUSED_EPILOGUE_INTERPRET
    try:
        L.FUSED_EPILOGUE_INTERPRET = True  # indirect kernel (interpret)
        li, _ = forward(cfg, weights, tok, kv, jnp.int32(0))
        L.FUSED_EPILOGUE_INTERPRET = False  # dense all-experts path
        ld, _ = forward(cfg, weights, tok, kv, jnp.int32(0))
    finally:
        L.FUSED_EPILOGUE_INTERPRET = old
    # bf16 activations route through three chained fast kernels on the
    # indirect path; hold it to the mul_mat NMSE class (5e-4, verified
    # 1.4e-4 vs an f32 dense oracle at the _moe_ffn level)
    a = np.asarray(li, np.float64)
    b = np.asarray(ld, np.float64)
    assert ((a - b) ** 2).sum() / (b ** 2).sum() < 5e-4
