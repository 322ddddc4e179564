"""KV ops: context shift correctness, state save/load, prompt-cache reuse.

The key property (mirrors the reference's test_ctx_shift.py + the K
re-rotation semantics of build_kv_self_shift): after discarding a window
and shifting, decoding must equal decoding with a fresh cache prefilled
on the shifted token sequence.
"""
import io

import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.models.convert_hf import convert_hf_llama
from ggml_hexagon_tpu.quant.formats import GGMLType
from ggml_hexagon_tpu.runtime import Engine, greedy_chain

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(5)
    m = transformers.LlamaForCausalLM(cfg)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    p = str(tmp_path_factory.mktemp("kv") / "m.gguf")
    convert_hf_llama(sd, cfg, p, qtype=GGMLType.F32)
    return p


def fresh(model, **kw):
    return Engine.from_gguf(model, max_seq=64, compute_dtype=jnp.float32,
                            kv_dtype=jnp.float32, **kw)


@pytest.fixture(scope="module")
def model_1layer(tmp_path_factory):
    """1-layer model: K/V depend only on embeddings, so a shifted cache is
    exactly equivalent to a fresh prefill of the kept tokens — this isolates
    the K re-rotation math end-to-end."""
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(6)
    m = transformers.LlamaForCausalLM(cfg)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    p = str(tmp_path_factory.mktemp("kv1") / "m1.gguf")
    convert_hf_llama(sd, cfg, p, qtype=GGMLType.F32)
    return p


def test_context_shift_equals_fresh_prefill(model_1layer):
    rng = np.random.default_rng(0)
    toks = rng.integers(3, 255, size=20).tolist()
    n_keep, n_discard = 4, 8

    eng = fresh(model_1layer)
    eng.prefill(np.asarray(toks, np.int32)[None])
    eng.shift_context(n_keep, n_discard)
    logits_shifted = eng.decode_one(np.array([7]))

    kept = toks[:n_keep] + toks[n_keep + n_discard :]
    eng2 = fresh(model_1layer)
    eng2.prefill(np.asarray(kept, np.int32)[None])
    logits_fresh = eng2.decode_one(np.array([7]))

    np.testing.assert_allclose(logits_shifted, logits_fresh, rtol=2e-3, atol=2e-4)


def test_context_shift_multilayer_continues(model):
    """Multi-layer: shift keeps full-context K/V (reference semantics);
    decoding must continue finite and deterministic."""
    rng = np.random.default_rng(4)
    toks = rng.integers(3, 255, size=20).tolist()
    eng = fresh(model)
    eng.prefill(np.asarray(toks, np.int32)[None])
    eng.shift_context(4, 8)
    assert eng.n_past == 12
    a = eng.decode_one(np.array([7]))
    assert np.isfinite(a).all()
    b = eng.decode_one(np.array([9]))
    assert np.isfinite(b).all()


def test_truncate_rewinds(model):
    rng = np.random.default_rng(1)
    toks = rng.integers(3, 255, size=10).tolist()
    eng = fresh(model)
    eng.prefill(np.asarray(toks, np.int32)[None])
    eng.truncate(6)
    logits_a = eng.decode_one(np.array([toks[6]]))
    eng2 = fresh(model)
    eng2.prefill(np.asarray(toks[:6], np.int32)[None])
    logits_b = eng2.decode_one(np.array([toks[6]]))
    np.testing.assert_allclose(logits_a, logits_b, rtol=1e-4, atol=1e-5)


def test_state_save_load_roundtrip(model, tmp_path):
    rng = np.random.default_rng(2)
    toks = rng.integers(3, 255, size=12).tolist()
    eng = fresh(model)
    eng.prefill(np.asarray(toks, np.int32)[None])
    p = str(tmp_path / "state.npz")
    eng.save_state(p)
    cont_a = list(eng.generate_ondevice([toks[-1]], n_predict=5, stop_at_eos=False))

    eng2 = fresh(model)
    eng2.load_state(p)
    assert eng2.n_past == len(toks)
    # saved state continues identically (note: loading re-prefills nothing)
    eng2.truncate(len(toks))
    cont_b = list(eng2.generate_ondevice([toks[-1]], n_predict=5, stop_at_eos=False))
    assert cont_a == cont_b


def test_state_mismatch_rejected(model, tmp_path):
    eng = fresh(model)
    p = str(tmp_path / "s.npz")
    eng.save_state(p)
    eng2 = Engine.from_gguf(model, max_seq=32)  # different max_seq
    with pytest.raises(ValueError, match="mismatch"):
        eng2.load_state(p)


def test_prompt_cache_reuse(model):
    rng = np.random.default_rng(3)
    prefix = rng.integers(3, 255, size=16).tolist()
    eng = fresh(model)
    eng.prefill(np.asarray(prefix, np.int32)[None])
    n_eval_before = eng.perf.n_prefill
    # same prefix + new tail: only the tail (plus 0 rewind) should be evaluated
    full = prefix + [5, 9]
    logits = eng.prefill(np.asarray(full, np.int32)[None], reuse_cache=True)
    assert eng.perf.n_prefill - n_eval_before <= 3  # evaluated only the tail
    # oracle
    eng2 = fresh(model)
    ref = eng2.prefill(np.asarray(full, np.int32)[None])
    np.testing.assert_allclose(logits, ref, rtol=1e-4, atol=1e-5)


def test_quantized_cache_shift_and_state(model_1layer, tmp_path):
    """q8_0/q4_0 caches: context shift (dequant -> re-rotate -> requant) and
    state save/load must preserve all planes (k_d/v_d) and dtypes."""
    rng = np.random.default_rng(3)
    toks = rng.integers(3, 255, size=20).tolist()
    n_keep, n_discard = 4, 8
    for ctype in ("q8_0", "q4_0"):
        eng = Engine.from_gguf(model_1layer, max_seq=64,
                               compute_dtype=jnp.float32, kv_dtype=ctype)
        eng.prefill(np.asarray(toks, np.int32)[None])
        eng.shift_context(n_keep, n_discard)
        shifted = eng.decode_one(np.array([7]))

        kept = toks[:n_keep] + toks[n_keep + n_discard:]
        eng2 = Engine.from_gguf(model_1layer, max_seq=64,
                                compute_dtype=jnp.float32, kv_dtype=ctype)
        eng2.prefill(np.asarray(kept, np.int32)[None])
        fresh_l = eng2.decode_one(np.array([7]))
        # quantized caches requantize the shifted rows: small extra error
        tol = 5e-3 if ctype == "q8_0" else 5e-2
        np.testing.assert_allclose(shifted, fresh_l, rtol=tol, atol=tol)

        # state round-trip keeps the integer + scale planes intact
        p = str(tmp_path / f"s_{ctype}.bin")
        eng2.save_state(p)
        eng3 = Engine.from_gguf(model_1layer, max_seq=64,
                                compute_dtype=jnp.float32, kv_dtype=ctype)
        eng3.load_state(p)
        assert set(eng3.kv) == {"k", "v", "k_d", "v_d"}
        assert eng3.kv["k"].dtype == (jnp.int8 if ctype == "q8_0"
                                      else jnp.int4)
        a = eng2.decode_one(np.array([9]))
        b = eng3.decode_one(np.array([9]))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_self_extend_grouped_attention(our_engine_factory=None):
    """Self-extend (grp-attn, llama_kv_self_seq_div / main.cpp ga loop):
    positions compress by ga_n so 3x the window stays inside trained
    range; before compression triggers, outputs match plain decoding."""
    import jax.numpy as jnp
    import numpy as np
    import pytest

    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from ggml_hexagon_tpu.gguf import GGUFReader
    from ggml_hexagon_tpu.models.convert_hf import convert_hf_llama
    from ggml_hexagon_tpu.quant.formats import GGMLType
    from ggml_hexagon_tpu.runtime.engine import Engine
    import tempfile, os

    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        max_position_embeddings=64, tie_word_embeddings=False)
    torch.manual_seed(11)
    m = transformers.LlamaForCausalLM(cfg)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "t.gguf")
        convert_hf_llama(sd, cfg, path, qtype=GGMLType.F32)

        rng = np.random.default_rng(0)
        prompt = rng.integers(3, 127, size=12).tolist()

        plain = Engine.from_gguf(path, max_seq=128,
                                 compute_dtype=jnp.float32,
                                 kv_dtype=jnp.float32)
        ref = plain.prefill(np.asarray(prompt, np.int32)[None])

        se = Engine.from_gguf(path, max_seq=128, compute_dtype=jnp.float32,
                              kv_dtype=jnp.float32)
        se.enable_self_extend(2, 16)
        got = se.prefill(np.asarray(prompt, np.int32)[None])
        # below the first window: identical to plain attention
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

        # feed 3x the window: positions must compress below raw length
        more = rng.integers(3, 127, size=52).tolist()
        for t in more:
            se.decode_one(np.array([t]))
        n_total = se.n_past
        assert n_total == 64
        live_pos = se.cache_pos[0][:n_total]
        assert se.pos_head < n_total  # compression happened
        assert live_pos.max() < n_total
        assert np.isfinite(se.decode_one(np.array([5]))).all()
