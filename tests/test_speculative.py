"""Speculative decoding tests — the key invariant (same as the reference's
greedy guarantee): speculative greedy output is IDENTICAL to plain greedy
decoding of the target model, for any draft."""
import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.models.convert_hf import convert_hf_llama
from ggml_hexagon_tpu.quant.formats import GGMLType
from ggml_hexagon_tpu.runtime import Engine, greedy_chain
from ggml_hexagon_tpu.runtime.speculative import SpeculativeDecoder, check_compat

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def make_model(tmp, seed, layers, name, vocab=300):
    cfg = transformers.LlamaConfig(
        vocab_size=vocab, hidden_size=256, intermediate_size=512,
        num_hidden_layers=layers, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False)
    torch.manual_seed(seed)
    m = transformers.LlamaForCausalLM(cfg)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    toks = ["<unk>", "<s>", "</s>"] + [f"<0x{b:02X}>" for b in range(256)] + [f"t{i}" for i in range(vocab - 259)]
    p = str(tmp / f"{name}.gguf")
    convert_hf_llama(sd, cfg, p, qtype=GGMLType.F32, tokenizer_fields={
        "tokenizer.ggml.model": "llama", "tokenizer.ggml.tokens": toks[:vocab],
        "tokenizer.ggml.scores": [0.0]*vocab,
        "tokenizer.ggml.token_type": [2, 3, 3] + [6]*256 + [1]*(vocab-259)})
    return p


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("spec")
    target = make_model(tmp, seed=0, layers=3, name="target")
    draft_same = make_model(tmp, seed=0, layers=3, name="draft_same")  # identical
    draft_diff = make_model(tmp, seed=9, layers=1, name="draft_diff")  # different
    return target, draft_same, draft_diff


def fresh(p):
    return Engine.from_gguf(p, max_seq=128, compute_dtype=jnp.float32,
                            kv_dtype=jnp.float32)


def baseline_greedy(p, prompt, n):
    eng = fresh(p)
    return list(eng.generate(prompt, n_predict=n, sampler=greedy_chain(), stop_ids=set()))


def test_speculative_identical_draft_matches_greedy(models):
    target, draft_same, _ = models
    prompt = [1, 10, 20, 30]
    want = baseline_greedy(target, prompt, 24)
    spec = SpeculativeDecoder(fresh(target), fresh(draft_same), n_draft=8, p_min=0.0)
    got = spec.generate(prompt, n_predict=24, sampler=greedy_chain(), stop_ids=set())
    assert got == want
    # identical draft should accept nearly everything
    assert spec.stats.accept_rate > 0.8  # tail round overdrafts past n_predict


def test_speculative_different_draft_matches_greedy(models):
    target, _, draft_diff = models
    prompt = [1, 5, 7, 11]
    want = baseline_greedy(target, prompt, 20)
    spec = SpeculativeDecoder(fresh(target), fresh(draft_diff), n_draft=6, p_min=0.0)
    got = spec.generate(prompt, n_predict=20, sampler=greedy_chain(), stop_ids=set())
    assert got == want  # correctness regardless of draft quality


def test_speculative_low_confidence_draft(models):
    target, _, draft_diff = models
    prompt = [1, 3]
    want = baseline_greedy(target, prompt, 10)
    spec = SpeculativeDecoder(fresh(target), fresh(draft_diff), n_draft=6, p_min=0.99)
    got = spec.generate(prompt, n_predict=10, sampler=greedy_chain(), stop_ids=set())
    assert got == want


def test_compat_check(models, tmp_path):
    target, draft_same, _ = models
    check_compat(fresh(target), fresh(draft_same))  # ok
    bad = make_model(tmp_path, seed=1, layers=1, name="bad", vocab=300)
    # corrupt a token text by building different vocab size
    bad2 = make_model(tmp_path, seed=1, layers=1, name="bad2", vocab=1024)
    with pytest.raises(ValueError, match="vocab size"):
        check_compat(fresh(target), fresh(bad2))
