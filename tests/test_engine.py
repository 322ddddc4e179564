"""End-to-end engine test: GGUF on disk -> generate tokens.

Uses a synthetic tiny llama GGUF (converted from a random HF model) with a
handcrafted SPM vocab, mirroring the reference's tiny-model smoke tests
(tests/test-autorelease.cpp + ci/run.sh tiny-model pipeline)."""
import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.gguf import GGUFReader
from ggml_hexagon_tpu.models.convert_hf import convert_hf_llama
from ggml_hexagon_tpu.quant.formats import GGMLType
from ggml_hexagon_tpu.runtime import Engine, greedy_chain, make_chain

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_gguf(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=300, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(1)
    model = transformers.LlamaForCausalLM(cfg)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    # minimal SPM vocab so the engine has a tokenizer
    toks = ["<unk>", "<s>", "</s>"] + [f"<0x{b:02X}>" for b in range(256)] + ["▁a", "▁b", "ab"] + [f"tok{i}" for i in range(38)]
    tf = {
        "tokenizer.ggml.model": "llama",
        "tokenizer.ggml.tokens": toks[:300],
        "tokenizer.ggml.scores": [0.0] * 300,
        "tokenizer.ggml.token_type": [2, 3, 3] + [6] * 256 + [1] * 41,
    }
    convert_hf_llama(sd, cfg, path, qtype=GGMLType.Q4_K, tokenizer_fields=tf)
    return path, model


def test_engine_generate(tiny_gguf):
    path, model = tiny_gguf
    eng = Engine.from_gguf(path, max_seq=64)
    prompt = [1, 10, 20, 30]
    toks = list(eng.generate(prompt, n_predict=8, sampler=greedy_chain()))
    assert 0 < len(toks) <= 8
    assert all(0 <= t < 300 for t in toks)
    assert eng.n_past == len(prompt) + len(toks)
    # deterministic: same prompt after reset -> same tokens
    eng.reset()
    toks2 = list(eng.generate(prompt, n_predict=8, sampler=greedy_chain()))
    assert toks == toks2


def test_engine_matches_hf_greedy(tiny_gguf, tmp_path):
    """f32 GGUF greedy decode must produce token-identical output to HF."""
    path, model = tiny_gguf
    cfg = model.config
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    f32_path = str(tmp_path / "tiny_f32.gguf")
    convert_hf_llama(sd, cfg, f32_path, qtype=GGMLType.F32)
    eng = Engine.from_gguf(f32_path, max_seq=64, compute_dtype=jnp.float32, kv_dtype=jnp.float32)
    prompt = [1, 5, 9, 13]
    ours = list(eng.generate(prompt, n_predict=10, sampler=greedy_chain(), stop_ids=set()))
    with torch.no_grad():
        hf = model.generate(
            torch.tensor([prompt]), max_new_tokens=10, do_sample=False,
            eos_token_id=None, pad_token_id=0)
    theirs = hf[0, len(prompt):].tolist()
    assert ours == theirs


def test_engine_chunked_prefill(tiny_gguf):
    """Prompt longer than one bucket: chunked prefill == HF logits."""
    path, model = tiny_gguf
    eng = Engine.from_gguf(path, max_seq=64)
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, 299, size=40).tolist()  # crosses bucket sizes 32+8
    logits = eng.prefill(np.asarray(prompt)[None, :])
    assert logits.shape == (1, 300)
    assert np.isfinite(logits).all()


def test_sampled_generation_runs(tiny_gguf):
    path, _ = tiny_gguf
    eng = Engine.from_gguf(path, max_seq=64)
    toks = list(eng.generate([1, 2, 3], n_predict=6,
                             sampler=make_chain(temp=0.9, seed=5), stop_ids=set()))
    assert len(toks) == 6


def test_generate_ondevice_matches_host_greedy(tiny_gguf):
    """Device-side scan loop (greedy) == host-loop greedy tokens."""
    path, _ = tiny_gguf
    eng = Engine.from_gguf(path, max_seq=64)
    prompt = [1, 10, 20, 30]
    host = list(eng.generate(prompt, n_predict=8, sampler=greedy_chain(), stop_ids=set()))
    eng.reset()
    dev = eng.generate_ondevice(prompt, n_predict=8, stop_at_eos=False)
    assert list(dev) == host


def test_generate_ondevice_eos_trim(tiny_gguf):
    path, _ = tiny_gguf
    eng = Engine.from_gguf(path, max_seq=64)
    out = eng.generate_ondevice([1, 5, 7], n_predict=6)
    assert len(out) <= 6
