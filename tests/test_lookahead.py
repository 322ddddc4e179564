"""Lookahead decoding: Jacobi n-gram speculation must stay token-identical
to plain greedy decoding (the lookahead example's core guarantee — the
schedule changes, the sampled stream must not)."""
import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.models.convert_hf import convert_hf_llama
from ggml_hexagon_tpu.quant.formats import GGMLType
from ggml_hexagon_tpu.runtime import Engine, greedy_chain
from ggml_hexagon_tpu.runtime.lookahead import LookaheadDecoder

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=300, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False)
    torch.manual_seed(21)
    m = transformers.LlamaForCausalLM(cfg)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    p = str(tmp_path_factory.mktemp("la") / "m.gguf")
    convert_hf_llama(sd, cfg, p, qtype=GGMLType.F32)
    return p


def fresh(p):
    return Engine.from_gguf(p, max_seq=160, compute_dtype=jnp.float32,
                            kv_dtype=jnp.float32)


def test_lookahead_matches_greedy(model):
    prompt = [1, 10, 20, 30]
    want = list(fresh(model).generate(prompt, n_predict=24,
                                      sampler=greedy_chain(), stop_ids=set()))
    dec = LookaheadDecoder(fresh(model), n_window=6, n_level=3, n_draft=4)
    got = dec.generate(prompt, n_predict=24, sampler=greedy_chain(),
                       stop_ids=set())
    assert got == want
    assert dec.stats.n_rounds > 0


def test_lookahead_pool_harvest(model):
    dec = LookaheadDecoder(fresh(model), n_window=4, n_level=3)
    prompt = [1, 5, 9, 13]
    dec.target.prefill(np.asarray(prompt, np.int32)[None])
    dec._seed_window(prompt)
    n_past0 = dec.target.n_past
    dec._jacobi_step(prompt)
    dec._jacobi_step(prompt)  # two iterations -> N-1 levels -> pool fills
    assert dec.target.n_past == n_past0  # KV rewound after each window eval
    assert len(dec.levels) == 2
    assert sum(len(v) for v in dec.pool.values()) > 0
    for first, conts in dec.pool.items():
        for c in conts:
            assert len(c) == 2  # N-1 continuation tokens per n-gram
