"""n-gram lookup decoding: model-free speculation must be token-identical
to plain greedy decoding (the lookup example's core guarantee)."""
import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.models.convert_hf import convert_hf_llama
from ggml_hexagon_tpu.quant.formats import GGMLType
from ggml_hexagon_tpu.runtime import Engine, greedy_chain
from ggml_hexagon_tpu.runtime.lookup import LookupDecoder, NgramCache

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=300, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False)
    torch.manual_seed(12)
    m = transformers.LlamaForCausalLM(cfg)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    p = str(tmp_path_factory.mktemp("lk") / "m.gguf")
    convert_hf_llama(sd, cfg, p, qtype=GGMLType.F32)
    return p


def fresh(p):
    return Engine.from_gguf(p, max_seq=160, compute_dtype=jnp.float32,
                            kv_dtype=jnp.float32)


def test_ngram_cache():
    c = NgramCache()
    c.update([1, 2, 3, 1, 2, 3, 1, 2, 4])
    assert c.predict([9, 9, 1, 2]) == 3  # (1,2)->3 twice beats ->4 once
    assert c.predict([3, 1, 2]) == 3     # longer n-gram (3,1,2)->3? seen once
    assert c.predict([7, 7, 7]) is None


def test_lookup_matches_greedy(model):
    # untrained models repeat heavily -> lookup should accept drafts
    prompt = [1, 10, 20, 30]
    want = list(fresh(model).generate(prompt, n_predict=30,
                                      sampler=greedy_chain(), stop_ids=set()))
    dec = LookupDecoder(fresh(model), n_draft=6)
    got = dec.generate(prompt, n_predict=30, sampler=greedy_chain(), stop_ids=set())
    assert got == want
    assert dec.stats.n_drafted > 0  # the cache actually proposed drafts
    assert dec.stats.n_accepted > 0


def test_lookup_with_static_cache(model):
    static = NgramCache()
    static.update([5, 6, 7, 8] * 10)
    dec = LookupDecoder(fresh(model), n_draft=4, static_cache=static)
    prompt = [1, 5, 6, 7]
    want = list(fresh(model).generate(prompt, n_predict=10,
                                      sampler=greedy_chain(), stop_ids=set()))
    got = dec.generate(prompt, n_predict=10, sampler=greedy_chain(), stop_ids=set())
    assert got == want
