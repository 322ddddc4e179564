"""GritLM embedding/generation hybrid + the llama_set_causal_attn analog.

The non-causal path is checked against HF transformers with a full (non-
causal) attention mask — the exact semantics the reference toggles via
llama_set_causal_attn(false) for gritlm/embedding mode."""
import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.gguf import GGUFReader
from ggml_hexagon_tpu.models.convert_hf import convert_hf_llama
from ggml_hexagon_tpu.models.llama import forward, init_kv_cache, load_llama_weights
from ggml_hexagon_tpu.quant.formats import GGMLType

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False)
    torch.manual_seed(11)
    m = transformers.LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    p = str(tmp_path_factory.mktemp("grit") / "m.gguf")
    convert_hf_llama(sd, cfg, p, qtype=GGMLType.F32)
    return p, m


def test_noncausal_matches_hf_full_mask(setup):
    path, hf = setup
    with GGUFReader.open(path) as r:
        cfg, weights = load_llama_weights(r)
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 256, size=(1, 9))
    # HF with a full (bidirectional) attention mask
    T = ids.shape[1]
    full = torch.zeros((1, 1, T, T))  # additive mask, all zeros = all visible
    with torch.no_grad():
        emb = hf.model.embed_tokens(torch.tensor(ids))
        ref = hf(inputs_embeds=emb, attention_mask=full).logits.numpy()
    out, _ = forward(cfg, weights, jnp.asarray(ids, jnp.int32),
                     init_kv_cache(cfg, 1, T, jnp.float32), 0,
                     logits_all=True, compute_dtype=jnp.float32, causal=False)
    # same noise floor as the causal HF differential on this fixture (the
    # converter's f16 round-trips): |diff| ~ 6e-3
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-2, atol=1e-2)
    # and the mask semantics genuinely differ from causal
    causal_out, _ = forward(cfg, weights, jnp.asarray(ids, jnp.int32),
                            init_kv_cache(cfg, 1, T, jnp.float32), 0,
                            logits_all=True, compute_dtype=jnp.float32)
    assert np.abs(np.asarray(out) - np.asarray(causal_out)).max() > 0.1


def test_gritlm_encode_and_generate(setup):
    path, _ = setup
    from ggml_hexagon_tpu.runtime import Engine
    from ggml_hexagon_tpu.runtime.gritlm import encode, generate, gritlm_instruction

    assert gritlm_instruction("find docs").startswith("<|user|>")
    assert gritlm_instruction() == "<|embed|>\n"

    class ByteTok:  # minimal tokenizer: bytes as ids
        def encode(self, text, **kw):
            return [b % 250 for b in text.encode()]

        def decode(self, ids, **kw):
            return "".join(chr(40 + (i % 60)) for i in ids)

    with GGUFReader.open(path) as r:
        cfg, weights = load_llama_weights(r)
    tok = ByteTok()
    embs = encode(cfg, weights, tok, ["hello world", "deep sea fishing"],
                  instruction="retrieve", compute_dtype=jnp.float32)
    assert embs.shape == (2, cfg.n_embd)
    np.testing.assert_allclose(np.linalg.norm(embs, axis=1), 1.0, rtol=1e-5)
    # cosine(self, self) == 1 > cosine(a, b)
    assert embs[0] @ embs[0] > embs[0] @ embs[1]

    eng = Engine.from_gguf(path, max_seq=64, compute_dtype=jnp.float32,
                           kv_dtype=jnp.float32)
    eng.tokenizer = tok
    text = generate(eng, "<|user|>\nhi\n<|assistant|>\n", n_predict=4)
    assert isinstance(text, str) and len(text) > 0
