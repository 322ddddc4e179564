"""Embedding extraction + GGUF split-file tests."""
import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.gguf import GGUFReader
from ggml_hexagon_tpu.gguf.split import SplitReader, split_gguf
from ggml_hexagon_tpu.models.convert_hf import convert_hf_llama
from ggml_hexagon_tpu.models.llama import load_llama_weights
from ggml_hexagon_tpu.quant.formats import GGMLType
from ggml_hexagon_tpu.runtime.embedding import extract_embeddings

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(11)
    m = transformers.LlamaForCausalLM(cfg)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    p = str(tmp_path_factory.mktemp("emb") / "m.gguf")
    convert_hf_llama(sd, cfg, p, qtype=GGMLType.F16)
    return p


def test_embeddings(model_path):
    with GGUFReader.open(model_path) as r:
        cfg, weights = load_llama_weights(r, dtype=jnp.float32)
    seqs = [[1, 5, 9], [1, 5, 9, 20, 30]]
    e = extract_embeddings(cfg, weights, seqs, pooling="mean",
                           compute_dtype=jnp.float32)
    assert e.shape == (2, cfg.n_embd)
    np.testing.assert_allclose(np.linalg.norm(e, axis=1), 1.0, rtol=1e-5)
    # same sequence embeds identically; different sequences differ
    e2 = extract_embeddings(cfg, weights, [seqs[0]], compute_dtype=jnp.float32)
    np.testing.assert_allclose(e2[0], e[0], rtol=1e-5)
    assert not np.allclose(e[0], e[1])
    # per-token mode
    toks = extract_embeddings(cfg, weights, [seqs[0]], pooling="none",
                              compute_dtype=jnp.float32)
    assert toks[0].shape == (3, cfg.n_embd)


def test_split_roundtrip(model_path, tmp_path):
    base = str(tmp_path / "model")
    paths = split_gguf(model_path, base, max_tensors=7)
    assert len(paths) >= 2
    with GGUFReader.open(model_path) as orig, SplitReader.open(paths[0]) as sr:
        assert set(sr.tensors) == set(orig.tensors)
        assert sr.metadata["general.architecture"] == "llama"
        for name in list(orig.tensors)[:5]:
            np.testing.assert_array_equal(sr.tensor_bytes(name), orig.tensor_bytes(name))
    # model loads from splits
    with SplitReader.open(paths[0]) as sr:
        cfg, weights = load_llama_weights(sr, dtype=jnp.float32)
    assert cfg.n_layer == 2


def test_split_missing_shard_rejected(model_path, tmp_path):
    import os
    base = str(tmp_path / "m2")
    paths = split_gguf(model_path, base, max_tensors=7)
    os.remove(paths[1])
    with pytest.raises(FileNotFoundError):
        SplitReader.open(paths[0])
