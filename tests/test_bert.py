"""BERT encoder family: HF differential + quantized embedding smoke."""
import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.gguf import GGUFReader
from ggml_hexagon_tpu.models.bert import (
    convert_hf_bert, forward_bert, load_bert_weights, pool_bert)
from ggml_hexagon_tpu.quant.formats import GGMLType

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def tiny_bert(seed=0):
    cfg = transformers.BertConfig(
        vocab_size=384, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=512,
        max_position_embeddings=64, type_vocab_size=2)
    torch.manual_seed(seed)
    return transformers.BertModel(cfg).eval()


def test_bert_differential(tmp_path):
    m = tiny_bert()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    path = str(tmp_path / "bert.gguf")
    convert_hf_bert(sd, m.config, path, qtype=GGMLType.F32)
    with GGUFReader.open(path) as r:
        cfg, weights = load_bert_weights(r)
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 380, size=(2, 10))
    mask = np.ones((2, 10), np.int32)
    mask[1, 7:] = 0  # padding on row 1
    with torch.no_grad():
        ref = m(torch.tensor(ids), attention_mask=torch.tensor(mask))
    h = forward_bert(cfg, weights, jnp.asarray(ids, jnp.int32),
                     attn_mask=jnp.asarray(mask))
    ours = np.asarray(h)
    refh = ref.last_hidden_state.numpy()
    # compare only non-padded positions
    err = np.abs((ours - refh)[mask.astype(bool)]).max() / np.abs(refh).max()
    assert err < 2e-3, err
    # pooler head (cls + tanh dense)
    pooled = pool_bert(cfg, weights, h, mask, pooling="cls")
    perr = np.abs(pooled - ref.pooler_output.numpy()).max()
    assert perr < 2e-3, perr


def test_bert_mean_pool_quantized(tmp_path):
    m = tiny_bert(1)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    path = str(tmp_path / "bert_q.gguf")
    convert_hf_bert(sd, m.config, path, qtype=GGMLType.Q8_0)
    with GGUFReader.open(path) as r:
        cfg, weights = load_bert_weights(r)
    ids = np.array([[2, 7, 11, 13]], np.int32)
    h = forward_bert(cfg, weights, jnp.asarray(ids))
    e = pool_bert(cfg, weights, h, pooling="mean")
    assert e.shape == (1, 256) and np.isfinite(e).all()
    # cosine vs f32 path should be high even at Q8_0
    path2 = str(tmp_path / "bert_f.gguf")
    convert_hf_bert(sd, m.config, path2, qtype=GGMLType.F32)
    with GGUFReader.open(path2) as r:
        cfg2, w2 = load_bert_weights(r)
    e2 = pool_bert(cfg2, w2, forward_bert(cfg2, w2, jnp.asarray(ids)),
                   pooling="mean")
    cos = float((e[0] @ e2[0]) / (np.linalg.norm(e[0]) * np.linalg.norm(e2[0])))
    assert cos > 0.999, cos
