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
