"""i-quant / ternary format tests.

Decoders are differentially tested byte-for-byte against the reference's
gguf-py implementation on random bit patterns (every pattern decodes
deterministically); the planar decomposition must be bit-identical to the
wire decode; the fused matmul must meet the mul_mat NMSE bound."""
import warnings

import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.quant.formats import GGMLType, row_size
from ggml_hexagon_tpu.quant import pack as P
from ggml_hexagon_tpu.quant import ref_numpy as R
from ggml_hexagon_tpu.ops.qmatmul import qmatmul_xla

IQ_TYPES = [
    GGMLType.IQ4_NL, GGMLType.IQ4_XS, GGMLType.IQ2_XXS, GGMLType.IQ2_XS,
    GGMLType.IQ2_S, GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S,
    GGMLType.IQ1_M, GGMLType.TQ1_0, GGMLType.TQ2_0,
]


def random_wire(rng, t, N, K):
    return rng.integers(0, 256, size=row_size(t, K) * N, dtype=np.uint8)


@pytest.mark.parametrize("qtype", IQ_TYPES)
def test_decode_matches_gguf_py(reference_gguf_py, qtype, rng):
    from gguf.quants import dequantize as g_deq
    from gguf.constants import GGMLQuantizationType as GT

    N, K = 4, 1024
    buf = random_wire(rng, qtype, N, K)
    mine = R.dequantize(buf, qtype, N * K).reshape(N, K)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        theirs = g_deq(buf.reshape(N, -1), GT[qtype.name])
    np.testing.assert_array_equal(mine, theirs)


@pytest.mark.parametrize("qtype", IQ_TYPES)
def test_planes_exact(qtype, rng):
    N, K = 8, 512
    buf = random_wire(rng, qtype, N, K)
    ref = R.dequantize(buf, qtype, N * K).reshape(N, K)
    qt = P.pack_tensor(buf, qtype, (N, K))
    mine = P.dequantize_planes_numpy(qt)[:N]
    np.testing.assert_array_equal(mine, ref)


@pytest.mark.parametrize("qtype", [GGMLType.IQ4_NL, GGMLType.IQ4_XS,
                                   GGMLType.IQ3_XXS, GGMLType.IQ1_S,
                                   GGMLType.TQ2_0])
def test_qmatmul_conformance(qtype, rng):
    N, K, B = 256, 512, 4
    buf = random_wire(rng, qtype, N, K)
    # random wire has random f16 scales incl. inf/nan; rebuild finite scales
    # by decoding + filtering: instead use quantized real data where encoders
    # exist, else sanitize via re-pack of finite rows
    qt = P.pack_tensor(buf, qtype, (N, K))
    d = np.asarray(qt.d)
    d = np.nan_to_num(d, nan=0.01, posinf=0.01, neginf=-0.01)
    d = np.clip(d, -1.0, 1.0)
    qt = P.QTensor(qt.cfg, qt.n, qt.k, qt.q, d, qt.qh, qt.sc, qt.dmin, qt.m)
    wd = P.dequantize_planes_numpy(qt)[:N]
    x = rng.normal(size=(B, K)).astype(np.float32)
    y_ref = x @ wd.T
    y = np.asarray(qmatmul_xla(jnp.asarray(x), qt.astype_device()))
    nmse = np.mean((y - y_ref) ** 2) / (np.mean(y_ref**2) + 1e-12)
    assert nmse < 5e-4


def test_iq4_nl_roundtrip(rng):
    x = rng.normal(size=2048).astype(np.float32)
    buf = R.quantize(x, GGMLType.IQ4_NL)
    y = R.dequantize(buf, GGMLType.IQ4_NL, x.size)
    rel = np.sqrt(np.mean((x - y) ** 2)) / np.std(x)
    assert rel < 0.12


def test_tq2_0_roundtrip(rng):
    x = rng.normal(size=1024).astype(np.float32)
    y = R.dequantize(R.quantize(x, GGMLType.TQ2_0), GGMLType.TQ2_0, 1024)
    assert np.isfinite(y).all()
    # ternary: only 3 distinct scaled levels per block
    assert len(np.unique(np.round(y[:256], 6))) <= 3


CODEBOOK_TYPES = [
    GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
    GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S, GGMLType.IQ1_M,
]
# calibrated round-trip bounds on N(0,1) data (rmse/sigma, cosine) — the
# measured encoder quality with ~25% headroom; a regression in the search
# (bad snap, broken scale refit) blows straight through these
RT_BOUNDS = {
    GGMLType.IQ2_XXS: (0.46, 0.90), GGMLType.IQ2_XS: (0.40, 0.93),
    GGMLType.IQ2_S: (0.34, 0.95), GGMLType.IQ3_XXS: (0.27, 0.96),
    GGMLType.IQ3_S: (0.20, 0.98), GGMLType.IQ1_S: (0.62, 0.83),
    GGMLType.IQ1_M: (0.58, 0.85),
}


@pytest.mark.parametrize("qtype", CODEBOOK_TYPES)
def test_codebook_encoder_roundtrip(qtype, rng):
    n = 256 * 32
    x = rng.standard_normal(n).astype(np.float32)
    qw = np.abs(rng.standard_normal(n).astype(np.float32)) + 0.1
    buf = R.quantize(x, qtype, quant_weights=qw)
    assert buf.size == row_size(qtype, n)
    y = R.dequantize(buf, qtype, n)
    err = np.sqrt(np.mean((x - y) ** 2)) / np.sqrt(np.mean(x ** 2))
    cos = float(np.dot(x, y) / (np.linalg.norm(x) * np.linalg.norm(y)))
    bound_err, bound_cos = RT_BOUNDS[qtype]
    assert err < bound_err, f"{qtype.name}: rmse {err}"
    assert cos > bound_cos, f"{qtype.name}: cos {cos}"


@pytest.mark.parametrize("qtype", CODEBOOK_TYPES)
def test_codebook_encoder_wire_valid(reference_gguf_py, qtype, rng):
    """Our encoded bytes must decode IDENTICALLY under the reference's
    gguf-py decoder — proves the produced wire format is the reference's."""
    from gguf.quants import dequantize as g_deq
    from gguf.constants import GGMLQuantizationType as GT

    n = 256 * 8
    x = rng.standard_normal(n).astype(np.float32)
    buf = R.quantize(x, qtype)  # uniform-weight path
    mine = R.dequantize(buf, qtype, n)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        theirs = g_deq(buf.reshape(1, -1), GT[qtype.name]).reshape(-1)[:n]
    np.testing.assert_array_equal(mine, theirs)


@pytest.mark.parametrize("qtype", CODEBOOK_TYPES)
def test_codebook_imatrix_improves_weighted_error(qtype, rng):
    """imatrix weights steer precision toward important columns."""
    n = 256 * 16
    x = rng.standard_normal(n).astype(np.float32)
    qw = np.ones(n, np.float32)
    qw[: n // 4] = 100.0  # first quarter is important
    buf_u = R.quantize(x, qtype)
    buf_w = R.quantize(x, qtype, quant_weights=qw)
    yu = R.dequantize(buf_u, qtype, n)
    yw = R.dequantize(buf_w, qtype, n)
    werr_u = np.sum(qw * (x - yu) ** 2)
    werr_w = np.sum(qw * (x - yw) ** 2)
    assert werr_w <= werr_u * 1.001, f"{qtype.name}: {werr_w} vs {werr_u}"


def test_iq_quantized_model_decodes(tmp_path):
    """End-to-end: IQ2_XS-quantized model loads and decodes."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from ggml_hexagon_tpu.models.convert_hf import convert_hf_llama
    from ggml_hexagon_tpu.runtime import Engine, greedy_chain

    cfg = transformers.LlamaConfig(
        vocab_size=300, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(0)
    m = transformers.LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    path = str(tmp_path / "iq2.gguf")
    convert_hf_llama(sd, cfg, path, qtype=GGMLType.IQ2_XS)
    eng = Engine.from_gguf(path, max_seq=64)
    toks = list(eng.generate([1, 5, 9], n_predict=6, sampler=greedy_chain(),
                             stop_ids=set()))
    assert len(toks) == 6 and all(0 <= t < 300 for t in toks)
