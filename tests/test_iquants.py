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
