"""Conformance tests for the fused dequant-matmul (our test-backend-ops).

Mirrors the reference strategy (/root/reference/tests/test-backend-ops.cpp):
every backend implementation is compared against the host-side oracle
(dequantize_planes_numpy + f32 matmul) with NMSE thresholds from the
reference (mul_mat class: 5e-4, test-backend-ops.cpp:1982).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ggml_hexagon_tpu.quant.formats import GGMLType
from ggml_hexagon_tpu.quant import pack as P
from ggml_hexagon_tpu.quant import ref_numpy as R
from ggml_hexagon_tpu.ops.qmatmul import (
    dequantize_jax,
    qmatmul,
    qmatmul_pallas,
    qmatmul_xla,
)

MUL_MAT_NMSE = 5e-4
# only types with host encoders (i-quants are covered by test_iquants.py)
ALL_QTYPES = sorted((t for t in P.QCONFIGS if t in R.QUANTIZE), key=lambda t: t.value)


def nmse(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.mean((a - b) ** 2) / np.mean(b * b))


@pytest.fixture(scope="module")
def fixtures(request):
    rng = np.random.default_rng(0)
    N, K = 256, 512
    w = rng.normal(size=(N, K)).astype(np.float32)
    x = rng.normal(size=(4, K)).astype(np.float32)
    return w, x


@pytest.mark.parametrize("qtype", ALL_QTYPES)
def test_planes_dequant_exact(qtype, fixtures):
    """Planar repack must dequantize bit-identically to the wire format."""
    w, _ = fixtures
    wire = R.quantize(w.reshape(-1), qtype)
    qt = P.pack_tensor(wire, qtype, w.shape)
    ref = R.dequantize(wire, qtype, w.size).reshape(w.shape)
    np.testing.assert_array_equal(P.dequantize_planes_numpy(qt)[: w.shape[0]], ref)


@pytest.mark.parametrize("qtype", ALL_QTYPES)
def test_dequantize_jax_exact(qtype, fixtures):
    """jnp dequant (f32) must equal the numpy plane dequant exactly."""
    w, _ = fixtures
    qt = P.quantize_tensor(w, qtype).astype_device()
    ours = np.asarray(dequantize_jax(qt, jnp.float32))
    np.testing.assert_array_equal(ours, P.dequantize_planes_numpy(qt))


@pytest.mark.parametrize("qtype", ALL_QTYPES)
def test_qmatmul_xla_conformance(qtype, fixtures):
    w, x = fixtures
    qt = P.quantize_tensor(w, qtype).astype_device()
    wd = P.dequantize_planes_numpy(qt)[: w.shape[0]]
    y_ref = x @ wd.T
    y = np.asarray(qmatmul_xla(jnp.asarray(x), qt))
    assert nmse(y, y_ref) < MUL_MAT_NMSE


@pytest.mark.parametrize("qtype", [GGMLType.Q4_0, GGMLType.Q4_K, GGMLType.Q6_K, GGMLType.Q8_0])
def test_qmatmul_pallas_interpret_conformance(qtype):
    """Mosaic kernel vs oracle, interpreter mode (small shapes; real-chip
    conformance is exercised by tools/kernel_lab.py on TPU)."""
    rng = np.random.default_rng(1)
    N, K, B = 128, 256, 4
    w = rng.normal(size=(N, K)).astype(np.float32)
    x = rng.normal(size=(B, K)).astype(np.float32)
    qt = P.quantize_tensor(w, qtype).astype_device()
    wd = P.dequantize_planes_numpy(qt)[:N]
    y_ref = x @ wd.T
    y = np.asarray(qmatmul_pallas(jnp.asarray(x), qt, interpret=True))
    assert nmse(y, y_ref) < MUL_MAT_NMSE


def test_padded_n(fixtures):
    """True n not a multiple of 128: outputs must slice back exactly."""
    rng = np.random.default_rng(2)
    N, K = 200, 512
    w = rng.normal(size=(N, K)).astype(np.float32)
    x = rng.normal(size=(3, K)).astype(np.float32)
    qt = P.quantize_tensor(w, GGMLType.Q4_K).astype_device()
    assert qt.n == 200 and qt.n_pad == 256
    y = np.asarray(qmatmul(jnp.asarray(x), qt))
    assert y.shape == (3, 200)
    wd = P.dequantize_planes_numpy(qt)[:N]
    assert nmse(y, x @ wd.T) < MUL_MAT_NMSE


def test_batch_shapes(fixtures):
    """Leading dims flatten/restore; B=1 decode shape works."""
    w, _ = fixtures
    qt = P.quantize_tensor(w, GGMLType.Q8_0).astype_device()
    rng = np.random.default_rng(3)
    for shape in [(1, 512), (2, 3, 512), (512,)]:
        x = rng.normal(size=shape).astype(np.float32)
        y = np.asarray(qmatmul(jnp.asarray(x), qt))
        assert y.shape == shape[:-1] + (256,)
