"""Quantization round-trip contracts.

Thresholds and data generator mirror the reference test
(/root/reference/tests/test-quantize-fns.cpp:17-27,55-63): synthetic data
0.1 + 2*cos(i + offset); error metric sqrt(sum diff^2)/n.
"""
import numpy as np
import pytest

from ggml_hexagon_tpu.quant.formats import GGMLType, TYPE_TRAITS, row_size
from ggml_hexagon_tpu.quant import ref_numpy as R

TEST_SIZE = 32 * 128

# test-quantize-fns.cpp:17-22
MAX_TOTAL_ERROR = 0.002
MAX_TOTAL_ERROR_3BITS = 0.0040
MAX_TOTAL_ERROR_2BITS = 0.0075

ERROR_BOUND = {
    GGMLType.Q4_0: MAX_TOTAL_ERROR,
    GGMLType.Q4_1: MAX_TOTAL_ERROR,
    GGMLType.Q5_0: MAX_TOTAL_ERROR,
    GGMLType.Q5_1: MAX_TOTAL_ERROR,
    GGMLType.Q8_0: MAX_TOTAL_ERROR,
    GGMLType.Q8_1: MAX_TOTAL_ERROR,
    GGMLType.Q2_K: MAX_TOTAL_ERROR_2BITS,
    GGMLType.Q3_K: MAX_TOTAL_ERROR_3BITS,
    GGMLType.Q4_K: MAX_TOTAL_ERROR,
    GGMLType.Q5_K: MAX_TOTAL_ERROR,
    GGMLType.Q6_K: MAX_TOTAL_ERROR,
    GGMLType.Q8_K: MAX_TOTAL_ERROR,
}


def generate_data(offset: float, n: int) -> np.ndarray:
    return (0.1 + 2.0 * np.cos(np.arange(n, dtype=np.float32) + offset)).astype(np.float32)


def total_error(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.sqrt(np.sum((a.astype(np.float64) - b.astype(np.float64)) ** 2)) / a.size)


@pytest.mark.parametrize("qtype", sorted(ERROR_BOUND, key=lambda t: t.value))
def test_roundtrip_error(qtype):
    x = generate_data(0.0, TEST_SIZE)
    buf = R.quantize(x, qtype)
    assert buf.size == row_size(qtype, TEST_SIZE)
    y = R.dequantize(buf, qtype, TEST_SIZE)
    err = total_error(x, y)
    assert err <= ERROR_BOUND[qtype], f"{qtype.name}: {err} > {ERROR_BOUND[qtype]}"


@pytest.mark.parametrize("qtype", sorted(ERROR_BOUND, key=lambda t: t.value))
def test_roundtrip_gaussian(qtype, rng):
    """Round-trip on gaussian data (what real weights look like)."""
    x = rng.normal(size=TEST_SIZE).astype(np.float32)
    y = R.dequantize(R.quantize(x, qtype), qtype, TEST_SIZE)
    rel = np.sqrt(np.mean((x - y) ** 2)) / np.sqrt(np.mean(x * x))
    bits = {GGMLType.Q2_K: 0.40, GGMLType.Q3_K: 0.20}.get(qtype, 0.12)
    assert rel < bits, f"{qtype.name}: relative RMSE {rel}"


@pytest.mark.parametrize("qtype", sorted(ERROR_BOUND, key=lambda t: t.value))
def test_zeros_and_constants(qtype):
    """Degenerate blocks must not produce NaN/inf."""
    for v in (0.0, 1.0, -3.5):
        x = np.full(512, v, dtype=np.float32)
        y = R.dequantize(R.quantize(x, qtype), qtype, 512)
        assert np.all(np.isfinite(y)), f"{qtype.name} value {v}"
        if v == 0.0:
            np.testing.assert_allclose(y, 0.0)


def test_float_formats_exact():
    x = np.linspace(-4, 4, 1024, dtype=np.float32)
    np.testing.assert_array_equal(R.dequantize(R.quantize(x, GGMLType.F32), GGMLType.F32, x.size), x)
    np.testing.assert_array_equal(
        R.dequantize(R.quantize(x, GGMLType.F16), GGMLType.F16, x.size),
        x.astype(np.float16).astype(np.float32),
    )
    bf = R.dequantize(R.quantize(x, GGMLType.BF16), GGMLType.BF16, x.size)
    assert np.max(np.abs(bf - x)) < 0.02


def test_imatrix_weighted_improves_weighted_error(rng):
    """imatrix-aware encoders minimize *weighted* RMSE: heavily-weighted
    columns should come out more accurate than with uniform encoding."""
    x = rng.normal(size=1024).astype(np.float32)
    w = np.ones(1024, dtype=np.float32)
    hot = slice(0, 256)
    w[hot] = 100.0
    for qtype in (GGMLType.Q4_K, GGMLType.Q6_K, GGMLType.Q3_K):
        y_plain = R.dequantize(R.quantize(x, qtype), qtype, 1024)
        y_w = R.dequantize(R.quantize(x, qtype, quant_weights=w), qtype, 1024)
        err_plain = np.mean((x[hot] - y_plain[hot]) ** 2)
        err_w = np.mean((x[hot] - y_w[hot]) ** 2)
        assert err_w <= err_plain * 1.10, f"{qtype.name}: weighted {err_w} vs {err_plain}"


def test_type_traits_row_sizes():
    # spot-check the wire sizes against the GGUF spec values
    assert row_size(GGMLType.Q4_0, 32) == 18
    assert row_size(GGMLType.Q8_0, 32) == 34
    assert row_size(GGMLType.Q2_K, 256) == 84
    assert row_size(GGMLType.Q3_K, 256) == 110
    assert row_size(GGMLType.Q4_K, 256) == 144
    assert row_size(GGMLType.Q5_K, 256) == 176
    assert row_size(GGMLType.Q6_K, 256) == 210
    assert row_size(GGMLType.Q8_K, 256) == 292
