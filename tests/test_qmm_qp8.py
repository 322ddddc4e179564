"""Transposed-plane (qp8/v13) kernel family: build, dequant, decode
contract, prefill exactness, fused epilogues, dispatch, gradients.

Decode numerics contract: per-256-segment int8 activations + integer
group dots + scales on partials — the reference's own q8_K contraction
(ggml-cpu/ggml-cpu-quants.c vec_dot_q4_K_q8_K).  The kernel is compared
EXACTLY against qp8_ref (which emulates that contract in f32) and
LOOSELY against the exact-f32 oracle (the q8 activation rounding is the
only difference)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ggml_hexagon_tpu.ops.qmatmul import dequantize_jax, qmatmul_xla
from ggml_hexagon_tpu.ops.qmm_qp8 import (
    QP8_MAX_DECODE, build_t_planes, dequantize_qp8, pick_depth, qp8_matmul,
    qp8_matmul_act, qp8_matmul_normed, qp8_matmul_res, qp8_ref,
    supports_qp8)
from ggml_hexagon_tpu.quant.formats import GGMLType
from ggml_hexagon_tpu.quant.pack import QCONFIGS, quantize_tensor

T_TYPES = [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q4_K, GGMLType.Q5_0,
           GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q2_K, GGMLType.Q3_K]


def make_qt(qtype, n=512, k=512, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(n, k)).astype(np.float32)
    qt = quantize_tensor(w, qtype)
    fq, fs, fb = build_t_planes(qt)
    assert fq is not None
    from ggml_hexagon_tpu.quant.pack import QTensor

    return QTensor(qt.cfg, qt.n, qt.k, qt.q, qt.d, qt.qh, qt.sc, qt.dmin,
                   qt.m, jnp.asarray(fq), jnp.asarray(fs),
                   None if fb is None else jnp.asarray(fb), fl="t")


@pytest.mark.parametrize("qtype", T_TYPES)
def test_dequant_t_matches_wire(qtype):
    qt = make_qt(qtype)
    # vs the interleaved-layout reconstruction: both layouts store bf16
    # group planes, so they must agree bit-for-bit
    from ggml_hexagon_tpu.ops.qmm_fast import dequantize_fast

    rng = np.random.default_rng(0)
    w = rng.normal(size=(qt.n, qt.k)).astype(np.float32)
    il = quantize_tensor(w, qtype).with_fast_planes(layout="il")
    got = np.asarray(dequantize_qp8(qt))[: qt.n]
    want = np.asarray(dequantize_fast(il))[: qt.n]
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
    # and vs the exact wire dequant within the bf16 plane budget
    exact = np.asarray(dequantize_jax(il))[: qt.n]
    nmse = float(np.mean((got - exact) ** 2) / (np.mean(exact**2) + 1e-12))
    assert nmse < 5e-5, nmse


@pytest.mark.parametrize("qtype", T_TYPES)
@pytest.mark.parametrize("B", [1, 4])
def test_decode_kernel_matches_ref(qtype, B):
    qt = make_qt(qtype)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, qt.k)), jnp.float32)
    y = qp8_matmul(x, qt, interpret=True)
    want = qp8_ref(x, qt)[:, : qt.n]
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("qtype", T_TYPES)
def test_decode_close_to_exact_oracle(qtype):
    # q8 activation rounding only: ~1% relative — the reference's own
    # activation-quant error class
    qt = make_qt(qtype)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, qt.k)), jnp.float32)
    y = np.asarray(qp8_matmul(x, qt, interpret=True))
    want = np.asarray(qmatmul_xla(x, qt, compute_dtype=jnp.float32))
    nmse = float(np.mean((y - want) ** 2) / (np.mean(want**2) + 1e-12))
    assert nmse < 5e-4, nmse


def test_prefill_kernel_exact_bf16():
    qt = make_qt(GGMLType.Q4_K)
    rng = np.random.default_rng(3)
    B = QP8_MAX_DECODE + 8  # routes through the tpf prefill kernel
    x = jnp.asarray(rng.normal(size=(B, qt.k)), jnp.bfloat16)
    y = np.asarray(qp8_matmul(x, qt, interpret=True))
    w = np.asarray(dequantize_jax(qt))[: qt.n]
    want = np.asarray(x, np.float32) @ w.T
    # bf16 operand rounding only
    err = np.abs(y - want).max() / (np.abs(want).max() + 1e-9)
    assert err < 3e-2, err


def test_normed_variant():
    qt = make_qt(GGMLType.Q4_K)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, qt.k)), jnp.float32)
    wn = jnp.asarray(rng.normal(size=(qt.k,)), jnp.float32)
    eps = 1e-5
    y = np.asarray(qp8_matmul_normed(x, qt, wn, eps, interpret=True))
    xf = np.asarray(x, np.float32)
    inv = 1.0 / np.sqrt((xf * xf).mean(axis=1, keepdims=True) + eps)
    xn = jnp.asarray(xf * inv * np.asarray(wn))
    want = np.asarray(qp8_ref(xn, qt))[:, : qt.n]
    np.testing.assert_allclose(y, want, rtol=5e-4, atol=5e-4)


def test_res_variant():
    qt = make_qt(GGMLType.Q4_0)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, qt.k)), jnp.float32)
    res = jnp.asarray(rng.normal(size=(1, qt.n)), jnp.float32)
    y = np.asarray(qp8_matmul_res(x, qt, res, interpret=True))
    want = np.asarray(qp8_ref(x, qt))[:, : qt.n] + np.asarray(res)
    np.testing.assert_allclose(y, want, rtol=5e-4, atol=5e-4)


def test_act_variant():
    qt = make_qt(GGMLType.Q4_K)
    rng = np.random.default_rng(6)
    x2 = jnp.asarray(rng.normal(size=(1, 2 * qt.k)), jnp.float32)
    y = np.asarray(qp8_matmul_act(x2, qt, "silu", interpret=True))
    xf = np.asarray(x2, np.float32)
    g, u = xf[:, : qt.k], xf[:, qt.k:]
    xe = (g / (1 + np.exp(-g))) * u
    want = np.asarray(qp8_ref(jnp.asarray(xe), qt))[:, : qt.n]
    np.testing.assert_allclose(y, want, rtol=5e-4, atol=5e-4)


def test_supports_and_depth():
    assert supports_qp8(QCONFIGS[GGMLType.Q4_K], 4096)
    assert pick_depth(QCONFIGS[GGMLType.Q4_K], 4096) == 512
    assert pick_depth(QCONFIGS[GGMLType.Q4_K], 11008) == 128
    # coded i-quants ride 2+1-bit code planes since round 4
    assert supports_qp8(QCONFIGS[GGMLType.IQ2_XXS], 4096)
    assert not supports_qp8(QCONFIGS[GGMLType.Q8_0], 4096)  # signed int8
    assert not supports_qp8(QCONFIGS[GGMLType.IQ4_NL], 4096)  # LUT


def test_dispatch_through_qmatmul_fast():
    from ggml_hexagon_tpu.ops.qmm_fast import qmatmul_fast

    qt = make_qt(GGMLType.Q4_K)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, qt.k)), jnp.float32)
    y = np.asarray(qmatmul_fast(x, qt, interpret=True))
    want = np.asarray(qp8_ref(x, qt))[:, : qt.n]
    np.testing.assert_allclose(y, want, rtol=5e-4, atol=5e-4)


def test_gradient_straight_through():
    qt = make_qt(GGMLType.Q4_K, n=256, k=512)

    def loss(x):
        return jnp.sum(qp8_matmul(x, qt, interpret=True) ** 2)

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(1, qt.k)), jnp.float32)
    g = jax.grad(loss)(x)
    # straight-through: dL/dx = 2 y @ W with W the dequantized matrix
    y = np.asarray(qp8_matmul(x, qt, interpret=True))
    w = np.asarray(dequantize_qp8(qt))[: qt.n]
    want = 2.0 * y @ w
    np.testing.assert_allclose(np.asarray(g), want, rtol=5e-2, atol=5e-2)


def test_take_rows_and_concat_t_layout():
    from ggml_hexagon_tpu.models.fuse import _concat_qtensors

    qt = make_qt(GGMLType.Q4_K, n=256, k=512)
    perm = np.random.default_rng(9).permutation(qt.n)
    qp = qt.take_rows(perm)
    w0 = np.asarray(dequantize_qp8(qt))[: qt.n]
    wp = np.asarray(dequantize_qp8(qp))[: qt.n]
    np.testing.assert_allclose(wp, w0[perm], atol=1e-6)

    # concat: parts must be plane-unpadded (n == n2, the _BN quantum) to
    # stack on the lane axis; padded parts rebuild instead
    qb = make_qt(GGMLType.Q4_K, n=512, k=512, seed=11)
    qc = make_qt(GGMLType.Q4_K, n=512, k=512, seed=12)
    fused = _concat_qtensors([qb, qc])
    assert fused is not None and fused.fl == "t" and fused.n == 1024
    wf = np.asarray(dequantize_qp8(fused))[: fused.n]
    wb = np.asarray(dequantize_qp8(qb))[: qb.n]
    wc = np.asarray(dequantize_qp8(qc))[: qc.n]
    np.testing.assert_allclose(wf, np.concatenate([wb, wc]), atol=1e-6)


def test_dual_matches_separate():
    from ggml_hexagon_tpu.ops.qmm_qp8 import (qp8_matmul_dual,
                                              supports_qp8_dual)

    qa = make_qt(GGMLType.Q4_K, n=512, k=512, seed=20)
    qb = make_qt(GGMLType.Q6_K, n=512, k=512, seed=21)
    assert supports_qp8_dual(qa, qb)
    rng = np.random.default_rng(22)
    x = jnp.asarray(rng.normal(size=(1, 512)), jnp.float32)
    wn = jnp.asarray(rng.normal(size=(512,)) * 0.1 + 1.0, jnp.float32)
    eps = 1e-5
    got = np.asarray(qp8_matmul_dual(x, qa, qb, wn=wn, eps=eps,
                                     interpret=True))
    ya = np.asarray(qp8_matmul_normed(x, qa, wn, eps, interpret=True))
    yb = np.asarray(qp8_matmul_normed(x, qb, wn, eps, interpret=True))
    want = np.concatenate([ya, yb], axis=1)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_dual_no_norm_b4():
    from ggml_hexagon_tpu.ops.qmm_qp8 import qp8_matmul_dual

    qa = make_qt(GGMLType.Q4_0, n=512, k=512, seed=23)
    qb = make_qt(GGMLType.Q5_K, n=512, k=512, seed=24)
    rng = np.random.default_rng(25)
    x = jnp.asarray(rng.normal(size=(4, 512)), jnp.float32)
    got = np.asarray(qp8_matmul_dual(x, qa, qb, interpret=True))
    ya = np.asarray(qp8_matmul(x, qa, interpret=True))
    yb = np.asarray(qp8_matmul(x, qb, interpret=True))
    np.testing.assert_allclose(got, np.concatenate([ya, yb], axis=1),
                               rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("qtype,k,bpw", [
    (GGMLType.IQ2_XXS, 512, 3.0), (GGMLType.IQ3_XXS, 512, 4.0),
    (GGMLType.IQ1_S, 512, 3.0), (GGMLType.IQ2_XS, 512, 3.0),
    (GGMLType.TQ2_0, 2048, 2.0)])
def test_coded_qp8_planes(qtype, k, bpw):
    """i-quant / ternary qp8 planes: arithmetic sign+magnitude codes at
    2-4 bpw (vs 4.5 on the interleaved coded nibbles; the remaining gap
    to wire is the reference's 256-entry grid codebooks, which need a
    gather unit the TPU lacks — docs/performance.md)."""
    qt = make_qt(qtype, n=512, k=k)
    assert qt.fq.shape[0] * 8 / qt.k == bpw
    w_wire = np.asarray(dequantize_jax(qt))[: qt.n]
    w_t = np.asarray(dequantize_qp8(qt))[: qt.n]
    nm = float(np.mean((w_t - w_wire) ** 2)
               / (np.mean(w_wire**2) + 1e-12))
    assert nm < 5e-5, nm  # bf16 scale-plane rounding only
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, qt.k)), jnp.float32)
    y = np.asarray(qp8_matmul(x, qt, interpret=True))
    want = np.asarray(qp8_ref(x, qt))[:, : qt.n]
    np.testing.assert_allclose(y, want, rtol=5e-4, atol=5e-4)
    # prefill route too
    xp = jnp.asarray(rng.normal(size=(12, qt.k)), jnp.bfloat16)
    yp = np.asarray(qp8_matmul(xp, qt, interpret=True))
    wantp = np.asarray(xp, np.float32) @ w_t.T
    err = np.abs(yp - wantp).max() / (np.abs(wantp).max() + 1e-9)
    assert err < 3e-2, err


@pytest.mark.parametrize("qtype", [GGMLType.Q4_K, GGMLType.Q4_0])
def test_indirect_qp8_matches_oracle(qtype):
    """Gathered-expert (MUL_MAT_ID) on qp8 planes: only the selected
    experts' lanes stream; numerics follow the qp8 decode contract."""
    from ggml_hexagon_tpu.ops.qmm_fast import (qmatmul_fast_indirect,
                                               supports_indirect)
    from ggml_hexagon_tpu.quant.pack import QTensor

    rng = np.random.default_rng(31)
    E, npe, K = 4, 256, 512
    w = rng.normal(size=(E * npe, K)).astype(np.float32)
    qt = quantize_tensor(w, qtype)
    fq, fs, fb = build_t_planes(qt)
    qt = QTensor(qt.cfg, qt.n, qt.k, None, None, None, None, None, None,
                 jnp.asarray(fq), jnp.asarray(fs),
                 None if fb is None else jnp.asarray(fb), fl="t")
    assert supports_indirect(qt, npe)
    x = jnp.asarray(rng.normal(size=(5, K)), jnp.float32)
    ids = np.array([2, 0, 3, 2, 1], np.int32)
    got = np.asarray(qmatmul_fast_indirect(x, qt, jnp.asarray(ids), npe,
                                           interpret=True))
    full = np.asarray(qp8_ref(x, qt))       # [5, E*npe] vs every expert
    want = np.stack([full[p, ids[p] * npe:(ids[p] + 1) * npe]
                     for p in range(5)])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
