"""Conformance for the qmm_fast Pallas kernels (interleaved fast planes)
against the proven XLA-fusion oracle — same strategy/thresholds as
test_qmatmul.py (reference test-backend-ops.cpp mul_mat NMSE 5e-4)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ggml_hexagon_tpu.ops.qmatmul import qmatmul, qmatmul_xla
from ggml_hexagon_tpu.ops.qmm_fast import (MAX_FAST_BATCH, qmatmul_fast,
                                           supports_fast)
from ggml_hexagon_tpu.quant import pack as P
from ggml_hexagon_tpu.quant import ref_numpy as R
from ggml_hexagon_tpu.quant.formats import GGMLType

MUL_MAT_NMSE = 5e-4
FAST_QTYPES = [t for t in sorted(P.QCONFIGS, key=lambda t: t.value)
               if t in R.QUANTIZE and supports_fast(P.QCONFIGS[t], 512)]


def nmse(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.mean((a - b) ** 2) / np.mean(b * b))


@pytest.fixture(scope="module")
def fixtures():
    rng = np.random.default_rng(1)
    N, K = 320, 512  # N deliberately not a multiple of the kernel block
    w = rng.normal(size=(N, K)).astype(np.float32)
    x = rng.normal(size=(4, K)).astype(np.float32)
    return w, x


def test_fast_types_cover_the_majors():
    names = {t.name for t in FAST_QTYPES}
    assert {"Q4_0", "Q4_1", "Q4_K", "Q5_0", "Q5_1", "Q5_K", "Q8_0",
            "Q6_K", "Q2_K", "Q3_K", "IQ4_NL"} <= names
    # IQ4_XS lives in quant/iquants (separate encoder) but the kernel
    # supports it too
    from ggml_hexagon_tpu.quant.formats import GGMLType as T
    assert supports_fast(P.QCONFIGS[T.IQ4_XS], 512)


@pytest.mark.parametrize("qtype", FAST_QTYPES)
def test_fast_planes_reconstruct_exact(qtype, fixtures):
    """The (values, group scale, group bias) decomposition must reproduce
    the oracle dequantization exactly up to the affine re-association."""
    from ggml_hexagon_tpu.ops.qmm_fast import (_group_scale_bias,
                                               _int_values,
                                               _interleave_perm, _is_nibble)

    w, _ = fixtures
    qt = P.quantize_tensor(w, qtype).astype_device(fast=False)
    v = np.asarray(_int_values(qt))
    s, b = _group_scale_bias(qt)
    gs = qt.cfg.gs
    rec = v * np.repeat(np.asarray(s), gs, axis=1)
    if b is not None:
        rec = rec + np.repeat(np.asarray(b), gs, axis=1)
    ref = P.dequantize_planes_numpy(qt)
    # re-association of (q+off)*s as q*s + off*s costs at most 1 ulp-ish
    assert nmse(rec, ref) < 1e-12
    # and the interleave permutation is a bijection
    perm = _interleave_perm(qt.k, gs)
    assert sorted(perm.tolist()) == list(range(qt.k))


@pytest.mark.parametrize("qtype", FAST_QTYPES)
def test_qmatmul_fast_matches_oracle(qtype, fixtures):
    w, x = fixtures
    qt = P.quantize_tensor(w, qtype).astype_device(fast=True)
    assert qt.fq is not None
    ref = np.asarray(qmatmul_xla(jnp.asarray(x), qt))
    out = np.asarray(qmatmul_fast(jnp.asarray(x), qt, interpret=True))
    assert out.shape == ref.shape
    assert nmse(out, ref) < MUL_MAT_NMSE, (qtype.name, nmse(out, ref))


def test_qmatmul_fast_batch1_and_3d(fixtures):
    w, x = fixtures
    qt = P.quantize_tensor(w, GGMLType.Q4_K).astype_device(fast=True)
    ref = np.asarray(qmatmul_xla(jnp.asarray(x[:1]), qt))
    out = np.asarray(qmatmul_fast(jnp.asarray(x[:1]), qt, interpret=True))
    assert nmse(out, ref) < MUL_MAT_NMSE
    x3 = jnp.asarray(x.reshape(2, 2, -1))
    out3 = np.asarray(qmatmul_fast(x3, qt, interpret=True))
    assert out3.shape == (2, 2, qt.n)
    assert nmse(out3.reshape(4, -1), np.asarray(qmatmul_xla(jnp.asarray(x), qt))) < MUL_MAT_NMSE


def test_qmatmul_fast_kblocked_prefill(monkeypatch):
    """K-blocked accumulation with the nibble re-pairing (nkj > 1) — the
    fallback for shapes whose full-K blocks exceed VMEM even sliced
    (forced here via env; round 3's sliced full-K pass covers the common
    prefill shapes)."""
    from ggml_hexagon_tpu.ops.qmm_fast import _pick_blocks

    monkeypatch.setenv("GHT_QMM_NO_PREFILL_FULLK", "1")
    rng = np.random.default_rng(3)
    N, K, B = 256, 8192, 512
    assert _pick_blocks(B, K, True, 32)[1] > 1  # the split engages
    w = rng.normal(size=(N, K)).astype(np.float32)
    x = rng.normal(size=(B, K)).astype(np.float32)
    for qtype in (GGMLType.Q4_K, GGMLType.Q6_K):
        qt = P.quantize_tensor(w, qtype).astype_device(fast=True)
        ref = np.asarray(qmatmul_xla(jnp.asarray(x), qt))
        out = np.asarray(qmatmul_fast(jnp.asarray(x), qt, interpret=True))
        assert nmse(out, ref) < MUL_MAT_NMSE, (qtype.name, nmse(out, ref))


def test_fast_grad_matches_oracle(fixtures):
    """custom_vjp: dx through the fast path == dx through the XLA path."""
    w, x = fixtures
    qt = P.quantize_tensor(w, GGMLType.Q4_K).astype_device(fast=True)
    xj = jnp.asarray(x)

    g_fast = jax.grad(lambda a: jnp.sum(
        qmatmul_fast(a, qt, interpret=True) ** 2))(xj)
    g_ref = jax.grad(lambda a: jnp.sum(
        qmatmul_xla(a, qt, compute_dtype=jnp.float32) ** 2))(xj)
    assert nmse(np.asarray(g_fast), np.asarray(g_ref)) < 1e-3


def test_without_wire_roundtrip(fixtures):
    """Dropping wire planes keeps matmul + dequantize working (fast-plane
    reconstruction), and dequantize_fast matches the oracle."""
    from ggml_hexagon_tpu.ops.qmatmul import dequantize_jax

    w, x = fixtures
    for qtype in (GGMLType.Q4_K, GGMLType.Q8_0, GGMLType.Q6_K):
        qt = P.quantize_tensor(w, qtype).astype_device(fast=True)
        ref_w = np.asarray(dequantize_jax(qt))
        ref_y = np.asarray(qmatmul_xla(jnp.asarray(x), qt))
        bare = qt.without_wire()
        assert bare.q is None and bare.fq is not None
        rec = np.asarray(dequantize_jax(bare))[: ref_w.shape[0]]
        # group planes are stored bf16 (~0.4% rel), far below quant error
        assert nmse(rec, ref_w) < 1e-4, qtype.name
        y = np.asarray(qmatmul(jnp.asarray(x), bare, backend="auto"))
        assert nmse(y, ref_y) < MUL_MAT_NMSE
        y2 = np.asarray(qmatmul_fast(jnp.asarray(x), bare, interpret=True))
        assert nmse(y2, ref_y) < MUL_MAT_NMSE


def test_drop_wire_planes_tree(fixtures):
    w, _ = fixtures
    qt = P.quantize_tensor(w, GGMLType.Q4_K).astype_device(fast=True)
    weights = {"output": qt, "tok_embd": qt,
               "layers": [{"wq": qt, "ffn_gate_exps": qt, "attn_norm": 1.0}]}
    out = P.drop_wire_planes(weights)
    assert out["output"].q is None
    assert out["tok_embd"].q is not None          # embeddings keep wire
    assert out["layers"][0]["wq"].q is None
    assert out["layers"][0]["ffn_gate_exps"].q is not None  # MoE slices wire


def test_auto_dispatch_safe_on_cpu(fixtures):
    """backend='auto' on a non-TPU backend must silently use XLA even when
    fast planes exist (Mosaic kernels only compile for TPU)."""
    w, x = fixtures
    qt = P.quantize_tensor(w, GGMLType.Q4_K).astype_device(fast=True)
    out = np.asarray(qmatmul(jnp.asarray(x), qt, backend="auto"))
    ref = np.asarray(qmatmul_xla(jnp.asarray(x), qt))
    assert np.allclose(out, ref)


def test_fast_planes_survive_fusion(fixtures):
    """fuse_weights row-concat keeps fast planes when both parts carry them."""
    from ggml_hexagon_tpu.models.fuse import _concat_qtensors

    w, x = fixtures
    a = P.quantize_tensor(w, GGMLType.Q4_K).astype_device(fast=True)
    b = P.quantize_tensor(w * 0.5, GGMLType.Q4_K).astype_device(fast=True)
    fused = _concat_qtensors([a, b])
    if fused is None:
        pytest.skip("fusion rejected the pair")
    if fused.fq is not None:
        out = np.asarray(qmatmul_fast(jnp.asarray(x), fused, interpret=True))
        ra = np.asarray(qmatmul_xla(jnp.asarray(x), a))
        rb = np.asarray(qmatmul_xla(jnp.asarray(x), b))
        assert nmse(out, np.concatenate([ra, rb], axis=1)) < MUL_MAT_NMSE


def test_qmatmul_fast_normed_matches_unfused(fixtures):
    """In-kernel RMSNorm fusion == rms_norm + qmatmul_fast, for a biased
    (Q4_K) and a symmetric byte (Q6_K) format, decode and 3-D shapes."""
    from ggml_hexagon_tpu.models.fuse import _norm_il
    from ggml_hexagon_tpu.ops.basic import rms_norm
    from ggml_hexagon_tpu.ops.qmm_fast import (qmatmul_fast_normed,
                                               uninterleave_norm)

    w, x = fixtures
    rng = np.random.default_rng(7)
    wn = (rng.normal(size=x.shape[-1]).astype(np.float32) * 0.1 + 1.0)
    eps = 1e-5
    for qtype in (GGMLType.Q4_K, GGMLType.Q6_K, GGMLType.Q4_0):
        qt = P.quantize_tensor(w, qtype).astype_device(fast=True)
        wn_il = _norm_il(wn, qt, plus_one=False)
        if qt.fl == "il":
            assert np.allclose(
                np.asarray(uninterleave_norm(wn_il, qt.cfg.gs)), wn)
        else:  # transposed qp8 layout: the norm weight passes through raw
            assert np.allclose(np.asarray(wn_il), wn)
        ref = np.asarray(qmatmul_fast(
            rms_norm(jnp.asarray(x), jnp.asarray(wn), eps), qt,
            interpret=True))
        out = np.asarray(qmatmul_fast_normed(
            jnp.asarray(x), qt, wn_il, eps, interpret=True))
        assert nmse(out, ref) < MUL_MAT_NMSE, (qtype.name, nmse(out, ref))
    # 3-D lead shape
    qt = P.quantize_tensor(w, GGMLType.Q4_K).astype_device(fast=True)
    wn_il = _norm_il(wn, qt, plus_one=False)
    out3 = np.asarray(qmatmul_fast_normed(
        jnp.asarray(x.reshape(2, 2, -1)), qt, wn_il, eps, interpret=True))
    assert out3.shape == (2, 2, qt.n)


def test_qmatmul_fast_normed_kblocked_fallback(monkeypatch):
    """When the shape needs a K-split (nkj>1) the fused entry must fall
    back to the separate-norm path and stay correct."""
    from ggml_hexagon_tpu.models.fuse import _norm_il
    from ggml_hexagon_tpu.ops.basic import rms_norm
    from ggml_hexagon_tpu.ops.qmm_fast import (_pick_blocks,
                                               qmatmul_fast_normed)

    monkeypatch.setenv("GHT_QMM_NO_PREFILL_FULLK", "1")
    rng = np.random.default_rng(11)
    N, K, B = 256, 8192, 512
    assert _pick_blocks(B, K, True, 32)[1] > 1
    w = rng.normal(size=(N, K)).astype(np.float32)
    x = rng.normal(size=(B, K)).astype(np.float32)
    wn = (rng.normal(size=K).astype(np.float32) * 0.1 + 1.0)
    qt = P.quantize_tensor(w, GGMLType.Q4_K).astype_device(fast=True)
    wn_il = _norm_il(wn, qt, plus_one=False)
    ref = np.asarray(qmatmul_fast(
        rms_norm(jnp.asarray(x), jnp.asarray(wn), 1e-5), qt, interpret=True))
    out = np.asarray(qmatmul_fast_normed(
        jnp.asarray(x), qt, wn_il, 1e-5, interpret=True))
    assert nmse(out, ref) < MUL_MAT_NMSE


def test_attach_norm_planes_and_forward_equivalence():
    """attach_norm_planes + forward == unfused forward (CPU fallback path
    exercises qmatmul_normed's dispatch; logits must agree)."""
    from ggml_hexagon_tpu.models.fuse import attach_norm_planes, fuse_weights
    from ggml_hexagon_tpu.models.llama import (LlamaConfig, forward,
                                               init_kv_cache)

    rng = np.random.default_rng(5)
    cfg = LlamaConfig(n_vocab=256, n_embd=256, n_layer=2, n_head=4,
                      n_head_kv=2, n_ff=512)
    d = cfg.n_embd

    def qten(n, k):
        return P.quantize_tensor(
            rng.normal(size=(n, k)).astype(np.float32),
            GGMLType.Q4_K).astype_device(fast=True)

    layers = []
    for _ in range(cfg.n_layer):
        layers.append({
            "attn_norm": jnp.asarray(rng.normal(size=d).astype(np.float32) * 0.1 + 1),
            "ffn_norm": jnp.asarray(rng.normal(size=d).astype(np.float32) * 0.1 + 1),
            "wq": qten(d, d), "wk": qten(d // 2, d), "wv": qten(d // 2, d),
            "wo": qten(d, d),
            "ffn_gate": qten(cfg.n_ff, d), "ffn_up": qten(cfg.n_ff, d),
            "ffn_down": qten(d, cfg.n_ff),
        })
    weights = {
        "tok_embd": jnp.asarray(rng.normal(size=(cfg.n_vocab, d)).astype(np.float32)),
        "output_norm": jnp.ones(d, jnp.float32),
        "output": qten(cfg.n_vocab, d),
        "layers": layers,
    }
    fused = fuse_weights(weights, cfg)
    assert "attn_norm_il" in fused["layers"][0]
    assert "ffn_norm_il" in fused["layers"][0]
    toks = jnp.asarray(rng.integers(0, cfg.n_vocab, (1, 5)).astype(np.int32))
    kv0 = init_kv_cache(cfg, 1, 16)
    ref, _ = forward(cfg, weights, toks, kv0, jnp.int32(0))
    kv1 = init_kv_cache(cfg, 1, 16)
    out, _ = forward(cfg, fused, toks, kv1, jnp.int32(0))
    assert nmse(np.asarray(out), np.asarray(ref)) < MUL_MAT_NMSE


@pytest.mark.parametrize("tname", ["IQ2_XXS", "IQ2_XS", "IQ2_S", "IQ3_XXS",
                                   "IQ3_S", "IQ1_S", "IQ1_M", "TQ1_0",
                                   "TQ2_0"])
def test_coded_iquant_fast_planes(tname):
    """Coded-nibble i-quant fast planes (QConfig.code_map): HBM at 4 bits
    +scales instead of the 8-bit expansion, decoded arithmetically
    in-kernel; must reproduce the int8-expansion oracle exactly (the
    alphabets are closed under the code maps)."""
    import numpy as np
    import jax.numpy as jnp

    from ggml_hexagon_tpu.ops.qmatmul import dequantize_jax, qmatmul
    from ggml_hexagon_tpu.ops.qmm_fast import qmatmul_fast
    from ggml_hexagon_tpu.quant.formats import GGMLType, row_size
    from ggml_hexagon_tpu.quant.pack import pack_tensor

    gt = getattr(GGMLType, tname)
    # NOTE: str hash is process-salted (PYTHONHASHSEED) — it made this a
    # different fuzz every run; crc32 keeps per-type variety but is stable
    import zlib

    rng = np.random.default_rng(zlib.crc32(tname.encode()) % 2**31)
    n, k = 16, 512
    raw = rng.integers(0, 256, size=(row_size(gt, k) * n,), dtype=np.uint8)
    qt = pack_tensor(raw, gt, (n, k))
    oracle = np.asarray(dequantize_jax(qt, jnp.float32))[:n]
    qtf = qt.with_fast_planes()
    assert qtf.fq is not None, "coded fast planes must build"
    assert qtf.fq.dtype == np.uint8
    if qtf.fl == "t":   # qp8 coded planes: [k*(bits)/8, n2] at 2-4 bpw
        assert qtf.fq.shape[0] * 8 // k in (2, 3, 4)
    else:
        assert qtf.fq.shape[1] == k // 2
    # wire-less dequant reconstructs the oracle up to the bf16 rounding
    # of the group-scale planes (~2^-8 relative; the integer codes are
    # exact — qmm_fast module docstring)
    from ggml_hexagon_tpu.ops.qmm_fast import dequantize_fast

    qtd = qtf.astype_device()
    back = np.asarray(dequantize_fast(qtd, jnp.float32))[:n]
    # random wire bytes can decode to inf/nan f16 scales — garbage
    # propagates identically to the C reference (verify-skill note);
    # compare where finite
    fin = np.isfinite(oracle)
    np.testing.assert_allclose(back[fin], oracle[fin], rtol=5e-3, atol=1e-6)
    # matmul conformance (interpret-mode kernel vs f32 oracle @ bf16
    # budget); output columns touched by non-finite scales are excluded
    x = rng.normal(size=(4, k)).astype(np.float32)
    # the oracle weight for the MATMUL check is the bf16-plane dequant
    # (`back`): fuzzed wire bytes can hold near-f16-max scales where the
    # planes' deliberate bf16 rounding (0.4% rel) times a huge |w| row
    # dwarfs the kernel-arithmetic budget this assert is about
    xbf = np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
    if qtf.fl == "t":
        # qp8 decode contract: per-SEG int8 activation quantization —
        # with fuzzed near-f16-max weight scales the dense oracle can't
        # bound it; qp8_ref models the exact contract
        from ggml_hexagon_tpu.ops.qmm_qp8 import qp8_ref

        want = np.asarray(qp8_ref(jnp.asarray(xbf), qtd))[:, :n]
    else:
        # the kernel's value*scale product is a bf16 MXU operand — round
        # the oracle weight the same way
        wbf = np.asarray(jnp.asarray(np.where(fin, back, 0.0),
                                     jnp.bfloat16), np.float32)
        want = xbf @ wbf.T
    got = np.asarray(qmatmul_fast(jnp.asarray(x, jnp.bfloat16), qtd,
                                  interpret=True))
    err = np.abs(got - want)
    err[:, ~fin.all(axis=1)] = 0.0
    scale = np.abs(np.where(np.isfinite(want), want, 0)).max() + 1e-6
    assert err[np.isfinite(err)].max() / scale < 2e-2


# ---------------------------------------------------------------------------
# fused epilogues (in-kernel act-mul / residual add, decode hot path)
# ---------------------------------------------------------------------------

def _interleave_half(x, gs):
    B, K = x.shape
    G = K // gs
    return x.reshape(B, G, gs).swapaxes(1, 2).reshape(B, K)


@pytest.mark.parametrize("qtype", [GGMLType.Q4_K, GGMLType.Q6_K,
                                   GGMLType.Q4_0, GGMLType.Q8_0])
def test_fast_act_epilogue_matches_composition(qtype):
    """qmatmul_fast_act(gate++up, qt) == qmatmul(silu(gate)*up, qt) [+res]
    with both halves delivered pre-interleaved (the w_gateup_il contract,
    models/fuse.interleave_gateup_rows)."""
    from ggml_hexagon_tpu.ops.qmm_fast import (qmatmul_fast_act,
                                               supports_fused_epilogue)

    rng = np.random.default_rng(3)
    N, K = 256, 512
    w = rng.normal(size=(N, K)).astype(np.float32)
    qt = P.quantize_tensor(w, qtype).astype_device(fast=True)
    if not supports_fused_epilogue(qt):
        pytest.skip("no nkj==1 blocking for this type/shape")
    g = rng.normal(size=(2, K)).astype(np.float32)
    u = rng.normal(size=(2, K)).astype(np.float32)
    res = rng.normal(size=(2, N)).astype(np.float32)
    gs = qt.cfg.gs
    if qt.fl == "t":  # qp8 layout: natural column order, no interleave
        x_in = jnp.concatenate([jnp.asarray(g), jnp.asarray(u)], axis=1)
    else:
        x_in = jnp.concatenate([
            jnp.asarray(_interleave_half(g, gs)),
            jnp.asarray(_interleave_half(u, gs))], axis=1)
    xe = jnp.asarray(g / (1 + np.exp(-g)) * u)
    want = np.asarray(qmatmul_xla(xe, qt)) + res
    got = np.asarray(qmatmul_fast_act(x_in, qt, "silu",
                                      res=jnp.asarray(res), interpret=True))
    assert nmse(got, want) < MUL_MAT_NMSE


@pytest.mark.parametrize("qtype", [GGMLType.Q4_K, GGMLType.Q6_K])
def test_fast_res_epilogue_matches_composition(qtype):
    from ggml_hexagon_tpu.ops.qmm_fast import (qmatmul_fast_res,
                                               supports_fused_epilogue)

    rng = np.random.default_rng(4)
    N, K = 256, 512
    w = rng.normal(size=(N, K)).astype(np.float32)
    qt = P.quantize_tensor(w, qtype).astype_device(fast=True)
    if not supports_fused_epilogue(qt):
        pytest.skip("no nkj==1 blocking for this type/shape")
    x = rng.normal(size=(3, K)).astype(np.float32)
    res = rng.normal(size=(3, N)).astype(np.float32)
    want = np.asarray(qmatmul_xla(jnp.asarray(x), qt)) + res
    got = np.asarray(qmatmul_fast_res(jnp.asarray(x), qt,
                                      jnp.asarray(res), interpret=True))
    assert nmse(got, want) < MUL_MAT_NMSE


def test_uninterleave_cols_roundtrip():
    from ggml_hexagon_tpu.ops.qmm_fast import uninterleave_cols

    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 3, 512)).astype(np.float32)
    gs = 32
    x_il = x.reshape(2, 3, 512 // gs, gs).swapaxes(-1, -2).reshape(2, 3, 512)
    back = np.asarray(uninterleave_cols(jnp.asarray(x_il), gs))
    np.testing.assert_array_equal(back, x)


@pytest.mark.parametrize("tb", [GGMLType.Q6_K, GGMLType.Q4_K, GGMLType.Q8_0])
def test_fast_dual_matches_two_matmuls(tb):
    """qmatmul_fast_dual == [x@A.T ++ x@B.T] for mixed-format pairs (the
    Q4_K wqk + Q6_K attn_v decode shape), with and without fused norm."""
    from ggml_hexagon_tpu.ops.qmm_fast import (qmatmul_fast_dual,
                                               supports_dual)
    from ggml_hexagon_tpu.ops.basic import rms_norm

    rng = np.random.default_rng(7)
    K = 512
    na, nb = 1024, 512
    wa = rng.normal(size=(na, K)).astype(np.float32)
    wb = rng.normal(size=(nb, K)).astype(np.float32)
    qa = P.quantize_tensor(wa, GGMLType.Q4_K).astype_device(fast=True)
    qb = P.quantize_tensor(wb, tb).astype_device(fast=True)
    if not supports_dual(qa, qb):
        pytest.skip("no common dual blocking")
    x = jnp.asarray(rng.normal(size=(2, K)).astype(np.float32))
    want = np.concatenate(
        [np.asarray(qmatmul_xla(x, qa)), np.asarray(qmatmul_xla(x, qb))],
        axis=1)
    got = np.asarray(qmatmul_fast_dual(x, qa, qb, interpret=True))
    assert nmse(got, want) < MUL_MAT_NMSE

    # fused-norm flavor (the production decode configuration); the qp8
    # layout takes the RAW norm weight (no interleave exists there)
    wn = (rng.random(K) + 0.5).astype(np.float32)
    gs_a, gs_b = qa.cfg.gs, qb.cfg.gs
    if qa.fl == "t" and qb.fl == "t":
        wn_a = wn_b = wn
    else:
        wn_a = wn.reshape(K // gs_a, gs_a).T.reshape(K)
        wn_b = wn.reshape(K // gs_b, gs_b).T.reshape(K)
    xn = rms_norm(x, jnp.asarray(wn), 1e-5)
    want_n = np.concatenate(
        [np.asarray(qmatmul_xla(xn, qa)), np.asarray(qmatmul_xla(xn, qb))],
        axis=1)
    got_n = np.asarray(qmatmul_fast_dual(
        x, qa, qb, jnp.asarray(wn_a), jnp.asarray(wn_b), 1e-5,
        interpret=True))
    assert nmse(got_n, want_n) < MUL_MAT_NMSE


@pytest.mark.parametrize("B", [2, 16])
@pytest.mark.parametrize("qtype", [GGMLType.Q4_K, GGMLType.Q6_K])
def test_pre_interleaved_matches(qtype, B):
    """qmatmul_fast(pre_interleaved=True) on a pre-interleaved activation
    must equal the plain call (decode AND K-split blockings)."""
    rng = np.random.default_rng(9)
    N, K = 256, 512
    w = rng.normal(size=(N, K)).astype(np.float32)
    qt = P.quantize_tensor(w, qtype).astype_device(fast=True)
    if qt.fl == "t":
        pytest.skip("no interleave on the transposed qp8 layout")
    x = rng.normal(size=(B, K)).astype(np.float32)
    gs = qt.cfg.gs
    G = K // gs
    x_il = x.reshape(B, G, gs).transpose(0, 2, 1).reshape(B, K)
    want = np.asarray(qmatmul_fast(jnp.asarray(x), qt, interpret=True))
    got = np.asarray(qmatmul_fast(jnp.asarray(x_il), qt, interpret=True,
                                  pre_interleaved=True))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_offset_formats_drop_bias_plane():
    """Symmetric-offset formats derive bias in-kernel: no fb plane stored,
    and the kernel still matches the XLA oracle."""
    rng = np.random.default_rng(10)
    N, K = 256, 512
    for qtype in (GGMLType.Q6_K, GGMLType.Q4_0, GGMLType.Q5_0):
        w = rng.normal(size=(N, K)).astype(np.float32)
        qt = P.quantize_tensor(w, qtype).astype_device(fast=True)
        assert qt.fb is None, qtype
        x = jnp.asarray(rng.normal(size=(2, K)).astype(np.float32))
        want = np.asarray(qmatmul_xla(x, qt))
        got = np.asarray(qmatmul_fast(x, qt, interpret=True))
        assert nmse(got, want) < MUL_MAT_NMSE, qtype


@pytest.mark.parametrize("qtype", [GGMLType.Q4_K, GGMLType.Q6_K,
                                   GGMLType.Q8_0, GGMLType.Q4_0])
def test_qmatmul_fast_indirect_matches_oracle(qtype):
    """MUL_MAT_ID analog (gathered expert matmul): y[p] = x[p] @ W_{id[p]}.T
    streaming only the selected experts' plane rows (ggml.h:1135)."""
    from ggml_hexagon_tpu.ops.qmm_fast import (qmatmul_fast_indirect,
                                               supports_indirect)

    rng = np.random.default_rng(9)
    E, npe, K = 4, 256, 512
    w = rng.normal(size=(E * npe, K)).astype(np.float32)
    qt = P.quantize_tensor(w, qtype).astype_device(layout="il")
    assert supports_indirect(qt, npe)
    x = rng.normal(size=(5, K)).astype(np.float32)
    ids = np.array([2, 0, 3, 2, 1], np.int32)
    got = np.asarray(qmatmul_fast_indirect(
        jnp.asarray(x, jnp.float32), qt, jnp.asarray(ids), npe,
        interpret=True))
    wd = np.asarray(qmatmul_xla(jnp.eye(K, dtype=jnp.float32), qt)).T
    want = np.stack([x[p] @ wd[ids[p] * npe:(ids[p] + 1) * npe].T
                     for p in range(5)])
    assert nmse(got, want) < MUL_MAT_NMSE


def test_qmatmul_fast_indirect_duplicate_and_single():
    from ggml_hexagon_tpu.ops.qmm_fast import qmatmul_fast_indirect

    rng = np.random.default_rng(10)
    E, npe, K = 3, 128, 256
    w = rng.normal(size=(E * npe, K)).astype(np.float32)
    qt = P.quantize_tensor(w, GGMLType.Q4_K).astype_device(layout="il")
    x = rng.normal(size=(2, K)).astype(np.float32)
    ids = np.array([1, 1], np.int32)  # duplicate expert selection
    got = np.asarray(qmatmul_fast_indirect(
        jnp.asarray(x), qt, jnp.asarray(ids), npe, interpret=True))
    wd = np.asarray(qmatmul_xla(jnp.eye(K, dtype=jnp.float32), qt)).T
    want = x @ wd[npe:2 * npe].T
    assert nmse(got, want) < MUL_MAT_NMSE
