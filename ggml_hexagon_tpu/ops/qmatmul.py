"""Fused dequant x matmul — the hot op of the engine.

The TPU analog of the reference's on-accelerator quantized matmul
(ggml/src/ggml-hexagon/kernels/ggml-dsp.c:1192 ggmlop_dsp_mulmat): packed
sub-byte weights stream HBM->VMEM and are dequantized on the fly into the
MXU; a dequantized copy of the weights never exists in HBM (the reference's
QNN host-side-dequant anti-pattern, ggml-hexagon.cpp:1322, is structurally
impossible here).

Production path: *the qmm_fast Pallas kernels* (ops/qmm_fast.py) — honest
data-closed timings on the v5e showed XLA materializes dequantized
intermediates in HBM for wide shapes (29-136 GB/s effective), while the
interleaved-layout Mosaic kernels stream the packed planes at 400+ GB/s.
`qmatmul(backend="auto")` routes QTensors carrying fast planes through
them; the XLA fusion expression below remains the fallback (unsupported
types, non-TPU backends) and the differential oracle.

`qmatmul_pallas` keeps the original whole-K Mosaic implementation as a
second conformance target.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.formats import GGMLType
from ..quant.pack import QCONFIGS, QConfig, QTensor


# ---------------------------------------------------------------------------
# q8 activation quantization (opt-in parity mode, GHT_Q8_ACT=1)
#
# The reference never contracts quantized weights against f32 activations:
# ggml-cpu quantizes each activation row on the fly to the weight type's
# vec_dot_type (Q8_0 / Q8_1 / Q8_K, type_traits_cpu table,
# ggml-cpu/ggml-cpu.c:259-418) and runs an integer dot
# (vec_dot_q4_K_q8_K etc., ggml-cpu/ggml-cpu-quants.c).  Our default
# contract is EXACT f32 — numerically better, but it leaves a small PPL
# delta vs the reference's published numbers.  This mode reproduces the
# reference's activation rounding (quantize_row_q8_{0,K}_ref semantics,
# ggml-quants.c:194-244,2479-2516) so parity runs collapse to
# reduction-order noise; the integer dot itself is emulated by contracting
# the DEQUANTIZED q8 rows in f32 (products of small ints scaled by the
# block scale — bit-comparable, the dot order differs by reassociation
# only).
# ---------------------------------------------------------------------------

def q8_act_kind(cfg: QConfig) -> str:
    """Weight type -> activation quant format (the vec_dot_type column of
    type_traits_cpu, ggml-cpu/ggml-cpu.c:259-418)."""
    if cfg.lut:
        return "q8_0"  # IQ4_NL (:391)
    if cfg.superblock or cfg.code_map or cfg.gs >= 256:
        return "q8_K"  # K-quants, i-quants, ternary (:318-418)
    if cfg.asym == "min":
        return "q8_1"  # Q4_1 / Q5_1 (:281,297)
    return "q8_0"      # Q4_0 / Q5_0 / Q8_0 (:271,291,303)


def _roundf_away(v):
    """C roundf: round half away from zero."""
    return jnp.sign(v) * jnp.floor(jnp.abs(v) + 0.5)


def quantize_act_ref(x, kind: str):
    """Quantize-dequantize activation rows exactly as the reference's
    on-the-fly activation quantizers do; returns f32 of x's shape.

    q8_0/q8_1 (ggml-quants.c:194-244): per-32 block, d = fp16(amax/127),
    q = roundf(x * 127/amax); dequant scale is the fp16-rounded d.
    q8_K (ggml-quants.c:2479-2516): per-256 block, iscale = -127/max
    (max = the SIGNED value of largest magnitude), q = min(127,
    nearest_int(iscale*x)) with nearest_int = round-half-to-even,
    d = 1/iscale."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    xf = x.astype(jnp.float32)
    if kind in ("q8_0", "q8_1"):
        QK = 32
        assert K % QK == 0, f"row {K} not divisible by {QK}"
        xb = xf.reshape(*lead, K // QK, QK)
        amax = jnp.max(jnp.abs(xb), axis=-1, keepdims=True)
        d = (amax / 127.0).astype(jnp.float16).astype(jnp.float32)
        iscale = jnp.where(amax > 0, 127.0 / amax, 0.0)
        q = _roundf_away(xb * iscale)
        return (q * d).reshape(*lead, K)
    assert kind == "q8_K", kind
    QK = 256
    assert K % QK == 0, f"row {K} not divisible by {QK}"
    xb = xf.reshape(*lead, K // QK, QK)
    ab = jnp.abs(xb)
    amax = jnp.max(ab, axis=-1, keepdims=True)
    idx = jnp.argmax(ab, axis=-1)[..., None]
    smax = jnp.take_along_axis(xb, idx, axis=-1)  # signed extreme
    iscale = jnp.where(amax > 0, -127.0 / smax, 0.0)
    q = jnp.minimum(127.0, jnp.rint(xb * iscale))
    d = jnp.where(amax > 0, 1.0 / iscale, 0.0)
    return (q * d).reshape(*lead, K)


def _q8_act_enabled() -> bool:
    import os

    return os.environ.get("GHT_Q8_ACT", "") not in ("", "0")


# ---------------------------------------------------------------------------
# shared dequant expression (jnp; identical math for XLA + oracle paths)
# ---------------------------------------------------------------------------

def _unpack_plane(plane, bits: int):
    """Row-planar packed bytes [N, B] -> [N, K] int32 via shift/mask + concat."""
    per = 8 // bits
    mask = (1 << bits) - 1
    p = plane.astype(jnp.int32)
    parts = [(p >> (bits * s)) & mask for s in range(per)]
    return parts[0] if per == 1 else jnp.concatenate(parts, axis=1)


def _dequant_expr(qt: QTensor, dtype):
    """Dequantized weight [n_pad, K] as a fusable jnp expression."""
    cfg = qt.cfg
    K = qt.k
    if cfg.signed:
        q = qt.q.astype(jnp.float32)
    else:
        q = _unpack_plane(qt.q, cfg.bits_lo)
        if cfg.bits_hi:
            q = q + (_unpack_plane(qt.qh, cfg.bits_hi) << cfg.bits_lo)
        if cfg.lut:
            from ..quant.iquants import KVALUES_IQ4NL

            q = jnp.take(jnp.asarray(KVALUES_IQ4NL, jnp.int32), q)
        q = q.astype(jnp.float32)
    if cfg.superblock:
        scale_g = jnp.repeat(qt.d, 256 // cfg.gs, axis=1) * qt.sc.astype(jnp.float32)
    else:
        scale_g = qt.d
    scale = jnp.repeat(scale_g, cfg.gs, axis=1)
    if cfg.asym == "minsb":
        bias_g = -jnp.repeat(qt.dmin, 256 // cfg.gs, axis=1) * qt.m.astype(jnp.float32)
        w = q * scale + jnp.repeat(bias_g, cfg.gs, axis=1)
    elif cfg.asym == "min":
        w = q * scale + jnp.repeat(qt.m, cfg.gs, axis=1)
    elif cfg.offset:
        w = (q + float(cfg.offset)) * scale
    else:
        w = q * scale
    return w.astype(dtype)


def dequantize_jax(qt: QTensor, dtype=jnp.float32):
    """Whole-tensor dequantize (embeddings / tests).  Wire-less tensors
    (without_wire) reconstruct from the qmm_fast planes."""
    if qt.q is None:
        from .qmm_fast import dequantize_fast

        return dequantize_fast(qt, dtype)
    return _dequant_expr(qt, dtype)


def qmatmul_xla(x, qt: QTensor, out_dtype=jnp.float32, compute_dtype=jnp.bfloat16):
    """y = x @ dequant(qt).T, dequant fused into the dot by XLA."""
    assert x.shape[-1] == qt.k, f"x K={x.shape[-1]} vs weight K={qt.k}"
    if _q8_act_enabled():  # parity mode: reference activation rounding
        x = quantize_act_ref(x, q8_act_kind(qt.cfg))
        compute_dtype = jnp.float32
    w = dequantize_jax(qt, compute_dtype) if qt.q is None else \
        _dequant_expr(qt, compute_dtype)
    y = jax.lax.dot_general(
        x.astype(compute_dtype),
        w,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y[..., : qt.n].astype(out_dtype)


# the oracle is the same expression (kept as an alias for the test suite)
qmatmul_jax = qmatmul_xla


# ---------------------------------------------------------------------------
# Pallas kernel (alternative backend)
# ---------------------------------------------------------------------------

def _expand_groups_onehot(scale_g, reps: int, width: int):
    """[rows, G] -> [rows, G*reps] element-repeat via exact one-hot f32 dot."""
    G = width // reps
    row = jax.lax.broadcasted_iota(jnp.int32, (G, width), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (G, width), 1)
    onehot = (col // reps == row).astype(jnp.float32)
    return jax.lax.dot_general(
        scale_g, onehot, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _qmm_kernel(cfg: QConfig, k: int, compute_dtype,
                x_ref, q_ref, qh_ref, d_ref, sc_ref, dmin_ref, m_ref, o_ref):
    if cfg.signed:
        q = q_ref[:].astype(jnp.int32)
    else:
        q = _unpack_plane(q_ref[:], cfg.bits_lo)
        if cfg.bits_hi:
            q = q + (_unpack_plane(qh_ref[:], cfg.bits_hi) << cfg.bits_lo)
    qf = q.astype(jnp.float32)
    if cfg.superblock:
        d = _expand_groups_onehot(d_ref[:], 256 // cfg.gs, k // cfg.gs)
        scale_g = d * sc_ref[:].astype(jnp.int32).astype(jnp.float32)
    else:
        scale_g = d_ref[:]
    scale = _expand_groups_onehot(scale_g, cfg.gs, k)
    if cfg.asym == "minsb":
        dmin = _expand_groups_onehot(dmin_ref[:], 256 // cfg.gs, k // cfg.gs)
        bias_g = -dmin * m_ref[:].astype(jnp.int32).astype(jnp.float32)
        w = qf * scale + _expand_groups_onehot(bias_g, cfg.gs, k)
    elif cfg.asym == "min":
        w = qf * scale + _expand_groups_onehot(m_ref[:], cfg.gs, k)
    elif cfg.offset:
        w = (qf + float(cfg.offset)) * scale
    else:
        w = qf * scale
    o_ref[:] = jax.lax.dot_general(
        x_ref[:].astype(compute_dtype),
        w.astype(compute_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("cfg", "n", "k", "bn", "out_dtype", "compute_dtype", "interpret")
)
def _qmatmul_pallas(
    x, q, qh, d, sc, dmin, m, *, cfg: QConfig, n: int, k: int,
    bn: int, out_dtype, compute_dtype, interpret: bool = False,
):
    B = x.shape[0]
    n_pad = q.shape[0]
    n_i = n_pad // bn

    def row_spec(arr):
        if arr is None:
            return None
        cols = arr.shape[1]
        return pl.BlockSpec((bn, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((B, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        row_spec(q), row_spec(qh), row_spec(d), row_spec(sc), row_spec(dmin), row_spec(m),
    ]
    operands = [x, q, qh, d, sc, dmin, m]
    live = [i for i, s in enumerate(in_specs) if s is not None and operands[i] is not None]

    def wrapped(*refs):
        it = iter(refs[:-1])
        full = [next(it) if i in live else None for i in range(7)]
        _qmm_kernel(cfg, k, compute_dtype, *full, refs[-1])

    flops = 2 * B * k * n_pad
    bytes_accessed = sum(int(np.prod(operands[i].shape)) * operands[i].dtype.itemsize for i in live)
    out = pl.pallas_call(
        wrapped,
        grid=(n_i,),
        in_specs=[in_specs[i] for i in live],
        out_specs=pl.BlockSpec((B, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_pad), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(*[operands[i] for i in live])
    return out


def _pick_bn(B: int, k: int, n_pad: int) -> int:
    bn = 512
    while bn > 128 and (n_pad % bn or bn * k // 2 > 2 * 1024 * 1024):
        bn //= 2
    return bn


def qmatmul_pallas(
    x, qt: QTensor, out_dtype=jnp.float32, compute_dtype=jnp.bfloat16, interpret: bool = False
):
    """Mosaic-kernel backend (same math; see module docstring for status)."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    assert K == qt.k, f"x K={K} vs weight K={qt.k}"
    B = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(B, K)
    Bp = max(8, (B + 7) // 8 * 8)
    if Bp != B:
        x2 = jnp.pad(x2, ((0, Bp - B), (0, 0)))
    bn = _pick_bn(Bp, K, qt.n_pad)
    out = _qmatmul_pallas(
        x2, qt.q, qt.qh, qt.d, qt.sc, qt.dmin, qt.m,
        cfg=qt.cfg, n=qt.n, k=K, bn=bn,
        out_dtype=jnp.dtype(out_dtype), compute_dtype=jnp.dtype(compute_dtype),
        interpret=interpret,
    )
    return out[:B, : qt.n].reshape(*lead, qt.n)


def fast_interpret() -> bool:
    """CPU escape hatch: GHT_FAST_INTERPRET=1 routes the auto dispatch
    through the Pallas kernels in interpret mode off-TPU — used by the
    tp_fast shard_map tests/dryruns to prove the PRODUCTION kernels (not
    the XLA fallback) execute per shard."""
    import os

    return os.environ.get("GHT_FAST_INTERPRET", "") not in ("", "0")


def qmatmul(x, qt: QTensor, out_dtype=jnp.float32, compute_dtype=jnp.bfloat16,
            backend: str = "auto", **kw):
    """Quantized matmul for x [..., K] -> [..., n].

    backend 'auto' routes small-batch (decode) calls through the qmm_fast
    Pallas kernels when the tensor carries fast planes — measured 4-6x
    faster than the XLA fusion on the target chip — and falls back to XLA
    for prefill-sized batches (where XLA amortizes dequant across rows)
    and for unsupported types.
    """
    if backend == "auto":
        from .qmm_fast import MAX_FAST_BATCH, qmatmul_fast

        B = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
        interp = fast_interpret()
        if qt.fq is not None and (jax.default_backend() == "tpu"
                                  or interp) and (
                B <= MAX_FAST_BATCH or qt.q is None):
            kw.setdefault("interpret", interp)
            return qmatmul_fast(x, qt, out_dtype=out_dtype, **kw)
        return qmatmul_xla(x, qt, out_dtype, compute_dtype)
    if backend == "fast":
        from .qmm_fast import qmatmul_fast

        return qmatmul_fast(x, qt, out_dtype=out_dtype, **kw)
    if backend == "pallas":
        return qmatmul_pallas(x, qt, out_dtype, compute_dtype, **kw)
    return qmatmul_xla(x, qt, out_dtype, compute_dtype)


def qmatmul_normed(x, qt: QTensor, wn_il, eps: float,
                   out_dtype=jnp.float32, wn=None, **kw):
    """RMSNorm + quantized matmul, fused in-kernel on the fast path.

    wn_il: norm weight pre-interleaved to qt's qmm_fast column layout
    (models/fuse.py attach_norm_planes).  Anywhere the fast kernel doesn't
    apply, the norm runs as a plain XLA op — on `wn` (the original
    un-interleaved weight, statically known at load) when the caller
    provides it, else by un-interleaving wn_il inside the traced graph."""
    from .basic import rms_norm
    from .qmm_fast import (MAX_FAST_BATCH, qmatmul_fast_normed,
                           uninterleave_norm)

    B = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
    interp = fast_interpret()
    if qt.fq is not None and (jax.default_backend() == "tpu" or interp) and (
            B <= MAX_FAST_BATCH or qt.q is None):
        kw.setdefault("interpret", interp)
        return qmatmul_fast_normed(x, qt, wn_il, eps, out_dtype=out_dtype,
                                   **kw)
    if wn is None:
        wn = uninterleave_norm(wn_il, qt.cfg.gs)
    xn = rms_norm(x, wn, eps)
    return qmatmul(xn, qt, out_dtype, **kw)
