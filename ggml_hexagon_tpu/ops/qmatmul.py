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
        if qt.fq is not None and jax.default_backend() == "tpu" and (
                B <= MAX_FAST_BATCH or qt.q is None):
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
    if qt.fq is not None and jax.default_backend() == "tpu" and (
            B <= MAX_FAST_BATCH or qt.q is None):
        return qmatmul_fast_normed(x, qt, wn_il, eps, out_dtype=out_dtype,
                                   **kw)
    if wn is None:
        wn = uninterleave_norm(wn_il, qt.cfg.gs)
    xn = rms_norm(x, wn, eps)
    return qmatmul(xn, qt, out_dtype, **kw)
