"""v13 transposed-plane quantized GEMV/GEMM kernels (qp8 family).

The round-3 roofline (docs/performance.md) proved the interleaved-plane
kernel family is capped by ONE per-weight VPU scale multiply (N*K bf16
ops; ~525-530 GB/s effective for 4.5-bpw planes).  This family breaks
that wall structurally, with the same contraction the reference's own CPU
kernels use (vec_dot_q4_K_q8_K, ggml/src/ggml-cpu/ggml-cpu-quants.c):

  decode (B <= 8):  activations quantize per-256-lane segment to int8
      (== the reference's q8_K activation granularity) via a segmented
      BUTTERFLY lane-max (roll+select+max; no reshape — Mosaic can't
      relayout (1,K)->(G,gs)); the int8 row expands to e = depth/gs
      masked sub-rows so ONE int8 MXU dot of depth `depth` yields the
      per-group partial sums P[b*e+s, n]; the weight scale then applies
      in the P-domain — N*G multiplies instead of N*K, a gs/B-fold
      reduction.  Affine bias (Q4_K dmin class) rides a ones-column MXU
      dot (s8 = X4_c @ 1 — the reference's bsums).  Measured on-chip
      (tools/kernel_lab9.py, 28672x4096 Q4_K gate-up shape, same
      process): 103-108 us full affine math vs the production
      interleaved kernel's 154.8 us.

  prefill (B > 8):  per-chunk dequantized weights w8 * sc_exp where
      sc_exp is a SUBLANE broadcast-reshape [e, bn] -> [e, 1, bn] ->
      [e, gs, bn] -> [depth, bn] (legal: minor dim unchanged), canonical
      x_c @ w_scaled dots in bf16 — exact production semantics, no
      activation quantization.  The column interleave (and its per-call
      activation relayout) disappears.

Plane layout (ONE set serves both paths — memory-neutral):
  fq  nibble: u8 [K/2, n2], byte row k = orig row k (lo) | k + K/2 (hi)
      byte:   i8 [K, n2] with symmetric offsets folded into the values
  fs  bf16 [G, n2]   per-group scales, TRANSPOSED
  fb  bf16 [G, n2]   affine bias (minsb: -dmin*m; min: m), or None

QTensor.fl == "t" marks the layout; the qmm_fast public entry points
dispatch here.  i-quants (coded nibbles) keep the interleaved layout.

Reference analog: the Hexagon fork's VTCM dequant-dot kernels
(ggml-hexagon/kernels/ggml-dsp.c:1192) — packed weights stream
HBM->VMEM, integer math on the accelerator, dequantized weights never
exist in HBM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.pack import QConfig, QTensor

#: activation-quant segment width (lanes) — the reference's q8_K block
SEG = 256
#: decode batch bound for the qp8 GEMV path (above: tpf prefill kernel)
QP8_MAX_DECODE = 8
#: row-block quanta (lane axis of the transposed planes)
_BN = 512


def supports_qp8(cfg: QConfig, k: int) -> bool:
    """True when (cfg, K) can build transposed planes: a chunk depth
    exists and the butterfly needs K % SEG == 0."""
    if cfg.code_map or cfg.expand:
        return False
    if k % SEG:
        return False
    return pick_depth(cfg, k) is not None


def _is_nib(cfg: QConfig) -> bool:
    return (cfg.bits_lo == 4 and cfg.bits_hi == 0 and not cfg.signed
            and not cfg.lut)


def pick_depth(cfg: QConfig, k: int) -> int | None:
    """Largest chunk depth in {512, 256, 128} dividing K (and K/2 for
    nibble planes, keeping chunk slices byte-row-aligned)."""
    for d in (512, 256, 128):
        if d % cfg.gs:
            continue
        if k % d:
            continue
        if _is_nib(cfg) and (k // 2) % d:
            continue
        if d // cfg.gs < 2:
            continue
        return d
    return None


# ---------------------------------------------------------------------------
# plane building (host-side numpy; mirrors qmm_fast.build_fast_planes)
# ---------------------------------------------------------------------------

def build_t_planes(qt: QTensor):
    """-> (fq, fs, fb) transposed planes, or (None,)*3 when unsupported.

    Works on host (numpy) wire planes only — loaders build before device
    upload (no per-op remote compiles, no transient HBM).
    """
    from .qmm_fast import _group_scale_bias_np, _int_values_np

    cfg = qt.cfg
    K = qt.k
    if not supports_qp8(cfg, K):
        return None, None, None
    assert isinstance(qt.q, np.ndarray), "t-planes build host-side"
    v = _int_values_np(qt)                       # [n_pad, K] ints
    scale_g, bias_g = _group_scale_bias_np(qt)   # [n_pad, G] f32
    if cfg.offset and cfg.asym == "none":
        # symmetric offset folds into the stored values (int8 path) or
        # derives in-kernel as off * scale (nibble path, no fb plane)
        if not _is_nib(cfg):
            v = v + int(cfg.offset)
        bias_g = None
    n_pad = v.shape[0]
    quantum = 2048 if n_pad >= 65536 else _BN
    n2 = -(-n_pad // quantum) * quantum
    if n2 != n_pad:
        v = np.pad(v, ((0, n2 - n_pad), (0, 0)))
        scale_g = np.pad(scale_g, ((0, n2 - n_pad), (0, 0)))
        if bias_g is not None:
            bias_g = np.pad(bias_g, ((0, n2 - n_pad), (0, 0)))
    vT = np.ascontiguousarray(v.T)               # [K, n2]
    if _is_nib(cfg):
        fq = (vT[: K // 2] | (vT[K // 2:] << 4)).astype(np.uint8)
    else:
        fq = vT.astype(np.int8)
    import ml_dtypes

    fs = np.ascontiguousarray(scale_g.T).astype(ml_dtypes.bfloat16)
    fb = (None if bias_g is None
          else np.ascontiguousarray(bias_g.T).astype(ml_dtypes.bfloat16))
    return fq, fs, fb


def _offset_bias_t(cfg: QConfig, fb) -> float:
    """Non-zero for nibble symmetric-offset formats (Q4_0): bias =
    offset * scale, derived from the scale plane in the P-domain."""
    return (float(cfg.offset)
            if (fb is None and cfg.offset and _is_nib(cfg)) else 0.0)


def dequantize_qp8(qt: QTensor, dtype=jnp.float32):
    """Reconstruct the dequantized [n2, K] matrix from t-planes."""
    cfg = qt.cfg
    K = qt.k
    gs = cfg.gs
    if _is_nib(cfg):
        p = qt.fq.astype(jnp.int32)
        vT = jnp.concatenate([p & 15, (p >> 4) & 15], axis=0)  # [K, n2]
    else:
        vT = qt.fq.astype(jnp.int32)
    sT = jnp.repeat(qt.fs.astype(jnp.float32), gs, axis=0)     # [K, n2]
    wT = vT.astype(jnp.float32) * sT
    off = _offset_bias_t(cfg, qt.fb)
    if off:
        wT = wT + off * sT
    if qt.fb is not None:
        wT = wT + jnp.repeat(qt.fb.astype(jnp.float32), gs, axis=0)
    return wT.T.astype(dtype)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _butterfly_absmax(x, seg: int):
    """Per-lane max of |x| over its seg-wide lane segment via a segmented
    butterfly (partner k XOR dist stays in-segment for dist < seg)."""
    m = jnp.abs(x)
    K = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    dist = 1
    while dist < seg:
        lo = pltpu.roll(m, K - dist, axis=x.ndim - 1)
        hi = pltpu.roll(m, dist, axis=x.ndim - 1)
        m = jnp.maximum(m, jnp.where((lane & dist) == 0, lo, hi))
        dist *= 2
    return m


def _apply_act_f32(act: str, x):
    if act == "gelu":
        return 0.5 * x * (1.0 + jnp.tanh(0.7978845608028654
                                         * (x + 0.044715 * x * x * x)))
    if act == "relu":
        return jnp.maximum(x, 0.0)
    return x * jax.lax.logistic(x)  # silu


def _qp8_decode_kernel(K: int, depth: int, B: int, gs: int, nibble: bool,
                       affine: bool, off: float, eps, act: str,
                       has_res: bool, x_ref, q_ref, s_ref, *rest):
    """Transposed-plane int8 group-partial decode GEMV (B <= 8).

    x_ref [B, K] f32 raw ([B, 2K] when act: gate ++ up halves);
    q_ref [K/2, bn] u8 / [K, bn] i8; s_ref fsT [G, bn];
    optional (in order): fbT [G, bn], wn [1, K], res [B, bn]; out [B8, bn].
    """
    i = 0
    b_ref = wn_ref = res_ref = None
    if affine:
        b_ref = rest[i]
        i += 1
    if eps is not None:
        wn_ref = rest[i]
        i += 1
    if has_res:
        res_ref = rest[i]
        i += 1
    o_ref = rest[-1]
    bn = o_ref.shape[1]
    e = depth // gs
    rows = B * e
    nch = K // depth
    # ---- effective activation (f32): raw / fused RMS-norm / act-mul ----
    if act:
        xw = x_ref[:].astype(jnp.float32)
        xf = _apply_act_f32(act, xw[:, :K]) * xw[:, K:]
    elif wn_ref is not None:
        x0 = x_ref[:].astype(jnp.float32)
        inv = jax.lax.rsqrt(jnp.mean(x0 * x0, axis=1, keepdims=True) + eps)
        xf = x0 * inv * wn_ref[:].astype(jnp.float32)
    else:
        xf = x_ref[:].astype(jnp.float32)
    # ---- per-SEG-segment symmetric int8 activation quantization --------
    amax = _butterfly_absmax(xf, SEG)
    iscale = jnp.where(amax > 0, 127.0 / amax, 0.0)
    # the i1 select mask can't relayout to int8 (32,128) tiling: select in
    # the i32 domain, truncate after
    x8 = jnp.round(xf * iscale).astype(jnp.int32)
    # ---- expansion: row b*e+s keeps weight-subgroup s of each chunk ----
    if B == 1:
        x8b = jnp.broadcast_to(x8, (rows, K))
    else:
        x8b = jnp.broadcast_to(
            x8.reshape(B, 1, K), (B, e, K)).reshape(rows, K)
    sub = (jax.lax.broadcasted_iota(jnp.int32, (rows, K), 1) // gs) % e
    rid = jax.lax.broadcasted_iota(jnp.int32, (rows, K), 0) % e
    X4 = jnp.where(sub == rid, x8b, 0).astype(jnp.int8)
    need_s8 = affine or off
    ones = jnp.ones((depth, 1), jnp.int8) if need_s8 else None
    srow = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    s_in_b = srow % e
    b_of_r = srow // e
    half = K // 2
    ch_half = half // depth
    acc = jnp.zeros((rows, bn), jnp.float32)
    for c in range(nch):
        if nibble:
            if c < ch_half:
                w = (q_ref[c * depth:(c + 1) * depth, :] & 15).astype(
                    jnp.int8)
            else:
                cc = c - ch_half
                w = (q_ref[cc * depth:(cc + 1) * depth, :].astype(jnp.int32)
                     >> 4).astype(jnp.int8)
        else:
            w = q_ref[c * depth:(c + 1) * depth, :]
        xc = X4[:, c * depth:(c + 1) * depth]
        p = jax.lax.dot_general(xc, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        # xs_sel [rows, 1]: activation scale of the segment holding weight
        # group c*e + s of batch b (scalar extracts + iota selects)
        xs_sel = jnp.zeros((rows, 1), jnp.float32)
        spseg = SEG // gs  # weight groups per activation segment
        nseg_c = max(1, depth // SEG)
        for b in range(B):
            for j in range(nseg_c):
                lane0 = c * depth + j * SEG if depth >= SEG else c * depth
                xs_bj = amax[b, lane0] * (1.0 / 127.0)
                cond = (s_in_b >= j * spseg) & (s_in_b < (j + 1) * spseg)
                if B > 1:
                    cond = cond & (b_of_r == b)
                xs_sel = jnp.where(cond, xs_bj, xs_sel)
        m = s_ref[c * e:(c + 1) * e, :].astype(jnp.float32)   # [e, bn]
        if B > 1:
            m = pltpu.repeat(m, B, axis=0)
        acc = acc + p.astype(jnp.float32) * (m * xs_sel)
        if need_s8:
            s8 = jax.lax.dot_general(
                xc, ones, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            if affine:
                fb = b_ref[c * e:(c + 1) * e, :].astype(jnp.float32)
                if B > 1:
                    fb = pltpu.repeat(fb, B, axis=0)
            else:
                fb = off * m
            acc = acc + fb * (s8 * xs_sel)
    y = acc.reshape(B, e, bn).sum(axis=1)
    if res_ref is not None:
        y = y + res_ref[:].astype(jnp.float32)
    if B < o_ref.shape[0]:
        y = jnp.pad(y, ((0, o_ref.shape[0] - B), (0, 0)))
    o_ref[:] = y


def _tpf_kernel(K: int, depth: int, gs: int, nibble: bool, affine: bool,
                off: float, x_ref, q_ref, s_ref, *rest):
    """Transposed-plane prefill GEMM: per-chunk sublane scale expansion,
    canonical bf16 dots (exact production semantics)."""
    b_ref = rest[0] if affine else None
    o_ref = rest[-1]
    bn = o_ref.shape[1]
    B = x_ref.shape[0]
    e = depth // gs
    nch = K // depth
    half = K // 2
    ch_half = half // depth
    acc = jnp.zeros((B, bn), jnp.float32)
    need_xg = affine or off
    mask = None
    xgs = []
    if need_xg:
        # group-sum side dot mask [depth, e] (bsums per chunk via MXU)
        subm = jax.lax.broadcasted_iota(jnp.int32, (depth, e), 0) // gs
        colm = jax.lax.broadcasted_iota(jnp.int32, (depth, e), 1)
        mask = (subm == colm).astype(jnp.bfloat16)
    for c in range(nch):
        if nibble:
            if c < ch_half:
                w = (q_ref[c * depth:(c + 1) * depth, :] & 15).astype(
                    jnp.int8)
            else:
                cc = c - ch_half
                w = (q_ref[cc * depth:(cc + 1) * depth, :].astype(jnp.int32)
                     >> 4).astype(jnp.int8)
        else:
            w = q_ref[c * depth:(c + 1) * depth, :]
        sc = s_ref[c * e:(c + 1) * e, :]
        sc_exp = jnp.broadcast_to(
            sc.reshape(e, 1, bn), (e, gs, bn)).reshape(depth, bn)
        wsc = w.astype(jnp.bfloat16) * sc_exp.astype(jnp.bfloat16)
        xc = x_ref[:, c * depth:(c + 1) * depth]
        acc = acc + jax.lax.dot_general(
            xc, wsc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if need_xg:
            xgs.append(jax.lax.dot_general(
                xc, mask, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))         # [B, e]
    if need_xg:
        # ONE depth-G bias dot at the end (a per-chunk depth-e dot pays
        # the MXU's 128-deep pipeline per chunk: measured 2.6x whole-
        # kernel cost on the B=512 gate-up shape)
        xg = jnp.concatenate(xgs, axis=1)                    # [B, G]
        fb = (b_ref[:] if affine
              else off * s_ref[:]).astype(jnp.float32)       # [G, bn]
        acc = acc + jax.lax.dot_general(
            xg, fb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[:] = acc


def _pick_bn_t(n2: int, K: int, nibble: bool, B: int) -> int:
    """Lane-block size: weight block (+ double buffer) must fit VMEM."""
    per_col = (K // 2 if nibble else K)
    for bn in (2048, 1024, 512, 256):
        if n2 % bn:
            continue
        # block + its unpack/cast intermediates (~3 B/weight decode, ~4
        # prefill bf16 path) + double buffering
        scratch = (4 if B > QP8_MAX_DECODE else 3) * bn * per_col
        if 2 * bn * per_col + scratch + 2 * B * K * 4 <= 90 * 1024 * 1024:
            return bn
    return 256


@functools.partial(jax.jit, static_argnames=(
    "nibble", "G", "bn", "depth", "gs", "eps", "interpret", "act", "off",
    "decode"))
def _qp8_call(x, fq, fs, fb=None, wn=None, res=None, *, nibble: bool,
              G: int, bn: int, depth: int, gs: int, eps=None,
              interpret: bool = False, act: str = "", off: float = 0.0,
              decode: bool = True):
    B, K = x.shape
    if act:
        K = K // 2
    n2 = fq.shape[1]
    rowsdim = fq.shape[0]
    if decode:
        kern = functools.partial(
            _qp8_decode_kernel, K, depth, B, gs, nibble, fb is not None,
            off, eps, act, res is not None)
        B8 = max(8, B)
    else:
        assert not act and eps is None and res is None
        kern = functools.partial(
            _tpf_kernel, K, depth, gs, nibble, fb is not None, off)
        B8 = B
    col_spec = pl.BlockSpec((G, bn), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((B, 2 * K if act else K), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rowsdim, bn), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        col_spec,
    ]
    args = [x, fq, fs]
    if fb is not None:
        in_specs.append(col_spec)
        args.append(fb)
    if wn is not None:
        in_specs.append(pl.BlockSpec((1, K), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(wn.reshape(1, K))
    if res is not None:
        in_specs.append(pl.BlockSpec((B, bn), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        args.append(res)
    return pl.pallas_call(
        kern,
        grid=(n2 // bn,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B8, bn), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B8, n2), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * n2,
            bytes_accessed=int(np.prod(fq.shape)) + 4 * n2 * G,
            transcendentals=0),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# jnp reference of the kernel math (CPU tests + custom-vjp + conformance)
# ---------------------------------------------------------------------------

def _quant_act_seg(xf):
    """Emulate the kernel's per-SEG int8 activation quantization in jnp:
    returns (x8 f32 ints, xs [B, K/SEG])."""
    B, K = xf.shape
    nseg = K // SEG
    xb = xf.reshape(B, nseg, SEG)
    amax = jnp.max(jnp.abs(xb), axis=2)
    iscale = jnp.where(amax > 0, 127.0 / amax, 0.0)
    x8 = jnp.round(xb * iscale[:, :, None]).reshape(B, K)
    return x8, amax * (1.0 / 127.0)


def qp8_ref(x, qt: QTensor):
    """Reference of the DECODE kernel contract (q8 activations, integer
    group dots, scales on partials), in f32 jnp."""
    cfg = qt.cfg
    K = qt.k
    gs = cfg.gs
    G = K // gs
    if _is_nib(cfg):
        p = qt.fq.astype(jnp.int32)
        vT = jnp.concatenate([p & 15, (p >> 4) & 15], axis=0)
    else:
        vT = qt.fq.astype(jnp.int32)
    B = x.shape[0]
    x8, xs = _quant_act_seg(x.astype(jnp.float32))
    n2 = vT.shape[1]
    # P[b, g, n] via masked per-group contraction
    Pg = jnp.einsum(
        "bgk,gkn->bgn", x8.reshape(B, G, gs),
        vT.reshape(G, gs, n2).astype(jnp.float32))
    xs_g = xs[:, (jnp.arange(G) * gs) // SEG]                 # [B, G]
    scT = qt.fs.astype(jnp.float32)
    y = jnp.einsum("bgn,gn,bg->bn", Pg, scT, xs_g)
    off = _offset_bias_t(cfg, qt.fb)
    if qt.fb is not None or off:
        s8 = x8.reshape(B, G, gs).sum(axis=2)
        fbT = (qt.fb.astype(jnp.float32) if qt.fb is not None
               else off * scT)
        y = y + jnp.einsum("gn,bg,bg->bn", fbT, s8, xs_g)
    return y


# ---------------------------------------------------------------------------
# public entries (mirror ops/qmm_fast's surface; dispatched from there)
# ---------------------------------------------------------------------------

def _decode_ok(B: int) -> bool:
    return B <= QP8_MAX_DECODE


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _qp8_core(x, planes, cfg, n, k, interpret, depth, gs):
    fq, fs, fb = planes
    B, K = x.shape
    G = K // gs
    nibble = _is_nib(cfg)
    bn = _pick_bn_t(fq.shape[1], K, nibble, B)
    decode = _decode_ok(B)
    off = _offset_bias_t(cfg, fb)
    xin = (x.astype(jnp.float32) if decode else x.astype(jnp.bfloat16))
    y = _qp8_call(xin, fq, fs, fb, nibble=nibble, G=G, bn=bn, depth=depth,
                  gs=gs, interpret=interpret, off=off, decode=decode)
    # slice BOTH axes so the custom-vjp cotangent matches x's row count
    return y[:B, :n]


def _qp8_fwd(x, planes, cfg, n, k, interpret, depth, gs):
    return _qp8_core(x, planes, cfg, n, k, interpret, depth, gs), (x, planes)


def _qp8_bwd(cfg, n, k, interpret, depth, gs, resid, g):
    x, planes = resid
    fq, fs, fb = planes
    # straight-through through the activation quant; dx = g @ W^T from the
    # dequantized transposed planes
    if _is_nib(cfg):
        p = fq.astype(jnp.int32)
        vT = jnp.concatenate([p & 15, (p >> 4) & 15], axis=0)
    else:
        vT = fq.astype(jnp.int32)
    sT = jnp.repeat(fs.astype(jnp.float32), gs, axis=0)
    wT = vT.astype(jnp.float32) * sT                      # [K, n2]
    off = _offset_bias_t(cfg, fb)
    gp = jnp.pad(g.astype(jnp.float32),
                 ((0, 0), (0, fq.shape[1] - g.shape[1])))
    dx = jax.lax.dot_general(gp, wT, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    fb_eff = fb.astype(jnp.float32) if fb is not None else (
        off * fs.astype(jnp.float32) if off else None)
    if fb_eff is not None:
        dxg = jax.lax.dot_general(gp, fb_eff, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dx = dx + jnp.repeat(dxg, gs, axis=1)

    def zero(pn):
        if pn is None:
            return None
        if jnp.issubdtype(pn.dtype, jnp.floating):
            return jnp.zeros_like(pn)
        return np.zeros(pn.shape, jax.dtypes.float0)

    return dx.astype(x.dtype), tuple(zero(pn) for pn in planes)


_qp8_core.defvjp(_qp8_fwd, _qp8_bwd)


def _lead2(x, k):
    lead = x.shape[:-1]
    B = int(np.prod(lead)) if lead else 1
    return lead, B, x.reshape(B, k)


def qp8_matmul(x, qt: QTensor, out_dtype=jnp.float32, interpret=False):
    """y = x @ dequant(qt).T via transposed planes (decode: q8-activation
    group-partial contraction; prefill: exact bf16 chunk GEMM)."""
    K = x.shape[-1]
    assert K == qt.k and qt.fq is not None
    lead, B, x2 = _lead2(x, K)
    depth = pick_depth(qt.cfg, K)
    y = _qp8_core(x2, (qt.fq, qt.fs, qt.fb), qt.cfg, qt.n, K,
                  interpret, depth, qt.cfg.gs)
    return y[:B].reshape(*lead, qt.n).astype(out_dtype)


def _qp8_infer(x2, qt: QTensor, wn=None, eps=None, act="", res=None,
               interpret=False):
    """Inference-only fused launch (no vjp): norm / act / residual."""
    cfg = qt.cfg
    K = qt.k if not act else qt.k
    B = x2.shape[0]
    G = qt.k // cfg.gs
    nibble = _is_nib(cfg)
    bn = _pick_bn_t(qt.fq.shape[1], qt.k, nibble, B)
    depth = pick_depth(cfg, qt.k)
    off = _offset_bias_t(cfg, qt.fb)
    if res is not None:
        res = res.astype(jnp.float32)
        res = jnp.pad(res, ((0, 0), (0, qt.fq.shape[1] - res.shape[1])))
    y = _qp8_call(x2.astype(jnp.float32), qt.fq, qt.fs, qt.fb,
                  None if wn is None else jnp.asarray(wn, jnp.float32),
                  res, nibble=nibble, G=G, bn=bn, depth=depth, gs=cfg.gs,
                  eps=None if eps is None else float(eps),
                  interpret=interpret, act=act, off=off, decode=True)
    del K
    return y


def qp8_matmul_normed(x, qt: QTensor, wn, eps: float,
                      out_dtype=jnp.float32, interpret=False):
    """Fused RMSNorm + qp8 matmul (decode); prefill: XLA norm + tpf."""
    K = x.shape[-1]
    assert K == qt.k and qt.fq is not None
    lead, B, x2 = _lead2(x, K)
    if not _decode_ok(B):
        from .basic import rms_norm

        xn = rms_norm(x, jnp.asarray(wn), eps)
        return qp8_matmul(xn, qt, out_dtype=out_dtype, interpret=interpret)
    y = _qp8_infer(x2, qt, wn=wn, eps=eps, interpret=interpret)
    return y[:B, :qt.n].reshape(*lead, qt.n).astype(out_dtype)


def qp8_matmul_res(x, qt: QTensor, res, out_dtype=jnp.float32,
                   interpret=False):
    """qp8 matmul with in-kernel residual add (decode epilogue)."""
    K = x.shape[-1]
    assert K == qt.k and qt.fq is not None
    lead, B, x2 = _lead2(x, K)
    assert _decode_ok(B)
    r2 = res.astype(jnp.float32).reshape(B, qt.n)
    y = _qp8_infer(x2, qt, res=r2, interpret=interpret)
    return y[:B, :qt.n].reshape(*lead, qt.n).astype(out_dtype)


def qp8_matmul_act(x, qt: QTensor, act: str, res=None,
                   out_dtype=jnp.float32, interpret=False):
    """Fused act-mul + qp8 matmul: y = (act(gate)*up) @ dequant(qt).T
    [+ res].  x [..., 2K] is the RAW gate_up output in NATURAL column
    order (no row permutation needed on the t-layout)."""
    K2 = x.shape[-1]
    K = K2 // 2
    assert K == qt.k and qt.fq is not None
    lead = x.shape[:-1]
    B = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(B, K2)
    assert _decode_ok(B)
    r2 = None
    if res is not None:
        r2 = res.astype(jnp.float32).reshape(B, qt.n)
    y = _qp8_infer(x2, qt, act=act, res=r2, interpret=interpret)
    return y[:B, :qt.n].reshape(*lead, qt.n).astype(out_dtype)
