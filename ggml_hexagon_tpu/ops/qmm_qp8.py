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

Plane layout (ONE set serves both paths — memory-neutral, and AT WIRE
DENSITY for every (4,0)/(4,1)/(4,2)/(2,0)/(2,1)-bit K-quant family —
Q6_K rides 6 packed bits/weight here vs the 8-bit int8 rows of the
interleaved layout):
  fq  u8 [K*(bits_lo+bits_hi)/8, n2]: bits_lo-packed value plane (shift-
      slice s = value rows [s*K*bits_lo/8, ...)), bits_hi plane rows
      concatenated below; symmetric offsets derive as off*scale
  fs  bf16 [G, n2]   per-group scales, TRANSPOSED
  fb  bf16 [G, n2]   affine bias (minsb: -dmin*m; min: m), or None

QTensor.fl == "t" marks the layout; the qmm_fast public entry points
dispatch here.  Coded i-quants/ternary ride 2-4 bpw arithmetic-code
planes (see _pack_bits); Q8_0 (signed) and IQ4 (LUT) keep the
interleaved layout.

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


def _pack_bits(cfg: QConfig):
    """(bits_lo, bits_hi) of the packed t-plane, or None when the type
    can't ride this layout (signed int8 / LUT formats keep the
    interleaved planes).

    Coded formats (i-quants / ternary) pack their ARITHMETIC CODES, not
    values: 2-magnitude-code alphabets (iq2/iq1) ride 2+1 bits (code +
    sign = 3 bpw vs the interleaved coded nibbles' 4 and wire's
    1.56-2.06 — the remaining gap is the reference's 256-entry grid
    codebooks, which need a gather unit the TPU lacks); 8-magnitude
    alphabets (iq3) keep sign+code nibbles (4+0); ternary is a plain
    2-bit code."""
    if cfg.lut or (cfg.signed and not cfg.code_map):
        return None
    if cfg.code_map in ("iq2", "iq1"):
        return 2, 1
    if cfg.code_map in ("iq3xxs", "iq3s"):
        return 4, 0
    if cfg.code_map == "tern":
        return 2, 0
    if cfg.code_map or cfg.expand:
        return None
    if (cfg.bits_lo, cfg.bits_hi) in ((4, 0), (4, 1), (4, 2),
                                      (2, 0), (2, 1)):
        return cfg.bits_lo, cfg.bits_hi
    return None


def supports_qp8(cfg: QConfig, k: int) -> bool:
    """True when (cfg, K) can build transposed planes: a packable bit
    geometry, a chunk depth, and K % SEG == 0 (the butterfly)."""
    if _pack_bits(cfg) is None:
        return False
    if k % SEG:
        return False
    return pick_depth(cfg, k) is not None


def _is_nib(cfg: QConfig) -> bool:
    return (cfg.bits_lo == 4 and cfg.bits_hi == 0 and not cfg.signed
            and not cfg.lut and not cfg.code_map and not cfg.expand)


def pick_depth(cfg: QConfig, k: int, prefill: bool = False) -> int | None:
    """Chunk depth dividing every shift-slice period of the packed
    planes (K/(8/bits) rows per slice — chunk slices must stay inside
    one shift slice).  Decode prefers 512 (smaller expansion); prefill
    prefers 1024 — deeper chunks pipeline the MXU better (measured
    on-chip, B=512 gate-up: d=1024 197.7 TFLOP/s vs d=512's 42-124;
    docs/performance.md round-4 section).
    GHT_QP8_DEPTH overrides for whole-model ablations."""
    import os

    pb = _pack_bits(cfg)
    if pb is None:
        return None
    bits_lo, bits_hi = pb
    periods = [k * bits_lo // 8]
    if bits_hi:
        periods.append(k * bits_hi // 8)
    env = os.environ.get("GHT_QP8_DEPTH")
    auto = ((1024, 512, 256, 128, 64, 32) if prefill
            else (512, 256, 128, 64, 32))
    cands = (int(env),) if env else auto

    def ok(d):
        return not (d % cfg.gs or k % d or any(p % d for p in periods)
                    or d // cfg.gs < 2)

    for d in cands:
        if ok(d):
            return d
    if env:
        # an env-forced depth that fails the divisibility gates would
        # otherwise surface as an opaque TypeError(depth=None) inside the
        # kernel call — fall back to the automatic list with a warning
        # when the tensor's planes were already built for this layout
        import warnings

        for d in auto:
            if ok(d):
                warnings.warn(
                    f"GHT_QP8_DEPTH={env} incompatible with "
                    f"(qtype={cfg.qtype.name}, K={k}): depth must divide "
                    f"K, every shift-slice period, and be >= 2 groups — "
                    f"using depth={d} for this tensor")
                return d
    return None


# ---------------------------------------------------------------------------
# plane building (host-side numpy; mirrors qmm_fast.build_fast_planes)
# ---------------------------------------------------------------------------

def build_t_planes(qt: QTensor):
    """-> (fq, fs, fb) transposed planes, or (None,)*3 when unsupported.

    fq u8 [(K*bits_lo + K*bits_hi)/8, n2]: the bits_lo-packed plane
    (shift-slice s holds value rows [s*K*bits_lo/8, ...)) with the
    bits_hi plane's rows concatenated below.  Symmetric offsets derive
    in-kernel as off * scale (no stored bias plane).

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
    if cfg.code_map:
        # re-encode int8 alphabet values as sign+magnitude codes (the
        # kernels decode arithmetically; qmm_fast.encode_codes_np): for
        # 2+1 layouts the low 2 bits carry the magnitude code and the
        # hi plane the sign bit
        from .qmm_fast import encode_codes_np

        codes = encode_codes_np(cfg.code_map, np.asarray(v))
        bl, bh = _pack_bits(cfg)
        if (bl, bh) == (2, 1):
            v = (codes & 3) | (((codes >> 3) & 1) << 2)
        else:
            v = codes
    scale_g, bias_g = _group_scale_bias_np(qt)   # [n_pad, G] f32
    if cfg.offset and cfg.asym == "none":
        bias_g = None  # derived in-kernel as off * scale
    n_pad = v.shape[0]
    quantum = 2048 if n_pad >= 65536 else _BN
    n2 = -(-n_pad // quantum) * quantum
    if n2 != n_pad:
        v = np.pad(v, ((0, n2 - n_pad), (0, 0)))
        scale_g = np.pad(scale_g, ((0, n2 - n_pad), (0, 0)))
        if bias_g is not None:
            bias_g = np.pad(bias_g, ((0, n2 - n_pad), (0, 0)))
    vT = np.ascontiguousarray(v.T).astype(np.uint16)  # [K, n2]
    bits_lo, bits_hi = _pack_bits(cfg)

    def pack(plane, bits):
        per = 8 // bits
        rows = K // per
        out = np.zeros((rows, n2), np.uint8)
        for s in range(per):
            out |= (plane[s * rows:(s + 1) * rows] << (bits * s)).astype(
                np.uint8)
        return out

    fq = pack(vT & ((1 << bits_lo) - 1), bits_lo)
    if bits_hi:
        fq = np.concatenate([fq, pack(vT >> bits_lo, bits_hi)], axis=0)
    import ml_dtypes

    fs = np.ascontiguousarray(scale_g.T).astype(ml_dtypes.bfloat16)
    fb = (None if bias_g is None
          else np.ascontiguousarray(bias_g.T).astype(ml_dtypes.bfloat16))
    return fq, fs, fb


def _offset_bias_t(cfg: QConfig, fb) -> float:
    """Symmetric-offset formats (Q4_0/Q5_0/Q3_K/Q6_K): bias = offset *
    scale, derived from the scale plane in the P-domain (no fb plane)."""
    return float(cfg.offset) if (fb is None and cfg.offset) else 0.0


def _unpack_rows(fq, bits_lo: int, bits_hi: int, K: int, row0: int,
                 d: int):
    """Value rows [row0, row0+d) of the packed t-plane, as int8 (jnp;
    works on arrays AND in-kernel refs — slicing a ref reads it).  The
    chunk depth divides every shift-slice period, so one slice index
    serves the whole chunk."""
    rows_lo = K * bits_lo // 8
    s = row0 // rows_lo
    r0 = row0 - s * rows_lo
    w = ((fq[r0:r0 + d, :].astype(jnp.int32) >> (bits_lo * s))
         & ((1 << bits_lo) - 1))
    if bits_hi:
        rows_hi = K * bits_hi // 8
        sh = row0 // rows_hi
        rh = rows_lo + (row0 - sh * rows_hi)
        wh = ((fq[rh:rh + d, :].astype(jnp.int32) >> (bits_hi * sh))
              & ((1 << bits_hi) - 1))
        w = w | (wh << bits_lo)
    return w.astype(jnp.int8)


#: 4-entry magnitude alphabets as one 32-bit shift-LUT constant
#: (byte c of the word = alphabet[c]); decoded with ONE lane-wise
#: variable shift + mask instead of a select chain
_SHIFT_LUTS = {"iq2": 0x2B190800, "iq1": 0x09070100}


def _decode_cm(cm: str, pb: tuple, w):
    """Arithmetic code -> int8 value for coded formats; identity
    otherwise.  w holds (bits_lo + bits_hi)-bit raw codes: 2+1 layouts
    carry the magnitude code in bits 0-1 and the sign in bit 2; nibble
    layouts use the qmm_fast convention (sign bit 3)."""
    if not cm:
        return w
    from .qmm_fast import decode_codes

    wi = w.astype(jnp.int32)
    if pb == (2, 1):
        if cm in _SHIFT_LUTS:
            mag = (_SHIFT_LUTS[cm] >> ((wi & 3) * 8)) & 0xFF
            sign = 1 - ((wi >> 2) << 1)     # bit2 -> +1/-1
            return (sign * mag).astype(jnp.int8)
        wi = (wi & 3) | ((wi >> 2) << 3)   # -> sign-bit-3 convention
    elif cm == "tern":
        pass                                # 2-bit code, no sign bit
    return decode_codes(cm, wi).astype(jnp.int8)


def _unpack_t(fq, cfg: QConfig, K: int, row0: int, d: int):
    bits_lo, bits_hi = _pack_bits(cfg)
    return _decode_cm(cfg.code_map, (bits_lo, bits_hi),
                      _unpack_rows(fq, bits_lo, bits_hi, K, row0, d))


def dequantize_qp8(qt: QTensor, dtype=jnp.float32):
    """Reconstruct the dequantized [n2, K] matrix from t-planes."""
    cfg = qt.cfg
    K = qt.k
    gs = cfg.gs
    dch = pick_depth(cfg, K)
    vT = jnp.concatenate(
        [_unpack_t(qt.fq, cfg, K, r0, dch).astype(jnp.int32)
         for r0 in range(0, K, dch)], axis=0)                  # [K, n2]
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


def _qp8_prologue(K: int, B: int, eps, act: str, x_ref, wn_ref):
    """Effective activation (raw / fused RMS-norm / act-mul) -> per-SEG
    int8 quantization.  Returns (x8 i32 [B, K], amax [B, K])."""
    if act:
        xw = x_ref[:].astype(jnp.float32)
        xf = _apply_act_f32(act, xw[:, :K]) * xw[:, K:]
    elif wn_ref is not None:
        x0 = x_ref[:].astype(jnp.float32)
        inv = jax.lax.rsqrt(jnp.mean(x0 * x0, axis=1, keepdims=True) + eps)
        xf = x0 * inv * wn_ref[:].astype(jnp.float32)
    else:
        xf = x_ref[:].astype(jnp.float32)
    amax = _butterfly_absmax(xf, SEG)
    iscale = jnp.where(amax > 0, 127.0 / amax, 0.0)
    # the i1 select mask can't relayout to int8 (32,128) tiling: select in
    # the i32 domain, truncate after (the expansion does the final cast)
    x8 = jnp.round(xf * iscale).astype(jnp.int32)
    return x8, amax


def _qp8_expand(K: int, depth: int, B: int, gs: int, x8):
    """int8 activation row(s) -> e = depth/gs masked sub-rows per batch
    row (row b*e+s keeps weight-subgroup s of each chunk)."""
    e = depth // gs
    rows = B * e
    if B == 1:
        x8b = jnp.broadcast_to(x8, (rows, K))
    else:
        x8b = jnp.broadcast_to(
            x8.reshape(B, 1, K), (B, e, K)).reshape(rows, K)
    sub = (jax.lax.broadcasted_iota(jnp.int32, (rows, K), 1) // gs) % e
    rid = jax.lax.broadcasted_iota(jnp.int32, (rows, K), 0) % e
    return jnp.where(sub == rid, x8b, 0).astype(jnp.int8)


def _qp8_body(K: int, depth: int, B: int, gs: int, pb: tuple, cm: str,
              off: float, bn: int, X4, amax, q_ref, s_ref, b_ref):
    """Group-partial int8 contraction against ONE tensor's plane blocks:
    chunk dots, P-domain scales, bias.  X4 is the pre-expanded activation
    (array, or a VMEM scratch ref computed once at grid step 0 — the
    r5 hoist: quant+expansion ran once PER GRID STEP before); amax
    likewise array-or-ref.  Returns y [B, bn]."""
    e = depth // gs
    rows = B * e
    nch = K // depth
    affine = b_ref is not None
    need_s8 = affine or off
    ones = jnp.ones((depth, 1), jnp.int8) if need_s8 else None
    srow = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    s_in_b = srow % e
    b_of_r = srow // e
    acc = jnp.zeros((rows, bn), jnp.float32)
    for c in range(nch):
        w = _decode_cm(cm, pb,
                       _unpack_rows(q_ref, pb[0], pb[1], K, c * depth,
                                    depth))
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
    return acc.reshape(B, e, bn).sum(axis=1)


def _qp8_decode_kernel(K: int, depth: int, B: int, gs: int, pb: tuple,
                       cm: str, affine: bool, off: float, eps, act: str,
                       has_res: bool, hoist: bool,
                       x_ref, q_ref, s_ref, *rest):
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
    x4_s, amax_s = rest[-2], rest[-1]   # VMEM scratch (persist over grid)
    o_ref = rest[-3]
    bn = o_ref.shape[1]

    # r5 hoist: norm + butterfly quantization + expansion run ONCE (grid
    # step 0) into scratch instead of once per lane block — on the
    # gate-up shape at bn=4096 that's 7x fewer prologue/expansion passes
    # (hoist=False keeps the r4 per-step path for same-process A/Bs)
    if hoist:
        @pl.when(pl.program_id(0) == 0)
        def _prep():
            x8, amax = _qp8_prologue(K, B, eps, act, x_ref, wn_ref)
            x4_s[:] = _qp8_expand(K, depth, B, gs, x8)
            amax_s[:] = amax

        X4, amax = x4_s, amax_s
    else:
        x8, amax = _qp8_prologue(K, B, eps, act, x_ref, wn_ref)
        X4 = _qp8_expand(K, depth, B, gs, x8)
    y = _qp8_body(K, depth, B, gs, pb, cm, off, bn, X4, amax, q_ref,
                  s_ref, b_ref)
    if res_ref is not None:
        y = y + res_ref[:].astype(jnp.float32)
    if B < o_ref.shape[0]:
        y = jnp.pad(y, ((0, o_ref.shape[0] - B), (0, 0)))
    o_ref[:] = y


def _qp8_dual_kernel(K: int, B: int, nba: int,
                     depth_a: int, gs_a: int, pb_a: tuple, cm_a: str,
                     affine_a: bool, off_a: float,
                     depth_b: int, gs_b: int, pb_b: tuple, cm_b: str,
                     affine_b: bool, off_b: float, eps,
                     x_ref, qa_ref, sa_ref, qb_ref, sb_ref, *rest):
    """TWO t-layout projections of the SAME activation in ONE launch
    (mixed-type fused-QKV decode: Q4_K wqk + Q6_K wv under Q4_K_M).  The
    norm + butterfly activation quantization run once per block; grid
    blocks [0, nba) write tensor A's lanes, the rest tensor B's."""
    i = 0
    ba_ref = bb_ref = wn_ref = None
    if affine_a:
        ba_ref = rest[i]
        i += 1
    if affine_b:
        bb_ref = rest[i]
        i += 1
    if eps is not None:
        wn_ref = rest[i]
        i += 1
    x8_s, amax_s = rest[-2], rest[-1]   # VMEM scratch (persist over grid)
    o_ref = rest[-3]
    bn = o_ref.shape[1]
    gi = pl.program_id(0)

    # norm + butterfly quantization hoisted to grid step 0 (the two
    # tensors' (gs, depth) geometries differ, so expansion stays per
    # body — it starts from the shared int8 row)
    @pl.when(gi == 0)
    def _prep():
        x8, amax = _qp8_prologue(K, B, eps, "", x_ref, wn_ref)
        x8_s[:] = x8.astype(jnp.int8)
        amax_s[:] = amax

    @pl.when(gi < nba)
    def _a():
        X4 = _qp8_expand(K, depth_a, B, gs_a, x8_s[:].astype(jnp.int32))
        y = _qp8_body(K, depth_a, B, gs_a, pb_a, cm_a, off_a, bn, X4,
                      amax_s, qa_ref, sa_ref, ba_ref)
        if B < o_ref.shape[0]:
            y = jnp.pad(y, ((0, o_ref.shape[0] - B), (0, 0)))
        o_ref[:] = y

    @pl.when(gi >= nba)
    def _b():
        X4 = _qp8_expand(K, depth_b, B, gs_b, x8_s[:].astype(jnp.int32))
        y = _qp8_body(K, depth_b, B, gs_b, pb_b, cm_b, off_b, bn, X4,
                      amax_s, qb_ref, sb_ref, bb_ref)
        if B < o_ref.shape[0]:
            y = jnp.pad(y, ((0, o_ref.shape[0] - B), (0, 0)))
        o_ref[:] = y


def _tpf_kernel(K: int, depth: int, gs: int, pb: tuple, cm: str,
                affine: bool, off: float, x_ref, q_ref, s_ref, *rest):
    """Transposed-plane prefill GEMM: per-chunk sublane scale expansion,
    canonical bf16 dots (exact production semantics)."""
    b_ref = rest[0] if affine else None
    o_ref = rest[-1]
    bn = o_ref.shape[1]
    B = x_ref.shape[0]
    e = depth // gs
    nch = K // depth
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
        w = _decode_cm(cm, pb,
                       _unpack_rows(q_ref, pb[0], pb[1], K, c * depth,
                                    depth))
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


def _pick_bn_t(n2: int, K: int, pb: tuple, B: int) -> int:
    """Lane-block size: weight block (+ double buffer) must fit VMEM.
    GHT_QP8_BN overrides the candidate list for ablations."""
    import os

    env = os.environ.get("GHT_QP8_BN")
    per_col = K * (pb[0] + pb[1]) // 8
    # decode: bn=4096 measured 98.3us vs 2048's 136.3 on the gate-up
    # shape (same process, tools/qp8_sweep.py r4); the 8 MB cap keeps
    # wide-K shapes on smaller blocks.  Prefill measured best at 2048
    # (d=1024, 197.7 TFLOP/s) — keep its list unchanged.
    cands = ((4096, 2048, 1024, 512, 256) if B <= QP8_MAX_DECODE
             else (2048, 1024, 512, 256))
    for bn in (int(env),) if env else cands:
        if n2 % bn:
            continue
        if env:
            return bn
        # measured on-chip (tools/qp8_sweep.py, production entries, one
        # process): the K=4096 gate-up shape runs best at an 8 MB-class
        # weight block (bn=2048, 100.3us), while K=14336 ffn_down
        # collapses there (71.8us at bn=2048 vs 50.0 at 1024 = 7.3 MB
        # block) — cap the per-step weight block at 8 MB
        if bn * per_col <= 8 * 1024 * 1024:
            return bn
    return 256


def _hoist_enabled() -> bool:
    import os

    return os.environ.get("GHT_QP8_HOIST", "1") not in ("", "0")


@functools.partial(jax.jit, static_argnames=(
    "pb", "cm", "G", "bn", "depth", "gs", "eps", "interpret", "act",
    "off", "decode", "hoist"))
def _qp8_call(x, fq, fs, fb=None, wn=None, res=None, *, pb: tuple,
              cm: str = "", G: int, bn: int, depth: int, gs: int,
              eps=None, interpret: bool = False, act: str = "",
              off: float = 0.0, decode: bool = True, hoist: bool = True):
    B, K = x.shape
    if act:
        K = K // 2
    n2 = fq.shape[1]
    rowsdim = fq.shape[0]
    scratch = None
    if decode:
        kern = functools.partial(
            _qp8_decode_kernel, K, depth, B, gs, pb, cm, fb is not None,
            off, eps, act, res is not None, hoist)
        B8 = max(8, B)
        e = depth // gs
        rows = (B * e) if B > 1 else e
        # prologue/expansion scratch, written once at grid step 0
        scratch = [pltpu.VMEM((rows, K), jnp.int8),
                   pltpu.VMEM((B, K), jnp.float32)]
    else:
        assert not act and eps is None and res is None
        kern = functools.partial(
            _tpf_kernel, K, depth, gs, pb, cm, fb is not None, off)
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
        scratch_shapes=scratch or [],
        compiler_params=pltpu.CompilerParams(
            # decode: scratch written at step 0, read by later steps —
            # the grid must run in order
            dimension_semantics=(("arbitrary",) if scratch
                                 else ("parallel",)),
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
    pb = _pack_bits(cfg)
    dch = pick_depth(cfg, K)
    vT = jnp.concatenate(
        [_decode_cm(cfg.code_map, pb,
                    _unpack_rows(qt.fq, pb[0], pb[1], K, r0, dch))
         .astype(jnp.int32) for r0 in range(0, K, dch)], axis=0)
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


#: trace-time launch counter (see ops/qmm_fast.KERNEL_TRACES)
KERNEL_TRACES = 0


def _count_trace():
    global KERNEL_TRACES
    KERNEL_TRACES += 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _qp8_core(x, planes, cfg, n, k, interpret, depth, gs):
    _count_trace()
    fq, fs, fb = planes
    B, K = x.shape
    G = K // gs
    pb = _pack_bits(cfg)
    bn = _pick_bn_t(fq.shape[1], K, pb, B)
    decode = _decode_ok(B)
    off = _offset_bias_t(cfg, fb)
    xin = (x.astype(jnp.float32) if decode else x.astype(jnp.bfloat16))
    y = _qp8_call(xin, fq, fs, fb, pb=pb, cm=cfg.code_map, G=G, bn=bn,
                  depth=depth, gs=gs, interpret=interpret, off=off,
                  decode=decode, hoist=_hoist_enabled())
    # slice BOTH axes so the custom-vjp cotangent matches x's row count
    return y[:B, :n]


def _qp8_fwd(x, planes, cfg, n, k, interpret, depth, gs):
    return _qp8_core(x, planes, cfg, n, k, interpret, depth, gs), (x, planes)


def _qp8_bwd(cfg, n, k, interpret, depth, gs, resid, g):
    x, planes = resid
    fq, fs, fb = planes
    # straight-through through the activation quant; dx = g @ W^T from the
    # dequantized transposed planes
    pb = _pack_bits(cfg)
    dch = pick_depth(cfg, k)
    vT = jnp.concatenate(
        [_decode_cm(cfg.code_map, pb,
                    _unpack_rows(fq, pb[0], pb[1], k, r0, dch))
         .astype(jnp.int32) for r0 in range(0, k, dch)], axis=0)
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
    depth = pick_depth(qt.cfg, K, prefill=not _decode_ok(B))
    y = _qp8_core(x2, (qt.fq, qt.fs, qt.fb), qt.cfg, qt.n, K,
                  interpret, depth, qt.cfg.gs)
    return y[:B].reshape(*lead, qt.n).astype(out_dtype)


def _qp8_infer(x2, qt: QTensor, wn=None, eps=None, act="", res=None,
               interpret=False):
    """Inference-only fused launch (no vjp): norm / act / residual."""
    _count_trace()
    cfg = qt.cfg
    K = qt.k if not act else qt.k
    B = x2.shape[0]
    G = qt.k // cfg.gs
    pb = _pack_bits(cfg)
    bn = _pick_bn_t(qt.fq.shape[1], qt.k, pb, B)
    depth = pick_depth(cfg, qt.k)
    off = _offset_bias_t(cfg, qt.fb)
    if res is not None:
        res = res.astype(jnp.float32)
        res = jnp.pad(res, ((0, 0), (0, qt.fq.shape[1] - res.shape[1])))
    y = _qp8_call(x2.astype(jnp.float32), qt.fq, qt.fs, qt.fb,
                  None if wn is None else jnp.asarray(wn, jnp.float32),
                  res, pb=pb, cm=cfg.code_map, G=G, bn=bn, depth=depth,
                  gs=cfg.gs,
                  eps=None if eps is None else float(eps),
                  interpret=interpret, act=act, off=off, decode=True,
                  hoist=_hoist_enabled())
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


# ---------------------------------------------------------------------------
# dual projection (mixed-type fused QKV decode)
# ---------------------------------------------------------------------------

def _dual_bn(qt_a: QTensor, qt_b: QTensor) -> int | None:
    """Common lane-block for one dual launch, or None.  Lane padding
    would land mid-output, so both plane widths must equal their n."""
    if qt_a.fq is None or qt_b.fq is None or qt_a.k != qt_b.k:
        return None
    if qt_a.fl != "t" or qt_b.fl != "t":
        return None
    if qt_a.fq.shape[1] != qt_a.n or qt_b.fq.shape[1] != qt_b.n:
        return None
    for bn in (1024, 512, 256):
        if qt_a.n % bn == 0 and qt_b.n % bn == 0:
            return bn
    return None


def supports_qp8_dual(qt_a, qt_b) -> bool:
    return (isinstance(qt_a, QTensor) and isinstance(qt_b, QTensor)
            and _dual_bn(qt_a, qt_b) is not None)


@functools.partial(jax.jit, static_argnames=(
    "pa", "pb_", "cma", "cmb", "Ga", "Gb", "bn", "da", "db", "gsa",
    "gsb", "eps", "interpret", "off_a", "off_b"))
def _qp8_dual_call(x, fqa, fsa, fqb, fsb, fba=None, fbb=None, wn=None, *,
                   pa, pb_, cma="", cmb="", Ga, Gb, bn, da, db, gsa, gsb,
                   eps=None, interpret=False, off_a=0.0, off_b=0.0):
    B, K = x.shape
    na2, nb2 = fqa.shape[1], fqb.shape[1]
    nba = na2 // bn
    nbb = nb2 // bn
    kern = functools.partial(
        _qp8_dual_kernel, K, B, nba,
        da, gsa, pa, cma, fba is not None, off_a,
        db, gsb, pb_, cmb, fbb is not None, off_b, eps)

    def ia(i):
        return jnp.minimum(i, nba - 1)

    def ib(i):
        return jnp.clip(i - nba, 0, nbb - 1)

    in_specs = [
        pl.BlockSpec((B, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((fqa.shape[0], bn), lambda i: (0, ia(i)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Ga, bn), lambda i: (0, ia(i)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((fqb.shape[0], bn), lambda i: (0, ib(i)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Gb, bn), lambda i: (0, ib(i)),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, fqa, fsa, fqb, fsb]
    if fba is not None:
        in_specs.append(pl.BlockSpec((Ga, bn), lambda i: (0, ia(i)),
                                     memory_space=pltpu.VMEM))
        args.append(fba)
    if fbb is not None:
        in_specs.append(pl.BlockSpec((Gb, bn), lambda i: (0, ib(i)),
                                     memory_space=pltpu.VMEM))
        args.append(fbb)
    if wn is not None:
        in_specs.append(pl.BlockSpec((1, K), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(wn.reshape(1, K))
    B8 = max(8, B)
    return pl.pallas_call(
        kern,
        grid=(nba + nbb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B8, bn), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B8, na2 + nb2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, K), jnp.int8),
                        pltpu.VMEM((B, K), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * (na2 + nb2),
            bytes_accessed=int(np.prod(fqa.shape))
            + int(np.prod(fqb.shape)),
            transcendentals=0),
        interpret=interpret,
    )(*args)


def qp8_matmul_dual(x, qt_a: QTensor, qt_b: QTensor, wn=None, eps=None,
                    out_dtype=jnp.float32, interpret=False):
    """Two t-layout projections of the same activation in one launch,
    outputs row-concatenated [x @ A' ++ x @ B'] — the qp8 twin of
    qmm_fast.qmatmul_fast_dual (one dispatch for the mixed-type QKV
    decode; the shared RMS-norm and activation quantization run once).
    wn is the RAW norm weight (no interleave on this layout)."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    assert K == qt_a.k == qt_b.k
    bn = _dual_bn(qt_a, qt_b)
    assert bn is not None
    B = int(np.prod(lead)) if lead else 1
    assert _decode_ok(B)
    x2 = x.reshape(B, K)
    y = _qp8_dual_call(
        x2.astype(jnp.float32), qt_a.fq, qt_a.fs, qt_b.fq, qt_b.fs,
        qt_a.fb, qt_b.fb,
        None if wn is None else jnp.asarray(wn, jnp.float32),
        pa=_pack_bits(qt_a.cfg), pb_=_pack_bits(qt_b.cfg),
        cma=qt_a.cfg.code_map, cmb=qt_b.cfg.code_map,
        Ga=K // qt_a.cfg.gs, Gb=K // qt_b.cfg.gs, bn=bn,
        da=pick_depth(qt_a.cfg, K), db=pick_depth(qt_b.cfg, K),
        gsa=qt_a.cfg.gs, gsb=qt_b.cfg.gs,
        eps=None if eps is None else float(eps), interpret=interpret,
        off_a=_offset_bias_t(qt_a.cfg, qt_a.fb),
        off_b=_offset_bias_t(qt_b.cfg, qt_b.fb))
    return y[:B].reshape(*lead, qt_a.n + qt_b.n).astype(out_dtype)


# ---------------------------------------------------------------------------
# gathered-expert (MUL_MAT_ID) path
# ---------------------------------------------------------------------------

def _qp8_indirect_kernel(K: int, depth: int, gs: int, pb: tuple, cm: str,
                         affine: bool, off: float,
                         ids_ref, x_ref, q_ref, s_ref, *rest):
    """One grid step = (input row p, expert-lane block j): the scalar-
    prefetched ids drive the weight-plane lane-index maps, so only the
    SELECTED experts' lanes ever stream from HBM (MUL_MAT_ID,
    ggml.h:1135).  x_ref selects row p via its own index map; the
    butterfly activation quant runs per block (B=1 cost, trivial)."""
    b_ref = rest[0] if affine else None
    o_ref = rest[-1]
    bn = o_ref.shape[1]
    # the x block is a full 8-row sublane tile of COPIES of input row p
    # (a (1, K) block over a [P, K] array is not expressible for P > 1 —
    # Mosaic requires the second-minor block dim to divide 8 or equal the
    # array dim); quantize on the tile, keep row 0
    x8, amax = _qp8_prologue(K, 1, None, "", x_ref, None)
    x8, amax = x8[:1], amax[:1]
    X4 = _qp8_expand(K, depth, 1, gs, x8)
    y = _qp8_body(K, depth, 1, gs, pb, cm, off, bn, X4, amax, q_ref,
                  s_ref, b_ref)
    o_ref[:] = jnp.broadcast_to(y, (o_ref.shape[0], bn))


@functools.partial(jax.jit, static_argnames=(
    "pb", "cm", "G", "bn", "npe", "depth", "gs", "interpret", "off"))
def _qp8_indirect_call(ids, x, fq, fs, fb=None, *, pb, cm, G, bn, npe,
                       depth, gs, interpret=False, off=0.0):
    P, K = x.shape
    nb = npe // bn
    kern = functools.partial(_qp8_indirect_kernel, K, depth, gs, pb, cm,
                             fb is not None, off)
    # 8 sublane copies of each input row so every grid step reads a full
    # (8, K) tile (see _qp8_indirect_kernel; a (1, K) block over [P, K]
    # only lowers when P == 1)
    x = jnp.broadcast_to(x[:, None, :], (P, 8, K)).reshape(P * 8, K)
    wmap = lambda p, j, ids_ref: (0, ids_ref[p] * nb + j)
    in_specs = [
        pl.BlockSpec((8, K), lambda p, j, ids_ref: (p, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((fq.shape[0], bn), wmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((G, bn), wmap, memory_space=pltpu.VMEM),
    ]
    args = [x, fq, fs]
    if fb is not None:
        in_specs.append(pl.BlockSpec((G, bn), wmap,
                                     memory_space=pltpu.VMEM))
        args.append(fb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, bn), lambda p, j, ids_ref: (p, j),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P * 8, npe), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * P * K * npe,
            bytes_accessed=P * npe * fq.shape[0] // bn,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(ids, jnp.int32), *args)


def supports_qp8_indirect(qt, npe: int) -> bool:
    """Stacked [E*npe, k] expert planes can serve the gathered path when
    a lane block divides the per-expert width and no lane padding exists
    (expert boundaries must align with plane lanes)."""
    if not isinstance(qt, QTensor) or qt.fq is None or qt.fl != "t":
        return False
    if npe <= 0 or qt.fq.shape[1] != qt.n or qt.n % npe:
        return False
    return any(npe % b == 0 for b in (1024, 512, 256, 128))


def qp8_matmul_indirect(x, qt: QTensor, ids, npe: int,
                        out_dtype=jnp.float32, interpret=False):
    """y[p] = x[p] @ dequant(W_{ids[p]}).T over stacked expert planes —
    the qp8 twin of qmm_fast.qmatmul_fast_indirect (decode cost scales
    with n_expert_used, not n_expert)."""
    P, K = x.shape
    assert K == qt.k and qt.fq is not None
    cfg = qt.cfg
    bn = next(b for b in (1024, 512, 256, 128) if npe % b == 0)
    y = _qp8_indirect_call(
        ids, x.astype(jnp.float32), qt.fq, qt.fs, qt.fb,
        pb=_pack_bits(cfg), cm=cfg.code_map, G=K // cfg.gs, bn=bn,
        npe=npe, depth=pick_depth(cfg, K), gs=cfg.gs,
        interpret=interpret, off=_offset_bias_t(cfg, qt.fb))
    return y.reshape(P, 8, npe)[:, 0, :].astype(out_dtype)
