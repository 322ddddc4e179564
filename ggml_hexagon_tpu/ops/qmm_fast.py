"""Speed-of-light quantized GEMV/GEMM Pallas kernels (decode hot path).

Measured on the target chip (v5e, honest data-closed timings): the XLA
fused-dequant path materializes dequantized intermediates in HBM for wide
shapes and lands at 29-136 GB/s effective; an unscaled nibble-unpack dot
(tools/kernel_lab.py v6) streams ~1.0 TB/s — the chip's real DMA floor.
The production kernels land at ~460-550 GB/s for 4-bit and ~425-640 GB/s
for byte formats; the gap to the DMA floor is the per-weight scale
multiply, which is VPU-throughput-bound (~2 bf16 ops/lane/cycle — measured
by ablation: removing the multiplies alone reaches the floor, and every
restructuring tried — slice-mult, single wide dot, bitcast hi-extract —
was slower).  Three ideas make the kernels fast:

1. **Interleaved column layout.**  Mosaic cannot lower an element-repeat
   ([N, G] group scales -> [N, K]), but `pltpu.repeat` (a lane-tile) is
   native.  We therefore store weight columns interleaved —
   new column j holds original column (j % G)*gs + j//G — so the scale for
   column j is exactly scales[j % G], i.e. a tile.  The activation picks up
   a cheap XLA transpose (x.reshape(B, G, gs).swapaxes(1, 2)).

2. **Split lo/hi dots.**  4-bit planes keep the wire density (0.5 B per
   weight): byte b of the packed plane holds new-columns b (low nibble)
   and b + K/2 (high nibble); the two halves go through two MXU dots
   instead of a lane-concat copy.

3. **Group bias via group-sums.**  Affine formats (offsets / mins) never
   expand the bias: y += group_bias @ group_sums(x) — a [B,G]x[G,N] side
   dot of negligible size.

The layout transform happens once at load time (build_fast_planes) from the
wire planes; the dequant semantics match ops/qmatmul._dequant_expr (the
gguf-py-differential oracle).  Reference analog: the Hexagon fork's VTCM
tiling + HVX dequant-dot kernels (ggml-hexagon/kernels/ggml-dsp.c:1192) —
same structure: packed weights stream HBM->VMEM, dequantize on the fly into
the MXU, dequantized weights never exist in HBM.
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

#: max rows of the weight block resident in VMEM per grid step
_BN = 512
#: fast path serves decode AND prefill (K-blocked accumulation); batches
#: above this fall back to XLA
MAX_FAST_BATCH = 512


def _is_nibble(cfg: QConfig) -> bool:
    return (cfg.bits_lo == 4 and cfg.bits_hi == 0 and not cfg.signed
            and not cfg.lut and not cfg.expand)


def decode_codes(cm: str, n):
    """Coded-nibble -> integer weight value (works for jnp AND numpy).

    n holds stored nibbles: bit3 = sign, bits0-2 = magnitude code (except
    'tern': 2-bit value-1).  Alphabets per quant/pack.py QConfig.code_map;
    all maps are branchless arithmetic/select — no gather ever.
    """
    xp = np if isinstance(n, np.ndarray) else jnp
    if cm == "tern":
        return n - 1
    s_ = n >> 3
    c = n & 7
    if cm == "iq2":      # {0, 8, 25, 43}
        mag = xp.where(c < 2, 8 * c, xp.where(c == 2, 25, 43))
    elif cm == "iq3xxs":  # 4+8c, with 60 -> 62
        mag = 4 + 8 * c + 2 * ((c + 1) >> 3)
    elif cm == "iq3s":   # 2c+1
        mag = 2 * c + 1
    elif cm == "iq1":    # {0, 1, 7, 9}
        mag = xp.where(c < 2, c, xp.where(c == 2, 7, 9))
    else:
        raise ValueError(cm)
    return (1 - 2 * s_) * mag


_CODE_ALPHABETS = {
    "iq2": [0, 8, 25, 43],
    "iq3xxs": [4, 12, 20, 28, 36, 44, 52, 62],
    "iq3s": [1, 3, 5, 7, 9, 11, 13, 15],
    "iq1": [0, 1, 7, 9],
}


def encode_codes_np(cm: str, v: np.ndarray) -> np.ndarray:
    """Inverse of decode_codes for load-time repacking (int8 values ->
    stored nibbles); raises on out-of-alphabet values."""
    if cm == "tern":
        assert v.min() >= -1 and v.max() <= 2, (v.min(), v.max())
        return (v + 1).astype(np.uint8)
    mags = np.asarray(_CODE_ALPHABETS[cm])
    lut = np.full(256, -1, np.int16)
    for c, m in enumerate(mags):
        lut[m] = c
    a = np.abs(v.astype(np.int16))
    c = lut[a]
    if 0 not in mags:
        # zero rows only come from n->n_pad padding (the wire alphabet has
        # no zero); their decode garbage is sliced away everywhere
        c = np.where((a == 0) & (c < 0), 0, c)
    assert (c >= 0).all(), f"{cm}: values outside alphabet {mags}"
    sign = (v < 0).astype(np.uint8)
    out = (sign << 3) | c.astype(np.uint8)
    # negative zero normalizes to +0 (decode(-0 code) == 0 anyway for the
    # zero-capable alphabets, but keep the canonical form)
    out[(a == 0) & (np.isin(a, mags))] &= 7
    return out


def supports_fast(cfg: QConfig, k: int) -> bool:
    G = k // cfg.gs
    if G < 1 or k % cfg.gs:
        return False
    packed = _is_nibble(cfg) or bool(cfg.code_map)
    if packed and ((k // 2) % G or (k // 2) < G):
        return False
    if not packed and k % G:
        return False
    # lanes: the scale tile needs G (and K) to be lane-splittable
    return G % 128 == 0 or G in (8, 16, 32, 64) or k % 128 == 0


def _interleave_perm(k: int, gs: int) -> np.ndarray:
    """new column j <- original column (j % G)*gs + j//G."""
    G = k // gs
    j = np.arange(k)
    return (j % G) * gs + j // G


def _int_values(qt: QTensor):
    """Wire planes -> integer values [n_pad, K] (the q of w = q*s + b),
    matching ops/qmatmul._dequant_expr's integer stage exactly."""
    from .qmatmul import _unpack_plane

    cfg = qt.cfg
    if cfg.signed:
        return qt.q.astype(jnp.int32)
    q = _unpack_plane(qt.q, cfg.bits_lo)
    if cfg.bits_hi:
        q = q + (_unpack_plane(qt.qh, cfg.bits_hi) << cfg.bits_lo)
    if cfg.lut:
        from ..quant.iquants import KVALUES_IQ4NL

        q = jnp.take(jnp.asarray(KVALUES_IQ4NL, jnp.int32), q)
    return q


def _group_scale_bias(qt: QTensor):
    """(scale_g, bias_g|None) per gs-group, f32 [n_pad, K/gs] — the exact
    affine decomposition used by _dequant_expr."""
    cfg = qt.cfg
    if cfg.superblock:
        scale_g = (jnp.repeat(qt.d, 256 // cfg.gs, axis=1)
                   * qt.sc.astype(jnp.float32))
    else:
        scale_g = jnp.asarray(qt.d, jnp.float32)
    bias_g = None
    if cfg.asym == "minsb":
        bias_g = (-jnp.repeat(qt.dmin, 256 // cfg.gs, axis=1)
                  * qt.m.astype(jnp.float32))
    elif cfg.asym == "min":
        bias_g = jnp.asarray(qt.m, jnp.float32)
    elif cfg.offset:
        bias_g = float(cfg.offset) * scale_g
    return scale_g, bias_g


def build_fast_planes(qt: QTensor):
    """-> (fq, fs, fb) arrays, or (None,)*3 when unsupported.

    fq: interleaved values — packed u8 [n2, K/2] (4-bit family) or
        i8 [n2, K] (byte family); rows zero-padded to a _BN multiple.
    fs: f32 [n2, G] per-group scales;  fb: f32 [n2, G] bias or None.

    Host (numpy) wire planes build entirely on the host — no per-op device
    compiles through the remote-compile tunnel, no transient HBM.
    """
    cfg = qt.cfg
    K = qt.k
    if not supports_fast(cfg, K):
        return None, None, None
    on_host = isinstance(qt.q, np.ndarray)
    xp = np if on_host else jnp
    v = _int_values_np(qt) if on_host else _int_values(qt)
    scale_g, bias_g = (_group_scale_bias_np(qt) if on_host
                       else _group_scale_bias(qt))
    # the interleave permutation IS a [G, gs] transpose — express it that
    # way (a column gather lowers catastrophically on TPU)
    G = K // cfg.gs
    rows = v.shape[0]
    v = v.reshape(rows, G, cfg.gs)
    v = (v.transpose(0, 2, 1) if on_host
         else v.transpose((0, 2, 1))).reshape(rows, K)
    if cfg.code_map:
        # coded-nibble repack: int8 alphabet values -> 4-bit sign+mag codes
        # (decoded arithmetically in-kernel; halves i-quant HBM vs int8)
        c = encode_codes_np(cfg.code_map, np.asarray(v))
        fq = (c[:, : K // 2] | (c[:, K // 2:] << 4)).astype(np.uint8)
        if not on_host:
            fq = jnp.asarray(fq)
    elif _is_nibble(cfg):
        fq = (v[:, : K // 2] | (v[:, K // 2:] << 4)).astype(
            np.uint8 if on_host else jnp.uint8)
    else:
        fq = v.astype(np.int8 if on_host else jnp.int8)
    if cfg.offset and cfg.asym == "none":
        # symmetric-offset formats (Q4_0/Q5_0/Q3_K/Q6_K): the bias plane is
        # offset * scale — derivable from fs in-kernel (one scalar multiply
        # on the group-sum side dot), so don't stream a second plane.
        # Q6_K: 1.25 -> 1.125 B/weight of decode HBM traffic.
        bias_g = None
    n_pad = fq.shape[0]
    # large tensors (lm_head class) pad to 2048-row multiples so the
    # decode byte route can use its measured-best bn=2048 blocking (the
    # 128512-row head at bn=512 runs ~745 GB/s vs ~890 at 2048); the
    # extra zero rows are <0.5% HBM
    quantum = 2048 if n_pad >= 65536 else _BN
    n2 = -(-n_pad // quantum) * quantum
    if n2 != n_pad:
        padr = ((0, n2 - n_pad), (0, 0))
        fq = xp.pad(fq, padr)
        scale_g = xp.pad(scale_g, padr)
        bias_g = None if bias_g is None else xp.pad(bias_g, padr)
    # group planes ride HBM in bf16: the f32 planes are 2 of 6 bits/weight
    # at gs=32 and the rounding (~0.4% rel) sits well below the quant error
    # (mul_mat NMSE budget 5e-4; measured ~2e-5)
    import ml_dtypes

    bf16 = ml_dtypes.bfloat16 if on_host else jnp.bfloat16
    scale_g = scale_g.astype(bf16)
    bias_g = None if bias_g is None else bias_g.astype(bf16)
    return fq, scale_g, bias_g


def _int_values_np(qt: QTensor) -> np.ndarray:
    """numpy twin of _int_values (host-side fast-plane building)."""
    cfg = qt.cfg

    def unpack(plane, bits):
        per = 8 // bits
        mask = (1 << bits) - 1
        p = np.asarray(plane).astype(np.int32)
        parts = [(p >> (bits * s)) & mask for s in range(per)]
        return parts[0] if per == 1 else np.concatenate(parts, axis=1)

    if cfg.signed:
        return np.asarray(qt.q).astype(np.int32)
    q = unpack(qt.q, cfg.bits_lo)
    if cfg.bits_hi:
        q = q + (unpack(qt.qh, cfg.bits_hi) << cfg.bits_lo)
    if cfg.lut:
        from ..quant.iquants import KVALUES_IQ4NL

        q = np.asarray(KVALUES_IQ4NL, np.int32)[q]
    return q


def _group_scale_bias_np(qt: QTensor):
    cfg = qt.cfg
    d = np.asarray(qt.d, np.float32)
    if cfg.superblock:
        scale_g = (np.repeat(d, 256 // cfg.gs, axis=1)
                   * np.asarray(qt.sc).astype(np.float32))
    else:
        scale_g = d
    bias_g = None
    if cfg.asym == "minsb":
        bias_g = (-np.repeat(np.asarray(qt.dmin, np.float32),
                             256 // cfg.gs, axis=1)
                  * np.asarray(qt.m).astype(np.float32))
    elif cfg.asym == "min":
        bias_g = np.asarray(qt.m, np.float32)
    elif cfg.offset:
        bias_g = np.float32(cfg.offset) * scale_g
    return scale_g, bias_g


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _offset_bias(cfg: QConfig, fb) -> float:
    """Non-zero when the group bias is offset*scale and no fb plane is
    stored (build_fast_planes drops it for symmetric-offset formats — the
    kernel derives the bias from the scale plane it already streams)."""
    return float(cfg.offset) if (fb is None and cfg.offset) else 0.0


def _needs_xg(cfg: QConfig, fb) -> bool:
    return fb is not None or bool(_offset_bias(cfg, fb))


def _store(nkj: int, o_ref, y, y_once=None):
    """Accumulating store over the K-split axis; y_once (the fused bias
    term + residual, already full-K quantities) is added exactly once,
    at j == 0."""
    if nkj == 1:
        o_ref[:] = y if y_once is None else y + y_once
    else:
        @pl.when(pl.program_id(1) == 0)
        def _init():
            o_ref[:] = y if y_once is None else y + y_once

        @pl.when(pl.program_id(1) > 0)
        def _acc():
            o_ref[:] += y


def _apply_act(act: str, x):
    """Gated-FFN activation on the gate half, f32 in/out (ggml LLM_FFN_*)."""
    if act == "gelu":
        return 0.5 * x * (1.0 + jnp.tanh(0.7978845608028654
                                         * (x + 0.044715 * x * x * x)))
    if act == "relu":
        return jnp.maximum(x, 0.0)
    return x * jax.lax.logistic(x)  # silu


def _bias_term(xg, b_ref, inv):
    """Affine-format group bias, fused in-kernel: the bias contribution is
    sum_c x[:,c] * fb[n, g(c)] = (group-sums of x) @ fb^T — a [B,G]x[bn,G]
    side dot of negligible MXU cost.  xg is an ARRAY: either the tiny
    side input (xg_mode 1, pre-norm sums rescaled by `inv`) or computed
    in-kernel (mode 2) from the effective activation."""
    if inv is not None:
        xg = xg * inv
    return jax.lax.dot_general(
        xg, b_ref[:].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _normed_x(x_ref, w_ref, eps: float):
    """Fused RMS-norm of the (interleaved) activation, in f32.

    The rms reduction is permutation-invariant, so normalizing AFTER the
    interleave is exact; w_ref is the norm weight pre-interleaved to the
    same layout (models/fuse.py attach_norm_planes).  Only valid when the
    kernel sees the full K (nkj == 1) — the caller guarantees that.
    Returns (normed bf16 x, the [B,1] rsqrt factor)."""
    xf = x_ref[:].astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=1, keepdims=True) + eps)
    return (xf * inv * w_ref[:].astype(jnp.float32)).astype(jnp.bfloat16), inv


def _split_refs(eps, has_xg, has_fb, has_res, rest):
    """inputs after (x, q, s): [xg] when a group-sum side INPUT rides in
    (xg_mode 1 — in-kernel computation, mode 2, takes no input), [fb]
    when a stored bias plane exists, [wn] if normed, [res] if
    residual-fused, out."""
    i = 0
    xg_ref = b_ref = w_ref = res_ref = None
    if has_xg:
        xg_ref = rest[i]
        i += 1
    if has_fb:
        b_ref = rest[i]
        i += 1
    if eps is not None:
        w_ref = rest[i]
        i += 1
    if has_res:
        res_ref = rest[i]
    return xg_ref, b_ref, w_ref, res_ref, rest[-1]


def _kernel_x(act: str, eps, x_ref, w_ref):
    """The kernel's effective activation: raw block, fused RMS-norm, or the
    fused act-mul over a doubled (gate ++ up, both pre-interleaved) input.
    Returns (bf16 x, rsqrt factor or None)."""
    if act:
        xw = x_ref[:].astype(jnp.float32)
        half2 = xw.shape[1] // 2
        return (_apply_act(act, xw[:, :half2])
                * xw[:, half2:]).astype(jnp.bfloat16), None
    if w_ref is not None:
        return _normed_x(x_ref, w_ref, eps)
    return x_ref[:], None


def _kernel_xg(xg_mode, gs, x, xg_ref):
    """Group sums for the bias side-dot: mode 1 reads the tiny side
    input; mode 2 computes them IN-KERNEL from the (interleaved,
    post-norm/act) activation — a lane-aligned [B, gs, G] reduce, valid
    when G % 128 == 0 — which removes one XLA dispatch per decode matmul
    (the per-layer tail ops the composition couldn't attribute)."""
    if xg_mode == 2:
        B2, K2 = x.shape
        G2 = K2 // gs
        return jnp.sum(x.astype(jnp.float32).reshape(B2, gs, G2), axis=1)
    return None if xg_ref is None else xg_ref[:].astype(jnp.float32)


def _epilogue(nkj, o_ref, y, xg, b_ref, off, s_ref, res_ref, inv):
    once = None
    if xg is not None:
        bt = _bias_term(xg, b_ref if b_ref is not None else s_ref, inv)
        once = off * bt if b_ref is None else bt
    if res_ref is not None:
        r = res_ref[:].astype(jnp.float32)
        once = r if once is None else once + r
    _store(nkj, o_ref, y, once)


def _n_slices(cols: int, G: int, bn: int, per_col: int = 12) -> int:
    """Decode packed blocks in sequential column slices sized so the
    unpack/cast/mult intermediates stay ~<=25 MB — past that Mosaic
    spills and the kernel collapses (measured r3: the K=14336 ffn_down
    block at bn=512 runs 3.7x faster split in two; the B=512 prefill
    gate-up shape at bn=2048 runs 2.3x faster split in two, while
    bn=1024 prefers unsliced — all consistent with this budget).  Slices
    stay scale-tile-period-aligned (csl % G == 0)."""
    budget = 25 * 1024 * 1024
    target = max(512, budget // (per_col * bn))
    if cols <= target:
        return 1
    for n in (2, 4, 7, 8, 14, 16, 28, 32, 56):
        if cols % n == 0 and cols // n <= target and (cols // n) % G == 0:
            return n
    return 1


def _nibble_y(cm: str, reps: int, x, pu_ref, s_ref):
    """Split lo/hi scaled MXU dots over a packed-nibble block, processed
    in sequential column slices (see _n_slices)."""
    cols = pu_ref.shape[1]
    G = s_ref.shape[1]
    nsl = _n_slices(cols, G, pu_ref.shape[0])
    csl = cols // nsl
    half = x.shape[1] // 2
    acc = None
    for s in range(nsl):
        pu = pu_ref[:, s * csl:(s + 1) * csl]
        if cm:  # coded i-quant nibbles: arithmetic codebook decode
            lo = decode_codes(cm, (pu & 15).astype(jnp.int32)).astype(
                jnp.bfloat16)
            hi = decode_codes(cm, pu.astype(jnp.int32) >> 4).astype(
                jnp.bfloat16)
        else:
            # lo nibble stays in the 8-bit domain (u8 & mask is the one
            # sub-32-bit op Mosaic lowers): ~25% faster than the i32 route
            lo = (pu & 15).astype(jnp.int8).astype(jnp.bfloat16)
            hi = (pu.astype(jnp.int32) >> 4).astype(jnp.bfloat16)  # p<256
        sc = pltpu.repeat(s_ref[:], csl // G, axis=1).astype(jnp.bfloat16)
        xl = x[:, s * csl:(s + 1) * csl]
        xh = x[:, half + s * csl:half + (s + 1) * csl]
        y = (jax.lax.dot_general(xl, lo * sc, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
             + jax.lax.dot_general(xh, hi * sc, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32))
        acc = y if acc is None else acc + y
    return acc


def _byte_y(reps: int, x, q_ref, s_ref):
    cols = q_ref.shape[1]
    G = s_ref.shape[1]
    # very wide byte blocks (Q6_K ffn_down class) slice like the nibble
    # kernel (see _n_slices); moderate widths measured best unsliced
    nsl = _n_slices(cols, G, q_ref.shape[0], 8) if cols > 8192 else 1
    csl = cols // nsl
    decode = x.shape[0] <= 8
    acc = None
    for sl in range(nsl):
        q = q_ref[:, sl * csl:(sl + 1) * csl]
        xs = x[:, sl * csl:(sl + 1) * csl]
        if decode:
            # decode GEMV: the f32 route measures 890 GB/s vs bf16's 669
            # on the 28672x4096 Q6_K-class shape at bn=2048
            # (tools/kernel_lab4.py r3); the f32 MXU rate is irrelevant
            # at B<=8.  Prefill keeps bf16 operands (8x MXU rate).
            w = q.astype(jnp.float32)
            sc = pltpu.repeat(s_ref[:], csl // G, axis=1).astype(
                jnp.float32)
            y = jax.lax.dot_general(
                xs.astype(jnp.float32), w * sc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            w = q.astype(jnp.bfloat16)
            sc = pltpu.repeat(s_ref[:], csl // G, axis=1).astype(
                jnp.bfloat16)
            y = jax.lax.dot_general(xs, w * sc, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    return acc


def _nibble_kernel(reps: int, nkj: int, eps, xg_mode: int, gs: int,
                   has_fb: bool, off: float, cm: str, act: str,
                   has_res: bool, x_ref, q_ref, s_ref, *rest):
    xg_ref, b_ref, w_ref, res_ref, o_ref = _split_refs(
        eps, xg_mode == 1, has_fb, has_res, rest)
    x, inv = _kernel_x(act, eps, x_ref, w_ref)
    xg = _kernel_xg(xg_mode, gs, x, xg_ref)
    if xg_mode == 2:
        inv = None  # mode-2 sums come from the post-norm activation
    y = _nibble_y(cm, reps, x, q_ref, s_ref)
    _epilogue(nkj, o_ref, y, xg, b_ref, off, s_ref, res_ref, inv)


def _byte_kernel(reps: int, nkj: int, eps, xg_mode: int, gs: int,
                 has_fb: bool, off: float, act: str, has_res: bool,
                 x_ref, q_ref, s_ref, *rest):
    xg_ref, b_ref, w_ref, res_ref, o_ref = _split_refs(
        eps, xg_mode == 1, has_fb, has_res, rest)
    x, inv = _kernel_x(act, eps, x_ref, w_ref)
    xg = _kernel_xg(xg_mode, gs, x, xg_ref)
    if xg_mode == 2:
        inv = None
    y = _byte_y(reps, x, q_ref, s_ref)
    _epilogue(nkj, o_ref, y, xg, b_ref, off, s_ref, res_ref, inv)


def _pick_blocks(B: int, K: int, nibble: bool, gs: int):
    """-> (bn, nkj): row block + K-split whose working set fits VMEM.

    GHT_QMM_BN / GHT_QMM_NKJ env vars override the decode branch for
    whole-model bench ablations (tools/shape_sweep.py's isolated numbers
    are invalid: XLA pins loop-invariant weights in VMEM when they fit).

    Budget: double-buffered x/q/scale blocks + output block + the kernel
    body's stack (int32 unpack intermediates, bf16 casts, scale tile —
    ~12 B/packed-col nibble, ~6 B/col byte).  Valid splits must divide
    gs/2 (nibble) / gs (byte) so the per-block scale tile stays period-G."""
    limit = 13 * 1024 * 1024
    G = K // gs
    pmax = gs // 2 if nibble else gs
    valid = [p for p in range(1, pmax + 1) if pmax % p == 0]
    if B <= 8:
        # decode GEMV sweet spot measured on-chip (tools/kernel_lab.py):
        # bn=1024 beats 2048 (485 vs 413 GB/s on the 28672x4096 gate-up
        # shape), and K-splits forfeit the fused-norm/act kernels (they
        # need the full K in one block) — so prefer nkj=1 at ANY K and
        # step bn down until the working set fits.  The budget is the
        # v5e's real VMEM (~128 MB; hardware-validated at 24+ MB of unpack
        # intermediates in round 1) — the conservative 13 MB general-loop
        # budget below serves prefill shapes.
        import os

        bn_env = os.environ.get("GHT_QMM_BN")
        nkj_env = os.environ.get("GHT_QMM_NKJ")
        if bn_env is not None and nkj_env is not None and int(nkj_env) in valid:
            return int(bn_env), int(nkj_env)
        per_col = 12 if nibble else 8  # unpack/cast intermediates (byte:
        # the f32 decode route, measured viable at bn=2048 K=4096)
        cand = (1024, 512, 256) if nibble else (2048, 1024, 512, 256)
        for bn in ((int(bn_env),) if bn_env else cand):
            cols = (K // 2) if nibble else K
            fixed = 2 * bn * G * 2 * 2 + B * bn * 4 + K * 4
            blk = (B * K * 2 + bn * cols) * 2
            if fixed + blk + per_col * bn * cols <= 96 * 1024 * 1024:
                return bn, 1
    # prefill-preferred pass: full-K blocks with LARGE row blocks — the
    # in-kernel column slicing (_n_slices) bounds the unpack intermediates,
    # so VMEM no longer forces K-splits (r3 lab, B=512 gate-up shape:
    # bn=2048+2 slices 454us vs the old bn=512 K-split 1057us; 57% -> 75%+
    # MFU class)
    import os as _os

    cols_full = (K // 2) if nibble else K
    per_col = 12 if nibble else 8
    skip_fullk = _os.environ.get("GHT_QMM_NO_PREFILL_FULLK") == "1"
    for bn in () if skip_fullk else (2048, 1024, 512):
        # mirror the kernels' actual slicing: _byte_y only slices when
        # cols > 8192, so byte formats at K <= 8192 materialize the FULL
        # cast/scale intermediates — budget them unsliced or the block is
        # accepted on a ~4x-understated scratch estimate (Mosaic spill)
        nsl = (_n_slices(cols_full, G, bn, per_col)
               if (nibble or cols_full > 8192) else 1)
        csl = cols_full // nsl
        if csl % G:
            continue
        blk = B * K * 2 + bn * cols_full * 2
        scratch = per_col * bn * csl
        fixed = 2 * bn * G * 2 * 2 + B * bn * 4
        if fixed + blk + scratch <= 96 * 1024 * 1024:
            return bn, 1
    for bn in (512, 256, 128):
        # scale + (possible) bias plane blocks, double-buffered, + out
        fixed = 2 * bn * G * 2 * 2 + B * bn * 4
        for p in valid:
            bk = K // p
            cols = bk // 2 if nibble else bk
            blk = (B * bk * 2 + bn * cols) * 2
            scratch = (12 if nibble else 6) * bn * cols
            if fixed + blk + scratch <= limit:
                return bn, p
    return 128, valid[-1]


@functools.partial(jax.jit, static_argnames=("nibble", "G", "nkj", "bn",
                                             "eps", "interpret", "cm", "act",
                                             "off", "xg_mode"))
def _fast_call(x_blk, fq, fs, fb=None, xg=None, wn=None, res=None, *,
               nibble: bool, G: int, nkj: int, bn: int = _BN, eps=None,
               interpret: bool = False, cm: str = "", act: str = "",
               off: float = 0.0, xg_mode: int | None = None):
    B, K = x_blk.shape
    if act:  # doubled input: gate ++ up halves, both pre-interleaved
        K = K // 2
    n2 = fq.shape[0]
    bn = min(bn, n2)  # rows are padded to _BN multiples; small tensors
    while n2 % bn:
        # the grid drops a non-dividing remainder block (rows silently
        # uncomputed — caught by the on-chip conformance sweep on the
        # 128512-row lm_head); n2 is always a _BN=512 multiple, so
        # halving terminates at a valid block size
        bn //= 2
    cols = fq.shape[1]
    bk = K // nkj
    bcols = cols // nkj
    reps = bcols // G
    assert (wn is None) == (eps is None) and (wn is None or nkj == 1)
    assert not (act and (nkj != 1 or wn is not None))
    if xg_mode is None:
        xg_mode = 1 if xg is not None else 0
    assert fb is None or xg_mode != 0
    assert xg_mode != 1 or xg is not None
    gs = K // G
    if nibble or cm:
        kern = functools.partial(_nibble_kernel, reps, nkj, eps,
                                 xg_mode, gs, fb is not None, off, cm,
                                 act, res is not None)
    else:
        kern = functools.partial(_byte_kernel, reps, nkj, eps,
                                 xg_mode, gs, fb is not None, off,
                                 act, res is not None)
    group_spec = pl.BlockSpec((bn, G), lambda i, j: (i, 0),
                              memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((B, 2 * bk if act else bk), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, bcols), lambda i, j: (i, j),
                     memory_space=pltpu.VMEM),
        group_spec,
    ]
    args = [x_blk, fq, fs]
    if xg is not None:  # group-sum side input (stored fb plane OR derived
        # offset*scale bias — the latter reuses the scale block)
        in_specs.append(pl.BlockSpec((B, G), lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(xg)
    if fb is not None:
        in_specs.append(group_spec)
        args.append(fb)
    if wn is not None:  # fused RMS-norm (pre-interleaved weight, full-K x)
        in_specs.append(pl.BlockSpec((1, K), lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(wn.reshape(1, K))
    if res is not None:  # fused residual add (decode epilogue)
        in_specs.append(pl.BlockSpec((B, bn), lambda i, j: (0, i),
                                     memory_space=pltpu.VMEM))
        args.append(res)
    return pl.pallas_call(
        kern,
        grid=(n2 // bn, nkj),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, bn), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n2), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # wide-K byte blocks (Q6_K ffn_down, K=14336) need >16 MB of
            # scoped VMEM for the cast/scale intermediates
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * n2,
            bytes_accessed=int(np.prod(fq.shape)) + 4 * n2 * G,
            transcendentals=0),
        interpret=interpret,
    )(*args)


def _fast_ref(x_il, fq, fs, nibble: bool, G: int, cm: str = ""):
    """jnp reference of the kernel math (CPU tests + custom-vjp backward)."""
    if cm:
        p = fq.astype(jnp.int32)
        codes = jnp.concatenate([p & 15, (p >> 4) & 15], axis=1)
        vals = decode_codes(cm, codes)
        half = x_il.shape[1] // 2
        sc = jnp.tile(fs.astype(jnp.float32), (1, half // G))
        w = vals.astype(jnp.float32) * jnp.concatenate([sc, sc], 1)
        return jax.lax.dot_general(
            x_il.astype(jnp.float32), w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    if nibble:
        p = fq.astype(jnp.int32)
        vals = jnp.concatenate([p & 15, (p >> 4) & 15], axis=1)
        half = x_il.shape[1] // 2
        sc = jnp.tile(fs.astype(jnp.float32), (1, half // G))
        w = vals.astype(jnp.float32) * jnp.concatenate([sc, sc], 1)
    else:
        sc = jnp.tile(fs.astype(jnp.float32), (1, fq.shape[1] // G))
        w = fq.astype(jnp.float32) * sc
    return jax.lax.dot_general(
        x_il.astype(jnp.float32), w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# public entry (differentiable in x; weights are frozen integers)
# ---------------------------------------------------------------------------

def _zeros_cot(p):
    if p is None:
        return None
    if jnp.issubdtype(p.dtype, jnp.floating):
        return jnp.zeros_like(p)
    return np.zeros(p.shape, jax.dtypes.float0)


def _interleave_x(x2, G: int, gs: int, nibble: bool, nkj: int,
                  pre_il: bool = False):
    """Activation into the kernel's interleaved (and, for K-split nibble
    blocks, re-paired) column order.  pre_il: x2 is ALREADY interleaved
    (the w_gateup_il prefill path) — only the re-pairing applies."""
    B, K = x2.shape
    x_il = (x2 if pre_il
            else x2.reshape(B, G, gs).swapaxes(1, 2).reshape(B, K))
    if nibble and nkj > 1:
        # re-pair: K-block j of the packed plane needs x new-columns
        # [j*bc, (j+1)*bc) ++ [K/2 + j*bc, ...) contiguous in its block
        bc = (K // 2) // nkj
        x_il = x_il.reshape(B, 2, nkj, bc).swapaxes(1, 2).reshape(B, K)
    return x_il


#: trace-time launch counter: incremented whenever an interleaved-layout
#: Pallas kernel call is STAGED into a program (tests/dryruns assert the
#: production path — not the XLA fallback — was compiled)
KERNEL_TRACES = 0


def _count_trace():
    global KERNEL_TRACES
    KERNEL_TRACES += 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def _fast_core(x, planes, gs, nibble, n, interpret, cm="", off=0.0,
               pre_il=False):
    _count_trace()
    fq, fs, fb = planes
    B, K = x.shape
    G = K // gs
    bn, nkj = _pick_blocks(B, K, nibble or bool(cm), gs)
    x_blk = _interleave_x(x, G, gs, nibble or bool(cm), nkj, pre_il)
    xg = None
    if fb is None and not off:
        mode = 0
    elif nkj == 1 and G % 128 == 0:
        mode = 2  # lane-aligned: group sums computed in-kernel
    elif pre_il:  # interleaved order: column r*G + g belongs to group g
        mode = 1
        xg = jnp.sum(x.reshape(B, gs, G).astype(jnp.float32), axis=1)
    else:
        mode = 1
        xg = jnp.sum(x.reshape(B, G, gs).astype(jnp.float32), axis=2)
    y = _fast_call(x_blk.astype(jnp.bfloat16), fq, fs, fb, xg,
                   nibble=nibble, G=G, nkj=nkj, bn=bn, interpret=interpret,
                   cm=cm, off=off, xg_mode=mode)
    return y[:, :n]


def _fast_fwd(x, planes, gs, nibble, n, interpret, cm="", off=0.0,
              pre_il=False):
    return (_fast_core(x, planes, gs, nibble, n, interpret, cm, off, pre_il),
            (x, planes))


def _fast_bwd(gs, nibble, n, interpret, cm, off, pre_il, res, g):
    x, planes = res
    fq, fs, fb = planes
    B, K = x.shape
    G = K // gs
    gp = jnp.pad(g.astype(jnp.float32), ((0, 0), (0, fq.shape[0] - n)))
    # dx_il = g @ W_il, then un-interleave back to the original column order
    if cm:
        p = fq.astype(jnp.int32)
        vals = decode_codes(cm, jnp.concatenate([p & 15, (p >> 4) & 15], 1))
        sc = jnp.tile(fs.astype(jnp.float32), (1, (K // 2) // G))
        w_il = vals.astype(jnp.float32) * jnp.concatenate([sc, sc], 1)
    elif nibble:
        p = fq.astype(jnp.int32)
        vals = jnp.concatenate([p & 15, (p >> 4) & 15], axis=1)
        sc = jnp.tile(fs.astype(jnp.float32), (1, (K // 2) // G))
        w_il = vals.astype(jnp.float32) * jnp.concatenate([sc, sc], 1)
    else:
        w_il = fq.astype(jnp.float32) * jnp.tile(fs.astype(jnp.float32), (1, K // G))
    dx_il = gp @ w_il
    dx = (dx_il if pre_il
          else dx_il.reshape(B, gs, G).swapaxes(1, 2).reshape(B, K))
    fb_eff = fb
    if fb_eff is None and off:
        fb_eff = off * fs.astype(jnp.float32)
    if fb_eff is not None:
        dxg = gp @ jnp.asarray(fb_eff, jnp.float32)     # [B, G]
        dbias = (jnp.tile(dxg, (1, gs)) if pre_il
                 else jnp.repeat(dxg, gs, axis=1))
        dx = dx + dbias
    return (dx.astype(x.dtype),
            tuple(_zeros_cot(p) for p in planes))


_fast_core.defvjp(_fast_fwd, _fast_bwd)


def dequantize_fast(qt: QTensor, dtype=jnp.float32):
    """Reconstruct the dequantized [n_pad2, K] matrix from fast planes
    (wire-less tensors): values * tiled scale + tiled bias, un-interleaved
    back to the original column order."""
    if qt.fl == "t":
        from .qmm_qp8 import dequantize_qp8

        return dequantize_qp8(qt, dtype)
    cfg = qt.cfg
    K = qt.k
    G = K // cfg.gs
    if cfg.code_map:
        p = qt.fq.astype(jnp.int32)
        v = decode_codes(cfg.code_map,
                         jnp.concatenate([p & 15, (p >> 4) & 15], axis=1))
    elif _is_nibble(cfg):
        p = qt.fq.astype(jnp.int32)
        v = jnp.concatenate([p & 15, (p >> 4) & 15], axis=1)
    else:
        v = qt.fq.astype(jnp.int32)
    if qt.fb is None and cfg.offset:
        v = v + int(cfg.offset)  # derived bias: w = scale * (q + offset)
    w_il = v.astype(jnp.float32) * jnp.tile(qt.fs.astype(jnp.float32), (1, cfg.gs))
    if qt.fb is not None:
        w_il = w_il + jnp.tile(qt.fb.astype(jnp.float32), (1, cfg.gs))
    # inverse of the interleave = the opposite [gs, G] transpose
    rows = w_il.shape[0]
    w = w_il.reshape(rows, cfg.gs, G).transpose(0, 2, 1).reshape(rows, K)
    return w.astype(dtype)


def qmatmul_fast(x, qt: QTensor, out_dtype=jnp.float32, interpret=False,
                 pre_interleaved=False):
    """y = x @ dequant(qt).T via the fast planes.  Requires qt.fq.
    pre_interleaved: x's columns are already in the kernel's interleaved
    order (the w_gateup_il prefill path — skips the relayout op; no-op
    for the transposed qp8 layout, which has no interleave)."""
    if qt.fl == "t":
        from .qmm_qp8 import qp8_matmul

        return qp8_matmul(x, qt, out_dtype=out_dtype, interpret=interpret)
    lead = x.shape[:-1]
    K = x.shape[-1]
    assert K == qt.k and qt.fq is not None
    B = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(B, K)
    Bp = max(8, -(-B // 8) * 8)
    if Bp != B:
        x2 = jnp.pad(x2, ((0, Bp - B), (0, 0)))
    y = _fast_core(x2, (qt.fq, qt.fs, qt.fb), qt.cfg.gs,
                   _is_nibble(qt.cfg), qt.n, interpret, qt.cfg.code_map,
                   _offset_bias(qt.cfg, qt.fb), pre_interleaved)
    return y[:B].reshape(*lead, qt.n).astype(out_dtype)


def _dual_kernel(nba: int, nbb: int, reps_a: int, reps_b: int, eps,
                 xa_mode: int, gs_a: int, fa_has: bool, off_a: float,
                 xb_mode: int, gs_b: int, fb_has: bool, off_b: float,
                 cm_a: str, cm_b: str,
                 nib_a: bool, nib_b: bool, *refs):
    xa_has = xa_mode == 1
    xb_has = xb_mode == 1
    (xa_ref, xb_ref, qa_ref, sa_ref, qb_ref, sb_ref, *rest) = refs
    o_ref = rest[-1]
    idx = 0
    xga = fba = xgb = fbb = wna = wnb = None
    if xa_has:
        xga = rest[idx]
        idx += 1
    if fa_has:
        fba = rest[idx]
        idx += 1
    if xb_has:
        xgb = rest[idx]
        idx += 1
    if fb_has:
        fbb = rest[idx]
        idx += 1
    if eps is not None:
        wna, wnb = rest[idx], rest[idx + 1]
    i = pl.program_id(0)

    @pl.when(i < nba)
    def _part_a():
        if eps is not None:
            x, inv = _normed_x(xa_ref, wna, eps)
        else:
            x, inv = xa_ref[:], None
        y = (_nibble_y(cm_a, reps_a, x, qa_ref, sa_ref)
             if (nib_a or cm_a) else _byte_y(reps_a, x, qa_ref, sa_ref))
        if xa_mode:
            xg_a = _kernel_xg(
                xa_mode, gs_a, x, xga)
            bt = _bias_term(xg_a, fba if fba is not None else sa_ref,
                            None if xa_mode == 2 else inv)
            y = y + (off_a * bt if fba is None else bt)
        o_ref[:] = y

    @pl.when(i >= nba)
    def _part_b():
        if eps is not None:
            x, inv = _normed_x(xb_ref, wnb, eps)
        else:
            x, inv = xb_ref[:], None
        y = (_nibble_y(cm_b, reps_b, x, qb_ref, sb_ref)
             if (nib_b or cm_b) else _byte_y(reps_b, x, qb_ref, sb_ref))
        if xb_mode:
            xg_b = _kernel_xg(
                xb_mode, gs_b, x, xgb)
            bt = _bias_term(xg_b, fbb if fbb is not None else sb_ref,
                            None if xb_mode == 2 else inv)
            y = y + (off_b * bt if fbb is None else bt)
        o_ref[:] = y


@functools.partial(jax.jit, static_argnames=(
    "nib_a", "nib_b", "cm_a", "cm_b", "Ga", "Gb", "bn", "eps", "interpret",
    "off_a", "off_b"))
def _dual_call(xa, xb, fqa, fsa, fqb, fsb, fba=None, xga=None, fbb=None,
               xgb=None, wna=None, wnb=None, *, nib_a, nib_b, cm_a, cm_b,
               Ga, Gb, bn, eps=None, interpret=False,
               off_a=0.0, off_b=0.0):
    B, K = xa.shape
    na2, nb2 = fqa.shape[0], fqb.shape[0]
    nba, nbb = na2 // bn, nb2 // bn
    reps_a = fqa.shape[1] // Ga
    reps_b = fqb.shape[1] // Gb
    gs_a = K // Ga
    gs_b = K // Gb
    xa_mode = (0 if (xga is None and fba is None and not off_a)
               else (2 if Ga % 128 == 0 else 1))
    xb_mode = (0 if (xgb is None and fbb is None and not off_b)
               else (2 if Gb % 128 == 0 else 1))
    if xa_mode == 2:
        xga = None
    if xb_mode == 2:
        xgb = None
    kern = functools.partial(
        _dual_kernel, nba, nbb, reps_a, reps_b, eps,
        xa_mode, gs_a, fba is not None, off_a,
        xb_mode, gs_b, fbb is not None, off_b,
        cm_a, cm_b, nib_a, nib_b)

    def ia(i):
        return jnp.minimum(i, nba - 1)

    def ib(i):
        return jnp.clip(i - nba, 0, nbb - 1)

    full = lambda i: (0, 0)
    in_specs = [
        pl.BlockSpec((B, K), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((B, K), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, fqa.shape[1]), lambda i: (ia(i), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, Ga), lambda i: (ia(i), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, fqb.shape[1]), lambda i: (ib(i), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, Gb), lambda i: (ib(i), 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [xa, xb, fqa, fsa, fqb, fsb]
    if xga is not None:
        in_specs.append(pl.BlockSpec((B, Ga), full, memory_space=pltpu.VMEM))
        args.append(xga)
    if fba is not None:
        in_specs.append(pl.BlockSpec((bn, Ga), lambda i: (ia(i), 0),
                                     memory_space=pltpu.VMEM))
        args.append(fba)
    if xgb is not None:
        in_specs.append(pl.BlockSpec((B, Gb), full, memory_space=pltpu.VMEM))
        args.append(xgb)
    if fbb is not None:
        in_specs.append(pl.BlockSpec((bn, Gb), lambda i: (ib(i), 0),
                                     memory_space=pltpu.VMEM))
        args.append(fbb)
    if eps is not None:
        in_specs.append(pl.BlockSpec((1, K), full, memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, K), full, memory_space=pltpu.VMEM))
        args.extend([wna.reshape(1, K), wnb.reshape(1, K)])
    return pl.pallas_call(
        kern,
        grid=(nba + nbb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, bn), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, na2 + nb2), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * (na2 + nb2),
            bytes_accessed=int(np.prod(fqa.shape)) + int(np.prod(fqb.shape)),
            transcendentals=0),
        interpret=interpret,
    )(*args)


def _dual_blocking(qt_a: QTensor, qt_b: QTensor, B: int = 8):
    """Common (bn, nkj=1) blocking for a dual launch, or None."""
    if qt_a.fq is None or qt_b.fq is None or qt_a.k != qt_b.k:
        return None
    if qt_a.fl == "t" or qt_b.fl == "t":
        return None  # qp8 pairs take qp8_matmul_dual (supports_dual)
    if qt_a.n != qt_a.fq.shape[0] or qt_b.n != qt_b.fq.shape[0]:
        return None  # padding rows would land mid-output
    bns = []
    for qt in (qt_a, qt_b):
        nib = _is_nibble(qt.cfg) or bool(qt.cfg.code_map)
        bn, nkj = _pick_blocks(max(8, B), qt.k, nib, qt.cfg.gs)
        if nkj != 1:
            return None
        bns.append(bn)
    bn = min(bns)
    if qt_a.n % bn or qt_b.n % bn:
        bn = 512 if (qt_a.n % 512 == 0 and qt_b.n % 512 == 0) else None
    return bn


def supports_dual(qt_a, qt_b, B: int = 8) -> bool:
    if (isinstance(qt_a, QTensor) and isinstance(qt_b, QTensor)
            and qt_a.fl == "t" and qt_b.fl == "t"):
        from .qmm_qp8 import supports_qp8_dual

        return supports_qp8_dual(qt_a, qt_b)
    return (isinstance(qt_a, QTensor) and isinstance(qt_b, QTensor)
            and _dual_blocking(qt_a, qt_b, B) is not None)


def qmatmul_fast_dual(x, qt_a: QTensor, qt_b: QTensor, wn_a_il=None,
                      wn_b_il=None, eps=None, out_dtype=jnp.float32,
                      interpret=False):
    """Two quantized projections of the SAME activation in ONE Pallas
    launch, outputs row-concatenated: [x @ A' ++ x @ B'].

    Serves the mixed-type fused-QKV decode path (Q4_K wqk + Q6_K attn_v
    under the Q4_K_M policy): one dispatch instead of two, one shared
    in-kernel RMS-norm site, and the output IS the flat q++k++v row the
    fused decode-attention kernel consumes — the per-layer concat op
    disappears from the decode graph.  Both tensors may be any supported
    fast format (nibble/coded/byte) with their own group geometry;
    qp8-layout pairs take the qp8 twin (wn_*_il are RAW norm weights
    there — both sides share one weight since the layout has no
    per-tensor interleave).
    """
    if qt_a.fl == "t" and qt_b.fl == "t":
        from .qmm_qp8 import qp8_matmul_dual

        return qp8_matmul_dual(x, qt_a, qt_b, wn=wn_a_il, eps=eps,
                               out_dtype=out_dtype, interpret=interpret)
    lead = x.shape[:-1]
    K = x.shape[-1]
    assert K == qt_a.k == qt_b.k
    bn = _dual_blocking(qt_a, qt_b)
    assert bn is not None
    B = int(np.prod(lead)) if lead else 1
    Bp = max(8, -(-B // 8) * 8)
    x2 = x.reshape(B, K)
    if Bp != B:
        x2 = jnp.pad(x2, ((0, Bp - B), (0, 0)))
    xs, xgs = [], []
    for qt in (qt_a, qt_b):
        cfg = qt.cfg
        G = K // cfg.gs
        nib = _is_nibble(cfg) or bool(cfg.code_map)
        x_il = _interleave_x(x2, G, cfg.gs, nib, 1)
        xs.append(x_il.astype(jnp.bfloat16))
        if not _needs_xg(cfg, qt.fb) or G % 128 == 0:
            # aligned G: the kernel computes its own group sums (mode 2)
            xgs.append(None)
        elif eps is not None:
            wn = jnp.asarray(wn_a_il if qt is qt_a else wn_b_il, jnp.float32)
            xgs.append(jnp.sum(
                (x_il.astype(jnp.float32) * wn).reshape(Bp, cfg.gs, G),
                axis=1))
        else:
            xgs.append(jnp.sum(
                x2.reshape(Bp, G, cfg.gs).astype(jnp.float32), axis=2))
    y = _dual_call(
        xs[0], xs[1], qt_a.fq, qt_a.fs, qt_b.fq, qt_b.fs,
        qt_a.fb, xgs[0], qt_b.fb, xgs[1],
        None if eps is None else jnp.asarray(wn_a_il, jnp.float32),
        None if eps is None else jnp.asarray(wn_b_il, jnp.float32),
        nib_a=_is_nibble(qt_a.cfg), nib_b=_is_nibble(qt_b.cfg),
        cm_a=qt_a.cfg.code_map, cm_b=qt_b.cfg.code_map,
        Ga=K // qt_a.cfg.gs, Gb=K // qt_b.cfg.gs, bn=bn,
        eps=None if eps is None else float(eps), interpret=interpret,
        off_a=_offset_bias(qt_a.cfg, qt_a.fb),
        off_b=_offset_bias(qt_b.cfg, qt_b.fb))
    return y[:B].reshape(*lead, qt_a.n + qt_b.n).astype(out_dtype)


def supports_fused_epilogue(qt, B: int = 8) -> bool:
    """True when the decode blocking gives this tensor an nkj == 1 (full-K
    in one block) kernel — the requirement for the fused act-mul /
    residual epilogues.  qp8-layout tensors always chunk internally."""
    if not isinstance(qt, QTensor) or qt.fq is None:
        return False
    if qt.fl == "t":
        return True
    nib = _is_nibble(qt.cfg) or bool(qt.cfg.code_map)
    _, nkj = _pick_blocks(max(8, B), qt.k, nib, qt.cfg.gs)
    return nkj == 1


def interleave_perm(k: int, gs: int) -> np.ndarray:
    """Public handle on the kernel's column interleave (models/fuse.py
    pre-permutes gate_up projection ROWS by this so its output feeds the
    fused act+down kernel with zero relayout ops in the decode graph)."""
    return _interleave_perm(k, gs)


def qmatmul_fast_act(x, qt: QTensor, act: str, res=None,
                     out_dtype=jnp.float32, interpret=False):
    """Fused gated-FFN epilogue + quantized matmul (inference decode):

        y = (act(gate) * up) @ dequant(qt).T  [+ res]

    x [..., 2K] is the RAW output of a gate_up projection whose rows were
    pre-permuted at load so that both halves arrive in qt's interleaved
    column order (models/fuse.py interleave_gateup_rows) — the act-mul
    happens in-kernel and the intermediate never exists in HBM, removing
    the per-layer silu/mul/interleave XLA ops from the decode tail
    (reference analog: LLM_FFN_SWIGLU fusing inside one graph split,
    llama-graph.cpp build_ffn).  res [..., n] is an optional residual
    added in-kernel (h + ffn_out).  Requires an nkj == 1 blocking
    (supports_fused_epilogue).  Transposed-layout tensors take the qp8
    twin (natural column order, no row permutation at load).
    """
    if qt.fl == "t":
        from .qmm_qp8 import qp8_matmul_act

        return qp8_matmul_act(x, qt, act, res=res, out_dtype=out_dtype,
                              interpret=interpret)
    lead = x.shape[:-1]
    K2 = x.shape[-1]
    K = K2 // 2
    assert K == qt.k and qt.fq is not None
    cfg = qt.cfg
    gs = cfg.gs
    G = K // gs
    nibble = _is_nibble(cfg)
    cm = cfg.code_map
    B = int(np.prod(lead)) if lead else 1
    Bp = max(8, -(-B // 8) * 8)
    bn, nkj = _pick_blocks(Bp, K, nibble or bool(cm), gs)
    assert nkj == 1, "fused act path requires full-K blocking"
    x2 = x.reshape(B, K2)
    if Bp != B:
        x2 = jnp.pad(x2, ((0, Bp - B), (0, 0)))
    xg = None
    mode = 0
    if _needs_xg(cfg, qt.fb):
        if G % 128 == 0:
            mode = 2  # in-kernel group sums of the act product
        else:
            # misaligned G (e.g. 448 for K=14336): group sums of act(g)*u
            # recomputed OUTSIDE as one tiny fused XLA op (read 2K,
            # write G) — in-kernel the period-G strided reduce would
            # need misaligned lane slices
            mode = 1
            xe = (_apply_act(act, x2[:, :K].astype(jnp.float32))
                  * x2[:, K:].astype(jnp.float32))
            xg = jnp.sum(xe.reshape(Bp, gs, G), axis=1)
    if res is not None:
        res = res.astype(jnp.float32).reshape(B, qt.n)
        res = jnp.pad(res, ((0, Bp - B), (0, qt.fq.shape[0] - qt.n)))
    y = _fast_call(x2.astype(jnp.bfloat16), qt.fq, qt.fs, qt.fb, xg, None,
                   res, nibble=nibble, G=G, nkj=1, bn=bn,
                   interpret=interpret, cm=cm, act=act,
                   off=_offset_bias(cfg, qt.fb), xg_mode=mode)
    return y[:B, :qt.n].reshape(*lead, qt.n).astype(out_dtype)


def qmatmul_fast_res(x, qt: QTensor, res, out_dtype=jnp.float32,
                     interpret=False):
    """Quantized matmul with an in-kernel residual add (inference decode):
    y = x @ dequant(qt).T + res — removes the per-layer h + attn_out XLA
    add from the decode tail.  Requires nkj == 1 (supports_fused_epilogue).
    """
    if qt.fl == "t":
        from .qmm_qp8 import qp8_matmul_res

        return qp8_matmul_res(x, qt, res, out_dtype=out_dtype,
                              interpret=interpret)
    lead = x.shape[:-1]
    K = x.shape[-1]
    assert K == qt.k and qt.fq is not None
    cfg = qt.cfg
    gs = cfg.gs
    G = K // gs
    nibble = _is_nibble(cfg)
    cm = cfg.code_map
    B = int(np.prod(lead)) if lead else 1
    Bp = max(8, -(-B // 8) * 8)
    bn, nkj = _pick_blocks(Bp, K, nibble or bool(cm), gs)
    assert nkj == 1, "fused residual path requires full-K blocking"
    x2 = x.reshape(B, K)
    if Bp != B:
        x2 = jnp.pad(x2, ((0, Bp - B), (0, 0)))
    x_il = _interleave_x(x2, G, gs, nibble or bool(cm), 1)
    xg = None
    mode = 0
    if _needs_xg(cfg, qt.fb):
        if G % 128 == 0:
            mode = 2
        else:
            mode = 1
            xg = jnp.sum(x2.reshape(Bp, G, gs).astype(jnp.float32), axis=2)
    res = res.astype(jnp.float32).reshape(B, qt.n)
    res = jnp.pad(res, ((0, Bp - B), (0, qt.fq.shape[0] - qt.n)))
    y = _fast_call(x_il.astype(jnp.bfloat16), qt.fq, qt.fs, qt.fb, xg, None,
                   res, nibble=nibble, G=G, nkj=1, bn=bn,
                   interpret=interpret, cm=cm,
                   off=_offset_bias(cfg, qt.fb), xg_mode=mode)
    return y[:B, :qt.n].reshape(*lead, qt.n).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("nibble", "G", "bn", "npe",
                                             "interpret", "cm", "off"))
def _indirect_call(ids, x_blk, fq, fs, fb=None, xg=None, *, nibble: bool,
                   G: int, bn: int, npe: int, interpret: bool = False,
                   cm: str = "", off: float = 0.0):
    """Gathered-expert fast matmul: grid (P, npe//bn); the scalar-prefetched
    ids [P] drive the weight-plane index maps so only the SELECTED experts'
    rows ever stream from HBM (MUL_MAT_ID, ggml.h:1135)."""
    P8, K = x_blk.shape
    P = P8 // 8
    nb = npe // bn  # blocks per expert
    bcols = fq.shape[1]
    xg_mode = 1 if xg is not None else 0
    gs = K // G
    if nibble or cm:
        kern_inner = functools.partial(
            _nibble_kernel, (K // 2) // G,
            1, None, xg_mode, gs, fb is not None, off, cm, "", False)
    else:
        kern_inner = functools.partial(
            _byte_kernel, K // G, 1, None, xg_mode, gs, fb is not None,
            off, "", False)

    def kern(ids_ref, *refs):
        kern_inner(*refs)

    wmap = lambda p, j, ids_ref: (ids_ref[p] * nb + j, 0)
    in_specs = [
        pl.BlockSpec((8, K), lambda p, j, ids_ref: (p, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, fq.shape[1]), wmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, G), wmap, memory_space=pltpu.VMEM),
    ]
    args = [x_blk, fq, fs]
    if xg is not None:
        in_specs.append(pl.BlockSpec((8, G), lambda p, j, ids_ref: (p, 0),
                                     memory_space=pltpu.VMEM))
        args.append(xg)
    if fb is not None:
        in_specs.append(pl.BlockSpec((bn, G), wmap,
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
            flops=2 * P8 * K * npe,
            bytes_accessed=P * nb * bn * bcols + P * npe * G // bn,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(ids, jnp.int32), *args)


def supports_indirect(qt, npe: int, B: int = 8) -> bool:
    """True when qt (stacked [E*npe, k] expert planes) can serve the
    gathered-expert fast path: fast planes present, an nkj == 1 blocking,
    and a row block that divides the per-expert row count."""
    if not isinstance(qt, QTensor) or qt.fq is None or npe <= 0:
        return False
    if qt.fl == "t":
        from .qmm_qp8 import supports_qp8_indirect

        return supports_qp8_indirect(qt, npe)
    nib = _is_nibble(qt.cfg) or bool(qt.cfg.code_map)
    bn, nkj = _pick_blocks(max(8, B), qt.k, nib, qt.cfg.gs)
    if nkj != 1:
        return False
    return any(npe % b == 0 for b in (bn, 512, 256, 128) if b <= bn)


def qmatmul_fast_indirect(x, qt: QTensor, ids, npe: int,
                          out_dtype=jnp.float32, interpret=False):
    """MUL_MAT_ID analog: y[p] = x[p] @ dequant(W_{ids[p]}).T where qt
    stacks E experts' rows [(E*npe), k] and ids [P] selects one expert per
    input row.  Only the selected experts' planes stream from HBM — decode
    cost scales with n_expert_used, not n_expert (the reference's indirect
    matmul over 3-D stacked expert tensors, ggml/include/ggml.h:1135 and
    build_moe_ffn, src/llama-graph.cpp; CUDA analog: mmq id path).

    P is padded to the kernel's 8-row sublane tile internally; returns
    [P, npe].
    """
    if qt.fl == "t":
        from .qmm_qp8 import qp8_matmul_indirect

        return qp8_matmul_indirect(x, qt, ids, npe, out_dtype=out_dtype,
                                   interpret=interpret)
    P, K = x.shape
    assert K == qt.k and qt.fq is not None
    cfg = qt.cfg
    gs = cfg.gs
    G = K // gs
    nibble = _is_nibble(cfg)
    cm = cfg.code_map
    bn0, nkj = _pick_blocks(8, K, nibble or bool(cm), gs)
    assert nkj == 1, "indirect path requires full-K blocking"
    bn = next(b for b in (bn0, 512, 256, 128) if b <= bn0 and npe % b == 0)
    x_il = _interleave_x(x.reshape(P, K), G, gs, nibble or bool(cm), 1)
    # one 8-row sublane tile per pair (the weight row block is the real
    # HBM traffic; the 8x activation pad is noise)
    x8 = jnp.broadcast_to(x_il[:, None, :], (P, 8, K)).reshape(P * 8, K)
    xg = None
    if _needs_xg(cfg, qt.fb):
        xg1 = jnp.sum(x.reshape(P, G, gs).astype(jnp.float32), axis=2)
        xg = jnp.broadcast_to(xg1[:, None, :], (P, 8, G)).reshape(P * 8, G)
    y = _indirect_call(ids, x8.astype(jnp.bfloat16), qt.fq, qt.fs, qt.fb,
                       xg, nibble=nibble, G=G, bn=bn, npe=npe,
                       interpret=interpret, cm=cm,
                       off=_offset_bias(cfg, qt.fb))
    return y.reshape(P, 8, npe)[:, 0, :].astype(out_dtype)


def uninterleave_cols(x, gs: int):
    """Inverse of the column interleave along the LAST axis of an
    activation: x[..., j] -> original column order (prefill path of the
    row-permuted gate_up output, models/llama._dense_ffn)."""
    K = x.shape[-1]
    G = K // gs
    lead = x.shape[:-1]
    return x.reshape(*lead, gs, G).swapaxes(-1, -2).reshape(*lead, K)


def uninterleave_norm(wn_il, gs: int):
    """Inverse of the models/fuse.py norm-weight interleave: [K] back to
    the original column order."""
    K = wn_il.shape[-1]
    G = K // gs
    return wn_il.reshape(gs, G).swapaxes(0, 1).reshape(K)


def qmatmul_fast_normed(x, qt: QTensor, wn_il, eps: float,
                        out_dtype=jnp.float32, interpret=False):
    """Fused RMSNorm + quantized matmul: y = rms_norm(x, wn) @ dequant(qt).T.

    The decode tail is dispatch-bound (~10us/kernel through this runtime);
    folding the norm into the qmm kernel removes one XLA kernel per norm
    site.  wn_il is the norm weight PRE-interleaved to the kernel's column
    layout (models/fuse.py attach_norm_planes) so no extra transform op
    lands in the decode graph.  Inference-only (no custom_vjp: the
    finetune/LoRA paths keep the unfused tensors).  Falls back to separate
    norm + fast matmul whenever the shape needs a K-split (prefill).
    Transposed-layout tensors take the qp8 twin (wn_il is the RAW norm
    weight there — no interleave exists).
    """
    if qt.fl == "t":
        from .qmm_qp8 import qp8_matmul_normed

        return qp8_matmul_normed(x, qt, wn_il, eps, out_dtype=out_dtype,
                                 interpret=interpret)
    lead = x.shape[:-1]
    K = x.shape[-1]
    assert K == qt.k and qt.fq is not None
    cfg = qt.cfg
    gs = cfg.gs
    G = K // gs
    nibble = _is_nibble(cfg)
    cm = cfg.code_map
    B = int(np.prod(lead)) if lead else 1
    Bp = max(8, -(-B // 8) * 8)
    bn, nkj = _pick_blocks(Bp, K, nibble or bool(cm), gs)
    if nkj > 1:  # prefill-sized: the norm kernel amortizes over the batch
        from .basic import rms_norm

        xn = rms_norm(x, uninterleave_norm(wn_il, gs), eps)
        return qmatmul_fast(xn, qt, out_dtype=out_dtype, interpret=interpret)
    x2 = x.reshape(B, K)
    if Bp != B:
        x2 = jnp.pad(x2, ((0, Bp - B), (0, 0)))
    x_il = _interleave_x(x2, G, gs, nibble or bool(cm), 1)
    wn = jnp.asarray(wn_il, jnp.float32)
    xg = None
    mode = 0
    if _needs_xg(cfg, qt.fb):
        if G % 128 == 0:
            mode = 2  # in-kernel group sums of the POST-norm activation
        else:
            # pre-norm group sums of x*wn; the kernel rescales by rsqrt.
            # In the interleaved order, column r*G + g belongs to group
            # g, so the sums come straight off the interleaved product.
            mode = 1
            xg = jnp.sum(
                (x_il.astype(jnp.float32) * wn).reshape(Bp, gs, G), axis=1)
    y = _fast_call(x_il.astype(jnp.bfloat16), qt.fq, qt.fs, qt.fb, xg, wn,
                   nibble=nibble, G=G, nkj=1, bn=bn, eps=float(eps),
                   interpret=interpret, cm=cm, off=_offset_bias(cfg, qt.fb),
                   xg_mode=mode)
    return y[:B, :qt.n].reshape(*lead, qt.n).astype(out_dtype)
