"""Speed-of-light quantized GEMV/GEMM Pallas kernels (decode hot path).

Measured on the target chip (v5e, honest data-closed timings): the XLA
fused-dequant path materializes dequantized intermediates in HBM for wide
shapes and lands at 29-136 GB/s effective; a dense bf16 Pallas dot hits the
full 819 GB/s.  This kernel family closes most of the gap (420+ GB/s for
4-bit, ~590 GB/s for byte formats) with three ideas:

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
    n_pad = fq.shape[0]
    n2 = -(-n_pad // _BN) * _BN
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

def _store(nkj: int, o_ref, y, y_once=None):
    """Accumulating store over the K-split axis; y_once (the fused bias
    term, already a full-K quantity) is added exactly once, at j == 0."""
    if nkj == 1:
        o_ref[:] = y if y_once is None else y + y_once
    else:
        @pl.when(pl.program_id(1) == 0)
        def _init():
            o_ref[:] = y if y_once is None else y + y_once

        @pl.when(pl.program_id(1) > 0)
        def _acc():
            o_ref[:] += y


def _bias_term(xg_ref, b_ref, inv):
    """Affine-format group bias, fused in-kernel: the bias contribution is
    sum_c x[:,c] * fb[n, g(c)] = (group-sums of x) @ fb^T — a [B,G]x[bn,G]
    side dot of negligible MXU cost.  The group sums ride in as a tiny
    input (Mosaic can't lane-split-reshape in-kernel; XLA fuses the reduce
    into the interleave producer outside).  With fused norm, xg holds the
    PRE-norm sums of x*wn and `inv` (the in-kernel rsqrt) rescales them."""
    xg = xg_ref[:].astype(jnp.float32)
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


def _split_refs(eps, has_bias, rest):
    """inputs after (x, q, s): [xg, fb] if biased, [wn] if normed, out."""
    i = 0
    xg_ref = b_ref = w_ref = None
    if has_bias:
        xg_ref, b_ref = rest[0], rest[1]
        i = 2
    if eps is not None:
        w_ref = rest[i]
    return xg_ref, b_ref, w_ref, rest[-1]


def _nibble_kernel(reps: int, nkj: int, eps, has_bias: bool, cm: str,
                   x_ref, q_ref, s_ref, *rest):
    xg_ref, b_ref, w_ref, o_ref = _split_refs(eps, has_bias, rest)
    inv = None
    if w_ref is not None:
        x, inv = _normed_x(x_ref, w_ref, eps)
    else:
        x = x_ref[:]
    pu = q_ref[:]
    if cm:  # coded i-quant nibbles: arithmetic codebook decode in-kernel
        lo = decode_codes(cm, (pu & 15).astype(jnp.int32)).astype(jnp.bfloat16)
        hi = decode_codes(cm, pu.astype(jnp.int32) >> 4).astype(jnp.bfloat16)
    else:
        # lo nibble stays in the 8-bit domain (u8 & mask is the one
        # sub-32-bit op Mosaic lowers): ~25% faster than the i32 route
        lo = (pu & 15).astype(jnp.int8).astype(jnp.bfloat16)
        hi = (pu.astype(jnp.int32) >> 4).astype(jnp.bfloat16)  # p<256
    sc = pltpu.repeat(s_ref[:], reps, axis=1).astype(jnp.bfloat16)
    half = x.shape[1] // 2
    xl = x[:, :half]
    xh = x[:, half:]
    y = (jax.lax.dot_general(xl, lo * sc, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
         + jax.lax.dot_general(xh, hi * sc, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32))
    _store(nkj, o_ref, y,
           _bias_term(xg_ref, b_ref, inv) if b_ref is not None else None)


def _byte_kernel(reps: int, nkj: int, eps, has_bias: bool,
                 x_ref, q_ref, s_ref, *rest):
    xg_ref, b_ref, w_ref, o_ref = _split_refs(eps, has_bias, rest)
    inv = None
    if w_ref is not None:
        x, inv = _normed_x(x_ref, w_ref, eps)
    else:
        x = x_ref[:]
    w = q_ref[:].astype(jnp.bfloat16)
    sc = pltpu.repeat(s_ref[:], reps, axis=1).astype(jnp.bfloat16)
    y = jax.lax.dot_general(
        x, w * sc, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    _store(nkj, o_ref, y,
           _bias_term(xg_ref, b_ref, inv) if b_ref is not None else None)


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
    if nibble and B <= 8 and G <= 128:
        # decode GEMV sweet spot measured on-chip (tools/kernel_lab.py):
        # bn=1024 beats 2048 (485 vs 413 GB/s on the 28672x4096 gate-up
        # shape); block columns capped at 2048.  The budget here is the
        # v5e's real VMEM (~128 MB; hardware-validated at 24+ MB of unpack
        # intermediates in round 1) — the conservative 13 MB general-loop
        # budget would force a K-split, which forfeits the fused-norm
        # kernel (it needs the full K in one block).
        import os

        bn = int(os.environ.get("GHT_QMM_BN", "1024"))
        nkj_env = os.environ.get("GHT_QMM_NKJ")
        if nkj_env is not None and int(nkj_env) in valid:
            return bn, int(nkj_env)
        for p in valid:
            cols = (K // 2) // p
            if cols > 2048:
                continue
            fixed = 2 * bn * G * 2 * 2 + B * bn * 4 + K * 4
            blk = (B * (K // p) * 2 + bn * cols) * 2
            if fixed + blk + 12 * bn * cols <= 96 * 1024 * 1024:
                return bn, p
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
                                             "eps", "interpret", "cm"))
def _fast_call(x_blk, fq, fs, fb=None, xg=None, wn=None, *, nibble: bool,
               G: int, nkj: int, bn: int = _BN, eps=None,
               interpret: bool = False, cm: str = ""):
    B, K = x_blk.shape
    n2 = fq.shape[0]
    bn = min(bn, n2)  # rows are padded to _BN multiples; small tensors
    cols = fq.shape[1]
    bk = K // nkj
    bcols = cols // nkj
    reps = bcols // G
    assert (wn is None) == (eps is None) and (wn is None or nkj == 1)
    assert (fb is None) == (xg is None)
    if nibble or cm:
        kern = functools.partial(_nibble_kernel, reps, nkj, eps,
                                 fb is not None, cm)
    else:
        kern = functools.partial(_byte_kernel, reps, nkj, eps,
                                 fb is not None)
    group_spec = pl.BlockSpec((bn, G), lambda i, j: (i, 0),
                              memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((B, bk), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, bcols), lambda i, j: (i, j),
                     memory_space=pltpu.VMEM),
        group_spec,
    ]
    args = [x_blk, fq, fs]
    if fb is not None:  # affine formats: bias plane + group sums in-kernel
        in_specs.append(pl.BlockSpec((B, G), lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(group_spec)
        args.extend([xg, fb])
    if wn is not None:  # fused RMS-norm (pre-interleaved weight, full-K x)
        in_specs.append(pl.BlockSpec((1, K), lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(wn.reshape(1, K))
    return pl.pallas_call(
        kern,
        grid=(n2 // bn, nkj),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, bn), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n2), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
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


def _interleave_x(x2, G: int, gs: int, nibble: bool, nkj: int):
    """Activation into the kernel's interleaved (and, for K-split nibble
    blocks, re-paired) column order."""
    B, K = x2.shape
    x_il = x2.reshape(B, G, gs).swapaxes(1, 2).reshape(B, K)
    if nibble and nkj > 1:
        # re-pair: K-block j of the packed plane needs x new-columns
        # [j*bc, (j+1)*bc) ++ [K/2 + j*bc, ...) contiguous in its block
        bc = (K // 2) // nkj
        x_il = x_il.reshape(B, 2, nkj, bc).swapaxes(1, 2).reshape(B, K)
    return x_il


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _fast_core(x, planes, gs, nibble, n, interpret, cm=""):
    fq, fs, fb = planes
    B, K = x.shape
    G = K // gs
    bn, nkj = _pick_blocks(B, K, nibble or bool(cm), gs)
    x_blk = _interleave_x(x, G, gs, nibble or bool(cm), nkj)
    xg = (jnp.sum(x.reshape(B, G, gs).astype(jnp.float32), axis=2)
          if fb is not None else None)
    y = _fast_call(x_blk.astype(jnp.bfloat16), fq, fs, fb, xg,
                   nibble=nibble, G=G, nkj=nkj, bn=bn, interpret=interpret,
                   cm=cm)
    return y[:, :n]


def _fast_fwd(x, planes, gs, nibble, n, interpret, cm=""):
    return _fast_core(x, planes, gs, nibble, n, interpret, cm), (x, planes)


def _fast_bwd(gs, nibble, n, interpret, cm, res, g):
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
    dx = dx_il.reshape(B, gs, G).swapaxes(1, 2).reshape(B, K)
    if fb is not None:
        dxg = gp @ fb.astype(jnp.float32)               # [B, G]
        dx = dx + jnp.repeat(dxg, gs, axis=1)
    return (dx.astype(x.dtype),
            tuple(_zeros_cot(p) for p in planes))


_fast_core.defvjp(_fast_fwd, _fast_bwd)


def dequantize_fast(qt: QTensor, dtype=jnp.float32):
    """Reconstruct the dequantized [n_pad2, K] matrix from fast planes
    (wire-less tensors): values * tiled scale + tiled bias, un-interleaved
    back to the original column order."""
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
    w_il = v.astype(jnp.float32) * jnp.tile(qt.fs.astype(jnp.float32), (1, cfg.gs))
    if qt.fb is not None:
        w_il = w_il + jnp.tile(qt.fb.astype(jnp.float32), (1, cfg.gs))
    # inverse of the interleave = the opposite [gs, G] transpose
    rows = w_il.shape[0]
    w = w_il.reshape(rows, cfg.gs, G).transpose(0, 2, 1).reshape(rows, K)
    return w.astype(dtype)


def qmatmul_fast(x, qt: QTensor, out_dtype=jnp.float32, interpret=False):
    """y = x @ dequant(qt).T via the fast planes.  Requires qt.fq."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    assert K == qt.k and qt.fq is not None
    B = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(B, K)
    Bp = max(8, -(-B // 8) * 8)
    if Bp != B:
        x2 = jnp.pad(x2, ((0, Bp - B), (0, 0)))
    y = _fast_core(x2, (qt.fq, qt.fs, qt.fb), qt.cfg.gs,
                   _is_nibble(qt.cfg), qt.n, interpret, qt.cfg.code_map)
    return y[:B].reshape(*lead, qt.n).astype(out_dtype)


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
    """
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
    if qt.fb is not None:
        # pre-norm group sums of x*wn; the kernel rescales by its rsqrt.
        # In the interleaved order, column r*G + g belongs to group g, so
        # the sums come straight off the interleaved product — no
        # un-interleave op in the graph.
        xg = jnp.sum((x_il.astype(jnp.float32) * wn).reshape(Bp, gs, G),
                     axis=1)
    y = _fast_call(x_il.astype(jnp.bfloat16), qt.fq, qt.fs, qt.fb, xg, wn,
                   nibble=nibble, G=G, nkj=1, bn=bn, eps=float(eps),
                   interpret=interpret, cm=cm)
    return y[:B, :qt.n].reshape(*lead, qt.n).astype(out_dtype)
