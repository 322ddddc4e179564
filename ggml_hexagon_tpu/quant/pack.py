"""Repack GGUF wire-format blocks into TPU-planar HBM layouts.

Design (TPU-first; the load-time-repack idea has precedent in the reference's
ggml-cpu-aarch64.cpp interleaved tile layouts, but the layout here is chosen
for VMEM/VPU, not NEON):

Every supported quant type is normalized to `x = scale * q + bias` where `q`
is an unsigned (or, for Q8_0, signed) integer rebuilt from one or two bit
planes.  A weight [N, K] becomes a QTensor of separately-stored planes:

  q    uint8 [N, K*bits_lo/8]   base bits, canonical chunk layout (below)
  qh   uint8 [N, K*bits_hi/8]   optional high bits, same layout
  d    f32   [N, K/gs] or [N, K/256]  wire-exact scale (f16 value, stored
                                f32 — Mosaic lacks f16; exact superset)
  sc   int8  [N, K/gs]          super-block sub-scales (K-quants only)
  dmin f32   [N, K/256]         asymmetric super-block min scale (K-quants)
  m    u8/f32 [N, K/gs]         asymmetric min (6-bit ints or direct f16 value)

The effective per-group scale is d (simple formats) or f32(d)*sc (K-quants)
— exact in f32, which is what perplexity parity requires.  Bias is
offset*scale for symmetric formats (offset static per type) or
-f32(dmin)*m for asymmetric ones.

Row-planar layout: a plane of b bits/elem packs element `s*(K/per) + j`
(per = 8/b shift-slices per byte) into byte j at bit-shift b*s.  Unpacking is
then `(plane >> (b*s)) & mask` for each s followed by a *lane concatenation*
of contiguous slices — no gathers, no lane interleaves, no scatter.  This is
the structure XLA's TPU backend fuses completely into the consuming matmul
(measured at HBM speed-of-light on v5e; interleaved layouts cost 15-20x).

N is padded to a multiple of 128 (zero rows dequantize to zero); K must be a
multiple of 256.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import numpy as np

from .formats import GGMLType, QK_K, TYPE_TRAITS, row_size
from . import ref_numpy as R


@dataclass(frozen=True)
class QConfig:
    """Static per-type kernel configuration."""

    qtype: GGMLType
    bits_lo: int  # 2, 4, or 8
    bits_hi: int  # 0, 1, or 2
    gs: int  # scale group size (16 or 32)
    superblock: bool  # True: scale = f32(d[per-256]) * sc[per-gs]
    asym: str  # 'none' | 'min' (direct f16 m) | 'minsb' (dmin*m6)
    offset: int  # symmetric zero offset: x = scale*(q + offset)
    signed: bool = False  # q plane stored as signed int8 (Q8_0)
    lut: bool = False  # 4-bit codes index the IQ4 non-linear value table
    expand: bool = False  # codebook/ternary: expanded to int8+scale at load
    # qmm_fast CODED-NIBBLE repack for codebook/ternary types: the int8
    # expansion re-encodes to sign+magnitude-code nibbles at load (the
    # value alphabets are tiny: IQ2 {0,8,25,43}, IQ3_XXS 4+8c(+2 at 7),
    # IQ3_S 2c+1, IQ1 {0,1,7,9}, ternary c-1), halving i-quant HBM vs the
    # int8 planes and decoded arithmetically in-kernel (no gather)
    code_map: str = ""  # '' | 'iq2' | 'iq3xxs' | 'iq3s' | 'iq1' | 'tern'


QCONFIGS: dict[GGMLType, QConfig] = {
    GGMLType.Q4_0: QConfig(GGMLType.Q4_0, 4, 0, 32, False, "none", -8),
    GGMLType.Q4_1: QConfig(GGMLType.Q4_1, 4, 0, 32, False, "min", 0),
    GGMLType.Q5_0: QConfig(GGMLType.Q5_0, 4, 1, 32, False, "none", -16),
    GGMLType.Q5_1: QConfig(GGMLType.Q5_1, 4, 1, 32, False, "min", 0),
    GGMLType.Q8_0: QConfig(GGMLType.Q8_0, 8, 0, 32, False, "none", 0, signed=True),
    GGMLType.Q2_K: QConfig(GGMLType.Q2_K, 2, 0, 16, True, "minsb", 0),
    GGMLType.Q3_K: QConfig(GGMLType.Q3_K, 2, 1, 16, True, "none", -4),
    GGMLType.Q4_K: QConfig(GGMLType.Q4_K, 4, 0, 32, True, "minsb", 0),
    GGMLType.Q5_K: QConfig(GGMLType.Q5_K, 4, 1, 32, True, "minsb", 0),
    GGMLType.Q6_K: QConfig(GGMLType.Q6_K, 4, 2, 16, True, "none", -32),
    # IQ4: 4-bit codes through the non-linear LUT (kvalues_iq4nl)
    GGMLType.IQ4_NL: QConfig(GGMLType.IQ4_NL, 4, 0, 32, False, "none", 0, lut=True),
    GGMLType.IQ4_XS: QConfig(GGMLType.IQ4_XS, 4, 0, 32, True, "none", 0, lut=True),
    # codebook / ternary formats: expanded at load time to an exact
    # (int8 value, f32 group scale) decomposition — correctness-first; an
    # in-kernel grid-gather layout is a planned bandwidth optimization
    GGMLType.IQ2_XXS: QConfig(GGMLType.IQ2_XXS, 8, 0, 32, False, "none", 0, signed=True, expand=True, code_map="iq2"),
    GGMLType.IQ2_XS: QConfig(GGMLType.IQ2_XS, 8, 0, 16, False, "none", 0, signed=True, expand=True, code_map="iq2"),
    GGMLType.IQ2_S: QConfig(GGMLType.IQ2_S, 8, 0, 16, False, "none", 0, signed=True, expand=True, code_map="iq2"),
    GGMLType.IQ3_XXS: QConfig(GGMLType.IQ3_XXS, 8, 0, 32, False, "none", 0, signed=True, expand=True, code_map="iq3xxs"),
    GGMLType.IQ3_S: QConfig(GGMLType.IQ3_S, 8, 0, 32, False, "none", 0, signed=True, expand=True, code_map="iq3s"),
    GGMLType.IQ1_S: QConfig(GGMLType.IQ1_S, 8, 0, 32, False, "none", 0, signed=True, expand=True, code_map="iq1"),
    GGMLType.IQ1_M: QConfig(GGMLType.IQ1_M, 8, 0, 16, False, "none", 0, signed=True, expand=True, code_map="iq1"),
    GGMLType.TQ1_0: QConfig(GGMLType.TQ1_0, 8, 0, 256, False, "none", 0, signed=True, expand=True, code_map="tern"),
    GGMLType.TQ2_0: QConfig(GGMLType.TQ2_0, 8, 0, 256, False, "none", 0, signed=True, expand=True, code_map="tern"),
}


@jax.tree_util.register_pytree_node_class
@dataclass
class QTensor:
    """Planar quantized tensor living in HBM. Logical value: [n, k] f32."""

    cfg: QConfig
    n: int  # true output-feature count (rows may be padded beyond)
    k: int
    q: Any  # uint8/int8 [n_pad, k*bits_lo/8]
    d: Any  # f16 [n_pad, k/gs] or [n_pad, k/256]
    qh: Any = None
    sc: Any = None
    dmin: Any = None
    m: Any = None
    # fast-matmul planes: either the ops/qmm_fast.py interleaved layout
    # (fl == "il": fq [n2, cols], fs/fb [n2, G]) or the ops/qmm_qp8.py
    # transposed layout (fl == "t": fq [K(/2), n2], fs/fb [G, n2]),
    # built once at load by with_fast_planes()
    fq: Any = None
    fs: Any = None
    fb: Any = None
    fl: str = "il"

    @property
    def n_pad(self) -> int:
        if self.q is not None:
            return self.q.shape[0]
        return self.fq.shape[1] if self.fl == "t" else self.fq.shape[0]

    def tree_flatten(self):
        leaves = (self.q, self.d, self.qh, self.sc, self.dmin, self.m,
                  self.fq, self.fs, self.fb)
        return leaves, (self.cfg, self.n, self.k, self.fl)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        cfg, n, k, fl = aux
        return cls(cfg, n, k, *leaves, fl=fl)

    def astype_device(self, fast: bool | None = None,
                      layout: str | None = None):
        """Move planes to the default device as jax arrays.

        fast=None consults the module default (FAST_MATMUL); True builds
        the fast-matmul planes for supported types.  layout forces 'il'
        or 't' (None: automatic, use_qp8_layout).
        """
        import jax.numpy as jnp

        def put(x):
            return None if x is None else jnp.asarray(x)

        if fast is None:
            fast = FAST_MATMUL
        fq = fs = fb = None
        fl = self.fl
        if fast and self.fq is None:
            # build on the HOST from the numpy wire planes: no eager
            # device ops (each would remote-compile), no HBM transient
            fq, fs, fb, fl = _build_planes_auto(self, layout)
        return QTensor(
            self.cfg, self.n, self.k, put(self.q), put(self.d), put(self.qh),
            put(self.sc), put(self.dmin), put(self.m),
            put(fq if fq is not None else self.fq),
            put(fs if fs is not None else self.fs),
            put(fb if fb is not None else self.fb),
            fl=fl,
        )

    def with_fast_planes(self, layout: str | None = None) -> "QTensor":
        """Return a copy carrying fast planes (no-op if unsupported).

        layout: force 'il' (interleaved) or 't' (transposed qp8);
        None picks automatically (use_qp8_layout)."""
        if self.fq is not None:
            return self
        fq, fs, fb, fl = _build_planes_auto(self, layout)
        if fq is None:
            return self
        return QTensor(self.cfg, self.n, self.k, self.q, self.d, self.qh,
                       self.sc, self.dmin, self.m, fq, fs, fb, fl=fl)

    def take_rows(self, perm) -> "QTensor":
        """Reorder the n output-feature rows by `perm` (len n, a
        permutation of range(n)).  Wire planes gather on axis 0; fast
        planes on their output-feature axis (0 for the interleaved
        layout, 1 for the transposed qp8 layout); padding rows beyond n
        stay in place.  Works for host (numpy) and device (jax) planes
        alike."""
        import jax.numpy as jnp

        perm = np.asarray(perm, np.int64)
        assert perm.size == self.n, (perm.size, self.n)

        def g(a, axis=0):
            if a is None:
                return None
            xp = np if isinstance(a, np.ndarray) else jnp
            full = xp.concatenate(
                [xp.asarray(perm), xp.arange(perm.size, a.shape[axis])])
            return a[full] if axis == 0 else a[:, full]

        fax = 1 if self.fl == "t" else 0
        return QTensor(self.cfg, self.n, self.k, g(self.q), g(self.d),
                       g(self.qh), g(self.sc), g(self.dmin), g(self.m),
                       g(self.fq, fax), g(self.fs, fax), g(self.fb, fax),
                       fl=self.fl)

    def without_wire(self) -> "QTensor":
        """Drop the wire planes from HBM (keeps the fast planes).
        Halves device memory for matmul weights; dequantize_jax then
        reconstructs from the fast planes when asked."""
        if self.fq is None:
            return self
        return QTensor(self.cfg, self.n, self.k, None, None, None,
                       None, None, None, self.fq, self.fs, self.fb,
                       fl=self.fl)


#: per-layer dense matmul keys whose wire planes are dead weight once the
#: qmm_fast planes exist (MoE "_exps" stacks keep wire: qtensor_rows slices
#: it; embeddings keep wire: the token gather dequantizes rows)
_DROPPABLE_KEYS = {"wq", "wk", "wv", "wo", "wqkv", "ffn_gate", "ffn_up",
                   "ffn_down", "w_gateup", "w_gateup_il", "ffn_gate_shexp", "ffn_up_shexp",
                   "ffn_down_shexp"}


def drop_wire_planes(weights: dict) -> dict:
    """Strip redundant wire planes from a loaded model's matmul weights."""
    out = dict(weights)
    if isinstance(out.get("output"), QTensor):
        out["output"] = out["output"].without_wire()
    layers = []
    for lw in weights.get("layers", []):
        new = dict(lw)
        for key in _DROPPABLE_KEYS:
            v = new.get(key)
            if isinstance(v, QTensor):
                new[key] = v.without_wire()
        layers.append(new)
    out["layers"] = layers
    return out


#: default for astype_device: build fast-matmul planes at load
FAST_MATMUL = True


def use_qp8_layout(cfg: QConfig, k: int, n_pad: int = 0) -> bool:
    """True when (cfg, K) should build the transposed qp8 planes
    (ops/qmm_qp8.py) instead of the interleaved layout.

    Default: every sub-byte-packable unsigned family — the 4-bit nibbles
    (Q4_0/Q4_1/Q4_K, measured 33% faster decode on-chip,
    tools/kernel_lab9.py) and the multi-plane K-quants (Q5_K/Q6_K/Q2_K/
    Q3_K/Q5_0/Q5_1: wire-density packed planes, e.g. Q6_K at 6 bits vs
    the interleaved layout's int8 rows — measured ~20% faster on the
    ffn_down shape, tools/qp8_sweep.py) — plus the coded i-quants and
    ternary, which ride 2-4 bpw arithmetic-code qp8 planes.  Only Q8_0
    (signed) and IQ4 (LUT) keep the interleaved route.  GHT_QP8=0 forces
    the interleaved layout everywhere."""
    import os

    if os.environ.get("GHT_QP8", "1") in ("", "0"):
        return False
    from ..ops.qmm_qp8 import _is_nib, supports_qp8

    if not supports_qp8(cfg, k):
        return False
    # lm_head-class multi-plane tensors: r4 gated these to the il f32
    # route (qp8 then re-ran its prologue+expansion on all ~63 lane
    # blocks — 542 GB/s vs il's ~750).  The r5 scratch hoist removed that
    # redundancy: same-process A/B (tools/head_lab.py, Q6_K 128256x4096)
    # measures qp8 773 vs il 797 us mean (-3%) at 25% less HBM, so the
    # gate is gone.
    return True


def _build_planes_auto(qt: "QTensor", layout: str | None = None):
    """-> (fq, fs, fb, fl) for qt, choosing the layout."""
    if layout is None:
        layout = "t" if (isinstance(qt.q, np.ndarray)
                         and use_qp8_layout(qt.cfg, qt.k, qt.n_pad)) \
            else "il"
    if layout == "t":
        from ..ops.qmm_qp8 import build_t_planes

        fq, fs, fb = build_t_planes(qt)
        if fq is not None:
            return fq, fs, fb, "t"
    from ..ops.qmm_fast import build_fast_planes

    fq, fs, fb = build_fast_planes(qt)
    return fq, fs, fb, "il"


def _pack_bits(q: np.ndarray, bits: int) -> np.ndarray:
    """[N, K] ints -> row-planar packed bytes [N, K*bits/8].

    Byte j holds elements {s*(K/per) + j : s in [0, per)} at shifts b*s."""
    N, K = q.shape
    per = 8 // bits
    qc = q.reshape(N, per, K // per).astype(np.uint8)
    out = np.zeros((N, K // per), dtype=np.uint8)
    for s in range(per):
        out |= qc[:, s, :] << (bits * s)
    return out


def unpack_bits(packed: np.ndarray, bits: int, K: int) -> np.ndarray:
    """Inverse of _pack_bits (numpy mirror of the jax unpack)."""
    N = packed.shape[0]
    per = 8 // bits
    mask = (1 << bits) - 1
    parts = [(packed >> (bits * s)) & mask for s in range(per)]
    return np.concatenate(parts, axis=1)


# ---------------------------------------------------------------------------
# wire -> integer planes, per type
# ---------------------------------------------------------------------------

def _wire_to_planes(buf: np.ndarray, qtype: GGMLType, N: int, K: int) -> dict:
    """Decode wire bytes into {q:[N,K] int, d, sc, dmin, m} (group-major)."""
    ts = TYPE_TRAITS[qtype].type_size
    if qtype == GGMLType.Q4_0:
        b = buf.reshape(N, K // 32, 18)
        d = b[:, :, :2].copy().view("<f2").reshape(N, K // 32)
        qs = b[:, :, 2:]
        q = np.concatenate([qs & 0xF, qs >> 4], axis=2).reshape(N, K)
        return dict(q=q, d=d)
    if qtype == GGMLType.Q4_1:
        b = buf.reshape(N, K // 32, 20)
        d = b[:, :, 0:2].copy().view("<f2").reshape(N, K // 32)
        m = b[:, :, 2:4].copy().view("<f2").reshape(N, K // 32)
        qs = b[:, :, 4:]
        q = np.concatenate([qs & 0xF, qs >> 4], axis=2).reshape(N, K)
        return dict(q=q, d=d, m=m)
    if qtype == GGMLType.Q5_0 or qtype == GGMLType.Q5_1:
        hdr = 2 if qtype == GGMLType.Q5_0 else 4
        b = buf.reshape(N, K // 32, hdr + 4 + 16)
        d = b[:, :, 0:2].copy().view("<f2").reshape(N, K // 32)
        m = None
        if qtype == GGMLType.Q5_1:
            m = b[:, :, 2:4].copy().view("<f2").reshape(N, K // 32)
        qh = b[:, :, hdr : hdr + 4].copy().view("<u4").reshape(N, K // 32).astype(np.uint32)
        qs = b[:, :, hdr + 4 :]
        j = np.arange(16, dtype=np.uint32)
        lo5 = (qs & 0xF) | ((((qh[:, :, None] >> j) & 1) << 4)).astype(np.uint8)
        hi5 = (qs >> 4) | ((((qh[:, :, None] >> (j + 16)) & 1) << 4)).astype(np.uint8)
        q = np.concatenate([lo5, hi5], axis=2).reshape(N, K)
        out = dict(q=q, d=d)
        if m is not None:
            out["m"] = m
        return out
    if qtype == GGMLType.Q8_0:
        b = buf.reshape(N, K // 32, 34)
        d = b[:, :, :2].copy().view("<f2").reshape(N, K // 32)
        q = b[:, :, 2:].copy().view(np.int8).reshape(N, K)
        return dict(q=q, d=d)
    if qtype == GGMLType.Q4_K:
        b = buf.reshape(N * K // QK_K, ts)
        nb = b.shape[0]
        d = b[:, 0:2].copy().view("<f2").reshape(nb)
        dmin = b[:, 2:4].copy().view("<f2").reshape(nb)
        sc6, m6 = R._unpack_k4_scales(b[:, 4:16])
        qs = b[:, 16:].reshape(nb, 4, 32)
        q = np.stack([qs & 0xF, qs >> 4], axis=2).reshape(nb, 256)
        return dict(
            q=q.reshape(N, K),
            d=d.reshape(N, K // 256),
            sc=sc6.reshape(N, K // 32),
            dmin=dmin.reshape(N, K // 256),
            m=m6.reshape(N, K // 32),
        )
    if qtype == GGMLType.Q5_K:
        b = buf.reshape(N * K // QK_K, ts)
        nb = b.shape[0]
        d = b[:, 0:2].copy().view("<f2").reshape(nb)
        dmin = b[:, 2:4].copy().view("<f2").reshape(nb)
        sc6, m6 = R._unpack_k4_scales(b[:, 4:16])
        qh = b[:, 16:48]
        ql = b[:, 48:].reshape(nb, 4, 32)
        parts = []
        for c in range(4):
            hb1 = ((qh >> (2 * c)) & 1).astype(np.uint8)
            hb2 = ((qh >> (2 * c + 1)) & 1).astype(np.uint8)
            parts.append((ql[:, c, :] & 0xF) | (hb1 << 4))
            parts.append((ql[:, c, :] >> 4) | (hb2 << 4))
        q = np.stack(parts, axis=1).reshape(nb, 256)
        return dict(
            q=q.reshape(N, K),
            d=d.reshape(N, K // 256),
            sc=sc6.reshape(N, K // 32),
            dmin=dmin.reshape(N, K // 256),
            m=m6.reshape(N, K // 32),
        )
    if qtype == GGMLType.Q6_K:
        b = buf.reshape(N * K // QK_K, ts)
        nb = b.shape[0]
        ql = b[:, 0:128].reshape(nb, 2, 2, 32)
        qh = b[:, 128:192].reshape(nb, 2, 32)
        sc = b[:, 192:208].copy().view(np.int8)
        d = b[:, 208:210].copy().view("<f2").reshape(nb)
        q = np.empty((nb, 2, 4, 32), dtype=np.uint8)
        for h in range(2):
            q[:, h, 0] = (ql[:, h, 0, :] & 0xF) | (((qh[:, h, :] >> 0) & 3) << 4)
            q[:, h, 1] = (ql[:, h, 1, :] & 0xF) | (((qh[:, h, :] >> 2) & 3) << 4)
            q[:, h, 2] = (ql[:, h, 0, :] >> 4) | (((qh[:, h, :] >> 4) & 3) << 4)
            q[:, h, 3] = (ql[:, h, 1, :] >> 4) | (((qh[:, h, :] >> 6) & 3) << 4)
        return dict(
            q=q.reshape(N, K),
            d=d.reshape(N, K // 256),
            sc=sc.reshape(N, K // 16),
        )
    if qtype == GGMLType.Q2_K:
        b = buf.reshape(N * K // QK_K, ts)
        nb = b.shape[0]
        scb = b[:, 0:16]
        qs = b[:, 16:80].reshape(nb, 2, 32)
        d = b[:, 80:82].copy().view("<f2").reshape(nb)
        dmin = b[:, 82:84].copy().view("<f2").reshape(nb)
        q = np.empty((nb, 2, 4, 32), dtype=np.uint8)
        for h in range(2):
            for j in range(4):
                q[:, h, j] = (qs[:, h, :] >> (2 * j)) & 3
        return dict(
            q=q.reshape(N, K),
            d=d.reshape(N, K // 256),
            sc=(scb & 0xF).astype(np.int8).reshape(N, K // 16),
            dmin=dmin.reshape(N, K // 256),
            m=(scb >> 4).reshape(N, K // 16),
        )
    if qtype == GGMLType.Q3_K:
        b = buf.reshape(N * K // QK_K, ts)
        nb = b.shape[0]
        hmask = b[:, 0:32]
        qs = b[:, 32:96].reshape(nb, 2, 32)
        scb = b[:, 96:108]
        d = b[:, 108:110].copy().view("<f2").reshape(nb)
        sc6 = np.zeros((nb, 16), dtype=np.int8)
        for j in range(16):
            lo = (scb[:, j] & 0xF) if j < 8 else (scb[:, j - 8] >> 4)
            hi = (scb[:, 8 + j % 4] >> (2 * (j // 4))) & 3
            sc6[:, j] = ((lo | (hi << 4)).astype(np.int32) - 32).astype(np.int8)
        q = np.empty((nb, 2, 4, 32), dtype=np.uint8)
        for h in range(2):
            for j in range(4):
                lo2 = (qs[:, h, :] >> (2 * j)) & 3
                hb = ((hmask >> (4 * h + j)) & 1).astype(np.uint8)
                # q3 = lo2 | (hbit<<2): value = q3 - 4 (offset folded in cfg)
                q[:, h, j] = lo2 | (hb << 2)
        return dict(q=q.reshape(N, K), d=d.reshape(N, K // 256), sc=sc6.reshape(N, K // 16))
    if qtype == GGMLType.IQ4_NL:
        b = buf.reshape(N, K // 32, 18)
        d = b[:, :, :2].copy().view("<f2").reshape(N, K // 32)
        qs = b[:, :, 2:]
        q = np.concatenate([qs & 0xF, qs >> 4], axis=2).reshape(N, K)
        return dict(q=q, d=d)
    if qtype == GGMLType.IQ4_XS:
        ts4 = TYPE_TRAITS[GGMLType.IQ4_XS].type_size
        b = buf.reshape(N * K // QK_K, ts4)
        nb = b.shape[0]
        d = b[:, 0:2].copy().view("<f2").reshape(nb)
        scales_h = b[:, 2:4].copy().view("<u2").reshape(nb).astype(np.uint32)
        scales_l = b[:, 4:8]
        ib = np.arange(8)
        ls = ((scales_l[:, ib // 2] >> (4 * (ib % 2))) & 0xF) | (
            ((scales_h[:, None] >> (2 * ib)) & 3) << 4
        )
        sc = (ls.astype(np.int32) - 32).astype(np.int8)  # per-32 sub-scales
        qs = b[:, 8:].reshape(nb, 8, 16)
        q = np.concatenate([qs & 0xF, qs >> 4], axis=2).reshape(N, K)
        # repeat per-32 scale to per-32 layout [N, K//32] with d per 256
        return dict(
            q=q,
            d=d.reshape(N, K // 256),
            sc=sc.reshape(N, K // 32),
        )
    raise NotImplementedError(f"pack: {qtype.name}")


def pack_tensor(
    wire: np.ndarray, qtype: GGMLType, shape: tuple[int, int], n_align: int = 128
) -> QTensor:
    """Repack wire bytes for a [N, K] weight into the planar QTensor layout."""
    cfg = QCONFIGS[qtype]
    N, K = shape
    assert K % 256 == 0, f"K={K} must be a multiple of 256 (chunk size)"
    assert wire.size == row_size(qtype, K) * N, (wire.size, qtype, shape)
    if cfg.expand:
        from .iquants import expand_to_planes

        q8, scale = expand_to_planes(np.ascontiguousarray(wire, np.uint8), qtype, N, K)

        def padn(a, fill=0):
            npad = (N + n_align - 1) // n_align * n_align
            if npad == N:
                return a
            out = np.full((npad,) + a.shape[1:], fill, dtype=a.dtype)
            out[:N] = a
            return out

        return QTensor(cfg=cfg, n=N, k=K, q=padn(q8), d=padn(scale))
    planes = _wire_to_planes(np.ascontiguousarray(wire, np.uint8), qtype, N, K)

    q_int = planes["q"]
    if cfg.signed:
        q_lo = q_int.astype(np.int8).reshape(N, K)  # 8-bit signed, no sub-byte packing
        qh = None
    else:
        mask_lo = (1 << cfg.bits_lo) - 1
        q_lo = _pack_bits(q_int & mask_lo, cfg.bits_lo)
        qh = None
        if cfg.bits_hi:
            qh = _pack_bits((q_int >> cfg.bits_lo) & ((1 << cfg.bits_hi) - 1), cfg.bits_hi)

    def pad_n(a, fill=0):
        if a is None:
            return None
        npad = (N + n_align - 1) // n_align * n_align
        if npad == N:
            return a
        out = np.full((npad,) + a.shape[1:], fill, dtype=a.dtype)
        out[:N] = a
        return out

    return QTensor(
        cfg=cfg,
        n=N,
        k=K,
        q=pad_n(q_lo),
        d=pad_n(planes["d"].astype(np.float32)),
        qh=pad_n(qh),
        sc=pad_n(planes.get("sc")),
        dmin=pad_n(planes["dmin"].astype(np.float32)) if "dmin" in planes else None,
        m=pad_n(planes["m"].astype(np.float32) if cfg.asym == "min" else planes.get("m")),
    )


def slice_rows_host(qt: QTensor, n0: int, n1: int) -> QTensor:
    """Host-side output-feature slice [n0, n1) of a wire QTensor.

    Used by the fast-plane sharders (parallel/tp_fast.py): each shard's
    planes are rebuilt from its row slice so every device holds a valid
    standalone plane set (the reference's split-buffer row TP,
    ggml-cuda.cu:761+, slices rows the same way).  Padding rows beyond
    qt.n are dropped — the per-shard plane build re-pads."""
    assert isinstance(qt.q, np.ndarray), "host slicing needs wire planes"
    assert 0 <= n0 < n1 <= qt.n, (n0, n1, qt.n)

    def g(a):
        return None if a is None else a[n0:n1]

    return QTensor(qt.cfg, n1 - n0, qt.k, g(qt.q), g(qt.d), g(qt.qh),
                   g(qt.sc), g(qt.dmin), g(qt.m))


def slice_k_host(qt: QTensor, k0: int, k1: int) -> QTensor:
    """Host-side contraction-dim slice [k0, k1) of a wire QTensor.

    Boundaries must be 256-aligned (superblock + qp8 SEG granularity).
    The packed bit planes are unpacked, column-sliced, and repacked so the
    result is a valid standalone [N, k1-k0] QTensor — the row-parallel
    shard of the reference's split-K tensor parallelism."""
    cfg = qt.cfg
    assert isinstance(qt.q, np.ndarray), "host slicing needs wire planes"
    assert k0 % 256 == 0 and k1 % 256 == 0 and 0 <= k0 < k1 <= qt.k, (
        k0, k1, qt.k)
    kl = k1 - k0
    if cfg.signed:
        q = qt.q[:, k0:k1]
        qh = None
    else:
        v = unpack_bits(np.asarray(qt.q), cfg.bits_lo, qt.k)[:, k0:k1]
        q = _pack_bits(v, cfg.bits_lo)
        qh = None
        if cfg.bits_hi:
            vh = unpack_bits(np.asarray(qt.qh), cfg.bits_hi, qt.k)[:, k0:k1]
            qh = _pack_bits(vh, cfg.bits_hi)

    def gg(a, per: int):
        return None if a is None else a[:, k0 // per:k1 // per]

    d_per = 256 if cfg.superblock else cfg.gs
    return QTensor(cfg, qt.n, kl, q, gg(qt.d, d_per), qh,
                   gg(qt.sc, cfg.gs), gg(qt.dmin, 256),
                   gg(qt.m, cfg.gs))


def quantize_tensor(
    w: np.ndarray, qtype: GGMLType, quant_weights: np.ndarray | None = None
) -> QTensor:
    """Quantize an f32 [N, K] weight and repack (test/bench convenience)."""
    N, K = w.shape
    wire = R.quantize(np.ascontiguousarray(w, np.float32).reshape(-1), qtype, quant_weights)
    return pack_tensor(wire, qtype, (N, K))


def dequantize_planes_numpy(qt: QTensor) -> np.ndarray:
    """Reference dequantization from planes (must equal wire dequant exactly)."""
    cfg = qt.cfg
    N, K = qt.n_pad, qt.k
    if cfg.signed:
        q = np.asarray(qt.q).astype(np.int32)
    else:
        q = unpack_bits(np.asarray(qt.q), cfg.bits_lo, K).astype(np.int32)
        if cfg.bits_hi:
            q |= unpack_bits(np.asarray(qt.qh), cfg.bits_hi, K).astype(np.int32) << cfg.bits_lo
        if cfg.lut:
            from .iquants import KVALUES_IQ4NL

            q = KVALUES_IQ4NL[q].astype(np.int32)
    d = np.asarray(qt.d).astype(np.float32)
    if cfg.superblock:
        scale = np.repeat(d, 256 // cfg.gs, axis=1) * np.asarray(qt.sc).astype(np.float32)
    else:
        scale = d
    if cfg.asym == "minsb":
        dmin = np.asarray(qt.dmin).astype(np.float32)
        bias = -np.repeat(dmin, 256 // cfg.gs, axis=1) * np.asarray(qt.m).astype(np.float32)
    elif cfg.asym == "min":
        bias = np.asarray(qt.m).astype(np.float32)
    else:
        bias = scale * cfg.offset
    x = q.reshape(N, K // cfg.gs, cfg.gs) * scale[:, :, None] + bias[:, :, None]
    return x.reshape(N, K).astype(np.float32)
