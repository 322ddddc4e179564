"""i-quant (and ternary) dequantizers — NumPy, bit-faithful.

Importance-matrix quant formats (IQ1/IQ2/IQ3 codebook grids, IQ4 non-linear
LUT, TQ ternary).  Grid constants are wire-format data extracted from the
reference header (tools/extract_iq_grids.py -> iq_data.npz).  Semantics
follow ggml/src/ggml-quants.c dequantize_row_iq* / tq*; every decoder is
differentially tested byte-for-byte against gguf-py's independent
implementation on random bit patterns.

Codebook *encoders* (the iq2/iq3/iq1 nearest-neighbour searches) are not
yet implemented — pre-quantized i-quant GGUFs load and run; producing them
requires the reference's llama-quantize for now.
"""
from __future__ import annotations

import os

import numpy as np

from .formats import GGMLType, QK_K, TYPE_TRAITS

_DATA = np.load(os.path.join(os.path.dirname(__file__), "iq_data.npz"))

# published IQ4_NL lookup table (ggml-quants.c:2434)
KVALUES_IQ4NL = np.array(
    [-127, -104, -83, -65, -49, -35, -22, -10, 1, 13, 25, 38, 53, 69, 89, 113],
    dtype=np.int8,
)
KSIGNS = _DATA["ksigns_iq2xs"]  # [128] sign bytes (bit i -> sign of elem i)
IQ2XXS_GRID = _DATA["iq2xxs_grid"].view(np.uint8).reshape(256, 8)
IQ2XS_GRID = _DATA["iq2xs_grid"].view(np.uint8).reshape(512, 8)
IQ2S_GRID = _DATA["iq2s_grid"].view(np.uint8).reshape(1024, 8)
IQ3XXS_GRID = _DATA["iq3xxs_grid"].view(np.uint8).reshape(256, 4)
IQ3S_GRID = _DATA["iq3s_grid"].view(np.uint8).reshape(512, 4)
IQ1S_GRID = _DATA["iq1s_grid"].view(np.int8).reshape(2048, 8)
IQ1S_DELTA = 0.125
IQ1M_DELTA = 0.125


def _f16(b):  # little-endian f16 bytes -> f32
    return b.copy().view("<f2").astype(np.float32)


def _signs_from_byte(sb):
    """sign byte(s) [...]-> [... , 8] multipliers (+1/-1)."""
    bits = (sb[..., None] >> np.arange(8, dtype=np.uint8)) & 1
    return np.where(bits != 0, -1.0, 1.0).astype(np.float32)


def dequantize_iq4_nl(buf: np.ndarray, n: int) -> np.ndarray:
    b = buf.reshape(-1, 18)
    d = _f16(b[:, :2]).reshape(-1, 1)
    qs = b[:, 2:]
    lo = KVALUES_IQ4NL[qs & 0xF].astype(np.float32)
    hi = KVALUES_IQ4NL[qs >> 4].astype(np.float32)
    return (d * np.concatenate([lo, hi], axis=1)).reshape(-1)[:n]


def dequantize_iq4_xs(buf: np.ndarray, n: int) -> np.ndarray:
    ts = TYPE_TRAITS[GGMLType.IQ4_XS].type_size
    b = buf.reshape(-1, ts)
    nb = b.shape[0]
    d = _f16(b[:, 0:2]).reshape(nb, 1, 1)
    scales_h = b[:, 2:4].copy().view("<u2").reshape(nb).astype(np.uint32)
    scales_l = b[:, 4:8]
    qs = b[:, 8:].reshape(nb, 8, 16)
    ib = np.arange(8)
    ls_lo = (scales_l[:, ib // 2] >> (4 * (ib % 2))) & 0xF
    ls_hi = (scales_h[:, None] >> (2 * ib)) & 3
    ls = (ls_lo | (ls_hi << 4)).astype(np.int32) - 32  # [nb, 8]
    lo = KVALUES_IQ4NL[qs & 0xF].astype(np.float32)
    hi = KVALUES_IQ4NL[qs >> 4].astype(np.float32)
    vals = np.concatenate([lo, hi], axis=2)  # [nb, 8, 32]
    return (d * ls[:, :, None] * vals).reshape(-1)[:n]


def dequantize_iq2_xxs(buf: np.ndarray, n: int) -> np.ndarray:
    ts = TYPE_TRAITS[GGMLType.IQ2_XXS].type_size
    b = buf.reshape(-1, ts)
    nb = b.shape[0]
    d = _f16(b[:, :2]).reshape(nb)
    q16 = b[:, 2:].copy().view("<u2").reshape(nb, 8, 4)  # per 32 elems: 4 u16
    aux8 = q16[:, :, :2].copy().view(np.uint8).reshape(nb, 8, 4)  # grid idx
    aux32 = (
        q16[:, :, 2].astype(np.uint32) | (q16[:, :, 3].astype(np.uint32) << 16)
    )  # [nb, 8]
    db = d[:, None] * (0.5 + (aux32 >> 28).astype(np.float32)) * 0.25  # [nb, 8]
    grid = IQ2XXS_GRID[aux8].astype(np.float32)  # [nb, 8, 4, 8]
    sidx = (aux32[:, :, None] >> (7 * np.arange(4)[None, None, :])) & 127
    signs = _signs_from_byte(KSIGNS[sidx])  # [nb, 8, 4, 8]
    out = db[:, :, None, None] * grid * signs
    return out.reshape(-1)[:n]


def dequantize_iq2_xs(buf: np.ndarray, n: int) -> np.ndarray:
    ts = TYPE_TRAITS[GGMLType.IQ2_XS].type_size
    b = buf.reshape(-1, ts)
    nb = b.shape[0]
    d = _f16(b[:, :2]).reshape(nb)
    q16 = b[:, 2:66].copy().view("<u2").reshape(nb, 8, 4)  # [nb, 32] u16
    scales = b[:, 66:74]  # [nb, 8] nibble pairs
    ls = np.stack([scales & 0xF, scales >> 4], axis=2).reshape(nb, 16)  # per 16
    db = d[:, None] * (0.5 + ls.astype(np.float32)) * 0.25  # [nb, 16]
    grid = IQ2XS_GRID[q16 & 511].astype(np.float32)  # [nb, 8, 4, 8]
    signs = _signs_from_byte(KSIGNS[q16 >> 9])
    out = grid * signs  # [nb, 8, 4, 8]; scale index = per 16 elems
    out = out.reshape(nb, 16, 16) * db[:, :, None]
    return out.reshape(-1)[:n]


def dequantize_iq2_s(buf: np.ndarray, n: int) -> np.ndarray:
    ts = TYPE_TRAITS[GGMLType.IQ2_S].type_size
    b = buf.reshape(-1, ts)
    nb = b.shape[0]
    d = _f16(b[:, :2]).reshape(nb)
    qs = b[:, 2 : 2 + 32]  # grid low bytes, per 8 elems
    sign_bytes = b[:, 34 : 34 + 32]
    qh = b[:, 66 : 66 + 8]
    scales = b[:, 74 : 74 + 8]
    ls = np.stack([scales & 0xF, scales >> 4], axis=2).reshape(nb, 16)
    db = d[:, None] * (0.5 + ls.astype(np.float32)) * 0.25
    i = np.arange(32)
    hi = (qh[:, i // 4].astype(np.uint16) << (8 - 2 * (i % 4))) & 0x300
    idx = qs.astype(np.uint16) | hi
    grid = IQ2S_GRID[idx].astype(np.float32)  # [nb, 32, 8]
    signs = _signs_from_byte(sign_bytes)  # [nb, 32, 8]
    out = (grid * signs).reshape(nb, 16, 16) * db[:, :, None]
    return out.reshape(-1)[:n]


def dequantize_iq3_xxs(buf: np.ndarray, n: int) -> np.ndarray:
    ts = TYPE_TRAITS[GGMLType.IQ3_XXS].type_size
    b = buf.reshape(-1, ts)
    nb = b.shape[0]
    d = _f16(b[:, :2]).reshape(nb)
    qs = b[:, 2:66]  # 64 grid indices (1 byte per 4 elems)
    aux32 = b[:, 66:98].copy().view("<u4").reshape(nb, 8)  # scale+signs per 32
    db = d[:, None] * (0.5 + (aux32 >> 28).astype(np.float32)) * 0.5
    # per 32 elems: 8 grid u32s (4 vals each); 4 sign packets of 8 elems
    grid = IQ3XXS_GRID[qs].astype(np.float32).reshape(nb, 8, 4, 8)
    sidx = (aux32[:, :, None] >> (7 * np.arange(4)[None, None, :])) & 127
    signs = _signs_from_byte(KSIGNS[sidx])  # [nb, 8, 4, 8]
    out = db[:, :, None, None] * grid * signs
    return out.reshape(-1)[:n]


def dequantize_iq3_s(buf: np.ndarray, n: int) -> np.ndarray:
    ts = TYPE_TRAITS[GGMLType.IQ3_S].type_size
    b = buf.reshape(-1, ts)
    nb = b.shape[0]
    d = _f16(b[:, :2]).reshape(nb)
    qs = b[:, 2:66]  # 64 low bytes, 1 per 4 elems
    qh = b[:, 66:74]  # high bits, per 32-elem chunk
    sign_bytes = b[:, 74:106]  # [nb, 32] explicit, per 8 elems
    scales = b[:, 106:110]  # 4 nibble pairs -> 8 scales per 32
    ls = np.stack([scales & 0xF, scales >> 4], axis=2).reshape(nb, 8)
    db = d[:, None] * (1 + 2 * ls.astype(np.float32))  # [nb, 8]
    i = np.arange(64)
    hi = ((qh[:, i // 8].astype(np.uint16) << (8 - (i % 8))) & 0x100)
    idx = qs.astype(np.uint16) | hi
    grid = IQ3S_GRID[idx].astype(np.float32).reshape(nb, 8, 8, 4)
    sbits = (sign_bytes[..., None] >> np.arange(8)) & 1
    signs = np.where(sbits != 0, -1.0, 1.0).astype(np.float32).reshape(nb, 8, 8, 4)
    out = db[:, :, None, None] * grid * signs
    return out.reshape(-1)[:n]


def dequantize_iq1_s(buf: np.ndarray, n: int) -> np.ndarray:
    ts = TYPE_TRAITS[GGMLType.IQ1_S].type_size
    b = buf.reshape(-1, ts)
    nb = b.shape[0]
    d = _f16(b[:, :2]).reshape(nb)
    qs = b[:, 2:34]  # [nb, 32] low 8 bits of grid index, per 8 elems
    qh = b[:, 34:50].copy().view("<u2").reshape(nb, 8).astype(np.uint32)  # per 32
    dl = d[:, None] * (2 * ((qh >> 12) & 7).astype(np.float32) + 1)  # [nb, 8]
    delta = np.where((qh & 0x8000) != 0, -IQ1S_DELTA, IQ1S_DELTA).astype(np.float32)
    i = np.arange(32)
    hi3 = ((qh[:, i // 4] >> (3 * (i % 4))) & 7).astype(np.uint16) << 8
    idx = qs.astype(np.uint16) | hi3
    grid = IQ1S_GRID[idx].astype(np.float32).reshape(nb, 8, 4, 8)
    out = dl[:, :, None, None] * (grid + delta[:, :, None, None])
    return out.reshape(-1)[:n]


def dequantize_iq1_m(buf: np.ndarray, n: int) -> np.ndarray:
    ts = TYPE_TRAITS[GGMLType.IQ1_M].type_size
    b = buf.reshape(-1, ts)
    nb = b.shape[0]
    qs = b[:, 0:32]  # per 8 elems low bits
    qh = b[:, 32:48]  # [nb, 16] 4 bits per 8-elem group
    sc = b[:, 48:56].copy().view("<u2").reshape(nb, 4).astype(np.uint32)
    # f16 scale packed in the top 4 bits of the four u16 scale words
    sc_u16 = ((sc[:, 0] >> 12) | (((sc[:, 1] >> 12) & 0xF) << 4)
              | (((sc[:, 2] >> 12) & 0xF) << 8) | (((sc[:, 3] >> 12) & 0xF) << 12))
    d = sc_u16.astype(np.uint16).view(np.float16).astype(np.float32)  # [nb]
    # 3-bit sub-scales: per 16 elems, packed 2x3bits per u16 (plus the spare)
    i16 = np.arange(16)
    ls = (sc[:, i16 // 4] >> (3 * (i16 % 4))) & 0x7  # [nb, 16]
    dl = d[:, None] * (2 * ls.astype(np.float32) + 1)  # per 16 elems
    # grid index: low 8 bits from qs, high 3 bits from qh nibbles
    i = np.arange(32)
    hi = ((qh[:, i // 2].astype(np.uint16) >> (4 * (i % 2))) & 7) << 8
    idx = qs.astype(np.uint16) | hi
    grid = IQ1S_GRID[idx].astype(np.float32)  # [nb, 32, 8]
    # delta per 8-elem group: bit 3 of the qh nibble
    dbit = ((qh[:, i // 2] >> (4 * (i % 2))) & 0x8) != 0
    delta = np.where(dbit, -IQ1M_DELTA, IQ1M_DELTA).astype(np.float32)
    vals = grid + delta[:, :, None]  # [nb, 32, 8]
    out = vals.reshape(nb, 16, 16) * dl[:, :, None]
    return out.reshape(-1)[:n]


def dequantize_tq1_0(buf: np.ndarray, n: int) -> np.ndarray:
    ts = TYPE_TRAITS[GGMLType.TQ1_0].type_size
    b = buf.reshape(-1, ts)
    nb = b.shape[0]
    qs = b[:, 0:48]
    qh = b[:, 48:52]
    d = _f16(b[:, 52:54]).reshape(nb, 1)
    pow3 = np.array([1, 3, 9, 27, 81], dtype=np.uint16)
    out = np.zeros((nb, QK_K), dtype=np.float32)
    # elements 0..159: qs[0:32], 5 trits per byte, stride 32
    q = qs[:, 0:32].astype(np.uint16)
    for j in range(5):
        t = ((q * pow3[j]) & 0xFF) * 3 // 256
        out[:, 32 * j : 32 * (j + 1)] = t.astype(np.float32) - 1
    # elements 160..239: qs[32:48], 5 trits per byte, stride 16
    q = qs[:, 32:48].astype(np.uint16)
    for j in range(5):
        t = ((q * pow3[j]) & 0xFF) * 3 // 256
        out[:, 160 + 16 * j : 160 + 16 * (j + 1)] = t.astype(np.float32) - 1
    # elements 240..255: qh, 4 trits per byte, stride 4
    q = qh.astype(np.uint16)
    for j in range(4):
        t = ((q * pow3[j]) & 0xFF) * 3 // 256
        out[:, 240 + 4 * j : 240 + 4 * (j + 1)] = t.astype(np.float32) - 1
    return (out * d).reshape(-1)[:n]


def dequantize_tq2_0(buf: np.ndarray, n: int) -> np.ndarray:
    ts = TYPE_TRAITS[GGMLType.TQ2_0].type_size
    b = buf.reshape(-1, ts)
    nb = b.shape[0]
    qs = b[:, 0:64].reshape(nb, 2, 32)
    d = _f16(b[:, 64:66]).reshape(nb, 1)
    parts = [(qs >> (2 * j)) & 3 for j in range(4)]
    q = np.stack(parts, axis=2).reshape(nb, QK_K).astype(np.float32) - 1
    return (q * d).reshape(-1)[:n]


# ---------------------------------------------------------------------------
# encoders for the tractable types
# ---------------------------------------------------------------------------

def quantize_iq4_nl(x: np.ndarray) -> np.ndarray:
    """Reference-style best-scale search over the non-linear LUT
    (quantize_row_iq4_nl semantics, ntry=7)."""
    xb = np.ascontiguousarray(x, np.float32).reshape(-1, 32)
    nb = xb.shape[0]
    amax = np.abs(xb).max(axis=1)
    rows = np.arange(nb)
    mx = xb[rows, np.abs(xb).argmax(axis=1)]
    dead = amax < 1e-30
    with np.errstate(divide="ignore", invalid="ignore"):
        d0 = np.where(dead, 0.0, mx / KVALUES_IQ4NL[0])
    best_d = d0.copy()
    best_err = np.full(nb, np.inf, dtype=np.float32)
    lut = KVALUES_IQ4NL.astype(np.float32)
    for itry in range(-7, 8):
        d = d0 * (1 + itry * 0.01) if itry else d0
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = np.where(d != 0, 1.0 / d, 0.0)
        q = np.abs(xb * inv[:, None, None][:, :, 0] [..., None] - lut[None, None, :]).argmin(axis=2) if False else None
        scaled = xb * inv[:, None]
        idx = np.abs(scaled[:, :, None] - lut[None, None, :]).argmin(axis=2)
        err = ((lut[idx] * d[:, None] - xb) ** 2).sum(axis=1)
        better = err < best_err
        best_err = np.where(better, err, best_err)
        best_d = np.where(better, d, best_d)
    d16 = best_d.astype(np.float16).astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(d16 != 0, 1.0 / d16, 0.0)
    idx = np.abs((xb * inv[:, None])[:, :, None] - lut[None, None, :]).argmin(axis=2)
    out = np.empty((nb, 18), dtype=np.uint8)
    out[:, :2] = best_d.astype(np.float16).view(np.uint8).reshape(nb, 2)
    out[:, 2:] = (idx[:, :16] | (idx[:, 16:] << 4)).astype(np.uint8)
    return out.reshape(-1)


def quantize_tq2_0(x: np.ndarray) -> np.ndarray:
    xb = np.ascontiguousarray(x, np.float32).reshape(-1, QK_K)
    nb = xb.shape[0]
    d = np.abs(xb).max(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(d != 0, 1.0 / d, 0.0)
    q = np.rint(xb * inv[:, None]).astype(np.int32) + 1  # {0,1,2}
    q = np.clip(q, 0, 2).astype(np.uint8)
    qc = q.reshape(nb, 2, 4, 32)
    packed = (qc[:, :, 0] | (qc[:, :, 1] << 2) | (qc[:, :, 2] << 4) | (qc[:, :, 3] << 6))
    out = np.empty((nb, 66), dtype=np.uint8)
    out[:, 0:64] = packed.reshape(nb, 64)
    out[:, 64:66] = d.astype(np.float16).view(np.uint8).reshape(nb, 2)
    return out.reshape(-1)


DEQUANT_IQ = {
    GGMLType.IQ4_NL: dequantize_iq4_nl,
    GGMLType.IQ4_XS: dequantize_iq4_xs,
    GGMLType.IQ2_XXS: dequantize_iq2_xxs,
    GGMLType.IQ2_XS: dequantize_iq2_xs,
    GGMLType.IQ2_S: dequantize_iq2_s,
    GGMLType.IQ3_XXS: dequantize_iq3_xxs,
    GGMLType.IQ3_S: dequantize_iq3_s,
    GGMLType.IQ1_S: dequantize_iq1_s,
    GGMLType.IQ1_M: dequantize_iq1_m,
    GGMLType.TQ1_0: dequantize_tq1_0,
    GGMLType.TQ2_0: dequantize_tq2_0,
}

QUANT_IQ = {
    GGMLType.IQ4_NL: quantize_iq4_nl,
    GGMLType.TQ2_0: quantize_tq2_0,
}


# ---------------------------------------------------------------------------
# exact (int8 value, f32 group scale) decompositions for the planar loader
# ---------------------------------------------------------------------------

def expand_to_planes(buf: np.ndarray, qtype: GGMLType, N: int, K: int):
    """Decompose y = scale_g * q with integer q (|q| <= 127) and per-group
    f32 scale — exact: dequant(planes) == dequantize_iq*(wire) bitwise.

    IQ1 formats fold their +/-0.125 delta into q via q*8 and scale/8
    (both exact in f32/int8).
    """
    nb = N * K // QK_K

    def f16(b):
        return b.copy().view("<f2").astype(np.float32)

    if qtype == GGMLType.IQ2_XXS:
        b = buf.reshape(nb, TYPE_TRAITS[qtype].type_size)
        d = f16(b[:, :2]).reshape(nb)
        q16 = b[:, 2:].copy().view("<u2").reshape(nb, 8, 4)
        aux8 = q16[:, :, :2].copy().view(np.uint8).reshape(nb, 8, 4)
        aux32 = q16[:, :, 2].astype(np.uint32) | (q16[:, :, 3].astype(np.uint32) << 16)
        db = d[:, None] * (0.5 + (aux32 >> 28).astype(np.float32)) * 0.25
        grid = IQ2XXS_GRID[aux8].astype(np.int16)
        sidx = (aux32[:, :, None] >> (7 * np.arange(4)[None, None, :])) & 127
        sbits = (KSIGNS[sidx][..., None] >> np.arange(8)) & 1
        q = grid * np.where(sbits != 0, -1, 1)
        return q.reshape(N, K).astype(np.int8), db.reshape(N, K // 32)
    if qtype == GGMLType.IQ2_XS:
        b = buf.reshape(nb, TYPE_TRAITS[qtype].type_size)
        d = f16(b[:, :2]).reshape(nb)
        q16 = b[:, 2:66].copy().view("<u2").reshape(nb, 32)
        scales = b[:, 66:74]
        ls = np.stack([scales & 0xF, scales >> 4], axis=2).reshape(nb, 16)
        db = d[:, None] * (0.5 + ls.astype(np.float32)) * 0.25
        grid = IQ2XS_GRID[q16 & 511].astype(np.int16)
        sbits = (KSIGNS[q16 >> 9][..., None] >> np.arange(8)) & 1
        q = grid * np.where(sbits != 0, -1, 1)
        return q.reshape(N, K).astype(np.int8), db.reshape(N, K // 16)
    if qtype == GGMLType.IQ2_S:
        b = buf.reshape(nb, TYPE_TRAITS[qtype].type_size)
        d = f16(b[:, :2]).reshape(nb)
        qs = b[:, 2:34]
        sign_bytes = b[:, 34:66]
        qh = b[:, 66:74]
        scales = b[:, 74:82]
        ls = np.stack([scales & 0xF, scales >> 4], axis=2).reshape(nb, 16)
        db = d[:, None] * (0.5 + ls.astype(np.float32)) * 0.25
        i = np.arange(32)
        hi = (qh[:, i // 4].astype(np.uint16) << (8 - 2 * (i % 4))) & 0x300
        grid = IQ2S_GRID[qs.astype(np.uint16) | hi].astype(np.int16)
        sbits = (sign_bytes[..., None] >> np.arange(8)) & 1
        q = grid * np.where(sbits != 0, -1, 1)
        return q.reshape(N, K).astype(np.int8), db.reshape(N, K // 16)
    if qtype == GGMLType.IQ3_XXS:
        b = buf.reshape(nb, TYPE_TRAITS[qtype].type_size)
        d = f16(b[:, :2]).reshape(nb)
        qs = b[:, 2:66]
        aux32 = b[:, 66:98].copy().view("<u4").reshape(nb, 8)
        db = d[:, None] * (0.5 + (aux32 >> 28).astype(np.float32)) * 0.5
        grid = IQ3XXS_GRID[qs].astype(np.int16).reshape(nb, 8, 4, 8)
        sidx = (aux32[:, :, None] >> (7 * np.arange(4)[None, None, :])) & 127
        sbits = (KSIGNS[sidx][..., None] >> np.arange(8)) & 1
        q = grid * np.where(sbits != 0, -1, 1)
        return q.reshape(N, K).astype(np.int8), db.reshape(N, K // 32)
    if qtype == GGMLType.IQ3_S:
        b = buf.reshape(nb, TYPE_TRAITS[qtype].type_size)
        d = f16(b[:, :2]).reshape(nb)
        qs = b[:, 2:66]
        qh = b[:, 66:74]
        sign_bytes = b[:, 74:106]
        scales = b[:, 106:110]
        ls = np.stack([scales & 0xF, scales >> 4], axis=2).reshape(nb, 8)
        db = d[:, None] * (1 + 2 * ls.astype(np.float32))
        i = np.arange(64)
        hi = (qh[:, i // 8].astype(np.uint16) << (8 - (i % 8))) & 0x100
        grid = IQ3S_GRID[qs.astype(np.uint16) | hi].astype(np.int16).reshape(nb, 8, 4, 8)
        sbits = (sign_bytes[..., None] >> np.arange(8)) & 1
        q = grid * np.where(sbits != 0, -1, 1).reshape(nb, 8, 4, 8)
        return q.reshape(N, K).astype(np.int8), db.reshape(N, K // 32)
    if qtype == GGMLType.IQ1_S:
        b = buf.reshape(nb, TYPE_TRAITS[qtype].type_size)
        d = f16(b[:, :2]).reshape(nb)
        qs = b[:, 2:34]
        qh = b[:, 34:50].copy().view("<u2").reshape(nb, 8).astype(np.uint32)
        dl8 = d[:, None] * (2 * ((qh >> 12) & 7).astype(np.float32) + 1) / 8.0
        delta8 = np.where((qh & 0x8000) != 0, -1, 1).astype(np.int16)  # 8*delta
        i = np.arange(32)
        idx = qs.astype(np.uint16) | (((qh[:, i // 4] >> (3 * (i % 4))) & 7) << 8).astype(np.uint16)
        grid = IQ1S_GRID[idx].astype(np.int16).reshape(nb, 8, 4, 8)
        q = 8 * grid + delta8[:, :, None, None]
        return q.reshape(N, K).astype(np.int8), dl8.reshape(N, K // 32)
    if qtype == GGMLType.IQ1_M:
        b = buf.reshape(nb, TYPE_TRAITS[qtype].type_size)
        qs = b[:, 0:32]
        qh = b[:, 32:48]
        sc = b[:, 48:56].copy().view("<u2").reshape(nb, 4).astype(np.uint32)
        sc_u16 = ((sc[:, 0] >> 12) | (((sc[:, 1] >> 12) & 0xF) << 4)
                  | (((sc[:, 2] >> 12) & 0xF) << 8) | (((sc[:, 3] >> 12) & 0xF) << 12))
        d = sc_u16.astype(np.uint16).view(np.float16).astype(np.float32)
        i16 = np.arange(16)
        ls = (sc[:, i16 // 4] >> (3 * (i16 % 4))) & 0x7
        dl8 = d[:, None] * (2 * ls.astype(np.float32) + 1) / 8.0
        i = np.arange(32)
        hi = ((qh[:, i // 2].astype(np.uint16) >> (4 * (i % 2))) & 7) << 8
        grid = IQ1S_GRID[qs.astype(np.uint16) | hi].astype(np.int16)  # [nb,32,8]
        dbit = ((qh[:, i // 2] >> (4 * (i % 2))) & 0x8) != 0
        delta8 = np.where(dbit, -1, 1).astype(np.int16)
        q = 8 * grid + delta8[:, :, None]
        return q.reshape(N, K).astype(np.int8), dl8.reshape(N, K // 16)
    if qtype in (GGMLType.TQ1_0, GGMLType.TQ2_0):
        fn = dequantize_tq1_0 if qtype == GGMLType.TQ1_0 else dequantize_tq2_0
        ts = TYPE_TRAITS[qtype].type_size
        b = buf.reshape(nb, ts)
        d = f16(b[:, 52:54] if qtype == GGMLType.TQ1_0 else b[:, 64:66]).reshape(nb)
        y = fn(buf, N * K).reshape(nb, QK_K)
        with np.errstate(divide="ignore", invalid="ignore"):
            q = np.where(d[:, None] != 0, y / np.where(d[:, None] == 0, 1, d[:, None]), 0.0)
        with np.errstate(invalid="ignore"):
            q = np.rint(np.nan_to_num(q)).astype(np.int8)
        return q.reshape(N, K), d.reshape(N, K // 256)
    raise NotImplementedError(f"expand: {qtype.name}")
