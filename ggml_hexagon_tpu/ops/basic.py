"""Elementwise / normalization / rotary ops.

Semantics match the reference ops the graphs are built from:
- rms_norm: ggml RMS_NORM (f32 accumulation, eps inside sqrt)
- rope: ggml ROPE mode NORM (adjacent pairs) and NEOX (split halves),
  with linear freq scaling and YaRN (ggml/src/ggml-cpu has the reference
  impl; parameters per ggml.h:1438-1468)
- softmax_ext: fused scale + mask + softmax (ggml SOFT_MAX_EXT, ggml.h:1394)

These are plain jnp: XLA fuses elementwise chains into neighbors; no Pallas
needed (measured: these ops are bandwidth-free inside the decode graph).
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp


def rms_norm(x, weight, eps: float = 1e-5):
    """x * rsqrt(mean(x^2) + eps) * weight, computed in f32."""
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * inv * weight.astype(jnp.float32)).astype(x.dtype)


def norm(x, weight, bias=None, eps: float = 1e-5):
    """LayerNorm (ggml NORM + optional affine)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def silu(x):
    return x * jax.nn.sigmoid(x.astype(jnp.float32)).astype(x.dtype)


def gelu(x):
    return jax.nn.gelu(x.astype(jnp.float32), approximate=True).astype(x.dtype)


@dataclass(frozen=True)
class RopeParams:
    """Mirrors the ggml_rope_ext parameter block (ggml.h:1438-1468)."""

    n_dims: int
    mode: str = "norm"  # 'norm' (adjacent pairs) | 'neox' (split halves)
    freq_base: float = 10000.0
    freq_scale: float = 1.0
    ext_factor: float = 0.0  # YaRN extrapolation mix (0 = off)
    attn_factor: float = 1.0
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    n_ctx_orig: int = 0  # original training context for YaRN
    # per-pair frequency divisors (ggml rope_ext src2 "freq_factors":
    # phi3 longrope rope_factors_long/short, llama3 rope_freqs) — theta/ff
    freq_factors: tuple = ()
    # M-RoPE (qwen2vl, ggml_rope_multi): pair j reads position stream
    # (t,h,w,e) by sector = j % sum(sections) (ggml-cpu.c:8650-8706)
    sections: tuple = ()


def _yarn_corr_dim(n_dims: int, n_ctx_orig: int, n_rot: float, base: float) -> float:
    # inverse of theta(i) = base^(-2i/n) at rotations = n_ctx/(2*pi*n_rot)
    return n_dims * math.log(n_ctx_orig / (n_rot * 2 * math.pi)) / (2 * math.log(base))


def _yarn_ramp(lo: float, hi: float, i):
    y = (i / 2.0 - lo) / max(0.001, hi - lo)
    return 1.0 - jnp.clip(y, 0.0, 1.0)


def rope_freqs(params: RopeParams):
    """Per-pair (theta_scale^j) base frequencies and YaRN mixing factors.

    Returns (inv_freq [n_dims/2], mscale) where the rotation for position p,
    pair j is angle = p * inv_freq[j] adjusted per YaRN.
    """
    half = params.n_dims // 2
    j = jnp.arange(half, dtype=jnp.float32)
    theta = params.freq_base ** (-2.0 * j / params.n_dims)  # base^-2j/n
    if params.freq_factors:
        # ggml-cpu.c rope: rope_yarn(theta/ff, ...) — factors divide theta
        theta = theta / jnp.asarray(params.freq_factors, jnp.float32)[:half]
    if params.ext_factor != 0.0 and params.n_ctx_orig > 0:
        # YaRN: interpolate between scaled and unscaled freq per dimension
        lo = math.floor(
            _yarn_corr_dim(params.n_dims, params.n_ctx_orig, params.beta_fast, params.freq_base)
        )
        hi = math.ceil(
            _yarn_corr_dim(params.n_dims, params.n_ctx_orig, params.beta_slow, params.freq_base)
        )
        ramp = _yarn_ramp(lo, hi, 2 * j) * params.ext_factor
        theta_interp = params.freq_scale * theta
        inv_freq = theta_interp * (1 - ramp) + theta * ramp
        mscale = params.attn_factor * (
            1.0 + 0.1 * math.log(1.0 / params.freq_scale)
            if params.freq_scale < 1.0
            else 1.0
        )
    else:
        inv_freq = params.freq_scale * theta
        mscale = params.attn_factor
    return inv_freq, mscale


def apply_rope(x, positions, params: RopeParams):
    """Rotate x [..., T, n_head, head_dim] by positions [..., T].

    mode 'norm': adjacent pairs (x[2j], x[2j+1]) — what LLAMA-family GGUFs
    expect (conversion pre-permutes Q/K so this equals HF rotate-half).
    mode 'neox': split halves (x[j], x[j+half]).
    mode 'mrope' (qwen2vl M-RoPE, ggml_rope_multi): neox pairing, but pair j
    reads one of 4 position streams (t,h,w,e) chosen by its section; pass
    positions [..., T] for text (t=h=w=pos, e=0) or [4, ..., T] multimodal.
    Dims beyond n_dims pass through unrotated.
    """
    import numpy as np

    n_dims = params.n_dims
    head_dim = x.shape[-1]
    inv_freq, mscale = rope_freqs(params)
    if params.mode == "mrope":
        half = n_dims // 2
        sect_dims = sum(params.sections) or half
        bounds = np.cumsum(params.sections or (half,))
        # stream per pair: sector < s0 -> t, < s0+s1 -> h, < +s2 -> w, else e
        stream = np.searchsorted(bounds, np.arange(half) % sect_dims,
                                 side="right")
        if positions.ndim == x.ndim - 2:  # text-only: t=h=w=pos, e=0
            pos4 = jnp.stack([positions, positions, positions,
                              jnp.zeros_like(positions)])
        else:
            pos4 = positions
        # [half, ..., T] -> [..., T, half]
        pos_sel = jnp.moveaxis(pos4[stream], 0, -1).astype(jnp.float32)
        angles = pos_sel * inv_freq[None, :]
    else:
        pos = positions.astype(jnp.float32)[..., :, None]  # [..., T, 1]
        angles = pos * inv_freq[None, :]  # [..., T, half]
    cos = (jnp.cos(angles) * mscale)[..., :, None, :]  # [..., T, 1, half]
    sin = (jnp.sin(angles) * mscale)[..., :, None, :]
    xf = x.astype(jnp.float32)
    rot, rest = xf[..., :n_dims], xf[..., n_dims:]
    if params.mode in ("neox", "mrope"):
        x1 = rot[..., : n_dims // 2]
        x2 = rot[..., n_dims // 2 :]
        out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    else:  # norm: adjacent pairs
        x1 = rot[..., 0::2]
        x2 = rot[..., 1::2]
        r1 = x1 * cos - x2 * sin
        r2 = x1 * sin + x2 * cos
        out = jnp.stack([r1, r2], axis=-1).reshape(rot.shape)
    if rest.shape[-1]:
        out = jnp.concatenate([out, rest], axis=-1)
    return out.astype(x.dtype)


def alibi_slopes(n_head: int, max_bias: float):
    """Per-head ALiBi slopes (ggml SOFT_MAX_EXT semantics,
    ggml-cpu.c:8289-8311): heads beyond the largest power of two get the
    interleaved half-step geometric sequence."""
    import numpy as np

    n_head_log2 = 1 << int(math.floor(math.log2(n_head)))
    m0 = 2.0 ** (-max_bias / n_head_log2)
    m1 = 2.0 ** (-max_bias / 2.0 / n_head_log2)
    out = np.empty(n_head, np.float32)
    for h in range(n_head):
        out[h] = m0 ** (h + 1) if h < n_head_log2 else m1 ** (2 * (h - n_head_log2) + 1)
    return out


def softmax_ext(scores, mask=None, scale: float = 1.0, logit_cap: float = 0.0):
    """Fused scale + mask + (optional tanh soft-cap) + softmax, in f32.

    Mirrors ggml SOFT_MAX_EXT semantics (scale applied before mask add) and
    the Grok/Gemma logit soft-capping hook (llama-graph.cpp:1173-1188).
    """
    s = scores.astype(jnp.float32) * scale
    if logit_cap:
        s = jnp.tanh(s / logit_cap) * logit_cap
    if mask is not None:
        s = s + mask.astype(jnp.float32)
    return jax.nn.softmax(s, axis=-1)
