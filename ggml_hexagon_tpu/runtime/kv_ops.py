"""KV-cache manipulation: context shift, truncation, state serialization.

Reference counterparts:
- context shift: llama_kv_self_seq_add + build_kv_self_shift
  (src/llama-context.cpp:542) — evicted tokens' positions are subtracted
  and cached K is re-rotated *by the delta* (the cache stores rotated K,
  SURVEY §A.1, so a shift is one incremental rotation, not a re-RoPE).
- truncation: llama_kv_self_seq_rm for suffixes (host-side: masking makes
  slots beyond n_past invisible, so truncation is just rewinding n_past).
- state save/load: llama_state_get/set_data (GGSN, llama.h:801) — here the
  KV arrays + bookkeeping serialize via npz with a config fingerprint.
"""
from __future__ import annotations

import io
import json
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import LlamaConfig
from ..ops.basic import apply_rope


@partial(jax.jit, static_argnames=("cfg", "n_keep", "n_discard"), donate_argnames=("kv",))
def kv_shift(cfg: LlamaConfig, kv: dict, n_keep: int, n_discard: int, n_past):
    """Discard cache slots [n_keep, n_keep+n_discard); move the rest down.

    K is re-rotated by -n_discard (positions of moved tokens decrease).
    Returns the new cache; caller rewinds n_past by n_discard.
    Slots beyond the new n_past keep stale data — masked off by attention.
    """
    k, v = kv["k"], kv["v"]  # [L, B, S, H*D] (flat head dim)
    S = k.shape[2]
    src = n_keep + n_discard
    quant = "k_d" in kv
    H = max(cfg.n_head_kv_max, 1)
    D = cfg.hd

    moved_k = k[:, :, src:, :]
    L, B, M = moved_k.shape[:3]
    if quant:  # dequantize the moved K rows before re-rotating
        from ..models.llama import _kv_dequant, _kv_quantize

        bits = 4 if k.dtype == jnp.int4 else 8
        moved_k = _kv_dequant(moved_k, kv["k_d"][:, :, src:], jnp.float32)
    # re-rotate: moved K gets position delta -n_discard applied on top
    delta = jnp.full((1, M), -n_discard, dtype=jnp.int32)
    mk = moved_k.reshape(L * B, M, H, D)
    mk = apply_rope(mk, delta, cfg.rope_params)
    moved_k = mk.reshape(L, B, M, H * D)
    moved_v = v[:, :, src:, :]

    if quant:
        moved_kq, moved_kd = _kv_quantize(moved_k, bits)
        out = {
            "k": jax.lax.dynamic_update_slice(
                k, moved_kq.astype(k.dtype), (0, 0, n_keep, 0)),
            "v": jax.lax.dynamic_update_slice(v, moved_v, (0, 0, n_keep, 0)),
            "k_d": jax.lax.dynamic_update_slice(
                kv["k_d"], moved_kd, (0, 0, n_keep)),
            "v_d": jax.lax.dynamic_update_slice(
                kv["v_d"], kv["v_d"][:, :, src:], (0, 0, n_keep)),
        }
        return out
    k = jax.lax.dynamic_update_slice(k, moved_k.astype(k.dtype), (0, 0, n_keep, 0))
    v = jax.lax.dynamic_update_slice(v, moved_v, (0, 0, n_keep, 0))
    return {"k": k, "v": v}


def save_state(engine, f) -> None:
    """Serialize full context state (kv + positions + sampler-agnostic meta)."""
    close = False
    if isinstance(f, str):
        f = open(f, "wb")
        close = True
    try:
        meta = {
            "magic": "GHTS",  # ggml-hexagon-tpu state
            "version": 1,
            "n_past": engine.n_past,
            "batch": engine.batch,
            "max_seq": engine.max_seq,
            "cfg": {
                "n_vocab": engine.cfg.n_vocab,
                "n_embd": engine.cfg.n_embd,
                "n_layer": engine.cfg.n_layer,
                "n_head": engine.cfg.n_head,
                "n_head_kv": engine.cfg.n_head_kv,
            },
            "cached_tokens": getattr(engine, "cached_tokens", []),
        }
        planes = {}
        for name, arr in engine.kv.items():
            # npz can't hold int4/bf16: widen those; int8/f32 pass through
            if arr.dtype in (jnp.int4, jnp.bfloat16, jnp.float16):
                arr = arr.astype(jnp.float32)
            planes[name] = np.asarray(arr)
        meta["plane_dtypes"] = {n: str(a.dtype) for n, a in planes.items()}
        meta["kv_quant"] = "k_d" in engine.kv
        meta["kv_int4"] = bool(engine.kv["k"].dtype == jnp.int4)
        np.savez(
            f,
            __meta__=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
            **planes,
        )
    finally:
        if close:
            f.close()


def load_state(engine, f) -> None:
    """Restore state saved by save_state; validates the config fingerprint."""
    z = np.load(f if not isinstance(f, str) else f, allow_pickle=False)
    meta = json.loads(bytes(z["__meta__"]).decode())
    if meta.get("magic") != "GHTS":
        raise ValueError("not a saved state file")
    c = meta["cfg"]
    for key, val in c.items():
        if getattr(engine.cfg, key) != val:
            raise ValueError(f"state/model mismatch: {key} {val} vs {getattr(engine.cfg, key)}")
    if meta["max_seq"] != engine.max_seq or meta["batch"] != engine.batch:
        raise ValueError("state shape mismatch (batch/max_seq)")
    if meta.get("kv_quant"):
        it = jnp.int4 if meta.get("kv_int4") else jnp.int8
        engine.kv = {
            "k": jnp.asarray(z["k"], dtype=it),
            "v": jnp.asarray(z["v"], dtype=it),
            "k_d": jnp.asarray(z["k_d"], dtype=jnp.float32),
            "v_d": jnp.asarray(z["v_d"], dtype=jnp.float32),
        }
    else:
        engine.kv = {
            "k": jnp.asarray(z["k"], dtype=engine.kv_dtype),
            "v": jnp.asarray(z["v"], dtype=engine.kv_dtype),
        }
    engine.n_past = int(meta["n_past"])
    engine.cached_tokens = list(meta.get("cached_tokens", []))


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("kv",))
def kv_rerotate(cfg: LlamaConfig, kv: dict, deltas):
    """Re-rotate cached K rows by PER-SLOT position deltas [B, S].

    The general form of the context-shift rotation (the cache stores
    rotated K, SURVEY §A.1): llama_kv_self_seq_add applies a uniform
    delta, llama_kv_self_seq_div (self-extend / grouped attention,
    llama.h:718) a position-dependent one — both are one incremental
    rotation per slot.  Zero-delta slots are exact no-ops for dense
    caches (cos 0 = 1); quantized caches re-round (within q8 noise).
    """
    k = kv["k"]  # [L, B, S, H*D]
    H = max(cfg.n_head_kv_max, 1)
    D = cfg.hd
    L, B, S = k.shape[:3]
    quant = "k_d" in kv
    if quant:
        from ..models.llama import _kv_dequant, _kv_quantize

        bits = 4 if k.dtype == jnp.int4 else 8
        kk = _kv_dequant(k, kv["k_d"], jnp.float32)
    else:
        kk = k.astype(jnp.float32)
    x = kk.reshape(L, B, S, H, D)
    pos = jnp.asarray(deltas, jnp.int32)[None]  # [1, B, S] broadcasts over L
    rot = apply_rope(x, pos, cfg.rope_params).reshape(L, B, S, H * D)
    out = dict(kv)
    if quant:
        q, d = _kv_quantize(rot, bits)
        out["k"] = q.astype(k.dtype)
        out["k_d"] = d
    else:
        out["k"] = rot.astype(k.dtype)
    return out
