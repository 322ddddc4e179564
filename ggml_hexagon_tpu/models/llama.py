"""LLaMA-family model: config, weights, and the functional forward step.

The TPU inversion of the reference's per-op graph interpreter: where
llama.cpp builds a ggml cgraph per ubatch (src/llama-model.cpp:4191
llm_build_llama) and the scheduler dispatches ops to backends, here the
whole decoder step is ONE jitted XLA program per (batch, seq-len) bucket —
quantized matmuls fuse their dequantization, attention reads a preallocated
KV ring, and collectives (when sharded) are inserted by GSPMD.

Covers the LLAMA architecture contract (reference: llm_build_llama):
  RMSNorm -> QKV (quantized matmul) -> RoPE(NORM mode) -> GQA attention
  against the KV cache -> residual -> RMSNorm -> SwiGLU FFN -> residual,
  final RMSNorm -> lm_head.
GQA broadcast follows the reference (no K/V repeat; query heads grouped
over KV heads, llama-graph.cpp:1126).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..quant.formats import GGMLType
from ..quant.pack import QTensor, pack_tensor, QCONFIGS
from ..ops.qmatmul import qmatmul, dequantize_jax
from ..ops.basic import RopeParams, apply_rope, rms_norm, silu, softmax_ext


@dataclass(frozen=True)
class LlamaConfig:
    n_vocab: int
    n_embd: int
    n_layer: int
    n_head: int
    n_head_kv: int
    n_ff: int
    rms_eps: float = 1e-5
    rope_theta: float = 10000.0
    rope_mode: str = "norm"
    rope_freq_scale: float = 1.0
    rope_ext_factor: float = 0.0
    rope_attn_factor: float = 1.0
    rope_beta_fast: float = 32.0
    rope_beta_slow: float = 1.0
    n_ctx_train: int = 2048
    head_dim: int = 0  # 0 -> n_embd // n_head

    @property
    def hd(self) -> int:
        return self.head_dim or self.n_embd // self.n_head

    @property
    def rope_params(self) -> RopeParams:
        return RopeParams(
            n_dims=self.hd,
            mode=self.rope_mode,
            freq_base=self.rope_theta,
            freq_scale=self.rope_freq_scale,
            ext_factor=self.rope_ext_factor,
            attn_factor=self.rope_attn_factor,
            beta_fast=self.rope_beta_fast,
            beta_slow=self.rope_beta_slow,
            n_ctx_orig=self.n_ctx_train,
        )

    @classmethod
    def from_gguf(cls, md: dict) -> "LlamaConfig":
        """Build from GGUF metadata (keys per gguf-py constants, arch llama)."""
        arch = md.get("general.architecture", "llama")
        g = lambda k, d=None: md.get(f"{arch}.{k}", d)
        n_head = int(g("attention.head_count"))
        scaling = g("rope.scaling.type", "none") or "none"
        freq_scale = 1.0
        ext_factor = 0.0
        if scaling == "linear" and g("rope.scaling.factor"):
            freq_scale = 1.0 / float(g("rope.scaling.factor"))
        elif scaling == "yarn" and g("rope.scaling.factor"):
            freq_scale = 1.0 / float(g("rope.scaling.factor"))
            ext_factor = 1.0
        n_vocab = md.get(f"{arch}.vocab_size") or len(md.get("tokenizer.ggml.tokens", [])) or 32000
        return cls(
            n_vocab=int(n_vocab),
            n_embd=int(g("embedding_length")),
            n_layer=int(g("block_count")),
            n_head=n_head,
            n_head_kv=int(g("attention.head_count_kv", n_head)),
            n_ff=int(g("feed_forward_length")),
            rms_eps=float(g("attention.layer_norm_rms_epsilon", 1e-5)),
            rope_theta=float(g("rope.freq_base", 10000.0)),
            rope_freq_scale=freq_scale,
            rope_ext_factor=ext_factor,
            n_ctx_train=int(g("context_length", 2048)),
            head_dim=int(g("attention.key_length", 0)),
        )


# Weights are a plain pytree: dict with a list of per-layer dicts.  QTensor
# leaves carry packed planes; norms are f32 vectors; embeddings may be either.


def load_llama_weights(reader, dtype=jnp.bfloat16, device: bool = True) -> tuple[LlamaConfig, dict]:
    """Load from a GGUFReader into packed device arrays.

    Tensor names follow the GGUF convention (gguf-py tensor_mapping):
    token_embd, blk.%d.{attn_norm,attn_q,attn_k,attn_v,attn_output,
    ffn_norm,ffn_gate,ffn_up,ffn_down}, output_norm, output.
    """
    cfg = LlamaConfig.from_gguf(reader.metadata)

    def get(name, as_vec=False):
        t = reader.tensors[name]
        if as_vec or t.ggml_type in (GGMLType.F32, GGMLType.F16, GGMLType.BF16) and len(t.ne) == 1:
            return jnp.asarray(reader.tensor_f32(name), dtype=jnp.float32)
        if t.ggml_type in QCONFIGS and len(t.ne) == 2 and t.ne[0] % 256 == 0:
            qt = pack_tensor(reader.tensor_bytes(name), t.ggml_type, t.shape)
            return qt.astype_device() if device else qt
        # fall back to dense (f16/f32 2-D tensors, or K not chunk-aligned)
        return jnp.asarray(reader.tensor_f32(name), dtype=dtype)

    layers = []
    for i in range(cfg.n_layer):
        p = f"blk.{i}."
        layers.append(
            {
                "attn_norm": get(p + "attn_norm.weight", as_vec=True),
                "wq": get(p + "attn_q.weight"),
                "wk": get(p + "attn_k.weight"),
                "wv": get(p + "attn_v.weight"),
                "wo": get(p + "attn_output.weight"),
                "ffn_norm": get(p + "ffn_norm.weight", as_vec=True),
                "ffn_gate": get(p + "ffn_gate.weight"),
                "ffn_up": get(p + "ffn_up.weight"),
                "ffn_down": get(p + "ffn_down.weight"),
            }
        )
    weights = {
        "tok_embd": get("token_embd.weight"),
        "output_norm": get("output_norm.weight", as_vec=True),
        "output": get("output.weight")
        if "output.weight" in reader.tensors
        else get("token_embd.weight"),
        "layers": layers,
    }
    return cfg, weights


def matmul(x, w, **kw):
    """Dispatch: QTensor -> fused dequant matmul; dense array -> dot."""
    if isinstance(w, QTensor):
        return qmatmul(x, w, **kw)
    return jax.lax.dot_general(
        x.astype(w.dtype), w, (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.float32)


def embed(tok_embd, ids, dtype=jnp.bfloat16):
    """Row lookup from a (possibly quantized) embedding table."""
    if isinstance(tok_embd, QTensor):
        qt = tok_embd
        flat = ids.reshape(-1)
        gathered = QTensor(
            qt.cfg,
            n=flat.shape[0],
            k=qt.k,
            q=qt.q[flat],
            d=qt.d[flat],
            qh=None if qt.qh is None else qt.qh[flat],
            sc=None if qt.sc is None else qt.sc[flat],
            dmin=None if qt.dmin is None else qt.dmin[flat],
            m=None if qt.m is None else qt.m[flat],
        )
        rows = dequantize_jax(gathered, dtype)
        return rows.reshape(*ids.shape, qt.k)
    return tok_embd[ids].astype(dtype)


def init_kv_cache(cfg: LlamaConfig, batch: int, max_seq: int, dtype=jnp.bfloat16):
    shape = (cfg.n_layer, batch, max_seq, cfg.n_head_kv, cfg.hd)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _attention(cfg: LlamaConfig, q, k_all, v_all, pos_start, T, swa: int = 0):
    """GQA attention over the cache prefix.

    q [B, T, n_head, hd]; k_all/v_all [B, S, n_head_kv, hd].
    pos_start: scalar or [B] per-row cache offsets (continuous batching).
    Mask: token t of row b may attend cache slot s iff s <= pos_b + t
    (and, with sliding-window attention, pos_b + t - s < swa).
    """
    B, _, n_head, hd = q.shape
    S = k_all.shape[1]
    group = n_head // cfg.n_head_kv
    qg = q.transpose(0, 2, 1, 3).reshape(B, cfg.n_head_kv, group, T, hd)
    k = k_all.transpose(0, 2, 1, 3)  # [B, n_kv, S, hd]
    v = v_all.transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhgtd,bhsd->bhgts", qg, k, preferred_element_type=jnp.float32)
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)[None]
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0)[None]
    pos_b = jnp.reshape(jnp.asarray(pos_start, jnp.int32), (-1, 1, 1))  # [B|1,1,1]
    allowed = s_idx <= (pos_b + t_idx)
    if swa:
        allowed = allowed & ((pos_b + t_idx) - s_idx < swa)
    mask = jnp.where(allowed, 0.0, -jnp.inf)[:, None, None]  # [B|1,1,1,T,S]
    probs = softmax_ext(scores, mask, scale=1.0 / np.sqrt(hd)).astype(v.dtype)
    out = jnp.einsum("bhgts,bhsd->bhgtd", probs, v, preferred_element_type=jnp.float32)
    return out.reshape(B, n_head, T, hd).transpose(0, 2, 1, 3).reshape(B, T, n_head * hd)


def _kv_write(cache_l, new, pos_start):
    """Write [B, T, H, D] into cache [B, S, H, D] at per-row (or scalar) offset.

    Vector offsets clip into [0, S-1]; a "parked" row (pos = S-1) funnels
    all its writes into the reserved last slot, which stays masked."""
    if jnp.ndim(pos_start) == 0:
        return jax.lax.dynamic_update_slice(
            cache_l, new.astype(cache_l.dtype), (0, pos_start, 0, 0)
        )
    B, T = new.shape[:2]
    S = cache_l.shape[1]
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    cols = jnp.asarray(pos_start, jnp.int32)[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    cols = jnp.clip(cols, 0, S - 1)
    return cache_l.at[rows, cols].set(new.astype(cache_l.dtype))


def forward(
    cfg: LlamaConfig,
    weights: dict,
    tokens,  # [B, T] int32
    kv_cache: dict,
    pos_start,  # scalar int32: cache slots already filled
    logits_all: bool = False,
    compute_dtype=jnp.bfloat16,
    tap=None,  # optional fn(weight_name, activation) for imatrix collection
    logits_idx=None,  # [B] per-row position whose logits to return
):
    """One decoder step over T new tokens.  Returns (logits, new_kv_cache).

    logits: [B, T, n_vocab] if logits_all else [B, n_vocab] (at logits_idx
    per row when given, else the last position).
    tap mirrors the reference's scheduler eval-callback hook used by
    imatrix (examples/imatrix/imatrix.cpp:617): it observes the *input*
    of each quantized matmul, keyed by the weight tensor name.
    """
    B, T = tokens.shape
    rope = cfg.rope_params
    # pos_start: scalar, or [B] per-row offsets (continuous batching)
    pos_vec = jnp.reshape(jnp.asarray(pos_start, jnp.int32), (-1, 1))
    positions = pos_vec + jnp.arange(T, dtype=jnp.int32)[None, :]  # [B|1, T]
    h = embed(weights["tok_embd"], tokens, compute_dtype)

    new_k, new_v = [], []
    for il, lw in enumerate(weights["layers"]):
        a = rms_norm(h, lw["attn_norm"], cfg.rms_eps)
        if tap is not None:
            tap(f"blk.{il}.attn_q.weight", a)
            tap(f"blk.{il}.attn_k.weight", a)
            tap(f"blk.{il}.attn_v.weight", a)
        q = matmul(a, lw["wq"]).reshape(B, T, cfg.n_head, cfg.hd)
        k = matmul(a, lw["wk"]).reshape(B, T, cfg.n_head_kv, cfg.hd)
        v = matmul(a, lw["wv"]).reshape(B, T, cfg.n_head_kv, cfg.hd)
        q = apply_rope(q, positions, rope)
        k = apply_rope(k, positions, rope)  # cache stores rotated K (A.1)
        k_l = _kv_write(kv_cache["k"][il], k, pos_start)
        v_l = _kv_write(kv_cache["v"][il], v, pos_start)
        new_k.append(k_l)
        new_v.append(v_l)
        attn = _attention(cfg, q, k_l, v_l, pos_start, T).astype(compute_dtype)
        if tap is not None:
            tap(f"blk.{il}.attn_output.weight", attn)
        h = h + matmul(attn, lw["wo"]).astype(compute_dtype)
        f = rms_norm(h, lw["ffn_norm"], cfg.rms_eps)
        if tap is not None:
            tap(f"blk.{il}.ffn_gate.weight", f)
            tap(f"blk.{il}.ffn_up.weight", f)
        gate = silu(matmul(f, lw["ffn_gate"]).astype(compute_dtype))
        up = matmul(f, lw["ffn_up"]).astype(compute_dtype)
        gu = gate * up
        if tap is not None:
            tap(f"blk.{il}.ffn_down.weight", gu)
        h = h + matmul(gu, lw["ffn_down"]).astype(compute_dtype)

    kv_cache = {"k": jnp.stack(new_k), "v": jnp.stack(new_v)}
    h = rms_norm(h, weights["output_norm"], cfg.rms_eps)
    if not logits_all:
        if logits_idx is not None:
            idx = jnp.asarray(logits_idx, jnp.int32).reshape(B, 1, 1)
            h = jnp.take_along_axis(h, idx, axis=1)[:, 0, :]
        else:
            h = h[:, -1, :]
    if tap is not None:
        tap("output.weight", h)
    logits = matmul(h, weights["output"])
    return logits.astype(jnp.float32), kv_cache
