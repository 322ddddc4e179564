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
from ..ops.qmatmul import qmatmul, qmatmul_normed, dequantize_jax
from ..ops.basic import RopeParams, apply_rope, gelu, norm, rms_norm, silu, softmax_ext


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
    # --- architecture features (the llm_build_* variation points) ---
    arch: str = "llama"
    attn_bias: bool = False            # qwen2: q/k/v bias vectors
    act: str = "silu"                  # 'silu' | 'gelu'
    embd_scale: float = 1.0            # gemma: sqrt(n_embd)
    norm_plus_one: bool = False        # gemma rmsnorm uses (1 + w)
    post_norms: bool = False           # gemma2: post attn/ffn norms
    attn_logit_softcap: float = 0.0    # gemma2 / grok
    final_logit_softcap: float = 0.0
    swa_window: int = 0                # sliding-window attention width
    swa_pattern: int = 1               # every Nth layer is full-attention
    attn_scale: float = 0.0            # 0 -> 1/sqrt(hd)
    n_expert: int = 0                  # MoE
    n_expert_used: int = 0
    n_ff_exp: int = 0                  # per-expert FFN width (0 -> n_ff)
    norm_topk_prob: bool = True        # renormalize top-k routing weights
    # --- LayerNorm-family variation points (gpt2/gptneox/falcon/phi2/...) ---
    norm_type: str = "rms"             # 'rms' | 'layer'
    rope_n_dims: int = 0               # partial rotary: rotate first n dims (0 -> hd)
    pos_embd: bool = False             # learned absolute position embeddings (gpt2)
    parallel_residual: bool = False    # h += attn_out + ffn_out (gptneox/falcon/phi2)
    shared_ffn_norm: bool = False      # FFN input = attn_norm output (falcon/phi2)
    logit_scale: float = 1.0           # command-r final logit scaling
    pre_norms: bool = True             # olmo2: False -> post-norms only
    alibi_max_bias: float = 0.0        # mpt/bloom/jais: ALiBi attention bias
    clamp_qkv: float = 0.0             # mpt/olmo/dbrx: clamp QKV to [-c, c]
    residual_scale: float = 1.0        # granite/minicpm residual multiplier
    rope_theta_swa: float = 0.0        # gemma3: SWA layers use own rope base
    rope_freq_scale_swa: float = 1.0
    rope_swa_only: bool = False        # cohere2: rope only on SWA layers
    moe_gating: str = "softmax"        # 'softmax' | 'sparsemixer' (phimoe)
    moe_jitter_eps: float = 0.0        # sparsemixer mask threshold
    swin_norm: bool = False            # chameleon: norm attn/ffn OUTPUT pre-residual
    norm_qk_type: str = ""             # chameleon: LayerNorm QK while body is RMS
    n_head_arr: tuple = ()             # deci/openelm: per-layer head counts
    n_head_kv_arr: tuple = ()          # (0 kv heads = linear attn; 0 heads = no attn)
    rope_sections: tuple = ()          # qwen2vl M-RoPE (t,h,w,e) section dims
    # longrope/llama3 per-pair frequency divisors (ggml freq_factors src2):
    # active set + the phi3 long-context alternative (llama-model.cpp:12067-
    # 12078: rope_freqs wins; else long when n_ctx_per_seq > n_ctx_orig)
    rope_ff: tuple = ()
    rope_ff_long: tuple = ()

    def resolve_rope_factors(self, n_ctx: int) -> "LlamaConfig":
        """Pick long-context freq factors when the runtime context exceeds
        the original training context (get_rope_factors callback)."""
        from dataclasses import replace

        if self.rope_ff_long and n_ctx > self.n_ctx_train:
            return replace(self, rope_ff=self.rope_ff_long)
        return self

    def nh(self, il: int) -> int:
        return self.n_head_arr[il] if self.n_head_arr else self.n_head

    def nhkv(self, il: int) -> int:
        return self.n_head_kv_arr[il] if self.n_head_kv_arr else self.n_head_kv

    @property
    def n_head_kv_max(self) -> int:
        return max(self.n_head_kv_arr) if self.n_head_kv_arr else self.n_head_kv

    @property
    def hd(self) -> int:
        return self.head_dim or self.n_embd // self.n_head

    @property
    def rope_params(self) -> RopeParams:
        return RopeParams(
            n_dims=self.rope_n_dims or self.hd,
            mode=self.rope_mode,
            freq_base=self.rope_theta,
            freq_scale=self.rope_freq_scale,
            ext_factor=self.rope_ext_factor,
            attn_factor=self.rope_attn_factor,
            beta_fast=self.rope_beta_fast,
            beta_slow=self.rope_beta_slow,
            n_ctx_orig=self.n_ctx_train,
            freq_factors=self.rope_ff,
            sections=self.rope_sections,
        )

    @property
    def rope_params_swa(self) -> RopeParams:
        """Per-layer rope for SWA layers (gemma3: rope_freq_base_train_swa)."""
        from dataclasses import replace

        return replace(self.rope_params, freq_base=self.rope_theta_swa,
                       freq_scale=self.rope_freq_scale_swa, ext_factor=0.0)

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
    """Load any supported architecture from a GGUFReader into packed arrays.

    Tensor names follow the GGUF convention (gguf-py tensor_mapping).
    Optional per-arch tensors (QKV biases, post-norms, QK norms, stacked
    MoE expert tensors) load when present; output falls back to the tied
    token embedding (reference: llm_load_tensors TOKEN_EMBD reuse).
    """
    from dataclasses import replace

    from .registry import config_from_gguf

    cfg = config_from_gguf(reader.metadata)
    # longrope / llama3 frequency factors (stored on blk.0 in GGUF; the
    # reference duplicates them per layer, llama-model.cpp:1669-1673)
    _ff = {}
    for field, tn in (("rope_ff", "blk.0.rope_freqs.weight"),
                      ("rope_ff", "blk.0.rope_factors_short.weight"),
                      ("rope_ff_long", "blk.0.rope_factors_long.weight")):
        if tn in reader.tensors and not _ff.get(field):
            _ff[field] = tuple(float(x) for x in reader.tensor_f32(tn))
    if _ff:
        cfg = replace(cfg, **_ff)

    def get(name, as_vec=False):
        t = reader.tensors[name]
        if as_vec or (
            t.ggml_type in (GGMLType.F32, GGMLType.F16, GGMLType.BF16) and len(t.ne) == 1
        ):
            return jnp.asarray(reader.tensor_f32(name), dtype=jnp.float32)
        if t.ggml_type in QCONFIGS and t.ne[0] % 256 == 0:
            shape = t.shape
            if len(shape) == 3:  # stacked experts [E, n, k] -> [(E*n), k]
                shape = (shape[0] * shape[1], shape[2])
            if len(shape) == 2:
                qt = pack_tensor(reader.tensor_bytes(name), t.ggml_type, shape)
                return qt.astype_device() if device else qt
        # dense fallback (f16/f32 2-D/3-D, or K not chunk-aligned)
        arr = reader.tensor_f32(name)
        if arr.ndim == 3:
            arr = arr.reshape(arr.shape[0] * arr.shape[1], arr.shape[2])
        return jnp.asarray(arr, dtype=dtype)

    def opt(name, as_vec=False):
        return get(name, as_vec) if name in reader.tensors else None

    layers = []
    for i in range(cfg.n_layer):
        p = f"blk.{i}."
        lw = {}
        if p + "attn_output.weight" in reader.tensors:
            lw["wo"] = get(p + "attn_output.weight")
        if p + "attn_norm.weight" in reader.tensors:
            lw["attn_norm"] = get(p + "attn_norm.weight", as_vec=True)
        if p + "attn_qkv.weight" in reader.tensors:  # fused QKV (gpt2/falcon/neox)
            lw["wqkv"] = get(p + "attn_qkv.weight")
        elif p + "attn_q.weight" in reader.tensors:
            lw["wq"] = get(p + "attn_q.weight")
            lw["wk"] = get(p + "attn_k.weight")
            lw["wv"] = get(p + "attn_v.weight")
        # else: attention-free layer (deci / Llama-3_1-Nemotron-51B)
        if p + "ffn_norm.weight" in reader.tensors:
            lw["ffn_norm"] = get(p + "ffn_norm.weight", as_vec=True)
        for bias, name in (("bqkv", "attn_qkv.bias"), ("bq", "attn_q.bias"),
                           ("bk", "attn_k.bias"), ("bv", "attn_v.bias")):
            a = opt(p + name, as_vec=True)
            if a is not None:
                lw[bias] = a
        for extra, name in (
            ("attn_q_norm", "attn_q_norm.weight"),
            ("attn_k_norm", "attn_k_norm.weight"),
            ("attn_q_norm_b", "attn_q_norm.bias"),
            ("attn_k_norm_b", "attn_k_norm.bias"),
            ("post_attn_norm", "post_attention_norm.weight"),
            ("post_ffn_norm", "post_ffw_norm.weight"),
            # grok names its pre-residual norms differently
            # (llama-arch.cpp:316-317 attn_output_norm / layer_output_norm)
            ("post_attn_norm", "attn_output_norm.weight"),
            ("post_ffn_norm", "layer_output_norm.weight"),
            ("ffn_norm_exps", "ffn_norm_exps.weight"),  # arctic MoE-branch norm
            ("attn_norm_b", "attn_norm.bias"),
            ("ffn_norm_b", "ffn_norm.bias"),
            ("bo", "attn_output.bias"),
            ("ffn_up_b", "ffn_up.bias"),
            ("ffn_down_b", "ffn_down.bias"),
            # bitnet: pre-projection RMS sub-norms + per-tensor quant scales
            # (llm_build_bitnet, llama-model.cpp:9731-9880)
            ("attn_sub_norm", "attn_sub_norm.weight"),
            ("ffn_sub_norm", "ffn_sub_norm.weight"),
            ("wq_scale", "attn_q.scale"),
            ("wk_scale", "attn_k.scale"),
            ("wv_scale", "attn_v.scale"),
            ("wo_scale", "attn_output.scale"),
            ("ffn_gate_scale", "ffn_gate.scale"),
            ("ffn_up_scale", "ffn_up.scale"),
            ("ffn_down_scale", "ffn_down.scale"),
        ):
            a = opt(p + name, as_vec=True)
            if a is not None:
                lw[extra] = a
        if cfg.n_expert and p + "ffn_gate_inp.weight" in reader.tensors:
            # MoE layer (leading dense layers of deepseek-class models fall
            # through to the dense branch — per-layer presence-driven)
            lw["ffn_gate_inp"] = get(p + "ffn_gate_inp.weight")
            lw["ffn_gate_exps"] = get(p + "ffn_gate_exps.weight")
            lw["ffn_up_exps"] = get(p + "ffn_up_exps.weight")
            lw["ffn_down_exps"] = get(p + "ffn_down_exps.weight")
            for sh in ("ffn_gate_inp_shexp", "ffn_gate_shexp",
                       "ffn_up_shexp", "ffn_down_shexp"):
                a = opt(p + sh + ".weight")
                if a is not None:
                    lw[sh] = a
        if p + "ffn_up.weight" in reader.tensors:
            # dense FFN — also alongside MoE for arctic (llm_build_arctic:
            # residual-branch dense MLP + MoE branch normed by ffn_norm_exps)
            g = opt(p + "ffn_gate.weight")
            up = get(p + "ffn_up.weight")
            if g is not None:  # gated (SwiGLU-class); absent for gpt2-class FFN
                lw["ffn_gate"] = g
                lw["ffn_up"] = up
            else:
                rows = up.n if isinstance(up, QTensor) else up.shape[0]
                if cfg.n_ff and rows == 2 * cfg.n_ff:
                    # fused SWIGLU gate_up (chatglm/phi3-style GGUFs,
                    # ggml LLM_FFN_SWIGLU: silu(first half) * second half)
                    lw["w_gateup"] = up
                else:
                    lw["ffn_up"] = up
            lw["ffn_down"] = get(p + "ffn_down.weight")
        layers.append(lw)
    weights = {
        "tok_embd": get("token_embd.weight"),
        "output_norm": opt("output_norm.weight", as_vec=True),
        "output": get("output.weight")
        if "output.weight" in reader.tensors
        else get("token_embd.weight"),
        "layers": layers,
    }
    for extra, name in (
        ("output_norm_b", "output_norm.bias"),
        ("output_b", "output.bias"),
        ("pos_embd", "position_embd.weight"),
        ("tok_norm", "token_embd_norm.weight"),
        ("tok_norm_b", "token_embd_norm.bias"),
    ):
        a = opt(name, as_vec=(extra != "pos_embd"))
        if a is not None:
            weights[extra] = a
    return cfg, weights


def matmul_lora(x, w, lora, **kw):
    """build_lora_mm analog: y = W x + scale * B (A x); lora=(A, B, scale)."""
    y = matmul(x, w, **kw)
    if lora is not None:
        a, b, scale = lora
        down = jax.lax.dot_general(
            x.astype(a.dtype), a, (((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        up = jax.lax.dot_general(
            down.astype(b.dtype), b, (((down.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = y + scale * up.astype(y.dtype)
    return y


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


KV_GROUP = 32  # Q8_0 quantized-KV group size along head_dim

#: CPU-test escape hatch: run the fused decode-attention kernel in pallas
#: interpret mode off-TPU (tests/test_fuse_numerics.py sets this)
FUSED_ATTN_INTERPRET = False

#: same escape hatch for the fused act-mul / residual qmm epilogues
FUSED_EPILOGUE_INTERPRET = False


def init_kv_cache(cfg: LlamaConfig, batch: int, max_seq: int, dtype=jnp.bfloat16):
    """KV cache, stored FLAT as [L, B, S, H*hd].  The flat head dim makes
    every row a full-tile slice for the fused decode-attention kernel
    (ops/decode_attn.py); [B, S, H, hd] views are free XLA reshapes.

    dtype may be a jnp dtype or the strings "q8_0" / "q4_0" for a
    quantized cache (int8 or packed-int4 values + f32 per-32-group scales
    along head_dim — the analog of llama.cpp's type_k/type_v
    cache-quantization, llama-kv-cache.h:188; int4 halves KV HBM again,
    doubling servable context).
    """
    shape = (cfg.n_layer, batch, max_seq, max(cfg.n_head_kv_max, 1) * cfg.hd)
    if dtype in ("q8_0", "q4_0"):
        sshape = shape[:-1]  # per-row scales (see _kv_quantize)
        it = jnp.int8 if dtype == "q8_0" else jnp.int4
        return {
            "k": jnp.zeros(shape, it), "k_d": jnp.zeros(sshape, jnp.float32),
            "v": jnp.zeros(shape, it), "v_d": jnp.zeros(sshape, jnp.float32),
        }
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _kv_quantize(x, bits: int = 8):
    """[..., W] -> (int values [..., W], f32 PER-ROW scales [...]).

    Per-row granularity is the TPU-native choice: the row scale factors
    out of both attention contractions, so int8-KV dequantization inside
    the fused decode kernel is one lane-aligned scaling of the scores and
    probabilities (ops/decode_attn.py) — zero per-element work.
    llama.cpp's 32-element blocks (block_q8_0/q4_0 as cache types,
    llama-kv-cache.h:188) are a CPU-SIMD blocking artifact; the capacity
    win (1 B/elem + 4 B/row) is the same.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    qmax = 7.0 if bits == 4 else 127.0
    d = amax / qmax
    inv = jnp.where(d > 0, 1.0 / jnp.where(d == 0, 1.0, d), 0.0)
    q = jnp.clip(jnp.round(xf * inv[..., None]), -qmax, qmax)
    return q.astype(jnp.int4 if bits == 4 else jnp.int8), d


def _kv_dequant(q, d, dtype):
    """Inverse of _kv_quantize: q [..., W] int, d [...] per-row scales."""
    return (q.astype(jnp.float32) * d[..., None]).astype(dtype)


FLASH_THRESHOLD = 512  # cache sizes from here up use the memory-linear
# flash path: the dense path materializes O(T x S) scores + probs in HBM
# during prefill.  r5 on-chip crossover (tools/prefill_attn_lab.py, 8B
# geometry B=1 T=512 Hkv=8 G=4 D=128, same process): S=512 flash c=128
# 74.2 us/layer vs dense 154.5; S=1024 flash c=128 120.2 vs the former
# c=512 config's 179.5 — flash-from-512 with chunk 128 wins both.
FLASH_CHUNK = 128


def _attention(cfg: LlamaConfig, q, k_all, v_all, pos_start, T, swa: int = 0,
               scale: float = 0.0, logit_softcap: float = 0.0,
               causal: bool = True, cache_pos=None,
               k_scale=None, v_scale=None):
    from ..ops.basic import alibi_slopes

    """GQA attention over the cache prefix.

    q [B, T, n_head, hd]; k_all/v_all [B, S, n_head_kv, hd].
    pos_start: scalar or [B] per-row cache offsets (continuous batching).
    Mask: token t of row b may attend cache slot s iff s <= pos_b + t
    (and, with sliding-window attention, pos_b + t - s < swa).
    cache_pos [B|1, S]: explicit per-slot POSITIONS when they diverge from
    slot indices (self-extend / grouped attention, llama_kv_self_seq_div —
    unwritten slots carry a large sentinel so they stay masked; with it,
    pos_start is the query tokens' POSITION, not the write slot).
    k_scale/v_scale [B, S]: per-slot scales for an int-quantized cache —
    the flash path dequantizes in-chunk (the bf16 cache never exists in
    HBM); the dense path dequantizes here.
    """
    B, _, n_head, hd = q.shape
    S = k_all.shape[1]
    n_kv = k_all.shape[2]  # per-layer KV head count (deci/openelm vary it)
    group = n_head // n_kv
    qg = q.transpose(0, 2, 1, 3).reshape(B, n_kv, group, T, hd)
    k = k_all.transpose(0, 2, 1, 3)  # [B, n_kv, S, hd]
    v = v_all.transpose(0, 2, 1, 3)
    if (S >= FLASH_THRESHOLD and S % FLASH_CHUNK == 0 and not cfg.alibi_max_bias
            and cache_pos is None and causal):
        from ..ops.attention import flash_attention_cache

        out = flash_attention_cache(
            qg, k, v, pos_start, T, scale or 1.0 / float(np.sqrt(hd)),
            swa=swa, logit_cap=logit_softcap, chunk=FLASH_CHUNK,
            k_scale=k_scale, v_scale=v_scale,
        )
        return (
            out.reshape(B, n_head, T, hd).transpose(0, 2, 1, 3)
            .reshape(B, T, n_head * hd)
        )
    if k_scale is not None:  # dense path: dequantize the (small) cache
        k = k.astype(jnp.float32) * k_scale[:, None, :, None]
        v = v.astype(jnp.float32) * v_scale[:, None, :, None]
    scores = jnp.einsum("bhgtd,bhsd->bhgts", qg, k, preferred_element_type=jnp.float32)
    if cache_pos is not None:
        s_idx = jnp.asarray(cache_pos, jnp.int32)[:, None, :]  # [B|1,1,S]
        s_idx = jnp.broadcast_to(s_idx, (s_idx.shape[0], T, S))
    else:
        s_idx = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)[None]
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0)[None]
    pos_b = jnp.reshape(jnp.asarray(pos_start, jnp.int32), (-1, 1, 1))  # [B|1,1,1]
    if causal:
        allowed = s_idx <= (pos_b + t_idx)
    else:
        # llama_set_causal_attn(false) (llama.h): every token sees the whole
        # live prefix (gritlm/embedding mode); padding beyond it stays masked
        allowed = s_idx < (pos_b + T)
    if swa:
        allowed = allowed & ((pos_b + t_idx) - s_idx < swa)
    mask = jnp.where(allowed, 0.0, -jnp.inf)[:, None, None]  # [B|1,1,1,T,S]
    if cfg.alibi_max_bias:
        # ggml softmax_ext ALiBi: bias = -slope_h * |pos_q - pos_s|
        # (ggml-cpu.c:8289-8311; mask built per llama-graph.cpp:403-500)
        slopes = jnp.asarray(alibi_slopes(n_head, cfg.alibi_max_bias))
        sl = slopes.reshape(n_kv, group)[None, :, :, None, None]
        dist = ((pos_b + t_idx) - s_idx).astype(jnp.float32)[:, None, None]
        mask = mask - sl * jnp.abs(dist)
    probs = softmax_ext(
        scores, mask, scale=scale or 1.0 / np.sqrt(hd), logit_cap=logit_softcap
    ).astype(v.dtype)
    out = jnp.einsum("bhgts,bhsd->bhgtd", probs, v, preferred_element_type=jnp.float32)
    return out.reshape(B, n_head, T, hd).transpose(0, 2, 1, 3).reshape(B, T, n_head * hd)


def _fused_decode_layer(cfg, q, k, v, kc, vc, pos_start, nh, nhkv, scale,
                        swa, is_swa_layer, rope, k_scale=None, v_scale=None,
                        flat=None):
    """One decode layer's rope + cache attention through the fused Mosaic
    kernel (ops/decode_attn.fused_decode_attention).  q/k/v are the raw
    [B, 1, n] projection outputs (or `flat` [B, (nh+2*nhkv)*hd] is the
    pre-concatenated row straight off the dual-projection kernel);
    kc/vc the layer's flat cache slices.
    Returns (attn [B, 1, nh*hd], k_row, v_row) — the fresh rows are
    written to the cache by the caller (once for all layers)."""
    from ..ops.basic import rope_freqs
    from ..ops.decode_attn import fused_decode_attention

    if flat is None:
        flat = jnp.concatenate([q[:, 0], k[:, 0], v[:, 0]], axis=-1)
    if cfg.rope_mode == "none" or (cfg.rope_swa_only and not is_swa_layer):
        invf, ms = None, 1.0
    else:
        rope_l = (cfg.rope_params_swa
                  if (cfg.rope_theta_swa and is_swa_layer) else rope)
        invf, ms = rope_freqs(rope_l)
    out, k_r, v_r = fused_decode_attention(
        flat.astype(jnp.float32), kc, vc, pos_start, invf,
        k_scale=k_scale, v_scale=v_scale,
        Hq=nh, Hkv=nhkv, D=cfg.hd, scale=float(scale), mscale=float(ms),
        swa=int(swa), logit_cap=float(cfg.attn_logit_softcap),
        n_dims=cfg.rope_n_dims or cfg.hd,
        interpret=jax.default_backend() != "tpu")
    return out[:, None, :], k_r, v_r


def _kv_write(cache_l, new, pos_start):
    """Write [B, T, H, D] into a cache layer at per-row (or scalar) offset.

    cache_l may be [B, S, H, D] or flat [B, S, H*D] (llama's layout) —
    `new`'s trailing head dims are flattened to match.  Vector offsets
    clip into [0, S-1]; a "parked" row (pos = S-1) funnels all its writes
    into the reserved last slot, which stays masked."""
    B, T = new.shape[:2]
    if cache_l.ndim == 3:  # flat cache: collapse [H, D] -> [H*D]
        new = new.reshape(B, T, -1)
    new = new.astype(cache_l.dtype)
    if jnp.ndim(pos_start) == 0:
        start = (0, pos_start) + (0,) * (cache_l.ndim - 2)
        return jax.lax.dynamic_update_slice(cache_l, new, start)
    S = cache_l.shape[1]
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    cols = jnp.asarray(pos_start, jnp.int32)[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    cols = jnp.clip(cols, 0, S - 1)
    return cache_l.at[rows, cols].set(new)


def qtensor_rows(qt, start: int, n: int):
    """Row-slice a QTensor (used for stacked MoE expert weights).  Fast
    planes slice along their output-feature axis (0 for the interleaved
    layout, 1 for the transposed qp8 layout) so per-expert slices keep
    the Pallas kernel path (parallel/moe.py EP shards)."""
    if isinstance(qt, QTensor):
        def gw(a):
            return None if a is None else a[start:start + n]

        def gf(a):
            if a is None:
                return None
            return a[:, start:start + n] if qt.fl == "t" \
                else a[start:start + n]

        return QTensor(
            qt.cfg, n, qt.k, gw(qt.q), gw(qt.d), gw(qt.qh), gw(qt.sc),
            gw(qt.dmin), gw(qt.m), gf(qt.fq), gf(qt.fs), gf(qt.fb),
            fl=qt.fl)
    return qt[start : start + n]


def _norm_qk(cfg, x, w, b=None):
    """QK-norm with optional type override (chameleon: LayerNorm QK norms in
    an RMS-bodied model, llm_build_chameleon LLM_NORM + f_norm_eps=1e-5).
    2-D weights [n_head, hd] give per-head distinct parameters."""
    t = cfg.norm_qk_type or cfg.norm_type
    if t == "layer":
        return norm(x, w, b, cfg.rms_eps)
    return rms_norm(x, w, cfg.rms_eps)


def _norm(cfg, x, w, b=None):
    """Arch-aware norm: RMSNorm (gemma stores w-1; effective weight is 1+w)
    or LayerNorm with optional bias (gpt2/gptneox/falcon/phi2 class).
    w=None -> non-parametric norm (olmo, llm_build_olmo passes NULL)."""
    if w is None:
        w = jnp.ones((x.shape[-1],), jnp.float32)
    if cfg.norm_type == "layer":
        return norm(x, w, b, cfg.rms_eps)
    ww = (1.0 + w.astype(jnp.float32)) if cfg.norm_plus_one else w
    return rms_norm(x, ww, cfg.rms_eps)


def _act(cfg, x):
    if cfg.act == "gelu":
        return gelu(x)
    if cfg.act == "relu":
        return jax.nn.relu(x)
    if cfg.act == "relu2":  # nemotron LLM_FFN_RELU_SQR
        r = jax.nn.relu(x.astype(jnp.float32))
        return (r * r).astype(x.dtype)
    return silu(x)


def _moe_indirect(cfg, lw, f, topv, topi, compute_dtype, interpret):
    """Gathered top-k expert FFN — the MUL_MAT_ID fast path (ggml.h:1135,
    build_moe_ffn): only the SELECTED experts' packed planes stream from
    HBM, so decode cost scales with n_expert_used rather than n_expert."""
    from ..ops.qmm_fast import qmatmul_fast_indirect

    B, T, d = f.shape
    Kc = cfg.n_expert_used
    n_ff_e = cfg.n_ff_exp or cfg.n_ff
    P = B * T * Kc
    ids = topi.reshape(P)
    xp = jnp.repeat(f.reshape(B * T, d).astype(jnp.float32), Kc, axis=0)
    g = qmatmul_fast_indirect(xp, lw["ffn_gate_exps"], ids, n_ff_e,
                              interpret=interpret)
    u = qmatmul_fast_indirect(xp, lw["ffn_up_exps"], ids, n_ff_e,
                              interpret=interpret)
    gu = _act(cfg, g.astype(compute_dtype)) * u.astype(compute_dtype)
    dly = qmatmul_fast_indirect(gu.astype(jnp.float32),
                                lw["ffn_down_exps"], ids, d,
                                interpret=interpret)
    return jnp.sum(dly.reshape(B, T, Kc, d)
                   * topv[..., None].astype(jnp.float32), axis=2)


def _moe_ffn(cfg, lw, f, compute_dtype, tap=None, il=0,
             force_dense=False):
    """Mixture-of-experts FFN (build_moe_ffn analog, SURVEY §A.3).

    Router softmax -> top-k -> renorm; on the decode fast path the top-k
    experts are GATHERED (qmm_fast indirect kernel, cost ∝ n_expert_used);
    prefill / unsupported configs fall back to the dense all-experts
    evaluation (every expert computed, unselected ones weighted 0 —
    static shapes, no gather/scatter).
    """
    E, K = cfg.n_expert, cfg.n_expert_used
    n_ff_e = cfg.n_ff_exp or cfg.n_ff
    router = matmul(f, lw["ffn_gate_inp"]).astype(jnp.float32)  # [B,T,E]
    if cfg.moe_gating == "sparsemixer":
        # phimoe inference routing (HF modeling_phimoe.sparsemixer eval
        # path): per selection round, mask logits more than 2*eps below the
        # max (relative), softmax over survivors, take the argmax weight.
        # NOTE: deliberate fidelity improvement over the reference, which
        # approximates this with softmax->top2->renorm (llm_build_phi3).
        w_tok = jnp.zeros_like(router)
        s = router
        for _ in range(2):
            mx = jnp.max(s, axis=-1, keepdims=True)
            oh = jax.nn.one_hot(jnp.argmax(s, axis=-1), E, dtype=jnp.float32)
            factor = jnp.maximum(jnp.abs(router), mx)
            masked = jnp.where(
                (mx - s) / factor > 2 * cfg.moe_jitter_eps, -jnp.inf, s)
            p = jax.nn.softmax(masked, axis=-1)
            w_tok = w_tok + jnp.sum(p * oh, axis=-1, keepdims=True) * oh
            s = jnp.where(oh > 0, -jnp.inf, s)
    else:
        probs = jax.nn.softmax(router, axis=-1)
        topv, topi = jax.lax.top_k(probs, K)  # [B,T,K]
        if cfg.norm_topk_prob:
            topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
        interp = FUSED_EPILOGUE_INTERPRET
        B_tot = int(np.prod(f.shape[:-1]))
        if (not force_dense and tap is None and B_tot <= 8
                and (jax.default_backend() == "tpu" or interp)
                and _supports_moe_indirect(cfg, lw)):
            out = _moe_indirect(cfg, lw, f, topv, topi, compute_dtype,
                                interp)
            return (out.astype(compute_dtype)
                    + _shared_expert_out(cfg, lw, f, compute_dtype))
        # dense per-token expert weights (0 outside top-k)
        onehot = jax.nn.one_hot(topi, E, dtype=jnp.float32)  # [B,T,K,E]
        w_tok = jnp.einsum("btk,btke->bte", topv, onehot)  # [B,T,E]
    n_ff, d = n_ff_e, cfg.n_embd
    out = 0.0
    for e in range(E):
        gate_e = qtensor_rows(lw["ffn_gate_exps"], e * n_ff, n_ff)
        up_e = qtensor_rows(lw["ffn_up_exps"], e * n_ff, n_ff)
        down_e = qtensor_rows(lw["ffn_down_exps"], e * d, d)
        if tap is not None:
            # per-expert imatrix accumulation (imatrix.cpp:104-169): each
            # expert's Σx² sums only the tokens ROUTED to it — sel is the
            # routed indicator derived from the gating weights (the
            # reference reads the ids tensor of MUL_MAT_ID)
            sel_e = w_tok[..., e] > 0
            tap(f"blk.{il}.ffn_gate_exps.weight", f, expert=(e, E, sel_e))
            tap(f"blk.{il}.ffn_up_exps.weight", f, expert=(e, E, sel_e))
        g = _act(cfg, matmul(f, gate_e).astype(compute_dtype))
        u = matmul(f, up_e).astype(compute_dtype)
        gu = g * u
        if tap is not None:
            tap(f"blk.{il}.ffn_down_exps.weight", gu,
                expert=(e, E, sel_e))
        dly = matmul(gu, down_e).astype(jnp.float32)
        out = out + dly * w_tok[..., e : e + 1]
    out = out + _shared_expert_out(cfg, lw, f, compute_dtype)
    return out.astype(compute_dtype)


def _shared_expert_out(cfg, lw, f, compute_dtype):
    """Shared-expert branch (deepseek/qwen2moe), added to the routed sum."""
    if "ffn_gate_shexp" not in lw:
        return jnp.zeros((), compute_dtype)
    g = _act(cfg, matmul(f, lw["ffn_gate_shexp"]).astype(compute_dtype))
    u = matmul(f, lw["ffn_up_shexp"]).astype(compute_dtype)
    sh = matmul(g * u, lw["ffn_down_shexp"]).astype(jnp.float32)
    if "ffn_gate_inp_shexp" in lw:  # qwen2moe: sigmoid-gated shared expert
        sg = jax.nn.sigmoid(
            matmul(f, lw["ffn_gate_inp_shexp"]).astype(jnp.float32))
        sh = sg * sh
    # deepseek-class: shared experts added unconditionally
    return sh.astype(compute_dtype)


def _supports_moe_indirect(cfg, lw) -> bool:
    from ..ops.qmm_fast import supports_indirect

    n_ff_e = cfg.n_ff_exp or cfg.n_ff
    return (supports_indirect(lw.get("ffn_gate_exps"), n_ff_e)
            and supports_indirect(lw.get("ffn_up_exps"), n_ff_e)
            and supports_indirect(lw.get("ffn_down_exps"), cfg.n_embd))


def _dense_ffn(cfg, lw, f, compute_dtype, tap=None, il=0, norm_il=None,
               res=None):
    """Dense FFN: gated (SwiGLU/GeGLU), fused gate_up, or no-gate MLP.
    Returns (out, res_consumed).

    norm_il: pre-interleaved ffn_norm weight — when given, f is the RAW
    residual and the RMSNorm fuses into the gate_up qmm kernel.
    res: optional residual row; on the decode fast path it's added
    IN-KERNEL by the fused act+down projection (res_consumed=True)."""
    gu_il = lw.get("w_gateup_il")
    if gu_il is not None:
        # row-permuted gate_up (fuse.interleave_gateup_rows): output halves
        # arrive in ffn_down's interleaved column order
        if tap is not None:
            tap(f"blk.{il}.ffn_gate.weight", f)
            tap(f"blk.{il}.ffn_up.weight", f)
        if norm_il is not None:
            wn_raw = None if cfg.norm_plus_one else lw.get("ffn_norm")
            gu2 = qmatmul_normed(f, gu_il, norm_il, cfg.rms_eps, wn=wn_raw)
        else:
            gu2 = matmul(f, gu_il)
        dn = lw["ffn_down"]
        ng = dn.k
        ffp = "ffp" in lw  # down rows carry the megakernel's il32
        # output permutation; non-megakernel paths un-permute the output
        B_tot = int(np.prod(gu2.shape[:-1]))
        interp = FUSED_EPILOGUE_INTERPRET
        if (tap is None and B_tot <= 8 and dn.fq is not None and not ffp
                and (jax.default_backend() == "tpu" or interp)):
            from ..ops.qmm_fast import qmatmul_fast_act

            out = qmatmul_fast_act(gu2, dn, cfg.act, res=res,
                                   interpret=interp)
            return out.astype(compute_dtype), res is not None
        # prefill / tap path: act-mul on the permuted halves is exact
        # (identical permutation both sides); the fast kernel consumes the
        # interleaved order directly (pre_interleaved) — only the XLA /
        # tap fallbacks pay the un-interleave.  qp8-layout gate_up output
        # is already in natural order (no permutation at load).
        from ..ops.qmm_fast import MAX_FAST_BATCH, qmatmul_fast, uninterleave_cols

        natural = getattr(dn, "fl", "il") == "t"
        gate = _act(cfg, gu2[..., :ng].astype(compute_dtype))
        up = gu2[..., ng:].astype(compute_dtype)
        gu_il2 = gate * up
        if (tap is None and dn.fq is not None and B_tot <= MAX_FAST_BATCH
                and (jax.default_backend() == "tpu" or interp)):
            out = qmatmul_fast(gu_il2, dn, interpret=interp,
                               pre_interleaved=not natural)
            if ffp:
                out = uninterleave_cols(out, 32)
            return out.astype(compute_dtype), False
        gu = gu_il2 if natural else uninterleave_cols(gu_il2, dn.cfg.gs)
        if tap is not None:
            tap(f"blk.{il}.ffn_down.weight", gu)
        out = matmul(gu, dn).astype(compute_dtype)
        if ffp:
            out = uninterleave_cols(out, 32)
        return out, False
    if "ffn_gate" not in lw and "w_gateup" not in lw:
        # no-gate FFN (gpt2 class): down(act(up x + b)) + b
        if tap is not None:
            tap(f"blk.{il}.ffn_up.weight", f)
        up = matmul_lora(f, lw["ffn_up"], lw.get("ffn_up_lora"))
        if "ffn_up_b" in lw:
            up = up + lw["ffn_up_b"]
        gu = _act(cfg, up.astype(compute_dtype))
        if tap is not None:
            tap(f"blk.{il}.ffn_down.weight", gu)
        out = matmul_lora(gu, lw["ffn_down"], lw.get("ffn_down_lora"))
        if "ffn_down_b" in lw:
            out = out + lw["ffn_down_b"]
        return out.astype(compute_dtype), False
    if tap is not None:
        tap(f"blk.{il}.ffn_gate.weight", f)
        tap(f"blk.{il}.ffn_up.weight", f)
    if "w_gateup" in lw:
        if norm_il is not None:  # norm folded into the qmm kernel
            # raw fallback weight only valid when it IS the effective norm
            # weight (gemma stores w-1; the _il plane already carries 1+w)
            wn_raw = None if cfg.norm_plus_one else lw.get("ffn_norm")
            gu2 = qmatmul_normed(f, lw["w_gateup"], norm_il, cfg.rms_eps,
                                 wn=wn_raw).astype(compute_dtype)
        else:
            gu2 = matmul(f, lw["w_gateup"]).astype(compute_dtype)
        ng = cfg.n_ff
        gate = _act(cfg, gu2[..., :ng])
        up = gu2[..., ng:]
    else:
        gate = matmul_lora(f, lw["ffn_gate"], lw.get("ffn_gate_lora"))
        up = matmul_lora(f, lw["ffn_up"], lw.get("ffn_up_lora"))
        if "ffn_gate_scale" in lw:  # bitnet per-tensor quant scales
            gate = gate * lw["ffn_gate_scale"]
        if "ffn_up_scale" in lw:
            up = up * lw["ffn_up_scale"]
        gate = _act(cfg, gate.astype(compute_dtype))
        up = up.astype(compute_dtype)
    gu = gate * up
    if "ffn_sub_norm" in lw:
        # bitnet: RMS sub-norm on gated activations BEFORE down projection
        gu = rms_norm(gu, lw["ffn_sub_norm"], cfg.rms_eps)
    if tap is not None:
        tap(f"blk.{il}.ffn_down.weight", gu)
    out = matmul_lora(gu, lw["ffn_down"], lw.get("ffn_down_lora"))
    if "ffn_down_scale" in lw:
        out = out * lw["ffn_down_scale"]
    return out.astype(compute_dtype), False


def _ffn_out(cfg, lw, f, h_in, compute_dtype, tap=None, il=0, norm_il=None,
             res=None, tp_axis=None):
    """FFN dispatch: MoE, arctic's parallel dense+MoE, or dense.
    Returns (ffn_out, res_consumed) — res (the residual row) is only ever
    consumed by the dense decode fast path (in-kernel add).
    tp_axis: row-parallel ffn_down partials psum here (pre post-norms);
    the in-kernel residual fusion disables (res forced None by caller)."""
    consumed = False
    if "ffn_gate_inp" in lw and "ffn_norm_exps" in lw:
        # arctic: dense MLP on the ffn_norm'd residual branch PLUS an MoE
        # branch computed from the LAYER INPUT normed by ffn_norm_exps
        # (llm_build_arctic, src/llama-model.cpp:9275-9312)
        dense, _ = _dense_ffn(cfg, lw, f, compute_dtype, tap, il)
        moe = _moe_ffn(cfg, lw, _norm(cfg, h_in, lw["ffn_norm_exps"]),
                       compute_dtype, tap, il)
        ffn_out = dense + moe
    elif "ffn_gate_inp" in lw:
        ffn_out = _moe_ffn(cfg, lw, f, compute_dtype, tap, il)
    else:
        if cfg.post_norms or cfg.swin_norm:
            res = None  # output is re-normed before the residual add
        ffn_out, consumed = _dense_ffn(cfg, lw, f, compute_dtype, tap, il,
                                       norm_il, res)
    if tp_axis is not None:
        assert not consumed
        ffn_out = jax.lax.psum(
            ffn_out.astype(jnp.float32), tp_axis).astype(ffn_out.dtype)
    if cfg.post_norms:
        ffn_out = _norm(cfg, ffn_out, lw["post_ffn_norm"])
    if cfg.swin_norm:  # chameleon: ffn_norm applied to output, pre-residual
        ffn_out = _norm(cfg, ffn_out, lw["ffn_norm"])
    return ffn_out, consumed


def _ffn_block(cfg, lw, f, h, h_in, compute_dtype, tap=None, il=0,
               norm_il=None, tp_axis=None):
    """FFN + residual for layers without attention (deci)."""
    if ("ffn_up" not in lw and "ffn_gate_inp" not in lw
            and "w_gateup" not in lw and "w_gateup_il" not in lw):
        return h  # fully pass-through layer
    res = h if (cfg.residual_scale == 1.0 and tp_axis is None) else None
    ffn_out, consumed = _ffn_out(cfg, lw, f, h_in, compute_dtype, tap, il,
                                 norm_il, res, tp_axis)
    h = ffn_out if consumed else h + ffn_out * cfg.residual_scale
    if "cvec" in lw:
        h = h + lw["cvec"].astype(h.dtype)
    return h


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
    input_embeds=None,  # [B, T, n_embd]: raw embeddings (llava image splice)
    causal: bool = True,  # llama_set_causal_attn analog (gritlm embedding)
    cache_pos=None,  # [B|1, S] explicit slot POSITIONS (self-extend)
    write_pos=None,  # storage slot for new rows when != pos_start
    seq_parallel: bool = False,  # KV sharded over a mesh 'sp' axis: keep
    # attention on the GSPMD einsum path (collectives by compiler)
    tp_axis: str | None = None,  # running INSIDE shard_map with col/row-
    # sharded weights (parallel/tp_fast.py): wo/ffn_down partials psum
    # over this axis; in-kernel residual fusions disable (the residual
    # add must follow the reduction)
):
    """One decoder step over T new tokens.  Returns (logits, new_kv_cache).

    logits: [B, T, n_vocab] if logits_all else [B, n_vocab] (at logits_idx
    per row when given, else the last position).
    tap mirrors the reference's scheduler eval-callback hook used by
    imatrix (examples/imatrix/imatrix.cpp:617): it observes the *input*
    of each quantized matmul, keyed by the weight tensor name.

    Arch variation points (feature flags on cfg; reference: the ~60
    llm_build_* graph builders, src/llama-model.cpp): QKV bias, NEOX rope,
    gelu FFN, embedding scaling, (1+w) norms, post-norms, logit softcaps,
    alternating sliding-window attention, MoE FFN.
    """
    if input_embeds is not None:
        B, T = input_embeds.shape[:2]
    else:
        B, T = tokens.shape
    if write_pos is None:
        write_pos = pos_start
    rope = cfg.rope_params
    # pos_start: scalar, or [B] per-row offsets (continuous batching)
    pos_vec = jnp.reshape(jnp.asarray(pos_start, jnp.int32), (-1, 1))
    positions = pos_vec + jnp.arange(T, dtype=jnp.int32)[None, :]  # [B|1, T]
    if input_embeds is not None:
        # raw embeddings are NOT re-scaled (llm_build_gemma3: scale only
        # applies to token inputs, not encoded image embeddings)
        h = input_embeds.astype(compute_dtype)
    else:
        h = embed(weights["tok_embd"], tokens, compute_dtype)
        if cfg.embd_scale != 1.0:
            h = (h.astype(jnp.float32) * cfg.embd_scale).astype(compute_dtype)
    if cfg.pos_embd:  # gpt2-class learned absolute positions
        pe = weights["pos_embd"][jnp.broadcast_to(positions, (B, T))]
        h = (h.astype(jnp.float32) + pe.astype(jnp.float32)).astype(compute_dtype)
    if "tok_norm" in weights:  # bloom word_embeddings_layernorm
        h = _norm(cfg, h, weights["tok_norm"], weights.get("tok_norm_b"))

    scale = cfg.attn_scale or 1.0 / float(np.sqrt(cfg.hd))
    new_k, new_v = [], []
    fused_kv = []  # (il, k_row, v_row) from the fused decode-attn kernel
    quant_kv = "k_d" in kv_cache
    for il, lw in enumerate(weights["layers"]):
        h_in = h  # layer input (arctic's MoE branch norms THIS, not ffn_inp)
        nh, nhkv = cfg.nh(il), cfg.nhkv(il)
        has_attn = ("wq" in lw or "wqkv" in lw or "wqk" in lw) and nhkv > 0
        # pre-interleaved norm planes (fuse.attach_norm_planes) let the
        # decode path fold the RMSNorm into the qmm kernel itself
        fuse_attn_norm = (has_attn and tap is None
                          and "attn_norm_il" in lw
                          and ("wqkv" in lw
                               or ("wqk" in lw and "attn_norm_il_v" in lw)))
        # note: a missing attn_norm tensor still norms when pre_norms (olmo's
        # non-parametric LayerNorm); only deci's attention-free layers skip
        a = (_norm(cfg, h, lw.get("attn_norm"), lw.get("attn_norm_b"))
             if (cfg.pre_norms and not cfg.swin_norm and not fuse_attn_norm
                 and (has_attn or "attn_norm" in lw))
             else h)
        if not has_attn:
            # deci (Llama-3_1-Nemotron-51B): attention-free layer, or
            # "linear attention" = wo applied directly to the normed input
            # (llm_build_deci, src/llama-model.cpp:4383-4398)
            if quant_kv:
                new_k.append((kv_cache["k"][il], kv_cache["k_d"][il]))
                new_v.append((kv_cache["v"][il], kv_cache["v_d"][il]))
            else:
                new_k.append(kv_cache["k"][il])
                new_v.append(kv_cache["v"][il])
            if "wo" in lw and nh > 0:  # linear attention
                attn_out = matmul(a, lw["wo"]).astype(compute_dtype)
                if tp_axis is not None:
                    attn_out = jax.lax.psum(attn_out, tp_axis)
                h = h + attn_out * cfg.residual_scale
            # else: layer input passes through untouched (no residual add)
            fuse_f = "ffn_norm_il" in lw and tap is None
            f = (_norm(cfg, h, lw.get("ffn_norm"), lw.get("ffn_norm_b"))
                 if (cfg.pre_norms and not fuse_f) else h)
            h = _ffn_block(cfg, lw, f, h, h_in, compute_dtype, tap, il,
                           lw["ffn_norm_il"] if fuse_f else None, tp_axis)
            continue
        if tap is not None:
            tap(f"blk.{il}.attn_q.weight", a)
            tap(f"blk.{il}.attn_k.weight", a)
            tap(f"blk.{il}.attn_v.weight", a)
        is_swa_layer = bool(
            cfg.swa_window and (il % cfg.swa_pattern) != cfg.swa_pattern - 1)
        swa = cfg.swa_window if is_swa_layer else 0
        # single-token decode hot path: rope + cache attention in ONE Mosaic
        # launch; the fresh K/V rows collect in fused_kv and are written to
        # the cache once for all layers after the loop (ops/decode_attn.py;
        # "norm"-rope models take this path after fuse.permute_rope_neox)
        use_fused = (
            T == 1 and tap is None and causal
            and (not quant_kv
                 or kv_cache["k"].dtype in (jnp.int8, jnp.int4))
            and cfg.rope_mode in ("neox", "none")
            and not cfg.rope_sections and not cfg.alibi_max_bias
            and nhkv == cfg.n_head_kv_max and nh % nhkv == 0
            and cfg.hd % 128 == 0 and "attn_q_norm" not in lw
            and cache_pos is None and write_pos is pos_start
            and not seq_parallel
            and (jax.default_backend() == "tpu" or FUSED_ATTN_INTERPRET)
        )
        # mixed-type QKV decode: BOTH projections in one dual-format Pallas
        # launch whose output is already the flat q++k++v row (no concat)
        flat_qkv = None
        dual_ok = (
            use_fused and "wqk" in lw and fuse_attn_norm
            and not cfg.clamp_qkv and B <= 8
            and (jax.default_backend() == "tpu" or FUSED_EPILOGUE_INTERPRET)
        )
        if dual_ok:
            from ..ops.qmm_fast import qmatmul_fast_dual, supports_dual

            if supports_dual(lw["wqk"], lw["wv"]):
                wn_raw = None if cfg.norm_plus_one else lw.get("attn_norm")
                flat_qkv = qmatmul_fast_dual(
                    h[:, 0], lw["wqk"], lw["wv"], lw["attn_norm_il"],
                    lw["attn_norm_il_v"], cfg.rms_eps,
                    interpret=FUSED_EPILOGUE_INTERPRET)
                q = k = v = None
        if flat_qkv is not None:
            pass
        elif "wqkv" in lw:  # fused projection (models/fuse.py or GGUF attn_qkv)
            nq = nh * cfg.hd
            nk = nv = nhkv * cfg.hd
            if fuse_attn_norm:  # norm folded into the qmm kernel
                qkv = qmatmul_normed(
                    h, lw["wqkv"], lw["attn_norm_il"], cfg.rms_eps,
                    wn=None if cfg.norm_plus_one else lw.get("attn_norm"))
            else:
                qkv = matmul(a, lw["wqkv"])
            if "bqkv" in lw:
                qkv = qkv + lw["bqkv"]
            q = qkv[..., :nq]
            k = qkv[..., nq : nq + nk]
            v = qkv[..., nq + nk :]
        elif "wqk" in lw:  # mixed-type QKV: fused Q+K, standalone V
            nq = nh * cfg.hd
            if fuse_attn_norm:  # both kernels norm in-kernel (same rms)
                wn_raw = None if cfg.norm_plus_one else lw.get("attn_norm")
                qk = qmatmul_normed(h, lw["wqk"], lw["attn_norm_il"],
                                    cfg.rms_eps, wn=wn_raw)
                v = qmatmul_normed(h, lw["wv"], lw["attn_norm_il_v"],
                                   cfg.rms_eps, wn=wn_raw)
            else:
                qk = matmul(a, lw["wqk"])
                v = matmul(a, lw["wv"])
            q = qk[..., :nq]
            k = qk[..., nq:]
        else:
            q = matmul_lora(a, lw["wq"], lw.get("wq_lora"))
            k = matmul_lora(a, lw["wk"], lw.get("wk_lora"))
            v = matmul_lora(a, lw["wv"], lw.get("wv_lora"))
            if "wq_scale" in lw:  # bitnet per-tensor quant scales
                q = q * lw["wq_scale"]
            if "wk_scale" in lw:
                k = k * lw["wk_scale"]
            if "wv_scale" in lw:
                v = v * lw["wv_scale"]
            if "bq" in lw:
                q = q + lw["bq"]
            if "bk" in lw:
                k = k + lw["bk"]
            if "bv" in lw:
                v = v + lw["bv"]
        if cfg.clamp_qkv and flat_qkv is None:  # mpt/olmo/dbrx f_clamp_kqv
            q = jnp.clip(q, -cfg.clamp_qkv, cfg.clamp_qkv)
            k = jnp.clip(k, -cfg.clamp_qkv, cfg.clamp_qkv)
            v = jnp.clip(v, -cfg.clamp_qkv, cfg.clamp_qkv)
        if use_fused:
            attn, k_r, v_r = _fused_decode_layer(
                cfg, q, k, v, kv_cache["k"][il], kv_cache["v"][il],
                pos_start, nh, nhkv, scale, swa, is_swa_layer, rope,
                k_scale=kv_cache["k_d"][il] if quant_kv else None,
                v_scale=kv_cache["v_d"][il] if quant_kv else None,
                flat=flat_qkv)
            fused_kv.append((il, k_r, v_r))
            if quant_kv:
                new_k.append((kv_cache["k"][il], kv_cache["k_d"][il]))
                new_v.append((kv_cache["v"][il], kv_cache["v_d"][il]))
            else:
                new_k.append(kv_cache["k"][il])
                new_v.append(kv_cache["v"][il])
            attn = attn.astype(compute_dtype)
        else:
            attn = None
        if attn is None:
            if ("attn_q_norm" in lw and lw["attn_q_norm"].ndim == 1
                    and lw["attn_q_norm"].shape[-1] != cfg.hd):
                # olmo2/mpt-style flat QK norms over the projection output
                q = _norm_qk(cfg, q, lw["attn_q_norm"], lw.get("attn_q_norm_b"))
                k = _norm_qk(cfg, k, lw["attn_k_norm"], lw.get("attn_k_norm_b"))
                q = q.reshape(B, T, nh, cfg.hd)
                k = k.reshape(B, T, nhkv, cfg.hd)
            else:
                q = q.reshape(B, T, nh, cfg.hd)
                k = k.reshape(B, T, nhkv, cfg.hd)
                if "attn_q_norm" in lw:
                    # qwen3/command-r/openelm per-head QK norms ([hd] shared,
                    # or chameleon [n_head, hd] per-head distinct LayerNorms)
                    q = _norm_qk(cfg, q, lw["attn_q_norm"], lw.get("attn_q_norm_b"))
                    k = _norm_qk(cfg, k, lw["attn_k_norm"], lw.get("attn_k_norm_b"))
            v = v.reshape(B, T, nhkv, cfg.hd)
            if cfg.rope_mode != "none" and not (cfg.rope_swa_only and not is_swa_layer):
                rope_l = (cfg.rope_params_swa
                          if (cfg.rope_theta_swa and is_swa_layer) else rope)
                # one fused rotation over q++k heads (half the rope kernels
                # per layer; the decode tail is dispatch-bound at
                # ~10us/kernel).  Cache stores rotated K (A.1).
                qk = apply_rope(jnp.concatenate([q, k], axis=2), positions, rope_l)
                q, k = qk[:, :, :nh], qk[:, :, nh:]
            if nhkv < cfg.n_head_kv_max:  # pad into the fixed-width cache
                padw = [(0, 0)] * 4
                padw[2] = (0, cfg.n_head_kv_max - nhkv)
                k = jnp.pad(k, padw)
                v = jnp.pad(v, padw)
            Hmax = max(cfg.n_head_kv_max, 1)
            if quant_kv:
                kv_bits = 4 if kv_cache["k"].dtype == jnp.int4 else 8
                kq, kd = _kv_quantize(k.reshape(B, T, -1), kv_bits)
                vq, vd = _kv_quantize(v.reshape(B, T, -1), kv_bits)
                k_l = _kv_write(kv_cache["k"][il], kq, write_pos)
                v_l = _kv_write(kv_cache["v"][il], vq, write_pos)
                kd_l = _kv_write(kv_cache["k_d"][il], kd, write_pos)
                vd_l = _kv_write(kv_cache["v_d"][il], vd, write_pos)
                new_k.append((k_l, kd_l))
                new_v.append((v_l, vd_l))
                S = k_l.shape[1]
                # int values pass straight through; _attention dequantizes
                # in-chunk (flash) or on the small dense path — the bf16
                # cache never materializes in HBM (SURVEY hard part 4)
                k_full = k_l.reshape(B, S, Hmax, cfg.hd)
                v_full = v_l.reshape(B, S, Hmax, cfg.hd)
                k_sc, v_sc = kd_l, vd_l
            else:
                k_l = _kv_write(kv_cache["k"][il], k, write_pos)
                v_l = _kv_write(kv_cache["v"][il], v, write_pos)
                new_k.append(k_l)
                new_v.append(v_l)
                S = k_l.shape[1]
                k_full = k_l.reshape(B, S, Hmax, cfg.hd)
                v_full = v_l.reshape(B, S, Hmax, cfg.hd)
                k_sc = v_sc = None
            if nhkv < cfg.n_head_kv_max:
                k_full = k_full[:, :, :nhkv]
                v_full = v_full[:, :, :nhkv]
            attn = _attention(
                cfg, q, k_full, v_full, pos_start, T, swa=swa, scale=scale,
                logit_softcap=cfg.attn_logit_softcap, causal=causal,
                cache_pos=cache_pos, k_scale=k_sc, v_scale=v_sc,
            ).astype(compute_dtype)
        if tap is not None:
            tap(f"blk.{il}.attn_output.weight", attn)
        # whole-FFN megakernel: wo+residual -> RMSNorm -> gate_up -> act
        # -> down+residual in ONE Pallas launch (ops/ffn_fused.py); the
        # hidden state streams through in the il32 layout baked into the
        # row-permuted wo/ffn_down planes (fuse.attach_ffn_fused_layout)
        if ("ffp" in lw and T == 1 and B <= 8 and tap is None
                and tp_axis is None and "attn_sub_norm" not in lw
                and (jax.default_backend() == "tpu"
                     or FUSED_EPILOGUE_INTERPRET)):
            from ..ops.ffn_fused import ffn_fused

            h = ffn_fused(
                attn[:, 0].astype(jnp.float32), h[:, 0].astype(jnp.float32),
                lw["wo"], lw["w_gateup_il"], lw["ffn_down"],
                lw["ffn_norm_il"], cfg.rms_eps, act=cfg.act,
                out_dtype=compute_dtype,
                interpret=FUSED_EPILOGUE_INTERPRET)[:, None]
            continue
        if "attn_sub_norm" in lw:
            # bitnet: RMS sub-norm on the attention output BEFORE the output
            # projection (llm_build_bitnet, src/llama-model.cpp:9816-9819)
            attn = rms_norm(attn, lw["attn_sub_norm"], cfg.rms_eps)
        # decode fast path: wo projection with the residual add IN-KERNEL
        # (one fewer XLA op per layer off the dispatch-bound decode tail)
        wo_res = (
            T == 1 and B <= 8 and tap is None and "ffp" not in lw
            and tp_axis is None
            and not any(k in lw for k in ("wo_lora", "wo_scale", "bo"))
            and not cfg.post_norms and not cfg.swin_norm
            and not cfg.parallel_residual and cfg.residual_scale == 1.0
            and isinstance(lw.get("wo"), QTensor) and lw["wo"].fq is not None
            and (jax.default_backend() == "tpu" or FUSED_EPILOGUE_INTERPRET)
        )
        if wo_res:
            from ..ops.qmm_fast import qmatmul_fast_res, supports_fused_epilogue

            wo_res = supports_fused_epilogue(lw["wo"])
        if wo_res:
            attn_out = None
            h = qmatmul_fast_res(
                attn, lw["wo"], h,
                interpret=FUSED_EPILOGUE_INTERPRET).astype(compute_dtype)
        else:
            attn_out = matmul_lora(attn, lw["wo"], lw.get("wo_lora"))
            if "ffp" in lw:
                # ffp layers carry row-permuted wo (megakernel layout);
                # prefill/fallback un-permutes the output once
                from ..ops.qmm_fast import uninterleave_cols

                attn_out = uninterleave_cols(attn_out, 32)
            if "wo_scale" in lw:
                attn_out = attn_out * lw["wo_scale"]
            if "bo" in lw:
                attn_out = attn_out + lw["bo"]
            if tp_axis is not None:
                # row-parallel wo: reduce the per-shard partial sums (the
                # split-buffer gather of llama-model.cpp:317-335, as an
                # ICI all-reduce) in f32, BEFORE the compute-dtype cast
                # and post-norms/residual — cast(psum(f32 partials)) ==
                # the single-device cast of the full f32 sum
                attn_out = jax.lax.psum(
                    attn_out.astype(jnp.float32), tp_axis)
            attn_out = attn_out.astype(compute_dtype)
            if cfg.post_norms:
                attn_out = _norm(cfg, attn_out, lw["post_attn_norm"])
            if cfg.swin_norm:  # chameleon: attn_norm applied to output, pre-residual
                attn_out = _norm(cfg, attn_out, lw["attn_norm"])
        fuse_ffn_norm = ("ffn_norm_il" in lw and tap is None
                         and not cfg.parallel_residual)
        if cfg.parallel_residual:
            # gptneox/falcon/phi2: FFN reads the same residual input as attn
            f = a if cfg.shared_ffn_norm else _norm(
                cfg, h, lw.get("ffn_norm"), lw.get("ffn_norm_b"))
        else:
            if attn_out is not None:
                h = h + attn_out * cfg.residual_scale
            f = (_norm(cfg, h, lw.get("ffn_norm"), lw.get("ffn_norm_b"))
                 if (cfg.pre_norms and not cfg.swin_norm
                     and not fuse_ffn_norm) else h)
        ffn_res = (h if (not cfg.parallel_residual
                         and cfg.residual_scale == 1.0
                         and tp_axis is None) else None)
        ffn_out, ffn_consumed = _ffn_out(
            cfg, lw, f, h_in, compute_dtype, tap, il,
            lw["ffn_norm_il"] if fuse_ffn_norm else None, ffn_res, tp_axis)
        if ffn_consumed:
            h = ffn_out
        elif cfg.parallel_residual:
            h = h + attn_out + ffn_out
        else:
            h = h + ffn_out * cfg.residual_scale
        if "cvec" in lw:  # control-vector steering (llama-adapter cvec)
            h = h + lw["cvec"].astype(h.dtype)
        if tap is not None:  # per-layer hidden state (cb_eval "l_out" analog)
            tap(f"blk.{il}.l_out", h)

    if new_k and isinstance(new_k[0], tuple):
        kv_cache = {
            "k": jnp.stack([a for a, _ in new_k]),
            "k_d": jnp.stack([b for _, b in new_k]),
            "v": jnp.stack([a for a, _ in new_v]),
            "v_d": jnp.stack([b for _, b in new_v]),
        }
    else:
        kv_cache = {"k": jnp.stack(new_k), "v": jnp.stack(new_v)}
    if fused_kv:
        # ONE cache write for all fused layers (the per-layer writes the
        # XLA path pays ~10us each for); parked rows clip into slot S-1
        S = kv_cache["k"].shape[2]
        ks = jnp.stack([kr for _, kr, _ in fused_kv])  # [F, B, HD] f32
        vs = jnp.stack([vr for _, _, vr in fused_kv])
        planes = [("k", ks), ("v", vs)]
        if quant_kv:  # quantize the fresh rows once for all layers
            kv_bits = 4 if kv_cache["k"].dtype == jnp.int4 else 8
            kq, kd = _kv_quantize(ks, kv_bits)
            vq, vd = _kv_quantize(vs, kv_bits)
            planes = [("k", kq), ("v", vq), ("k_d", kd), ("v_d", vd)]
        whole = (jnp.ndim(pos_start) == 0
                 and len(fused_kv) == len(weights["layers"]))
        for name, rows_f in planes:
            dst = kv_cache[name]
            rows_f = jnp.expand_dims(rows_f.astype(dst.dtype), 2)  # [F,B,1,..]
            if whole:
                # the common whole-model case: one dynamic_update_slice
                # (XLA scatters are slow; DUS is an in-place store)
                start = (0, 0, pos_start) + (0,) * (dst.ndim - 3)
                kv_cache[name] = jax.lax.dynamic_update_slice(
                    dst, rows_f, start)
            else:
                pos_vec = jnp.clip(
                    jnp.broadcast_to(jnp.reshape(
                        jnp.asarray(pos_start, jnp.int32), (-1,)), (B,)),
                    0, S - 1)
                ils = jnp.asarray([i for i, _, _ in fused_kv])[:, None]
                rws = jnp.arange(B, dtype=jnp.int32)[None, :]
                cols = jnp.broadcast_to(pos_vec[None, :],
                                        (len(fused_kv), B))
                kv_cache[name] = dst.at[ils, rws, cols].set(rows_f[:, :, 0])
    h = _norm(cfg, h, weights["output_norm"], weights.get("output_norm_b"))
    if not logits_all:
        if logits_idx is not None:
            idx = jnp.asarray(logits_idx, jnp.int32).reshape(B, 1, 1)
            h = jnp.take_along_axis(h, idx, axis=1)[:, 0, :]
        else:
            h = h[:, -1, :]
    if tap is not None:
        tap("output.weight", h)
    logits = matmul_lora(h, weights["output"], weights.get("output_lora"))
    if "output_b" in weights:
        logits = logits + weights["output_b"]
    if cfg.logit_scale != 1.0:
        logits = logits * cfg.logit_scale
    if cfg.final_logit_softcap:
        logits = jnp.tanh(logits / cfg.final_logit_softcap) * cfg.final_logit_softcap
    return logits.astype(jnp.float32), kv_cache
