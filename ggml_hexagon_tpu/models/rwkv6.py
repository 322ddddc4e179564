"""RWKV6 — linear-attention RNN family (WKV6 op).

Reference: llm_build_rwkv6 / build_rwkv6_time_mix / build_rwkv6_channel_mix
(src/llama-model.cpp) and the GGML_OP_RWKV_WKV6 kernel
(ggml/src/ggml-cpu/ggml-cpu.c ggml_compute_forward_rwkv_wkv6_f32):

  per head h, state S[i,j]:
    out[j] = sum_i r[i] * (k[i]*v[j]*first[i] + S[i,j])
    S[i,j] = S[i,j]*w[t,i] + k[i]*v[j]

Layer structure (all LayerNorm):
  h0 = LN(tok_embd[ids])                          (token_embd_norm)
  att = time_mix(LN(h, attn_norm), token-shifted prev)
  h  += att;  h += channel_mix(LN(h, attn_norm_2), shifted)
  every rescale_every layers: h *= 0.5            (weights pre-divided by
  2^(layer//rescale_every) at conversion, like the reference converter)

TPU design: the per-token WKV6 recurrence runs under lax.scan carrying the
per-head state matrix [B,H,N,N]; everything else (token-shift lerps, the
5-way low-rank lerp LoRA, decay LoRA, projections) is batched over T so
the matmuls stay MXU-shaped.  State is explicit (functional), giving
sequence save/restore for free.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..quant.formats import GGMLType
from ..quant.pack import QCONFIGS, pack_tensor
from .llama import matmul, embed


@dataclass(frozen=True)
class RWKV6Config:
    n_vocab: int
    n_embd: int
    n_layer: int
    n_ff: int
    head_size: int = 64
    rescale_every: int = 6
    ln_eps: float = 1e-5
    arch: str = "rwkv6"

    @property
    def n_head(self) -> int:
        return self.n_embd // self.head_size

    @classmethod
    def from_gguf(cls, md: dict) -> "RWKV6Config":
        g = lambda k, d=None: md.get(f"rwkv6.{k}", d)
        n_vocab = g("vocab_size") or len(md.get("tokenizer.ggml.tokens", [])) or 65536
        return cls(
            n_vocab=int(n_vocab),
            n_embd=int(g("embedding_length")),
            n_layer=int(g("block_count")),
            n_ff=int(g("feed_forward_length")),
            head_size=int(g("wkv.head_size", 64)),
            rescale_every=int(g("rescale_every_n_layers", 0)),
            ln_eps=float(g("attention.layer_norm_epsilon", 1e-5)),
        )


def load_rwkv6_weights(reader, dtype=jnp.float32):
    cfg = RWKV6Config.from_gguf(reader.metadata)

    def get(name, vec=False):
        t = reader.tensors[name]
        if vec or len(t.ne) == 1:
            return jnp.asarray(reader.tensor_f32(name), jnp.float32)
        if (t.ggml_type in QCONFIGS and len(t.ne) == 2 and t.ne[0] % 256 == 0):
            return pack_tensor(reader.tensor_bytes(name), t.ggml_type,
                               t.shape).astype_device()
        return jnp.asarray(reader.tensor_f32(name), jnp.float32)

    layers = []
    for i in range(cfg.n_layer):
        p = f"blk.{i}."
        lw = {}
        for nm in ("attn_norm", "attn_norm_2", "time_mix_ln"):
            lw[nm] = get(p + nm + ".weight", True)
            lw[nm + "_b"] = get(p + nm + ".bias", True)
        for nm in ("time_mix_lerp_x", "time_mix_decay", "channel_mix_lerp_k",
                   "channel_mix_lerp_r"):
            lw[nm] = get(p + nm + ".weight", True)
        for nm in ("time_mix_lerp_fused", "time_mix_w1", "time_mix_w2",
                   "time_mix_decay_w1", "time_mix_decay_w2", "time_mix_first",
                   "time_mix_key", "time_mix_value", "time_mix_receptance",
                   "time_mix_gate", "time_mix_output", "channel_mix_key",
                   "channel_mix_value", "channel_mix_receptance"):
            lw[nm] = get(p + nm + ".weight")
        layers.append(lw)
    weights = {
        "tok_embd": get("token_embd.weight"),
        "tok_norm": get("token_embd_norm.weight", True),
        "tok_norm_b": get("token_embd_norm.bias", True),
        "output_norm": get("output_norm.weight", True),
        "output_norm_b": get("output_norm.bias", True),
        "output": get("output.weight"),
        "layers": layers,
    }
    return cfg, weights


def init_rwkv6_state(cfg: RWKV6Config, batch: int, dtype=jnp.float32):
    H, N = cfg.n_head, cfg.head_size
    return {
        "att_shift": jnp.zeros((cfg.n_layer, batch, cfg.n_embd), dtype),
        "ffn_shift": jnp.zeros((cfg.n_layer, batch, cfg.n_embd), dtype),
        "wkv": jnp.zeros((cfg.n_layer, batch, H, N, N), jnp.float32),
    }


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, -1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * w + b


def _group_norm(x, n_head, eps):
    """ggml_norm over each head group (reference uses eps=64e-5)."""
    B, T, C = x.shape
    g = x.reshape(B, T, n_head, C // n_head)
    mu = jnp.mean(g, -1, keepdims=True)
    var = jnp.mean((g - mu) ** 2, -1, keepdims=True)
    return ((g - mu) * jax.lax.rsqrt(var + eps)).reshape(B, T, C)


def wkv6(k, v, r, first, w, state0):
    """The RWKV_WKV6 op.  k,v,r,w: [B,T,H,N] f32; first: [H,N];
    state0: [B,H,N,N] indexed [i=k-dim, j=v-dim].  Returns out [B,T,H,N]
    (over j) and the final state."""
    def step(S, inp):
        k_t, v_t, r_t, w_t = inp  # each [B,H,N]
        kv = jnp.einsum("bhi,bhj->bhij", k_t, v_t)
        out = jnp.einsum("bhi,bhij->bhj", r_t,
                         kv * first[None, :, :, None] + S)
        return S * w_t[..., None] + kv, out

    xs = tuple(a.transpose(1, 0, 2, 3) for a in (k, v, r, w))
    S, outs = jax.lax.scan(step, state0, xs)
    return outs.transpose(1, 0, 2, 3), S


def _token_shift(x, shift):
    """x_prev: the previous token's value per position ([B,T,C]); position 0
    takes the carried state, and the new carry is the last position."""
    prev = jnp.concatenate([shift[:, None, :], x[:, :-1, :]], axis=1)
    return prev, x[:, -1, :]


def forward(cfg: RWKV6Config, weights, tokens, state, logits_all=False,
            compute_dtype=jnp.float32):
    """One step over T tokens.  Returns (logits, new_state)."""
    B, T = tokens.shape
    H, N = cfg.n_head, cfg.head_size
    h = embed(weights["tok_embd"], tokens, jnp.float32)
    h = _ln(h, weights["tok_norm"], weights["tok_norm_b"], cfg.ln_eps)

    new_att, new_ffn, new_wkv = [], [], []
    for il, lw in enumerate(weights["layers"]):
        # ---- time mix ----
        cur = _ln(h, lw["attn_norm"], lw["attn_norm_b"], cfg.ln_eps)
        x_prev, att_carry = _token_shift(cur, state["att_shift"][il])
        sx = x_prev - cur
        xxx = cur + sx * lw["time_mix_lerp_x"]
        lora = jnp.tanh(matmul(xxx.astype(compute_dtype), lw["time_mix_w1"]))
        lora = lora.reshape(B, T, 5, -1)  # [B,T,5,ed]
        # per-branch second projection: w2 [5, n_embd, ed]
        xxx5 = jnp.einsum("btfe,fce->btfc", lora.astype(jnp.float32),
                          lw["time_mix_w2"].astype(jnp.float32))
        mix = xxx5 + lw["time_mix_lerp_fused"][None, None]  # [B,T,5,C]
        xw, xk, xv, xr, xg = [cur + mix[:, :, i] * sx for i in range(5)]
        r = matmul(xr.astype(compute_dtype), lw["time_mix_receptance"])
        k = matmul(xk.astype(compute_dtype), lw["time_mix_key"])
        v = matmul(xv.astype(compute_dtype), lw["time_mix_value"])
        g = matmul(xg.astype(compute_dtype), lw["time_mix_gate"])
        g = (g.astype(jnp.float32) * jax.nn.sigmoid(g.astype(jnp.float32)))
        w = jnp.einsum(
            "btd,cd->btc",
            jnp.tanh(matmul(xw.astype(compute_dtype),
                            lw["time_mix_decay_w1"]).astype(jnp.float32)),
            lw["time_mix_decay_w2"].astype(jnp.float32))
        w = w + lw["time_mix_decay"]
        w = jnp.exp(-jnp.exp(w))
        shaped = lambda a: a.astype(jnp.float32).reshape(B, T, H, N)
        first = lw["time_mix_first"].reshape(H, N).astype(jnp.float32)
        out, S = wkv6(shaped(k), shaped(v), shaped(r), first, w.reshape(B, T, H, N),
                      state["wkv"][il])
        new_wkv.append(S)
        out = out.reshape(B, T, cfg.n_embd)
        out = _group_norm(out, H, 64e-5)
        out = out * lw["time_mix_ln"] + lw["time_mix_ln_b"]
        out = out * g
        att = matmul(out.astype(compute_dtype), lw["time_mix_output"]).astype(jnp.float32)
        new_att.append(att_carry)
        h = h + att
        # ---- channel mix ----
        cur = _ln(h, lw["attn_norm_2"], lw["attn_norm_2_b"], cfg.ln_eps)
        x_prev, ffn_carry = _token_shift(cur, state["ffn_shift"][il])
        new_ffn.append(ffn_carry)
        sx = x_prev - cur
        xk = cur + sx * lw["channel_mix_lerp_k"]
        xr = cur + sx * lw["channel_mix_lerp_r"]
        rr = jax.nn.sigmoid(
            matmul(xr.astype(compute_dtype), lw["channel_mix_receptance"]).astype(jnp.float32))
        kk = jnp.square(jax.nn.relu(
            matmul(xk.astype(compute_dtype), lw["channel_mix_key"]).astype(jnp.float32)))
        h = h + rr * matmul(kk.astype(compute_dtype), lw["channel_mix_value"]).astype(jnp.float32)
        if cfg.rescale_every and (il + 1) % cfg.rescale_every == 0:
            h = h * 0.5

    state = {
        "att_shift": jnp.stack(new_att),
        "ffn_shift": jnp.stack(new_ffn),
        "wkv": jnp.stack(new_wkv),
    }
    h = _ln(h, weights["output_norm"], weights["output_norm_b"], cfg.ln_eps)
    if not logits_all:
        h = h[:, -1, :]
    logits = matmul(h.astype(compute_dtype), weights["output"])
    return logits.astype(jnp.float32), state


def convert_hf_rwkv6(sd, c, out_path, qtype=GGMLType.F16,
                     tokenizer_fields=None):
    """HF rwkv6 checkpoint (rwkv.blocks.N.* naming) -> GGUF.

    Follows the reference converter (convert_hf_to_gguf.py Rwkv6Model):
    w1/decay_w1/decay_w2 transposed to (out,in), the five lerp vectors
    stacked into time_mix_lerp_fused, output/value weights pre-divided by
    2^(layer//rescale_every)."""
    from .convert_hf import _write_gguf

    hidden = int(c["hidden_size"] if isinstance(c, dict) else c.hidden_size)
    gv = (lambda k, d=None: c.get(k, d)) if isinstance(c, dict) else (
        lambda k, d=None: getattr(c, k, d))
    n_layer = int(gv("num_hidden_layers"))
    rescale = int(gv("rescale_every", 6) or 0)
    n_ff = int(gv("intermediate_size") or (hidden * 3.5) // 32 * 32)
    t = {
        "token_embd.weight": sd["rwkv.embeddings.weight"],
        "token_embd_norm.weight": sd["rwkv.blocks.0.pre_ln.weight"],
        "token_embd_norm.bias": sd["rwkv.blocks.0.pre_ln.bias"],
        "output_norm.weight": sd["rwkv.ln_out.weight"],
        "output_norm.bias": sd["rwkv.ln_out.bias"],
        "output.weight": sd["head.weight"],
    }
    for i in range(n_layer):
        p, g = f"rwkv.blocks.{i}.", f"blk.{i}."
        for hf, gg in (("ln1", "attn_norm"), ("ln2", "attn_norm_2")):
            t[g + gg + ".weight"] = sd[p + hf + ".weight"]
            t[g + gg + ".bias"] = sd[p + hf + ".bias"]
        a = p + "attention."
        t[g + "time_mix_lerp_x.weight"] = sd[a + "time_maa_x"].reshape(-1)
        t[g + "time_mix_lerp_fused.weight"] = np.stack(
            [sd[a + f"time_maa_{s}"].reshape(-1) for s in "wkvrg"])
        t[g + "time_mix_w1.weight"] = sd[a + "time_maa_w1"].T  # [5ed, C]
        # HF [5, ed, C] -> [5, C, ed] (out,in) per branch
        t[g + "time_mix_w2.weight"] = sd[a + "time_maa_w2"].transpose(0, 2, 1)
        t[g + "time_mix_first.weight"] = sd[a + "time_faaaa"]
        t[g + "time_mix_decay.weight"] = sd[a + "time_decay"].reshape(-1)
        t[g + "time_mix_decay_w1.weight"] = sd[a + "time_decay_w1"].T
        t[g + "time_mix_decay_w2.weight"] = sd[a + "time_decay_w2"].T
        div = 2.0 ** (i // rescale) if rescale else 1.0
        for hf, gg in (("key", "time_mix_key"), ("value", "time_mix_value"),
                       ("receptance", "time_mix_receptance"),
                       ("gate", "time_mix_gate"), ("output", "time_mix_output")):
            w = sd[a + hf + ".weight"]
            if gg == "time_mix_output":
                w = w / div
            t[g + gg + ".weight"] = w
        t[g + "time_mix_ln.weight"] = sd[a + "ln_x.weight"]
        t[g + "time_mix_ln.bias"] = sd[a + "ln_x.bias"]
        f = p + "feed_forward."
        t[g + "channel_mix_lerp_k.weight"] = sd[f + "time_maa_k"].reshape(-1)
        t[g + "channel_mix_lerp_r.weight"] = sd[f + "time_maa_r"].reshape(-1)
        t[g + "channel_mix_key.weight"] = sd[f + "key.weight"]
        t[g + "channel_mix_receptance.weight"] = sd[f + "receptance.weight"]
        t[g + "channel_mix_value.weight"] = sd[f + "value.weight"] / div
    md = {
        "rwkv6.block_count": n_layer,
        "rwkv6.context_length": 1048576,
        "rwkv6.embedding_length": hidden,
        "rwkv6.feed_forward_length": n_ff,
        "rwkv6.attention.head_count": 0,
        "rwkv6.attention.layer_norm_epsilon": float(gv("layer_norm_epsilon", 1e-5)),
        "rwkv6.wkv.head_size": int(gv("head_size", 64)),
        "rwkv6.rescale_every_n_layers": rescale,
        "rwkv6.vocab_size": int(gv("vocab_size")),
    }
    return _write_gguf(out_path, "rwkv6", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


# =========================================================================
# rwkv6qwen2 (qrwkv: rwkv6 time-mix inside a qwen2-style RMS/SwiGLU model)
# and the rwkv7 family.  References: llm_build_rwkv6qwen2
# (src/llama-model.cpp:10960), llm_build_rwkv7_base/_rwkv7/_arwkv7
# (:11047-11420), GGML_OP_GATED_LINEAR_ATTN (ggml-cpu.c:11520) and
# GGML_OP_RWKV_WKV7 (ggml-cpu.c:11711).
# =========================================================================


def gla(k, v, q, g, state0, scale):
    """GGML_OP_GATED_LINEAR_ATTN: per head, state S[i=k-dim, j=v-dim]:
    S = S*g_i + k_i*v_j; out_j = sum_i q_i*scale*S[i,j]."""
    def step(S, inp):
        k_t, v_t, q_t, g_t = inp  # each [B,H,N]
        S = S * g_t[..., None] + jnp.einsum("bhi,bhj->bhij", k_t, v_t)
        out = jnp.einsum("bhi,bhij->bhj", q_t * scale, S)
        return S, out

    xs = tuple(a.transpose(1, 0, 2, 3) for a in (k, v, q, g))
    S, outs = jax.lax.scan(step, state0, xs)
    return outs.transpose(1, 0, 2, 3), S


def wkv7(r, w, k, v, a, b, state0):
    """GGML_OP_RWKV_WKV7: per head, state S[i=v-dim, j=k-dim]:
    sa_i = sum_j a_j S[i,j];  S = S*w_j + v_i*k_j + sa_i*b_j;
    out_i = sum_j r_j S[i,j].  All inputs [B,T,H,N]; state0 [B,H,N,N]."""
    def step(S, inp):
        r_t, w_t, k_t, v_t, a_t, b_t = inp  # each [B,H,N]
        sa = jnp.einsum("bhj,bhij->bhi", a_t, S)
        S = (S * w_t[:, :, None, :]
             + jnp.einsum("bhi,bhj->bhij", v_t, k_t)
             + jnp.einsum("bhi,bhj->bhij", sa, b_t))
        out = jnp.einsum("bhj,bhij->bhi", r_t, S)
        return S, out

    xs = tuple(x.transpose(1, 0, 2, 3) for x in (r, w, k, v, a, b))
    S, outs = jax.lax.scan(step, state0, xs)
    return outs.transpose(1, 0, 2, 3), S


def _rms(x, w, eps=1e-5):
    xf = x.astype(jnp.float32)
    return xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps) * w


@dataclass(frozen=True)
class RWKV7Config:
    n_vocab: int
    n_embd: int
    n_layer: int
    n_ff: int
    head_size: int = 64
    ln_eps: float = 1e-5
    rms_eps: float = 1e-5
    arch: str = "rwkv7"  # 'rwkv7' | 'arwkv7' | 'rwkv6qwen2'
    n_head_kv: int = 0   # rwkv6qwen2 GQA kv heads (0 -> n_head)

    @property
    def n_head(self) -> int:
        return self.n_embd // self.head_size

    @classmethod
    def from_gguf(cls, md: dict) -> "RWKV7Config":
        arch = md.get("general.architecture", "rwkv7")
        g = lambda k, d=None: md.get(f"{arch}.{k}", d)
        n_vocab = g("vocab_size") or len(md.get("tokenizer.ggml.tokens", [])) or 65536
        return cls(
            n_vocab=int(n_vocab),
            n_embd=int(g("embedding_length")),
            n_layer=int(g("block_count")),
            n_ff=int(g("feed_forward_length")),
            head_size=int(g("wkv.head_size", 64)),
            ln_eps=float(g("attention.layer_norm_epsilon", 1e-5)),
            rms_eps=float(g("attention.layer_norm_rms_epsilon", 1e-5)),
            n_head_kv=int(g("attention.head_count_kv", 0) or 0),
            arch=arch,
        )


def load_rwkv7_weights(reader, dtype=jnp.float32):
    """Loader for rwkv7 / arwkv7 / rwkv6qwen2 GGUFs (tensor tables
    llama-arch.cpp:1246-1340)."""
    cfg = RWKV7Config.from_gguf(reader.metadata)

    def get(name, vec=False):
        t = reader.tensors[name]
        if vec or len(t.ne) == 1:
            return jnp.asarray(reader.tensor_f32(name), jnp.float32)
        if (t.ggml_type in QCONFIGS and len(t.ne) == 2 and t.ne[0] % 256 == 0):
            return pack_tensor(reader.tensor_bytes(name), t.ggml_type,
                               t.shape).astype_device()
        return jnp.asarray(reader.tensor_f32(name), jnp.float32)

    def opt(name, vec=False):
        return get(name, vec) if name in reader.tensors else None

    layers = []
    for i in range(cfg.n_layer):
        p = f"blk.{i}."
        lw = {}
        for nm, vec in (
                ("attn_norm", True), ("attn_norm_b", True),
                ("attn_norm_2", True), ("attn_norm_2_b", True),
                ("time_mix_ln", True), ("time_mix_ln_b", True),
                ("time_mix_w0", True), ("time_mix_a0", True),
                ("time_mix_v0", True), ("time_mix_k_k", True),
                ("time_mix_k_a", True), ("time_mix_r_k", True),
                ("time_mix_lerp_x", True), ("time_mix_decay", True),
                ("channel_mix_lerp_k", True),
                ("time_mix_key_b", True), ("time_mix_value_b", True),
                ("time_mix_receptance_b", True), ("time_mix_first", True),
                ("time_mix_w1", False), ("time_mix_w2", False),
                ("time_mix_a1", False), ("time_mix_a2", False),
                ("time_mix_v1", False), ("time_mix_v2", False),
                ("time_mix_g1", False), ("time_mix_g2", False),
                ("time_mix_decay_w1", False), ("time_mix_decay_w2", False),
                ("time_mix_key", False), ("time_mix_value", False),
                ("time_mix_receptance", False), ("time_mix_gate", False),
                ("time_mix_output", False),
                ("channel_mix_key", False), ("channel_mix_value", False),
                ("ffn_gate", False), ("ffn_up", False), ("ffn_down", False),
                ("ffn_norm", True),
        ):
            gname = nm[:-2] + ".bias" if nm.endswith("_b") else nm + ".weight"
            a = opt(p + gname, vec)
            if a is not None:
                lw[nm] = a
        # fused lerp [n_streams, 1, 1, C] -> [n_streams, C]
        if p + "time_mix_lerp_fused.weight" in reader.tensors:
            arr = reader.tensor_f32(p + "time_mix_lerp_fused.weight")
            lw["time_mix_lerp_fused"] = jnp.asarray(
                arr.reshape(-1, cfg.n_embd), jnp.float32)
        layers.append(lw)
    weights = {
        "tok_embd": get("token_embd.weight"),
        "tok_norm": opt("token_embd_norm.weight", True),
        "tok_norm_b": opt("token_embd_norm.bias", True),
        "output_norm": get("output_norm.weight", True),
        "output_norm_b": opt("output_norm.bias", True),
        "output": get("output.weight"),
        "layers": layers,
    }
    return cfg, weights


def init_rwkv7_state(cfg: RWKV7Config, batch: int, dtype=jnp.float32):
    H, N = cfg.n_head, cfg.head_size
    st = {
        "att_shift": jnp.zeros((cfg.n_layer, batch, cfg.n_embd), dtype),
        "wkv": jnp.zeros((cfg.n_layer, batch, H, N, N), jnp.float32),
    }
    if cfg.arch == "rwkv7":  # token_shift_count == 2
        st["ffn_shift"] = jnp.zeros((cfg.n_layer, batch, cfg.n_embd), dtype)
    return st


def _time_mix7(cfg, lw, cur, x_prev, S0, v_first, compute_dtype):
    """build_rwkv7_time_mix: returns (att_out, new_state, v_first)."""
    B, T, C = cur.shape
    H, N = cfg.n_head, cfg.head_size
    sx = x_prev - cur
    fused = lw["time_mix_lerp_fused"]  # [5 or 6, C]; order r,w,k,v,a[,g]
    has_g = "time_mix_g1" in lw
    mixed = [cur + sx * fused[i] for i in range(fused.shape[0])]
    xr, xw, xk, xv, xa = mixed[:5]
    cd = compute_dtype
    r = matmul(xr.astype(cd), lw["time_mix_receptance"]).astype(jnp.float32)
    w = jnp.einsum(
        "bte,ce->btc",
        jnp.tanh(matmul(xw.astype(cd), lw["time_mix_w1"]).astype(jnp.float32)),
        lw["time_mix_w2"].astype(jnp.float32)) + lw["time_mix_w0"]
    # w = exp(-0.606531 * sigmoid(w))  (soft decay cap, llama-model.cpp:11124)
    w = jnp.exp(-0.606531 * jax.nn.sigmoid(w))
    k = matmul(xk.astype(cd), lw["time_mix_key"]).astype(jnp.float32)
    v = matmul(xv.astype(cd), lw["time_mix_value"]).astype(jnp.float32)
    if v_first is None:
        v_first = v
    else:
        # first-layer value residual gated by the v0/v1/v2 LoRA
        mix = jax.nn.sigmoid(
            jnp.einsum("bte,ce->btc",
                       matmul(xv.astype(cd), lw["time_mix_v1"]).astype(jnp.float32),
                       lw["time_mix_v2"].astype(jnp.float32)) + lw["time_mix_v0"])
        v = v + (v_first - v) * mix
    a = jax.nn.sigmoid(
        jnp.einsum("bte,ce->btc",
                   matmul(xa.astype(cd), lw["time_mix_a1"]).astype(jnp.float32),
                   lw["time_mix_a2"].astype(jnp.float32)) + lw["time_mix_a0"])
    g = None
    if has_g:
        g = jnp.einsum(
            "bte,ce->btc",
            jax.nn.sigmoid(matmul(mixed[5].astype(cd),
                                  lw["time_mix_g1"]).astype(jnp.float32)),
            lw["time_mix_g2"].astype(jnp.float32))
    kk = (k * lw["time_mix_k_k"]).reshape(B, T, H, N)
    kk = kk / jnp.maximum(
        jnp.sqrt(jnp.sum(kk * kk, -1, keepdims=True)), 1e-12)  # ggml_l2_norm
    ka = k * lw["time_mix_k_a"]
    k = k + a * ka - ka
    sh = lambda x: x.reshape(B, T, H, N)
    a_h = sh(a)
    out, S = wkv7(sh(r), sh(w), sh(k), sh(v), -kk, kk * a_h, S0)
    out = out.reshape(B, T, C)
    if "time_mix_ln" in lw:
        out = _group_norm(out, H, 64e-5)
        out = out * lw["time_mix_ln"] + lw["time_mix_ln_b"]
    # rk bonus: out += v * sum_j(k*r*r_k) per head
    rk = jnp.sum(sh(k) * sh(r) * lw["time_mix_r_k"].reshape(H, N), -1,
                 keepdims=True)
    out = out + (sh(v) * rk).reshape(B, T, C)
    if g is not None:
        out = out * g
    att = matmul(out.astype(cd), lw["time_mix_output"]).astype(jnp.float32)
    return att, S, v_first


def forward_rwkv7(cfg: RWKV7Config, weights, tokens, state, logits_all=False,
                  compute_dtype=jnp.float32):
    """rwkv7 (LN + channel-mix) / arwkv7 (RMS + SwiGLU) forward."""
    B, T = tokens.shape
    h = embed(weights["tok_embd"], tokens, jnp.float32)
    is_pure = cfg.arch == "rwkv7"
    if is_pure:
        h = _ln(h, weights["tok_norm"], weights["tok_norm_b"], cfg.ln_eps)

    v_first = None
    new_att, new_ffn, new_wkv = [], [], []
    for il, lw in enumerate(weights["layers"]):
        if is_pure:
            cur = _ln(h, lw["attn_norm"], lw["attn_norm_b"], cfg.ln_eps)
        else:
            cur = _rms(h, lw["attn_norm"], cfg.rms_eps)
        x_prev, att_carry = _token_shift(cur, state["att_shift"][il])
        new_att.append(att_carry)
        att, S, v_first = _time_mix7(cfg, lw, cur, x_prev, state["wkv"][il],
                                     v_first, compute_dtype)
        new_wkv.append(S)
        h = h + att
        if is_pure:
            # rwkv7 channel mix: relu(key x)^2 -> value (no receptance)
            cur = _ln(h, lw["attn_norm_2"], lw["attn_norm_2_b"], cfg.ln_eps)
            x_prev, ffn_carry = _token_shift(cur, state["ffn_shift"][il])
            new_ffn.append(ffn_carry)
            xk = cur + (x_prev - cur) * lw["channel_mix_lerp_k"]
            kk = jnp.square(jax.nn.relu(
                matmul(xk.astype(compute_dtype),
                       lw["channel_mix_key"]).astype(jnp.float32)))
            h = h + matmul(kk.astype(compute_dtype),
                           lw["channel_mix_value"]).astype(jnp.float32)
        else:
            f = _rms(h, lw["ffn_norm"], cfg.rms_eps)
            gate = jax.nn.silu(matmul(f.astype(compute_dtype),
                                      lw["ffn_gate"]).astype(jnp.float32))
            up = matmul(f.astype(compute_dtype), lw["ffn_up"]).astype(jnp.float32)
            h = h + matmul((gate * up).astype(compute_dtype),
                           lw["ffn_down"]).astype(jnp.float32)

    state = {"att_shift": jnp.stack(new_att), "wkv": jnp.stack(new_wkv)}
    if is_pure:
        state["ffn_shift"] = jnp.stack(new_ffn)
        h = _ln(h, weights["output_norm"], weights["output_norm_b"], cfg.ln_eps)
    else:
        h = _rms(h, weights["output_norm"], cfg.rms_eps)
    if not logits_all:
        h = h[:, -1, :]
    logits = matmul(h.astype(compute_dtype), weights["output"])
    return logits.astype(jnp.float32), state


def forward_rwkv6qwen2(cfg: RWKV7Config, weights, tokens, state,
                       logits_all=False, compute_dtype=jnp.float32):
    """rwkv6qwen2 (qrwkv): rwkv6 time-mix with r/k/v biases + GQA repeat +
    sigmoid gate + k*(1-w) inside a qwen2-style RMS/SwiGLU stack, using
    GATED_LINEAR_ATTN with scale head_size^-0.5 (llm_build_rwkv6qwen2)."""
    B, T = tokens.shape
    H, N = cfg.n_head, cfg.head_size
    n_kv = cfg.n_head_kv or H
    h = embed(weights["tok_embd"], tokens, jnp.float32)
    cd = compute_dtype

    new_att, new_wkv = [], []
    for il, lw in enumerate(weights["layers"]):
        cur = _rms(h, lw["attn_norm"], cfg.rms_eps)
        x_prev, att_carry = _token_shift(cur, state["att_shift"][il])
        new_att.append(att_carry)
        sx = x_prev - cur
        xxx = cur + sx * lw["time_mix_lerp_x"]
        lora = jnp.tanh(matmul(xxx.astype(cd), lw["time_mix_w1"]))
        lora = lora.reshape(B, T, 5, -1)
        xxx5 = jnp.einsum("btfe,fce->btfc", lora.astype(jnp.float32),
                          lw["time_mix_w2"].astype(jnp.float32))
        mix = xxx5 + lw["time_mix_lerp_fused"][None, None]
        xw, xk, xv, xr, xg = [cur + mix[:, :, i] * sx for i in range(5)]
        r = matmul(xr.astype(cd), lw["time_mix_receptance"]).astype(jnp.float32)
        k = matmul(xk.astype(cd), lw["time_mix_key"]).astype(jnp.float32)
        v = matmul(xv.astype(cd), lw["time_mix_value"]).astype(jnp.float32)
        if "time_mix_receptance_b" in lw:
            r = r + lw["time_mix_receptance_b"]
        if "time_mix_key_b" in lw:
            k = k + lw["time_mix_key_b"]
        if "time_mix_value_b" in lw:
            v = v + lw["time_mix_value_b"]
        g = matmul(xg.astype(cd), lw["time_mix_gate"]).astype(jnp.float32)
        g = jax.nn.sigmoid(g)  # is_qrwkv: sigmoid not silu
        if n_kv != H:  # GQA: repeat kv heads over groups
            rep = H // n_kv
            k = jnp.repeat(k.reshape(B, T, n_kv, N), rep, 2).reshape(B, T, H * N)
            v = jnp.repeat(v.reshape(B, T, n_kv, N), rep, 2).reshape(B, T, H * N)
        w = jnp.einsum(
            "btd,cd->btc",
            jnp.tanh(matmul(xw.astype(cd),
                            lw["time_mix_decay_w1"]).astype(jnp.float32)),
            lw["time_mix_decay_w2"].astype(jnp.float32))
        w = w + lw["time_mix_decay"]
        w = jnp.exp(-jnp.exp(w))
        k = k * (1.0 - w)  # is_qrwkv pre-scale
        sh = lambda x: x.reshape(B, T, H, N)
        out, S = gla(sh(k), sh(v), sh(r), sh(w), state["wkv"][il],
                     float(N) ** -0.5)
        new_wkv.append(S)
        out = out.reshape(B, T, cfg.n_embd) * g  # no group norm for qrwkv
        att = matmul(out.astype(cd), lw["time_mix_output"]).astype(jnp.float32)
        h = h + att
        f = _rms(h, lw["ffn_norm"], cfg.rms_eps)
        gate = jax.nn.silu(matmul(f.astype(cd), lw["ffn_gate"]).astype(jnp.float32))
        up = matmul(f.astype(cd), lw["ffn_up"]).astype(jnp.float32)
        h = h + matmul((gate * up).astype(cd), lw["ffn_down"]).astype(jnp.float32)

    state = {"att_shift": jnp.stack(new_att), "wkv": jnp.stack(new_wkv)}
    h = _rms(h, weights["output_norm"], cfg.rms_eps)
    if not logits_all:
        h = h[:, -1, :]
    logits = matmul(h.astype(cd), weights["output"])
    return logits.astype(jnp.float32), state


def convert_hf_rwkv7(sd, c, out_path, qtype=GGMLType.F16,
                     tokenizer_fields=None):
    """HF rwkv7 checkpoint -> GGUF (reference: convert_hf_to_gguf.py
    Rwkv7Model).  Name-driven: normalizes blocks/attn/time_mixer/_lora
    spellings, stacks the r/w/k/v/a/g lerp vectors into
    time_mix_lerp_fused, transposes plain-form lora planes to (out,in),
    flattens r_k, and duplicates a0/a1/a2 as v0/v1/v2 on layer 0 (the
    first layer has no value-residual lora)."""
    from .convert_hf import _write_gguf

    gv = (lambda k, d=None: c.get(k, d)) if isinstance(c, dict) else (
        lambda k, d=None: getattr(c, k, d))
    hidden = int(gv("hidden_size"))
    n_layer = int(gv("num_hidden_layers"))
    head_size = int(gv("head_size", None) or gv("head_dim", 64))
    ln_eps = float(gv("layer_norm_epsilon", None) or gv("norm_eps", 1e-5))
    n_ff = int(gv("intermediate_size", None) or hidden * 4)
    wkv_has_gate = bool(gv("wkv_has_gate", True))
    lerp_list = (["r", "w", "k", "v", "a", "g"] if wkv_has_gate
                 else ["r", "w", "k", "v", "a"])

    suffix_map = {
        "attention.w0": "time_mix_w0", "attention.w1": "time_mix_w1",
        "attention.w2": "time_mix_w2", "attention.a0": "time_mix_a0",
        "attention.a1": "time_mix_a1", "attention.a2": "time_mix_a2",
        "attention.v0": "time_mix_v0", "attention.v1": "time_mix_v1",
        "attention.v2": "time_mix_v2", "attention.g1": "time_mix_g1",
        "attention.g2": "time_mix_g2", "attention.k_k": "time_mix_k_k",
        "attention.k_a": "time_mix_k_a", "attention.r_k": "time_mix_r_k",
        "attention.receptance": "time_mix_receptance",
        "attention.r_proj": "time_mix_receptance",
        "attention.key": "time_mix_key",
        "attention.k_proj": "time_mix_key",
        "attention.value": "time_mix_value",
        "attention.v_proj": "time_mix_value",
        "attention.output": "time_mix_output",
        "attention.o_proj": "time_mix_output",
        "attention.ln_x": "time_mix_ln",
        "ln1": "attn_norm", "ln2": "attn_norm_2",
        "feed_forward.x_k": "channel_mix_lerp_k",
        "feed_forward.key": "channel_mix_key",
        "feed_forward.value": "channel_mix_value",
    }
    transpose_lora = {"time_mix_w1", "time_mix_w2", "time_mix_a1",
                      "time_mix_a2", "time_mix_v1", "time_mix_v2",
                      "time_mix_g1", "time_mix_g2"}
    t = {}
    lerps = {}
    lora_form = any("_lora.lora" in k for k in sd)
    for name, arr in sd.items():
        a = np.asarray(arr)
        nm = (name.replace("blocks", "layers")
              .replace("ffn", "feed_forward")
              .replace("self_attn", "attention")
              .replace("attn", "attention")
              .replace("time_mixer.", ""))
        nm = (nm.replace("_lora.lora.0.weight", "1.weight")
              .replace("_lora.lora.2.weight", "2.weight")
              .replace("_lora.lora.2.bias", "0.weight")
              .replace("feed_forward_norm", "ln2")
              .replace("g_norm", "ln_x"))
        if nm in ("model.embeddings.weight", "model.embedding.weight",
                  "embeddings.weight"):
            t["token_embd.weight"] = a
            continue
        if nm.startswith("model.layers.0.pre_norm"):
            t["token_embd_norm" + nm[len("model.layers.0.pre_norm"):]] = a
            continue
        if nm in ("model.norm.weight", "model.ln_out.weight"):
            t["output_norm.weight"] = a
            continue
        if nm in ("model.norm.bias", "model.ln_out.bias"):
            t["output_norm.bias"] = a
            continue
        if nm in ("lm_head.weight", "head.weight"):
            t["output.weight"] = a
            continue
        if not nm.startswith("model.layers."):
            continue
        rest = nm[len("model.layers."):]
        i, _, tail = rest.partition(".")
        i = int(i)
        if tail.startswith("attention.x_"):
            if tail.startswith("attention.x_x"):
                t[f"blk.{i}.time_mix_lerp_fused.weight"] = a.reshape(
                    len(lerp_list), 1, 1, -1)
            else:
                lerps.setdefault(i, {})[tail[len("attention.x_"):]
                                        .split(".")[0]] = a.reshape(-1)
            continue
        stem, _, kind = tail.rpartition(".")
        if kind not in ("weight", "bias"):
            # bare parameters (a0, w0, k_k, x_k, ...) carry no suffix in
            # HF state dicts (reference appends .weight the same way)
            stem, kind = tail, "weight"
        gg = suffix_map.get(stem)
        if gg is None:
            continue
        if i == 0 and gg in ("time_mix_v0", "time_mix_v1", "time_mix_v2"):
            # layer 0 has no value-residual lora: the reference DROPS any
            # source v0/v1/v2 there and emits copies of a0/a1/a2 instead
            # (Rwkv7Model.modify_tensors early return) — skip the source
            # tensors so the a*-copies are deterministically the emitted
            # ones regardless of state-dict iteration order
            continue
        a = np.squeeze(a)
        if not lora_form and gg in transpose_lora and a.ndim == 2:
            a = a.T
        if gg == "time_mix_r_k":
            a = a.reshape(-1)
        t[f"blk.{i}.{gg}.{kind}"] = a
        if i == 0 and gg.startswith("time_mix_a") and gg != "time_mix_ln":
            # dummy value-residual lora on the first layer (reference)
            t[f"blk.0.{gg.replace('time_mix_a', 'time_mix_v')}.{kind}"] = a
    for i, d_ in lerps.items():
        if all(k in d_ for k in lerp_list):
            t[f"blk.{i}.time_mix_lerp_fused.weight"] = np.stack(
                [d_[k] for k in lerp_list]).reshape(len(lerp_list), 1, 1,
                                                    -1)
    def calc_lora_rank(exponent, multiplier):
        # reference Rwkv7Model.calc_lora_rank (convert_hf_to_gguf.py:3603)
        return max(1, round(hidden ** exponent * multiplier / 32)) * 32

    def lora_rank(cfg_keys, tensor, exponent, multiplier):
        """config value > emitted lora plane's small dim > calc fallback."""
        for k in cfg_keys:
            v = gv(k)
            if v is not None:
                return int(v)
        for i in reversed(range(n_layer)):  # layer 0's v-lora is an a-copy
            a = t.get(f"blk.{i}.{tensor}.weight")
            if a is not None and a.ndim == 2:
                return int(min(a.shape))
        return calc_lora_rank(exponent, multiplier)

    md = {
        "rwkv7.block_count": n_layer,
        "rwkv7.context_length": 1048576,
        "rwkv7.embedding_length": hidden,
        "rwkv7.feed_forward_length": n_ff,
        "rwkv7.attention.layer_norm_epsilon": ln_eps,
        "rwkv7.wkv.head_size": head_size,
        "rwkv7.attention.head_count": 0,
        "rwkv7.vocab_size": int(gv("vocab_size", 65536)),
        # lora ranks (reference writes all four, gguf constants
        # DECAY/ICLR/VALUE_RESIDUAL_MIX/GATE_LORA_RANK)
        "rwkv7.attention.decay_lora_rank": lora_rank(
            ("lora_rank_decay", "decay_low_rank_dim"), "time_mix_w1",
            0.5, 1.8),
        "rwkv7.attention.iclr_lora_rank": lora_rank(
            ("lora_rank_iclr", "a_low_rank_dim"), "time_mix_a1", 0.5, 1.8),
        "rwkv7.attention.value_residual_mix_lora_rank": lora_rank(
            ("lora_rank_value_residual_mix", "v_low_rank_dim"),
            "time_mix_v1", 0.5, 1.3),
        "rwkv7.attention.gate_lora_rank": lora_rank(
            ("lora_rank_gate", "gate_low_rank_dim"), "time_mix_g1",
            0.8, 0.6),
    }
    return _write_gguf(out_path, "rwkv7", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)
