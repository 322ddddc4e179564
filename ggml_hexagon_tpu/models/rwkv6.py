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
