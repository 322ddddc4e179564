"""T5 encoder-decoder family.

Reference counterparts: LLM_ARCH_T5 / T5ENCODER (llm_build_t5,
src/llama-model.cpp) with llama_encode/llama_decode split (llama.h:928).
T5 specifics: RMS layernorm, NO attention scaling (folded into init),
shared relative-position-bias tables (encoder bidirectional buckets,
decoder unidirectional; bias lives in block 0 and is shared), optional
gated-gelu FFN (flan), tied embeddings with a d_model**-0.5 logit scale
when lm_head is absent.

GGUF naming follows the reference: enc.blk.N.* / dec.blk.N.* with
cross_attn_* for the encoder-decoder attention.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..quant.formats import GGMLType
from ..quant.pack import QCONFIGS, pack_tensor
from ..ops.basic import rms_norm
from .llama import matmul, embed


@dataclass(frozen=True)
class T5Config:
    n_vocab: int
    d_model: int
    n_layer: int  # per stack
    n_head: int
    d_kv: int
    d_ff: int
    rel_buckets: int = 32
    rel_max_dist: int = 128
    rms_eps: float = 1e-6
    gated_act: bool = False  # flan-t5: gelu-gated FFN
    tie_lm_head: bool = True
    arch: str = "t5"

    @classmethod
    def from_gguf(cls, md: dict) -> "T5Config":
        arch = md.get("general.architecture", "t5")  # 't5' | 't5encoder'
        g = lambda k, d=None: md.get(f"{arch}.{k}", d)
        n_vocab = g("vocab_size") or len(md.get("tokenizer.ggml.tokens", [])) or 32128
        return cls(
            n_vocab=int(n_vocab),
            d_model=int(g("embedding_length")),
            n_layer=int(g("block_count")),
            n_head=int(g("attention.head_count")),
            d_kv=int(g("attention.key_length")),
            d_ff=int(g("feed_forward_length")),
            rel_buckets=int(g("attention.relative_buckets_count", 32)),
            rms_eps=float(g("attention.layer_norm_epsilon", 1e-6)),
            gated_act=bool(g("feed_forward.gated", False)),
            arch=arch,
        )


def _rel_bucket(rel_pos, bidirectional: bool, n_buckets: int, max_dist: int):
    """T5 relative-position bucketing (exact HF semantics)."""
    ret = 0
    n = -rel_pos
    if bidirectional:
        n_buckets //= 2
        ret = jnp.where(n < 0, n_buckets, 0)
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = n_buckets // 2
    is_small = n < max_exact
    large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_dist / max_exact)
        * (n_buckets - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, n_buckets - 1)
    return ret + jnp.where(is_small, n, large)


def _pos_bias(bias_table, q_len, k_len, bidirectional, n_buckets, max_dist,
              q_offset=0):
    """[1, n_head, q_len, k_len] additive bias from the bucket embedding."""
    ctx = jnp.arange(q_len, dtype=jnp.int32)[:, None] + q_offset
    mem = jnp.arange(k_len, dtype=jnp.int32)[None, :]
    rel = mem - ctx  # memory - context
    buckets = _rel_bucket(rel, bidirectional, n_buckets, max_dist)
    bias = bias_table[buckets]  # [q, k, n_head]
    return bias.transpose(2, 0, 1)[None]


def _t5_attention(cfg, lw, prefix, x, kv_x, mask, bias):
    """T5 multi-head attention (no 1/sqrt(d) scaling). x [B, T, d]."""
    B, T, _ = x.shape
    S = kv_x.shape[1]
    H, dk = cfg.n_head, cfg.d_kv
    q = matmul(x, lw[prefix + "_q"]).reshape(B, T, H, dk).transpose(0, 2, 1, 3)
    k = matmul(kv_x, lw[prefix + "_k"]).reshape(B, S, H, dk).transpose(0, 2, 1, 3)
    v = matmul(kv_x, lw[prefix + "_v"]).reshape(B, S, H, dk).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
    if bias is not None:
        s = s + bias
    if mask is not None:
        s = s + mask
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    o = jnp.einsum("bhts,bhsd->bhtd", p, v, preferred_element_type=jnp.float32)
    o = o.transpose(0, 2, 1, 3).reshape(B, T, H * dk)
    return matmul(o, lw[prefix + "_o"]).astype(jnp.float32)


def _t5_ffn(cfg, lw, x):
    if cfg.gated_act:
        g = jax.nn.gelu(matmul(x, lw["ffn_gate"]).astype(jnp.float32), approximate=False)
        u = matmul(x, lw["ffn_up"]).astype(jnp.float32)
        h = g * u
    else:
        h = jax.nn.relu(matmul(x, lw["ffn_up"]).astype(jnp.float32))
    return matmul(h, lw["ffn_down"]).astype(jnp.float32)


def encode(cfg: T5Config, weights, tokens):
    """Encoder stack: tokens [B, T] -> hidden [B, T, d]."""
    h = embed(weights["tok_embd"], tokens, jnp.float32)
    bias = _pos_bias(weights["enc_rel_bias"], tokens.shape[1], tokens.shape[1],
                     True, cfg.rel_buckets, cfg.rel_max_dist)
    for lw in weights["enc_layers"]:
        a = rms_norm(h, lw["attn_norm"], cfg.rms_eps)
        h = h + _t5_attention(cfg, lw, "attn", a, a, None, bias)
        f = rms_norm(h, lw["ffn_norm"], cfg.rms_eps)
        h = h + _t5_ffn(cfg, lw, f)
    return rms_norm(h, weights["enc_output_norm"], cfg.rms_eps)


def decode(cfg: T5Config, weights, tokens, enc_out, logits_all: bool = True):
    """Decoder stack (full-sequence; KV-cached incremental path planned).
    tokens [B, T]; enc_out [B, S, d] -> logits."""
    B, T = tokens.shape
    h = embed(weights["tok_embd"], tokens, jnp.float32)
    self_bias = _pos_bias(weights["dec_rel_bias"], T, T, False,
                          cfg.rel_buckets, cfg.rel_max_dist)
    causal = jnp.where(
        jnp.arange(T)[None, :] <= jnp.arange(T)[:, None], 0.0, -1e30
    )[None, None]
    for lw in weights["dec_layers"]:
        a = rms_norm(h, lw["attn_norm"], cfg.rms_eps)
        h = h + _t5_attention(cfg, lw, "attn", a, a, causal, self_bias)
        c = rms_norm(h, lw["cross_attn_norm"], cfg.rms_eps)
        h = h + _t5_attention(cfg, lw, "cross_attn", c, enc_out, None, None)
        f = rms_norm(h, lw["ffn_norm"], cfg.rms_eps)
        h = h + _t5_ffn(cfg, lw, f)
    h = rms_norm(h, weights["dec_output_norm"], cfg.rms_eps)
    if not logits_all:
        h = h[:, -1, :]
    if weights.get("output") is not None:
        logits = matmul(h, weights["output"])
    else:  # tied: logits scaled by d_model**-0.5 (HF T5 semantics)
        logits = matmul(h * (cfg.d_model ** -0.5), weights["tok_embd"])
    return logits.astype(jnp.float32)


def load_t5_weights(reader, dtype=jnp.float32):
    cfg = T5Config.from_gguf(reader.metadata)

    def get(name):
        t = reader.tensors[name]
        if t.ggml_type in QCONFIGS and len(t.ne) == 2 and t.ne[0] % 256 == 0:
            return pack_tensor(reader.tensor_bytes(name), t.ggml_type, t.shape).astype_device()
        return jnp.asarray(reader.tensor_f32(name), dtype=dtype)

    def stack(side, n):
        layers = []
        for i in range(n):
            p = f"{side}.blk.{i}."
            lw = {
                "attn_norm": get(p + "attn_norm.weight"),
                "attn_q": get(p + "attn_q.weight"),
                "attn_k": get(p + "attn_k.weight"),
                "attn_v": get(p + "attn_v.weight"),
                "attn_o": get(p + "attn_o.weight"),
                "ffn_norm": get(p + "ffn_norm.weight"),
                "ffn_up": get(p + "ffn_up.weight"),
                "ffn_down": get(p + "ffn_down.weight"),
            }
            if cfg.gated_act:
                lw["ffn_gate"] = get(p + "ffn_gate.weight")
            if side == "dec":
                lw["cross_attn_norm"] = get(p + "cross_attn_norm.weight")
                lw["cross_attn_q"] = get(p + "cross_attn_q.weight")
                lw["cross_attn_k"] = get(p + "cross_attn_k.weight")
                lw["cross_attn_v"] = get(p + "cross_attn_v.weight")
                lw["cross_attn_o"] = get(p + "cross_attn_o.weight")
            layers.append(lw)
        return layers

    weights = {
        "tok_embd": get("token_embd.weight"),
        "enc_rel_bias": get("enc.blk.0.attn_rel_b.weight"),
        "enc_output_norm": get("enc.output_norm.weight"),
        "output": get("output.weight") if "output.weight" in reader.tensors else None,
        "enc_layers": stack("enc", cfg.n_layer),
    }
    if cfg.arch != "t5encoder":  # T5ENCODER: encoder-only (llm_build_t5_enc)
        weights["dec_rel_bias"] = get("dec.blk.0.attn_rel_b.weight")
        weights["dec_output_norm"] = get("dec.output_norm.weight")
        weights["dec_layers"] = stack("dec", cfg.n_layer)
    return cfg, weights


def convert_hf_t5(state_dict: dict, hf_config, out_path: str,
                  qtype: GGMLType = GGMLType.F32,
                  tokenizer_fields: dict | None = None,
                  arch: str = "t5"):
    from ..gguf.writer import GGUFWriter

    c = hf_config
    gated = "gated" in getattr(c, "feed_forward_proj", "relu")
    w = GGUFWriter()
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", int(c.num_layers))
    w.add(f"{arch}.embedding_length", int(c.d_model))
    w.add(f"{arch}.feed_forward_length", int(c.d_ff))
    w.add(f"{arch}.attention.head_count", int(c.num_heads))
    w.add(f"{arch}.attention.key_length", int(c.d_kv))
    w.add(f"{arch}.attention.relative_buckets_count", int(c.relative_attention_num_buckets))
    w.add(f"{arch}.attention.layer_norm_epsilon", float(c.layer_norm_epsilon))
    w.add(f"{arch}.vocab_size", int(c.vocab_size))
    w.add(f"{arch}.feed_forward.gated", gated)
    w.add(f"{arch}.context_length", 512)
    for k, v in (tokenizer_fields or {}).items():
        w.add(k, v)
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def emit(name, arr, q=False):
        arr = np.ascontiguousarray(arr, np.float32)
        t = qtype if (q and arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    emit("token_embd.weight", sd["shared.weight"], q=True)
    sides = ((("enc", "encoder"),) if arch == "t5encoder"
             else (("enc", "encoder"), ("dec", "decoder")))
    for side, hf_side in sides:
        for i in range(int(c.num_layers)):
            hb = f"{hf_side}.block.{i}.layer."
            gb = f"{side}.blk.{i}."
            emit(gb + "attn_norm.weight", sd[hb + "0.layer_norm.weight"])
            for qk in ("q", "k", "v", "o"):
                emit(gb + f"attn_{qk}.weight", sd[hb + f"0.SelfAttention.{qk}.weight"], q=True)
            if i == 0:
                emit(gb + "attn_rel_b.weight",
                     sd[hb + "0.SelfAttention.relative_attention_bias.weight"])
            ffn_idx = 2 if side == "dec" else 1
            if side == "dec":
                emit(gb + "cross_attn_norm.weight", sd[hb + "1.layer_norm.weight"])
                for qk in ("q", "k", "v", "o"):
                    emit(gb + f"cross_attn_{qk}.weight",
                         sd[hb + f"1.EncDecAttention.{qk}.weight"], q=True)
            emit(gb + "ffn_norm.weight", sd[hb + f"{ffn_idx}.layer_norm.weight"])
            dd = f"{ffn_idx}.DenseReluDense."
            if gated:
                emit(gb + "ffn_gate.weight", sd[hb + dd + "wi_0.weight"], q=True)
                emit(gb + "ffn_up.weight", sd[hb + dd + "wi_1.weight"], q=True)
            else:
                emit(gb + "ffn_up.weight", sd[hb + dd + "wi.weight"], q=True)
            emit(gb + "ffn_down.weight", sd[hb + dd + "wo.weight"], q=True)
    emit("enc.output_norm.weight", sd["encoder.final_layer_norm.weight"])
    if arch != "t5encoder":
        emit("dec.output_norm.weight", sd["decoder.final_layer_norm.weight"])
    if "lm_head.weight" in sd and not getattr(c, "tie_word_embeddings", True):
        emit("output.weight", sd["lm_head.weight"], q=True)
    w.write_file(out_path)
    return out_path


def convert_hf_t5encoder(state_dict, hf_config, out_path,
                         qtype=GGMLType.F32, tokenizer_fields=None):
    """T5EncoderModel -> GGUF (t5encoder arch; reference: T5EncoderModel
    converter / llm_build_t5_enc — encoder-only, used via llama_encode)."""
    return convert_hf_t5(state_dict, hf_config, out_path, qtype=qtype,
                         tokenizer_fields=tokenizer_fields, arch="t5encoder")
