"""BERT encoder family — embedding models (WPM tokenizer).

The reference supports three BERT variants (llama-arch.h: BERT,
NOMIC_BERT, JINA_BERT_V2) built by llm_build_bert
(src/llama-model.cpp) with bidirectional attention and no KV cache
(build_attn_inp_no_cache).  Architecture is post-LN:

  h = LN(tok_embd + pos_embd + type_embd)          (token_embd_norm)
  per layer:  h = LN(h + attn(h))                  (attn_output_norm)
              h = LN(h + ffn_gelu(h))              (layer_output_norm)
  pooling: cls / mean (+ optional cls head: cls, cls.output)

TPU design: whole-encoder jit, one shot — no ring buffers or position
offsets; padding handled by an additive mask like ggml's KQ mask
(llama-graph.cpp:403, non-causal branch).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..quant.formats import GGMLType
from ..quant.pack import QCONFIGS, pack_tensor
from .llama import matmul


@dataclass(frozen=True)
class BertConfig:
    n_vocab: int
    n_embd: int
    n_layer: int
    n_head: int
    n_ff: int
    ln_eps: float = 1e-12
    n_ctx_train: int = 512
    n_token_types: int = 2
    arch: str = "bert"
    # --- nomic_bert / jina_bert_v2 variation points (llm_build_bert) ---
    n_head_kv: int = 0               # 0 -> n_head
    rope: bool = False               # nomic: NEOX rope, no learned positions
    rope_theta: float = 10000.0
    fused_qkv: bool = False          # nomic: single wqkv, no biases
    ffn_gated: bool = False          # nomic (silu) / jina (gelu) gated FFN
    act: str = "gelu"
    alibi_max_bias: float = 0.0      # jina v2: 8.0 (hardcoded in load_hparams)

    @property
    def hd(self) -> int:
        return self.n_embd // self.n_head

    @property
    def nhkv(self) -> int:
        return self.n_head_kv or self.n_head

    @classmethod
    def from_gguf(cls, md: dict) -> "BertConfig":
        arch = md.get("general.architecture", "bert")
        g = lambda k, d=None: md.get(f"{arch}.{k}", d)
        n_vocab = md.get(f"{arch}.vocab_size") or len(
            md.get("tokenizer.ggml.tokens", [])) or 30522
        extra = {}
        if arch == "nomic_bert":
            # llm_build_bert nomic branch: fused wqkv + NEOX rope + gated
            # silu FFN, all bias-free (src/llama-model.cpp:5447-5470,5516)
            extra = dict(rope=True, fused_qkv=True, ffn_gated=True,
                         act="silu",
                         rope_theta=float(g("rope.freq_base", 1000.0)))
        elif arch == "jina_bert_v2":
            # separate qkv + optional QK norms, ALiBi (f_max_alibi_bias=8,
            # llama-model.cpp:668), gated gelu FFN with down bias (:5509)
            extra = dict(ffn_gated=True, act="gelu", alibi_max_bias=8.0)
        return cls(
            n_vocab=int(n_vocab),
            n_embd=int(g("embedding_length")),
            n_layer=int(g("block_count")),
            n_head=int(g("attention.head_count")),
            n_head_kv=int(g("attention.head_count_kv", 0) or 0),
            n_ff=int(g("feed_forward_length")),
            ln_eps=float(g("attention.layer_norm_epsilon", 1e-12)),
            n_ctx_train=int(g("context_length", 512)),
            arch=arch,
            **extra,
        )


def load_bert_weights(reader, dtype=jnp.float32):
    cfg = BertConfig.from_gguf(reader.metadata)

    def get(name, vec=False):
        t = reader.tensors[name]
        if vec or len(t.ne) == 1:
            return jnp.asarray(reader.tensor_f32(name), jnp.float32)
        if t.ggml_type in QCONFIGS and t.ne[0] % 256 == 0:
            return pack_tensor(reader.tensor_bytes(name), t.ggml_type,
                               t.shape).astype_device()
        return jnp.asarray(reader.tensor_f32(name), dtype)

    def opt(name, vec=False):
        return get(name, vec) if name in reader.tensors else None

    layers = []
    for i in range(cfg.n_layer):
        p = f"blk.{i}."
        lw = {
            "wo": get(p + "attn_output.weight"),
            "attn_out_norm": get(p + "attn_output_norm.weight", True),
            "attn_out_norm_b": get(p + "attn_output_norm.bias", True),
            "ffn_up": get(p + "ffn_up.weight"),
            "ffn_down": get(p + "ffn_down.weight"),
            "layer_out_norm": get(p + "layer_output_norm.weight", True),
            "layer_out_norm_b": get(p + "layer_output_norm.bias", True),
        }
        if cfg.fused_qkv:
            lw["wqkv"] = get(p + "attn_qkv.weight")
        else:
            lw["wq"] = get(p + "attn_q.weight")
            lw["bq"] = get(p + "attn_q.bias", True)
            lw["wk"] = get(p + "attn_k.weight")
            lw["bk"] = get(p + "attn_k.bias", True)
            lw["wv"] = get(p + "attn_v.weight")
            lw["bv"] = get(p + "attn_v.bias", True)
        for key, name, vec in (
                ("bo", "attn_output.bias", True),
                ("ffn_up_b", "ffn_up.bias", True),
                ("ffn_down_b", "ffn_down.bias", True),
                ("ffn_gate", "ffn_gate.weight", False),
                # jina v2: extra post-attention norm + per-proj QK LayerNorms
                ("attn_norm_2", "attn_norm_2.weight", True),
                ("attn_norm_2_b", "attn_norm_2.bias", True),
                ("attn_q_norm", "attn_q_norm.weight", True),
                ("attn_q_norm_b", "attn_q_norm.bias", True),
                ("attn_k_norm", "attn_k_norm.weight", True),
                ("attn_k_norm_b", "attn_k_norm.bias", True),
        ):
            a = opt(p + name, vec)
            if a is not None:
                lw[key] = a
        layers.append(lw)
    weights = {
        "tok_embd": get("token_embd.weight"),
        "pos_embd": opt("position_embd.weight"),
        "type_embd": get("token_types.weight"),
        "tok_norm": get("token_embd_norm.weight", True),
        "tok_norm_b": get("token_embd_norm.bias", True),
        "layers": layers,
        "cls": opt("cls.weight"), "cls_b": opt("cls.bias", True),
        # reranker classification head (reference CLS_OUT, llama-model.cpp:1972)
        "cls_out": opt("cls.output.weight"),
        "cls_out_b": opt("cls.output.bias", True),
    }
    return cfg, weights


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def forward_bert(cfg: BertConfig, weights, tokens, attn_mask=None,
                 token_types=None, compute_dtype=jnp.float32):
    """Encode [B, T] tokens -> final hidden states [B, T, n_embd].

    attn_mask: [B, T] 1 = real token, 0 = padding (additive -inf mask on
    the key axis, like the reference's non-causal KQ mask).
    """
    B, T = tokens.shape
    tok = weights["tok_embd"]
    h = (tok[tokens] if not hasattr(tok, "cfg") else None)
    if h is None:
        from .llama import embed
        h = embed(tok, tokens, compute_dtype)
    h = h.astype(jnp.float32)
    if weights.get("pos_embd") is not None:  # learned positions (bert only)
        h = h + weights["pos_embd"][:T][None]
    if token_types is None:
        h = h + weights["type_embd"][0][None, None]
    else:
        h = h + weights["type_embd"][token_types]
    h = _ln(h, weights["tok_norm"], weights["tok_norm_b"], cfg.ln_eps)
    h = h.astype(compute_dtype)

    if attn_mask is None:
        bias = None
    else:
        bias = jnp.where(attn_mask[:, None, None, :].astype(bool), 0.0,
                         -jnp.inf).astype(jnp.float32)  # [B,1,1,T]

    if cfg.alibi_max_bias:
        # jina v2: non-causal ALiBi KQ mask, -slope_h * |t - s|
        # (llama-graph.cpp:403 non-causal branch with slopes)
        from ..ops.basic import alibi_slopes

        slopes = jnp.asarray(alibi_slopes(cfg.n_head, cfg.alibi_max_bias))
        t_idx = jnp.arange(T)[:, None]
        s_idx = jnp.arange(T)[None, :]
        alibi = (-slopes[:, None, None]
                 * jnp.abs(t_idx - s_idx).astype(jnp.float32))[None]
        bias = alibi if bias is None else bias + alibi

    if cfg.rope:
        from ..ops.basic import RopeParams, apply_rope

        rope = RopeParams(n_dims=cfg.hd, mode="neox", freq_base=cfg.rope_theta)
        positions = jnp.arange(T, dtype=jnp.int32)[None]

    scale = 1.0 / float(np.sqrt(cfg.hd))
    nkv = cfg.nhkv
    for lw in weights["layers"]:
        if "wqkv" in lw:  # nomic fused projection (bias-free)
            qkv = matmul(h, lw["wqkv"])
            nq, ng = cfg.n_embd, nkv * cfg.hd
            q, k, v = qkv[..., :nq], qkv[..., nq:nq + ng], qkv[..., nq + ng:]
        else:
            q = matmul(h, lw["wq"]) + lw["bq"]
            k = matmul(h, lw["wk"]) + lw["bk"]
            v = matmul(h, lw["wv"]) + lw["bv"]
        if "attn_q_norm" in lw:  # jina v2 optional flat QK LayerNorms
            q = _ln(q, lw["attn_q_norm"], lw["attn_q_norm_b"], cfg.ln_eps)
            k = _ln(k, lw["attn_k_norm"], lw["attn_k_norm_b"], cfg.ln_eps)
        q = q.reshape(B, T, cfg.n_head, cfg.hd)
        k = k.reshape(B, T, nkv, cfg.hd)
        v = v.reshape(B, T, nkv, cfg.hd)
        if cfg.rope:
            q = apply_rope(q, positions, rope)
            k = apply_rope(k, positions, rope)
        if nkv != cfg.n_head:  # GQA: broadcast kv heads over groups
            rep = cfg.n_head // nkv
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        scores = jnp.einsum("bthd,bshd->bhts", q, k,
                            preferred_element_type=jnp.float32) * scale
        if bias is not None:
            scores = scores + bias
        probs = jax.nn.softmax(scores, axis=-1).astype(compute_dtype)
        ctx = jnp.einsum("bhts,bshd->bthd", probs, v.astype(compute_dtype),
                         preferred_element_type=jnp.float32)
        ctx = ctx.reshape(B, T, cfg.n_embd)
        attn_out = matmul(ctx.astype(compute_dtype), lw["wo"])
        if "bo" in lw:
            attn_out = attn_out + lw["bo"]
        inp = h.astype(jnp.float32)
        h = _ln(inp + attn_out,
                lw["attn_out_norm"], lw["attn_out_norm_b"], cfg.ln_eps)
        if "attn_norm_2" in lw:  # jina v2: re-add layer input + second norm
            h = _ln(h.astype(jnp.float32) + inp,
                    lw["attn_norm_2"], lw["attn_norm_2_b"], cfg.ln_eps)
        h = h.astype(compute_dtype)
        up = matmul(h, lw["ffn_up"])
        if "ffn_up_b" in lw:
            up = up + lw["ffn_up_b"]
        if cfg.ffn_gated and "ffn_gate" in lw:
            gate = matmul(h, lw["ffn_gate"]).astype(jnp.float32)
            gact = (jax.nn.silu(gate) if cfg.act == "silu"
                    else jax.nn.gelu(gate, approximate=False))
            act = gact * up.astype(jnp.float32)
        else:
            act = jax.nn.gelu(up.astype(jnp.float32), approximate=False)
        down = matmul(act.astype(compute_dtype), lw["ffn_down"])
        if "ffn_down_b" in lw:
            down = down + lw["ffn_down_b"]
        h = _ln(h.astype(jnp.float32) + down,
                lw["layer_out_norm"], lw["layer_out_norm_b"], cfg.ln_eps
                ).astype(compute_dtype)
    return h


def pool_bert(cfg, weights, hidden, attn_mask=None, pooling: str = "cls"):
    """Pool final hidden states -> [B, n_embd]. 'cls' applies the tanh
    pooler head when present (reference CLS tensor)."""
    hf = np.asarray(hidden, np.float32)
    if pooling == "cls":
        e = hf[:, 0]
        if weights.get("cls") is not None:
            w = weights["cls"]
            wf = np.asarray(w, np.float32) if not hasattr(w, "cfg") else None
            if wf is not None:
                e = np.tanh(e @ wf.T + np.asarray(weights["cls_b"], np.float32))
            else:
                e = np.tanh(np.asarray(matmul(jnp.asarray(e), w))
                            + np.asarray(weights["cls_b"], np.float32))
        return e
    if pooling == "mean":
        if attn_mask is None:
            return hf.mean(axis=1)
        m = np.asarray(attn_mask, np.float32)[..., None]
        return (hf * m).sum(axis=1) / np.clip(m.sum(axis=1), 1e-9, None)
    if pooling == "rank":
        # reranker head (build_pooling LLAMA_POOLING_TYPE_RANK,
        # src/llama-graph.cpp:1596): CLS state -> tanh(cls . h + b)
        # -> optional cls.output projection -> [B, 1] relevance scores
        e = hf[:, 0]
        if weights.get("cls") is None:
            raise ValueError("rank pooling requires the cls head tensors")
        e = np.tanh(e @ _to_f32(weights["cls"]).T
                    + np.asarray(weights["cls_b"], np.float32))
        if weights.get("cls_out") is not None:
            e = (e @ _to_f32(weights["cls_out"]).T
                 + np.asarray(weights["cls_out_b"], np.float32))
        return e
    raise ValueError(f"unknown pooling {pooling!r}")


def _to_f32(w):
    """Dense f32 view of a (possibly packed-quantized) weight matrix."""
    if hasattr(w, "cfg"):
        from ..quant.pack import dequantize_planes_numpy

        return dequantize_planes_numpy(w).astype(np.float32)
    return np.asarray(w, np.float32)


def convert_hf_bert(sd, c, out_path, qtype=GGMLType.F16, tokenizer_fields=None):
    """HF BertModel -> GGUF (bert arch, reference tensor naming)."""
    from .convert_hf import _write_gguf

    pre = "bert." if any(k.startswith("bert.") for k in sd) else ""
    e = pre + "embeddings."
    t = {
        "token_embd.weight": sd[e + "word_embeddings.weight"],
        "position_embd.weight": sd[e + "position_embeddings.weight"],
        "token_types.weight": sd[e + "token_type_embeddings.weight"],
        "token_embd_norm.weight": sd[e + "LayerNorm.weight"],
        "token_embd_norm.bias": sd[e + "LayerNorm.bias"],
    }
    for i in range(int(c.num_hidden_layers)):
        p, g = pre + f"encoder.layer.{i}.", f"blk.{i}."
        for hf, gg in (("attention.self.query", "attn_q"),
                       ("attention.self.key", "attn_k"),
                       ("attention.self.value", "attn_v"),
                       ("attention.output.dense", "attn_output"),
                       ("intermediate.dense", "ffn_up"),
                       ("output.dense", "ffn_down")):
            t[g + gg + ".weight"] = sd[p + hf + ".weight"]
            t[g + gg + ".bias"] = sd[p + hf + ".bias"]
        t[g + "attn_output_norm.weight"] = sd[p + "attention.output.LayerNorm.weight"]
        t[g + "attn_output_norm.bias"] = sd[p + "attention.output.LayerNorm.bias"]
        t[g + "layer_output_norm.weight"] = sd[p + "output.LayerNorm.weight"]
        t[g + "layer_output_norm.bias"] = sd[p + "output.LayerNorm.bias"]
    if pre + "pooler.dense.weight" in sd:
        t["cls.weight"] = sd[pre + "pooler.dense.weight"]
        t["cls.bias"] = sd[pre + "pooler.dense.bias"]
    # sequence-classification (reranker) heads — reference tensor_mapping.py:791
    if "classifier.dense.weight" in sd:  # roberta-style two-layer head
        t["cls.weight"] = sd["classifier.dense.weight"]
        t["cls.bias"] = sd["classifier.dense.bias"]
        t["cls.output.weight"] = sd["classifier.out_proj.weight"]
        t["cls.output.bias"] = sd["classifier.out_proj.bias"]
    elif "classifier.weight" in sd:  # jina-style single linear
        t["cls.weight"] = sd["classifier.weight"]
        t["cls.bias"] = sd["classifier.bias"]
    md = {
        "bert.block_count": int(c.num_hidden_layers),
        "bert.context_length": int(c.max_position_embeddings),
        "bert.embedding_length": int(c.hidden_size),
        "bert.feed_forward_length": int(c.intermediate_size),
        "bert.attention.head_count": int(c.num_attention_heads),
        "bert.attention.layer_norm_epsilon": float(c.layer_norm_eps),
        "bert.vocab_size": int(c.vocab_size),
        "bert.attention.causal": False,
    }
    return _write_gguf(out_path, "bert", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)
