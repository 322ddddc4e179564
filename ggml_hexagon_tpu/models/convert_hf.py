"""HF -> GGUF converter (LLaMA family).

The tooling analog of the reference's convert_hf_to_gguf.py (layer 10 of
SURVEY §1): maps HF checkpoint tensors to GGUF names, applies the Q/K
row permutation that turns HF rotate-half RoPE into ggml NORM-mode RoPE,
and writes metadata + (optionally quantized) tensors.
"""
from __future__ import annotations

import numpy as np

from ..gguf.writer import GGUFWriter
from ..quant.formats import GGMLType


def permute_qk(w: np.ndarray, n_head: int) -> np.ndarray:
    """HF rotate-half layout -> ggml NORM (adjacent-pair) layout.

    Interleaves the two halves of each head's rows so that ggml's
    adjacent-pair rotation reproduces HF's rotate-half semantics.
    """
    out_dim = w.shape[0]
    return (
        w.reshape(n_head, 2, out_dim // n_head // 2, *w.shape[1:])
        .swapaxes(1, 2)
        .reshape(w.shape)
    )


_LAYER_MAP = {
    "input_layernorm.weight": "attn_norm.weight",
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.o_proj.weight": "attn_output.weight",
    "post_attention_layernorm.weight": "ffn_norm.weight",
    "mlp.gate_proj.weight": "ffn_gate.weight",
    "mlp.up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
}


def convert_hf_llama(
    state_dict: dict,
    hf_config,
    out_path: str,
    qtype: GGMLType = GGMLType.F16,
    norm_type: GGMLType = GGMLType.F32,
    tokenizer_fields: dict | None = None,
):
    """Write a GGUF file from an HF Llama state dict.

    state_dict: name -> numpy array (use `{k: v.numpy() for k, v in
    model.state_dict().items()}`).  qtype applies to 2-D matmul weights
    whose row length is a multiple of 256; everything else stays f32/f16.
    """
    c = hf_config
    w = GGUFWriter()
    w.add("general.architecture", "llama")
    w.add("general.name", getattr(c, "name_or_path", "") or "hf-llama")
    w.add("llama.block_count", int(c.num_hidden_layers))
    w.add("llama.context_length", int(getattr(c, "max_position_embeddings", 2048)))
    w.add("llama.embedding_length", int(c.hidden_size))
    w.add("llama.feed_forward_length", int(c.intermediate_size))
    w.add("llama.attention.head_count", int(c.num_attention_heads))
    w.add("llama.attention.head_count_kv", int(getattr(c, "num_key_value_heads", c.num_attention_heads)))
    w.add("llama.attention.layer_norm_rms_epsilon", float(getattr(c, "rms_norm_eps", 1e-5)))
    w.add("llama.rope.freq_base", float(getattr(c, "rope_theta", 10000.0)))
    w.add("llama.vocab_size", int(c.vocab_size))
    head_dim = getattr(c, "head_dim", None)
    if head_dim and head_dim != c.hidden_size // c.num_attention_heads:
        w.add("llama.attention.key_length", int(head_dim))
        w.add("llama.attention.value_length", int(head_dim))
    rs = getattr(c, "rope_scaling", None)
    if rs and rs.get("type") == "linear":
        w.add("llama.rope.scaling.type", "linear")
        w.add("llama.rope.scaling.factor", float(rs["factor"]))
    for key, val in (tokenizer_fields or {}).items():
        w.add(key, val)

    n_head = int(c.num_attention_heads)
    n_head_kv = int(getattr(c, "num_key_value_heads", n_head))

    def pick_type(name: str, arr: np.ndarray) -> GGMLType:
        if arr.ndim != 2 or arr.shape[1] % 256:
            return GGMLType.F32
        if "norm" in name:
            return norm_type
        return qtype

    def emit(gname: str, arr: np.ndarray):
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        w.add_tensor(gname, arr, pick_type(gname, arr))

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    emit("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(int(c.num_hidden_layers)):
        for hf_suffix, g_suffix in _LAYER_MAP.items():
            a = sd[f"model.layers.{i}.{hf_suffix}"]
            if hf_suffix == "self_attn.q_proj.weight":
                a = permute_qk(a, n_head)
            elif hf_suffix == "self_attn.k_proj.weight":
                a = permute_qk(a, n_head_kv)
            emit(f"blk.{i}.{g_suffix}", a)
    emit("output_norm.weight", sd["model.norm.weight"])
    if "lm_head.weight" in sd:
        emit("output.weight", sd["lm_head.weight"])
    w.write_file(out_path)
    return out_path
