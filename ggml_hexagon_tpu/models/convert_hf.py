"""HF -> GGUF converter (llama / qwen2 / gemma / gemma2 / mixtral).

The tooling analog of the reference's convert_hf_to_gguf.py (layer 10 of
SURVEY §1): per-arch tensor-name mapping, the Q/K row permutation that turns
HF rotate-half RoPE into ggml NORM-mode RoPE (llama family only — NEOX-rope
archs pass through), Gemma's norm(+1) baking, Mixtral expert stacking, and
metadata emission.
"""
from __future__ import annotations

import numpy as np

from ..gguf.writer import GGUFWriter
from ..quant.formats import GGMLType


def permute_qk(w: np.ndarray, n_head: int) -> np.ndarray:
    """HF rotate-half layout -> ggml NORM (adjacent-pair) layout."""
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
    "self_attn.q_proj.bias": "attn_q.bias",
    "self_attn.k_proj.bias": "attn_k.bias",
    "self_attn.v_proj.bias": "attn_v.bias",
    "post_attention_layernorm.weight": "ffn_norm.weight",
    "mlp.gate_proj.weight": "ffn_gate.weight",
    "mlp.up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
    # gemma2 extra norms
    "pre_feedforward_layernorm.weight": "ffn_norm.weight",
    "post_feedforward_layernorm.weight": "post_ffw_norm.weight",
}
# gemma2: post_attention_layernorm is the POST-attn norm; the pre-FFN norm
# is pre_feedforward_layernorm (handled above)
_GEMMA2_OVERRIDES = {
    "post_attention_layernorm.weight": "post_attention_norm.weight",
}


def _arch_of(hf_config) -> str:
    mt = getattr(hf_config, "model_type", "llama")
    return {
        "llama": "llama", "mistral": "llama", "mixtral": "llama",
        "qwen2": "qwen2", "gemma": "gemma", "gemma2": "gemma2",
        "phi3": "phi3", "qwen2_moe": "qwen2moe",
    }.get(mt, mt)


def convert_hf_llama(
    state_dict: dict,
    hf_config,
    out_path: str,
    qtype: GGMLType = GGMLType.F16,
    norm_type: GGMLType = GGMLType.F32,
    tokenizer_fields: dict | None = None,
):
    """Write a GGUF file from an HF state dict (name -> numpy array)."""
    c = hf_config
    arch = _arch_of(c)
    is_moe = getattr(c, "num_local_experts", 0) > 0 or getattr(c, "num_experts", 0) > 0
    w = GGUFWriter()
    w.add("general.architecture", arch)
    w.add("general.name", getattr(c, "name_or_path", "") or f"hf-{arch}")
    w.add(f"{arch}.block_count", int(c.num_hidden_layers))
    w.add(f"{arch}.context_length", int(getattr(c, "max_position_embeddings", 2048)))
    w.add(f"{arch}.embedding_length", int(c.hidden_size))
    w.add(f"{arch}.feed_forward_length", int(c.intermediate_size))
    w.add(f"{arch}.attention.head_count", int(c.num_attention_heads))
    w.add(f"{arch}.attention.head_count_kv",
          int(getattr(c, "num_key_value_heads", c.num_attention_heads)))
    w.add(f"{arch}.attention.layer_norm_rms_epsilon",
          float(getattr(c, "rms_norm_eps", 1e-5)))
    w.add(f"{arch}.rope.freq_base", float(getattr(c, "rope_theta", 10000.0)))
    w.add(f"{arch}.vocab_size", int(c.vocab_size))
    head_dim = getattr(c, "head_dim", None)
    if head_dim and head_dim != c.hidden_size // c.num_attention_heads:
        w.add(f"{arch}.attention.key_length", int(head_dim))
        w.add(f"{arch}.attention.value_length", int(head_dim))
    if is_moe:
        n_exp = int(getattr(c, "num_local_experts", 0) or getattr(c, "num_experts", 0))
        w.add(f"{arch}.expert_count", n_exp)
        w.add(f"{arch}.expert_used_count", int(getattr(c, "num_experts_per_tok", 2)))
        if getattr(c, "moe_intermediate_size", 0):
            w.add(f"{arch}.expert_feed_forward_length", int(c.moe_intermediate_size))
    if arch == "gemma2":
        w.add("gemma2.attn_logit_softcapping", float(getattr(c, "attn_logit_softcapping", 50.0)))
        w.add("gemma2.final_logit_softcapping", float(getattr(c, "final_logit_softcapping", 30.0)))
        w.add("gemma2.attention.sliding_window", int(getattr(c, "sliding_window", 4096)))
    rs = getattr(c, "rope_scaling", None)
    if rs and rs.get("type") == "linear":
        w.add(f"{arch}.rope.scaling.type", "linear")
        w.add(f"{arch}.rope.scaling.factor", float(rs["factor"]))
    for key, val in (tokenizer_fields or {}).items():
        w.add(key, val)

    n_head = int(c.num_attention_heads)
    n_head_kv = int(getattr(c, "num_key_value_heads", n_head))
    permute = arch == "llama"  # NORM-rope family; NEOX archs pass through
    gemma_norm = arch in ("gemma", "gemma2")

    def pick_type(name: str, arr: np.ndarray) -> GGMLType:
        if arr.ndim < 2 or arr.shape[-1] % 256:
            return GGMLType.F32
        if "norm" in name:
            return norm_type
        return qtype

    def emit(gname: str, arr: np.ndarray):
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        t = pick_type(gname, arr)
        if arr.ndim == 3:
            # stacked experts: quantize per 2-D slab, concatenate wire bytes
            from ..quant import ref_numpy

            packed = np.concatenate(
                [ref_numpy.quantize(a.reshape(-1), t) for a in arr]
            )
            w.add_tensor(gname, packed, t, raw_ne=tuple(reversed(arr.shape)))
            return
        w.add_tensor(gname, arr, t)

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    # phi3: split fused qkv_proj / gate_up_proj into the standard tensors
    if arch == "phi3":
        hd = int(getattr(c, "head_dim", 0) or c.hidden_size // n_head)
        for i in range(int(c.num_hidden_layers)):
            pre = f"model.layers.{i}.self_attn."
            if pre + "qkv_proj.weight" in sd:
                qkv = sd.pop(pre + "qkv_proj.weight")
                nq = n_head * hd
                nk = n_head_kv * hd
                sd[pre + "q_proj.weight"] = qkv[:nq]
                sd[pre + "k_proj.weight"] = qkv[nq : nq + nk]
                sd[pre + "v_proj.weight"] = qkv[nq + nk :]
            mpre = f"model.layers.{i}.mlp."
            if mpre + "gate_up_proj.weight" in sd:
                gu = sd.pop(mpre + "gate_up_proj.weight")
                sd[mpre + "gate_proj.weight"] = gu[: gu.shape[0] // 2]
                sd[mpre + "up_proj.weight"] = gu[gu.shape[0] // 2 :]
    emit("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(int(c.num_hidden_layers)):
        pre = f"model.layers.{i}."
        layer_map = dict(_LAYER_MAP)
        if arch == "gemma2":
            layer_map.update(_GEMMA2_OVERRIDES)
        for hf_suffix, g_suffix in layer_map.items():
            key = pre + hf_suffix
            if key not in sd:
                continue
            a = sd[key]
            if permute and hf_suffix == "self_attn.q_proj.weight":
                a = permute_qk(a, n_head)
            elif permute and hf_suffix == "self_attn.k_proj.weight":
                a = permute_qk(a, n_head_kv)
            if gemma_norm and g_suffix.endswith("norm.weight"):
                a = a + 1.0  # reference bakes (w+1) for gemma norms
            emit(f"blk.{i}.{g_suffix}", a)
        if is_moe and pre + "block_sparse_moe.gate.weight" in sd:
            gate = sd[pre + "block_sparse_moe.gate.weight"]
            emit(f"blk.{i}.ffn_gate_inp.weight", gate)
            E = int(c.num_local_experts)
            w1 = np.stack([sd[pre + f"block_sparse_moe.experts.{e}.w1.weight"] for e in range(E)])
            w2 = np.stack([sd[pre + f"block_sparse_moe.experts.{e}.w2.weight"] for e in range(E)])
            w3 = np.stack([sd[pre + f"block_sparse_moe.experts.{e}.w3.weight"] for e in range(E)])
            emit(f"blk.{i}.ffn_gate_exps.weight", w1)
            emit(f"blk.{i}.ffn_down_exps.weight", w2)
            emit(f"blk.{i}.ffn_up_exps.weight", w3)
        elif is_moe and pre + "mlp.gate.weight" in sd:  # qwen2moe
            emit(f"blk.{i}.ffn_gate_inp.weight", sd[pre + "mlp.gate.weight"])
            E = int(getattr(c, "num_experts", 0))
            for tname, hname in (("gate", "gate_proj"), ("up", "up_proj"), ("down", "down_proj")):
                stk = np.stack([sd[pre + f"mlp.experts.{e}.{hname}.weight"] for e in range(E)])
                emit(f"blk.{i}.ffn_{tname}_exps.weight", stk)
            emit(f"blk.{i}.ffn_gate_inp_shexp.weight", sd[pre + "mlp.shared_expert_gate.weight"])
            emit(f"blk.{i}.ffn_gate_shexp.weight", sd[pre + "mlp.shared_expert.gate_proj.weight"])
            emit(f"blk.{i}.ffn_up_shexp.weight", sd[pre + "mlp.shared_expert.up_proj.weight"])
            emit(f"blk.{i}.ffn_down_shexp.weight", sd[pre + "mlp.shared_expert.down_proj.weight"])
    onorm = sd["model.norm.weight"]
    if gemma_norm:
        onorm = onorm + 1.0
    emit("output_norm.weight", onorm)
    if "lm_head.weight" in sd:
        emit("output.weight", sd["lm_head.weight"])
    w.write_file(out_path)
    return out_path


convert_hf = convert_hf_llama
