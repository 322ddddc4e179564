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
    # flat QK norms (olmoe/qwen3-class)
    "self_attn.q_norm.weight": "attn_q_norm.weight",
    "self_attn.k_norm.weight": "attn_k_norm.weight",
    # LayerNorm biases (phimoe-class)
    "input_layernorm.bias": "attn_norm.bias",
    "post_attention_layernorm.bias": "ffn_norm.bias",
    "self_attn.o_proj.bias": "attn_output.bias",
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
        "phi3": "phi3", "qwen2_moe": "qwen2moe", "olmo": "olmo",
        "granite": "granite", "granitemoe": "granitemoe", "olmoe": "olmoe",
        "gemma3_text": "gemma3", "gemma3": "gemma3",
        "qwen3": "qwen3", "qwen3_moe": "qwen3moe",
        "minicpm": "minicpm", "phimoe": "phimoe", "deepseek": "deepseek",
        "xverse": "xverse",
        # llama-graph families with their own HF model_type (the
        # reference's InternLM3Model/SmolLM map to MODEL_ARCH.LLAMA)
        "internlm3": "llama", "smollm": "llama",
    }.get(mt, mt)


# NORM-rope archs whose HF q/k use rotate-half layout -> permute at convert
# (reference: convert_hf_to_gguf.py LlamaModel.permute, OlmoModel,
#  GraniteModel(LlamaModel))
_PERMUTE_ARCHS = {"llama", "olmo", "granite", "granitemoe", "minicpm",
                  "deepseek", "xverse"}


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
    is_moe = (getattr(c, "num_local_experts", 0) or getattr(c, "num_experts", 0)
              or getattr(c, "n_routed_experts", 0) or 0) > 0
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
        n_exp = int(getattr(c, "num_local_experts", 0) or getattr(c, "num_experts", 0)
                    or getattr(c, "n_routed_experts", 0))
        w.add(f"{arch}.expert_count", n_exp)
        w.add(f"{arch}.expert_used_count", int(getattr(c, "num_experts_per_tok", 2)))
        if getattr(c, "moe_intermediate_size", 0):
            w.add(f"{arch}.expert_feed_forward_length", int(c.moe_intermediate_size))
    if arch == "gemma2":
        w.add("gemma2.attn_logit_softcapping", float(getattr(c, "attn_logit_softcapping", 50.0)))
        w.add("gemma2.final_logit_softcapping", float(getattr(c, "final_logit_softcapping", 30.0)))
        w.add("gemma2.attention.sliding_window", int(getattr(c, "sliding_window", 4096)))
    if arch == "gemma3":
        w.add("gemma3.attention.sliding_window", int(getattr(c, "sliding_window", 1024)))
        # llama.cpp hardcodes gemma3 f_attention_scale by model size; we carry
        # the HF query_pre_attn_scalar faithfully instead
        qpas = float(getattr(c, "query_pre_attn_scalar", 0) or 0)
        if qpas:
            w.add("gemma3.attention.scale", qpas ** -0.5)
    rs = getattr(c, "rope_scaling", None)
    if rs and (rs.get("type") or rs.get("rope_type")) == "linear":
        w.add(f"{arch}.rope.scaling.type", "linear")
        w.add(f"{arch}.rope.scaling.factor", float(rs["factor"]))
    if rs and (rs.get("type") or rs.get("rope_type")) in ("su", "longrope"):
        # phi3 longrope (reference Phi3MiniModel.generate_extra_tensors):
        # attn_factor = sqrt(1 + log(scale)/log(orig_ctx)), factors become
        # the rope_factors_long/short freq-divisor tensors
        import math as _math

        orig = int(getattr(c, "original_max_position_embeddings", 0)
                   or rs.get("original_max_position_embeddings", 0))
        scale = int(c.max_position_embeddings) / max(orig, 1)
        attn_factor = (_math.sqrt(1 + _math.log(scale) / _math.log(orig))
                       if scale > 1.0 else 1.0)
        w.add(f"{arch}.rope.scaling.original_context_length", orig)
        w.add(f"{arch}.rope.scaling.attn_factor", float(attn_factor))
        w.add_tensor("blk.0.rope_factors_long.weight",
                     np.asarray(rs["long_factor"], np.float32))
        w.add_tensor("blk.0.rope_factors_short.weight",
                     np.asarray(rs["short_factor"], np.float32))
    if is_moe and getattr(c, "norm_topk_prob", None) is not None:
        w.add(f"{arch}.norm_topk_prob", bool(c.norm_topk_prob))
    if arch == "olmo":
        w.add("olmo.attention.layer_norm_epsilon", 1e-5)
        if getattr(c, "clip_qkv", None):
            w.add("olmo.attention.clamp_kqv", float(c.clip_qkv))
    if arch == "phimoe":
        w.add("phimoe.router_jitter_noise",
              float(getattr(c, "router_jitter_noise", 0.01) or 0.0))
    if arch == "minicpm":
        # reference: MiniCPMModel.set_gguf_parameters (scale formulas)
        w.add("minicpm.embedding_scale", float(getattr(c, "scale_emb", 1.0)))
        w.add("minicpm.residual_scale",
              float(getattr(c, "scale_depth", 1.0))
              / float(c.num_hidden_layers) ** 0.5)
        w.add("minicpm.logit_scale",
              float(c.hidden_size) / float(getattr(c, "dim_model_base", c.hidden_size)))
    if arch == "deepseek":
        w.add("deepseek.leading_dense_block_count",
              int(getattr(c, "first_k_dense_replace", 0)))
        w.add("deepseek.expert_weights_scale",
              float(getattr(c, "routed_scaling_factor", 1.0)))
    if arch in ("granite", "granitemoe"):
        # reference: GraniteModel.set_gguf_parameters (multiplier -> scale)
        w.add(f"{arch}.attention.scale", float(getattr(c, "attention_multiplier", 0.0)))
        w.add(f"{arch}.embedding_scale", float(getattr(c, "embedding_multiplier", 1.0)))
        w.add(f"{arch}.residual_scale", float(getattr(c, "residual_multiplier", 1.0)))
        w.add(f"{arch}.logit_scale", float(getattr(c, "logits_scaling", 1.0)))
    for key, val in (tokenizer_fields or {}).items():
        w.add(key, val)

    n_head = int(c.num_attention_heads)
    n_head_kv = int(getattr(c, "num_key_value_heads", n_head))
    permute = arch in _PERMUTE_ARCHS  # NORM-rope family; NEOX archs pass through
    gemma_norm = arch in ("gemma", "gemma2", "gemma3")

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
        if arch in ("gemma2", "gemma3"):
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
        elif is_moe and pre + "mlp.gate.weight" in sd:  # qwen2moe/olmoe/deepseek
            emit(f"blk.{i}.ffn_gate_inp.weight", sd[pre + "mlp.gate.weight"])
            E = int(getattr(c, "num_experts", 0) or getattr(c, "n_routed_experts", 0))
            for tname, hname in (("gate", "gate_proj"), ("up", "up_proj"), ("down", "down_proj")):
                stk = np.stack([sd[pre + f"mlp.experts.{e}.{hname}.weight"] for e in range(E)])
                emit(f"blk.{i}.ffn_{tname}_exps.weight", stk)
            if pre + "mlp.shared_expert_gate.weight" in sd:  # qwen2moe only
                emit(f"blk.{i}.ffn_gate_inp_shexp.weight", sd[pre + "mlp.shared_expert_gate.weight"])
                emit(f"blk.{i}.ffn_gate_shexp.weight", sd[pre + "mlp.shared_expert.gate_proj.weight"])
                emit(f"blk.{i}.ffn_up_shexp.weight", sd[pre + "mlp.shared_expert.up_proj.weight"])
                emit(f"blk.{i}.ffn_down_shexp.weight", sd[pre + "mlp.shared_expert.down_proj.weight"])
            elif pre + "mlp.shared_experts.gate_proj.weight" in sd:  # deepseek
                emit(f"blk.{i}.ffn_gate_shexp.weight", sd[pre + "mlp.shared_experts.gate_proj.weight"])
                emit(f"blk.{i}.ffn_up_shexp.weight", sd[pre + "mlp.shared_experts.up_proj.weight"])
                emit(f"blk.{i}.ffn_down_shexp.weight", sd[pre + "mlp.shared_experts.down_proj.weight"])
        elif is_moe and pre + "block_sparse_moe.input_linear.weight" in sd:
            # granitemoe: fused [E, 2*ffn, d] input_linear -> gate/up stacks
            # (reference: GraniteMoeModel.modify_tensors)
            emit(f"blk.{i}.ffn_gate_inp.weight",
                 sd[pre + "block_sparse_moe.router.layer.weight"])
            inp = sd[pre + "block_sparse_moe.input_linear.weight"]
            ffn_dim = inp.shape[1] // 2
            emit(f"blk.{i}.ffn_gate_exps.weight", inp[:, :ffn_dim])
            emit(f"blk.{i}.ffn_up_exps.weight", inp[:, ffn_dim:])
            emit(f"blk.{i}.ffn_down_exps.weight",
                 sd[pre + "block_sparse_moe.output_linear.weight"])
    if "model.norm.weight" in sd:  # absent for olmo (non-parametric norms)
        onorm = sd["model.norm.weight"]
        if gemma_norm:
            onorm = onorm + 1.0
        emit("output_norm.weight", onorm)
    if "model.norm.bias" in sd:
        emit("output_norm.bias", sd["model.norm.bias"])
    if "lm_head.weight" in sd:
        emit("output.weight", sd["lm_head.weight"])
    if "lm_head.bias" in sd:
        emit("output.bias", sd["lm_head.bias"])
    w.write_file(out_path)
    return out_path


def _write_gguf(out_path, arch, md_kv, tensors, qtype, norm_type=GGMLType.F32,
                tokenizer_fields=None):
    """Shared GGUF emission for the LayerNorm-family converters."""
    w = GGUFWriter()
    w.add("general.architecture", arch)
    for k, v in md_kv.items():
        w.add(k, v)
    for key, val in (tokenizer_fields or {}).items():
        w.add(key, val)
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        if (arr.ndim < 2 or arr.shape[-1] % 256
                or "position_embd" in name or "token_types" in name
                or "lerp" in name):  # rwkv token-shift params stay dense
            t = GGMLType.F32
        elif "norm" in name:
            t = norm_type
        else:
            t = qtype
        if arr.ndim == 3 and t not in (GGMLType.F32, GGMLType.F16):
            from ..quant import ref_numpy  # stacked experts: per-slab quant

            packed = np.concatenate(
                [ref_numpy.quantize(a.reshape(-1), t) for a in arr])
            w.add_tensor(name, packed, t, raw_ne=tuple(reversed(arr.shape)))
            continue
        w.add_tensor(name, arr, t)
    w.write_file(out_path)
    return out_path


def _copy_biased(tensors, sd, hf_stem, g_stem, transpose=False):
    """Copy HF weight (+bias when present) to GGUF names."""
    w_ = sd[hf_stem + ".weight"]
    tensors[g_stem + ".weight"] = w_.T if transpose else w_
    if hf_stem + ".bias" in sd:
        tensors[g_stem + ".bias"] = sd[hf_stem + ".bias"]


def _deinterleave_qkv(a, n_head, hd):
    """[n_head, 3, hd, ...] per-head interleave -> contiguous [q; k; v]."""
    rest = a.shape[1:]
    a = a.reshape(n_head, 3, hd, *rest)
    return np.concatenate(
        [a[:, j].reshape(n_head * hd, *rest) for j in range(3)], axis=0)


def _common_md(arch, c, n_ff, ln_eps, n_head_kv=None):
    return {
        f"{arch}.block_count": int(c.num_hidden_layers),
        f"{arch}.context_length": int(getattr(c, "max_position_embeddings", 2048)),
        f"{arch}.embedding_length": int(c.hidden_size),
        f"{arch}.feed_forward_length": int(n_ff),
        f"{arch}.attention.head_count": int(c.num_attention_heads),
        f"{arch}.attention.head_count_kv":
            int(n_head_kv if n_head_kv is not None else c.num_attention_heads),
        f"{arch}.attention.layer_norm_epsilon": float(ln_eps),
        f"{arch}.rope.freq_base": float(getattr(c, "rope_theta", 10000.0)),
        f"{arch}.vocab_size": int(c.vocab_size),
    }


def convert_hf_gpt2(sd, c, out_path, qtype=GGMLType.F16, tokenizer_fields=None):
    """GPT2LMHeadModel -> GGUF (gpt2 arch; Conv1D weights transposed)."""
    t = {"token_embd.weight": sd["transformer.wte.weight"],
         "position_embd.weight": sd["transformer.wpe.weight"]}
    for i in range(int(c.num_hidden_layers)):
        p, g = f"transformer.h.{i}.", f"blk.{i}."
        _copy_biased(t, sd, p + "ln_1", g + "attn_norm")
        _copy_biased(t, sd, p + "attn.c_attn", g + "attn_qkv", transpose=True)
        _copy_biased(t, sd, p + "attn.c_proj", g + "attn_output", transpose=True)
        _copy_biased(t, sd, p + "ln_2", g + "ffn_norm")
        _copy_biased(t, sd, p + "mlp.c_fc", g + "ffn_up", transpose=True)
        _copy_biased(t, sd, p + "mlp.c_proj", g + "ffn_down", transpose=True)
    _copy_biased(t, sd, "transformer.ln_f", "output_norm")
    n_ff = int(getattr(c, "n_inner", None) or 4 * c.hidden_size)
    md = _common_md("gpt2", c, n_ff, getattr(c, "layer_norm_epsilon", 1e-5))
    return _write_gguf(out_path, "gpt2", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def convert_hf_gptneox(sd, c, out_path, qtype=GGMLType.F16, tokenizer_fields=None):
    """GPTNeoXForCausalLM -> GGUF (fused QKV de-interleaved per head)."""
    n_head = int(c.num_attention_heads)
    hd = int(c.hidden_size) // n_head
    t = {"token_embd.weight": sd["gpt_neox.embed_in.weight"],
         "output.weight": sd["embed_out.weight"]}
    for i in range(int(c.num_hidden_layers)):
        p, g = f"gpt_neox.layers.{i}.", f"blk.{i}."
        _copy_biased(t, sd, p + "input_layernorm", g + "attn_norm")
        qkv = _deinterleave_qkv(sd[p + "attention.query_key_value.weight"], n_head, hd)
        t[g + "attn_qkv.weight"] = qkv
        if p + "attention.query_key_value.bias" in sd:
            t[g + "attn_qkv.bias"] = _deinterleave_qkv(
                sd[p + "attention.query_key_value.bias"], n_head, hd)
        _copy_biased(t, sd, p + "attention.dense", g + "attn_output")
        _copy_biased(t, sd, p + "post_attention_layernorm", g + "ffn_norm")
        _copy_biased(t, sd, p + "mlp.dense_h_to_4h", g + "ffn_up")
        _copy_biased(t, sd, p + "mlp.dense_4h_to_h", g + "ffn_down")
    _copy_biased(t, sd, "gpt_neox.final_layer_norm", "output_norm")
    md = _common_md("gptneox", c, c.intermediate_size,
                    getattr(c, "layer_norm_eps", 1e-5))
    md["gptneox.rope.dimension_count"] = int(getattr(c, "rotary_pct", 1.0) * hd)
    md["gptneox.use_parallel_residual"] = bool(
        getattr(c, "use_parallel_residual", True))
    return _write_gguf(out_path, "gptneox", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def convert_hf_falcon(sd, c, out_path, qtype=GGMLType.F16, tokenizer_fields=None):
    """FalconForCausalLM -> GGUF (all three HF fused-QKV layouts)."""
    n_head = int(c.num_attention_heads)
    hd = int(c.hidden_size) // n_head
    new_arch = bool(getattr(c, "new_decoder_architecture", False))
    if new_arch:
        n_kv = int(getattr(c, "num_kv_heads", n_head))
    elif getattr(c, "multi_query", True):
        n_kv = 1
    else:
        n_kv = n_head
    t = {"token_embd.weight": sd["transformer.word_embeddings.weight"],
         "output.weight": sd["lm_head.weight"]}
    for i in range(int(c.num_hidden_layers)):
        p, g = f"transformer.h.{i}.", f"blk.{i}."
        ln = "ln_attn" if p + "ln_attn.weight" in sd else "input_layernorm"
        _copy_biased(t, sd, p + ln, g + "attn_norm")
        w_ = sd[p + "self_attention.query_key_value.weight"]
        if new_arch:  # [n_kv, q_per_kv + 2, hd, n_embd] group-interleaved
            q_per_kv = n_head // n_kv
            w_ = w_.reshape(n_kv, q_per_kv + 2, hd, -1)
            w_ = np.concatenate([
                w_[:, :-2].reshape(n_head * hd, -1),
                w_[:, -2].reshape(n_kv * hd, -1),
                w_[:, -1].reshape(n_kv * hd, -1)], axis=0)
        elif n_kv == n_head:  # per-head [h, 3, hd] interleave
            w_ = _deinterleave_qkv(w_, n_head, hd)
        # multi_query layout is already contiguous [q...; k; v]
        t[g + "attn_qkv.weight"] = w_
        _copy_biased(t, sd, p + "self_attention.dense", g + "attn_output")
        _copy_biased(t, sd, p + "mlp.dense_h_to_4h", g + "ffn_up")
        _copy_biased(t, sd, p + "mlp.dense_4h_to_h", g + "ffn_down")
    _copy_biased(t, sd, "transformer.ln_f", "output_norm")
    n_ff = int(getattr(c, "ffn_hidden_size", None) or 4 * c.hidden_size)
    md = _common_md("falcon", c, n_ff,
                    getattr(c, "layer_norm_epsilon", 1e-5), n_head_kv=n_kv)
    return _write_gguf(out_path, "falcon", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def convert_hf_phi2(sd, c, out_path, qtype=GGMLType.F16, tokenizer_fields=None):
    """PhiForCausalLM -> GGUF (phi2 arch; partial rotary, lm_head bias)."""
    t = {"token_embd.weight": sd["model.embed_tokens.weight"]}
    for i in range(int(c.num_hidden_layers)):
        p, g = f"model.layers.{i}.", f"blk.{i}."
        _copy_biased(t, sd, p + "input_layernorm", g + "attn_norm")
        _copy_biased(t, sd, p + "self_attn.q_proj", g + "attn_q")
        _copy_biased(t, sd, p + "self_attn.k_proj", g + "attn_k")
        _copy_biased(t, sd, p + "self_attn.v_proj", g + "attn_v")
        _copy_biased(t, sd, p + "self_attn.dense", g + "attn_output")
        _copy_biased(t, sd, p + "mlp.fc1", g + "ffn_up")
        _copy_biased(t, sd, p + "mlp.fc2", g + "ffn_down")
    _copy_biased(t, sd, "model.final_layernorm", "output_norm")
    _copy_biased(t, sd, "lm_head", "output")
    hd = int(c.hidden_size) // int(c.num_attention_heads)
    md = _common_md("phi2", c, c.intermediate_size,
                    getattr(c, "layer_norm_eps", 1e-5),
                    n_head_kv=getattr(c, "num_key_value_heads", None)
                    or c.num_attention_heads)
    md["phi2.rope.dimension_count"] = int(
        getattr(c, "partial_rotary_factor", 0.5) * hd)
    return _write_gguf(out_path, "phi2", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def convert_hf_starcoder2(sd, c, out_path, qtype=GGMLType.F16, tokenizer_fields=None):
    """Starcoder2ForCausalLM -> GGUF (LN + biases, no-gate gelu FFN)."""
    t = {"token_embd.weight": sd["model.embed_tokens.weight"]}
    if "lm_head.weight" in sd:
        t["output.weight"] = sd["lm_head.weight"]
    for i in range(int(c.num_hidden_layers)):
        p, g = f"model.layers.{i}.", f"blk.{i}."
        _copy_biased(t, sd, p + "input_layernorm", g + "attn_norm")
        for proj, gn in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                         ("v_proj", "attn_v"), ("o_proj", "attn_output")):
            _copy_biased(t, sd, p + f"self_attn.{proj}", g + gn)
        _copy_biased(t, sd, p + "post_attention_layernorm", g + "ffn_norm")
        _copy_biased(t, sd, p + "mlp.c_fc", g + "ffn_up")
        _copy_biased(t, sd, p + "mlp.c_proj", g + "ffn_down")
    _copy_biased(t, sd, "model.norm", "output_norm")
    md = _common_md("starcoder2", c, c.intermediate_size,
                    getattr(c, "norm_epsilon", 1e-5),
                    n_head_kv=getattr(c, "num_key_value_heads",
                                      c.num_attention_heads))
    return _write_gguf(out_path, "starcoder2", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def convert_hf_cohere(sd, c, out_path, qtype=GGMLType.F16, tokenizer_fields=None):
    """CohereForCausalLM -> GGUF (command-r arch; HF rope is already
    adjacent-pair/NORM layout, so no Q/K permutation)."""
    t = {"token_embd.weight": sd["model.embed_tokens.weight"]}
    for i in range(int(c.num_hidden_layers)):
        p, g = f"model.layers.{i}.", f"blk.{i}."
        _copy_biased(t, sd, p + "input_layernorm", g + "attn_norm")
        for proj, gn in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                         ("v_proj", "attn_v"), ("o_proj", "attn_output")):
            _copy_biased(t, sd, p + f"self_attn.{proj}", g + gn)
        for qk in ("q", "k"):  # optional per-head QK LayerNorms [n_head, hd]
            key = p + f"self_attn.{qk}_norm.weight"
            if key in sd:
                t[g + f"attn_{qk}_norm.weight"] = sd[key]
        _copy_biased(t, sd, p + "mlp.gate_proj", g + "ffn_gate")
        _copy_biased(t, sd, p + "mlp.up_proj", g + "ffn_up")
        _copy_biased(t, sd, p + "mlp.down_proj", g + "ffn_down")
    _copy_biased(t, sd, "model.norm", "output_norm")
    md = _common_md("command-r", c, c.intermediate_size,
                    getattr(c, "layer_norm_eps", 1e-5),
                    n_head_kv=getattr(c, "num_key_value_heads",
                                      c.num_attention_heads))
    md["command-r.logit_scale"] = float(getattr(c, "logit_scale", 1.0))
    return _write_gguf(out_path, "command-r", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def convert_hf_cohere2(sd, c, out_path, qtype=GGMLType.F16, tokenizer_fields=None):
    """Cohere2ForCausalLM -> GGUF (cohere2 arch; SWA with rope only on SWA
    layers, parallel residual with shared norm; reference: llm_build_cohere2)."""
    t = {"token_embd.weight": sd["model.embed_tokens.weight"]}
    for i in range(int(c.num_hidden_layers)):
        p, g = f"model.layers.{i}.", f"blk.{i}."
        _copy_biased(t, sd, p + "input_layernorm", g + "attn_norm")
        for proj, gn in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                         ("v_proj", "attn_v"), ("o_proj", "attn_output")):
            _copy_biased(t, sd, p + f"self_attn.{proj}", g + gn)
        _copy_biased(t, sd, p + "mlp.gate_proj", g + "ffn_gate")
        _copy_biased(t, sd, p + "mlp.up_proj", g + "ffn_up")
        _copy_biased(t, sd, p + "mlp.down_proj", g + "ffn_down")
    _copy_biased(t, sd, "model.norm", "output_norm")
    md = _common_md("cohere2", c, c.intermediate_size,
                    getattr(c, "layer_norm_eps", 1e-5),
                    n_head_kv=getattr(c, "num_key_value_heads",
                                      c.num_attention_heads))
    md["cohere2.logit_scale"] = float(getattr(c, "logit_scale", 1.0))
    md["cohere2.attention.sliding_window"] = int(getattr(c, "sliding_window", 4096))
    return _write_gguf(out_path, "cohere2", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def convert_hf_stablelm(sd, c, out_path, qtype=GGMLType.F16, tokenizer_fields=None):
    """StableLmForCausalLM -> GGUF (stablelm arch; partial NEOX rotary)."""
    t = {"token_embd.weight": sd["model.embed_tokens.weight"]}
    if "lm_head.weight" in sd:
        t["output.weight"] = sd["lm_head.weight"]
    for i in range(int(c.num_hidden_layers)):
        p, g = f"model.layers.{i}.", f"blk.{i}."
        _copy_biased(t, sd, p + "input_layernorm", g + "attn_norm")
        for proj, gn in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                         ("v_proj", "attn_v"), ("o_proj", "attn_output")):
            _copy_biased(t, sd, p + f"self_attn.{proj}", g + gn)
        _copy_biased(t, sd, p + "post_attention_layernorm", g + "ffn_norm")
        _copy_biased(t, sd, p + "mlp.gate_proj", g + "ffn_gate")
        _copy_biased(t, sd, p + "mlp.up_proj", g + "ffn_up")
        _copy_biased(t, sd, p + "mlp.down_proj", g + "ffn_down")
    _copy_biased(t, sd, "model.norm", "output_norm")
    hd = int(c.hidden_size) // int(c.num_attention_heads)
    md = _common_md("stablelm", c, c.intermediate_size,
                    getattr(c, "layer_norm_eps", 1e-5),
                    n_head_kv=getattr(c, "num_key_value_heads",
                                      c.num_attention_heads))
    md["stablelm.rope.dimension_count"] = int(
        getattr(c, "partial_rotary_factor", 0.25) * hd)
    return _write_gguf(out_path, "stablelm", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def convert_hf_olmo2(sd, c, out_path, qtype=GGMLType.F16, tokenizer_fields=None):
    """Olmo2ForCausalLM -> GGUF (olmo2 arch; post-norms, flat QK norms)."""
    t = {"token_embd.weight": sd["model.embed_tokens.weight"]}
    if "lm_head.weight" in sd:
        t["output.weight"] = sd["lm_head.weight"]
    for i in range(int(c.num_hidden_layers)):
        p, g = f"model.layers.{i}.", f"blk.{i}."
        for proj, gn in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                         ("v_proj", "attn_v"), ("o_proj", "attn_output")):
            _copy_biased(t, sd, p + f"self_attn.{proj}", g + gn)
        t[g + "attn_q_norm.weight"] = sd[p + "self_attn.q_norm.weight"]
        t[g + "attn_k_norm.weight"] = sd[p + "self_attn.k_norm.weight"]
        t[g + "post_attention_norm.weight"] = sd[p + "post_attention_layernorm.weight"]
        t[g + "post_ffw_norm.weight"] = sd[p + "post_feedforward_layernorm.weight"]
        _copy_biased(t, sd, p + "mlp.gate_proj", g + "ffn_gate")
        _copy_biased(t, sd, p + "mlp.up_proj", g + "ffn_up")
        _copy_biased(t, sd, p + "mlp.down_proj", g + "ffn_down")
    _copy_biased(t, sd, "model.norm", "output_norm")
    md = _common_md("olmo2", c, c.intermediate_size, 1e-5,
                    n_head_kv=getattr(c, "num_key_value_heads",
                                      c.num_attention_heads))
    md["olmo2.attention.layer_norm_rms_epsilon"] = float(
        getattr(c, "rms_norm_eps", 1e-5))
    return _write_gguf(out_path, "olmo2", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def convert_hf_mpt(sd, c, out_path, qtype=GGMLType.F16, tokenizer_fields=None):
    """MptForCausalLM -> GGUF (mpt arch; ALiBi, fused contiguous QKV,
    optional flat QK LayerNorms; reference: llm_build_mpt)."""
    t = {"token_embd.weight": sd["transformer.wte.weight"]}
    if "transformer.wpe.weight" in sd:
        t["position_embd.weight"] = sd["transformer.wpe.weight"]
    for i in range(int(c.num_hidden_layers)):
        p, g = f"transformer.blocks.{i}.", f"blk.{i}."
        _copy_biased(t, sd, p + "norm_1", g + "attn_norm")
        _copy_biased(t, sd, p + "attn.Wqkv", g + "attn_qkv")
        if p + "attn.q_ln.weight" in sd:
            _copy_biased(t, sd, p + "attn.q_ln", g + "attn_q_norm")
            _copy_biased(t, sd, p + "attn.k_ln", g + "attn_k_norm")
        _copy_biased(t, sd, p + "attn.out_proj", g + "attn_output")
        _copy_biased(t, sd, p + "norm_2", g + "ffn_norm")
        _copy_biased(t, sd, p + "ffn.up_proj", g + "ffn_up")
        _copy_biased(t, sd, p + "ffn.down_proj", g + "ffn_down")
    _copy_biased(t, sd, "transformer.norm_f", "output_norm")
    ac = getattr(c, "attn_config", None)
    aget = (lambda k, d: getattr(ac, k, d)) if ac is not None else (lambda k, d: d)
    # derive n_ff from the actual tensor (HF MptMLP hardcodes 4*hidden and
    # ignores expansion_ratio)
    n_ff = int(sd["transformer.blocks.0.ffn.up_proj.weight"].shape[0])
    md = _common_md("mpt", c, n_ff, getattr(c, "layer_norm_epsilon", 1e-5),
                    n_head_kv=aget("kv_n_heads", None) or c.num_attention_heads)
    md["mpt.context_length"] = int(getattr(c, "max_seq_len", 2048))
    if aget("alibi", True):
        md["mpt.attention.max_alibi_bias"] = float(aget("alibi_bias_max", 8))
    if aget("clip_qkv", None):
        md["mpt.attention.clamp_kqv"] = float(aget("clip_qkv", 0.0))
    return _write_gguf(out_path, "mpt", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def convert_hf_starcoder(sd, c, out_path, qtype=GGMLType.F16, tokenizer_fields=None):
    """GPTBigCodeForCausalLM -> GGUF (starcoder arch; MQA fused QKV,
    learned positions; reference: llm_build_starcoder)."""
    t = {"token_embd.weight": sd["transformer.wte.weight"],
         "position_embd.weight": sd["transformer.wpe.weight"]}
    if "lm_head.weight" in sd:
        t["output.weight"] = sd["lm_head.weight"]
    for i in range(int(c.num_hidden_layers)):
        p, g = f"transformer.h.{i}.", f"blk.{i}."
        _copy_biased(t, sd, p + "ln_1", g + "attn_norm")
        _copy_biased(t, sd, p + "attn.c_attn", g + "attn_qkv")
        _copy_biased(t, sd, p + "attn.c_proj", g + "attn_output")
        _copy_biased(t, sd, p + "ln_2", g + "ffn_norm")
        _copy_biased(t, sd, p + "mlp.c_fc", g + "ffn_up")
        _copy_biased(t, sd, p + "mlp.c_proj", g + "ffn_down")
    _copy_biased(t, sd, "transformer.ln_f", "output_norm")
    n_kv = 1 if getattr(c, "multi_query", True) else int(c.num_attention_heads)
    n_ff = int(getattr(c, "n_inner", None) or 4 * c.hidden_size)
    md = _common_md("starcoder", c, n_ff,
                    getattr(c, "layer_norm_epsilon", 1e-5), n_head_kv=n_kv)
    return _write_gguf(out_path, "starcoder", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def convert_hf_bloom(sd, c, out_path, qtype=GGMLType.F16, tokenizer_fields=None):
    """BloomForCausalLM -> GGUF (bloom arch; embedding LayerNorm, ALiBi,
    per-head-interleaved fused QKV; reference: llm_build_bloom)."""
    n_head = int(c.num_attention_heads)
    hd = int(c.hidden_size) // n_head
    t = {"token_embd.weight": sd["transformer.word_embeddings.weight"]}
    _copy_biased(t, sd, "transformer.word_embeddings_layernorm", "token_embd_norm")
    for i in range(int(c.num_hidden_layers)):
        p, g = f"transformer.h.{i}.", f"blk.{i}."
        _copy_biased(t, sd, p + "input_layernorm", g + "attn_norm")
        t[g + "attn_qkv.weight"] = _deinterleave_qkv(
            sd[p + "self_attention.query_key_value.weight"], n_head, hd)
        t[g + "attn_qkv.bias"] = _deinterleave_qkv(
            sd[p + "self_attention.query_key_value.bias"], n_head, hd)
        _copy_biased(t, sd, p + "self_attention.dense", g + "attn_output")
        _copy_biased(t, sd, p + "post_attention_layernorm", g + "ffn_norm")
        _copy_biased(t, sd, p + "mlp.dense_h_to_4h", g + "ffn_up")
        _copy_biased(t, sd, p + "mlp.dense_4h_to_h", g + "ffn_down")
    _copy_biased(t, sd, "transformer.ln_f", "output_norm")
    md = _common_md("bloom", c, 4 * int(c.hidden_size),
                    getattr(c, "layer_norm_epsilon", 1e-5))
    return _write_gguf(out_path, "bloom", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def convert_hf_nemotron(sd, c, out_path, qtype=GGMLType.F16, tokenizer_fields=None):
    """NemotronForCausalLM -> GGUF (nemotron arch; layernorm1p baked as +1
    at convert like the reference, partial NEOX rope, relu^2 no-gate FFN)."""
    t = {"token_embd.weight": sd["model.embed_tokens.weight"]}
    if "lm_head.weight" in sd:
        t["output.weight"] = sd["lm_head.weight"]

    def norm1p(t_, sd_, hf, g):  # +1 on weight (NemotronModel.modify_tensors)
        t_[g + ".weight"] = sd_[hf + ".weight"] + 1.0
        if hf + ".bias" in sd_:
            t_[g + ".bias"] = sd_[hf + ".bias"]

    for i in range(int(c.num_hidden_layers)):
        p, g = f"model.layers.{i}.", f"blk.{i}."
        norm1p(t, sd, p + "input_layernorm", g + "attn_norm")
        for proj, gn in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                         ("v_proj", "attn_v"), ("o_proj", "attn_output")):
            _copy_biased(t, sd, p + f"self_attn.{proj}", g + gn)
        norm1p(t, sd, p + "post_attention_layernorm", g + "ffn_norm")
        _copy_biased(t, sd, p + "mlp.up_proj", g + "ffn_up")
        _copy_biased(t, sd, p + "mlp.down_proj", g + "ffn_down")
    norm1p(t, sd, "model.norm", "output_norm")
    hd = int(c.hidden_size) // int(c.num_attention_heads)
    md = _common_md("nemotron", c, c.intermediate_size,
                    getattr(c, "norm_eps", 1e-5),
                    n_head_kv=getattr(c, "num_key_value_heads",
                                      c.num_attention_heads))
    md["nemotron.rope.dimension_count"] = int(
        getattr(c, "partial_rotary_factor", 0.5) * hd)
    return _write_gguf(out_path, "nemotron", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def convert_hf_dbrx(sd, c, out_path, qtype=GGMLType.F16, tokenizer_fields=None):
    """DbrxForCausalLM -> GGUF (dbrx arch; fused clamped QKV, MoE expert
    stacks from flat w1/v1/w2 params; reference: DbrxModel.modify_tensors)."""
    ffn_c, attn_c = c.ffn_config, c.attn_config
    E = int(ffn_c.moe_num_experts)
    n_ff = int(ffn_c.ffn_hidden_size)
    d = int(c.d_model)
    t = {"token_embd.weight": sd["transformer.wte.weight"],
         "output.weight": sd["lm_head.weight"]}
    for i in range(int(c.n_layers)):
        p, g = f"transformer.blocks.{i}.", f"blk.{i}."
        t[g + "attn_norm.weight"] = sd[p + "norm_attn_norm.norm_1.weight"]
        t[g + "attn_qkv.weight"] = sd[p + "norm_attn_norm.attn.Wqkv.weight"]
        t[g + "attn_output.weight"] = sd[p + "norm_attn_norm.attn.out_proj.weight"]
        t[g + "ffn_norm.weight"] = sd[p + "norm_attn_norm.norm_2.weight"]
        t[g + "ffn_gate_inp.weight"] = sd[p + "ffn.router.layer.weight"]
        t[g + "ffn_gate_exps.weight"] = sd[p + "ffn.experts.mlp.w1"].reshape(E, n_ff, d)
        t[g + "ffn_up_exps.weight"] = sd[p + "ffn.experts.mlp.v1"].reshape(E, n_ff, d)
        t[g + "ffn_down_exps.weight"] = np.ascontiguousarray(
            sd[p + "ffn.experts.mlp.w2"].reshape(E, n_ff, d).transpose(0, 2, 1))
    t["output_norm.weight"] = sd["transformer.norm_f.weight"]
    md = _common_md("dbrx", c, n_ff, 1e-5,
                    n_head_kv=int(attn_c.kv_n_heads))
    md["dbrx.context_length"] = int(c.max_seq_len)
    md["dbrx.rope.freq_base"] = float(attn_c.rope_theta)
    md["dbrx.attention.clamp_kqv"] = float(attn_c.clip_qkv or 0.0)
    md["dbrx.expert_count"] = E
    md["dbrx.expert_used_count"] = int(ffn_c.moe_top_k)
    return _write_gguf(out_path, "dbrx", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def convert_hf_chatglm(sd, c, out_path, qtype=GGMLType.F16, tokenizer_fields=None):
    """GlmForCausalLM (GLM-4 HF layout) -> GGUF (chatglm arch; partial
    NORM-mode rope, fused SWIGLU gate_up; reference: llm_build_chatglm)."""
    t = {"token_embd.weight": sd["model.embed_tokens.weight"]}
    if "lm_head.weight" in sd:
        t["output.weight"] = sd["lm_head.weight"]
    for i in range(int(c.num_hidden_layers)):
        p, g = f"model.layers.{i}.", f"blk.{i}."
        _copy_biased(t, sd, p + "input_layernorm", g + "attn_norm")
        for proj, gn in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                         ("v_proj", "attn_v"), ("o_proj", "attn_output")):
            _copy_biased(t, sd, p + f"self_attn.{proj}", g + gn)
        _copy_biased(t, sd, p + "post_attention_layernorm", g + "ffn_norm")
        # fused [2*ffn, d] gate_up stays fused (ggml LLM_FFN_SWIGLU)
        t[g + "ffn_up.weight"] = sd[p + "mlp.gate_up_proj.weight"]
        _copy_biased(t, sd, p + "mlp.down_proj", g + "ffn_down")
    _copy_biased(t, sd, "model.norm", "output_norm")
    hd = int(c.hidden_size) // int(c.num_attention_heads)
    md = _common_md("chatglm", c, c.intermediate_size,
                    getattr(c, "rms_norm_eps", 1e-5),
                    n_head_kv=getattr(c, "num_key_value_heads",
                                      c.num_attention_heads))
    md["chatglm.attention.layer_norm_rms_epsilon"] = float(
        getattr(c, "rms_norm_eps", 1e-5))
    md["chatglm.rope.dimension_count"] = int(
        getattr(c, "partial_rotary_factor", 0.5) * hd)
    return _write_gguf(out_path, "chatglm", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def convert_hf_exaone(sd, c, out_path, qtype=GGMLType.F16, tokenizer_fields=None):
    """ExaoneForCausalLM -> GGUF (exaone arch; RMS norms under gpt2-style
    names, SwiGLU via c_fc_0/c_fc_1; reference: ExaoneModel converter)."""
    t = {"token_embd.weight": sd["transformer.wte.weight"]}
    if "lm_head.weight" in sd:
        t["output.weight"] = sd["lm_head.weight"]
    for i in range(int(c.num_layers)):
        p, g = f"transformer.h.{i}.", f"blk.{i}."
        t[g + "attn_norm.weight"] = sd[p + "ln_1.weight"]
        for proj, gn in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                         ("v_proj", "attn_v"), ("out_proj", "attn_output")):
            _copy_biased(t, sd, p + f"attn.attention.{proj}", g + gn)
        t[g + "ffn_norm.weight"] = sd[p + "ln_2.weight"]
        _copy_biased(t, sd, p + "mlp.c_fc_0", g + "ffn_gate")
        _copy_biased(t, sd, p + "mlp.c_fc_1", g + "ffn_up")
        _copy_biased(t, sd, p + "mlp.c_proj", g + "ffn_down")
    t["output_norm.weight"] = sd["transformer.ln_f.weight"]
    hd = int(c.hidden_size) // int(c.num_attention_heads)
    md = {
        "exaone.block_count": int(c.num_layers),
        "exaone.context_length": int(getattr(c, "max_position_embeddings", 4096)),
        "exaone.embedding_length": int(c.hidden_size),
        "exaone.feed_forward_length": int(getattr(c, "intermediate_size", 4 * c.hidden_size)),
        "exaone.attention.head_count": int(c.num_attention_heads),
        "exaone.attention.head_count_kv": int(getattr(c, "num_key_value_heads",
                                                      c.num_attention_heads)),
        "exaone.attention.layer_norm_rms_epsilon": float(
            getattr(c, "layer_norm_epsilon", 1e-5)),
        "exaone.rope.freq_base": float(getattr(c, "rope_theta", 10000.0)),
        "exaone.rope.dimension_count": int(
            (getattr(c, "partial_rotary_factor", None) or 1.0) * hd),
        "exaone.vocab_size": int(c.vocab_size),
    }
    return _write_gguf(out_path, "exaone", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def convert_hf_baichuan(sd, c, out_path, qtype=GGMLType.F16, tokenizer_fields=None):
    """BaichuanForCausalLM -> GGUF (baichuan arch; fused W_pack split with
    llama permute; 13B class uses ALiBi; reference: BaichuanModel)."""
    n_head = int(c.num_attention_heads)
    hd = int(c.hidden_size) // n_head
    t = {"token_embd.weight": sd["model.embed_tokens.weight"],
         "output_norm.weight": sd["model.norm.weight"]}
    if "lm_head.weight" in sd:
        t["output.weight"] = sd["lm_head.weight"]
    for i in range(int(c.num_hidden_layers)):
        p, g = f"model.layers.{i}.", f"blk.{i}."
        t[g + "attn_norm.weight"] = sd[p + "input_layernorm.weight"]
        wp = sd[p + "self_attn.W_pack.weight"]
        d = int(c.hidden_size)
        t[g + "attn_q.weight"] = permute_qk(wp[:d], n_head)
        t[g + "attn_k.weight"] = permute_qk(wp[d:2 * d], n_head)
        t[g + "attn_v.weight"] = wp[2 * d:]
        t[g + "attn_output.weight"] = sd[p + "self_attn.o_proj.weight"]
        t[g + "ffn_norm.weight"] = sd[p + "post_attention_layernorm.weight"]
        t[g + "ffn_gate.weight"] = sd[p + "mlp.gate_proj.weight"]
        t[g + "ffn_up.weight"] = sd[p + "mlp.up_proj.weight"]
        t[g + "ffn_down.weight"] = sd[p + "mlp.down_proj.weight"]
    md = _common_md("baichuan", c, c.intermediate_size, 1e-5)
    md["baichuan.attention.layer_norm_rms_epsilon"] = float(
        getattr(c, "rms_norm_eps", 1e-6))
    del md["baichuan.attention.layer_norm_epsilon"]
    _ = hd
    return _write_gguf(out_path, "baichuan", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def convert_hf_orion(sd, c, out_path, qtype=GGMLType.F16, tokenizer_fields=None):
    """OrionForCausalLM -> GGUF (orion arch; LayerNorm + bias, NORM rope)."""
    t = {"token_embd.weight": sd["model.embed_tokens.weight"]}
    if "lm_head.weight" in sd:
        t["output.weight"] = sd["lm_head.weight"]
    for i in range(int(c.num_hidden_layers)):
        p, g = f"model.layers.{i}.", f"blk.{i}."
        _copy_biased(t, sd, p + "input_layernorm", g + "attn_norm")
        for proj, gn in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                         ("v_proj", "attn_v"), ("o_proj", "attn_output")):
            _copy_biased(t, sd, p + f"self_attn.{proj}", g + gn)
        _copy_biased(t, sd, p + "post_attention_layernorm", g + "ffn_norm")
        _copy_biased(t, sd, p + "mlp.gate_proj", g + "ffn_gate")
        _copy_biased(t, sd, p + "mlp.up_proj", g + "ffn_up")
        _copy_biased(t, sd, p + "mlp.down_proj", g + "ffn_down")
    _copy_biased(t, sd, "model.norm", "output_norm")
    md = _common_md("orion", c, c.intermediate_size,
                    getattr(c, "rms_norm_eps", 1e-5),
                    n_head_kv=getattr(c, "num_key_value_heads",
                                      c.num_attention_heads))
    return _write_gguf(out_path, "orion", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def convert_hf_qwen(sd, c, out_path, qtype=GGMLType.F16, tokenizer_fields=None):
    """QWenLMHeadModel (Qwen v1) -> GGUF (qwen arch; fused QKV + bias,
    NEOX rope, SwiGLU w1/w2; reference: QwenModel — n_ff = intermediate/2)."""
    t = {"token_embd.weight": sd["transformer.wte.weight"],
         "output_norm.weight": sd["transformer.ln_f.weight"]}
    if "lm_head.weight" in sd:
        t["output.weight"] = sd["lm_head.weight"]
    for i in range(int(c.num_hidden_layers)):
        p, g = f"transformer.h.{i}.", f"blk.{i}."
        t[g + "attn_norm.weight"] = sd[p + "ln_1.weight"]
        _copy_biased(t, sd, p + "attn.c_attn", g + "attn_qkv")
        t[g + "attn_output.weight"] = sd[p + "attn.c_proj.weight"]
        t[g + "ffn_norm.weight"] = sd[p + "ln_2.weight"]
        t[g + "ffn_gate.weight"] = sd[p + "mlp.w2.weight"]
        t[g + "ffn_up.weight"] = sd[p + "mlp.w1.weight"]
        t[g + "ffn_down.weight"] = sd[p + "mlp.c_proj.weight"]
    md = _common_md("qwen", c, int(c.intermediate_size) // 2,
                    getattr(c, "layer_norm_epsilon", 1e-6))
    md["qwen.attention.layer_norm_rms_epsilon"] = float(
        getattr(c, "layer_norm_epsilon", 1e-6))
    return _write_gguf(out_path, "qwen", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def convert_hf_jais(sd, c, out_path, qtype=GGMLType.F16, tokenizer_fields=None):
    """JAISLMHeadModel -> GGUF (jais arch; gpt2-style Conv1D transposes,
    ALiBi, SwiGLU c_fc/c_fc2, muP scales baked into tensors at convert —
    reference: JaisModel)."""
    emb_scale = float(getattr(c, "mup_embeddings_scale", 0) or
                      getattr(c, "embeddings_scale", 1.0))
    width_scale = 1.0
    if getattr(c, "mup_output_alpha", None) is not None:
        width_scale = float(c.mup_output_alpha) * float(c.mup_width_scale)
    elif getattr(c, "width_scale", None) is not None:
        width_scale = float(c.width_scale)
    t = {"token_embd.weight": sd["transformer.wte.weight"] * emb_scale}
    for i in range(int(c.num_hidden_layers)):
        p, g = f"transformer.h.{i}.", f"blk.{i}."
        _copy_biased(t, sd, p + "ln_1", g + "attn_norm")
        _copy_biased(t, sd, p + "attn.c_attn", g + "attn_qkv", transpose=True)
        _copy_biased(t, sd, p + "attn.c_proj", g + "attn_output", transpose=True)
        _copy_biased(t, sd, p + "ln_2", g + "ffn_norm")
        _copy_biased(t, sd, p + "mlp.c_fc", g + "ffn_up", transpose=True)
        _copy_biased(t, sd, p + "mlp.c_fc2", g + "ffn_gate", transpose=True)
        _copy_biased(t, sd, p + "mlp.c_proj", g + "ffn_down", transpose=True)
    _copy_biased(t, sd, "transformer.ln_f", "output_norm")
    t["output.weight"] = t["token_embd.weight"] / emb_scale * width_scale
    n_ff = int(getattr(c, "n_inner", None) or 4 * c.hidden_size)
    md = _common_md("jais", c, n_ff, getattr(c, "layer_norm_epsilon", 1e-5))
    md["jais.attention.max_alibi_bias"] = 8.0
    return _write_gguf(out_path, "jais", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


_CONVERTERS = {
    "gpt2": convert_hf_gpt2,
    "baichuan": convert_hf_baichuan,
    "orion": convert_hf_orion,
    "qwen": convert_hf_qwen,
    "jais": convert_hf_jais,
    "nemotron": convert_hf_nemotron,
    "dbrx": convert_hf_dbrx,
    "cohere2": convert_hf_cohere2,
    "glm": convert_hf_chatglm,
    "chatglm": convert_hf_chatglm,
    "exaone": convert_hf_exaone,
    "mpt": convert_hf_mpt,
    "bloom": convert_hf_bloom,
    "gpt_bigcode": convert_hf_starcoder,
    "gpt_neox": convert_hf_gptneox,
    "falcon": convert_hf_falcon,
    "phi": convert_hf_phi2,
    "starcoder2": convert_hf_starcoder2,
    "cohere": convert_hf_cohere,
    "stablelm": convert_hf_stablelm,
    "olmo2": convert_hf_olmo2,
}


def _convert_bert(sd, c, out_path, qtype=GGMLType.F16, tokenizer_fields=None):
    from .bert import convert_hf_bert

    return convert_hf_bert(sd, c, out_path, qtype=qtype,
                           tokenizer_fields=tokenizer_fields)


_CONVERTERS["bert"] = _convert_bert


def convert_hf_model(state_dict, hf_config, out_path, qtype=GGMLType.F16,
                     tokenizer_fields=None, **kw):
    """Dispatch on HF model_type (the @Model.register analog)."""
    mt = getattr(hf_config, "model_type", "llama")
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    if mt in _CONVERTERS:
        return _CONVERTERS[mt](sd, hf_config, out_path, qtype=qtype,
                               tokenizer_fields=tokenizer_fields)
    return convert_hf_llama(sd, hf_config, out_path, qtype=qtype,
                            tokenizer_fields=tokenizer_fields, **kw)


convert_hf = convert_hf_llama


# ---------------------------------------------------------------------------
# round-4 breadth: the remaining reference-registered decoder families
# (reference: convert_hf_to_gguf.py InternLM2Model, OpenELMModel,
#  PlamoModel, CodeShellModel, RefactModel, GrokModel, ChameleonModel,
#  BitnetModel, DeciModel, MiniCPM3Model, PLMModel, ArcticModel,
#  Qwen2VLModel — mappings re-derived against gguf-py tensor_mapping.py)
# ---------------------------------------------------------------------------

def convert_hf_internlm2(sd, c, out_path, qtype=GGMLType.F16,
                         tokenizer_fields=None):
    """InternLM2ForCausalLM -> GGUF (internlm2 arch).  The fused wqkv is
    stored grouped [n_groups, q_per_kv+2, hd, d]: split into q/k/v and
    apply the llama rotate-half permutation to q/k (reference:
    InternLM2Model.modify_tensors)."""
    nh = int(c.num_attention_heads)
    nkv = int(getattr(c, "num_key_value_heads", nh))
    d = int(c.hidden_size)
    hd = d // nh
    qpk = nh // nkv
    t = {"token_embd.weight": sd["model.tok_embeddings.weight"]}
    if "output.weight" in sd:
        t["output.weight"] = sd["output.weight"]
    for i in range(int(c.num_hidden_layers)):
        p, g = f"model.layers.{i}.", f"blk.{i}."
        t[g + "attn_norm.weight"] = sd[p + "attention_norm.weight"]
        qkv = sd[p + "attention.wqkv.weight"].reshape(nkv, qpk + 2, hd, d)
        q = qkv[:, :qpk].reshape(nh * hd, d)
        k = qkv[:, -2].reshape(nkv * hd, d)
        v = qkv[:, -1].reshape(nkv * hd, d)
        t[g + "attn_q.weight"] = permute_qk(q, nh)
        t[g + "attn_k.weight"] = permute_qk(k, nkv)
        t[g + "attn_v.weight"] = v
        t[g + "attn_output.weight"] = sd[p + "attention.wo.weight"]
        t[g + "ffn_norm.weight"] = sd[p + "ffn_norm.weight"]
        t[g + "ffn_gate.weight"] = sd[p + "feed_forward.w1.weight"]
        t[g + "ffn_up.weight"] = sd[p + "feed_forward.w3.weight"]
        t[g + "ffn_down.weight"] = sd[p + "feed_forward.w2.weight"]
    t["output_norm.weight"] = sd["model.norm.weight"]
    md = _common_md("internlm2", c, c.intermediate_size, 1e-5, n_head_kv=nkv)
    md["internlm2.attention.layer_norm_rms_epsilon"] = float(
        getattr(c, "rms_norm_eps", 1e-5))
    return _write_gguf(out_path, "internlm2", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def _make_divisible(v, divisor):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def convert_hf_openelm(sd, c, out_path, qtype=GGMLType.F16,
                       tokenizer_fields=None):
    """OpenELMForCausalLM -> GGUF (openelm arch; per-layer head/ffn
    arrays, fused QKV, per-head RMS QK norms, tied head)."""
    d = int(getattr(c, "model_dim"))
    hd = int(getattr(c, "head_dim"))
    nq = [int(x) for x in c.num_query_heads]
    nkv = [int(x) for x in c.num_kv_heads]
    ffd = [_make_divisible(m * d, int(c.ffn_dim_divisor))
           for m in c.ffn_multipliers]
    L = int(getattr(c, "num_transformer_layers"))
    t = {"token_embd.weight": sd["transformer.token_embeddings.weight"]}
    for i in range(L):
        p, g = f"transformer.layers.{i}.", f"blk.{i}."
        t[g + "attn_norm.weight"] = sd[p + "attn_norm.weight"]
        t[g + "attn_qkv.weight"] = sd[p + "attn.qkv_proj.weight"]
        t[g + "attn_output.weight"] = sd[p + "attn.out_proj.weight"]
        t[g + "attn_q_norm.weight"] = sd[p + "attn.q_norm.weight"]
        t[g + "attn_k_norm.weight"] = sd[p + "attn.k_norm.weight"]
        t[g + "ffn_norm.weight"] = sd[p + "ffn_norm.weight"]
        gu = sd[p + "ffn.proj_1.weight"]
        t[g + "ffn_gate.weight"] = gu[: ffd[i]]
        t[g + "ffn_up.weight"] = gu[ffd[i]:]
        t[g + "ffn_down.weight"] = sd[p + "ffn.proj_2.weight"]
    t["output_norm.weight"] = sd["transformer.norm.weight"]
    md = {
        "openelm.block_count": L,
        "openelm.context_length": int(getattr(c, "max_context_length", 2048)),
        "openelm.embedding_length": d,
        "openelm.feed_forward_length": ffd,
        "openelm.attention.head_count": nq,
        "openelm.attention.head_count_kv": nkv,
        "openelm.rope.freq_base": float(getattr(c, "rope_freq_constant",
                                                10000.0)),
        "openelm.attention.layer_norm_rms_epsilon": 1e-6,
        "openelm.rope.dimension_count": hd,
        "openelm.attention.key_length": hd,
        "openelm.attention.value_length": hd,
        "openelm.vocab_size": int(c.vocab_size),
    }
    return _write_gguf(out_path, "openelm", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def convert_hf_plamo(sd, c, out_path, qtype=GGMLType.F16,
                     tokenizer_fields=None):
    """PlamoForCausalLM -> GGUF (plamo arch; GQA broadcast shuffles on
    attn_q/attn_output, shared attn/ffn norm, parallel residual)."""
    d = int(c.hidden_size)
    nh = int(c.num_attention_heads)
    nkv = int(getattr(c, "num_key_value_heads", 5) or 5)
    hd = d // nh
    grp = nh // nkv

    def shuf_q(a):  # reference: PlamoModel.shuffle_attn_q_weight
        return a.reshape(grp, nkv, hd, d).transpose(1, 0, 2, 3).reshape(d, d)

    def shuf_o(a):
        return a.reshape(d, grp, nkv, hd).transpose(0, 2, 1, 3).reshape(d, d)

    t = {"token_embd.weight": sd["model.embed_tokens.weight"],
         "output.weight": sd["lm_head.weight"],
         "output_norm.weight": sd["model.norm.weight"]}
    for i in range(int(c.num_hidden_layers)):
        p, g = f"model.layers.layers.{i}.", f"blk.{i}."
        t[g + "attn_norm.weight"] = sd[p + "norm.weight"]
        t[g + "attn_q.weight"] = shuf_q(sd[p + "self_attn.q_proj.weight"])
        t[g + "attn_k.weight"] = sd[p + "self_attn.k_proj.weight"]
        t[g + "attn_v.weight"] = sd[p + "self_attn.v_proj.weight"]
        t[g + "attn_output.weight"] = shuf_o(sd[p + "self_attn.o_proj.weight"])
        t[g + "ffn_gate.weight"] = sd[p + "mlp.gate_proj.weight"]
        t[g + "ffn_up.weight"] = sd[p + "mlp.up_proj.weight"]
        t[g + "ffn_down.weight"] = sd[p + "mlp.down_proj.weight"]
    md = _common_md("plamo", c, c.intermediate_size, 1e-5, n_head_kv=nkv)
    md["plamo.attention.layer_norm_rms_epsilon"] = float(
        getattr(c, "rms_norm_eps", 1e-5))
    md["plamo.context_length"] = 4096  # not in config.json (reference)
    return _write_gguf(out_path, "plamo", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def convert_hf_codeshell(sd, c, out_path, qtype=GGMLType.F16,
                         tokenizer_fields=None):
    """CodeShellForCausalLM -> GGUF (codeshell arch; gpt-bigcode-style
    LN + fused QKV with biases, partial NEOX rope)."""
    t = {"token_embd.weight": sd["transformer.wte.weight"]}
    if "lm_head.weight" in sd:
        t["output.weight"] = sd["lm_head.weight"]
    for i in range(int(getattr(c, "n_layer"))):
        p, g = f"transformer.h.{i}.", f"blk.{i}."
        _copy_biased(t, sd, p + "ln_1", g + "attn_norm")
        _copy_biased(t, sd, p + "attn.c_attn", g + "attn_qkv")
        _copy_biased(t, sd, p + "attn.c_proj", g + "attn_output")
        _copy_biased(t, sd, p + "ln_2", g + "ffn_norm")
        _copy_biased(t, sd, p + "mlp.c_fc", g + "ffn_up")
        _copy_biased(t, sd, p + "mlp.c_proj", g + "ffn_down")
    _copy_biased(t, sd, "transformer.ln_f", "output_norm")
    nh = int(getattr(c, "n_head"))
    d = int(getattr(c, "n_embd"))
    md = {
        "codeshell.block_count": int(getattr(c, "n_layer")),
        "codeshell.context_length": int(getattr(c, "n_positions", 8192)),
        "codeshell.embedding_length": d,
        "codeshell.feed_forward_length": 4 * d,
        "codeshell.attention.head_count": nh,
        "codeshell.attention.head_count_kv":
            int(getattr(c, "num_query_groups", 1)),
        "codeshell.attention.layer_norm_epsilon":
            float(getattr(c, "layer_norm_epsilon", 1e-5)),
        "codeshell.rope.freq_base": 10000.0,
        "codeshell.rope.scaling.type": "linear",
        "codeshell.rope.scaling.factor": 1.0,
        "codeshell.rope.dimension_count": d // nh,
        "codeshell.vocab_size": int(c.vocab_size),
    }
    return _write_gguf(out_path, "codeshell", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def convert_hf_refact(sd, c, out_path, qtype=GGMLType.F16,
                      tokenizer_fields=None):
    """GPTRefactForCausalLM -> GGUF (refact arch; MQA with split kv
    tensor, SwiGLU with the llama-2/3 ff rounding, ALiBi)."""
    d = int(getattr(c, "n_embd"))
    nh = int(getattr(c, "n_head"))
    hd = d // nh
    ff = 256 * ((int(2 * 4 * d / 3) + 255) // 256)
    t = {"token_embd.weight": sd["transformer.wte.weight"]}
    if "lm_head.weight" in sd:
        t["output.weight"] = sd["lm_head.weight"]
    for i in range(int(getattr(c, "n_layer"))):
        p, g = f"transformer.h.{i}.", f"blk.{i}."
        t[g + "attn_norm.weight"] = sd[p + "ln_1.weight"]
        kv = sd[p + "attn.kv.weight"]
        t[g + "attn_k.weight"] = kv[:hd]
        t[g + "attn_v.weight"] = kv[hd:]
        t[g + "attn_q.weight"] = sd[p + "attn.q.weight"]
        t[g + "attn_output.weight"] = sd[p + "attn.c_proj.weight"]
        t[g + "ffn_norm.weight"] = sd[p + "ln_2.weight"]
        gu = sd[p + "mlp.gate_up_proj.weight"]
        t[g + "ffn_gate.weight"] = gu[:ff]
        t[g + "ffn_up.weight"] = gu[ff:]
        t[g + "ffn_down.weight"] = sd[p + "mlp.c_proj.weight"]
    t["output_norm.weight"] = sd["transformer.ln_f.weight"]
    md = {
        "refact.block_count": int(getattr(c, "n_layer")),
        "refact.context_length": int(getattr(c, "n_positions", 4096)),
        "refact.embedding_length": d,
        "refact.feed_forward_length": ff,
        "refact.attention.head_count": nh,
        "refact.attention.head_count_kv": 1,
        "refact.attention.layer_norm_rms_epsilon":
            float(getattr(c, "layer_norm_epsilon", 1e-6)),
        "refact.vocab_size": int(c.vocab_size),
    }
    return _write_gguf(out_path, "refact", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def convert_hf_grok(sd, c, out_path, qtype=GGMLType.F16,
                    tokenizer_fields=None):
    """GrokForCausalLM -> GGUF (grok arch; 4 norms/layer, MoE with
    merged linear/linear_1/linear_v expert stacks)."""
    E = int(getattr(c, "num_local_experts", 8))
    t = {"token_embd.weight": sd["transformer.in_out_embed.weight"],
         "output_norm.weight": sd["transformer.rms_norm.weight"]}
    if "lm_head.weight" in sd:
        t["output.weight"] = sd["lm_head.weight"]
    for i in range(int(c.num_hidden_layers)):
        p, g = f"transformer.decoder_layer.{i}.", f"blk.{i}."
        t[g + "attn_norm.weight"] = sd[p + "rms_norm.weight"]
        t[g + "attn_output_norm.weight"] = sd[p + "rms_norm_1.weight"]
        t[g + "ffn_norm.weight"] = sd[p + "rms_norm_2.weight"]
        t[g + "layer_output_norm.weight"] = sd[p + "rms_norm_3.weight"]
        for proj, gn in (("query", "attn_q"), ("key", "attn_k"),
                         ("value", "attn_v"), ("linear", "attn_output")):
            t[g + gn + ".weight"] = sd[p + f"multi_head_attention.{proj}.weight"]
        t[g + "ffn_gate_inp.weight"] = sd[p + "router.weight"]
        for wid, gn in (("linear", "ffn_gate_exps"),
                        ("linear_v", "ffn_up_exps"),
                        ("linear_1", "ffn_down_exps")):
            t[g + gn + ".weight"] = np.stack(
                [sd[p + f"moe.{e}.{wid}.weight"] for e in range(E)])
    md = _common_md("grok", c, getattr(c, "intermediate_size", 32768), 1e-5,
                    n_head_kv=getattr(c, "num_key_value_heads",
                                      c.num_attention_heads))
    md["grok.attention.layer_norm_rms_epsilon"] = float(
        getattr(c, "rms_norm_eps", 1e-5))
    md["grok.expert_count"] = E
    md["grok.expert_used_count"] = int(getattr(c, "num_experts_per_tok", 2))
    return _write_gguf(out_path, "grok", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def convert_hf_chameleon(sd, c, out_path, qtype=GGMLType.F16,
                         tokenizer_fields=None):
    """ChameleonForCausalLM -> GGUF (chameleon arch; swin_norm flag,
    per-head LayerNorm QK norms — reference ChameleonModel reshapes the
    HF [hd] q/k norms to per-head [n_head, hd])."""
    nh = int(c.num_attention_heads)
    nkv = int(getattr(c, "num_key_value_heads", nh))
    hd = int(c.hidden_size) // nh
    t = {"token_embd.weight": sd["model.embed_tokens.weight"]}
    if "lm_head.weight" in sd:
        t["output.weight"] = sd["lm_head.weight"]
    for i in range(int(c.num_hidden_layers)):
        p, g = f"model.layers.{i}.", f"blk.{i}."
        t[g + "attn_norm.weight"] = sd[p + "input_layernorm.weight"]
        t[g + "ffn_norm.weight"] = sd[p + "post_attention_layernorm.weight"]
        for proj, gn in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                         ("v_proj", "attn_v"), ("o_proj", "attn_output")):
            a = sd[p + f"self_attn.{proj}.weight"]
            if gn == "attn_q":
                a = permute_qk(a, nh)
            elif gn == "attn_k":
                a = permute_qk(a, nkv)
            t[g + gn + ".weight"] = a
        # per-head QK LayerNorms ([nh, hd]; rope permutation applies on
        # the head_dim axis like the projections)
        qn = sd[p + "self_attn.q_norm.weight"]
        kn = sd[p + "self_attn.k_norm.weight"]
        if qn.ndim == 1:
            qn = np.tile(qn[None, :], (nh, 1))
            kn = np.tile(kn[None, :], (nkv, 1))
        perm = _rope_half_perm(hd)
        t[g + "attn_q_norm.weight"] = qn[:, perm]
        t[g + "attn_k_norm.weight"] = kn[:, perm]
        if p + "self_attn.q_norm.bias" in sd:
            qb = sd[p + "self_attn.q_norm.bias"]
            kb = sd[p + "self_attn.k_norm.bias"]
            if qb.ndim == 1:
                qb = np.tile(qb[None, :], (nh, 1))
                kb = np.tile(kb[None, :], (nkv, 1))
            t[g + "attn_q_norm.bias"] = qb[:, perm]
            t[g + "attn_k_norm.bias"] = kb[:, perm]
        t[g + "ffn_gate.weight"] = sd[p + "mlp.gate_proj.weight"]
        t[g + "ffn_up.weight"] = sd[p + "mlp.up_proj.weight"]
        t[g + "ffn_down.weight"] = sd[p + "mlp.down_proj.weight"]
    t["output_norm.weight"] = sd["model.norm.weight"]
    md = _common_md("chameleon", c, c.intermediate_size, 1e-5, n_head_kv=nkv)
    md["chameleon.attention.layer_norm_rms_epsilon"] = float(
        getattr(c, "rms_norm_eps", 1e-5))
    md["chameleon.swin_norm"] = bool(getattr(c, "swin_norm", False))
    return _write_gguf(out_path, "chameleon", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def _rope_half_perm(hd):
    """rotate-half rope permutation of a head_dim vector (the norm-weight
    analog of permute_qk's row reorder): out[2p] = in[p],
    out[2p+1] = in[half+p] (ChameleonModel._reverse_hf_permute,
    convert_hf_to_gguf.py chameleon section) — equivalently
    v.reshape(2, hd//2).T.ravel()."""
    half = hd // 2
    perm = np.empty(hd, np.int64)
    perm[0::2] = np.arange(half)
    perm[1::2] = half + np.arange(half)
    return perm


def convert_hf_bitnet(sd, c, out_path, qtype=GGMLType.F16,
                      tokenizer_fields=None):
    """BitnetForCausalLM -> GGUF (bitnet arch; ternary fake-quant on the
    projection weights exactly as the reference converts, plus the
    attn/ffn sub-norms)."""
    def wq(a):  # reference BitnetModel.weight_quant
        scale = max(float(np.abs(a).mean()), 1e-5)
        return np.clip(np.round(a / scale), -1, 1) * scale

    nh = int(c.num_attention_heads)
    nkv = int(getattr(c, "num_key_value_heads", nh))
    t = {"token_embd.weight": sd["model.embed_tokens.weight"]}
    for i in range(int(c.num_hidden_layers)):
        p, g = f"model.layers.{i}.", f"blk.{i}."
        t[g + "attn_norm.weight"] = sd[p + "input_layernorm.weight"]
        t[g + "ffn_norm.weight"] = sd[p + "post_attention_layernorm.weight"]
        t[g + "attn_sub_norm.weight"] = sd[p + "self_attn.inner_attn_ln.weight"]
        t[g + "ffn_sub_norm.weight"] = sd[p + "mlp.ffn_layernorm.weight"]
        t[g + "attn_q.weight"] = wq(permute_qk(sd[p + "self_attn.q_proj.weight"], nh))
        t[g + "attn_k.weight"] = wq(permute_qk(sd[p + "self_attn.k_proj.weight"], nkv))
        t[g + "attn_v.weight"] = wq(sd[p + "self_attn.v_proj.weight"])
        t[g + "attn_output.weight"] = wq(sd[p + "self_attn.o_proj.weight"])
        t[g + "ffn_gate.weight"] = wq(sd[p + "mlp.gate_proj.weight"])
        t[g + "ffn_up.weight"] = wq(sd[p + "mlp.up_proj.weight"])
        t[g + "ffn_down.weight"] = wq(sd[p + "mlp.down_proj.weight"])
    t["output_norm.weight"] = sd["model.norm.weight"]
    md = _common_md("bitnet", c, c.intermediate_size, 1e-5, n_head_kv=nkv)
    md["bitnet.attention.layer_norm_rms_epsilon"] = float(
        getattr(c, "rms_norm_eps", 1e-5))
    md["bitnet.rope.scaling.type"] = "linear"
    md["bitnet.rope.scaling.factor"] = 1.0
    return _write_gguf(out_path, "bitnet", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def convert_hf_deci(sd, c, out_path, qtype=GGMLType.F16,
                    tokenizer_fields=None):
    """DeciLMForCausalLM -> GGUF (deci arch).  Handles both the
    block_configs form (Llama-3_1-Nemotron-51B: per-layer head arrays,
    attention-free and linear-attention layers) and the
    num_key_value_heads_per_layer form (DeciLM-7B)."""
    nh0 = int(c.num_attention_heads)
    L = int(c.num_hidden_layers)
    d = int(c.hidden_size)
    if getattr(c, "block_configs", None):
        nhs, nkvs, ffs = [], [], []
        for bc in c.block_configs:
            at = bc["attention"] if isinstance(bc, dict) else bc.attention
            ff = bc["ffn"] if isinstance(bc, dict) else bc.ffn
            g_ = at.get if isinstance(at, dict) else lambda k, d=None: getattr(at, k, d)
            f_ = ff.get if isinstance(ff, dict) else lambda k, d=None: getattr(ff, k, d)
            nig = g_("n_heads_in_group")
            if nig is None:
                nhs.append(nh0 if g_("replace_with_linear") else 0)
                nkvs.append(0)
            else:
                nhs.append(nh0)
                nkvs.append(nh0 // int(nig))
            m = float(f_("ffn_mult") or 4.0)
            ffs.append(256 * ((int(2 * m * d / 3) + 255) // 256))
    else:
        nhs = [nh0] * L
        nkvs = [int(x) for x in getattr(
            c, "num_key_value_heads_per_layer",
            [getattr(c, "num_key_value_heads", nh0)] * L)]
        ffs = [int(c.intermediate_size)] * L
    t = {"token_embd.weight": sd["model.embed_tokens.weight"]}
    if "lm_head.weight" in sd:
        t["output.weight"] = sd["lm_head.weight"]
    for i in range(L):
        p, g = f"model.layers.{i}.", f"blk.{i}."
        if p + "input_layernorm.weight" in sd:
            t[g + "attn_norm.weight"] = sd[p + "input_layernorm.weight"]
        if p + "post_attention_layernorm.weight" in sd:
            t[g + "ffn_norm.weight"] = sd[p + "post_attention_layernorm.weight"]
        if p + "self_attn.q_proj.weight" in sd:
            t[g + "attn_q.weight"] = permute_qk(
                sd[p + "self_attn.q_proj.weight"], nhs[i] or nh0)
            t[g + "attn_k.weight"] = permute_qk(
                sd[p + "self_attn.k_proj.weight"], nkvs[i] or 1)
            t[g + "attn_v.weight"] = sd[p + "self_attn.v_proj.weight"]
        if p + "self_attn.o_proj.weight" in sd:
            t[g + "attn_output.weight"] = sd[p + "self_attn.o_proj.weight"]
        for hn, gn in (("gate_proj", "ffn_gate"), ("up_proj", "ffn_up"),
                       ("down_proj", "ffn_down")):
            if p + f"mlp.{hn}.weight" in sd:
                t[g + gn + ".weight"] = sd[p + f"mlp.{hn}.weight"]
    t["output_norm.weight"] = sd["model.norm.weight"]
    md = {
        "deci.block_count": L,
        "deci.context_length": int(getattr(c, "max_position_embeddings", 4096)),
        "deci.embedding_length": d,
        "deci.feed_forward_length": ffs,
        "deci.attention.head_count": nhs,
        "deci.attention.head_count_kv": nkvs,
        "deci.attention.layer_norm_rms_epsilon": float(
            getattr(c, "rms_norm_eps", 1e-5)),
        "deci.rope.freq_base": float(getattr(c, "rope_theta", 10000.0)),
        "deci.attention.key_length": d // nh0,
        "deci.attention.value_length": d // nh0,
        "deci.vocab_size": int(c.vocab_size),
    }
    return _write_gguf(out_path, "deci", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def _convert_mla(arch, sd, c, out_path, qtype, tokenizer_fields,
                 extra_md=None):
    """Shared MLA-family converter body (minicpm3 / plm — the deepseek2
    tensor naming with the family's own GGUF key prefix)."""
    t = {"token_embd.weight": sd["model.embed_tokens.weight"]}
    if "lm_head.weight" in sd:
        t["output.weight"] = sd["lm_head.weight"]
    for i in range(int(c.num_hidden_layers)):
        p, g = f"model.layers.{i}.", f"blk.{i}."
        t[g + "attn_norm.weight"] = sd[p + "input_layernorm.weight"]
        t[g + "ffn_norm.weight"] = sd[p + "post_attention_layernorm.weight"]
        if p + "self_attn.q_a_proj.weight" in sd:
            t[g + "attn_q_a.weight"] = sd[p + "self_attn.q_a_proj.weight"]
            t[g + "attn_q_a_norm.weight"] = sd[p + "self_attn.q_a_layernorm.weight"]
            t[g + "attn_q_b.weight"] = sd[p + "self_attn.q_b_proj.weight"]
        else:
            t[g + "attn_q.weight"] = sd[p + "self_attn.q_proj.weight"]
        t[g + "attn_kv_a_mqa.weight"] = sd[p + "self_attn.kv_a_proj_with_mqa.weight"]
        t[g + "attn_kv_a_norm.weight"] = sd[p + "self_attn.kv_a_layernorm.weight"]
        t[g + "attn_kv_b.weight"] = sd[p + "self_attn.kv_b_proj.weight"]
        t[g + "attn_output.weight"] = sd[p + "self_attn.o_proj.weight"]
        if p + "mlp.gate_proj.weight" in sd:
            t[g + "ffn_gate.weight"] = sd[p + "mlp.gate_proj.weight"]
        t[g + "ffn_up.weight"] = sd[p + "mlp.up_proj.weight"]
        t[g + "ffn_down.weight"] = sd[p + "mlp.down_proj.weight"]
    t["output_norm.weight"] = sd["model.norm.weight"]
    md = {
        f"{arch}.block_count": int(c.num_hidden_layers),
        f"{arch}.context_length": int(getattr(c, "max_position_embeddings", 4096)),
        f"{arch}.embedding_length": int(c.hidden_size),
        f"{arch}.feed_forward_length": int(c.intermediate_size),
        f"{arch}.attention.head_count": int(c.num_attention_heads),
        f"{arch}.attention.head_count_kv":
            int(getattr(c, "num_key_value_heads", c.num_attention_heads)),
        f"{arch}.attention.layer_norm_rms_epsilon":
            float(getattr(c, "rms_norm_eps", 1e-5)),
        f"{arch}.rope.freq_base": float(getattr(c, "rope_theta", 10000.0)),
        f"{arch}.vocab_size": int(c.vocab_size),
        f"{arch}.attention.kv_lora_rank": int(c.kv_lora_rank),
        f"{arch}.attention.key_length":
            int(c.qk_nope_head_dim + c.qk_rope_head_dim),
        f"{arch}.attention.value_length": int(c.v_head_dim),
        f"{arch}.rope.dimension_count": int(c.qk_rope_head_dim),
    }
    if getattr(c, "q_lora_rank", None):
        md[f"{arch}.attention.q_lora_rank"] = int(c.q_lora_rank)
    md.update(extra_md or {})
    rs = getattr(c, "rope_scaling", None)
    tensors_extra = {}
    if rs and rs.get("long_factor") is not None:
        # minicpm3 longrope freq-factor tensors (reference
        # MiniCPM3Model.generate_extra_tensors)
        tensors_extra["blk.0.rope_factors_long.weight"] = np.asarray(
            rs["long_factor"], np.float32)
        tensors_extra["blk.0.rope_factors_short.weight"] = np.asarray(
            rs["short_factor"], np.float32)
    t.update(tensors_extra)
    return _write_gguf(out_path, arch, md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def convert_hf_minicpm3(sd, c, out_path, qtype=GGMLType.F16,
                        tokenizer_fields=None):
    """MiniCPM3ForCausalLM -> GGUF (minicpm3 arch; MLA attention +
    longrope factors; graph scales are hardcoded by the runtime)."""
    return _convert_mla("minicpm3", sd, c, out_path, qtype,
                        tokenizer_fields)


def convert_hf_plm(sd, c, out_path, qtype=GGMLType.F16,
                   tokenizer_fields=None):
    """PLMForCausalLM -> GGUF (plm arch; MLA with direct wq, no-gate
    relu^2 FFN)."""
    return _convert_mla("plm", sd, c, out_path, qtype, tokenizer_fields)


def convert_hf_arctic(sd, c, out_path, qtype=GGMLType.F16,
                      tokenizer_fields=None):
    """ArcticForCausalLM -> GGUF (arctic arch; every layer has a dense
    residual MLP plus the routed expert branch with its own norm)."""
    nh = int(c.num_attention_heads)
    nkv = int(getattr(c, "num_key_value_heads", nh))
    E = int(getattr(c, "num_local_experts", 0))
    t = {"token_embd.weight": sd["model.embed_tokens.weight"]}
    if "lm_head.weight" in sd:
        t["output.weight"] = sd["lm_head.weight"]
    for i in range(int(c.num_hidden_layers)):
        p, g = f"model.layers.{i}.", f"blk.{i}."
        t[g + "attn_norm.weight"] = sd[p + "input_layernorm.weight"]
        for proj, gn in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                         ("v_proj", "attn_v"), ("o_proj", "attn_output")):
            a = sd[p + f"self_attn.{proj}.weight"]
            if gn == "attn_q":
                a = permute_qk(a, nh)
            elif gn == "attn_k":
                a = permute_qk(a, nkv)
            t[g + gn + ".weight"] = a
        # dense residual MLP (reference: residual_layernorm/residual_mlp)
        t[g + "ffn_norm.weight"] = sd[p + "residual_layernorm.weight"]
        t[g + "ffn_gate.weight"] = sd[p + "residual_mlp.w1.weight"]
        t[g + "ffn_up.weight"] = sd[p + "residual_mlp.w3.weight"]
        t[g + "ffn_down.weight"] = sd[p + "residual_mlp.w2.weight"]
        # routed experts with the MoE-branch norm
        t[g + "ffn_norm_exps.weight"] = sd[p + "post_attention_layernorm.weight"]
        t[g + "ffn_gate_inp.weight"] = sd[p + "block_sparse_moe.gate.weight"]
        for wid, gn in (("w1", "ffn_gate_exps"), ("w3", "ffn_up_exps"),
                        ("w2", "ffn_down_exps")):
            t[g + gn + ".weight"] = np.stack(
                [sd[p + f"block_sparse_moe.experts.{e}.{wid}.weight"]
                 for e in range(E)])
    t["output_norm.weight"] = sd["model.norm.weight"]
    md = _common_md("arctic", c, c.intermediate_size, 1e-5, n_head_kv=nkv)
    md["arctic.attention.layer_norm_rms_epsilon"] = float(
        getattr(c, "rms_norm_eps", 1e-5))
    md["arctic.expert_count"] = E
    md["arctic.expert_used_count"] = int(getattr(c, "num_experts_per_tok", 2))
    md["arctic.rope.dimension_count"] = int(c.hidden_size) // nh
    return _write_gguf(out_path, "arctic", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


def convert_hf_qwen2vl(sd, c, out_path, qtype=GGMLType.F16,
                       tokenizer_fields=None):
    """Qwen2VLForConditionalGeneration (text side) -> GGUF (qwen2vl arch
    with M-RoPE sections; the vision tower converts separately via
    models/clip.convert_hf_clip_vision)."""
    tc = getattr(c, "text_config", None) or c
    # strip the HF "model.language_model."/"language_model.model." wrapper
    sd2 = {}
    for k, v in sd.items():
        for pre in ("model.language_model.", "language_model.model.",
                    "language_model."):
            if k.startswith(pre):
                k = "model." + k[len(pre):]
                break
        sd2[k] = v
    path = convert_hf_llama(sd2, tc, out_path, qtype=qtype,
                            tokenizer_fields=tokenizer_fields)
    # rewrite arch-specific metadata: qwen2vl = qwen2 graph + mrope
    from ..gguf import GGUFReader, GGUFWriter

    rs = getattr(tc, "rope_scaling", None) or {}
    sections = rs.get("mrope_section") or [16, 24, 24]
    with GGUFReader.open(path) as r:
        md = dict(r.metadata)
        # COPY payloads: tensor_bytes views the reader's mmap, which dies
        # with the context manager
        tensors = {n: (np.array(r.tensor_bytes(n)), r.tensors[n].ggml_type,
                       tuple(r.tensors[n].ne)) for n in r.tensors}
    w = GGUFWriter()
    arch_old = md.pop("general.architecture")
    w.add("general.architecture", "qwen2vl")
    for k, v in md.items():
        w.add(k.replace(f"{arch_old}.", "qwen2vl.", 1)
              if k.startswith(f"{arch_old}.") else k, v)
    w.add("qwen2vl.rope.dimension_sections",
          [int(x) for x in sections] + [0] * (4 - len(sections)))
    for name, (raw, tt, ne) in tensors.items():
        w.add_tensor(name, raw, tt, raw_ne=ne)
    w.write_file(path)
    return path


_CONVERTERS.update({
    "internlm2": convert_hf_internlm2,
    "internlm3": convert_hf_llama,       # llama graph with standard names
    "openelm": convert_hf_openelm,
    "plamo": convert_hf_plamo,
    "codeshell": convert_hf_codeshell,
    "gpt_refact": convert_hf_refact,
    "refact": convert_hf_refact,
    "grok-1": convert_hf_grok,
    "grok": convert_hf_grok,
    "chameleon": convert_hf_chameleon,
    "bitnet": convert_hf_bitnet,
    "deci": convert_hf_deci,
    "nemotron-nas": convert_hf_deci,
    "minicpm3": convert_hf_minicpm3,
    "plm": convert_hf_plm,
    "arctic": convert_hf_arctic,
    "qwen2_vl": convert_hf_qwen2vl,
    "qwen2_5_vl": convert_hf_qwen2vl,
})


def _register_family_converters():
    """Route family-module converters through the central dispatch (the
    reference's single convert_hf_to_gguf.py surface)."""
    from .bert import convert_hf_bert
    from .deepseek2 import convert_hf_deepseek2
    from .mamba import convert_hf_mamba
    from .rwkv6 import convert_hf_rwkv6
    from .rwkv6 import convert_hf_rwkv7 as _cv_rwkv7
    from .t5 import convert_hf_t5, convert_hf_t5encoder

    _CONVERTERS.update({
        "deepseek_v2": convert_hf_deepseek2,
        "deepseek_v3": convert_hf_deepseek2,
        "mamba": convert_hf_mamba,
        "falcon_mamba": convert_hf_mamba,
        "rwkv6": convert_hf_rwkv6,
        "rwkv7": _cv_rwkv7,
        "t5": convert_hf_t5,
        "mt5": convert_hf_t5,
        "umt5": convert_hf_t5,
        "t5encoder": convert_hf_t5encoder,
        "roberta": convert_hf_bert,
        "xlm-roberta": convert_hf_bert,
        "camembert": convert_hf_bert,
    })


_register_family_converters()


def convert_hf_bailingmoe(sd, c, out_path, qtype=GGMLType.F16,
                          tokenizer_fields=None):
    """BailingMoeForCausalLM -> GGUF (bailingmoe arch; fused
    query_key_value split + rotate-half permute, dense-lead + routed
    experts + unconditional shared expert)."""
    nh = int(c.num_attention_heads)
    nkv = int(getattr(c, "num_key_value_heads", nh))
    d = int(c.hidden_size)
    hd = int(getattr(c, "head_dim", 0) or d // nh)
    E = int(getattr(c, "num_experts", 0))
    lead = int(getattr(c, "first_k_dense_replace", 0))
    t = {"token_embd.weight": sd["model.word_embeddings.weight"]}
    if "lm_head.weight" in sd:
        t["output.weight"] = sd["lm_head.weight"]
    for i in range(int(c.num_hidden_layers)):
        p, g = f"model.layers.{i}.", f"blk.{i}."
        t[g + "attn_norm.weight"] = sd[p + "input_layernorm.weight"]
        t[g + "ffn_norm.weight"] = sd[p + "post_attention_layernorm.weight"]
        qkv = sd[p + "attention.query_key_value.weight"]
        nq = nh * hd
        nk = nkv * hd
        t[g + "attn_q.weight"] = permute_qk(qkv[:nq], nh)
        t[g + "attn_k.weight"] = permute_qk(qkv[nq:nq + nk], nkv)
        t[g + "attn_v.weight"] = qkv[nq + nk:]
        t[g + "attn_output.weight"] = sd[p + "attention.dense.weight"]
        if i < lead or E == 0:
            t[g + "ffn_gate.weight"] = sd[p + "mlp.gate_proj.weight"]
            t[g + "ffn_up.weight"] = sd[p + "mlp.up_proj.weight"]
            t[g + "ffn_down.weight"] = sd[p + "mlp.down_proj.weight"]
        else:
            t[g + "ffn_gate_inp.weight"] = sd[p + "mlp.gate.weight"]
            for hn, gn in (("gate_proj", "ffn_gate_exps"),
                           ("up_proj", "ffn_up_exps"),
                           ("down_proj", "ffn_down_exps")):
                t[g + gn + ".weight"] = np.stack(
                    [sd[p + f"mlp.experts.{e}.{hn}.weight"]
                     for e in range(E)])
            for hn, gn in (("gate_proj", "ffn_gate_shexp"),
                           ("up_proj", "ffn_up_shexp"),
                           ("down_proj", "ffn_down_shexp")):
                t[g + gn + ".weight"] = sd[
                    p + f"mlp.shared_experts.{hn}.weight"]
    t["output_norm.weight"] = sd["model.norm.weight"]
    md = _common_md("bailingmoe", c,
                    getattr(c, "intermediate_size", 4 * d), 1e-5,
                    n_head_kv=nkv)
    md["bailingmoe.attention.layer_norm_rms_epsilon"] = float(
        getattr(c, "rms_norm_eps", 1e-5))
    md["bailingmoe.rope.dimension_count"] = hd
    md["bailingmoe.leading_dense_block_count"] = lead
    if E:
        md["bailingmoe.expert_count"] = E
        md["bailingmoe.expert_used_count"] = int(
            getattr(c, "num_experts_per_tok", 2))
        md["bailingmoe.expert_feed_forward_length"] = int(
            getattr(c, "moe_intermediate_size", 0))
        md["bailingmoe.expert_shared_count"] = int(
            getattr(c, "num_shared_experts", 0))
        md["bailingmoe.expert_weights_scale"] = 1.0
        md["bailingmoe.expert_weights_norm"] = bool(
            getattr(c, "norm_topk_prob", False))
    return _write_gguf(out_path, "bailingmoe", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)


_CONVERTERS["bailing_moe"] = convert_hf_bailingmoe
_CONVERTERS["bailingmoe"] = convert_hf_bailingmoe
