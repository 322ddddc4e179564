"""DeepSeek-V2/V3 family — Multi-head Latent Attention (MLA) + MoE.

Reference: llm_build_deepseek2 (src/llama-model.cpp) — low-rank Q and KV
projections (q_lora_rank / kv_lora_rank), per-head split into no-position
(nope) and rotary (rope) sub-dims, a single shared rotary key (MQA-style
k_pe broadcast over heads), value heads of a different width than key
heads, YaRN-corrected attention scale (mscale^2/sqrt(d_k)), leading dense
FFN layers followed by MoE layers with softmax/sigmoid gating
(+DeepSeek-V3 selection-bias exp_probs_b), routed-weight scaling, and
always-on shared experts.

TPU notes: the whole step jits into one XLA program; the K cache stores
concat(k_nope, k_pe) per head (like the reference's unified cache) and the
V cache uses its own head width.  Experts are evaluated densely with
0-weights outside the top-k (static shapes; EP sharding handles scale-out).
"""
from __future__ import annotations

from dataclasses import dataclass
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..quant.formats import GGMLType
from ..quant.pack import QCONFIGS, pack_tensor
from ..ops.basic import RopeParams, apply_rope, rms_norm, silu, softmax_ext
from .llama import matmul, embed, qtensor_rows, _kv_write


@dataclass(frozen=True)
class DeepseekConfig:
    n_vocab: int
    n_embd: int
    n_layer: int
    n_head: int
    n_ff: int
    q_lora_rank: int = 0          # 0 -> "lite" direct q projection
    kv_lora_rank: int = 512
    qk_nope: int = 128
    qk_rope: int = 64
    v_head_dim: int = 128
    n_expert: int = 0
    n_expert_used: int = 0
    n_ff_exp: int = 0
    n_shared: int = 0
    n_dense_lead: int = 1
    expert_scale: float = 1.0      # routed_scaling_factor
    expert_norm: bool = False      # norm_topk_prob
    gating: str = "softmax"        # 'softmax' | 'sigmoid' (V3)
    rms_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_freq_scale: float = 1.0
    rope_ext_factor: float = 0.0
    yarn_log_mul: float = 0.0
    n_ctx_train: int = 4096
    arch: str = "deepseek2"
    # --- minicpm3 / plm variation points (llm_build_minicpm3 / llm_build_plm)
    rope_mode: str = "norm"        # minicpm3: neox
    embd_scale: float = 1.0        # minicpm3: scale_embd = 12
    res_scale: float = 1.0         # minicpm3: scale_depth/sqrt(n_layer)
    logit_scale: float = 1.0       # minicpm3: n_embd_base(256)/n_embd
    ffn_gated: bool = True         # plm: False (up -> relu^2 -> down)
    rope_ff: tuple = ()            # minicpm3 longrope freq factors (active)
    rope_ff_long: tuple = ()

    def resolve_rope_factors(self, n_ctx: int) -> "DeepseekConfig":
        from dataclasses import replace

        if self.rope_ff_long and n_ctx > self.n_ctx_train:
            return replace(self, rope_ff=self.rope_ff_long)
        return self

    @property
    def hd_k(self) -> int:
        return self.qk_nope + self.qk_rope

    @classmethod
    def from_gguf(cls, md: dict) -> "DeepseekConfig":
        arch = md.get("general.architecture", "deepseek2")
        g = lambda k, d=None: md.get(f"{arch}.{k}", d)
        qk_rope = int(g("rope.dimension_count", 64))
        hd_k = int(g("attention.key_length", 192))
        scaling = g("rope.scaling.type", "none") or "none"
        freq_scale, ext = 1.0, 0.0
        if scaling == "yarn" and g("rope.scaling.factor"):
            freq_scale = 1.0 / float(g("rope.scaling.factor"))
            ext = 1.0
        n_vocab = g("vocab_size") or len(md.get("tokenizer.ggml.tokens", [])) or 102400
        n_embd = int(g("embedding_length"))
        n_layer = int(g("block_count"))
        extra = {}
        if arch == "minicpm3":
            # llm_build_minicpm3 hardcodes n_embd_base=256, scale_embd=12,
            # scale_depth=1.4 (src/llama-model.cpp:7338-7341)
            extra = dict(rope_mode="neox", embd_scale=12.0,
                         res_scale=1.4 / math.sqrt(n_layer),
                         logit_scale=256.0 / n_embd)
        elif arch == "plm":
            # llm_build_plm: direct wq, no-gate relu^2 FFN (LLM_FFN_RELU_SQR)
            extra = dict(ffn_gated=False)
        return cls(
            arch=arch,
            **extra,
            n_vocab=int(n_vocab),
            n_embd=n_embd,
            n_layer=n_layer,
            n_head=int(g("attention.head_count")),
            n_ff=int(g("feed_forward_length")),
            q_lora_rank=int(g("attention.q_lora_rank", 0) or 0),
            kv_lora_rank=int(g("attention.kv_lora_rank", 512)),
            qk_nope=hd_k - qk_rope,
            qk_rope=qk_rope,
            v_head_dim=int(g("attention.value_length", 128)),
            n_expert=int(g("expert_count", 0)),
            n_expert_used=int(g("expert_used_count", 0)),
            n_ff_exp=int(g("expert_feed_forward_length", 0)),
            n_shared=int(g("expert_shared_count", 0)),
            n_dense_lead=int(g("leading_dense_block_count", 1)),
            expert_scale=float(g("expert_weights_scale", 1.0)),
            expert_norm=bool(g("expert_weights_norm", False)),
            gating="sigmoid" if int(g("expert_gating_func", 1)) == 2 else "softmax",
            rms_eps=float(g("attention.layer_norm_rms_epsilon", 1e-6)),
            rope_theta=float(g("rope.freq_base", 10000.0)),
            rope_freq_scale=freq_scale,
            rope_ext_factor=ext,
            yarn_log_mul=float(g("rope.scaling.yarn_log_multiplier", 0.0)),
            n_ctx_train=int(g("rope.scaling.original_context_length",
                              g("context_length", 4096))),
        )


def load_deepseek_weights(reader, dtype=jnp.bfloat16, device=True):
    cfg = DeepseekConfig.from_gguf(reader.metadata)
    # minicpm3 longrope factors (stored once on blk.0, duplicated per layer
    # in the reference, llama-model.cpp:1794-1795)
    from dataclasses import replace

    _ff = {}
    for field, tn in (("rope_ff", "blk.0.rope_factors_short.weight"),
                      ("rope_ff_long", "blk.0.rope_factors_long.weight")):
        if tn in reader.tensors:
            _ff[field] = tuple(float(x) for x in reader.tensor_f32(tn))
    if _ff:
        cfg = replace(cfg, **_ff)

    def get(name, vec=False):
        t = reader.tensors[name]
        if vec or len(t.ne) == 1:
            return jnp.asarray(reader.tensor_f32(name), jnp.float32)
        if t.ggml_type in QCONFIGS and t.ne[0] % 256 == 0:
            shape = t.shape
            if len(shape) == 3:
                shape = (shape[0] * shape[1], shape[2])
            qt = pack_tensor(reader.tensor_bytes(name), t.ggml_type, shape)
            return qt.astype_device() if device else qt
        arr = reader.tensor_f32(name)
        if arr.ndim == 3:
            arr = arr.reshape(arr.shape[0] * arr.shape[1], arr.shape[2])
        return jnp.asarray(arr, dtype)

    def opt(name, vec=False):
        return get(name, vec) if name in reader.tensors else None

    layers = []
    for i in range(cfg.n_layer):
        p = f"blk.{i}."
        lw = {
            "attn_norm": get(p + "attn_norm.weight", True),
            "ffn_norm": get(p + "ffn_norm.weight", True),
            "wkv_a": get(p + "attn_kv_a_mqa.weight"),
            "kv_a_norm": get(p + "attn_kv_a_norm.weight", True),
            "wkv_b": get(p + "attn_kv_b.weight"),
            "wo": get(p + "attn_output.weight"),
        }
        if cfg.q_lora_rank:
            lw["wq_a"] = get(p + "attn_q_a.weight")
            lw["q_a_norm"] = get(p + "attn_q_a_norm.weight", True)
            lw["wq_b"] = get(p + "attn_q_b.weight")
        else:
            lw["wq"] = get(p + "attn_q.weight")
        if cfg.n_expert and i >= cfg.n_dense_lead:
            lw["ffn_gate_inp"] = get(p + "ffn_gate_inp.weight")
            lw["ffn_gate_exps"] = get(p + "ffn_gate_exps.weight")
            lw["ffn_up_exps"] = get(p + "ffn_up_exps.weight")
            lw["ffn_down_exps"] = get(p + "ffn_down_exps.weight")
            b = opt(p + "exp_probs_b.bias", True)
            if b is not None:
                lw["exp_probs_b"] = b
            for sh in ("ffn_gate_shexp", "ffn_up_shexp", "ffn_down_shexp"):
                a = opt(p + sh + ".weight")
                if a is not None:
                    lw[sh] = a
        else:
            if cfg.ffn_gated:
                lw["ffn_gate"] = get(p + "ffn_gate.weight")
            lw["ffn_up"] = get(p + "ffn_up.weight")
            lw["ffn_down"] = get(p + "ffn_down.weight")
        layers.append(lw)
    weights = {
        "tok_embd": get("token_embd.weight"),
        "output_norm": get("output_norm.weight", True),
        "output": get("output.weight") if "output.weight" in reader.tensors
        else get("token_embd.weight"),
        "layers": layers,
    }
    return cfg, weights


def init_deepseek_kv(cfg: DeepseekConfig, batch: int, max_seq: int,
                     dtype=jnp.bfloat16):
    return {
        "k": jnp.zeros((cfg.n_layer, batch, max_seq, cfg.n_head, cfg.hd_k), dtype),
        "v": jnp.zeros((cfg.n_layer, batch, max_seq, cfg.n_head, cfg.v_head_dim), dtype),
    }


def _moe(cfg: DeepseekConfig, lw, f, compute_dtype):
    """build_moe_ffn semantics: gate -> (softmax|sigmoid) -> +selection bias
    -> top-k -> gather probs -> optional renorm -> * expert_scale."""
    E, K = cfg.n_expert, cfg.n_expert_used
    n_ff_e = cfg.n_ff_exp or cfg.n_ff
    logits = matmul(f, lw["ffn_gate_inp"]).astype(jnp.float32)
    if cfg.gating == "sigmoid":
        probs = jax.nn.sigmoid(logits)
    else:
        probs = jax.nn.softmax(logits, axis=-1)
    sel = probs + lw["exp_probs_b"] if "exp_probs_b" in lw else probs
    _, topi = jax.lax.top_k(sel, K)
    topv = jnp.take_along_axis(probs, topi, axis=-1)  # weights from raw probs
    if cfg.expert_norm:
        topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
    topv = topv * cfg.expert_scale
    onehot = jax.nn.one_hot(topi, E, dtype=jnp.float32)
    w_tok = jnp.einsum("btk,btke->bte", topv, onehot)
    d = cfg.n_embd
    out = 0.0
    for e in range(E):
        gate_e = qtensor_rows(lw["ffn_gate_exps"], e * n_ff_e, n_ff_e)
        up_e = qtensor_rows(lw["ffn_up_exps"], e * n_ff_e, n_ff_e)
        down_e = qtensor_rows(lw["ffn_down_exps"], e * d, d)
        g = silu(matmul(f, gate_e).astype(compute_dtype))
        u = matmul(f, up_e).astype(compute_dtype)
        out = out + matmul(g * u, down_e).astype(jnp.float32) * w_tok[..., e:e + 1]
    if "ffn_gate_shexp" in lw:  # always-on shared experts
        g = silu(matmul(f, lw["ffn_gate_shexp"]).astype(compute_dtype))
        u = matmul(f, lw["ffn_up_shexp"]).astype(compute_dtype)
        out = out + matmul(g * u, lw["ffn_down_shexp"]).astype(jnp.float32)
    return out.astype(compute_dtype)


def forward(cfg: DeepseekConfig, weights, tokens, kv_cache, pos_start,
            logits_all: bool = False, compute_dtype=jnp.bfloat16):
    """One decoder step over T tokens -> (logits, new_kv_cache)."""
    B, T = tokens.shape
    H, dn, dr, dv = cfg.n_head, cfg.qk_nope, cfg.qk_rope, cfg.v_head_dim
    # YaRN-corrected scale (llm_build_deepseek2 mscale pre-scaling)
    mscale = 1.0 + cfg.yarn_log_mul * math.log(1.0 / cfg.rope_freq_scale) \
        if cfg.rope_freq_scale != 1.0 else 1.0
    kq_scale = mscale * mscale / math.sqrt(cfg.hd_k)
    attn_factor = (1.0 / (1.0 + 0.1 * math.log(1.0 / cfg.rope_freq_scale))
                   if cfg.rope_freq_scale != 1.0 else 1.0)
    rope = RopeParams(
        n_dims=dr, mode=cfg.rope_mode, freq_base=cfg.rope_theta,
        freq_scale=cfg.rope_freq_scale, ext_factor=cfg.rope_ext_factor,
        attn_factor=attn_factor, n_ctx_orig=cfg.n_ctx_train,
        freq_factors=cfg.rope_ff)

    pos_vec = jnp.reshape(jnp.asarray(pos_start, jnp.int32), (-1, 1))
    positions = pos_vec + jnp.arange(T, dtype=jnp.int32)[None, :]
    h = embed(weights["tok_embd"], tokens, compute_dtype)
    if cfg.embd_scale != 1.0:  # minicpm3 scale_embd
        h = h * cfg.embd_scale
    new_k, new_v = [], []
    for il, lw in enumerate(weights["layers"]):
        a = rms_norm(h, lw["attn_norm"], cfg.rms_eps)
        if cfg.q_lora_rank:
            qc = rms_norm(matmul(a, lw["wq_a"]).astype(compute_dtype),
                          lw["q_a_norm"], cfg.rms_eps)
            q = matmul(qc, lw["wq_b"])
        else:
            q = matmul(a, lw["wq"])
        q = q.reshape(B, T, H, cfg.hd_k)
        q_nope, q_pe = q[..., :dn], q[..., dn:]
        kv_pe = matmul(a, lw["wkv_a"])  # [B,T, kv_lora + dr]
        kv_c = rms_norm(kv_pe[..., :cfg.kv_lora_rank].astype(compute_dtype),
                        lw["kv_a_norm"], cfg.rms_eps)
        k_pe = kv_pe[..., cfg.kv_lora_rank:].reshape(B, T, 1, dr)
        kv = matmul(kv_c, lw["wkv_b"]).reshape(B, T, H, dn + dv)
        k_nope, v = kv[..., :dn], kv[..., dn:]
        q_pe = apply_rope(q_pe.astype(jnp.float32), positions, rope)
        k_pe = apply_rope(k_pe.astype(jnp.float32), positions, rope)
        qh = jnp.concatenate([q_nope.astype(jnp.float32), q_pe], axis=-1)
        kh = jnp.concatenate(
            [k_nope.astype(jnp.float32), jnp.broadcast_to(k_pe, (B, T, H, dr))],
            axis=-1)
        k_l = _kv_write(kv_cache["k"][il], kh.astype(compute_dtype), pos_start)
        v_l = _kv_write(kv_cache["v"][il], v.astype(compute_dtype), pos_start)
        new_k.append(k_l)
        new_v.append(v_l)
        S = k_l.shape[1]
        scores = jnp.einsum("bthd,bshd->bhts", qh.astype(compute_dtype), k_l,
                            preferred_element_type=jnp.float32)
        s_idx = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)[None]
        t_idx = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0)[None]
        pos_b = jnp.reshape(jnp.asarray(pos_start, jnp.int32), (-1, 1, 1))
        mask = jnp.where(s_idx <= (pos_b + t_idx), 0.0, -jnp.inf)[:, None]
        probs = softmax_ext(scores, mask, scale=kq_scale).astype(compute_dtype)
        ctx = jnp.einsum("bhts,bshd->bthd", probs, v_l,
                         preferred_element_type=jnp.float32)
        attn_out = matmul(ctx.reshape(B, T, H * dv).astype(compute_dtype),
                          lw["wo"]).astype(compute_dtype)
        h = h + attn_out * cfg.res_scale
        f = rms_norm(h, lw["ffn_norm"], cfg.rms_eps)
        if "ffn_gate_inp" in lw:
            ffn_out = _moe(cfg, lw, f, compute_dtype)
        elif not cfg.ffn_gated:
            # plm LLM_FFN_RELU_SQR + LLM_FFN_SEQ: down(relu(up x)^2)
            u = matmul(f, lw["ffn_up"]).astype(compute_dtype)
            u = jnp.square(jax.nn.relu(u.astype(jnp.float32))).astype(compute_dtype)
            ffn_out = matmul(u, lw["ffn_down"]).astype(compute_dtype)
        else:
            g = silu(matmul(f, lw["ffn_gate"]).astype(compute_dtype))
            u = matmul(f, lw["ffn_up"]).astype(compute_dtype)
            ffn_out = matmul(g * u, lw["ffn_down"]).astype(compute_dtype)
        h = h + ffn_out * cfg.res_scale
    kv_cache = {"k": jnp.stack(new_k), "v": jnp.stack(new_v)}
    h = rms_norm(h, weights["output_norm"], cfg.rms_eps)
    if not logits_all:
        h = h[:, -1, :]
    if cfg.logit_scale != 1.0:  # minicpm3 lm-head scaling (n_embd_base/n_embd)
        h = h * cfg.logit_scale
    logits = matmul(h, weights["output"])
    return logits.astype(jnp.float32), kv_cache


def convert_hf_deepseek2(sd, c, out_path, qtype=GGMLType.F16,
                         tokenizer_fields=None):
    """HF DeepseekV2ForCausalLM -> GGUF (deepseek2 arch, reference naming:
    convert_hf_to_gguf.py DeepseekV2Model)."""
    from .convert_hf import _write_gguf

    t = {"token_embd.weight": sd["model.embed_tokens.weight"]}
    if "lm_head.weight" in sd:
        t["output.weight"] = sd["lm_head.weight"]
    n_layer = int(c.num_hidden_layers)
    dense_lead = int(getattr(c, "first_k_dense_replace", n_layer))
    n_exp = int(getattr(c, "n_routed_experts", 0) or 0)
    for i in range(n_layer):
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
        if n_exp and i >= dense_lead:
            t[g + "ffn_gate_inp.weight"] = sd[p + "mlp.gate.weight"]
            if p + "mlp.gate.e_score_correction_bias" in sd:
                t[g + "exp_probs_b.bias"] = sd[p + "mlp.gate.e_score_correction_bias"]
            for tn, hn in (("gate", "gate_proj"), ("up", "up_proj"),
                           ("down", "down_proj")):
                stk = np.stack([sd[p + f"mlp.experts.{e}.{hn}.weight"]
                                for e in range(n_exp)])
                t[g + f"ffn_{tn}_exps.weight"] = stk
                if int(getattr(c, "n_shared_experts", 0) or 0):
                    t[g + f"ffn_{tn}_shexp.weight"] = sd[
                        p + f"mlp.shared_experts.{hn}.weight"]
        else:
            t[g + "ffn_gate.weight"] = sd[p + "mlp.gate_proj.weight"]
            t[g + "ffn_up.weight"] = sd[p + "mlp.up_proj.weight"]
            t[g + "ffn_down.weight"] = sd[p + "mlp.down_proj.weight"]
    t["output_norm.weight"] = sd["model.norm.weight"]
    md = {
        "deepseek2.block_count": n_layer,
        "deepseek2.context_length": int(c.max_position_embeddings),
        "deepseek2.embedding_length": int(c.hidden_size),
        "deepseek2.feed_forward_length": int(c.intermediate_size),
        "deepseek2.attention.head_count": int(c.num_attention_heads),
        "deepseek2.attention.head_count_kv": int(c.num_attention_heads),
        "deepseek2.attention.layer_norm_rms_epsilon": float(c.rms_norm_eps),
        "deepseek2.rope.freq_base": float(getattr(c, "rope_theta", 10000.0)),
        "deepseek2.vocab_size": int(c.vocab_size),
        "deepseek2.attention.kv_lora_rank": int(c.kv_lora_rank),
        "deepseek2.attention.key_length":
            int(c.qk_nope_head_dim + c.qk_rope_head_dim),
        "deepseek2.attention.value_length": int(c.v_head_dim),
        "deepseek2.rope.dimension_count": int(c.qk_rope_head_dim),
        "deepseek2.leading_dense_block_count": dense_lead,
    }
    if getattr(c, "q_lora_rank", None):
        md["deepseek2.attention.q_lora_rank"] = int(c.q_lora_rank)
    if n_exp:
        md.update({
            "deepseek2.expert_count": n_exp,
            "deepseek2.expert_used_count": int(c.num_experts_per_tok),
            "deepseek2.expert_feed_forward_length": int(c.moe_intermediate_size),
            "deepseek2.expert_shared_count": int(getattr(c, "n_shared_experts", 0) or 0),
            "deepseek2.expert_weights_scale": float(getattr(c, "routed_scaling_factor", 1.0)),
            "deepseek2.expert_weights_norm": bool(getattr(c, "norm_topk_prob", False)),
            "deepseek2.expert_gating_func":
                2 if getattr(c, "scoring_func", "softmax") == "sigmoid" else 1,
        })
    rs = getattr(c, "rope_scaling", None)
    if rs and rs.get("type") == "yarn":
        md["deepseek2.rope.scaling.type"] = "yarn"
        md["deepseek2.rope.scaling.factor"] = float(rs["factor"])
        md["deepseek2.rope.scaling.original_context_length"] = int(
            rs["original_max_position_embeddings"])
        md["deepseek2.rope.scaling.yarn_log_multiplier"] = float(
            0.1 * rs.get("mscale_all_dim", 0.0))
    return _write_gguf(out_path, "deepseek2", md, t, qtype,
                       tokenizer_fields=tokenizer_fields)
