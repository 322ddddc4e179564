"""Mamba (selective state-space) models — the recurrent family.

Reference counterparts: GGML_OP_SSM_CONV / GGML_OP_SSM_SCAN (ggml.h:1830)
and llm_build_mamba (src/llama-model.cpp); the recurrent KV-cell design
(one state cell per sequence, llama-kv-cache.h:167) becomes an explicit
state pytree {conv [L,B,d_inner,d_conv-1], ssm [L,B,d_inner,d_state]} —
fixed shapes, carried functionally through each step.

Per layer (selective scan):
  x, z = in_proj(h)                    # each [T, d_inner]
  x = silu(causal_depthwise_conv(x))   # kernel d_conv, with carried state
  dt, B, C = x_proj(x)                 # dt_rank + 2*d_state
  dt = softplus(dt_proj(dt))
  h_t = exp(dt*A) h_{t-1} + dt*B*x ; y = C.h + D*x ; out = out_proj(y*silu(z))

The time recursion is a lax.scan (prefill) that degenerates to one step for
decode; GGUF tensor names follow the convention (ssm_in, ssm_conv1d, ssm_x,
ssm_dt, ssm_a, ssm_d, ssm_out).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..quant.formats import GGMLType
from ..quant.pack import QCONFIGS, pack_tensor
from ..ops.basic import rms_norm, silu
from .llama import matmul, embed


@dataclass(frozen=True)
class MambaConfig:
    n_vocab: int
    n_embd: int
    n_layer: int
    d_inner: int
    d_state: int
    d_conv: int
    dt_rank: int
    rms_eps: float = 1e-5
    arch: str = "mamba"

    @classmethod
    def from_gguf(cls, md: dict) -> "MambaConfig":
        g = lambda k, d=None: md.get(f"mamba.{k}", d)
        n_vocab = md.get("mamba.vocab_size") or len(md.get("tokenizer.ggml.tokens", [])) or 50280
        return cls(
            n_vocab=int(n_vocab),
            n_embd=int(g("embedding_length")),
            n_layer=int(g("block_count")),
            d_inner=int(g("ssm.inner_size")),
            d_state=int(g("ssm.state_size")),
            d_conv=int(g("ssm.conv_kernel")),
            dt_rank=int(g("ssm.time_step_rank")),
            rms_eps=float(g("attention.layer_norm_rms_epsilon", 1e-5)),
        )


def init_mamba_state(cfg: MambaConfig, batch: int, dtype=jnp.float32):
    return {
        "conv": jnp.zeros((cfg.n_layer, batch, cfg.d_conv - 1, cfg.d_inner), dtype),
        "ssm": jnp.zeros((cfg.n_layer, batch, cfg.d_inner, cfg.d_state), dtype),
    }


def load_mamba_weights(reader, dtype=jnp.float32):
    cfg = MambaConfig.from_gguf(reader.metadata)

    def get(name):
        t = reader.tensors[name]
        if t.ggml_type in QCONFIGS and len(t.ne) == 2 and t.ne[0] % 256 == 0:
            return pack_tensor(reader.tensor_bytes(name), t.ggml_type, t.shape).astype_device()
        return jnp.asarray(reader.tensor_f32(name), dtype=dtype)

    layers = []
    for i in range(cfg.n_layer):
        p = f"blk.{i}."
        layers.append({
            "norm": get(p + "attn_norm.weight"),
            "ssm_in": get(p + "ssm_in.weight"),          # [2*d_inner, d]
            "conv_w": get(p + "ssm_conv1d.weight"),      # [d_inner, d_conv]
            "conv_b": get(p + "ssm_conv1d.bias"),
            "ssm_x": get(p + "ssm_x.weight"),            # [dt_rank+2*ds, d_inner]
            "dt_w": get(p + "ssm_dt.weight"),            # [d_inner, dt_rank]
            "dt_b": get(p + "ssm_dt.bias"),
            "A_log": get(p + "ssm_a"),                   # [d_inner, d_state]
            "D": get(p + "ssm_d"),                       # [d_inner]
            "ssm_out": get(p + "ssm_out.weight"),        # [d, d_inner]
        })
    weights = {
        "tok_embd": get("token_embd.weight"),
        "output_norm": get("output_norm.weight"),
        "output": get("output.weight") if "output.weight" in reader.tensors
        else get("token_embd.weight"),
        "layers": layers,
    }
    return cfg, weights


def _mixer(cfg: MambaConfig, lw, h, conv_state, ssm_state):
    """One layer's mixer over T tokens.  h [B, T, d].
    conv_state [B, d_conv-1, d_inner]; ssm_state [B, d_inner, d_state]."""
    B, T, _ = h.shape
    xz = matmul(h, lw["ssm_in"]).astype(jnp.float32)  # [B, T, 2*d_inner]
    x, z = xz[..., : cfg.d_inner], xz[..., cfg.d_inner :]

    # causal depthwise conv with carried state
    xc = jnp.concatenate([conv_state, x], axis=1)  # [B, d_conv-1+T, d_inner]
    w = lw["conv_w"].astype(jnp.float32)  # [d_inner, d_conv]
    stack = jnp.stack(
        [xc[:, k : k + T, :] for k in range(cfg.d_conv)], axis=-1
    )  # [B, T, d_inner, d_conv]
    x = jnp.einsum("btdk,dk->btd", stack, w) + lw["conv_b"].astype(jnp.float32)
    new_conv = xc[:, -(cfg.d_conv - 1) :, :]
    x = silu(x)

    # data-dependent SSM parameters
    dbc = matmul(x, lw["ssm_x"]).astype(jnp.float32)  # [B, T, dt_rank+2*ds]
    dt = dbc[..., : cfg.dt_rank]
    Bc = dbc[..., cfg.dt_rank : cfg.dt_rank + cfg.d_state]
    Cc = dbc[..., cfg.dt_rank + cfg.d_state :]
    dt = matmul(dt, lw["dt_w"]).astype(jnp.float32) + lw["dt_b"].astype(jnp.float32)
    dt = jax.nn.softplus(dt)  # [B, T, d_inner]
    A = -jnp.exp(lw["A_log"].astype(jnp.float32))  # [d_inner, d_state]

    def step(state, inp):
        dt_t, B_t, C_t, x_t = inp  # [B,d_inner],[B,ds],[B,ds],[B,d_inner]
        dA = jnp.exp(dt_t[..., None] * A[None])  # [B, d_inner, ds]
        dBx = dt_t[..., None] * B_t[:, None, :] * x_t[..., None]
        state = state * dA + dBx
        y_t = jnp.einsum("bds,bs->bd", state, C_t)
        return state, y_t

    seq = (
        dt.transpose(1, 0, 2), Bc.transpose(1, 0, 2),
        Cc.transpose(1, 0, 2), x.transpose(1, 0, 2),
    )
    new_ssm, ys = jax.lax.scan(step, ssm_state, seq)
    y = ys.transpose(1, 0, 2)  # [B, T, d_inner]
    y = y + x * lw["D"].astype(jnp.float32)[None, None, :]
    y = y * silu(z)
    out = matmul(y, lw["ssm_out"]).astype(jnp.float32)
    return out, new_conv, new_ssm


def forward(cfg: MambaConfig, weights, tokens, state, logits_all: bool = False,
            compute_dtype=jnp.float32):
    """tokens [B, T] -> (logits, new_state).  State carries across calls, so
    prefill+decode composes exactly like the attention models' KV cache."""
    B, T = tokens.shape
    h = embed(weights["tok_embd"], tokens, jnp.float32)
    new_conv, new_ssm = [], []
    for il, lw in enumerate(weights["layers"]):
        a = rms_norm(h, lw["norm"], cfg.rms_eps)
        out, c_l, s_l = _mixer(cfg, lw, a, state["conv"][il], state["ssm"][il])
        new_conv.append(c_l)
        new_ssm.append(s_l)
        h = h + out
    state = {"conv": jnp.stack(new_conv), "ssm": jnp.stack(new_ssm)}
    h = rms_norm(h, weights["output_norm"], cfg.rms_eps)
    if not logits_all:
        h = h[:, -1, :]
    logits = matmul(h, weights["output"])
    return logits.astype(jnp.float32), state


def convert_hf_mamba(state_dict: dict, hf_config, out_path: str,
                     qtype: GGMLType = GGMLType.F32,
                     tokenizer_fields: dict | None = None):
    """HF MambaForCausalLM -> GGUF (mamba arch tensor naming)."""
    from ..gguf.writer import GGUFWriter

    c = hf_config
    d_inner = int(getattr(c, "intermediate_size", 0) or c.expand * c.hidden_size)
    w = GGUFWriter()
    w.add("general.architecture", "mamba")
    w.add("mamba.block_count", int(c.num_hidden_layers))
    w.add("mamba.embedding_length", int(c.hidden_size))
    w.add("mamba.ssm.inner_size", d_inner)
    w.add("mamba.ssm.state_size", int(c.state_size))
    w.add("mamba.ssm.conv_kernel", int(c.conv_kernel))
    w.add("mamba.ssm.time_step_rank", int(c.time_step_rank))
    w.add("mamba.vocab_size", int(c.vocab_size))
    w.add("mamba.attention.layer_norm_rms_epsilon",
          float(getattr(c, "layer_norm_epsilon", 1e-5)))
    w.add("mamba.context_length", 2**20)
    for key, val in (tokenizer_fields or {}).items():
        w.add(key, val)
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def emit(name, arr, q=False):
        arr = np.ascontiguousarray(arr, np.float32)
        t = qtype if (q and arr.ndim == 2 and arr.shape[-1] % 256 == 0) else GGMLType.F32
        w.add_tensor(name, arr, t)

    emit("token_embd.weight", sd["backbone.embeddings.weight"], q=True)
    for i in range(int(c.num_hidden_layers)):
        pre = f"backbone.layers.{i}.mixer."
        emit(f"blk.{i}.attn_norm.weight", sd[f"backbone.layers.{i}.norm.weight"])
        emit(f"blk.{i}.ssm_in.weight", sd[pre + "in_proj.weight"], q=True)
        emit(f"blk.{i}.ssm_conv1d.weight", sd[pre + "conv1d.weight"][:, 0, :])
        emit(f"blk.{i}.ssm_conv1d.bias", sd[pre + "conv1d.bias"])
        emit(f"blk.{i}.ssm_x.weight", sd[pre + "x_proj.weight"], q=True)
        emit(f"blk.{i}.ssm_dt.weight", sd[pre + "dt_proj.weight"])
        emit(f"blk.{i}.ssm_dt.bias", sd[pre + "dt_proj.bias"])
        emit(f"blk.{i}.ssm_a", -np.exp(sd[pre + "A_log"]) if False else sd[pre + "A_log"])
        emit(f"blk.{i}.ssm_d", sd[pre + "D"])
        emit(f"blk.{i}.ssm_out.weight", sd[pre + "out_proj.weight"], q=True)
    emit("output_norm.weight", sd["backbone.norm_f.weight"])
    if "lm_head.weight" in sd:
        emit("output.weight", sd["lm_head.weight"], q=True)
    w.write_file(out_path)
    return out_path
