"""LoRA finetuning — the training/optimizer story (ggml-opt analog).

The reference carries an AdamW optimizer over ggml graphs
(ggml/src/ggml-opt.cpp) used for finetuning.  TPU-native version: the
decoder forward is already a differentiable JAX program; freeze the packed
quantized base weights (integer planes produce zero cotangents — they are
jax.lax.stop_gradient'd), attach LoRA A/B as the trainable pytree, and run
optax.adamw over jax.value_and_grad of the causal-LM loss.  Whole train
step is one jitted program (fwd+bwd+update).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.llama import LlamaConfig, forward, init_kv_cache


TARGETS = ("wq", "wv")  # default LoRA target projections


def init_lora_params(cfg: LlamaConfig, rank: int = 8, targets=TARGETS, seed: int = 0):
    """Trainable pytree: per-layer {target: (A [r, K], B [N, r])}, B zero-init."""
    rng = np.random.default_rng(seed)
    dims = {
        "wq": (cfg.n_head * cfg.hd, cfg.n_embd),
        "wk": (cfg.n_head_kv * cfg.hd, cfg.n_embd),
        "wv": (cfg.n_head_kv * cfg.hd, cfg.n_embd),
        "wo": (cfg.n_embd, cfg.n_head * cfg.hd),
        "ffn_gate": (cfg.n_ff, cfg.n_embd),
        "ffn_up": (cfg.n_ff, cfg.n_embd),
        "ffn_down": (cfg.n_embd, cfg.n_ff),
    }
    params = []
    for _ in range(cfg.n_layer):
        layer = {}
        for t in targets:
            n, k = dims[t]
            layer[t] = (
                jnp.asarray(rng.normal(size=(rank, k)).astype(np.float32) / np.sqrt(k)),
                jnp.zeros((n, rank), jnp.float32),
            )
        params.append(layer)
    return params


def _attach(weights: dict, lora_params, alpha: float, rank: int) -> dict:
    scale = alpha / rank
    out = dict(weights)
    out["layers"] = []
    for lw, lp in zip(weights["layers"], lora_params):
        new = dict(lw)
        for t, (a, b) in lp.items():
            new[t + "_lora"] = (a, b, scale)
        out["layers"].append(new)
    return out


def causal_lm_loss(cfg, weights, lora_params, tokens, alpha, rank):
    """Mean next-token cross-entropy over tokens [B, T]."""
    w = _attach(jax.tree.map(jax.lax.stop_gradient, weights), lora_params, alpha, rank)
    kv = init_kv_cache(cfg, tokens.shape[0], tokens.shape[1], jnp.float32)
    logits, _ = forward(cfg, w, tokens, kv, jnp.int32(0), logits_all=True,
                        compute_dtype=jnp.float32)
    lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
    return nll.mean()


@dataclass
class LoraTrainer:
    cfg: LlamaConfig
    weights: dict
    rank: int = 8
    alpha: float = 16.0
    lr: float = 1e-3
    targets: tuple = TARGETS

    def __post_init__(self):
        self.params = init_lora_params(self.cfg, self.rank, self.targets)
        self.opt = optax.adamw(self.lr)
        self.opt_state = self.opt.init(self.params)
        cfg, alpha, rank = self.cfg, self.alpha, self.rank

        @jax.jit
        def train_step(params, opt_state, weights, tokens):
            loss, grads = jax.value_and_grad(
                lambda p: causal_lm_loss(cfg, weights, p, tokens, alpha, rank)
            )(params)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._step = train_step

    def step(self, tokens) -> float:
        tokens = jnp.asarray(np.asarray(tokens, np.int32))
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, self.weights, tokens
        )
        return float(loss)

    def export_adapter(self, path: str):
        """Write the trained adapter as a standard LoRA GGUF."""
        from ..models.lora import write_lora_gguf, _KEY_TO_NAME

        ab = {}
        for il, lp in enumerate(self.params):
            for t, (a, b) in lp.items():
                ab[f"blk.{il}.{_KEY_TO_NAME[t]}"] = (np.asarray(a), np.asarray(b))
        write_lora_gguf(path, ab, alpha=self.alpha)
        return path


# ---------------------------------------------------------------------------
# full-weight training (the complete ggml-opt analog)
# ---------------------------------------------------------------------------

_EXPORT_NAMES = {
    "wq": "attn_q.weight", "wk": "attn_k.weight", "wv": "attn_v.weight",
    "wo": "attn_output.weight", "ffn_gate": "ffn_gate.weight",
    "ffn_up": "ffn_up.weight", "ffn_down": "ffn_down.weight",
    "attn_norm": "attn_norm.weight", "ffn_norm": "ffn_norm.weight",
}


def dense_master_weights(weights: dict, dtype=jnp.float32) -> dict:
    """Dequantize every matmul weight into a TRAINABLE dense master copy
    (the reference trains f32/f16 masters too — ggml-opt runs AdamW over
    dense tensors, ggml/src/ggml-opt.cpp; quantized planes are frozen
    inference artifacts, not parameters)."""
    from ..ops.qmatmul import dequantize_jax
    from ..quant.pack import QTensor

    def conv(v):
        if isinstance(v, QTensor):
            return dequantize_jax(v, dtype)
        return jnp.asarray(v, dtype)

    out = {k: conv(v) for k, v in weights.items() if k != "layers"}
    out["layers"] = [
        {k: conv(v) for k, v in lw.items() if v is not None}
        for lw in weights["layers"]
    ]
    return out


def full_lm_loss(cfg, params, tokens):
    kv = init_kv_cache(cfg, tokens.shape[0], tokens.shape[1], jnp.float32)
    logits, _ = forward(cfg, params, tokens, kv, jnp.int32(0),
                        logits_all=True, compute_dtype=jnp.float32)
    lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
    return nll.mean()


@dataclass
class FullTrainer:
    """Full-weight AdamW causal-LM training (ggml-opt / finetune analog).

    Takes UNFUSED weights (Engine/load with fuse=False); every tensor —
    projections, norms, embeddings, lm_head — is a trainable f32 master.
    One jitted step = forward + backward + AdamW update.  Export writes a
    standard GGUF (f16 or re-quantized via the usual encoders), so the
    result round-trips through the normal inference/quantize pipeline.
    """

    cfg: LlamaConfig
    weights: dict
    lr: float = 1e-4
    weight_decay: float = 0.01
    grad_clip: float = 1.0

    def __post_init__(self):
        self.params = dense_master_weights(self.weights)
        tx = [optax.clip_by_global_norm(self.grad_clip)] \
            if self.grad_clip else []
        self.opt = optax.chain(*tx, optax.adamw(
            self.lr, weight_decay=self.weight_decay))
        self.opt_state = self.opt.init(self.params)
        cfg = self.cfg

        @jax.jit
        def train_step(params, opt_state, tokens):
            loss, grads = jax.value_and_grad(
                lambda p: full_lm_loss(cfg, p, tokens))(params)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._step = train_step

    def step(self, tokens) -> float:
        tokens = jnp.asarray(np.asarray(tokens, np.int32))
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, tokens)
        return float(loss)

    def export_gguf(self, path: str, qtype=None, metadata: dict | None = None):
        """Write the trained masters as a GGUF (f16 by default, or any
        supported quant type via the standard encoders)."""
        from ..gguf.writer import GGUFWriter
        from ..quant.formats import GGMLType
        from ..quant.ref_numpy import QUANTIZE

        qtype = qtype or GGMLType.F16
        cfg = self.cfg
        md = {
            "general.architecture": "llama",
            "llama.embedding_length": cfg.n_embd,
            "llama.block_count": cfg.n_layer,
            "llama.attention.head_count": cfg.n_head,
            "llama.attention.head_count_kv": cfg.n_head_kv,
            "llama.feed_forward_length": cfg.n_ff,
            "llama.rope.freq_base": cfg.rope_theta,
            "llama.context_length": cfg.n_ctx_train,
            "llama.attention.layer_norm_rms_epsilon": cfg.rms_eps,
            "llama.vocab_size": cfg.n_vocab,
            **(metadata or {}),
        }

        w = GGUFWriter()
        for k, v in md.items():
            w.add(k, v)

        def emit(arr, name):
            a = np.asarray(arr, np.float32)
            t = qtype
            if not (a.ndim == 2 and t in QUANTIZE and a.shape[1] % 256 == 0):
                t = GGMLType.F32 if a.ndim == 1 else GGMLType.F16
            w.add_tensor(name, a, t)

        p = self.params
        # every trained parameter must be exportable — silently dropping a
        # trained tensor (attention biases, q/k norms, non-llama extras)
        # would write a model that does not match the one trained
        extra = {k for lw in p["layers"] for k in lw
                 if k not in _EXPORT_NAMES}
        if extra:
            raise ValueError(
                f"trained layer tensors without an export mapping: "
                f"{sorted(extra)}; extend _EXPORT_NAMES or export an "
                f"adapter instead")
        emit(p["tok_embd"], "token_embd.weight")
        emit(p["output_norm"], "output_norm.weight")
        emit(p["output"], "output.weight")
        for il, lw in enumerate(p["layers"]):
            for key, nm in _EXPORT_NAMES.items():
                if key in lw:
                    emit(lw[key], f"blk.{il}.{nm}")
        w.write_file(path)
        return path
