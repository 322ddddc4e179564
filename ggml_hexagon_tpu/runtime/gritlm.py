"""GritLM — one model for both embedding and generation.

Reference counterpart: examples/gritlm/gritlm.cpp — embedding mode runs the
decoder with causal attention OFF (llama_set_causal_attn(ctx, false)) and
mean-pools the final hidden states of the sample tokens only (the
instruction prefix is excluded from the pool), L2-normalized; generation is
the normal causal path on the same weights.

The causal toggle maps to forward(..., causal=False) (models/llama.py) —
the llama_set_causal_attn analog.
"""
from __future__ import annotations

import numpy as np


def gritlm_instruction(instruction: str = "") -> str:
    """The GritLM prompt wrapper (gritlm.cpp:gritlm_instruction)."""
    if instruction:
        return f"<|user|>\n{instruction}\n<|embed|>\n"
    return "<|embed|>\n"


def encode(cfg, weights, tokenizer, texts, instruction: str = "",
           compute_dtype=None):
    """Embed texts -> [n, n_embd] L2-normalized (gritlm.cpp:encode)."""
    import jax.numpy as jnp

    from ..models.llama import forward, init_kv_cache

    compute_dtype = compute_dtype or jnp.bfloat16
    prefix = gritlm_instruction(instruction)
    n_inst = len(tokenizer.encode(prefix))
    out = []
    for text in texts:
        ids = np.asarray(tokenizer.encode(prefix + text), np.int32)
        states = {}

        def tap(name, x, **_kw):
            if name == "output.weight":
                states["h"] = x

        kv = init_kv_cache(cfg, 1, max(len(ids), 8), compute_dtype)
        forward(cfg, weights, jnp.asarray(ids[None]), kv, jnp.int32(0),
                logits_all=True, compute_dtype=compute_dtype, tap=tap,
                causal=False)
        h = np.asarray(states["h"], np.float32)[0]     # [T, n_embd]
        emb = h[n_inst:].mean(axis=0)                  # pool sample tokens only
        out.append(emb / (np.linalg.norm(emb) + 1e-12))
    return np.stack(out)


def generate(engine, prompt: str, n_predict: int = 64, sampler=None) -> str:
    """Causal generation on the same weights (gritlm.cpp:generate)."""
    from .sampling import make_chain

    ids = engine.tokenizer.encode(prompt)
    toks = list(engine.generate(ids, n_predict=n_predict,
                                sampler=sampler or make_chain(temp=0.0)))
    return engine.tokenizer.decode(toks)
