"""Embedding extraction + pooling (llama-embedding / retrieval analog).

Mirrors the reference's pooling modes (llama.h enum llama_pooling_type:
none/mean/cls/last/rank) over the decoder's final hidden states.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import forward, init_kv_cache


def extract_embeddings(cfg, weights, token_lists, pooling: str = "mean",
                       normalize: bool = True, compute_dtype=jnp.bfloat16):
    """Embed a list of token sequences -> [n, n_embd] (pooled) numpy.

    pooling: 'mean' | 'cls' | 'last' | 'none' (per-token states).
    """
    out = []
    # capture final hidden states through the lm_head tap
    for ids in token_lists:
        ids = np.asarray(ids, np.int32)
        T = len(ids)
        kv = init_kv_cache(cfg, 1, max(T, 8), compute_dtype
                           if compute_dtype != "q8_0" else compute_dtype)
        states = {}

        def tap(name, x, **_kw):
            if name == "output.weight":
                states["h"] = x

        _, _ = forward(cfg, weights, jnp.asarray(ids[None, :]), kv, jnp.int32(0),
                       logits_all=True, compute_dtype=compute_dtype, tap=tap)
        h = np.asarray(states["h"], dtype=np.float32)[0]  # [T, n_embd]
        if pooling == "mean":
            e = h.mean(axis=0)
        elif pooling == "cls":
            e = h[0]
        elif pooling == "last":
            e = h[-1]
        elif pooling == "none":
            out.append(h)
            continue
        else:
            raise ValueError(f"unknown pooling {pooling!r}")
        if normalize:
            e = e / (np.linalg.norm(e) + 1e-12)
        out.append(e)
    return np.stack(out) if pooling != "none" else out
