"""Control-vector generation — the llama-cvector-generator analog.

Reference counterpart: examples/cvector-generator/ (cvector-generator.cpp +
pca.hpp + mean.hpp): run positive/negative prompt pairs through the model,
capture each layer's output hidden state ("l_out" cb_eval tensors), stack
per-pair differences, and extract one steering direction per layer either as
the mean difference (mean.hpp) or the top principal component via power
iteration (pca.hpp).  Output GGUF holds direction.<il> tensors consumed by
ControlVector.from_gguf (models/lora.py).

TPU-native shape: hidden states come from the forward pass's tap hook
(models/llama.py "blk.<il>.l_out"), the PCA power iteration is a handful of
jnp matmuls — no bespoke ggml graphs.
"""
from __future__ import annotations

import numpy as np

from ..models.llama import forward, init_kv_cache


def collect_layer_states(cfg, weights, token_lists, compute_dtype=None):
    """Run each token list; return [n_prompts, n_layer, n_embd] last-token
    hidden state per layer (the reference uses the final token's l_out row)."""
    import jax.numpy as jnp

    compute_dtype = compute_dtype or jnp.bfloat16
    rows = []
    for ids in token_lists:
        ids = np.asarray(ids, np.int32)
        states = {}

        def tap(name, x, **_kw):
            if name.endswith(".l_out"):
                states[int(name.split(".")[1])] = x

        kv = init_kv_cache(cfg, 1, max(len(ids), 8), compute_dtype)
        forward(cfg, weights, jnp.asarray(ids[None, :]), kv, jnp.int32(0),
                logits_all=True, compute_dtype=compute_dtype, tap=tap)
        rows.append(np.stack([
            np.asarray(states[il], np.float32)[0, -1]
            for il in range(cfg.n_layer)]))
    return np.stack(rows)


def _power_iteration(m: np.ndarray, n_iter: int = 100, tol: float = 1e-7,
                     seed: int = 0) -> np.ndarray:
    """Top eigenvector of m^T m without forming the full SVD (pca.hpp)."""
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(m.shape[1]).astype(np.float32)
    v /= np.linalg.norm(v)
    for _ in range(n_iter):
        nv = m.T @ (m @ v)
        nv /= np.linalg.norm(nv) + 1e-12
        if np.abs(nv @ v) > 1 - tol:
            v = nv
            break
        v = nv
    return v


def generate_control_vector(cfg, weights, positive_ids, negative_ids,
                            method: str = "pca") -> dict[int, np.ndarray]:
    """Per-layer steering directions from positive/negative prompt pairs.

    method 'pca': top principal component of the pairwise difference matrix,
    sign-aligned with the mean difference (cvector-generator.cpp pca path);
    'mean': plain mean difference (mean.hpp)."""
    assert len(positive_ids) == len(negative_ids), "need matched pairs"
    pos = collect_layer_states(cfg, weights, positive_ids)
    neg = collect_layer_states(cfg, weights, negative_ids)
    diff = pos - neg                     # [n_pairs, n_layer, n_embd]
    out: dict[int, np.ndarray] = {}
    for il in range(cfg.n_layer):
        d = diff[:, il, :]
        mean_dir = d.mean(axis=0)
        if method == "mean" or d.shape[0] == 1:
            v = mean_dir
        else:
            v = _power_iteration(d - d.mean(axis=0, keepdims=True))
            if v @ mean_dir < 0:         # orient toward the positive set
                v = -v
        n = np.linalg.norm(v)
        out[il] = (v / n if n > 0 else v).astype(np.float32)
    return out
