"""On-device sampling — jnp transforms of the host sampler semantics.

The reference samples on the host after copying logits back
(llama_context.cpp:1355 copies logits, then the sampler chain runs on CPU).
On TPU a per-token device->host sync costs a full dispatch round-trip, so
the common chain (temp / top-k / top-p / min-p -> categorical) runs inside
the jitted decode loop; exotic samplers (mirostat, DRY, grammar) fall back
to the host path in Engine.generate.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class DeviceSamplerParams:
    temp: float = 0.0  # <= 0 -> greedy
    top_k: int = 0  # 0 -> off
    top_p: float = 1.0
    min_p: float = 0.0


def sample_logits(logits, key, p: DeviceSamplerParams):
    """logits [B, V] -> tokens [B] (same semantics as the host chain)."""
    if p.temp <= 0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    l = logits.astype(jnp.float32)
    if p.top_k and p.top_k < l.shape[-1]:
        kth = jax.lax.top_k(l, p.top_k)[0][..., -1:]
        l = jnp.where(l < kth, -jnp.inf, l)
    if p.top_p < 1.0:
        sorted_l = jnp.sort(l, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_l, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob crosses top_p (incl. crossing one)
        keep_sorted = cum - probs < p.top_p
        kth_idx = jnp.sum(keep_sorted, axis=-1, keepdims=True) - 1
        cutoff = jnp.take_along_axis(sorted_l, kth_idx, axis=-1)
        l = jnp.where(l < cutoff, -jnp.inf, l)
    if p.min_p > 0.0:
        probs = jax.nn.softmax(l, axis=-1)
        thresh = p.min_p * probs.max(axis=-1, keepdims=True)
        l = jnp.where(probs < thresh, -jnp.inf, l)
    return jax.random.categorical(key, l / p.temp, axis=-1).astype(jnp.int32)
