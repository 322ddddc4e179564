"""Prefill attention at S=512: dense vs chunked-flash crossover
(VERDICT r4 Missing #3 — the pp512 path materializes O(T x S) scores
because flash engaged only at S >= 1024).

Measures the 8B-geometry per-layer attention (B=1, T=512, Hkv=8, G=4,
D=128) on the real chip, same process:
  dense             — _attention's einsum + softmax_ext path
  flash c=512/256/128 — flash_attention_cache at that chunk
at cache sizes S=512 and S=1024 (the latter sanity-checks the existing
threshold).  The winner sets models/llama.py FLASH_THRESHOLD / chunk.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ggml_hexagon_tpu.utils.jaxcache import enable as _jc
_jc()

sys.path.insert(0, "tools")
from qp8_sweep import timed_chain  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from ggml_hexagon_tpu.models.llama import LlamaConfig
    from ggml_hexagon_tpu.ops.attention import flash_attention_cache

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    B, Hkv, G, T, D = 1, 8, 4, 512, 128
    cfg = LlamaConfig(n_vocab=32, n_embd=4096, n_layer=1, n_head=32,
                      n_head_kv=8, n_ff=14336)
    scale = 1.0 / float(np.sqrt(D))

    for S in (512, 1024):
        qg = jnp.asarray(rng.normal(size=(B, Hkv, G, T, D)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.bfloat16)
        nbytes = (qg.size + k.size + v.size) * 2

        def dense(x, k=k, v=v, S=S):
            from ggml_hexagon_tpu.ops.basic import softmax_ext

            scores = jnp.einsum("bhgtd,bhsd->bhgts", x, k,
                                preferred_element_type=jnp.float32)
            s_idx = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)[None]
            t_idx = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0)[None]
            mask = jnp.where(s_idx <= t_idx, 0.0,
                             -jnp.inf)[:, None, None]
            probs = softmax_ext(scores, mask, scale=scale).astype(v.dtype)
            out = jnp.einsum("bhgts,bhsd->bhgtd", probs, v,
                             preferred_element_type=jnp.float32)
            return x + out.astype(x.dtype) * 1e-7

        timed_chain(dense, qg, f"S={S} dense", nbytes, n_chain=32)
        for chunk in (512, 256, 128):
            def fl(x, k=k, v=v, chunk=chunk):
                out = flash_attention_cache(x.astype(jnp.float32), k, v,
                                            jnp.int32(0), T, scale,
                                            chunk=chunk)
                return x + out.astype(x.dtype) * 1e-7

            timed_chain(fl, qg, f"S={S} flash c={chunk}", nbytes,
                        n_chain=32)


if __name__ == "__main__":
    main()
