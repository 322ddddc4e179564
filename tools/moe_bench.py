"""Mixtral-class MoE decode bench: indirect (gathered top-k) vs dense
all-experts — the VERDICT r2 item-2 done-bar: decode cost must scale with
n_expert_used, not n_expert.

One Mixtral-8x7B MoE FFN layer at full size (E=8 experts, d=4096,
n_ff_e=14336, Q4_K): dense evaluates all 8 experts (the reference-
semantics fallback); indirect streams only the top-2 experts' planes
(MUL_MAT_ID analog, ggml.h:1135).  Ideal ratio ~E/k = 4x.

Honest chain timing (docs/performance.md protocol).
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ggml_hexagon_tpu.utils.jaxcache import enable as _jc
_jc()


def timed_chain(f, x0, label, n_chain=16, trials=3):
    import functools as ft

    import jax

    def loop(n, x):
        return jax.lax.fori_loop(0, n, lambda i, xx: f(xx), x)

    g1 = jax.jit(ft.partial(loop, 1))
    gN = jax.jit(ft.partial(loop, n_chain))
    float(np.asarray(g1(x0)).reshape(-1)[0])
    float(np.asarray(gN(x0)).reshape(-1)[0])
    rtt = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(g1(x0)).reshape(-1)[0])
        rtt = min(rtt, time.perf_counter() - t0)
    best = 1e9
    for _ in range(trials):
        t0 = time.perf_counter()
        float(np.asarray(gN(x0)).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    per = max((best - rtt) / (n_chain - 1), 1e-9)
    print(f"{label:44s} {per*1e6:9.1f} us", flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp

    import bench as B
    import ggml_hexagon_tpu.models.llama as L
    from ggml_hexagon_tpu.models.llama import LlamaConfig
    from ggml_hexagon_tpu.quant.formats import GGMLType

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    d, n_ff_e, E, K = 4096, 14336, 8, 2
    cfg = LlamaConfig(n_vocab=32000, n_embd=d, n_layer=1, n_head=32,
                      n_head_kv=8, n_ff=n_ff_e, n_expert=E,
                      n_expert_used=K, n_ff_exp=n_ff_e)

    def qt(n, k):
        return B.random_qtensor(rng, n, k, GGMLType.Q4_K,
                                fast="host").astype_device().without_wire()

    print("building 1 Mixtral-8x7B MoE layer "
          f"({E} experts x {n_ff_e}, Q4_K)...", flush=True)
    lw = {
        "ffn_gate_inp": jnp.asarray(rng.normal(size=(E, d)) * 0.1,
                                    jnp.float32),
        "ffn_gate_exps": qt(E * n_ff_e, d),
        "ffn_up_exps": qt(E * n_ff_e, d),
        "ffn_down_exps": qt(E * d, n_ff_e),
    }
    nbytes = sum(int(x.size) * x.dtype.itemsize
                 for x in jax.tree.leaves(lw))
    print(f"expert planes on device: {nbytes/1e9:.2f} GB", flush=True)

    x0 = jnp.asarray(rng.normal(size=(1, 1, d)) * 0.5, jnp.bfloat16)

    def run_indirect(x):
        y = L._moe_ffn(cfg, lw, x, jnp.bfloat16)
        return (y * 1e-6 + x.astype(jnp.float32)).astype(jnp.bfloat16)

    def run_dense(x):
        # force the dense all-experts path (the pre-round-3 behavior);
        # NOTE: an explicit flag, not a monkeypatch — jit traces lazily,
        # so a patch restored before the first call never takes effect
        y = L._moe_ffn(cfg, lw, x, jnp.bfloat16, force_dense=True)
        return (y * 1e-6 + x.astype(jnp.float32)).astype(jnp.bfloat16)

    t_ind = timed_chain(run_indirect,
                        x0, f"indirect top-{K} of {E} (MUL_MAT_ID)")
    t_dense = timed_chain(run_dense, x0, f"dense all-{E} experts")
    print(f"\nspeedup dense/indirect: {t_dense/t_ind:.2f}x "
          f"(ideal ~{E/K:.0f}x: cost follows n_expert_used={K}, "
          f"not n_expert={E})", flush=True)


if __name__ == "__main__":
    main()
