"""Mixtral-class MUL_MAT_ID bench: the gathered-expert kernel vs dense
all-experts at the KERNEL level (VERDICT r2 item-2 done-bar: decode cost
must scale with n_expert_used, not n_expert).

Full Mixtral-8x7B expert-FFN geometry (E=8, d=4096, n_ff_e=14336, Q4_K,
one layer = 0.88 GB of expert planes).  "Dense" = one qmatmul_fast over
ALL stacked expert rows (what the pre-round-3 masked evaluation paid in
HBM traffic); "indirect" = qmatmul_fast_indirect streaming only the
top-k=2 selected experts' rows (ggml.h:1135 MUL_MAT_ID analog).

Timing: dependent host-dispatch chains closed by one data fetch
(bench.py protocol; per-step times are ms-scale, dispatch ~27us).
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ggml_hexagon_tpu.utils.jaxcache import enable as _jc
_jc()


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    import bench as B
    from ggml_hexagon_tpu.ops.qmm_fast import (qmatmul_fast,
                                               qmatmul_fast_indirect)
    from ggml_hexagon_tpu.quant.formats import GGMLType

    ap = argparse.ArgumentParser()
    ap.add_argument("--qtype", default="Q4_K",
                    help="expert weight type; Q5_K matches the BASELINE "
                         "Mixtral-8x7B Q5_K_M config (llama-quant puts "
                         "the expert FFN at Q5_K there)")
    args = ap.parse_args()
    qtype = GGMLType[args.qtype]

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    d, n_ff_e, E, K = 4096, 14336, 8, 2

    def qt(n, k):
        return B.random_qtensor(rng, n, k, qtype,
                                fast="host").astype_device().without_wire()

    print(f"building {E} experts x {n_ff_e} (gate+up+down, "
          f"{qtype.name})...", flush=True)
    gate = qt(E * n_ff_e, d)
    up = qt(E * n_ff_e, d)
    down = qt(E * d, n_ff_e)
    nbytes = sum(int(x.size) * x.dtype.itemsize
                 for t in (gate, up, down) for x in jax.tree.leaves(t))
    print(f"expert planes on device: {nbytes/1e9:.2f} GB", flush=True)

    ids = jnp.asarray([1, 6], jnp.int32)  # one token, top-2 experts
    x = jnp.asarray(rng.normal(size=(2, d)), jnp.float32)

    # the expert planes are jit ARGUMENTS, not closure constants — the
    # tunneled backend embeds jit constants in the remote_compile
    # request, and 0.88 GB of planes wedges it (same gotcha as
    # tools/head_lab.py)
    @jax.jit
    def step_indirect(xx, gate, up, down):
        g = qmatmul_fast_indirect(xx, gate, ids, n_ff_e)
        u = qmatmul_fast_indirect(xx, up, ids, n_ff_e)
        gu = (g * jax.nn.sigmoid(g) * u).astype(jnp.float32)
        y = qmatmul_fast_indirect(gu, down, ids, d)
        return (y * 1e-6 + xx).astype(jnp.float32)

    @jax.jit
    def step_dense(xx, gate, up, down):
        # all-experts traffic: every expert row streams (the dense
        # masked-evaluation baseline); one token against E*n_ff rows
        g = qmatmul_fast(xx, gate)
        u = qmatmul_fast(xx, up)
        gu = (g[:, :n_ff_e] * jax.nn.sigmoid(g[:, :n_ff_e])
              * u[:, :n_ff_e]).astype(jnp.float32)
        y = qmatmul_fast(gu, down)
        return (y[:, :d] * 1e-6 + xx).astype(jnp.float32)

    def timeit(f, xx, n, label):
        y = f(xx, gate, up, down)
        float(np.asarray(y)[0, 0])  # compile + warm
        best = 1e9
        for _ in range(3):
            z = xx
            t0 = time.perf_counter()
            for _ in range(n):
                z = f(z, gate, up, down)
            float(np.asarray(z)[0, 0])
            best = min(best, (time.perf_counter() - t0 - 0.027) / n)
        print(f"{label:38s} {best*1e3:8.2f} ms", flush=True)
        return best

    ti = timeit(step_indirect, x, 24, f"indirect top-{K} of {E} (MUL_MAT_ID)")
    td = timeit(step_dense, x, 8, f"dense all-{E} experts")
    print(f"\nspeedup dense/indirect: {td/ti:.2f}x (ideal ~{E//K}x: "
          f"cost follows n_expert_used={K}, not n_expert={E})", flush=True)
    # Mixtral-8x7B has 32 layers; the expert FFN above is the dominant
    # decode cost (attention/router/embed ~ the 8B model's non-FFN tail,
    # ~0.9 ms/step in the r4 composition).  Projection, clearly labeled:
    n_layer, other_ms = 32, 0.9
    for name, t in (("indirect", ti), ("dense-forced", td)):
        step_ms = n_layer * t * 1e3 + other_ms
        print(f"projected Mixtral decode ({name:12s}): "
              f"{t*1e6:7.0f} us/layer -> {1000.0/step_ms:6.1f} t/s "
              f"(32 layers + {other_ms} ms non-FFN tail)", flush=True)


if __name__ == "__main__":
    main()
