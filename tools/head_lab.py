"""lm_head route A/B (VERDICT r4 Missing #2b): the 128256x4096 Q6_K head
ran the interleaved f32 byte route in r4 because the qp8 kernel re-ran
its prologue/expansion on every one of the ~63 lane blocks (measured 542
vs ~750 GB/s).  With the r5 scratch hoist that redundancy is gone — this
lab re-decides the gate, same process, planes passed as jit ARGUMENTS
(closure constants of the outer chain jit blow the remote_compile
request-size limit at this tensor size).
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ggml_hexagon_tpu.utils.jaxcache import enable as _jc
_jc()


def timed_chain_arg(f, x0, qt, label, nbytes, n_chain=48, trials=3):
    """qp8_sweep.timed_chain with the weight passed as a jit argument."""
    import functools as ft

    import jax

    def loop(n, x, qt):
        return jax.lax.fori_loop(0, n, lambda i, xx: f(xx, qt), x)

    g1 = jax.jit(ft.partial(loop, 1))
    gN = jax.jit(ft.partial(loop, n_chain))
    float(np.asarray(g1(x0, qt)).reshape(-1)[0])
    float(np.asarray(gN(x0, qt)).reshape(-1)[0])
    rtt = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(g1(x0, qt)).reshape(-1)[0])
        rtt = min(rtt, time.perf_counter() - t0)
    best = 1e9
    for _ in range(trials):
        t0 = time.perf_counter()
        float(np.asarray(gN(x0, qt)).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    per = max((best - rtt) / (n_chain - 1), 1e-9)
    print(f"{label:48s} {per*1e6:9.1f} us  {nbytes/per/1e9:7.1f} GB/s",
          flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp

    from bench import random_qtensor
    from ggml_hexagon_tpu.ops.qmm_fast import qmatmul_fast
    from ggml_hexagon_tpu.quant.formats import GGMLType

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    n, k = 128256, 4096
    host = random_qtensor(rng, n, k, GGMLType.Q6_K, fast="host")
    x0 = jnp.asarray(rng.normal(size=(1, k)), jnp.float32)

    def f(x, qt):
        y = qmatmul_fast(x, qt)
        return x + y[:1, :1] * 1e-7

    # A: the production il f32 byte route (r4 gate)
    qt_il = host.astype_device(layout="il").without_wire()
    nb_il = qt_il.fq.size + qt_il.fs.size * 2
    timed_chain_arg(f, x0, qt_il, "head Q6_K il f32 route", nb_il)
    # B: qp8 t-layout (6 bpw wire-density planes) with the r5 hoist
    qt_t = host.astype_device(layout="t").without_wire()
    nb_t = qt_t.fq.size + qt_t.fs.size * 2
    timed_chain_arg(f, x0, qt_t, "head Q6_K qp8 (hoisted)", nb_t)
    # repeat A to bracket drift
    timed_chain_arg(f, x0, qt_il, "head Q6_K il f32 route #2", nb_il)
    timed_chain_arg(f, x0, qt_t, "head Q6_K qp8 (hoisted) #2", nb_t)


if __name__ == "__main__":
    main()
