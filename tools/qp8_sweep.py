"""Sweep the PRODUCTION qp8 decode entry points over (bn, depth) on the
real chip — same-process, honest on-device chains.  Picks the measured
defaults for _pick_bn_t / pick_depth."""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ggml_hexagon_tpu.utils.jaxcache import enable as _jc
_jc()


def timed_chain(f, x0, label, nbytes, n_chain=64, trials=3):
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
    print(f"{label:52s} {per*1e6:9.1f} us  {nbytes/per/1e9:7.1f} GB/s",
          flush=True)
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bn", type=int, nargs="+", default=[1024, 2048])
    ap.add_argument("--depth", type=int, nargs="+", default=[256, 512])
    ap.add_argument("--shapes", nargs="+",
                    default=["gateup", "down", "wo"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import random_qtensor
    from ggml_hexagon_tpu.ops.qmm_qp8 import (qp8_matmul_act,
                                              qp8_matmul_normed,
                                              qp8_matmul_res)
    from ggml_hexagon_tpu.quant.formats import GGMLType

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    eps = 1e-5

    shapes = {
        "gateup": ("normed", 28672, 4096, GGMLType.Q4_K),
        "down": ("act", 4096, 14336, GGMLType.Q4_K),
        "wo": ("res", 4096, 4096, GGMLType.Q4_K),
        "wqk": ("normed", 5120, 4096, GGMLType.Q4_K),
        # packed byte-family candidates (6/5.5/2.5625/3.4375 bpw planes
        # vs the interleaved layout's 8-bit rows)
        "down6": ("act", 4096, 14336, GGMLType.Q6_K),
        "head6": ("plain", 128256, 4096, GGMLType.Q6_K),
        "v6": ("normed", 1024, 4096, GGMLType.Q6_K),
        # coded i-quant planes (3/4/3/2 bpw; any bit pattern is a valid
        # arithmetic code, so synthetic planes suffice for bandwidth)
        "iq2": ("plain", 28672, 4096, GGMLType.IQ2_XXS),
        "iq3": ("plain", 28672, 4096, GGMLType.IQ3_XXS),
        "iq1": ("plain", 28672, 4096, GGMLType.IQ1_S),
        "tq2": ("plain", 28672, 4096, GGMLType.TQ2_0),
    }
    for name in args.shapes:
        kind, n, k, qtype = shapes[name]
        from ggml_hexagon_tpu.quant.pack import QCONFIGS, QTensor
        cfgq = QCONFIGS[qtype]
        if cfgq.code_map:
            # synthetic coded planes at the exact production geometry
            from ggml_hexagon_tpu.ops.qmm_qp8 import _pack_bits
            import jax.numpy as _jnp
            bl, bh = _pack_bits(cfgq)
            n2 = -(-n // 512) * 512
            rows = k * (bl + bh) // 8
            G = k // cfgq.gs
            qt = QTensor(
                cfgq, n, k, None, None, None, None, None, None,
                _jnp.asarray(rng.integers(0, 256, (rows, n2), np.uint8)),
                _jnp.asarray((rng.random((G, n2)) * 2e-3).astype(
                    np.float32), _jnp.bfloat16), None, fl="t")
        else:
            qt = random_qtensor(rng, n, k, qtype,
                                fast="host").astype_device(layout="t")
        nbytes = (qt.fq.size + qt.fs.size * 2
                  + (qt.fb.size * 2 if qt.fb is not None else 0))
        wn = jnp.asarray(rng.normal(size=(k,)) * 0.1 + 1.0, jnp.float32)
        for bn in args.bn:
            os.environ["GHT_QP8_BN"] = str(bn)
            for d in args.depth:
                os.environ["GHT_QP8_DEPTH"] = str(d)
                label = f"{name} {kind} bn={bn} d={d}"
                if kind == "normed":
                    x0 = jnp.asarray(rng.normal(size=(1, k)), jnp.float32)

                    def f(x, qt=qt, wn=wn, k=k):
                        y = qp8_matmul_normed(x, qt, wn, eps)
                        return x + y[:1, :1] * 1e-7
                elif kind == "plain":
                    from ggml_hexagon_tpu.ops.qmm_qp8 import qp8_matmul

                    x0 = jnp.asarray(rng.normal(size=(1, k)), jnp.float32)

                    def f(x, qt=qt):
                        y = qp8_matmul(x, qt)
                        return x + y[:1, :1] * 1e-7
                elif kind == "act":
                    x0 = jnp.asarray(rng.normal(size=(1, 2 * k)),
                                     jnp.float32)

                    def f(x, qt=qt, k=k):
                        y = qp8_matmul_act(x, qt, "silu")
                        return x + jnp.pad(y[:1, :1] * 1e-7,
                                           ((0, 0), (0, 2 * k - 1)))
                else:
                    x0 = jnp.asarray(rng.normal(size=(1, k)), jnp.float32)
                    r0 = jnp.zeros((1, qt.n), jnp.float32)

                    def f(x, qt=qt, r0=r0):
                        y = qp8_matmul_res(x, qt, r0)
                        return x + y[:1, :1] * 1e-7
                try:
                    timed_chain(jax.jit(f), x0, label, nbytes)
                except Exception as ex:  # noqa: BLE001 — lab tool
                    print(f"{label:52s} FAILED {type(ex).__name__}: "
                          f"{str(ex)[:120]}", flush=True)


if __name__ == "__main__":
    main()
