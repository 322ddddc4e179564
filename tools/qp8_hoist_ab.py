"""Same-process A/B of the r5 prologue/expansion scratch hoist
(GHT_QP8_HOIST): the qp8 decode kernels re-ran the butterfly activation
quant + masked expansion ONCE PER LANE BLOCK in r4; the hoist computes
them once (grid step 0) into VMEM scratch.  Both variants compile in one
process (hoist is a jit-static), so the ratio is drift-proof.

Expected biggest win: wide-N shapes with many grid steps — the
128256-row lm_head at bn=2048 ran 63 redundant prologue passes (the r4
reason qp8 lost to the il f32 route there, docs/performance.md).
"""
import os
import sys

import numpy as np

sys.path.insert(0, ".")

from ggml_hexagon_tpu.utils.jaxcache import enable as _jc
_jc()

sys.path.insert(0, "tools")
from qp8_sweep import timed_chain  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from bench import random_qtensor
    from ggml_hexagon_tpu.ops.qmm_qp8 import (qp8_matmul, qp8_matmul_act,
                                              qp8_matmul_normed)
    from ggml_hexagon_tpu.quant.formats import GGMLType

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    eps = 1e-5
    shapes = [
        ("gateup normed", 28672, 4096, GGMLType.Q4_K, "normed"),
        ("down act", 4096, 14336, GGMLType.Q4_K, "act"),
        ("down6 act", 4096, 14336, GGMLType.Q6_K, "act"),
        ("head6 plain", 128256, 4096, GGMLType.Q6_K, "plain"),
    ]
    for label, n, k, qtype, kind in shapes:
        qt = random_qtensor(rng, n, k, qtype,
                            fast="host").astype_device(layout="t")
        nbytes = (qt.fq.size + qt.fs.size * 2
                  + (qt.fb.size * 2 if qt.fb is not None else 0))
        wn = jnp.asarray(rng.normal(size=(k,)) * 0.1 + 1.0, jnp.float32)
        for hoist in ("0", "1"):
            os.environ["GHT_QP8_HOIST"] = hoist
            tag = f"{label} hoist={hoist}"
            if kind == "normed":
                x0 = jnp.asarray(rng.normal(size=(1, k)), jnp.float32)

                def f(x, qt=qt, wn=wn):
                    y = qp8_matmul_normed(x, qt, wn, eps)
                    return x + y[:1, :1] * 1e-7
            elif kind == "act":
                x0 = jnp.asarray(rng.normal(size=(1, 2 * k)), jnp.float32)

                def f(x, qt=qt, k=k):
                    y = qp8_matmul_act(x, qt, "silu")
                    return x + jnp.pad(y[:1, :1] * 1e-7,
                                       ((0, 0), (0, 2 * k - 1)))
            else:
                x0 = jnp.asarray(rng.normal(size=(1, k)), jnp.float32)

                def f(x, qt=qt):
                    y = qp8_matmul(x, qt)
                    return x + y[:1, :1] * 1e-7
            try:
                timed_chain(f, x0, tag, nbytes)
            except Exception as e:  # noqa: BLE001
                print(f"{tag}: FAILED {type(e).__name__}: {e}",
                      flush=True)
    os.environ["GHT_QP8_HOIST"] = "1"


if __name__ == "__main__":
    main()
