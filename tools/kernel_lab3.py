"""Lab 3: stage-by-stage cost of the dequant pipeline; find the slow op."""
import sys, time

sys.path.insert(0, ".")

from ggml_hexagon_tpu.utils.jaxcache import enable as _jc
_jc()
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OVERHEAD_US = 27.0


def timeit(fn, *args, reps=100):
    y = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), y)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), y)
    return (time.perf_counter() - t0) / reps


rng = np.random.default_rng(0)
N, K, B, BN = 4096, 4096, 8, 512
q8 = jnp.asarray(rng.integers(0, 255, size=(N, K // 2), dtype=np.uint8))
x = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))
dsc = jnp.asarray(rng.normal(size=(N, K // 32)).astype(np.float32))


def run(kernel, extra_specs=(), extra_args=(), scratch=(), name=""):
    @jax.jit
    def go(*a):
        return pl.pallas_call(
            kernel,
            grid=(N // BN,),
            in_specs=[
                pl.BlockSpec((BN, K // 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
                *extra_specs,
            ],
            out_specs=pl.BlockSpec((BN, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
            scratch_shapes=list(scratch),
        )(*a)

    try:
        dt = timeit(go, q8, *extra_args)
        print(f"{name:26s}: {dt*1e6:8.1f}us  (minus overhead ~{dt*1e6-OVERHEAD_US:7.1f}us)")
    except Exception as e:
        print(f"{name:26s}: FAILED {type(e).__name__} {str(e)[:160]}")


# s0: pure load + trivial store
def s0(q_ref, o_ref):
    o_ref[:] = q_ref[:, :128].astype(jnp.int32).astype(jnp.float32)

run(s0, name="s0 load u8")

# s1: u8 shift ops on the whole tile (stay u8)
def s1(q_ref, o_ref, scr):
    qp = q_ref[:]
    lo = qp & 15
    hi = qp >> 4
    scr[:, : K // 2] = lo
    scr[:, K // 2 :] = hi
    o_ref[:] = scr[:, :128].astype(jnp.int32).astype(jnp.float32)

run(s1, scratch=[pltpu.VMEM((BN, K), jnp.uint8)], name="s1 u8 shift+store u8")

# s2: u8 -> bf16 cast of both halves
def s2(q_ref, o_ref, scr):
    qp = q_ref[:]
    scr[:, : K // 2] = (qp & 15).astype(jnp.bfloat16)
    scr[:, K // 2 :] = (qp >> 4).astype(jnp.bfloat16)
    o_ref[:] = scr[:, :128].astype(jnp.float32)

run(s2, scratch=[pltpu.VMEM((BN, K), jnp.bfloat16)], name="s2 u8->bf16 cast")

# s3: + scale multiply in bf16 (tile-level fake scale)
def s3(q_ref, s_ref, o_ref, scr):
    qp = q_ref[:]
    sc = s_ref[:].astype(jnp.bfloat16)  # [BN, K/32]
    sc_rep = pltpu.repeat(sc, 16, axis=1)  # [BN, K/2] (pattern misuse; perf only)
    scr[:, : K // 2] = (qp & 15).astype(jnp.bfloat16) * sc_rep
    scr[:, K // 2 :] = (qp >> 4).astype(jnp.bfloat16) * sc_rep
    o_ref[:] = scr[:, :128].astype(jnp.float32)

run(
    s3,
    extra_specs=[pl.BlockSpec((BN, K // 32), lambda i: (i, 0), memory_space=pltpu.VMEM)],
    extra_args=[dsc],
    scratch=[pltpu.VMEM((BN, K), jnp.bfloat16)],
    name="s3 + bf16 scale mul",
)

# s4: full: dequant to scratch + one big dot
def s4(q_ref, s_ref, x_ref, o_ref, scr):
    qp = q_ref[:]
    sc = s_ref[:].astype(jnp.bfloat16)
    sc_rep = pltpu.repeat(sc, 16, axis=1)
    scr[:, : K // 2] = (qp & 15).astype(jnp.bfloat16) * sc_rep
    scr[:, K // 2 :] = (qp >> 4).astype(jnp.bfloat16) * sc_rep
    acc = jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16), scr[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = jnp.pad(acc, ((0, BN - B), (0, 128 - BN)))[:, :128] if False else (
        jnp.zeros((BN, 128), jnp.float32).at[:B, :].set(jnp.pad(acc, ((0, 0), (0, 128 - BN))) if BN < 128 else acc[:, :128])
    )

def s4b(q_ref, s_ref, x_ref, o_ref, scr):
    qp = q_ref[:]
    sc = s_ref[:].astype(jnp.bfloat16)
    sc_rep = pltpu.repeat(sc, 16, axis=1)
    scr[:, : K // 2] = (qp & 15).astype(jnp.bfloat16) * sc_rep
    scr[:, K // 2 :] = (qp >> 4).astype(jnp.bfloat16) * sc_rep
    acc = jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16), scr[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [B, BN]
    o_ref[:] = jnp.broadcast_to(acc[:, :1], (B, 128)).sum(axis=0, keepdims=True) + jnp.zeros((BN, 128), jnp.float32)

run(
    s4b,
    extra_specs=[
        pl.BlockSpec((BN, K // 32), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ],
    extra_args=[dsc, x],
    scratch=[pltpu.VMEM((BN, K), jnp.bfloat16)],
    name="s4 full dequant + dot",
)

# XLA-only fused dequant matmul for comparison
@jax.jit
def xla_deq_mm(x, q, s):
    lo = (q & 15).astype(jnp.bfloat16)
    hi = (q >> 4).astype(jnp.bfloat16)
    w = jnp.concatenate([lo, hi], axis=1)  # wrong order; perf only
    s_rep = jnp.repeat(s.astype(jnp.bfloat16), 32, axis=1)
    w = w * s_rep
    return jax.lax.dot_general(x.astype(jnp.bfloat16), w, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)

dt = timeit(xla_deq_mm, x, q8, dsc)
print(f"{'x  XLA-only dequant+dot':26s}: {dt*1e6:8.1f}us")
