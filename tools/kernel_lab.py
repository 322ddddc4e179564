"""Kernel experiment lab — measures qmatmul variants against the HBM roofline.

Dev tool: times (a) plain XLA bf16 matmul, (b) a pure-stream Pallas kernel
(reads the packed planes, trivial math) = achievable roofline for the access
pattern, (c) kernel variants. Run on the real chip:
    python tools/kernel_lab.py
"""
import sys, time, functools

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ggml_hexagon_tpu.quant.formats import GGMLType
from ggml_hexagon_tpu.quant import pack as P
from ggml_hexagon_tpu.ops.qmatmul import qmatmul

N, K, B = 4096, 4096, 8
rng = np.random.default_rng(0)


def timeit(fn, *args, reps=50):
    y = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), y)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), y)
    return (time.perf_counter() - t0) / reps


# -- A: plain XLA bf16 matmul (upper bound reference for bf16 weights) -------
w_bf16 = jnp.asarray(rng.normal(size=(N, K)), dtype=jnp.bfloat16)
x = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))


@jax.jit
def xla_mm(x, w):
    return jax.lax.dot_general(x.astype(jnp.bfloat16), w, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


dt = timeit(xla_mm, x, w_bf16)
print(f"A xla bf16 mm      : {dt*1e6:8.1f}us  {N*K*2/dt/1e9:7.1f} GB/s")

# -- B: pure-stream pallas: read q plane tile, one cheap op, dot ------------
qt = P.quantize_tensor(rng.normal(size=(N, K)).astype(np.float32), GGMLType.Q4_K).astype_device()
BN = 512


def stream_kernel(x_ref, q_ref, o_ref):
    # just force the bytes through VMEM with minimal math
    q = q_ref[:, :128].astype(jnp.int32).astype(jnp.float32)  # touch a slice
    o_ref[:] = jax.lax.dot_general(x_ref[:, :128], q, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)


@jax.jit
def stream(x, q):
    return pl.pallas_call(
        stream_kernel,
        grid=(N // BN,),
        in_specs=[
            pl.BlockSpec((B, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, K // 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, BN), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
    )(x, q)


dt = timeit(stream, x, qt.q)
print(f"B stream q-plane   : {dt*1e6:8.1f}us  {N*K//2/dt/1e9:7.1f} GB/s")

# -- C: unpack-everything, single dot per tile (whole-row ops) ---------------
def unpack_kernel(x_ref, q_ref, o_ref):
    qp = q_ref[:].astype(jnp.int32)           # [BN, K/2]
    lo = (qp & 15).astype(jnp.bfloat16)
    hi = (qp >> 4).astype(jnp.bfloat16)
    w = jnp.concatenate([lo, hi], axis=1)     # [BN, K] (wrong order, perf only)
    o_ref[:] = jax.lax.dot_general(x_ref[:].astype(jnp.bfloat16), w,
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)


@jax.jit
def unp(x, q):
    return pl.pallas_call(
        unpack_kernel,
        grid=(N // BN,),
        in_specs=[
            pl.BlockSpec((B, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, K // 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, BN), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
    )(x, qt.q)


dt = timeit(unp, x, qt.q)
print(f"C unpack+1dot      : {dt*1e6:8.1f}us  {N*K//2/dt/1e9:7.1f} GB/s")

# -- D: C + tile-repeat scale application (local-interleave semantics) ------
scj = jnp.asarray(np.ascontiguousarray(qt.sc))  # int8 [N, K/32]
dj = qt.d                                        # f32 [N, K/256]


def scaled_kernel(x_ref, q_ref, sc_ref, d_ref, o_ref):
    qp = q_ref[:].astype(jnp.int32)
    lo = (qp & 15).astype(jnp.float32)
    hi = (qp >> 4).astype(jnp.float32)
    q = jnp.concatenate([lo, hi], axis=1)             # [BN, K]
    sc = sc_ref[:].astype(jnp.int32).astype(jnp.float32)  # [BN, K/32]
    d = d_ref[:]                                      # [BN, K/256]
    scale_pat = pltpu.repeat(d, 16, axis=1) * sc      # [BN, K/32] (pattern only; perf test)
    scale = pltpu.repeat(scale_pat, 32, axis=1)       # [BN, K]
    w = (q * scale).astype(jnp.bfloat16)
    o_ref[:] = jax.lax.dot_general(x_ref[:].astype(jnp.bfloat16), w,
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)


@jax.jit
def scaled(x, q, sc, d):
    return pl.pallas_call(
        scaled_kernel,
        grid=(N // BN,),
        in_specs=[
            pl.BlockSpec((B, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, K // 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, K // 32), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, K // 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, BN), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
    )(x, q, sc, d)


try:
    dt = timeit(scaled, x, qt.q, scj, dj)
    print(f"D +tile-rep scales : {dt*1e6:8.1f}us  {N*K//2/dt/1e9:7.1f} GB/s")
except Exception as e:
    print("D FAILED:", type(e).__name__, str(e)[:300])

# -- E: per-superblock chunk loop w/ tile-repeat (k-agnostic layout) --------
def chunked_kernel(x_ref, q_ref, sc_ref, d_ref, o_ref):
    acc = jnp.zeros((B, BN), jnp.float32)
    for c in range(K // 256):
        qp = q_ref[:, c * 128 : (c + 1) * 128].astype(jnp.int32)
        lo = (qp & 15).astype(jnp.float32)
        hi = (qp >> 4).astype(jnp.float32)
        q = jnp.concatenate([lo, hi], axis=1)            # [BN, 256]
        sc = sc_ref[:, c * 8 : (c + 1) * 8].astype(jnp.int32).astype(jnp.float32)
        scale = pltpu.repeat(sc, 32, axis=1) * d_ref[:, c][:, None]
        w = (q * scale).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            x_ref[:, c * 256 : (c + 1) * 256].astype(jnp.bfloat16), w,
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[:] = acc


@jax.jit
def chunked(x, q, sc, d):
    return pl.pallas_call(
        chunked_kernel,
        grid=(N // BN,),
        in_specs=[
            pl.BlockSpec((B, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, K // 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, K // 32), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, K // 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, BN), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
    )(x, q, sc, d)


try:
    dt = timeit(chunked, x, qt.q, scj, dj)
    print(f"E chunked+tile-rep : {dt*1e6:8.1f}us  {N*K//2/dt/1e9:7.1f} GB/s")
except Exception as e:
    print("E FAILED:", type(e).__name__, str(e)[:300])

# -- F: current production kernel for comparison -----------------------------
dt = timeit(functools.partial(qmatmul, x, qt))
print(f"F current qmatmul  : {dt*1e6:8.1f}us  {N*K//2/dt/1e9:7.1f} GB/s")
