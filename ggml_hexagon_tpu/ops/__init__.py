from .qmatmul import qmatmul, qmatmul_xla, qmatmul_jax, qmatmul_pallas, dequantize_jax
