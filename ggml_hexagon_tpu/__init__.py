"""ggml_hexagon_tpu — a TPU-native quantized-inference engine.

A brand-new framework with the capabilities of llama.cpp/ggml-hexagon
(reference: /root/reference), re-designed TPU-first:

- GGUF block-quant formats (Q4_0..Q8_0, Q2_K..Q8_K, IQ*) are parsed on the
  host and repacked into planar, lane-aligned HBM layouts (`quant.pack`).
- Compute is a single jitted JAX/XLA program per (model, shape-bucket);
  the hot matmuls are fused dequant×matmul Pallas kernels (`ops.qmatmul`)
  that unpack sub-byte weights in VMEM and feed the MXU — never a host-side
  f32 staging copy (the reference's QNN path anti-pattern,
  ggml-hexagon.cpp:1322, is deliberately not replicated).
- Multi-chip scaling is jax.sharding over a Mesh (tensor/data/expert
  parallel), not per-op RPC.

Layer map (mirrors SURVEY.md §1 of the reference):
  quant/      <- ggml/src/ggml-quants.c + ggml-common.h (formats, (de)quant)
  gguf/       <- ggml/src/gguf.cpp + gguf-py (file format)
  ops/        <- ggml/src/ggml-hexagon/kernels + ggml-cpu (compute kernels)
  models/     <- src/llama-model.cpp llm_build_* (architectures)
  runtime/    <- src/llama-context.cpp + llama-kv-cache.cpp (decode loop)
  tokenizer/  <- src/llama-vocab.cpp (SPM/BPE)
  parallel/   <- ggml-backend sched splits / split-buffer TP -> jax.sharding
"""

__version__ = "0.1.0"
