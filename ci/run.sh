#!/usr/bin/env bash
# CI gate — the reference's ci/run.sh analog (SURVEY §4):
#   1. full test suite on the virtual 8-device CPU mesh
#   2. single-chip compile check of the flagship forward (entry)
#   3. multi-chip dry run: tp x dp GSPMD, MoE/EP, pipeline, pp x tp
#   4. end-to-end model pipeline: tiny HF model -> GGUF -> quantize
#      -> generate -> perplexity (the reference's quantize->cli->perplexity
#      matrix, scoped to one quant type per run)
# Runs entirely on CPU; pass REAL_CHIP=1 to also run bench.py on the TPU.
set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_PLATFORMS=cpu
export XLA_FLAGS="${XLA_FLAGS:-} --xla_force_host_platform_device_count=8"

echo "== [0/4] native library build =="
# the .so is never committed (gitignored); CI builds it from source
python -m ggml_hexagon_tpu.native.build

echo "== [1/4] test suite =="
python -m pytest tests/ -q

echo "== [2/4] entry compile check =="
python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as g
fn, args = g.entry()
out = jax.jit(fn)(*args)
jax.block_until_ready(out[0])
print("entry OK", out[0].shape)
EOF

echo "== [3/4] multi-chip dry run =="
python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as g
g.dryrun_multichip(8)
EOF

echo "== [4/4] quantize -> generate -> perplexity =="
python - <<'EOF'
import tempfile, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, torch, transformers
from ggml_hexagon_tpu.models.convert_hf import convert_hf_llama
from ggml_hexagon_tpu.quant.formats import GGMLType
from ggml_hexagon_tpu.cli import main

cfg = transformers.LlamaConfig(
    vocab_size=300, hidden_size=256, intermediate_size=512,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=128, tie_word_embeddings=False)
torch.manual_seed(0)
m = transformers.LlamaForCausalLM(cfg)
sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
toks = ["<unk>", "<s>", "</s>"] + [f"<0x{b:02X}>" for b in range(256)] + \
       [f"t{i}" for i in range(41)]
tf = {"tokenizer.ggml.model": "llama", "tokenizer.ggml.tokens": toks[:300],
      "tokenizer.ggml.scores": [0.0] * 300,
      "tokenizer.ggml.token_type": [2, 3, 3] + [6] * 256 + [1] * 41}
d = tempfile.mkdtemp()
f16 = os.path.join(d, "m.gguf")
q = os.path.join(d, "q.gguf")
convert_hf_llama(sd, cfg, f16, qtype=GGMLType.F16, tokenizer_fields=tf)
assert main(["quantize", f16, q, "Q4_K_M"]) == 0
assert main(["generate", "-m", q, "--prompt-tokens", "1 5 9", "-n", "4",
             "--temp", "0", "-c", "64"]) == 0
corpus = os.path.join(d, "c.txt")
open(corpus, "w").write("hello world " * 50)
assert main(["perplexity", "-m", q, "-f", corpus, "-c", "32"]) == 0
print("pipeline OK")
EOF

if [[ "${REAL_CHIP:-0}" == "1" ]]; then
  echo "== [extra] on-hardware kernel-vs-oracle conformance sweep =="
  unset JAX_PLATFORMS
  # every Pallas kernel family vs its jnp oracle, COMPILED on the TPU
  # (test-backend-ops device-side philosophy; would have caught the
  # round-2 attention-skip incident and round-3's remainder-block bug)
  timeout 1800 python tools/chip_conformance.py
  echo "== [extra] bench on real chip =="
  timeout 1800 python bench.py
fi

echo "CI PASSED"
