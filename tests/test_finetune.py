"""LoRA finetuning (training/optimizer subsystem): loss must fall on an
overfit task, and the exported adapter must load + change the model."""
import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.gguf import GGUFReader
from ggml_hexagon_tpu.models.convert_hf import convert_hf_llama
from ggml_hexagon_tpu.models.llama import load_llama_weights
from ggml_hexagon_tpu.models.lora import LoraAdapter
from ggml_hexagon_tpu.quant.formats import GGMLType
from ggml_hexagon_tpu.runtime.finetune import LoraTrainer

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False)
    torch.manual_seed(13)
    m = transformers.LlamaForCausalLM(cfg)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    p = str(tmp_path_factory.mktemp("ft") / "m.gguf")
    convert_hf_llama(sd, cfg, p, qtype=GGMLType.Q8_0)  # train THROUGH quantized base
    return p


def test_lora_finetune_overfits(model, tmp_path):
    with GGUFReader.open(model) as r:
        cfg, weights = load_llama_weights(r, dtype=jnp.float32)
    tr = LoraTrainer(cfg, weights, rank=4, lr=5e-2)
    batch = np.tile(np.array([[1, 7, 7, 7, 9, 9, 9, 2]], np.int32), (4, 1))
    losses = [tr.step(batch) for _ in range(80)]
    assert losses[-1] < losses[0] * 0.5, f"loss did not fall: {losses[0]} -> {losses[-1]}"
    # exported adapter loads and perturbs the model
    p = str(tmp_path / "trained.gguf")
    tr.export_adapter(p)
    ad = LoraAdapter.from_gguf(p)
    assert any("attn_q" in n for n in ad.names)
    from ggml_hexagon_tpu.models.lora import attach_lora
    from ggml_hexagon_tpu.models.llama import forward, init_kv_cache
    w2 = attach_lora(weights, ad)
    ids = jnp.asarray(batch[:1])
    a, _ = forward(cfg, weights, ids, init_kv_cache(cfg, 1, 8, jnp.float32), 0,
                   logits_all=True, compute_dtype=jnp.float32)
    b, _ = forward(cfg, w2, ids, init_kv_cache(cfg, 1, 8, jnp.float32), 0,
                   logits_all=True, compute_dtype=jnp.float32)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_full_weight_training_loss_falls_and_exports(tmp_path):
    """Full-weight AdamW (the complete ggml-opt analog): loss falls on a
    repeating corpus, and the trained masters export to a GGUF that the
    normal load/forward pipeline reads back."""
    import jax.numpy as jnp

    from ggml_hexagon_tpu.gguf import GGUFReader
    from ggml_hexagon_tpu.models.llama import (LlamaConfig, forward,
                                               init_kv_cache,
                                               load_llama_weights)
    from ggml_hexagon_tpu.quant import pack as P
    from ggml_hexagon_tpu.quant.formats import GGMLType
    from ggml_hexagon_tpu.runtime.finetune import FullTrainer

    rng = np.random.default_rng(0)
    d, nff, V = 256, 512, 97
    cfg = LlamaConfig(n_vocab=V, n_embd=d, n_layer=2, n_head=4,
                      n_head_kv=2, n_ff=nff)

    def qt(n, k):
        return P.quantize_tensor(
            rng.normal(size=(n, k)).astype(np.float32) * 0.05,
            GGMLType.Q8_0).astype_device()

    layers = []
    for _ in range(2):
        layers.append({
            "attn_norm": jnp.ones(d, jnp.float32),
            "ffn_norm": jnp.ones(d, jnp.float32),
            "wq": qt(d, d), "wk": qt(d // 2, d), "wv": qt(d // 2, d),
            "wo": qt(d, d),
            "ffn_gate": qt(nff, d), "ffn_up": qt(nff, d),
            "ffn_down": qt(d, nff),
        })
    weights = {
        "tok_embd": jnp.asarray(rng.normal(size=(V, d)) * 0.05, jnp.float32),
        "output_norm": jnp.ones(d, jnp.float32),
        "output": qt(V, d),
        "layers": layers,
    }
    tr = FullTrainer(cfg, weights, lr=3e-3)
    toks = np.tile(np.arange(0, 32, dtype=np.int32), 3)[None, :64]
    losses = [tr.step(toks) for _ in range(12)]
    assert losses[-1] < losses[0] * 0.7, losses

    out = str(tmp_path / "trained.gguf")
    tr.export_gguf(out, metadata={"tokenizer.ggml.model": "llama",
                                  "tokenizer.ggml.tokens": [f"t{i}" for i in range(V)],
                                  "tokenizer.ggml.scores": [0.0] * V,
                                  "tokenizer.ggml.token_type": [1] * V})
    with GGUFReader.open(out) as r:
        cfg2, w2 = load_llama_weights(r)
    kv = init_kv_cache(cfg2, 1, 8)
    logits, _ = forward(cfg2, w2, jnp.asarray(toks[:, :4]), kv, jnp.int32(0))
    assert np.isfinite(np.asarray(logits)).all()
