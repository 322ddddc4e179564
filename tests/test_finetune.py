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
