"""DeepSeek-V2 (MLA + MoE) differential tests vs HF transformers."""
import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.gguf import GGUFReader
from ggml_hexagon_tpu.models.deepseek2 import (
    convert_hf_deepseek2, forward, init_deepseek_kv, load_deepseek_weights)
from ggml_hexagon_tpu.quant.formats import GGMLType

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def run_ds(hf_model, tmp_path, name, rtol=2e-3, qtype=GGMLType.F32):
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    path = str(tmp_path / f"{name}.gguf")
    convert_hf_deepseek2(sd, hf_model.config, path, qtype=qtype)
    with GGUFReader.open(path) as r:
        cfg, weights = load_deepseek_weights(r, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, hf_model.config.vocab_size, size=(2, 7))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    kv = init_deepseek_kv(cfg, 2, 16, dtype=jnp.float32)
    logits, _ = forward(cfg, weights, jnp.asarray(ids, jnp.int32), kv, 0,
                        logits_all=True, compute_dtype=jnp.float32)
    ours = np.asarray(logits)
    err = np.abs(ours - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < rtol, f"{name}: max rel err {err}"
    return cfg


def _base_kwargs():
    return dict(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        kv_lora_rank=64, qk_rope_head_dim=16, qk_nope_head_dim=32,
        v_head_dim=32, max_position_embeddings=128,
        first_k_dense_replace=2, n_routed_experts=None,
        tie_word_embeddings=False)


def test_deepseek2_lite_dense(tmp_path):
    cfg = transformers.DeepseekV2Config(q_lora_rank=None, **_base_kwargs())
    torch.manual_seed(20)
    m = transformers.DeepseekV2ForCausalLM(cfg).eval()
    out = run_ds(m, tmp_path, "ds2_lite")
    assert out.q_lora_rank == 0 and out.qk_rope == 16


def test_deepseek2_qlora_dense(tmp_path):
    cfg = transformers.DeepseekV2Config(q_lora_rank=48, **_base_kwargs())
    torch.manual_seed(21)
    m = transformers.DeepseekV2ForCausalLM(cfg).eval()
    out = run_ds(m, tmp_path, "ds2_qlora")
    assert out.q_lora_rank == 48


def test_deepseek2_moe(tmp_path):
    kw = _base_kwargs()
    kw.update(first_k_dense_replace=1, n_routed_experts=4,
              num_experts_per_tok=2, moe_intermediate_size=64,
              n_shared_experts=1, routed_scaling_factor=1.0,
              norm_topk_prob=False, scoring_func="softmax",
              topk_method="greedy", n_group=1, topk_group=1)
    cfg = transformers.DeepseekV2Config(q_lora_rank=None, **kw)
    torch.manual_seed(22)
    m = transformers.DeepseekV2ForCausalLM(cfg).eval()
    out = run_ds(m, tmp_path, "ds2_moe")
    assert out.n_expert == 4 and out.n_shared == 1 and out.n_dense_lead == 1


def test_deepseek2_moe_quantized_decodes(tmp_path):
    kw = _base_kwargs()
    kw.update(hidden_size=256, intermediate_size=512,
              kv_lora_rank=128, first_k_dense_replace=1, n_routed_experts=4,
              num_experts_per_tok=2, moe_intermediate_size=256,
              n_shared_experts=1, topk_method="greedy", n_group=1,
              topk_group=1, scoring_func="softmax")
    cfg = transformers.DeepseekV2Config(q_lora_rank=None, **kw)
    torch.manual_seed(23)
    m = transformers.DeepseekV2ForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    path = str(tmp_path / "ds2_q.gguf")
    convert_hf_deepseek2(sd, cfg, path, qtype=GGMLType.Q4_K)
    with GGUFReader.open(path) as r:
        dcfg, w = load_deepseek_weights(r)
    kv = init_deepseek_kv(dcfg, 1, 16)
    # prefill then decode incrementally; incremental must match one-shot
    ids = np.array([[5, 9, 11, 3]], np.int32)
    full, _ = forward(dcfg, w, jnp.asarray(ids), init_deepseek_kv(dcfg, 1, 16),
                      0, logits_all=True)
    lg, kv = forward(dcfg, w, jnp.asarray(ids[:, :3]), kv, 0, logits_all=True)
    lg2, kv = forward(dcfg, w, jnp.asarray(ids[:, 3:]), kv, 3, logits_all=True)
    err = np.abs(np.asarray(lg2[0, 0]) - np.asarray(full[0, 3])).max()
    assert err < 2e-2, err
