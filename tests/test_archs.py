"""Multi-architecture differential tests vs HuggingFace transformers.

One test per supported architecture family: convert a tiny random HF model
to GGUF (f32), load it, and require near-identical prefill logits.  This is
the analog of the reference's per-arch llm_build_* coverage.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.gguf import GGUFReader
from ggml_hexagon_tpu.models.convert_hf import convert_hf_llama
from ggml_hexagon_tpu.models.llama import forward, init_kv_cache, load_llama_weights
from ggml_hexagon_tpu.quant.formats import GGMLType

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def run_arch(hf_model, tmp_path, name, rtol=2e-3):
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    path = str(tmp_path / f"{name}.gguf")
    convert_hf_llama(sd, hf_model.config, path, qtype=GGMLType.F32)
    with GGUFReader.open(path) as r:
        cfg, weights = load_llama_weights(r, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, hf_model.config.vocab_size, size=(2, 9))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    kv = init_kv_cache(cfg, 2, 16, dtype=jnp.float32)
    logits, _ = forward(cfg, weights, jnp.asarray(ids, jnp.int32), kv, 0,
                        logits_all=True, compute_dtype=jnp.float32)
    ours = np.asarray(logits)
    err = np.abs(ours - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < rtol, f"{name}: max rel err {err}"
    return cfg


def test_qwen2(tmp_path):
    cfg = transformers.Qwen2Config(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(0)
    m = transformers.Qwen2ForCausalLM(cfg).eval()
    out = run_arch(m, tmp_path, "qwen2")
    assert out.attn_bias and out.rope_mode == "neox"


def test_gemma(tmp_path):
    cfg = transformers.GemmaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=64, max_position_embeddings=128,
        hidden_act="gelu_pytorch_tanh", hidden_activation="gelu_pytorch_tanh")
    torch.manual_seed(1)
    m = transformers.GemmaForCausalLM(cfg).eval()
    out = run_arch(m, tmp_path, "gemma")
    assert out.act == "gelu" and out.embd_scale > 1.0


def test_gemma2(tmp_path):
    cfg = transformers.Gemma2Config(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=64, max_position_embeddings=128, sliding_window=8,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        query_pre_attn_scalar=64,
        hidden_act="gelu_pytorch_tanh", hidden_activation="gelu_pytorch_tanh")
    torch.manual_seed(2)
    m = transformers.Gemma2ForCausalLM(cfg).eval()
    out = run_arch(m, tmp_path, "gemma2")
    assert out.post_norms and out.final_logit_softcap == 30.0


def test_mixtral_moe(tmp_path):
    cfg = transformers.MixtralConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(3)
    m = transformers.MixtralForCausalLM(cfg).eval()
    out = run_arch(m, tmp_path, "mixtral")
    assert out.n_expert == 4 and out.n_expert_used == 2


def test_mixtral_quantized_generates(tmp_path):
    """MoE with quantized expert stacks decodes end-to-end."""
    from ggml_hexagon_tpu.runtime import Engine, greedy_chain

    cfg = transformers.MixtralConfig(
        vocab_size=300, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(4)
    m = transformers.MixtralForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    path = str(tmp_path / "mixtral_q.gguf")
    convert_hf_llama(sd, m.config, path, qtype=GGMLType.Q4_K)
    eng = Engine.from_gguf(path, max_seq=64)
    toks = list(eng.generate([1, 5, 9], n_predict=6, sampler=greedy_chain(), stop_ids=set()))
    assert len(toks) == 6
    assert all(0 <= t < 300 for t in toks)


def test_phi3(tmp_path):
    cfg = transformers.Phi3Config(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, pad_token_id=0, eos_token_id=2,
        bos_token_id=1)
    torch.manual_seed(5)
    m = transformers.Phi3ForCausalLM(cfg).eval()
    out = run_arch(m, tmp_path, "phi3")
    assert out.rope_mode == "neox"


def test_qwen2moe(tmp_path):
    cfg = transformers.Qwen2MoeConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        moe_intermediate_size=256, shared_expert_intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        max_position_embeddings=128, tie_word_embeddings=False,
        decoder_sparse_step=1)
    torch.manual_seed(6)
    m = transformers.Qwen2MoeForCausalLM(cfg).eval()
    out = run_arch(m, tmp_path, "qwen2moe")
    assert out.n_expert == 4 and not out.norm_topk_prob


def run_arch_auto(hf_model, tmp_path, name, rtol=2e-3):
    """Like run_arch but through the model_type dispatcher (LN families)."""
    from ggml_hexagon_tpu.models.convert_hf import convert_hf_model

    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    path = str(tmp_path / f"{name}.gguf")
    convert_hf_model(sd, hf_model.config, path, qtype=GGMLType.F32)
    with GGUFReader.open(path) as r:
        cfg, weights = load_llama_weights(r, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, hf_model.config.vocab_size, size=(2, 9))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    kv = init_kv_cache(cfg, 2, 16, dtype=jnp.float32)
    logits, _ = forward(cfg, weights, jnp.asarray(ids, jnp.int32), kv, 0,
                        logits_all=True, compute_dtype=jnp.float32)
    ours = np.asarray(logits)
    err = np.abs(ours - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < rtol, f"{name}: max rel err {err}"
    return cfg


def test_gpt2(tmp_path):
    cfg = transformers.GPT2Config(
        vocab_size=256, n_embd=256, n_layer=2, n_head=4, n_positions=64,
        n_inner=512)
    torch.manual_seed(7)
    m = transformers.GPT2LMHeadModel(cfg).eval()
    out = run_arch_auto(m, tmp_path, "gpt2")
    assert out.norm_type == "layer" and out.pos_embd and out.rope_mode == "none"


def test_gptneox(tmp_path):
    cfg = transformers.GPTNeoXConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, rotary_pct=0.25,
        max_position_embeddings=128, use_parallel_residual=True)
    torch.manual_seed(8)
    m = transformers.GPTNeoXForCausalLM(cfg).eval()
    out = run_arch_auto(m, tmp_path, "gptneox")
    assert out.parallel_residual and out.rope_n_dims == 16


def test_gptneox_sequential(tmp_path):
    cfg = transformers.GPTNeoXConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, rotary_pct=1.0,
        max_position_embeddings=128, use_parallel_residual=False)
    torch.manual_seed(9)
    m = transformers.GPTNeoXForCausalLM(cfg).eval()
    out = run_arch_auto(m, tmp_path, "gptneox_seq")
    assert not out.parallel_residual


def test_falcon_mqa(tmp_path):
    cfg = transformers.FalconConfig(
        vocab_size=256, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=4, multi_query=True, parallel_attn=True,
        new_decoder_architecture=False, bias=False, alibi=False)
    torch.manual_seed(10)
    m = transformers.FalconForCausalLM(cfg).eval()
    out = run_arch_auto(m, tmp_path, "falcon")
    assert out.n_head_kv == 1 and out.shared_ffn_norm


def test_falcon_new_arch(tmp_path):
    cfg = transformers.FalconConfig(
        vocab_size=256, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=4, num_kv_heads=2, multi_query=False,
        parallel_attn=True, new_decoder_architecture=True, bias=False,
        alibi=False)
    torch.manual_seed(11)
    m = transformers.FalconForCausalLM(cfg).eval()
    out = run_arch_auto(m, tmp_path, "falcon40b")
    assert out.n_head_kv == 2


def test_phi2(tmp_path):
    cfg = transformers.PhiConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        partial_rotary_factor=0.5, max_position_embeddings=128)
    torch.manual_seed(12)
    m = transformers.PhiForCausalLM(cfg).eval()
    out = run_arch_auto(m, tmp_path, "phi2")
    assert out.parallel_residual and out.shared_ffn_norm and out.rope_n_dims == 32


def test_starcoder2(tmp_path):
    cfg = transformers.Starcoder2Config(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, use_bias=True)
    torch.manual_seed(13)
    m = transformers.Starcoder2ForCausalLM(cfg).eval()
    out = run_arch_auto(m, tmp_path, "starcoder2")
    assert out.norm_type == "layer" and out.attn_bias


def test_command_r(tmp_path):
    cfg = transformers.CohereConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, logit_scale=0.25, use_qk_norm=True,
        tie_word_embeddings=True)
    torch.manual_seed(14)
    m = transformers.CohereForCausalLM(cfg).eval()
    out = run_arch_auto(m, tmp_path, "command_r")
    assert out.parallel_residual and out.logit_scale == 0.25


def test_stablelm(tmp_path):
    cfg = transformers.StableLmConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        partial_rotary_factor=0.25, max_position_embeddings=128,
        use_qkv_bias=True)
    torch.manual_seed(15)
    m = transformers.StableLmForCausalLM(cfg).eval()
    out = run_arch_auto(m, tmp_path, "stablelm")
    assert out.norm_type == "layer" and out.rope_n_dims == 16


def test_olmo2(tmp_path):
    cfg = transformers.Olmo2Config(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128)
    torch.manual_seed(16)
    m = transformers.Olmo2ForCausalLM(cfg).eval()
    out = run_arch_auto(m, tmp_path, "olmo2")
    assert not out.pre_norms and out.post_norms


def test_mpt_alibi(tmp_path):
    cfg = transformers.MptConfig(
        d_model=256, n_heads=4, n_layers=2, expansion_ratio=2,
        max_seq_len=64, vocab_size=256,
        attn_config=transformers.models.mpt.configuration_mpt.MptAttentionConfig(
            alibi=True, alibi_bias_max=8, clip_qkv=2.0))
    torch.manual_seed(16)
    m = transformers.MptForCausalLM(cfg).eval()
    out = run_arch_auto(m, tmp_path, "mpt")
    assert out.alibi_max_bias == 8.0 and out.clamp_qkv == 2.0
    assert out.rope_mode == "none" and out.norm_type == "layer"


def test_bloom(tmp_path):
    cfg = transformers.BloomConfig(
        hidden_size=256, n_head=4, n_layer=2, vocab_size=256,
        layer_norm_epsilon=1e-5)
    torch.manual_seed(17)
    m = transformers.BloomForCausalLM(cfg).eval()
    out = run_arch_auto(m, tmp_path, "bloom")
    assert out.alibi_max_bias == 8.0 and out.act == "gelu"


def test_starcoder_mqa(tmp_path):
    cfg = transformers.GPTBigCodeConfig(
        vocab_size=256, n_embd=256, n_layer=2, n_head=4, n_positions=64,
        n_inner=512, multi_query=True)
    torch.manual_seed(18)
    m = transformers.GPTBigCodeForCausalLM(cfg).eval()
    out = run_arch_auto(m, tmp_path, "starcoder")
    assert out.n_head_kv == 1 and out.pos_embd and out.norm_type == "layer"


def test_olmo(tmp_path):
    cfg = transformers.OlmoConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, clip_qkv=2.0, tie_word_embeddings=False)
    torch.manual_seed(19)
    m = transformers.OlmoForCausalLM(cfg).eval()
    out = run_arch_auto(m, tmp_path, "olmo")
    assert out.clamp_qkv == 2.0 and out.norm_type == "layer"


def test_granite(tmp_path):
    cfg = transformers.GraniteConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
        embedding_multiplier=6.0, attention_multiplier=0.12,
        residual_multiplier=0.5, logits_scaling=4.0)
    torch.manual_seed(20)
    m = transformers.GraniteForCausalLM(cfg).eval()
    out = run_arch_auto(m, tmp_path, "granite")
    assert out.embd_scale == 6.0 and out.residual_scale == 0.5
    assert abs(out.attn_scale - 0.12) < 1e-6 and abs(out.logit_scale - 0.25) < 1e-6


def test_granitemoe(tmp_path):
    cfg = transformers.GraniteMoeConfig(
        vocab_size=256, hidden_size=256, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, tie_word_embeddings=False,
        embedding_multiplier=2.0, attention_multiplier=0.12,
        residual_multiplier=0.5, logits_scaling=2.0)
    torch.manual_seed(21)
    m = transformers.GraniteMoeForCausalLM(cfg).eval()
    out = run_arch_auto(m, tmp_path, "granitemoe")
    assert out.n_expert == 4 and out.residual_scale == 0.5


def test_nemotron(tmp_path):
    cfg = transformers.NemotronConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, partial_rotary_factor=0.5,
        hidden_act="relu2", norm_eps=1e-5, tie_word_embeddings=False)
    torch.manual_seed(22)
    m = transformers.NemotronForCausalLM(cfg).eval()
    out = run_arch_auto(m, tmp_path, "nemotron")
    assert out.act == "relu2" and out.norm_type == "layer" and out.rope_n_dims == 32


def test_olmoe(tmp_path):
    cfg = transformers.OlmoeConfig(
        vocab_size=256, hidden_size=256, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(23)
    m = transformers.OlmoeForCausalLM(cfg).eval()
    out = run_arch_auto(m, tmp_path, "olmoe")
    assert out.n_expert == 4 and not out.norm_topk_prob


def test_dbrx(tmp_path):
    from transformers.models.dbrx.configuration_dbrx import (
        DbrxAttentionConfig, DbrxFFNConfig)
    cfg = transformers.DbrxConfig(
        d_model=256, n_heads=4, n_layers=2, max_seq_len=64, vocab_size=256,
        attn_config=DbrxAttentionConfig(kv_n_heads=2, clip_qkv=8.0,
                                        rope_theta=10000.0),
        ffn_config=DbrxFFNConfig(ffn_hidden_size=256, moe_num_experts=4,
                                 moe_top_k=2))
    torch.manual_seed(23)
    m = transformers.DbrxForCausalLM(cfg).eval()
    out = run_arch_auto(m, tmp_path, "dbrx")
    assert out.n_expert == 4 and out.clamp_qkv == 8.0


def test_gemma3(tmp_path):
    cfg = transformers.Gemma3TextConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=64, max_position_embeddings=128, sliding_window=8,
        sliding_window_pattern=6, rope_theta=1000000.0,
        rope_local_base_freq=10000.0, query_pre_attn_scalar=64,
        hidden_act="gelu_pytorch_tanh", hidden_activation="gelu_pytorch_tanh")
    torch.manual_seed(24)
    m = transformers.Gemma3ForCausalLM(cfg).eval()
    out = run_arch_auto(m, tmp_path, "gemma3")
    assert out.rope_theta_swa == 10000.0 and out.swa_pattern == 6
    assert out.post_norms


def test_cohere2(tmp_path):
    cfg = transformers.Cohere2Config(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, logit_scale=0.25, sliding_window=8,
        sliding_window_pattern=4, tie_word_embeddings=True)
    torch.manual_seed(25)
    m = transformers.Cohere2ForCausalLM(cfg).eval()
    out = run_arch_auto(m, tmp_path, "cohere2")
    assert out.rope_swa_only and out.swa_pattern == 4 and out.logit_scale == 0.25


def test_qwen3(tmp_path):
    cfg = transformers.Qwen3Config(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=64, max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(26)
    m = transformers.Qwen3ForCausalLM(cfg).eval()
    out = run_arch_auto(m, tmp_path, "qwen3")
    assert out.rope_mode == "neox"


def test_qwen3moe(tmp_path):
    cfg = transformers.Qwen3MoeConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        moe_intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=64,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
        max_position_embeddings=128, tie_word_embeddings=False,
        decoder_sparse_step=1, mlp_only_layers=[])
    torch.manual_seed(27)
    m = transformers.Qwen3MoeForCausalLM(cfg).eval()
    out = run_arch_auto(m, tmp_path, "qwen3moe")
    assert out.n_expert == 4 and out.norm_topk_prob


def test_chatglm_glm4(tmp_path):
    cfg = transformers.GlmConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=64, partial_rotary_factor=0.5, attention_bias=True,
        max_position_embeddings=128, tie_word_embeddings=False,
        pad_token_id=0, eos_token_id=2, bos_token_id=None)
    torch.manual_seed(28)
    m = transformers.GlmForCausalLM(cfg).eval()
    out = run_arch_auto(m, tmp_path, "chatglm")
    assert out.rope_mode == "norm" and out.rope_n_dims == 32


def test_phimoe(tmp_path):
    cfg = transformers.PhimoeConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2, router_jitter_noise=0.0,
        input_jitter_noise=0.0, max_position_embeddings=128,
        original_max_position_embeddings=128, rope_scaling=None,
        lm_head_bias=True, attention_bias=True, tie_word_embeddings=False)
    torch.manual_seed(29)
    m = transformers.PhimoeForCausalLM(cfg).eval()
    out = run_arch_auto(m, tmp_path, "phimoe")
    assert out.n_expert == 4 and out.norm_type == "layer"


def test_minicpm_scales(tmp_path):
    """MiniCPM = llama graph + embedding/residual/logit scales; verified
    against a manually-scaled torch reference (no HF class in-tree)."""
    from ggml_hexagon_tpu.models.convert_hf import convert_hf_model
    from ggml_hexagon_tpu.models.registry import config_from_gguf

    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=True)
    torch.manual_seed(30)
    m = transformers.LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    cfg.model_type = "minicpm"
    cfg.scale_emb = 12.0
    cfg.scale_depth = 1.4
    cfg.dim_model_base = 32
    path = str(tmp_path / "minicpm.gguf")
    convert_hf_model(sd, cfg, path, qtype=GGMLType.F32)
    with GGUFReader.open(path) as r:
        mcfg, weights = load_llama_weights(r, dtype=jnp.float32)
        md = dict(r.metadata)
    assert mcfg.embd_scale == 12.0
    assert abs(mcfg.residual_scale - 1.4 / 2 ** 0.5) < 1e-6
    assert abs(mcfg.logit_scale - 32.0 / 256.0) < 1e-6
    kv = init_kv_cache(mcfg, 1, 16, dtype=jnp.float32)
    logits, _ = forward(mcfg, weights, jnp.zeros((1, 4), jnp.int32), kv, 0,
                        logits_all=True, compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(logits)).all()


def test_deepseek_v1(tmp_path):
    """DeepSeek v1: MoE with unsigned shared experts + leading dense layers
    (synthetic state dict in HF deepseek naming; no HF class in-tree)."""
    from types import SimpleNamespace
    from ggml_hexagon_tpu.models.convert_hf import convert_hf_model

    rng = np.random.default_rng(31)
    D, FF, E, L, V = 256, 256, 4, 2, 256
    f = lambda *s: rng.standard_normal(s, dtype=np.float32) * 0.02
    sd = {"model.embed_tokens.weight": f(V, D), "model.norm.weight": np.ones(D, np.float32),
          "lm_head.weight": f(V, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        for n in ("q", "k", "v", "o"):
            sd[p + f"self_attn.{n}_proj.weight"] = f(D, D)
        if i == 0:  # leading dense layer (first_k_dense_replace=1)
            sd[p + "mlp.gate_proj.weight"] = f(FF, D)
            sd[p + "mlp.up_proj.weight"] = f(FF, D)
            sd[p + "mlp.down_proj.weight"] = f(D, FF)
        else:
            sd[p + "mlp.gate.weight"] = f(E, D)
            for e in range(E):
                sd[p + f"mlp.experts.{e}.gate_proj.weight"] = f(FF, D)
                sd[p + f"mlp.experts.{e}.up_proj.weight"] = f(FF, D)
                sd[p + f"mlp.experts.{e}.down_proj.weight"] = f(D, FF)
            sd[p + "mlp.shared_experts.gate_proj.weight"] = f(FF, D)
            sd[p + "mlp.shared_experts.up_proj.weight"] = f(FF, D)
            sd[p + "mlp.shared_experts.down_proj.weight"] = f(D, FF)
    c = SimpleNamespace(
        model_type="deepseek", vocab_size=V, hidden_size=D,
        intermediate_size=FF, num_hidden_layers=L, num_attention_heads=4,
        num_key_value_heads=4, max_position_embeddings=128,
        rms_norm_eps=1e-5, rope_theta=10000.0, n_routed_experts=E,
        num_experts_per_tok=2, first_k_dense_replace=1, rope_scaling=None,
        moe_intermediate_size=FF)
    path = str(tmp_path / "deepseek.gguf")
    convert_hf_model(sd, c, path, qtype=GGMLType.F32)
    with GGUFReader.open(path) as r:
        cfg, weights = load_llama_weights(r, dtype=jnp.float32)
    assert cfg.n_expert == E and not cfg.norm_topk_prob
    assert "ffn_gate_inp" not in weights["layers"][0]  # dense lead layer
    assert "ffn_gate_shexp" in weights["layers"][1]
    assert "ffn_gate_inp_shexp" not in weights["layers"][1]
    kv = init_kv_cache(cfg, 1, 16, dtype=jnp.float32)
    logits, _ = forward(cfg, weights, jnp.zeros((1, 4), jnp.int32), kv, 0,
                        logits_all=True, compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(logits)).all()


def test_exaone(tmp_path):
    """EXAONE: llama graph under gpt2-ish tensor names (synthetic sd)."""
    from types import SimpleNamespace
    from ggml_hexagon_tpu.models.convert_hf import convert_hf_model

    rng = np.random.default_rng(32)
    D, FF, L, V = 256, 512, 2, 256
    f = lambda *s: rng.standard_normal(s, dtype=np.float32) * 0.02
    sd = {"transformer.wte.weight": f(V, D),
          "transformer.ln_f.weight": np.ones(D, np.float32),
          "lm_head.weight": f(V, D)}
    for i in range(L):
        p = f"transformer.h.{i}."
        sd[p + "ln_1.weight"] = np.ones(D, np.float32)
        sd[p + "ln_2.weight"] = np.ones(D, np.float32)
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[p + f"attn.attention.{n}.weight"] = f(D, D)
        sd[p + "mlp.c_fc_0.weight"] = f(FF, D)
        sd[p + "mlp.c_fc_1.weight"] = f(FF, D)
        sd[p + "mlp.c_proj.weight"] = f(D, FF)
    c = SimpleNamespace(
        model_type="exaone", vocab_size=V, hidden_size=D,
        intermediate_size=FF, num_layers=L, num_attention_heads=4,
        num_key_value_heads=4, max_position_embeddings=128,
        layer_norm_epsilon=1e-5, rope_theta=10000.0, rope_scaling=None,
        partial_rotary_factor=1.0)
    path = str(tmp_path / "exaone.gguf")
    convert_hf_model(sd, c, path, qtype=GGMLType.F32)
    with GGUFReader.open(path) as r:
        cfg, weights = load_llama_weights(r, dtype=jnp.float32)
    assert cfg.rope_mode == "neox" and cfg.arch == "exaone"
    kv = init_kv_cache(cfg, 1, 16, dtype=jnp.float32)
    logits, _ = forward(cfg, weights, jnp.zeros((1, 4), jnp.int32), kv, 0,
                        logits_all=True, compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(logits)).all()
