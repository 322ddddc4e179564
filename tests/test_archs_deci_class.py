"""Architectures added in the third breadth pass: grok, plamo, codeshell,
refact, chameleon, arctic, deci, openelm, bailingmoe.

GGUFs are built directly with our writer using ggml tensor names (the
graph-shape contract of the reference llm_build_* builders,
src/llama-model.cpp); chameleon additionally gets an HF logit-differential
test.  deci/openelm exercise per-layer head-count arrays, attention-free
and linear-attention layers."""
import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.gguf import GGUFReader, GGUFWriter
from ggml_hexagon_tpu.models.llama import forward, init_kv_cache, load_llama_weights

D, FF, L, V, H = 64, 128, 2, 96, 4
HD = D // H


def rnd(rng, *s):
    return rng.standard_normal(s, dtype=np.float32) * 0.05


def base_md(w, arch, n_layer=L, n_head=H, n_head_kv=None, n_ff=FF):
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.embedding_length", D)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.attention.head_count", n_head)
    if n_head_kv is not None:
        w.add(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add(f"{arch}.vocab_size", V)
    w.add(f"{arch}.context_length", 128)


def add_layer(w, i, gated=True, norm_bias=False, fused_qkv=False, moe=None,
              nh=H, nhkv=H, n_ff=FF, qk_norm=None):
    p = f"blk.{i}."
    rng = np.random.default_rng(100 + i)
    w.add_tensor(p + "attn_norm.weight", np.ones(D, np.float32))
    if norm_bias:
        w.add_tensor(p + "attn_norm.bias", np.zeros(D, np.float32))
    if fused_qkv:
        w.add_tensor(p + "attn_qkv.weight", rnd(rng, (nh + 2 * nhkv) * HD, D))
        w.add_tensor(p + "attn_qkv.bias", rnd(rng, (nh + 2 * nhkv) * HD))
    else:
        w.add_tensor(p + "attn_q.weight", rnd(rng, nh * HD, D))
        w.add_tensor(p + "attn_k.weight", rnd(rng, nhkv * HD, D))
        w.add_tensor(p + "attn_v.weight", rnd(rng, nhkv * HD, D))
    w.add_tensor(p + "attn_output.weight", rnd(rng, D, nh * HD))
    if qk_norm == "per_head":
        w.add_tensor(p + "attn_q_norm.weight", np.ones(HD, np.float32))
        w.add_tensor(p + "attn_k_norm.weight", np.ones(HD, np.float32))
    elif qk_norm == "chameleon":  # [hd, n_head] distinct per-head LayerNorms
        w.add_tensor(p + "attn_q_norm.weight", np.ones((nh, HD), np.float32))
        w.add_tensor(p + "attn_k_norm.weight", np.ones((nhkv, HD), np.float32))
        w.add_tensor(p + "attn_q_norm.bias", np.zeros((nh, HD), np.float32))
        w.add_tensor(p + "attn_k_norm.bias", np.zeros((nhkv, HD), np.float32))
    w.add_tensor(p + "ffn_norm.weight", np.ones(D, np.float32))
    if norm_bias:
        w.add_tensor(p + "ffn_norm.bias", np.zeros(D, np.float32))
    if moe:
        E, n_ff_e = moe
        w.add_tensor(p + "ffn_gate_inp.weight", rnd(rng, E, D))
        w.add_tensor(p + "ffn_gate_exps.weight", rnd(rng, E * n_ff_e, D).reshape(E, n_ff_e, D))
        w.add_tensor(p + "ffn_up_exps.weight", rnd(rng, E * n_ff_e, D).reshape(E, n_ff_e, D))
        w.add_tensor(p + "ffn_down_exps.weight", rnd(rng, E * D, n_ff_e).reshape(E, D, n_ff_e))
    else:
        if gated:
            w.add_tensor(p + "ffn_gate.weight", rnd(rng, n_ff, D))
        w.add_tensor(p + "ffn_up.weight", rnd(rng, n_ff, D))
        w.add_tensor(p + "ffn_down.weight", rnd(rng, D, n_ff))


def finish(w, tmp_path, name, output=True):
    rng = np.random.default_rng(7)
    w.add_tensor("token_embd.weight", rnd(rng, V, D))
    w.add_tensor("output_norm.weight", np.ones(D, np.float32))
    if output:
        w.add_tensor("output.weight", rnd(rng, V, D))
    path = str(tmp_path / f"{name}.gguf")
    w.write_file(path)
    return path


def run(path):
    with GGUFReader.open(path) as r:
        cfg, weights = load_llama_weights(r, dtype=jnp.float32)
    kv = init_kv_cache(cfg, 1, 16, dtype=jnp.float32)
    logits, _ = forward(cfg, weights, jnp.arange(4, dtype=jnp.int32)[None] % V,
                        kv, 0, logits_all=True, compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(logits)).all()
    assert logits.shape == (1, 4, V)
    return cfg, np.asarray(logits)


def test_grok(tmp_path):
    w = GGUFWriter()
    base_md(w, "grok")
    w.add("grok.expert_count", 4)
    w.add("grok.expert_used_count", 2)
    for i in range(L):
        add_layer(w, i, moe=(4, FF))
        # grok pre-residual output norms (llama-arch.cpp:316-317)
        w.add_tensor(f"blk.{i}.attn_output_norm.weight", np.ones(D, np.float32))
        w.add_tensor(f"blk.{i}.layer_output_norm.weight", np.ones(D, np.float32))
    cfg, _ = run(finish(w, tmp_path, "grok"))
    assert cfg.rope_mode == "neox" and cfg.attn_scale == 1.0
    assert cfg.embd_scale == pytest.approx(78.38367176906169)
    assert cfg.logit_scale == pytest.approx(0.5773502691896257)
    assert cfg.act == "gelu" and cfg.post_norms


def test_plamo(tmp_path):
    w = GGUFWriter()
    base_md(w, "plamo")
    for i in range(L):
        p = f"blk.{i}."
        rng = np.random.default_rng(200 + i)
        w.add_tensor(p + "attn_norm.weight", np.ones(D, np.float32))
        for n, shape in (("attn_q", (D, D)), ("attn_k", (D, D)),
                         ("attn_v", (D, D)), ("attn_output", (D, D))):
            w.add_tensor(p + n + ".weight", rnd(rng, *shape))
        w.add_tensor(p + "ffn_gate.weight", rnd(rng, FF, D))
        w.add_tensor(p + "ffn_up.weight", rnd(rng, FF, D))
        w.add_tensor(p + "ffn_down.weight", rnd(rng, D, FF))
    cfg, _ = run(finish(w, tmp_path, "plamo"))
    assert cfg.parallel_residual and cfg.shared_ffn_norm
    assert cfg.rope_mode == "norm" and cfg.norm_type == "rms"


def test_codeshell(tmp_path):
    w = GGUFWriter()
    base_md(w, "codeshell", n_head_kv=1)
    w.add("codeshell.attention.layer_norm_epsilon", 1e-5)
    w.add("codeshell.rope.dimension_count", HD)
    for i in range(L):
        add_layer(w, i, gated=False, norm_bias=True, fused_qkv=True, nhkv=1)
        w.add_tensor(f"blk.{i}.attn_output.bias", np.zeros(D, np.float32))
        w.add_tensor(f"blk.{i}.ffn_up.bias", np.zeros(FF, np.float32))
        w.add_tensor(f"blk.{i}.ffn_down.bias", np.zeros(D, np.float32))
    cfg, _ = run(finish(w, tmp_path, "codeshell", output=False))
    assert cfg.norm_type == "layer" and cfg.rope_mode == "neox"
    assert cfg.act == "gelu" and cfg.n_head_kv == 1


def test_refact(tmp_path):
    w = GGUFWriter()
    base_md(w, "refact", n_head_kv=1)
    for i in range(L):
        add_layer(w, i, nhkv=1)
    cfg, _ = run(finish(w, tmp_path, "refact"))
    assert cfg.rope_mode == "none" and cfg.alibi_max_bias == 8.0
    assert cfg.norm_type == "rms" and cfg.act == "silu"


def test_arctic(tmp_path):
    w = GGUFWriter()
    base_md(w, "arctic")
    w.add("arctic.expert_count", 4)
    w.add("arctic.expert_used_count", 2)
    for i in range(L):
        add_layer(w, i)  # dense residual MLP
        rng = np.random.default_rng(300 + i)
        p = f"blk.{i}."
        w.add_tensor(p + "ffn_norm_exps.weight", np.ones(D, np.float32))
        w.add_tensor(p + "ffn_gate_inp.weight", rnd(rng, 4, D))
        w.add_tensor(p + "ffn_gate_exps.weight", rnd(rng, 4 * FF, D).reshape(4, FF, D))
        w.add_tensor(p + "ffn_up_exps.weight", rnd(rng, 4 * FF, D).reshape(4, FF, D))
        w.add_tensor(p + "ffn_down_exps.weight", rnd(rng, 4 * D, FF).reshape(4, D, FF))
    cfg, logits = run(finish(w, tmp_path, "arctic"))
    assert cfg.n_expert == 4 and cfg.norm_topk_prob

    # the MoE branch must contribute: zeroing it (impossible via config)
    # is checked structurally instead — both dense and expert tensors loaded
    with GGUFReader.open(str(tmp_path / "arctic.gguf")) as r:
        _, weights = load_llama_weights(r, dtype=jnp.float32)
    lw = weights["layers"][0]
    assert "ffn_gate" in lw and "ffn_gate_exps" in lw and "ffn_norm_exps" in lw


def test_bailingmoe(tmp_path):
    w = GGUFWriter()
    base_md(w, "bailingmoe")
    w.add("bailingmoe.expert_count", 4)
    w.add("bailingmoe.expert_used_count", 2)
    w.add("bailingmoe.rope.dimension_count", HD)
    w.add("bailingmoe.expert_weights_norm", True)
    for i in range(L):
        add_layer(w, i, moe=(4, FF))
        rng = np.random.default_rng(400 + i)
        p = f"blk.{i}."
        w.add_tensor(p + "ffn_gate_shexp.weight", rnd(rng, FF, D))
        w.add_tensor(p + "ffn_up_shexp.weight", rnd(rng, FF, D))
        w.add_tensor(p + "ffn_down_shexp.weight", rnd(rng, D, FF))
    cfg, _ = run(finish(w, tmp_path, "bailingmoe"))
    assert cfg.hd == HD and cfg.norm_topk_prob and cfg.rope_mode == "norm"


def test_deci_per_layer_heads(tmp_path):
    """Layer 0 normal GQA, layer 1 attention-free, layer 2 linear-attention
    (the three layer classes of Llama-3_1-Nemotron-51B)."""
    w = GGUFWriter()
    w.add("general.architecture", "deci")
    w.add("deci.block_count", 3)
    w.add("deci.embedding_length", D)
    w.add("deci.feed_forward_length", FF)
    w.add("deci.attention.head_count", [H, 0, H])
    w.add("deci.attention.head_count_kv", [2, 0, 0])
    w.add("deci.vocab_size", V)
    w.add("deci.context_length", 128)
    add_layer(w, 0, nhkv=2)
    # layer 1: attention-free — FFN only
    rng = np.random.default_rng(501)
    w.add_tensor("blk.1.ffn_norm.weight", np.ones(D, np.float32))
    w.add_tensor("blk.1.ffn_gate.weight", rnd(rng, FF, D))
    w.add_tensor("blk.1.ffn_up.weight", rnd(rng, FF, D))
    w.add_tensor("blk.1.ffn_down.weight", rnd(rng, D, FF))
    # layer 2: linear attention — attn_norm + wo only
    rng = np.random.default_rng(502)
    w.add_tensor("blk.2.attn_norm.weight", np.ones(D, np.float32))
    w.add_tensor("blk.2.attn_output.weight", rnd(rng, D, D))
    w.add_tensor("blk.2.ffn_norm.weight", np.ones(D, np.float32))
    w.add_tensor("blk.2.ffn_gate.weight", rnd(rng, FF, D))
    w.add_tensor("blk.2.ffn_up.weight", rnd(rng, FF, D))
    w.add_tensor("blk.2.ffn_down.weight", rnd(rng, D, FF))
    cfg, _ = run(finish(w, tmp_path, "deci"))
    assert cfg.n_head_arr == (H, 0, H) and cfg.n_head_kv_arr == (2, 0, 0)
    assert cfg.n_head_kv_max == 2


def test_openelm_per_layer_heads(tmp_path):
    """Per-layer head counts + fused QKV + per-head QK RMS norms."""
    heads = [2, 4]
    kv_heads = [1, 2]
    w = GGUFWriter()
    w.add("general.architecture", "openelm")
    w.add("openelm.block_count", 2)
    w.add("openelm.embedding_length", D)
    w.add("openelm.feed_forward_length", [FF, 2 * FF])
    w.add("openelm.attention.head_count", heads)
    w.add("openelm.attention.head_count_kv", kv_heads)
    w.add("openelm.attention.key_length", HD)
    w.add("openelm.vocab_size", V)
    w.add("openelm.context_length", 128)
    for i in range(2):
        nh, nhkv, n_ff = heads[i], kv_heads[i], FF * (i + 1)
        p = f"blk.{i}."
        rng = np.random.default_rng(600 + i)
        w.add_tensor(p + "attn_norm.weight", np.ones(D, np.float32))
        w.add_tensor(p + "attn_qkv.weight", rnd(rng, (nh + 2 * nhkv) * HD, D))
        w.add_tensor(p + "attn_output.weight", rnd(rng, D, nh * HD))
        w.add_tensor(p + "attn_q_norm.weight", np.ones(HD, np.float32))
        w.add_tensor(p + "attn_k_norm.weight", np.ones(HD, np.float32))
        w.add_tensor(p + "ffn_norm.weight", np.ones(D, np.float32))
        w.add_tensor(p + "ffn_gate.weight", rnd(rng, n_ff, D))
        w.add_tensor(p + "ffn_up.weight", rnd(rng, n_ff, D))
        w.add_tensor(p + "ffn_down.weight", rnd(rng, D, n_ff))
    cfg, _ = run(finish(w, tmp_path, "openelm", output=False))
    assert cfg.n_head_arr == (2, 4) and cfg.n_head_kv_arr == (1, 2)
    assert cfg.rope_mode == "neox" and cfg.hd == HD


def test_chameleon_smoke(tmp_path):
    w = GGUFWriter()
    base_md(w, "chameleon")
    w.add("chameleon.swin_norm", False)
    for i in range(L):
        add_layer(w, i, qk_norm="chameleon")
    cfg, _ = run(finish(w, tmp_path, "chameleon"))
    assert cfg.norm_qk_type == "layer" and not cfg.swin_norm and cfg.pre_norms


def test_chameleon_swin_norm(tmp_path):
    w = GGUFWriter()
    base_md(w, "chameleon")
    w.add("chameleon.swin_norm", True)
    for i in range(L):
        add_layer(w, i, qk_norm="chameleon")
    cfg, _ = run(finish(w, tmp_path, "chameleon_swin"))
    assert cfg.swin_norm and not cfg.pre_norms


def test_chameleon_vs_hf(tmp_path):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.ChameleonConfig(
        vocab_size=V, hidden_size=D, intermediate_size=FF,
        num_hidden_layers=2, num_attention_heads=H, num_key_value_heads=H,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        swin_norm=False, vocabulary_map={})
    torch.manual_seed(11)
    m = transformers.ChameleonForConditionalGeneration(hf_cfg).eval()
    with torch.no_grad():  # randomize qk-norm affines so permutation is tested
        for layer in m.model.layers:
            for mod in (layer.self_attn.q_norm, layer.self_attn.k_norm):
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.uniform_(-0.1, 0.1)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}

    from ggml_hexagon_tpu.models.convert_hf import permute_qk

    w = GGUFWriter()
    base_md(w, "chameleon")
    w.add("chameleon.swin_norm", False)
    w.add("chameleon.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_tensor("token_embd.weight", sd["model.embed_tokens.weight"])
    w.add_tensor("output_norm.weight", sd["model.norm.weight"])
    w.add_tensor("output.weight", sd["lm_head.weight"])
    for i in range(2):
        hp, p = f"model.layers.{i}.", f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", sd[hp + "input_layernorm.weight"])
        w.add_tensor(p + "attn_q.weight", permute_qk(sd[hp + "self_attn.q_proj.weight"], H))
        w.add_tensor(p + "attn_k.weight", permute_qk(sd[hp + "self_attn.k_proj.weight"], H))
        w.add_tensor(p + "attn_v.weight", sd[hp + "self_attn.v_proj.weight"])
        w.add_tensor(p + "attn_output.weight", sd[hp + "self_attn.o_proj.weight"])
        # HF q_norm is a per-head LayerNorm with a shared [hd] affine; ggml
        # stores it permuted into NORM-rope component order and broadcast to
        # [n_head, hd] (ChameleonModel._reverse_hf_permute in the reference
        # convert_hf_to_gguf.py:5264-5267)
        def norm_ggml(vec, heads):
            full = np.broadcast_to(vec, (heads, HD)).reshape(heads * HD, 1)
            return permute_qk(full, heads).reshape(heads, HD)

        w.add_tensor(p + "attn_q_norm.weight",
                     norm_ggml(sd[hp + "self_attn.q_norm.weight"], H))
        w.add_tensor(p + "attn_k_norm.weight",
                     norm_ggml(sd[hp + "self_attn.k_norm.weight"], H))
        w.add_tensor(p + "attn_q_norm.bias",
                     norm_ggml(sd[hp + "self_attn.q_norm.bias"], H))
        w.add_tensor(p + "attn_k_norm.bias",
                     norm_ggml(sd[hp + "self_attn.k_norm.bias"], H))
        w.add_tensor(p + "ffn_norm.weight", sd[hp + "post_attention_layernorm.weight"])
        w.add_tensor(p + "ffn_gate.weight", sd[hp + "mlp.gate_proj.weight"])
        w.add_tensor(p + "ffn_up.weight", sd[hp + "mlp.up_proj.weight"])
        w.add_tensor(p + "ffn_down.weight", sd[hp + "mlp.down_proj.weight"])
    path = str(tmp_path / "chameleon_hf.gguf")
    w.write_file(path)

    ids = np.arange(8).reshape(1, 8) % V
    with torch.no_grad():
        ref = m(torch.tensor(ids)).logits.numpy()
    with GGUFReader.open(path) as r:
        cfg, weights = load_llama_weights(r, dtype=jnp.float32)
    kv = init_kv_cache(cfg, 1, 16, dtype=jnp.float32)
    ours, _ = forward(cfg, weights, jnp.asarray(ids, jnp.int32), kv, 0,
                      logits_all=True, compute_dtype=jnp.float32)
    err = np.abs(np.asarray(ours) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-3, err


def test_chameleon_converter_vs_hf(tmp_path):
    """The actual convert_hf chameleon path (incl. _rope_half_perm on the
    per-head QK LayerNorm affines) vs the HF graph, with NON-constant norm
    weights so a wrong channel permutation cannot pass (advisor r4)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.ChameleonConfig(
        vocab_size=V, hidden_size=D, intermediate_size=FF,
        num_hidden_layers=2, num_attention_heads=H, num_key_value_heads=H,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        swin_norm=False, vocabulary_map={})
    torch.manual_seed(23)
    m = transformers.ChameleonForConditionalGeneration(hf_cfg).eval()
    with torch.no_grad():  # randomize qk-norm affines: permutation-sensitive
        for layer in m.model.layers:
            for mod in (layer.self_attn.q_norm, layer.self_attn.k_norm):
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.uniform_(-0.1, 0.1)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}

    from types import SimpleNamespace

    from ggml_hexagon_tpu.models.convert_hf import convert_hf_model
    from ggml_hexagon_tpu.quant.formats import GGMLType

    c = SimpleNamespace(model_type="chameleon", num_hidden_layers=2,
                        hidden_size=D, intermediate_size=FF,
                        num_attention_heads=H, num_key_value_heads=H,
                        vocab_size=V, rms_norm_eps=1e-5, rope_theta=1e4,
                        max_position_embeddings=128, swin_norm=False)
    path = str(tmp_path / "chameleon_conv.gguf")
    convert_hf_model(sd, c, path, qtype=GGMLType.F32)

    ids = np.arange(8).reshape(1, 8) % V
    with torch.no_grad():
        ref = m(torch.tensor(ids)).logits.numpy()
    with GGUFReader.open(path) as r:
        cfg, weights = load_llama_weights(r, dtype=jnp.float32)
    kv = init_kv_cache(cfg, 1, 16, dtype=jnp.float32)
    ours, _ = forward(cfg, weights, jnp.asarray(ids, jnp.int32), kv, 0,
                      logits_all=True, compute_dtype=jnp.float32)
    err = np.abs(np.asarray(ours) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-3, err
