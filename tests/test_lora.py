"""LoRA adapter tests.

Oracle: merging B@A*scale into the dense weights must equal runtime
application (the property guaranteeing build_lora_mm semantics)."""
import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.gguf import GGUFReader
from ggml_hexagon_tpu.models.convert_hf import convert_hf_llama
from ggml_hexagon_tpu.models.llama import forward, init_kv_cache, load_llama_weights
from ggml_hexagon_tpu.models.lora import LoraAdapter, attach_lora, write_lora_gguf
from ggml_hexagon_tpu.quant.formats import GGMLType

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("lora")
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(8)
    m = transformers.LlamaForCausalLM(cfg)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    base_path = str(tmp / "base.gguf")
    convert_hf_llama(sd, cfg, base_path, qtype=GGMLType.F32)
    # random LoRA on q/o/up projections of both layers
    rng = np.random.default_rng(0)
    r = 8
    ab = {}
    for il in range(2):
        ab[f"blk.{il}.attn_q.weight"] = (
            rng.normal(size=(r, 256)).astype(np.float32) * 0.05,
            rng.normal(size=(256, r)).astype(np.float32) * 0.05,
        )
        ab[f"blk.{il}.ffn_up.weight"] = (
            rng.normal(size=(r, 256)).astype(np.float32) * 0.05,
            rng.normal(size=(512, r)).astype(np.float32) * 0.05,
        )
    lora_path = str(tmp / "adapter.gguf")
    write_lora_gguf(lora_path, ab, alpha=16.0)
    return base_path, lora_path, sd, cfg, ab


def test_lora_loads(setup):
    _, lora_path, _, _, ab = setup
    ad = LoraAdapter.from_gguf(lora_path)
    assert set(ad.names) == set(ab)
    assert ad.alpha == 16.0
    assert ad.effective_scale("blk.0.attn_q.weight") == pytest.approx(16.0 / 8)


def test_lora_runtime_equals_merged(setup):
    base_path, lora_path, sd, hf_cfg, ab = setup
    with GGUFReader.open(base_path) as r:
        cfg, weights = load_llama_weights(r, dtype=jnp.float32)
    ad = LoraAdapter.from_gguf(lora_path)
    lw = attach_lora(weights, ad)
    ids = np.array([[3, 50, 100, 200]], dtype=np.int32)
    out_rt, _ = forward(cfg, lw, jnp.asarray(ids), init_kv_cache(cfg, 1, 8, jnp.float32),
                        0, logits_all=True, compute_dtype=jnp.float32)
    # oracle: merge into dense weights, convert, run base forward.
    # adapters live in GGUF (NORM-rope) space: for attn_q the delta must be
    # un-permuted before merging into the HF (rotate-half) weight.
    def unpermute_qk(w, n_head):
        out_dim = w.shape[0]
        return (w.reshape(n_head, out_dim // n_head // 2, 2, *w.shape[1:])
                .swapaxes(1, 2).reshape(w.shape))

    sd2 = {k: v.copy() for k, v in sd.items()}
    for base, (a, b) in ab.items():
        il = int(base.split(".")[1])
        scale = 16.0 / a.shape[0]
        delta = scale * (b @ a)
        if "attn_q" in base:
            hf_key = f"model.layers.{il}.self_attn.q_proj.weight"
            delta = unpermute_qk(delta, 4)
        else:
            hf_key = f"model.layers.{il}.mlp.up_proj.weight"
        sd2[hf_key] = sd2[hf_key] + delta
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        merged = os.path.join(td, "merged.gguf")
        convert_hf_llama(sd2, hf_cfg, merged, qtype=GGMLType.F32)
        with GGUFReader.open(merged) as r:
            cfg2, w2 = load_llama_weights(r, dtype=jnp.float32)
        out_merged, _ = forward(cfg2, w2, jnp.asarray(ids),
                                init_kv_cache(cfg2, 1, 8, jnp.float32), 0,
                                logits_all=True, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out_rt), np.asarray(out_merged),
                               rtol=2e-4, atol=2e-4)


def test_lora_mismatch_rejected(setup):
    base_path, _, _, _, _ = setup
    with GGUFReader.open(base_path) as r:
        _, weights = load_llama_weights(r, dtype=jnp.float32)
    with pytest.raises(ValueError, match="no adapter tensors matched"):
        attach_lora(weights, LoraAdapter({"blk.99.nope.weight": (np.zeros((2, 4)), np.zeros((4, 2)))}, 16.0))


def test_control_vector(setup):
    from ggml_hexagon_tpu.models.lora import (
        ControlVector, attach_control_vector, write_cvector_gguf)
    import tempfile, os

    base_path, _, _, _, _ = setup
    with GGUFReader.open(base_path) as r:
        cfg, weights = load_llama_weights(r, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    dirs = {0: rng.normal(size=256).astype(np.float32) * 0.1}
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "cv.gguf")
        write_cvector_gguf(p, dirs)
        cv = ControlVector.from_gguf(p, strength=2.0)
    np.testing.assert_allclose(np.asarray(cv.directions[0]), dirs[0], rtol=1e-6)
    w2 = attach_control_vector(weights, cv)
    ids = np.array([[3, 7, 11]], dtype=np.int32)
    a, _ = forward(cfg, weights, jnp.asarray(ids), init_kv_cache(cfg, 1, 4, jnp.float32),
                   0, logits_all=True, compute_dtype=jnp.float32)
    b, _ = forward(cfg, w2, jnp.asarray(ids), init_kv_cache(cfg, 1, 4, jnp.float32),
                   0, logits_all=True, compute_dtype=jnp.float32)
    assert not np.allclose(np.asarray(a), np.asarray(b))  # steering changes output


def test_convert_peft_lora(tmp_path):
    """HF PEFT naming -> adapter GGUF round trip (convert_lora_to_gguf)."""
    import numpy as np
    from ggml_hexagon_tpu.models.lora import LoraAdapter, convert_peft_lora

    rng = np.random.default_rng(0)
    r = 4
    sd = {}
    for il, mod in ((0, "self_attn.q_proj"), (1, "mlp.down_proj")):
        pre = f"base_model.model.model.layers.{il}.{mod}"
        n_in = 16 if mod.startswith("self_attn") else 32
        n_out = 16
        sd[pre + ".lora_A.weight"] = rng.standard_normal((r, n_in)).astype("f4")
        sd[pre + ".lora_B.weight"] = rng.standard_normal((n_out, r)).astype("f4")
    p = str(tmp_path / "peft.gguf")
    convert_peft_lora(sd, p, alpha=8.0)
    ad = LoraAdapter.from_gguf(p)
    assert set(ad.names) == {"blk.0.attn_q.weight", "blk.1.ffn_down.weight"}
    a, b = ad.ab_map["blk.0.attn_q.weight"]
    assert a.shape == (r, 16) and b.shape == (16, r)
    assert ad.effective_scale("blk.0.attn_q.weight") == 8.0 / r
