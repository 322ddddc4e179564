"""LLaVA multimodal differential tests vs HF LlavaForConditionalGeneration.

Covers the reference's examples/llava stack: CLIP vision tower (clip.cpp),
MLP projector, mmproj GGUF round-trip, and image-embedding splice into the
decoder (llava.cpp llava_eval_image_embed)."""
import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.gguf import GGUFReader
from ggml_hexagon_tpu.models.clip import (
    convert_hf_clip_vision, encode_image, load_clip_weights, preprocess_image)
from ggml_hexagon_tpu.models.convert_hf import convert_hf_llama
from ggml_hexagon_tpu.quant.formats import GGMLType
from ggml_hexagon_tpu.runtime.llava import LlavaEngine
from ggml_hexagon_tpu.runtime.engine import Engine

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def llava(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("llava")
    cfgv = transformers.CLIPVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=3,
        num_attention_heads=4, image_size=32, patch_size=8, projection_dim=32)
    cfgt = transformers.LlamaConfig(
        vocab_size=64, hidden_size=96, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64)
    cfg = transformers.LlavaConfig(
        vision_config=cfgv, text_config=cfgt, image_token_index=63,
        vision_feature_layer=-2, vision_feature_select_strategy="default")
    torch.manual_seed(0)
    m = transformers.LlavaForConditionalGeneration(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    vt = {k[len("model.vision_tower.vision_model."):]: v
          for k, v in sd.items() if k.startswith("model.vision_tower.")}
    proj = {k[len("model.multi_modal_projector."):]: v
            for k, v in sd.items() if "projector" in k}
    lm = {("model." + k[len("model.language_model."):]): v
          for k, v in sd.items() if k.startswith("model.language_model.")}
    lm["lm_head.weight"] = sd["lm_head.weight"]
    mmproj = str(tmp / "mmproj.gguf")
    model = str(tmp / "model.gguf")
    convert_hf_clip_vision(vt, cfgv, mmproj, projector_sd=proj)
    convert_hf_llama(lm, cfgt, model, qtype=GGMLType.F32)
    return m, cfg, mmproj, model


def test_clip_tower_projector_match_hf(llava):
    m, cfg, mmproj, _ = llava
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = m.get_image_features(
            pixel_values=torch.tensor(pixels),
            vision_feature_layer=-2,
            vision_feature_select_strategy="default")
        if isinstance(ref, (list, tuple)):
            ref = ref[0]
        ref = ref.numpy()
    with GGUFReader.open(mmproj) as r:
        ccfg, cw = load_clip_weights(r)
    ours = np.asarray(encode_image(ccfg, cw, jnp.asarray(pixels)))
    err = np.abs(ours - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-3, err


def test_llava_prefill_logits_match_hf(llava):
    m, cfg, mmproj, model = llava
    rng = np.random.default_rng(1)
    pixels = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    n_img = (32 // 8) ** 2
    before = [1, 5, 9]
    after = [7, 3]
    ids = before + [63] * n_img + after
    with torch.no_grad():
        ref = m(input_ids=torch.tensor([ids]),
                pixel_values=torch.tensor(pixels)).logits.numpy()[0, -1]
    lv = LlavaEngine.from_gguf(model, mmproj, max_seq=64,
                               kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    logits = lv.prefill_multimodal([
        ("tokens", before), ("image", pixels[0]), ("tokens", after)])
    err = np.abs(logits[0] - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 5e-3, err


def test_llava_generates(llava):
    _, cfg, mmproj, model = llava
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, size=(48, 40, 3), dtype=np.uint8)
    lv = LlavaEngine.from_gguf(model, mmproj, max_seq=64)
    toks = lv.generate([("tokens", [1, 5]), ("image", img), ("tokens", [7])],
                       n_predict=5)
    assert len(toks) == 5 and all(0 <= t < 64 for t in toks)


def test_preprocess_shapes():
    from ggml_hexagon_tpu.models.clip import ClipVisionConfig

    cfg = ClipVisionConfig(image_size=32, patch_size=8, n_embd=64,
                           n_layer=1, n_head=4, n_ff=128)
    img = np.zeros((100, 60, 3), np.uint8)
    out = preprocess_image(img, cfg)
    assert out.shape == (3, 32, 32)
    assert np.isfinite(out).all()


def test_cli_llava(llava, tmp_path, capsys):
    """Drive the llava-cli analog end-to-end (needs a tokenized model)."""
    from ggml_hexagon_tpu.cli import main
    from ggml_hexagon_tpu.models.clip import convert_hf_clip_vision

    m, cfg, mmproj, _ = llava
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    lm = {("model." + k[len("model.language_model."):]): v
          for k, v in sd.items() if k.startswith("model.language_model.")}
    lm["lm_head.weight"] = sd["lm_head.weight"]
    toks = ["<unk>", "<s>", "</s>"] + [f"t{i}" for i in range(61)]
    tf = {"tokenizer.ggml.model": "llama", "tokenizer.ggml.tokens": toks,
          "tokenizer.ggml.scores": [0.0] * 64,
          "tokenizer.ggml.token_type": [2, 3, 3] + [1] * 61}
    model = str(tmp_path / "m_tok.gguf")
    convert_hf_llama(lm, cfg.text_config, model, qtype=GGMLType.F32,
                     tokenizer_fields=tf)
    img = str(tmp_path / "img.npy")
    np.save(img, np.zeros((40, 40, 3), np.uint8))
    rc = main(["llava", "-m", model, "--mmproj", mmproj, "--image", img,
               "-p", "t1 <image> t2", "-n", "4", "-c", "64"])
    assert rc == 0
    assert capsys.readouterr().out.strip() != ""
