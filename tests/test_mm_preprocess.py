"""Multimodal preprocessing strategies: llava-1.6 pinpoints/multi-crop,
MiniCPM-V LLaVA-UHD slicing, qwen2vl native resolution (clip.cpp:2162-2432)."""
import numpy as np
import pytest

from ggml_hexagon_tpu.models.mm_preprocess import (
    divide_to_patches, ensure_divide, llava16_merge_embeds,
    llava16_preprocess, qwen2vl_resize, resize_and_pad_image,
    select_best_resolution, uhd_best_grid, uhd_find_best_resize,
    uhd_get_refine_size, uhd_slice_image)


def test_select_best_resolution():
    res = [(336, 672), (672, 336), (672, 672), (1008, 336), (336, 1008)]
    # wide image prefers the wide pinpoint
    assert select_best_resolution((1000, 300), res) == (1008, 336)
    # tall image prefers the tall pinpoint
    assert select_best_resolution((300, 1000), res) == (336, 1008)
    # square-ish prefers the square
    assert select_best_resolution((600, 600), res) == (672, 672)


def test_resize_and_pad_centers():
    img = np.full((100, 200, 3), 255.0, np.float32)  # wide
    out = resize_and_pad_image(img, (336, 336))
    assert out.shape == (336, 336, 3)
    # vertical black padding, content centered
    assert out[0].max() == 0 and out[-1].max() == 0
    assert out[168].min() > 200


def test_divide_to_patches_row_major():
    img = np.arange(4 * 6 * 3, dtype=np.float32).reshape(4, 6, 3)
    ps = divide_to_patches(img, 2)
    assert len(ps) == 6
    assert np.array_equal(ps[0], img[0:2, 0:2])
    assert np.array_equal(ps[1], img[0:2, 2:4])
    assert np.array_equal(ps[3], img[2:4, 0:2])


def test_llava16_merge_torch_oracle():
    torch = pytest.importorskip("torch")
    npw, nph, s, D = 2, 2, 3, 8
    rng = np.random.default_rng(0)
    embeds = rng.normal(size=(1 + npw * nph, s * s, D)).astype(np.float32)
    newline = rng.normal(size=(D,)).astype(np.float32)
    ours = llava16_merge_embeds(embeds, (npw, nph), s, newline)

    # reference-simplified permutation (llava.cpp:213, confirmed-identical
    # comment block) + per-row newline
    x = torch.tensor(embeds[1:]).view(nph, npw, s, s, D)
    x = x.permute(0, 2, 1, 3, 4).reshape(nph * s, npw * s, D)
    nl = torch.tensor(newline).expand(nph * s, 1, D)
    x = torch.cat([x, nl], dim=1).reshape(-1, D)
    ref = torch.cat([torch.tensor(embeds[0]), x]).numpy()
    assert ours.shape == ref.shape
    assert np.allclose(ours, ref, atol=1e-6)


def test_llava16_preprocess_shapes():
    img = (np.random.default_rng(1).random((200, 400, 3)) * 255).astype(np.uint8)
    pin = (336, 672, 672, 336, 672, 672)
    batch, grid = llava16_preprocess(img, 336, pin,
                                     (0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    assert grid == (2, 1)                       # wide -> 672x336 pinpoint
    assert batch.shape == (1 + 2, 3, 336, 336)  # base + 2 crops


# --- LLaVA-UHD -------------------------------------------------------------

def test_ensure_divide_and_best_resize():
    assert ensure_divide(100, 14) == 98
    assert ensure_divide(5, 14) == 14
    w, h = uhd_find_best_resize((1000, 500), 448, 14)
    assert w % 14 == 0 and h % 14 == 0
    assert w * h <= (448 + 14) * (448 + 14) * 2.2  # roughly scale_res^2 area
    # small image untouched (just rounded) without allow_upscale
    assert uhd_find_best_resize((100, 98), 448, 14) == (98, 98)


def test_uhd_best_grid_matches_aspect():
    import math
    # 2:1 image with multiple=2 -> grid (2, 1)
    assert uhd_best_grid(9, 2, math.log(2)) == (2, 1)
    assert uhd_best_grid(9, 2, math.log(0.5)) == (1, 2)
    assert uhd_best_grid(9, 4, 0.0) == (2, 2)


def test_uhd_refine_size_divisible():
    rw, rh = uhd_get_refine_size((1200, 800), (3, 2), 448, 14, True)
    assert rw % 3 == 0 and rh % 2 == 0
    assert (rw // 3) % 14 == 0 and (rh // 2) % 14 == 0


def test_uhd_slice_small_image_no_slices():
    img = np.zeros((300, 300, 3), np.float32)
    source, rows, grid = uhd_slice_image(img)
    assert rows == [] and grid == (1, 1)
    assert source.shape[0] % 14 == 0 and source.shape[1] % 14 == 0


def test_uhd_slice_large_image():
    img = (np.random.default_rng(2).random((700, 1400, 3)) * 255)
    source, rows, grid = uhd_slice_image(img)
    gx, gy = grid
    assert gx * gy > 1
    assert len(rows) == gy and len(rows[0]) == gx
    sh, sw = rows[0][0].shape[:2]
    assert all(s.shape[:2] == (sh, sw) for row in rows for s in row)
    assert sh % 14 == 0 and sw % 14 == 0
    assert gx > gy  # wide image splits more columns than rows


def test_qwen2vl_resize_multiples():
    img = np.zeros((37, 101, 3), np.float32)
    out = qwen2vl_resize(img, 14)
    assert out.shape[0] % 28 == 0 and out.shape[1] % 28 == 0
    out2 = qwen2vl_resize(np.zeros((1000, 1000, 3), np.float32), 14,
                          max_pixels=200 * 200)
    assert out2.shape[0] * out2.shape[1] <= 250 * 250


# --- runtime integration ----------------------------------------------------

def test_llava16_engine_embed(tmp_path):
    """End-to-end llava-1.6 path: pinpoints metadata + image_newline tensor
    -> base + crops + newline token layout."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from ggml_hexagon_tpu.gguf import GGUFReader
    from ggml_hexagon_tpu.gguf.writer import GGUFWriter
    from ggml_hexagon_tpu.models.clip import load_clip_weights, encode_image

    E, P, S, LLM = 32, 4, 16, 24
    rng = np.random.default_rng(3)
    r = lambda *s: rng.normal(size=s).astype(np.float32) * 0.05
    w = GGUFWriter()
    w.add("general.architecture", "clip")
    w.add("clip.projector_type", "mlp")
    w.add("clip.use_gelu", False)
    w.add("clip.vision.image_size", S)
    w.add("clip.vision.patch_size", P)
    w.add("clip.vision.embedding_length", E)
    w.add("clip.vision.block_count", 2)
    w.add("clip.vision.attention.head_count", 4)
    w.add("clip.vision.feed_forward_length", 64)
    w.add("clip.vision.attention.layer_norm_epsilon", 1e-5)
    w.add("clip.vision.image_grid_pinpoints", [S, 2 * S, 2 * S, S, 2 * S, 2 * S])
    from ggml_hexagon_tpu.quant.formats import GGMLType
    add = lambda n, a: w.add_tensor(n, np.ascontiguousarray(a, np.float32),
                                    GGMLType.F32)
    add("v.class_embd", r(E))
    add("v.patch_embd.weight", r(E, 3, P, P))
    add("v.position_embd.weight", r((S // P) ** 2 + 1, E))
    for i in range(2):
        g = f"v.blk.{i}."
        for nm, shp in (("ln1", (E,)), ("ln2", (E,))):
            add(g + nm + ".weight", r(*shp) + 1)
            add(g + nm + ".bias", r(*shp))
        for nm in ("attn_q", "attn_k", "attn_v", "attn_out"):
            add(g + nm + ".weight", r(E, E))
            add(g + nm + ".bias", r(E))
        add(g + "ffn_down.weight", r(64, E))
        add(g + "ffn_down.bias", r(64))
        add(g + "ffn_up.weight", r(E, 64))
        add(g + "ffn_up.bias", r(E))
    add("mm.0.weight", r(LLM, E))
    add("mm.0.bias", r(LLM))
    add("mm.2.weight", r(LLM, LLM))
    add("mm.2.bias", r(LLM))
    add("model.image_newline", r(LLM))
    path = str(tmp_path / "l16.gguf")
    w.write_file(path)

    with GGUFReader.open(path) as rd:
        cfg, cw = load_clip_weights(rd)
    assert cfg.image_grid_pinpoints == (S, 2 * S, 2 * S, S, 2 * S, 2 * S)

    class _Stub:
        clip_cfg, clip_weights = cfg, cw
    from ggml_hexagon_tpu.runtime.llava import LlavaEngine
    eng = _Stub()
    eng.image_embed = LlavaEngine.image_embed.__get__(eng)
    eng._encode = LlavaEngine._encode.__get__(eng)
    eng._embed_llava16 = LlavaEngine._embed_llava16.__get__(eng)

    img = (np.random.default_rng(4).random((20, 44, 3)) * 255).astype(np.uint8)
    out = eng.image_embed(img)
    # wide -> (2S, S) pinpoint -> grid (2,1); tokens = base + rows*(cols+1)
    s = S // P
    expect = s * s + (1 * s) * (2 * s + 1)
    assert out.shape == (expect, LLM)
    assert np.isfinite(out).all()


def test_uhd_engine_embed(tmp_path):
    """End-to-end minicpmv path: big image -> source + slices through the
    resampler, NQ tokens per part."""
    pytest.importorskip("torch")
    from test_mmproj import _write_clip_gguf, _rng
    from ggml_hexagon_tpu.gguf import GGUFReader
    from ggml_hexagon_tpu.models.clip import load_clip_weights
    from ggml_hexagon_tpu.runtime.llava import LlavaEngine

    E, P, HID, NQ = 32, 14, 128, 8
    rng = _rng(5)
    r = lambda *s: rng.normal(size=s).astype(np.float32) * 0.05
    t = {
        "v.patch_embd.weight": r(E, 3, P, P), "v.patch_embd.bias": r(E),
        "v.position_embd.weight": r(70 * 70, E),
        "resampler.query": r(NQ, HID),
        "resampler.ln_q.weight": r(HID) + 1, "resampler.ln_q.bias": r(HID),
        "resampler.kv.weight": r(HID, E),
        "resampler.ln_kv.weight": r(HID) + 1, "resampler.ln_kv.bias": r(HID),
        "resampler.ln_post.weight": r(HID) + 1, "resampler.ln_post.bias": r(HID),
        "resampler.attn.q.weight": r(HID, HID), "resampler.attn.q.bias": r(HID),
        "resampler.attn.k.weight": r(HID, HID), "resampler.attn.k.bias": r(HID),
        "resampler.attn.v.weight": r(HID, HID), "resampler.attn.v.bias": r(HID),
        "resampler.attn.out.weight": r(HID, HID),
        "resampler.attn.out.bias": r(HID),
        "resampler.proj.weight": r(24, HID),
    }
    for i in range(1):
        g = f"v.blk.{i}."
        t.update({
            g + "ln1.weight": r(E) + 1, g + "ln1.bias": r(E),
            g + "ln2.weight": r(E) + 1, g + "ln2.bias": r(E),
            g + "attn_q.weight": r(E, E), g + "attn_q.bias": r(E),
            g + "attn_k.weight": r(E, E), g + "attn_k.bias": r(E),
            g + "attn_v.weight": r(E, E), g + "attn_v.bias": r(E),
            g + "attn_out.weight": r(E, E), g + "attn_out.bias": r(E),
            g + "ffn_down.weight": r(64, E), g + "ffn_down.bias": r(64),
            g + "ffn_up.weight": r(E, 64), g + "ffn_up.bias": r(E),
        })
    path = str(tmp_path / "ucpm.gguf")
    _write_clip_gguf(path, t, image_size=448, patch_size=P, n_embd=E,
                     n_layer=1, n_head=4, n_ff=64, proj="resampler",
                     use_gelu=True)
    with GGUFReader.open(path) as rd:
        cfg, cw = load_clip_weights(rd)

    class _Stub:
        clip_cfg, clip_weights = cfg, cw
    eng = _Stub()
    eng.image_embed = LlavaEngine.image_embed.__get__(eng)
    eng._encode = LlavaEngine._encode.__get__(eng)
    eng._embed_uhd = LlavaEngine._embed_uhd.__get__(eng)

    img = (np.random.default_rng(6).random((700, 1400, 3)) * 255).astype(np.uint8)
    from ggml_hexagon_tpu.models.mm_preprocess import uhd_slice_image
    _, rows, (gx, gy) = uhd_slice_image(img, patch_size=P)
    out = eng.image_embed(img)
    assert out.shape == ((1 + gx * gy) * NQ, 24)
    assert np.isfinite(out).all()
