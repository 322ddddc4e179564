"""Multimodal projector zoo (clip.cpp PROJECTOR_TYPE_*): HF differentials
for qwen2vl_merger and gemma3/siglip, torch/numpy oracles for the rest."""
import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.gguf import GGUFReader
from ggml_hexagon_tpu.gguf.writer import GGUFWriter
from ggml_hexagon_tpu.models.clip import (ClipVisionConfig, encode_image,
                                          get_2d_sincos_pos_embed,
                                          load_clip_weights,
                                          minicpmv_bucket_positions)
from ggml_hexagon_tpu.quant.formats import GGMLType

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _write_clip_gguf(path, tensors, image_size=16, patch_size=4, n_embd=64,
                     n_layer=2, n_head=4, n_ff=128, proj="mlp",
                     use_gelu=False, use_silu=False, eps=1e-6, extra=None):
    w = GGUFWriter()
    w.add("general.architecture", "clip")
    w.add("clip.projector_type", proj)
    w.add("clip.use_gelu", use_gelu)
    w.add("clip.use_silu", use_silu)
    w.add("clip.vision.image_size", image_size)
    w.add("clip.vision.patch_size", patch_size)
    w.add("clip.vision.embedding_length", n_embd)
    w.add("clip.vision.block_count", n_layer)
    w.add("clip.vision.attention.head_count", n_head)
    w.add("clip.vision.feed_forward_length", n_ff)
    w.add("clip.vision.attention.layer_norm_epsilon", eps)
    for k, v in (extra or {}).items():
        w.add(k, v)
    for name, arr in tensors.items():
        w.add_tensor(name, np.ascontiguousarray(arr, np.float32), GGMLType.F32)
    w.write_file(path)
    return path


def _rng(seed=0):
    return np.random.default_rng(seed)


# --------------------------------------------------------------------------
# qwen2vl merger: HF differential (tower + 2D vision M-RoPE + merge MLP)
# --------------------------------------------------------------------------

def test_qwen2vl_merger_hf_differential(tmp_path):
    from transformers.models.qwen2_vl.configuration_qwen2_vl import (
        Qwen2VLVisionConfig)
    from transformers.models.qwen2_vl.modeling_qwen2_vl import (
        Qwen2VisionTransformerPretrainedModel)

    E, P, S, HEADS, LLM = 64, 4, 16, 4, 48
    cfg_hf = Qwen2VLVisionConfig(
        depth=2, embed_dim=E, num_heads=HEADS, hidden_size=LLM,
        patch_size=P, temporal_patch_size=2, spatial_merge_size=2,
        mlp_ratio=2, in_channels=3)
    torch.manual_seed(0)
    m = Qwen2VisionTransformerPretrainedModel(cfg_hf).eval().float()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}

    t = {
        # Conv3d [E, 3, 2, P, P] -> two per-frame convs summed (clip.cpp:858)
        "v.patch_embd.weight": sd["patch_embed.proj.weight"][:, :, 0],
        "v.patch_embd.weight.1": sd["patch_embed.proj.weight"][:, :, 1],
        "v.post_ln.weight": sd["merger.ln_q.weight"],
        "v.post_ln.bias": sd["merger.ln_q.bias"],
        "mm.0.weight": sd["merger.mlp.0.weight"],
        "mm.0.bias": sd["merger.mlp.0.bias"],
        "mm.2.weight": sd["merger.mlp.2.weight"],
        "mm.2.bias": sd["merger.mlp.2.bias"],
    }
    for i in range(2):
        p, g = f"blocks.{i}.", f"v.blk.{i}."
        qkv_w = sd[p + "attn.qkv.weight"]
        qkv_b = sd[p + "attn.qkv.bias"]
        for j, nm in enumerate(("attn_q", "attn_k", "attn_v")):
            t[g + nm + ".weight"] = qkv_w[j * E:(j + 1) * E]
            t[g + nm + ".bias"] = qkv_b[j * E:(j + 1) * E]
        t[g + "attn_out.weight"] = sd[p + "attn.proj.weight"]
        t[g + "attn_out.bias"] = sd[p + "attn.proj.bias"]
        t[g + "ln1.weight"] = sd[p + "norm1.weight"]
        t[g + "ln1.bias"] = sd[p + "norm1.bias"]
        t[g + "ln2.weight"] = sd[p + "norm2.weight"]
        t[g + "ln2.bias"] = sd[p + "norm2.bias"]
        # reference naming quirk: fc1 lives under "ffn_down"
        t[g + "ffn_down.weight"] = sd[p + "mlp.fc1.weight"]
        t[g + "ffn_down.bias"] = sd[p + "mlp.fc1.bias"]
        t[g + "ffn_up.weight"] = sd[p + "mlp.fc2.weight"]
        t[g + "ffn_up.bias"] = sd[p + "mlp.fc2.bias"]

    path = str(tmp_path / "qwen2vl.gguf")
    _write_clip_gguf(path, t, n_embd=E, n_head=HEADS, n_ff=E * 2,
                     proj="qwen2vl_merger")
    with GGUFReader.open(path) as r:
        cfg, w = load_clip_weights(r)

    img = _rng(1).normal(size=(3, S, S)).astype(np.float32)
    ours = np.asarray(encode_image(cfg, w, jnp.asarray(img[None])))[0]

    # HF input: processor patch layout (Qwen2VLImageProcessor._preprocess)
    gh = gw = S // P
    msz = 2
    patches = np.tile(img[None], (2, 1, 1, 1))  # temporal duplicate
    patches = patches.reshape(1, 2, 3, gh // msz, msz, P, gw // msz, msz, P)
    patches = patches.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    flat = patches.reshape(gh * gw, 3 * 2 * P * P)
    with torch.no_grad():
        ref = m(torch.tensor(flat), grid_thw=torch.tensor([[1, gh, gw]]))
    ref = ref.numpy()
    assert ours.shape == ref.shape
    err = np.abs(ours - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-3, err


# --------------------------------------------------------------------------
# gemma3: HF SigLIP tower differential + numpy head oracle
# --------------------------------------------------------------------------

def test_gemma3_siglip_differential(tmp_path):
    E, P, S, HEADS, LLM = 64, 4, 16, 4, 48
    cfg_hf = transformers.SiglipVisionConfig(
        hidden_size=E, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=HEADS, image_size=S, patch_size=P,
        layer_norm_eps=1e-6)
    torch.manual_seed(1)
    m = transformers.SiglipVisionModel(cfg_hf).eval()
    sd = {k.replace("vision_model.", ""): v.detach().numpy()
          for k, v in m.state_dict().items()}

    rng = _rng(2)
    soft_norm = rng.normal(size=(E,)).astype(np.float32) * 0.1 + 1.0
    in_proj = rng.normal(size=(E, LLM)).astype(np.float32) * 0.1

    t = {
        "v.patch_embd.weight": sd["embeddings.patch_embedding.weight"],
        "v.patch_embd.bias": sd["embeddings.patch_embedding.bias"],
        "v.position_embd.weight": sd["embeddings.position_embedding.weight"],
        "v.post_ln.weight": sd["post_layernorm.weight"],
        "v.post_ln.bias": sd["post_layernorm.bias"],
        "mm.soft_emb_norm.weight": soft_norm,
        "mm.input_projection.weight": in_proj,
    }
    for i in range(2):
        p, g = f"encoder.layers.{i}.", f"v.blk.{i}."
        for hf, gn in (("layer_norm1", "ln1"), ("layer_norm2", "ln2")):
            t[g + gn + ".weight"] = sd[p + hf + ".weight"]
            t[g + gn + ".bias"] = sd[p + hf + ".bias"]
        for hf, gn in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                       ("v_proj", "attn_v"), ("out_proj", "attn_out")):
            t[g + gn + ".weight"] = sd[p + f"self_attn.{hf}.weight"]
            t[g + gn + ".bias"] = sd[p + f"self_attn.{hf}.bias"]
        t[g + "ffn_down.weight"] = sd[p + "mlp.fc1.weight"]
        t[g + "ffn_down.bias"] = sd[p + "mlp.fc1.bias"]
        t[g + "ffn_up.weight"] = sd[p + "mlp.fc2.weight"]
        t[g + "ffn_up.bias"] = sd[p + "mlp.fc2.bias"]

    path = str(tmp_path / "gemma3.gguf")
    _write_clip_gguf(path, t, n_embd=E, n_head=HEADS, proj="gemma3",
                     use_gelu=True,
                     extra={"clip.vision.mm_tokens_per_image": 4})
    with GGUFReader.open(path) as r:
        cfg, w = load_clip_weights(r)

    img = _rng(3).normal(size=(3, S, S)).astype(np.float32)
    ours = np.asarray(encode_image(cfg, w, jnp.asarray(img[None])))[0]

    with torch.no_grad():
        hid = m(torch.tensor(img[None])).last_hidden_state.numpy()[0]
    # head oracle (clip.cpp:761): avgpool to 2x2, RMS norm, project
    grid, side = S // P, 2
    ks = grid // side
    x = hid.reshape(grid, grid, E).reshape(side, ks, side, ks, E).mean((1, 3))
    x = x.reshape(side * side, E)
    x = x / np.sqrt((x * x).mean(-1, keepdims=True) + 1e-6)
    ref = (x * soft_norm) @ in_proj
    assert ours.shape == ref.shape
    err = np.abs(ours - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-3, err


# --------------------------------------------------------------------------
# minicpmv resampler: sincos/bucket literal ports + attention oracle
# --------------------------------------------------------------------------

def test_sincos_pos_embed_literal_port():
    D, gh, gw = 16, 3, 5
    ours = get_2d_sincos_pos_embed(D, (gh, gw))
    # literal triple-loop port of clip.cpp:2677-2761
    omega = [1.0 / 10000.0 ** (i / (D // 4)) for i in range(D // 4)]
    ref = np.zeros((gw * gh, D), np.float32)
    for h in range(gh):
        for w_ in range(gw):
            for d in range(D // 4):
                ref[w_ * gh + h, d] = np.sin(h * omega[d])
                ref[w_ * gh + h, d + D // 4] = np.cos(h * omega[d])
                ref[w_ * gh + h, d + D // 2] = np.sin(w_ * omega[d])
                ref[w_ * gh + h, d + 3 * D // 4] = np.cos(w_ * omega[d])
    assert np.allclose(ours, ref, atol=1e-6)


def test_minicpmv_bucket_positions_literal_port():
    gh, gw = 12, 9
    ours = minicpmv_bucket_positions(gh, gw)
    ref = []
    for i in range(gh):
        for j in range(gw):
            ref.append(int(70.0 * i / gh) * 70 + int(70.0 * j / gw))
    assert ours.tolist() == ref


def test_resampler_attention_oracle():
    from ggml_hexagon_tpu.models.clip import _proj_resampler

    E, HID, NQ, T = 32, 256, 8, 16   # HID = 2 heads x d_head 128
    rng = _rng(4)
    r = lambda *s: rng.normal(size=s).astype(np.float32) * 0.1
    mm = {
        "resampler.query": r(NQ, HID),
        "resampler.ln_q.weight": r(HID) + 1, "resampler.ln_q.bias": r(HID),
        "resampler.kv.weight": r(HID, E),
        "resampler.ln_kv.weight": r(HID) + 1, "resampler.ln_kv.bias": r(HID),
        "resampler.ln_post.weight": r(HID) + 1,
        "resampler.ln_post.bias": r(HID),
        "resampler.attn.q.weight": r(HID, HID), "resampler.attn.q.bias": r(HID),
        "resampler.attn.k.weight": r(HID, HID), "resampler.attn.k.bias": r(HID),
        "resampler.attn.v.weight": r(HID, HID), "resampler.attn.v.bias": r(HID),
        "resampler.attn.out.weight": r(HID, HID),
        "resampler.attn.out.bias": r(HID),
        "resampler.proj.weight": r(40, HID),
    }
    cfg = ClipVisionConfig(image_size=16, patch_size=4, n_embd=E, n_layer=0,
                           n_head=4, n_ff=64, proj_type="resampler", eps=1e-6)
    feats = r(1, T, E) * 10
    w = {"mm": {k: jnp.asarray(v) for k, v in mm.items()}}
    ours = np.asarray(_proj_resampler(cfg, w, jnp.asarray(feats), (4, 4)))[0]

    # numpy oracle (clip.cpp:1241-1317)
    def ln(x, g, b):
        mu = x.mean(-1, keepdims=True)
        v = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(v + 1e-6) * g + b

    q = ln(mm["resampler.query"], mm["resampler.ln_q.weight"],
           mm["resampler.ln_q.bias"])
    v = feats[0] @ mm["resampler.kv.weight"].T
    v = ln(v, mm["resampler.ln_kv.weight"], mm["resampler.ln_kv.bias"])
    k = v + get_2d_sincos_pos_embed(HID, (4, 4))
    d_head, n_head = 128, HID // 128
    Q = (q @ mm["resampler.attn.q.weight"].T + mm["resampler.attn.q.bias"]) \
        / np.sqrt(d_head)
    K = k @ mm["resampler.attn.k.weight"].T + mm["resampler.attn.k.bias"]
    V = v @ mm["resampler.attn.v.weight"].T + mm["resampler.attn.v.bias"]
    out = np.zeros((NQ, HID), np.float32)
    for h in range(n_head):
        sl = slice(h * d_head, (h + 1) * d_head)
        s = Q[:, sl] @ K[:, sl].T
        s = np.exp(s - s.max(-1, keepdims=True))
        s /= s.sum(-1, keepdims=True)
        out[:, sl] = s @ V[:, sl]
    out = out @ mm["resampler.attn.out.weight"].T + mm["resampler.attn.out.bias"]
    out = ln(out, mm["resampler.ln_post.weight"], mm["resampler.ln_post.bias"])
    ref = out @ mm["resampler.proj.weight"].T
    err = np.abs(ours - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-4, err


def test_resampler_end_to_end_gguf(tmp_path):
    """Full minicpmv path through a GGUF round-trip: siglip-ish tower with
    bucketed 70x70 positions + resampler."""
    E, P, S, HEADS, HID, NQ = 32, 4, 16, 4, 128, 8
    rng = _rng(5)
    r = lambda *s: rng.normal(size=s).astype(np.float32) * 0.05
    t = {
        "v.patch_embd.weight": r(E, 3, P, P),
        "v.patch_embd.bias": r(E),
        "v.position_embd.weight": r(70 * 70, E),
        "resampler.query": r(NQ, HID),
        "resampler.ln_q.weight": r(HID) + 1, "resampler.ln_q.bias": r(HID),
        "resampler.kv.weight": r(HID, E),
        "resampler.ln_kv.weight": r(HID) + 1, "resampler.ln_kv.bias": r(HID),
        "resampler.ln_post.weight": r(HID) + 1, "resampler.ln_post.bias": r(HID),
        "resampler.attn.q.weight": r(HID, HID), "resampler.attn.q.bias": r(HID),
        "resampler.attn.k.weight": r(HID, HID), "resampler.attn.k.bias": r(HID),
        "resampler.attn.v.weight": r(HID, HID), "resampler.attn.v.bias": r(HID),
        "resampler.attn.out.weight": r(HID, HID), "resampler.attn.out.bias": r(HID),
        "resampler.proj.weight": r(48, HID),
    }
    for i in range(2):
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
    path = str(tmp_path / "minicpmv.gguf")
    _write_clip_gguf(path, t, n_embd=E, n_head=HEADS, n_ff=64,
                     proj="resampler", use_gelu=True,
                     extra={"clip.minicpmv_version": 3})
    with GGUFReader.open(path) as r_:
        cfg, w = load_clip_weights(r_)
    img = _rng(6).normal(size=(1, 3, S, S)).astype(np.float32)
    out = np.asarray(encode_image(cfg, w, jnp.asarray(img)))
    assert out.shape == (1, NQ, 48)
    assert np.isfinite(out).all()


# --------------------------------------------------------------------------
# LDP / LDPv2 / mlp_norm / glm adapter: torch oracles
# --------------------------------------------------------------------------

def _torch_ln(x, g, b, eps=1e-6):
    return torch.nn.functional.layer_norm(
        x, (x.shape[-1],), torch.tensor(g), torch.tensor(b), eps)


def test_ldpv2_torch_oracle():
    from ggml_hexagon_tpu.models.clip import _proj_ldpv2

    E, C, G = 32, 48, 8
    rng = _rng(7)
    r = lambda *s: rng.normal(size=s).astype(np.float32) * 0.1
    mm = {
        "mm.model.mlp.0.weight": r(C, E), "mm.model.mlp.0.bias": r(C),
        "mm.model.mlp.2.weight": r(C, C), "mm.model.mlp.2.bias": r(C),
        "mm.model.peg.0.weight": r(C, 1, 3, 3), "mm.model.peg.0.bias": r(C),
    }
    cfg = ClipVisionConfig(image_size=32, patch_size=4, n_embd=E, n_layer=0,
                           n_head=4, n_ff=64, proj_type="ldpv2", eps=1e-6)
    feats = r(1, G * G, E)
    w = {"mm": {k: jnp.asarray(v) for k, v in mm.items()}}
    ours = np.asarray(_proj_ldpv2(cfg, w, jnp.asarray(feats), G))[0]

    with torch.no_grad():
        x = torch.tensor(feats[0])
        y = torch.nn.functional.gelu(
            x @ torch.tensor(mm["mm.model.mlp.0.weight"]).T
            + torch.tensor(mm["mm.model.mlp.0.bias"]))
        y = y @ torch.tensor(mm["mm.model.mlp.2.weight"]).T \
            + torch.tensor(mm["mm.model.mlp.2.bias"])
        img = y.T.reshape(1, C, G, G)
        pooled = torch.nn.functional.avg_pool2d(img, 2, 2)
        peg = torch.nn.functional.conv2d(
            pooled, torch.tensor(mm["mm.model.peg.0.weight"]),
            padding=1, groups=C)
        out = (pooled + peg + torch.tensor(
            mm["mm.model.peg.0.bias"]).view(1, C, 1, 1))
        ref = out.flatten(2).transpose(1, 2)[0].numpy()
    err = np.abs(ours - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 1e-4, err


def test_ldp_torch_oracle():
    from ggml_hexagon_tpu.models.clip import _proj_ldp

    E, C, G = 32, 48, 8
    rng = _rng(8)
    r = lambda *s: rng.normal(size=s).astype(np.float32) * 0.1
    mm = {
        "mm.model.mlp.1.weight": r(C, E), "mm.model.mlp.1.bias": r(C),
        "mm.model.mlp.3.weight": r(C, C), "mm.model.mlp.3.bias": r(C),
    }
    for b in (1, 2):
        p = f"mm.model.mb_block.{b}.block."
        mm.update({
            p + "0.0.weight": r(C, 1, 3, 3),
            p + "0.1.weight": r(C) + 1, p + "0.1.bias": r(C),
            p + "1.fc1.weight": r(C // 4, C), p + "1.fc1.bias": r(C // 4),
            p + "1.fc2.weight": r(C, C // 4), p + "1.fc2.bias": r(C),
            p + "2.0.weight": r(C, C),
            p + "2.1.weight": r(C) + 1, p + "2.1.bias": r(C),
        })
    cfg = ClipVisionConfig(image_size=32, patch_size=4, n_embd=E, n_layer=0,
                           n_head=4, n_ff=64, proj_type="ldp", eps=1e-6)
    feats = r(1, G * G, E)
    w = {"mm": {k: jnp.asarray(v) for k, v in mm.items()}}
    ours = np.asarray(_proj_ldp(cfg, w, jnp.asarray(feats), G))[0]

    with torch.no_grad():
        F = torch.nn.functional

        def block(x, b, stride):  # x [1, C, H, W]
            p = f"mm.model.mb_block.{b}.block."
            y = F.conv2d(x, torch.tensor(mm[p + "0.0.weight"]),
                         stride=stride, padding=1, groups=C)
            y = _torch_ln(y.permute(0, 2, 3, 1),
                          mm[p + "0.1.weight"], mm[p + "0.1.bias"]
                          ).permute(0, 3, 1, 2)
            hw = F.hardswish(y)
            se = hw.mean((2, 3))
            se = F.relu(se @ torch.tensor(mm[p + "1.fc1.weight"]).T
                        + torch.tensor(mm[p + "1.fc1.bias"]))
            se = F.hardsigmoid(se @ torch.tensor(mm[p + "1.fc2.weight"]).T
                               + torch.tensor(mm[p + "1.fc2.bias"]))
            y = hw * se.view(1, C, 1, 1)
            y = y.permute(0, 2, 3, 1) @ torch.tensor(mm[p + "2.0.weight"]).T
            y = _torch_ln(y, mm[p + "2.1.weight"], mm[p + "2.1.bias"])
            return y.permute(0, 3, 1, 2)

        x = torch.tensor(feats[0])
        y = F.gelu(x @ torch.tensor(mm["mm.model.mlp.1.weight"]).T
                   + torch.tensor(mm["mm.model.mlp.1.bias"]))
        y = y @ torch.tensor(mm["mm.model.mlp.3.weight"]).T \
            + torch.tensor(mm["mm.model.mlp.3.bias"])
        img = y.T.reshape(1, C, G, G)
        img = img + block(img, 1, 1)
        img = block(img, 2, 2)
        ref = img.flatten(2).transpose(1, 2)[0].numpy()
    err = np.abs(ours - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 1e-4, err


def test_mlp_norm_oracle():
    from ggml_hexagon_tpu.models.clip import _proj_mlp_norm

    E, H, O = 32, 48, 40
    rng = _rng(9)
    r = lambda *s: rng.normal(size=s).astype(np.float32) * 0.1
    mm = {
        "mm.0.weight": r(H, E), "mm.0.bias": r(H),
        "mm.1.weight": r(H) + 1, "mm.1.bias": r(H),
        "mm.3.weight": r(O, H), "mm.3.bias": r(O),
        "mm.4.weight": r(O) + 1, "mm.4.bias": r(O),
    }
    cfg = ClipVisionConfig(image_size=16, patch_size=4, n_embd=E, n_layer=0,
                           n_head=4, n_ff=64, proj_type="mlp_norm", eps=1e-6)
    feats = r(1, 10, E)
    w = {"mm": {k: jnp.asarray(v) for k, v in mm.items()}}
    ours = np.asarray(_proj_mlp_norm(cfg, w, jnp.asarray(feats)))[0]
    with torch.no_grad():
        x = torch.tensor(feats[0])
        y = x @ torch.tensor(mm["mm.0.weight"]).T + torch.tensor(mm["mm.0.bias"])
        y = _torch_ln(y, mm["mm.1.weight"], mm["mm.1.bias"])
        y = torch.nn.functional.gelu(y)
        y = y @ torch.tensor(mm["mm.3.weight"]).T + torch.tensor(mm["mm.3.bias"])
        ref = _torch_ln(y, mm["mm.4.weight"], mm["mm.4.bias"]).numpy()
    assert np.abs(ours - ref).max() < 1e-4


def test_glm_adapter_oracle():
    from ggml_hexagon_tpu.models.clip import _proj_glm_edge, glm_boi_eoi

    E, C, G, FF, O = 32, 48, 8, 96, 40
    rng = _rng(10)
    r = lambda *s: rng.normal(size=s).astype(np.float32) * 0.1
    mm = {
        "adapter.conv.weight": r(C, E, 2, 2), "adapter.conv.bias": r(C),
        "adapter.linear.linear.weight": r(C, C),
        "adapter.linear.norm1.weight": r(C) + 1,
        "adapter.linear.norm1.bias": r(C),
        "adapter.linear.dense_h_to_4h.weight": r(FF, C),
        "adapter.linear.gate.weight": r(FF, C),
        "adapter.linear.dense_4h_to_h.weight": r(O, FF),
        "adapter.boi": r(1, O), "adapter.eoi": r(1, O),
    }
    cfg = ClipVisionConfig(image_size=32, patch_size=4, n_embd=E, n_layer=0,
                           n_head=4, n_ff=64, proj_type="adapter", eps=1e-6)
    feats = r(1, G * G, E)
    w = {"mm": {k: jnp.asarray(v) for k, v in mm.items()}}
    ours = np.asarray(_proj_glm_edge(cfg, w, jnp.asarray(feats), G))[0]
    boi, eoi = glm_boi_eoi(w)
    assert boi.shape == (1, O) and eoi.shape == (1, O)

    with torch.no_grad():
        F = torch.nn.functional
        x = torch.tensor(feats[0]).T.reshape(1, E, G, G)
        x = F.conv2d(x, torch.tensor(mm["adapter.conv.weight"]), stride=2)
        x = x.flatten(2).transpose(1, 2)[0] + torch.tensor(mm["adapter.conv.bias"])
        y = x @ torch.tensor(mm["adapter.linear.linear.weight"]).T
        y = _torch_ln(y, mm["adapter.linear.norm1.weight"],
                      mm["adapter.linear.norm1.bias"])
        y = F.gelu(y, approximate="tanh")
        up = y @ torch.tensor(mm["adapter.linear.dense_h_to_4h.weight"]).T
        gate = y @ torch.tensor(mm["adapter.linear.gate.weight"]).T
        y = F.silu(up) * gate
        ref = (y @ torch.tensor(mm["adapter.linear.dense_4h_to_h.weight"]).T
               ).numpy()
    err = np.abs(ours - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 1e-4, err
