"""CLIP ViT vision encoder + LLaVA multimodal projector.

TPU-native counterpart of the reference's examples/llava/clip.cpp: the
mmproj GGUF schema (tensor names TN_* / keys KEY_*, clip.cpp:80-147) is
kept wire-compatible — `v.blk.{i}.attn_{q,k,v}` / `ln1/ln2` / `mm.{0,2}`
tensors, `clip.vision.*` metadata — but the encoder itself is one jitted
XLA program instead of a per-op ggml graph (clip.cpp:600+ builds a cgraph
per image batch).

Flow (examples/llava/llava.cpp llava_image_embed_make_with_bytes):
  pixels -> patch conv -> [CLS]+patches+pos_embd -> pre_ln -> ViT blocks
  -> feature-layer select (llava default: -2, drop CLS) -> MLP projector
  -> [n_patches, n_embd_llm] raw embeddings spliced into the decoder.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..quant.formats import GGMLType
from ..ops.basic import norm


@dataclass(frozen=True)
class ClipVisionConfig:
    image_size: int
    patch_size: int
    n_embd: int
    n_layer: int
    n_head: int
    n_ff: int
    eps: float = 1e-5
    use_gelu: bool = False          # False -> quick_gelu (openai CLIP)
    feature_layer: int = -2         # hidden-state index (HF convention)
    image_mean: tuple = (0.48145466, 0.4578275, 0.40821073)
    image_std: tuple = (0.26862954, 0.26130258, 0.27577711)
    proj_type: str = "mlp"          # llava MLP projector (mm.0 / mm.2)

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @classmethod
    def from_gguf(cls, md: dict) -> "ClipVisionConfig":
        g = lambda k, d=None: md.get(f"clip.vision.{k}", d)
        return cls(
            image_size=int(g("image_size")),
            patch_size=int(g("patch_size")),
            n_embd=int(g("embedding_length")),
            n_layer=int(g("block_count")),
            n_head=int(g("attention.head_count")),
            n_ff=int(g("feed_forward_length")),
            eps=float(g("attention.layer_norm_epsilon", 1e-5)),
            use_gelu=bool(md.get("clip.use_gelu", False)),
            feature_layer=int(g("feature_layer", -2)),
            image_mean=tuple(g("image_mean", (0.48145466, 0.4578275, 0.40821073))),
            image_std=tuple(g("image_std", (0.26862954, 0.26130258, 0.27577711))),
            proj_type=str(md.get("clip.projector_type", "mlp")),
        )


def load_clip_weights(reader, dtype=jnp.float32):
    """Load an mmproj GGUF (clip.cpp tensor names) into a pytree."""
    cfg = ClipVisionConfig.from_gguf(reader.metadata)

    def get(name):
        return jnp.asarray(reader.tensor_f32(name), dtype=dtype)

    def opt(name):
        return get(name) if name in reader.tensors else None

    blocks = []
    for i in range(cfg.n_layer):
        p = f"v.blk.{i}."
        blocks.append({
            "ln1": get(p + "ln1.weight"), "ln1_b": get(p + "ln1.bias"),
            "wq": get(p + "attn_q.weight"), "bq": get(p + "attn_q.bias"),
            "wk": get(p + "attn_k.weight"), "bk": get(p + "attn_k.bias"),
            "wv": get(p + "attn_v.weight"), "bv": get(p + "attn_v.bias"),
            "wo": get(p + "attn_out.weight"), "bo": get(p + "attn_out.bias"),
            "ln2": get(p + "ln2.weight"), "ln2_b": get(p + "ln2.bias"),
            "up": get(p + "ffn_up.weight"), "up_b": get(p + "ffn_up.bias"),
            "down": get(p + "ffn_down.weight"), "down_b": get(p + "ffn_down.bias"),
        })
    w = {
        "class_embd": get("v.class_embd"),
        "patch_embd": get("v.patch_embd.weight"),  # [n_embd, 3, P, P]
        "patch_bias": opt("v.patch_embd.bias"),
        "pos_embd": get("v.position_embd.weight"),
        "pre_ln": opt("v.pre_ln.weight"), "pre_ln_b": opt("v.pre_ln.bias"),
        "blocks": blocks,
        "mm0": get("mm.0.weight"), "mm0_b": get("mm.0.bias"),
        "mm2": get("mm.2.weight"), "mm2_b": get("mm.2.bias"),
    }
    return cfg, w


def _act(cfg, x):
    if cfg.use_gelu:
        return jax.nn.gelu(x, approximate=True)
    return x * jax.nn.sigmoid(1.702 * x)  # quick_gelu (openai CLIP)


def _lin(x, w, b):
    y = jax.lax.dot_general(x, w, (((x.ndim - 1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return y + b if b is not None else y


def encode_image(cfg: ClipVisionConfig, w, pixels):
    """pixels [B, 3, S, S] (normalized) -> projected embeds
    [B, n_patches, n_embd_llm].

    Feature selection follows HF Llava defaults (vision_feature_layer=-2,
    strategy 'default' drops CLS) — equal to clip.cpp's llava projector
    path, which truncates the tower by one block.
    """
    B = pixels.shape[0]
    P, D = cfg.patch_size, cfg.n_embd
    G = cfg.image_size // P
    # patch conv as unfold + matmul (MXU-shaped)
    x = pixels.reshape(B, 3, G, P, G, P).transpose(0, 2, 4, 1, 3, 5)
    x = x.reshape(B, G * G, 3 * P * P)
    pw = w["patch_embd"].reshape(D, 3 * P * P)
    h = _lin(x, pw, None)
    if w["patch_bias"] is not None:
        h = h + w["patch_bias"]
    cls = jnp.broadcast_to(w["class_embd"], (B, 1, D))
    h = jnp.concatenate([cls, h], axis=1) + w["pos_embd"][None]
    if w["pre_ln"] is not None:
        h = norm(h, w["pre_ln"], w["pre_ln_b"], cfg.eps)
    n_keep = cfg.n_layer + cfg.feature_layer + 1  # hidden_states[-2] == after L-1 blocks
    hd = D // cfg.n_head
    scale = 1.0 / float(np.sqrt(hd))
    for blk in w["blocks"][:n_keep]:
        a = norm(h, blk["ln1"], blk["ln1_b"], cfg.eps)
        T = a.shape[1]
        q = _lin(a, blk["wq"], blk["bq"]).reshape(B, T, cfg.n_head, hd)
        k = _lin(a, blk["wk"], blk["bk"]).reshape(B, T, cfg.n_head, hd)
        v = _lin(a, blk["wv"], blk["bv"]).reshape(B, T, cfg.n_head, hd)
        s = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s * scale, axis=-1)
        o = jnp.einsum("bhts,bshd->bthd", p, v, preferred_element_type=jnp.float32)
        h = h + _lin(o.reshape(B, T, D), blk["wo"], blk["bo"])
        f = norm(h, blk["ln2"], blk["ln2_b"], cfg.eps)
        h = h + _lin(_act(cfg, _lin(f, blk["up"], blk["up_b"])),
                     blk["down"], blk["down_b"])
    feats = h[:, 1:, :]  # drop CLS (strategy 'default')
    y = _act_proj(_lin(feats, w["mm0"], w["mm0_b"]))
    return _lin(y, w["mm2"], w["mm2_b"])


def _act_proj(x):
    return jax.nn.gelu(x, approximate=False)  # HF LlavaMultiModalProjector gelu


def preprocess_image(img: np.ndarray, cfg: ClipVisionConfig) -> np.ndarray:
    """uint8 HxWx3 -> normalized [3, S, S] via bilinear resize
    (clip.cpp bicubic_resize analog, bilinear is sufficient for parity
    within test tolerance)."""
    S = cfg.image_size
    img = np.asarray(img, dtype=np.float32) / 255.0
    H, W = img.shape[:2]
    ys = (np.arange(S) + 0.5) * H / S - 0.5
    xs = (np.arange(S) + 0.5) * W / S - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, H - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, W - 1)
    y1 = np.clip(y0 + 1, 0, H - 1)
    x1 = np.clip(x0 + 1, 0, W - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None, None]
    wx = np.clip(xs - x0, 0, 1)[None, :, None]
    out = (img[y0][:, x0] * (1 - wy) * (1 - wx) + img[y0][:, x1] * (1 - wy) * wx
           + img[y1][:, x0] * wy * (1 - wx) + img[y1][:, x1] * wy * wx)
    mean = np.asarray(cfg.image_mean, np.float32)
    std = np.asarray(cfg.image_std, np.float32)
    return ((out - mean) / std).transpose(2, 0, 1)


def convert_hf_clip_vision(state_dict, vision_config, out_path,
                           projector_sd=None, n_embd_llm=None,
                           qtype=GGMLType.F32):
    """HF CLIPVisionModel (+ Llava projector) -> mmproj GGUF
    (reference: examples/llava/convert_image_encoder_to_gguf.py schema)."""
    from ..gguf.writer import GGUFWriter

    c = vision_config
    sd = {k.replace("vision_model.", "").replace("vision_tower.", ""): np.asarray(v)
          for k, v in state_dict.items()}
    w = GGUFWriter()
    w.add("general.architecture", "clip")
    w.add("clip.has_text_encoder", False)
    w.add("clip.has_vision_encoder", True)
    w.add("clip.has_llava_projector", projector_sd is not None)
    w.add("clip.projector_type", "mlp")
    w.add("clip.use_gelu", getattr(c, "hidden_act", "quick_gelu") != "quick_gelu")
    w.add("clip.vision.image_size", int(c.image_size))
    w.add("clip.vision.patch_size", int(c.patch_size))
    w.add("clip.vision.embedding_length", int(c.hidden_size))
    w.add("clip.vision.block_count", int(c.num_hidden_layers))
    w.add("clip.vision.attention.head_count", int(c.num_attention_heads))
    w.add("clip.vision.feed_forward_length", int(c.intermediate_size))
    w.add("clip.vision.attention.layer_norm_epsilon", float(c.layer_norm_eps))
    w.add("clip.vision.projection_dim", int(getattr(c, "projection_dim", 0)))
    w.add("clip.vision.image_mean", [0.48145466, 0.4578275, 0.40821073])
    w.add("clip.vision.image_std", [0.26862954, 0.26130258, 0.27577711])
    w.add("clip.vision.feature_layer", -2)

    def emit(name, arr):
        w.add_tensor(name, np.ascontiguousarray(arr, np.float32), GGMLType.F32)

    emit("v.class_embd", sd["embeddings.class_embedding"])
    emit("v.patch_embd.weight", sd["embeddings.patch_embedding.weight"])
    emit("v.position_embd.weight", sd["embeddings.position_embedding.weight"])
    if "pre_layrnorm.weight" in sd:  # (sic — HF name)
        emit("v.pre_ln.weight", sd["pre_layrnorm.weight"])
        emit("v.pre_ln.bias", sd["pre_layrnorm.bias"])
    for i in range(int(c.num_hidden_layers)):
        p, g = f"encoder.layers.{i}.", f"v.blk.{i}."
        for hf, gn in (("layer_norm1", "ln1"), ("layer_norm2", "ln2")):
            emit(g + gn + ".weight", sd[p + hf + ".weight"])
            emit(g + gn + ".bias", sd[p + hf + ".bias"])
        for hf, gn in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                       ("v_proj", "attn_v"), ("out_proj", "attn_out")):
            emit(g + gn + ".weight", sd[p + f"self_attn.{hf}.weight"])
            emit(g + gn + ".bias", sd[p + f"self_attn.{hf}.bias"])
        emit(g + "ffn_up.weight", sd[p + "mlp.fc1.weight"])
        emit(g + "ffn_up.bias", sd[p + "mlp.fc1.bias"])
        emit(g + "ffn_down.weight", sd[p + "mlp.fc2.weight"])
        emit(g + "ffn_down.bias", sd[p + "mlp.fc2.bias"])
    if "post_layernorm.weight" in sd:
        emit("v.post_ln.weight", sd["post_layernorm.weight"])
        emit("v.post_ln.bias", sd["post_layernorm.bias"])
    if projector_sd is not None:
        ps = {k: np.asarray(v) for k, v in projector_sd.items()}
        emit("mm.0.weight", ps["linear_1.weight"])
        emit("mm.0.bias", ps["linear_1.bias"])
        emit("mm.2.weight", ps["linear_2.weight"])
        emit("mm.2.bias", ps["linear_2.bias"])
    w.write_file(out_path)
    return out_path
