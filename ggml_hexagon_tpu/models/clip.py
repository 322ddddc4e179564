"""CLIP/SigLIP ViT vision encoders + the full multimodal projector zoo.

TPU-native counterpart of the reference's examples/llava/clip.cpp: the
mmproj GGUF schema (tensor names TN_* / keys KEY_*, clip.cpp:80-156) is
kept wire-compatible — `v.blk.{i}.attn_{q,k,v}` / `ln1/ln2` / projector
tensors, `clip.vision.*` metadata — but the encoder itself is one jitted
XLA program instead of a per-op ggml graph (clip.cpp:794+ builds a cgraph
per image batch).

Wire quirk kept for compatibility: the reference conversion script maps
HF `mlp.fc1` -> "ffn_down" and `mlp.fc2` -> "ffn_up"
(convert_image_encoder_to_gguf.py:60), i.e. the *names are swapped*
relative to their role.  We load fc1 (the up-projection) from
"ffn_down" exactly like clip.cpp's loader (ff_i_w = TN_FFN_DOWN).

Projector types (PROJECTOR_TYPE_NAMES, clip.cpp:171):
  mlp            llava 1.5/1.6 two-layer GELU MLP (mm.0 / mm.2)
  mlp_norm       Yi-VL: linear+LN+GELU+linear+LN (mm.0/1/3/4)
  ldp            MobileVLM: MLP + 2 mobile blocks (dw-conv, SE, pw-conv)
  ldpv2          MobileVLM v2: MLP + 2x2 avgpool + PEG dw-conv residual
  resampler      MiniCPM-V 2/3/4: 2D-sincos cross-attention resampler
  adapter        GLM-Edge: 2x2 conv + GLU adapter (+ boi/eoi splice)
  qwen2vl_merger Qwen2-VL: 2D M-RoPE ViT + 2x2 patch-merge MLP
  gemma3         SigLIP tower + avg-pool to 256 tokens + RMS-norm proj

Flow (examples/llava/llava.cpp llava_image_embed_make_with_bytes):
  pixels -> patch conv -> [CLS?]+patches+positions -> pre_ln -> ViT blocks
  -> feature select -> projector -> [n_tokens, n_embd_llm] embeddings
  spliced into the decoder.
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
    use_silu: bool = False
    feature_layer: int = -2         # hidden-state index (HF convention)
    image_mean: tuple = (0.48145466, 0.4578275, 0.40821073)
    image_std: tuple = (0.26862954, 0.26130258, 0.27577711)
    proj_type: str = "mlp"
    minicpmv_version: int = 0
    mm_tokens_per_image: int = 256  # gemma3 pooled token budget
    image_grid_pinpoints: tuple = ()  # llava-1.6 multi-crop resolutions

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
            use_silu=bool(md.get("clip.use_silu", False)),
            feature_layer=int(g("feature_layer", -2)),
            image_mean=tuple(g("image_mean", (0.48145466, 0.4578275, 0.40821073))),
            image_std=tuple(g("image_std", (0.26862954, 0.26130258, 0.27577711))),
            proj_type=str(md.get("clip.projector_type", "mlp")),
            minicpmv_version=int(md.get("clip.minicpmv_version", 0)),
            mm_tokens_per_image=int(md.get("clip.vision.mm_tokens_per_image",
                                           256)),
            image_grid_pinpoints=tuple(
                int(x) for x in g("image_grid_pinpoints", ())),
        )


#: projectors that run the full tower (get_deepest_feature_layer,
#: clip.cpp:3180: minicpmv/glm/qwen2vl get n_layer, llava n_layer-1)
_FULL_TOWER = ("resampler", "adapter", "qwen2vl_merger", "gemma3")


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
            # NB: fc1 lives under the "ffn_down" name (see module docstring)
            "fc1": get(p + "ffn_down.weight"), "fc1_b": get(p + "ffn_down.bias"),
            "fc2": get(p + "ffn_up.weight"), "fc2_b": get(p + "ffn_up.bias"),
        })
    w = {
        "class_embd": opt("v.class_embd"),
        "patch_embd": get("v.patch_embd.weight"),    # [n_embd, 3, P, P]
        "patch_embd_1": opt("v.patch_embd.weight.1"),  # qwen2vl temporal
        "patch_bias": opt("v.patch_embd.bias"),
        "pos_embd": opt("v.position_embd.weight"),
        "pre_ln": opt("v.pre_ln.weight"), "pre_ln_b": opt("v.pre_ln.bias"),
        "post_ln": opt("v.post_ln.weight"), "post_ln_b": opt("v.post_ln.bias"),
        "blocks": blocks,
    }
    # projector tensors, keyed by their literal GGUF names (clip.cpp TN_*)
    mm = {}
    for name in reader.tensors:
        if not name.startswith("v."):
            mm[name] = get(name)
    w["mm"] = mm
    return cfg, w


def _act(cfg, x):
    if cfg.use_silu:
        return jax.nn.silu(x)
    if cfg.use_gelu:
        return jax.nn.gelu(x, approximate=True)
    return x * jax.nn.sigmoid(1.702 * x)  # quick_gelu (openai CLIP)


def _lin(x, w, b):
    y = jax.lax.dot_general(x, w, (((x.ndim - 1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return y + b if b is not None else y


def _mm(w, name):
    try:
        return w["mm"][name]
    except KeyError:
        raise KeyError(f"projector tensor {name!r} missing from mmproj")


def _patchify(cfg, pixels, weight):
    """Patch conv as unfold + matmul (MXU-shaped). pixels [B,3,H,W] ->
    [B, Gh*Gw, D] in row-major patch order."""
    B, _, H, W = pixels.shape
    P, D = cfg.patch_size, cfg.n_embd
    Gh, Gw = H // P, W // P
    x = pixels.reshape(B, 3, Gh, P, Gw, P).transpose(0, 2, 4, 1, 3, 5)
    x = x.reshape(B, Gh * Gw, 3 * P * P)
    return _lin(x, weight.reshape(D, 3 * P * P), None), Gh, Gw


def _vision_rope(x, pos_yx, d_head):
    """Qwen2-VL vision M-RoPE (ggml_rope_multi GGML_ROPE_TYPE_VISION,
    ggml-cpu.c ggml_mrope_cache_init with indep_sects=true): pair j<d/4
    rotates with the y position, pair j in [d/4,d/2) with x, both at
    freq 10000^(-4k/d); pairing is split-half (x[j], x[j+d/2])."""
    quarter = d_head // 4
    inv = 10000.0 ** (-jnp.arange(quarter, dtype=jnp.float32) / quarter)
    ay = pos_yx[..., 0:1].astype(jnp.float32) * inv[None, :]  # [T, d/4]
    ax = pos_yx[..., 1:2].astype(jnp.float32) * inv[None, :]
    ang = jnp.concatenate([ay, ax], axis=-1)                  # [T, d/2]
    cos = jnp.cos(ang)[None, :, None, :]
    sin = jnp.sin(ang)[None, :, None, :]
    x1, x2 = x[..., : d_head // 2], x[..., d_head // 2:]
    return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos],
                           axis=-1)


def vit_tower(cfg: ClipVisionConfig, w, h, n_blocks, rope_pos=None):
    """Run `n_blocks` transformer blocks over token states h [B,T,D].
    rope_pos: optional [T,2] (y,x) patch coords -> qwen2vl vision rope."""
    B, T, D = h.shape
    hd = D // cfg.n_head
    scale = 1.0 / float(np.sqrt(hd))
    for blk in w["blocks"][:n_blocks]:
        a = norm(h, blk["ln1"], blk["ln1_b"], cfg.eps)
        q = _lin(a, blk["wq"], blk["bq"]).reshape(B, T, cfg.n_head, hd)
        k = _lin(a, blk["wk"], blk["bk"]).reshape(B, T, cfg.n_head, hd)
        v = _lin(a, blk["wv"], blk["bv"]).reshape(B, T, cfg.n_head, hd)
        if rope_pos is not None:
            q = _vision_rope(q, rope_pos, hd)
            k = _vision_rope(k, rope_pos, hd)
        s = jnp.einsum("bthd,bshd->bhts", q, k,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s * scale, axis=-1)
        o = jnp.einsum("bhts,bshd->bthd", p, v,
                       preferred_element_type=jnp.float32)
        h = h + _lin(o.reshape(B, T, D), blk["wo"], blk["bo"])
        f = norm(h, blk["ln2"], blk["ln2_b"], cfg.eps)
        h = h + _lin(_act(cfg, _lin(f, blk["fc1"], blk["fc1_b"])),
                     blk["fc2"], blk["fc2_b"])
    return h


# --------------------------------------------------------------------------
# projectors (clip.cpp clip_image_build_graph_legacy projector sections)
# --------------------------------------------------------------------------

def _ln_f(x, g, b, eps):
    return norm(x, g, b, eps)


def _proj_mlp(cfg, w, feats):
    y = jax.nn.gelu(_lin(feats, _mm(w, "mm.0.weight"), _mm(w, "mm.0.bias")),
                    approximate=False)
    return _lin(y, _mm(w, "mm.2.weight"), _mm(w, "mm.2.bias"))


def _proj_mlp_norm(cfg, w, feats):
    """Yi-VL (clip.cpp:1080): linear, LN, GELU, linear, LN."""
    y = _lin(feats, _mm(w, "mm.0.weight"), _mm(w, "mm.0.bias"))
    y = _ln_f(y, _mm(w, "mm.1.weight"), _mm(w, "mm.1.bias"), cfg.eps)
    y = jax.nn.gelu(y, approximate=False)
    y = _lin(y, _mm(w, "mm.3.weight"), _mm(w, "mm.3.bias"))
    return _ln_f(y, _mm(w, "mm.4.weight"), _mm(w, "mm.4.bias"), cfg.eps)


def _dw_conv(x, weight, stride):
    """Depthwise 3x3 conv, pad 1.  x [B,H,W,C], weight [C,3,3]."""
    C = x.shape[-1]
    k = jnp.transpose(weight.reshape(C, 1, *weight.shape[-2:]), (2, 3, 1, 0))
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(stride, stride), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)


def _hardswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _hardsigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _ldp_block(cfg, w, x, idx, stride):
    """One MobileVLM LDP block (clip.cpp:1112): dw-conv(stride) -> LN ->
    hardswish -> squeeze-excite (global pool, fc1/relu/fc2/hardsigmoid)
    -> pointwise linear -> LN; block 1 adds the residual."""
    p = f"mm.model.mb_block.{idx}.block."
    y = _dw_conv(x, _mm(w, p + "0.0.weight").reshape(x.shape[-1], 3, 3),
                 stride)
    y = _ln_f(y, _mm(w, p + "0.1.weight"), _mm(w, p + "0.1.bias"), cfg.eps)
    hw = _hardswish(y)
    se = jnp.mean(hw, axis=(1, 2))                       # global avg pool
    se = jax.nn.relu(_lin(se, _mm(w, p + "1.fc1.weight"),
                          _mm(w, p + "1.fc1.bias")))
    se = _hardsigmoid(_lin(se, _mm(w, p + "1.fc2.weight"),
                           _mm(w, p + "1.fc2.bias")))
    y = hw * se[:, None, None, :]
    y = _lin(y, _mm(w, p + "2.0.weight"), None)          # pointwise conv
    y = _ln_f(y, _mm(w, p + "2.1.weight"), _mm(w, p + "2.1.bias"), cfg.eps)
    return y


def _proj_ldp(cfg, w, feats, grid):
    """MobileVLM LDP (clip.cpp:1103): MLP then two mobile blocks; the
    first (stride 1) is residual, the second downsamples by 2."""
    B = feats.shape[0]
    y = jax.nn.gelu(_lin(feats, _mm(w, "mm.model.mlp.1.weight"),
                         _mm(w, "mm.model.mlp.1.bias")), approximate=False)
    y = _lin(y, _mm(w, "mm.model.mlp.3.weight"), _mm(w, "mm.model.mlp.3.bias"))
    C = y.shape[-1]
    x = y.reshape(B, grid, grid, C)
    x = x + _ldp_block(cfg, w, x, 1, stride=1)
    x = _ldp_block(cfg, w, x, 2, stride=2)
    return x.reshape(B, -1, C)


def _proj_ldpv2(cfg, w, feats, grid):
    """MobileVLM v2 (clip.cpp:1213): MLP -> 2x2 avg pool -> PEG depthwise
    conv residual."""
    B = feats.shape[0]
    y = jax.nn.gelu(_lin(feats, _mm(w, "mm.model.mlp.0.weight"),
                         _mm(w, "mm.model.mlp.0.bias")), approximate=False)
    y = _lin(y, _mm(w, "mm.model.mlp.2.weight"), _mm(w, "mm.model.mlp.2.bias"))
    C = y.shape[-1]
    x = y.reshape(B, grid, grid, C)
    x = x.reshape(B, grid // 2, 2, grid // 2, 2, C).mean(axis=(2, 4))
    peg = _dw_conv(x, _mm(w, "mm.model.peg.0.weight").reshape(C, 3, 3), 1)
    x = x + peg + _mm(w, "mm.model.peg.0.bias")
    return x.reshape(B, -1, C)


def get_2d_sincos_pos_embed(embed_dim: int, grid_hw) -> np.ndarray:
    """2D sin-cos position table for the MiniCPM-V resampler — literal
    port of get_2d_sincos_pos_embed (clip.cpp:2721, called with
    (pos_w, pos_h)); returns [w*h, embed_dim] in the reference's
    column-major token order (clip.cpp:2756 pos_embed_2d[w*H+h])."""
    gh, gw = grid_hw
    quarter = embed_dim // 4
    omega = 1.0 / 10000.0 ** (np.arange(quarter, dtype=np.float64) / quarter)
    hs = np.arange(gh, dtype=np.float64)
    ws = np.arange(gw, dtype=np.float64)
    ang_h = hs[:, None] * omega[None, :]                 # [gh, D/4]
    ang_w = ws[:, None] * omega[None, :]
    emb = np.zeros((gh, gw, embed_dim), np.float32)
    emb[:, :, 0 * quarter:1 * quarter] = np.sin(ang_h)[:, None, :]
    emb[:, :, 1 * quarter:2 * quarter] = np.cos(ang_h)[:, None, :]
    emb[:, :, 2 * quarter:3 * quarter] = np.sin(ang_w)[None, :, :]
    emb[:, :, 3 * quarter:4 * quarter] = np.cos(ang_w)[None, :, :]
    # pos_embed_2d[w * H + h] = emb[h][w]  (clip.cpp:2756)
    return emb.transpose(1, 0, 2).reshape(gh * gw, embed_dim)


def minicpmv_bucket_positions(gh: int, gw: int) -> np.ndarray:
    """Interpolated 70x70 learned-position ids (clip.cpp:2855 bucket
    coords): id = floor(70*i/gh)*70 + floor(70*j/gw), row-major."""
    bh = np.floor(70.0 * np.arange(gh) / gh).astype(np.int32)
    bw = np.floor(70.0 * np.arange(gw) / gw).astype(np.int32)
    return (bh[:, None] * 70 + bw[None, :]).reshape(-1)


def _proj_resampler(cfg, w, feats, grid_hw):
    """MiniCPM-V resampler (clip.cpp:1241): learned queries cross-attend
    to kv_proj(features) with an additive 2D-sincos key position."""
    B = feats.shape[0]
    q = _mm(w, "resampler.query")                         # [num_query, hid]
    q = _ln_f(q, _mm(w, "resampler.ln_q.weight"),
              _mm(w, "resampler.ln_q.bias"), cfg.eps)
    v = _lin(feats, _mm(w, "resampler.kv.weight"), None)  # [B, T, hid]
    v = _ln_f(v, _mm(w, "resampler.ln_kv.weight"),
              _mm(w, "resampler.ln_kv.bias"), cfg.eps)
    hid = v.shape[-1]
    pos = jnp.asarray(get_2d_sincos_pos_embed(hid, grid_hw))
    k = v + pos[None]
    d_head = 128                                          # clip.cpp:1262
    n_head = hid // d_head
    nq = q.shape[0]
    T = k.shape[1]
    Q = _lin(q, _mm(w, "resampler.attn.q.weight"),
             _mm(w, "resampler.attn.q.bias")) / np.sqrt(d_head)
    Q = jnp.broadcast_to(Q[None], (B, nq, hid)).reshape(B, nq, n_head, d_head)
    K = _lin(k, _mm(w, "resampler.attn.k.weight"),
             _mm(w, "resampler.attn.k.bias")).reshape(B, T, n_head, d_head)
    V = _lin(v, _mm(w, "resampler.attn.v.weight"),
             _mm(w, "resampler.attn.v.bias")).reshape(B, T, n_head, d_head)
    s = jnp.einsum("bqhd,bthd->bhqt", Q, K,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqt,bthd->bqhd", p, V,
                   preferred_element_type=jnp.float32).reshape(B, nq, hid)
    o = _lin(o, _mm(w, "resampler.attn.out.weight"),
             _mm(w, "resampler.attn.out.bias"))
    o = _ln_f(o, _mm(w, "resampler.ln_post.weight"),
              _mm(w, "resampler.ln_post.bias"), cfg.eps)
    return _lin(o, _mm(w, "resampler.proj.weight"), None)


def _proj_glm_edge(cfg, w, feats, grid):
    """GLM-Edge adapter (clip.cpp:1320): 2x2 stride-2 conv, then a GLU
    block (linear -> LN -> GELU -> gate*up -> down)."""
    B = feats.shape[0]
    C = feats.shape[-1]
    conv_w = _mm(w, "adapter.conv.weight")                # [Cout, C, 2, 2]
    Cout = conv_w.shape[0]
    x = feats.reshape(B, grid, grid, C)
    k = jnp.transpose(conv_w, (2, 3, 1, 0))               # HWIO
    x = jax.lax.conv_general_dilated(
        x, k, window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x.reshape(B, -1, Cout) + _mm(w, "adapter.conv.bias")
    y = _lin(x, _mm(w, "adapter.linear.linear.weight"), None)
    y = _ln_f(y, _mm(w, "adapter.linear.norm1.weight"),
              _mm(w, "adapter.linear.norm1.bias"), cfg.eps)
    y = jax.nn.gelu(y, approximate=True)
    up = _lin(y, _mm(w, "adapter.linear.dense_h_to_4h.weight"), None)
    gate = _lin(y, _mm(w, "adapter.linear.gate.weight"), None)
    y = jax.nn.silu(up) * gate
    return _lin(y, _mm(w, "adapter.linear.dense_4h_to_h.weight"), None)


def _proj_merger(cfg, w, feats):
    """Qwen2-VL merger (clip.cpp:1344): concat each 2x2 token block
    (tokens arrive block-ordered) then a 2-layer GELU MLP."""
    B, T, D = feats.shape
    y = feats.reshape(B, T // 4, 4 * D)
    y = jax.nn.gelu(_lin(y, _mm(w, "mm.0.weight"), _mm(w, "mm.0.bias")),
                    approximate=False)
    return _lin(y, _mm(w, "mm.2.weight"), _mm(w, "mm.2.bias"))


def _proj_gemma3(cfg, w, feats, grid):
    """Gemma3 head (clip_image_build_graph_siglip, clip.cpp:761): avg-pool
    patches down to mm_tokens_per_image, RMS-norm, project with the
    transposed input projection."""
    B, T, D = feats.shape
    side = int(np.sqrt(cfg.mm_tokens_per_image))
    ks = grid // side
    x = feats.reshape(B, grid, grid, D)
    x = x.reshape(B, side, ks, side, ks, D).mean(axis=(2, 4))
    x = x.reshape(B, side * side, D).astype(jnp.float32)
    rms = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + cfg.eps)
    x = rms * _mm(w, "mm.soft_emb_norm.weight")
    return jnp.einsum("btd,de->bte", x, _mm(w, "mm.input_projection.weight"),
                      preferred_element_type=jnp.float32)


# --------------------------------------------------------------------------
# encoder entry
# --------------------------------------------------------------------------

def encode_image(cfg: ClipVisionConfig, w, pixels):
    """pixels [B, 3, H, W] (normalized) -> projected embeds
    [B, n_tokens, n_embd_llm].  Dispatches on cfg.proj_type exactly like
    clip_image_build_graph (clip.cpp:1363)."""
    B, _, H, W = pixels.shape
    proj = cfg.proj_type
    h, Gh, Gw = _patchify(cfg, pixels, w["patch_embd"])
    rope_pos = None

    if proj == "qwen2vl_merger":
        # temporal second conv on the same frame + 2x2 block token order
        # (clip.cpp:858-875); vision M-RoPE positions follow the same order
        if w["patch_embd_1"] is not None:
            h1, _, _ = _patchify(cfg, pixels, w["patch_embd_1"])
            h = h + h1
        D = h.shape[-1]
        h = h.reshape(B, Gh // 2, 2, Gw // 2, 2, D)
        h = h.transpose(0, 1, 3, 2, 4, 5).reshape(B, Gh * Gw, D)
        grid_pos = np.stack(np.meshgrid(np.arange(Gh), np.arange(Gw),
                                        indexing="ij"), axis=-1)  # [Gh,Gw,2]
        grid_pos = grid_pos.reshape(Gh // 2, 2, Gw // 2, 2, 2)
        grid_pos = grid_pos.transpose(0, 2, 1, 3, 4).reshape(Gh * Gw, 2)
        rope_pos = jnp.asarray(grid_pos, jnp.int32)
        if w["patch_bias"] is not None:
            h = h + w["patch_bias"]
    else:
        if w["patch_bias"] is not None:
            h = h + w["patch_bias"]
        if proj == "resampler":
            ids = minicpmv_bucket_positions(Gh, Gw)
            h = h + w["pos_embd"][jnp.asarray(ids)][None]
        elif w["pos_embd"] is not None:
            # the CLS token is only concatenated on the llava path
            # (clip.cpp:888 "if (ctx->has_llava_projector)")
            if w["class_embd"] is not None and proj in (
                    "mlp", "mlp_norm", "ldp", "ldpv2"):
                cls = jnp.broadcast_to(w["class_embd"],
                                       (B, 1, cfg.n_embd))
                h = jnp.concatenate([cls, h], axis=1)
            h = h + w["pos_embd"][None, : h.shape[1]]
    if w["pre_ln"] is not None:
        h = norm(h, w["pre_ln"], w["pre_ln_b"], cfg.eps)

    n_blocks = (cfg.n_layer if proj in _FULL_TOWER
                else cfg.n_layer + cfg.feature_layer + 1)
    h = vit_tower(cfg, w, h, n_blocks, rope_pos=rope_pos)

    if proj in _FULL_TOWER and w["post_ln"] is not None:
        h = norm(h, w["post_ln"], w["post_ln_b"], cfg.eps)

    if proj in ("mlp", "mlp_norm", "ldp", "ldpv2") and \
            w["class_embd"] is not None:
        h = h[:, 1:, :]  # drop CLS (strategy 'default')

    if proj == "mlp":
        return _proj_mlp(cfg, w, h)
    if proj == "mlp_norm":
        return _proj_mlp_norm(cfg, w, h)
    if proj == "ldp":
        return _proj_ldp(cfg, w, h, Gh)
    if proj == "ldpv2":
        return _proj_ldpv2(cfg, w, h, Gh)
    if proj == "resampler":
        return _proj_resampler(cfg, w, h, (Gh, Gw))
    if proj == "adapter":
        return _proj_glm_edge(cfg, w, h, Gh)
    if proj == "qwen2vl_merger":
        return _proj_merger(cfg, w, h)
    if proj == "gemma3":
        return _proj_gemma3(cfg, w, h, Gh)
    raise NotImplementedError(f"projector type {cfg.proj_type!r}")


def glm_boi_eoi(w):
    """GLM-Edge begin/end-of-image embeddings spliced around the image
    tokens (clip.cpp:2790 vec offset for boi, eoi appended)."""
    return w["mm"].get("adapter.boi"), w["mm"].get("adapter.eoi")


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
        # reference naming quirk: fc1 -> "ffn_down", fc2 -> "ffn_up"
        # (convert_image_encoder_to_gguf.py:60)
        emit(g + "ffn_down.weight", sd[p + "mlp.fc1.weight"])
        emit(g + "ffn_down.bias", sd[p + "mlp.fc1.bias"])
        emit(g + "ffn_up.weight", sd[p + "mlp.fc2.weight"])
        emit(g + "ffn_up.bias", sd[p + "mlp.fc2.bias"])
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
