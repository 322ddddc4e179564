"""WavTokenizer decoder — the TTS vocoder family (audio-code -> waveform).

Reference counterparts: llm_build_wavtokenizer_dec
(src/llama-model.cpp:11582-11732), tensor shapes at llama-model.cpp:3676-3780,
hparams at llama-model.cpp:429-440,1329-1335, and the ISTFT head of the tts
example (examples/tts/tts.cpp:114-278 — fill_hann_window/irfft/fold/
embd_to_audio).  Used by OuteTTS: the LM emits audio codes, this model maps
code embeddings to a magnitude/phase spectrogram, and the ISTFT head renders
24 kHz mono audio.

TPU-native shape: the whole decoder is one jitted [T]->[T, n_embd_out]
function (convs via lax.conv NWC, attention as one non-causal softmax
matmul), and the ISTFT is vectorized jnp.fft over frames + a scatter-add
overlap-add — no per-frame host loop (the reference hand-rolls an O(n^2)
DFT per frame across a thread pool, tts.cpp:131-161).

Structure (posnet.block_count = 6):
  codes -> tok_embd -> conv1d(k7) -> [resnet, resnet, attn, resnet, resnet,
  groupnorm] -> layernorm(token_embd_norm) -> convnext blocks
  (dw k7 -> ln -> pw1 -> gelu -> pw2 -> *gamma -> +res) -> layernorm -> head.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..quant.formats import GGMLType


@dataclass(frozen=True)
class WavTokenizerConfig:
    n_vocab: int
    n_embd: int          # output (spectrogram) width; n_fft = n_embd - 2
    n_embd_features: int  # code-embedding width
    n_posnet: int        # posnet.embedding_length (conv channel count)
    n_posnet_layer: int
    n_convnext: int      # convnext.embedding_length (== n_posnet)
    n_convnext_layer: int
    n_ff: int
    ln_eps: float = 1e-6
    gn_eps: float = 1e-6
    gn_groups: int = 32
    arch: str = "wavtokenizer-dec"

    @classmethod
    def from_gguf(cls, md: dict) -> "WavTokenizerConfig":
        g = lambda k, d=None: md.get(f"wavtokenizer-dec.{k}", d)
        n_vocab = g("vocab_size") or len(md.get("tokenizer.ggml.tokens", [])) or 4096
        return cls(
            n_vocab=int(n_vocab),
            n_embd=int(g("embedding_length")),
            n_embd_features=int(g("features_length")),
            n_posnet=int(g("posnet.embedding_length")),
            n_posnet_layer=int(g("posnet.block_count", 6)),
            n_convnext=int(g("convnext.embedding_length")),
            n_convnext_layer=int(g("convnext.block_count")),
            n_ff=int(g("feed_forward_length")),
            ln_eps=float(g("attention.layer_norm_epsilon", 1e-6)),
            gn_eps=float(g("attention.group_norm_epsilon", 1e-6)),
            gn_groups=int(g("attention.group_norm_groups", 32)),
        )


def load_wavtok_weights(reader, dtype=jnp.float32):
    """GGUF -> (config, pytree).  Conv kernels land as WIO for lax.conv NWC."""
    cfg = WavTokenizerConfig.from_gguf(reader.metadata)

    def dense(name):  # ggml {in, out} -> numpy (out, in)
        return jnp.asarray(reader.tensor_f32(name), dtype)

    def vec(name):  # biases/norms stored {1, C} or {C}
        return jnp.asarray(reader.tensor_f32(name).reshape(-1), dtype)

    def conv(name):  # ggml {K, C_in, C_out} -> numpy (C_out, C_in, K) -> WIO
        return jnp.asarray(
            reader.tensor_f32(name).transpose(2, 1, 0), dtype)

    w = {
        "tok_embd": dense("token_embd.weight"),
        "conv1d": conv("conv1d.weight"),
        "conv1d_b": vec("conv1d.bias"),
        "tok_norm": vec("token_embd_norm.weight"),
        "tok_norm_b": vec("token_embd_norm.bias"),
        "out_norm": vec("output_norm.weight"),
        "out_norm_b": vec("output_norm.bias"),
        "output": dense("output.weight"),
        "output_b": vec("output.bias"),
        "posnet": [],
        "convnext": [],
    }
    for i in range(cfg.n_posnet_layer):
        p = f"posnet.{i}."
        kind = i % 6
        if kind in (0, 1, 3, 4):  # resnet block
            w["posnet"].append({
                "norm1": vec(p + "norm1.weight"), "norm1_b": vec(p + "norm1.bias"),
                "conv1": conv(p + "conv1.weight"), "conv1_b": vec(p + "conv1.bias"),
                "norm2": vec(p + "norm2.weight"), "norm2_b": vec(p + "norm2.bias"),
                "conv2": conv(p + "conv2.weight"), "conv2_b": vec(p + "conv2.bias"),
            })
        elif kind == 2:  # attention block; q/k/v/o are 1x1 convs -> dense
            w["posnet"].append({
                "attn_norm": vec(p + "attn_norm.weight"),
                "attn_norm_b": vec(p + "attn_norm.bias"),
                "q": conv(p + "attn_q.weight")[0], "q_b": vec(p + "attn_q.bias"),
                "k": conv(p + "attn_k.weight")[0], "k_b": vec(p + "attn_k.bias"),
                "v": conv(p + "attn_v.weight")[0], "v_b": vec(p + "attn_v.bias"),
                "o": conv(p + "attn_output.weight")[0],
                "o_b": vec(p + "attn_output.bias"),
            })
        else:  # kind == 5: closing group norm
            w["posnet"].append({
                "norm": vec(p + "attn_norm.weight"),
                "norm_b": vec(p + "attn_norm.bias"),
            })
    for i in range(cfg.n_convnext_layer):
        p = f"convnext.{i}."
        w["convnext"].append({
            "dw": conv(p + "dw.weight"), "dw_b": vec(p + "dw.bias"),
            "norm": vec(p + "norm.weight"), "norm_b": vec(p + "norm.bias"),
            "pw1": dense(p + "pw1.weight"), "pw1_b": vec(p + "pw1.bias"),
            "pw2": dense(p + "pw2.weight"), "pw2_b": vec(p + "pw2.bias"),
            "gamma": vec(p + "gamma.weight"),
        })
    return cfg, w


def _conv1d_same(x, kernel, groups: int = 1):
    """[T, C_in] x WIO[K, C_in/groups, C_out] -> [T, C_out], SAME padding.

    ggml_conv_1d_ph(..., k/2) semantics (odd K): output length == T.
    """
    return jax.lax.conv_general_dilated(
        x[None], kernel, window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups)[0]


def _group_norm(x, weight, bias, groups: int, eps: float):
    """ggml_group_norm on [T, C]: stats over (T, C/groups) per group
    (build_norm LLM_NORM_GROUP, llama-graph.cpp:650-656), then per-channel
    affine."""
    t, c = x.shape
    g = x.reshape(t, groups, c // groups)
    mean = jnp.mean(g, axis=(0, 2), keepdims=True)
    var = jnp.mean(jnp.square(g - mean), axis=(0, 2), keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + eps)
    return g.reshape(t, c) * weight + bias


def _layer_norm(x, weight, bias, eps: float):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * weight + bias


@partial(jax.jit, static_argnums=0)
def forward(cfg: WavTokenizerConfig, w, codes):
    """codes [T] int32 -> spectrogram embedding [T, n_embd] f32."""
    x = w["tok_embd"][codes]                       # [T, F]
    x = _conv1d_same(x, w["conv1d"]) + w["conv1d_b"]

    gn = partial(_group_norm, groups=cfg.gn_groups, eps=cfg.gn_eps)
    for i, lw in enumerate(w["posnet"]):
        kind = i % 6
        res = x
        if kind in (0, 1, 3, 4):
            x = gn(x, lw["norm1"], lw["norm1_b"])
            x = x * jax.nn.sigmoid(x)              # silu, ref uses x*sigmoid(x)
            x = _conv1d_same(x, lw["conv1"]) + lw["conv1_b"]
            x = gn(x, lw["norm2"], lw["norm2_b"])
            x = x * jax.nn.sigmoid(x)
            x = _conv1d_same(x, lw["conv2"]) + lw["conv2_b"] + res
        elif kind == 2:
            x = gn(x, lw["attn_norm"], lw["attn_norm_b"])
            q = x @ lw["q"] + lw["q_b"]            # 1x1 conv == dense
            k = x @ lw["k"] + lw["k_b"]
            v = x @ lw["v"] + lw["v_b"]
            scores = (q @ k.T) * (1.0 / np.sqrt(cfg.n_posnet))
            attn = jax.nn.softmax(scores, axis=-1) @ v     # non-causal
            x = attn @ lw["o"] + lw["o_b"] + res
        else:
            x = gn(x, lw["norm"], lw["norm_b"])

    x = _layer_norm(x, w["tok_norm"], w["tok_norm_b"], cfg.ln_eps)

    for lw in w["convnext"]:
        res = x
        x = _conv1d_same(x, lw["dw"], groups=cfg.n_convnext) + lw["dw_b"]
        x = _layer_norm(x, lw["norm"], lw["norm_b"], cfg.ln_eps)
        x = x @ lw["pw1"].T + lw["pw1_b"]
        x = jax.nn.gelu(x, approximate=True)       # ggml_gelu tanh approx
        x = x @ lw["pw2"].T + lw["pw2_b"]
        x = x * lw["gamma"] + res

    x = _layer_norm(x, w["out_norm"], w["out_norm_b"], cfg.ln_eps)
    return x @ w["output"].T + w["output_b"]       # [T, n_embd]


def hann_window(n: int) -> np.ndarray:
    """Periodic Hann (tts.cpp:114-122, periodic=true)."""
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))).astype(
        np.float32)


@partial(jax.jit, static_argnums=(1, 2))
def _embd_to_audio_jit(embd, n_fft: int, n_hop: int):
    half = embd.shape[1] // 2          # == n_fft//2 + 1 spectral bins
    n_codes = embd.shape[0]
    n_win = n_fft
    n_pad = (n_win - n_hop) // 2
    n_out = (n_codes - 1) * n_hop + n_win

    mag = jnp.minimum(jnp.exp(embd[:, :half]), 1e2)   # tts.cpp:232-235
    phi = embd[:, half:]
    spec = mag * jnp.cos(phi) + 1j * mag * jnp.sin(phi)

    # Reference irfft (tts.cpp:131-161): out[k] = Re(sum_m X[m] e^{2pi ikm/n})/N
    # with N = n/2+1 — a one-sided sum (no hermitian completion), so express
    # it via a zero-padded full ifft: ifft(X, n) * n == sum_m X[m] e^{...}.
    frames = jnp.real(jnp.fft.ifft(spec, n=n_fft, axis=-1)) * (n_fft / half)

    hann = jnp.asarray(hann_window(n_fft))
    res = frames * hann                               # [T, n_fft]

    # fold (tts.cpp:174-197): overlap-add at stride n_hop, then trim pads.
    idx = (jnp.arange(n_codes)[:, None] * n_hop + jnp.arange(n_win)[None, :])
    audio = jnp.zeros(n_out, jnp.float32).at[idx.reshape(-1)].add(
        res.reshape(-1))
    env = jnp.zeros(n_out, jnp.float32).at[idx.reshape(-1)].add(
        jnp.tile(hann * hann, (n_codes, 1)).reshape(-1))
    out = audio[n_pad:n_out - n_pad] / env[n_pad:n_out - n_pad]
    return out


def embd_to_audio(embd, n_fft: int = 1280, n_hop: int = 320) -> np.ndarray:
    """Spectrogram embedding [T, n_embd] -> waveform samples
    ((T-1)*n_hop + n_fft - 2*(n_fft-n_hop)//2 of them), 24 kHz mono.

    Exact port of embd_to_audio (tts.cpp:199-278) including its one-sided
    inverse DFT and envelope normalization."""
    return np.asarray(_embd_to_audio_jit(jnp.asarray(embd, jnp.float32),
                                         n_fft, n_hop))


def codes_to_audio(cfg: WavTokenizerConfig, w, codes) -> np.ndarray:
    """Audio codes [T] -> waveform (the full vocoder path)."""
    embd = forward(cfg, w, jnp.asarray(codes, jnp.int32))
    n_fft = cfg.n_embd - 2
    return embd_to_audio(embd, n_fft=n_fft, n_hop=n_fft // 4)


SAMPLE_RATE = 24000  # tts.cpp save_wav16 call sites


def save_wav16(path, samples, sample_rate: int = SAMPLE_RATE):
    """Minimal mono 16-bit WAV writer (tts.cpp:90-112)."""
    import struct

    pcm = np.clip(np.asarray(samples, np.float32), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16,
        1, 1, sample_rate, sample_rate * 2, 2, 16, b"data", len(pcm))
    with open(path, "wb") as f:
        f.write(hdr + pcm)


def convert_tensors_gguf(tensors: dict, cfg: WavTokenizerConfig, out_path,
                         qtype=GGMLType.F32):
    """numpy tensor dict (reference GGUF names/ggml shapes already) -> GGUF.

    Used by tests and by external checkpoint conversion; conv kernels are
    given in numpy (C_out, C_in, K) order and stored as ggml {K, C_in, C_out}.
    """
    from .convert_hf import _write_gguf

    md = {
        "wavtokenizer-dec.vocab_size": cfg.n_vocab,
        "wavtokenizer-dec.embedding_length": cfg.n_embd,
        "wavtokenizer-dec.features_length": cfg.n_embd_features,
        "wavtokenizer-dec.posnet.embedding_length": cfg.n_posnet,
        "wavtokenizer-dec.posnet.block_count": cfg.n_posnet_layer,
        "wavtokenizer-dec.convnext.embedding_length": cfg.n_convnext,
        "wavtokenizer-dec.convnext.block_count": cfg.n_convnext_layer,
        "wavtokenizer-dec.feed_forward_length": cfg.n_ff,
        "wavtokenizer-dec.attention.layer_norm_epsilon": cfg.ln_eps,
        "wavtokenizer-dec.attention.group_norm_epsilon": cfg.gn_eps,
        "wavtokenizer-dec.attention.group_norm_groups": cfg.gn_groups,
        "wavtokenizer-dec.attention.causal": False,
        "wavtokenizer-dec.context_length": 8192,
        "wavtokenizer-dec.block_count": cfg.n_posnet_layer,
    }
    return _write_gguf(out_path, "wavtokenizer-dec", md, tensors, qtype)
