"""WavTokenizer-dec vocoder: numpy-port conformance.

The numpy functions here are independent direct ports of the reference
semantics (llm_build_wavtokenizer_dec, src/llama-model.cpp:11582-11732;
embd_to_audio irfft/fold, examples/tts/tts.cpp:114-278) and serve as the
oracle for the jitted JAX forward, through a full GGUF write/read round trip.
"""
import numpy as np
import pytest

from ggml_hexagon_tpu.gguf import GGUFReader
from ggml_hexagon_tpu.models.wavtokenizer import (
    WavTokenizerConfig, codes_to_audio, convert_tensors_gguf, embd_to_audio,
    forward, hann_window, load_wavtok_weights, save_wav16)

# -- tiny model ---------------------------------------------------------------

F, P, NFF, OUT, V = 10, 16, 24, 18, 32      # features, posnet, ff, out, vocab
GROUPS = 4


def _rand_model(rng):
    r = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.3
    t = {
        "token_embd.weight": r(V, F),
        "conv1d.weight": r(P, F, 7),
        "conv1d.bias": r(P),
        "token_embd_norm.weight": r(P) + 1, "token_embd_norm.bias": r(P),
        "output_norm.weight": r(P) + 1, "output_norm.bias": r(P),
        "output.weight": r(OUT, P), "output.bias": r(OUT),
    }
    for i in (0, 1, 3, 4):
        p = f"posnet.{i}."
        t[p + "norm1.weight"] = r(P) + 1
        t[p + "norm1.bias"] = r(P)
        t[p + "conv1.weight"] = r(P, P, 3)
        t[p + "conv1.bias"] = r(P)
        t[p + "norm2.weight"] = r(P) + 1
        t[p + "norm2.bias"] = r(P)
        t[p + "conv2.weight"] = r(P, P, 3)
        t[p + "conv2.bias"] = r(P)
    p = "posnet.2."
    t[p + "attn_norm.weight"] = r(P) + 1
    t[p + "attn_norm.bias"] = r(P)
    for n in ("attn_q", "attn_k", "attn_v", "attn_output"):
        t[p + n + ".weight"] = r(P, P, 1)
        t[p + n + ".bias"] = r(P)
    t["posnet.5.attn_norm.weight"] = r(P) + 1
    t["posnet.5.attn_norm.bias"] = r(P)
    for i in range(2):
        p = f"convnext.{i}."
        t[p + "dw.weight"] = r(P, 1, 7)
        t[p + "dw.bias"] = r(P)
        t[p + "norm.weight"] = r(P) + 1
        t[p + "norm.bias"] = r(P)
        t[p + "pw1.weight"] = r(NFF, P)
        t[p + "pw1.bias"] = r(NFF)
        t[p + "pw2.weight"] = r(P, NFF)
        t[p + "pw2.bias"] = r(P)
        t[p + "gamma.weight"] = r(P) + 1
    return t


# -- numpy oracle -------------------------------------------------------------

def np_conv_same(x, w):
    """x [T,Cin] * w (Cout,Cin,K) -> [T,Cout], pad K//2 (ggml_conv_1d_ph)."""
    T = x.shape[0]
    k = w.shape[2]
    xp = np.pad(x, ((k // 2, k // 2), (0, 0)))
    out = np.zeros((T, w.shape[0]), np.float32)
    for t in range(T):
        # ggml conv correlates (no kernel flip)
        out[t] = np.einsum("kc,ock->o", xp[t:t + k], w)
    return out


def np_gn(x, wt, b, eps):
    T, C = x.shape
    g = x.reshape(T, GROUPS, C // GROUPS)
    m = g.mean(axis=(0, 2), keepdims=True)
    v = ((g - m) ** 2).mean(axis=(0, 2), keepdims=True)
    return ((g - m) / np.sqrt(v + eps)).reshape(T, C) * wt + b


def np_ln(x, wt, b, eps):
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) / np.sqrt(v + eps) * wt + b


def np_forward(t, codes, ln_eps, gn_eps):
    silu = lambda x: x / (1 + np.exp(-x))
    x = t["token_embd.weight"][codes]
    x = np_conv_same(x, t["conv1d.weight"]) + t["conv1d.bias"]
    for i in (0, 1):
        x = _np_resnet(t, x, i, gn_eps, silu)
    # attn block (i=2)
    res = x
    x = np_gn(x, t["posnet.2.attn_norm.weight"], t["posnet.2.attn_norm.bias"],
              gn_eps)
    q = x @ t["posnet.2.attn_q.weight"][:, :, 0].T + t["posnet.2.attn_q.bias"]
    k = x @ t["posnet.2.attn_k.weight"][:, :, 0].T + t["posnet.2.attn_k.bias"]
    v = x @ t["posnet.2.attn_v.weight"][:, :, 0].T + t["posnet.2.attn_v.bias"]
    s = q @ k.T / np.sqrt(P)
    s = np.exp(s - s.max(-1, keepdims=True))
    s /= s.sum(-1, keepdims=True)
    x = s @ v
    x = (x @ t["posnet.2.attn_output.weight"][:, :, 0].T
         + t["posnet.2.attn_output.bias"]) + res
    for i in (3, 4):
        x = _np_resnet(t, x, i, gn_eps, silu)
    x = np_gn(x, t["posnet.5.attn_norm.weight"], t["posnet.5.attn_norm.bias"],
              gn_eps)
    x = np_ln(x, t["token_embd_norm.weight"], t["token_embd_norm.bias"],
              ln_eps)
    for i in range(2):
        p = f"convnext.{i}."
        res = x
        # depthwise k7
        k7 = t[p + "dw.weight"]  # (C,1,K)
        T = x.shape[0]
        xp = np.pad(x, ((3, 3), (0, 0)))
        x = np.stack([np.einsum("kc,ck->c", xp[j:j + 7], k7[:, 0, :])
                      for j in range(T)]) + t[p + "dw.bias"]
        x = np_ln(x, t[p + "norm.weight"], t[p + "norm.bias"], ln_eps)
        x = x @ t[p + "pw1.weight"].T + t[p + "pw1.bias"]
        x = 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x**3)))
        x = x @ t[p + "pw2.weight"].T + t[p + "pw2.bias"]
        x = x * t[p + "gamma.weight"] + res
    x = np_ln(x, t["output_norm.weight"], t["output_norm.bias"], ln_eps)
    return x @ t["output.weight"].T + t["output.bias"]


def _np_resnet(t, x, i, gn_eps, silu):
    p = f"posnet.{i}."
    res = x
    x = np_gn(x, t[p + "norm1.weight"], t[p + "norm1.bias"], gn_eps)
    x = silu(x)
    x = np_conv_same(x, t[p + "conv1.weight"]) + t[p + "conv1.bias"]
    x = np_gn(x, t[p + "norm2.weight"], t[p + "norm2.bias"], gn_eps)
    x = silu(x)
    return np_conv_same(x, t[p + "conv2.weight"]) + t[p + "conv2.bias"] + res


def np_embd_to_audio(embd, n_fft, n_hop):
    """Direct port of tts.cpp:199-278 (incl. its one-sided inverse DFT)."""
    n_codes, n_embd = embd.shape
    half = n_embd // 2
    n_win = n_fft
    n_pad = (n_win - n_hop) // 2
    n_out = (n_codes - 1) * n_hop + n_win
    hann = 0.5 * (1 - np.cos(2 * np.pi * np.arange(n_fft) / n_fft))
    res = np.zeros((n_codes, n_fft))
    h2 = np.zeros((n_codes, n_fft))
    for l in range(n_codes):
        mag = np.minimum(np.exp(embd[l, :half]), 100.0)
        phi = embd[l, half:]
        re, im = mag * np.cos(phi), mag * np.sin(phi)
        for kk in range(n_fft):
            ang = 2 * np.pi * kk * np.arange(half) / n_fft
            res[l, kk] = np.sum(re * np.cos(ang) - im * np.sin(ang)) / half
        res[l] *= hann
        h2[l] = hann * hann
    audio = np.zeros(n_out)
    env = np.zeros(n_out)
    for l in range(n_codes):
        audio[l * n_hop:l * n_hop + n_win] += res[l]
        env[l * n_hop:l * n_hop + n_win] += h2[l]
    out = audio[n_pad:n_out - n_pad] / env[n_pad:n_out - n_pad]
    return out.astype(np.float32)


# -- tests --------------------------------------------------------------------

@pytest.fixture(scope="module")
def model(tmp_path_factory):
    rng = np.random.default_rng(7)
    t = _rand_model(rng)
    cfg = WavTokenizerConfig(
        n_vocab=V, n_embd=OUT, n_embd_features=F, n_posnet=P,
        n_posnet_layer=6, n_convnext=P, n_convnext_layer=2, n_ff=NFF,
        gn_groups=GROUPS)
    path = str(tmp_path_factory.mktemp("wavtok") / "m.gguf")
    convert_tensors_gguf(t, cfg, path)
    return path, t


def test_forward_matches_numpy_port(model):
    path, t = model
    with GGUFReader.open(path) as r:
        cfg, w = load_wavtok_weights(r)
    assert cfg.n_posnet == P and cfg.n_ff == NFF and cfg.gn_groups == GROUPS
    codes = np.random.default_rng(1).integers(0, V, size=33)
    ours = np.asarray(forward(cfg, w, codes.astype(np.int32)))
    ref = np_forward(t, codes, cfg.ln_eps, cfg.gn_eps)
    assert ours.shape == (33, OUT)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_embd_to_audio_matches_numpy_port():
    rng = np.random.default_rng(3)
    n_fft, n_hop = 16, 4
    embd = rng.standard_normal((9, n_fft + 2)).astype(np.float32)
    ours = embd_to_audio(embd, n_fft=n_fft, n_hop=n_hop)
    ref = np_embd_to_audio(embd, n_fft, n_hop)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_codes_to_audio_and_wav(model, tmp_path):
    path, _ = model
    with GGUFReader.open(path) as r:
        cfg, w = load_wavtok_weights(r)
    codes = np.arange(12) % V
    audio = codes_to_audio(cfg, w, codes)
    n_fft = cfg.n_embd - 2
    hop = n_fft // 4
    assert audio.shape[0] == (len(codes) - 1) * hop + n_fft - 2 * ((n_fft - hop) // 2)
    assert np.isfinite(audio).all()
    wav = tmp_path / "out.wav"
    save_wav16(wav, audio)
    data = wav.read_bytes()
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    assert len(data) == 44 + 2 * audio.shape[0]


def test_hann_window_periodic():
    h = hann_window(8)
    np.testing.assert_allclose(h[0], 0.0, atol=1e-7)
    np.testing.assert_allclose(h[4], 1.0, atol=1e-6)  # periodic: peak at n/2
