"""RWKV6: WKV6 op conformance vs a NumPy port of the ggml scalar kernel,
chunked-vs-oneshot state consistency, and the RWKV trie tokenizer."""
import numpy as np
import jax.numpy as jnp

from ggml_hexagon_tpu.gguf import GGUFReader
from ggml_hexagon_tpu.models.rwkv6 import (
    RWKV6Config, convert_hf_rwkv6, forward, init_rwkv6_state,
    load_rwkv6_weights, wkv6)
from ggml_hexagon_tpu.quant.formats import GGMLType
from ggml_hexagon_tpu.tokenizer.rwkv import RWKVTokenizer, unescape_rwkv_token
from ggml_hexagon_tpu.tokenizer.vocab import Vocab, TokenType


def wkv6_numpy(k, v, r, first, w, state0):
    """Direct port of ggml_compute_forward_rwkv_wkv6_f32 scalar loop."""
    B, T, H, N = k.shape
    out = np.zeros((B, T, H, N), np.float32)
    S = state0.copy()  # [B,H,N,N] (i,j)
    for b in range(B):
        for t in range(T):
            for h in range(H):
                for i in range(N):
                    kv = k[b, t, h, i] * v[b, t, h]  # over j
                    temp = kv * first[h, i] + S[b, h, i]
                    out[b, t, h] += temp * r[b, t, h, i]
                    S[b, h, i] = S[b, h, i] * w[b, t, h, i] + kv
    return out, S


def test_wkv6_op_conformance():
    rng = np.random.default_rng(0)
    B, T, H, N = 2, 5, 3, 8
    k, v, r, w = (rng.standard_normal((B, T, H, N), dtype=np.float32) * 0.5
                  for _ in range(4))
    w = 1.0 / (1.0 + np.exp(-w))  # decay in (0,1)
    first = rng.standard_normal((H, N), dtype=np.float32) * 0.5
    s0 = rng.standard_normal((B, H, N, N)).astype(np.float32) * 0.1
    ref_out, ref_S = wkv6_numpy(k, v, r, first, w, s0)
    out, S = wkv6(*(jnp.asarray(a) for a in (k, v, r)), jnp.asarray(first),
                  jnp.asarray(w), jnp.asarray(s0))
    assert np.abs(np.asarray(out) - ref_out).max() < 1e-4
    assert np.abs(np.asarray(S) - ref_S).max() < 1e-4


def synthetic_rwkv6_sd(n_layer=2, hidden=128, head_size=16, n_ff=256,
                       vocab=64, ed=8, ded=16, seed=0):
    rng = np.random.default_rng(seed)
    f = lambda *s: (rng.standard_normal(s) * 0.05).astype(np.float32)
    sd = {
        "rwkv.embeddings.weight": f(vocab, hidden),
        "rwkv.blocks.0.pre_ln.weight": 1 + f(hidden),
        "rwkv.blocks.0.pre_ln.bias": f(hidden),
        "rwkv.ln_out.weight": 1 + f(hidden),
        "rwkv.ln_out.bias": f(hidden),
        "head.weight": f(vocab, hidden),
    }
    for i in range(n_layer):
        p = f"rwkv.blocks.{i}."
        sd[p + "ln1.weight"] = 1 + f(hidden)
        sd[p + "ln1.bias"] = f(hidden)
        sd[p + "ln2.weight"] = 1 + f(hidden)
        sd[p + "ln2.bias"] = f(hidden)
        a = p + "attention."
        sd[a + "time_maa_x"] = f(1, 1, hidden)
        for s in "wkvrg":
            sd[a + f"time_maa_{s}"] = f(1, 1, hidden)
        sd[a + "time_maa_w1"] = f(hidden, 5 * ed)
        sd[a + "time_maa_w2"] = f(5, ed, hidden)
        sd[a + "time_faaaa"] = f(hidden // head_size, head_size)
        sd[a + "time_decay"] = f(1, 1, hidden)
        sd[a + "time_decay_w1"] = f(hidden, ded)
        sd[a + "time_decay_w2"] = f(ded, hidden)
        for nm in ("key", "value", "receptance", "gate", "output"):
            sd[a + nm + ".weight"] = f(hidden, hidden)
        sd[a + "ln_x.weight"] = 1 + f(hidden)
        sd[a + "ln_x.bias"] = f(hidden)
        ff = p + "feed_forward."
        sd[ff + "time_maa_k"] = f(1, 1, hidden)
        sd[ff + "time_maa_r"] = f(1, 1, hidden)
        sd[ff + "key.weight"] = f(n_ff, hidden)
        sd[ff + "receptance.weight"] = f(hidden, hidden)
        sd[ff + "value.weight"] = f(hidden, n_ff)
    cfg = {"hidden_size": hidden, "num_hidden_layers": n_layer,
           "head_size": head_size, "intermediate_size": n_ff,
           "vocab_size": vocab, "rescale_every": 2,
           "layer_norm_epsilon": 1e-5}
    return sd, cfg


def test_rwkv6_chunked_state_consistency(tmp_path):
    sd, hfc = synthetic_rwkv6_sd()
    path = str(tmp_path / "rwkv6.gguf")
    convert_hf_rwkv6(sd, hfc, path, qtype=GGMLType.F32)
    with GGUFReader.open(path) as r:
        cfg, w = load_rwkv6_weights(r)
    assert cfg.n_layer == 2 and cfg.head_size == 16 and cfg.rescale_every == 2
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 64, size=(2, 9)).astype(np.int32)
    full, _ = forward(cfg, w, jnp.asarray(ids), init_rwkv6_state(cfg, 2),
                      logits_all=True)
    st = init_rwkv6_state(cfg, 2)
    l1, st = forward(cfg, w, jnp.asarray(ids[:, :4]), st, logits_all=True)
    l2, st = forward(cfg, w, jnp.asarray(ids[:, 4:]), st, logits_all=True)
    chunked = np.concatenate([np.asarray(l1), np.asarray(l2)], axis=1)
    err = np.abs(chunked - np.asarray(full)).max()
    assert err < 1e-4, err
    assert np.isfinite(np.asarray(full)).all()


def test_rwkv6_quantized_runs(tmp_path):
    sd, hfc = synthetic_rwkv6_sd(hidden=256, seed=2)
    path = str(tmp_path / "rwkv6_q.gguf")
    convert_hf_rwkv6(sd, hfc, path, qtype=GGMLType.Q8_0)
    with GGUFReader.open(path) as r:
        cfg, w = load_rwkv6_weights(r)
    ids = np.array([[1, 2, 3]], np.int32)
    logits, st = forward(cfg, w, jnp.asarray(ids), init_rwkv6_state(cfg, 1))
    assert logits.shape == (1, 64) and np.isfinite(np.asarray(logits)).all()


def test_rwkv_trie_tokenizer():
    toks = ["<eos>", "a", "b", "ab", "abc", "\\x41\\x42", " ", "hello",
            "hell", "o", "\\n"]
    vocab = Vocab(tokens=toks, scores=[0.0] * len(toks),
                  token_types=[TokenType.CONTROL] + [TokenType.NORMAL] * 10,
                  model="rwkv", pre="default", merges=[],
                  bos_id=0, eos_id=0, unk_id=0, pad_id=-1,
                  add_bos=False, add_eos=False, add_space_prefix=False)
    tk = RWKVTokenizer(vocab)
    assert unescape_rwkv_token("\\x41\\x42") == b"AB"
    assert unescape_rwkv_token("\\n") == b"\n"
    # greedy longest match: "abc" wins over "ab"+"c"; "hello" over "hell"+"o"
    assert tk.encode("abc") == [4]
    assert tk.encode("ab") == [3]
    assert tk.encode("hello") == [7]
    assert tk.encode("hell") == [8]
    assert tk.encode("AB") == [5]
    assert tk.encode("a b\n") == [1, 6, 2, 10]
    # unknown byte -> unk token
    assert tk.encode("z")[0] == 0
    assert tk.decode([1, 6, 2], skip_special=True) == "a b"
    # registered in the dispatcher
    from ggml_hexagon_tpu.tokenizer import build_tokenizer
    assert isinstance(build_tokenizer(vocab), RWKVTokenizer)
