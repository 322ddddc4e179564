"""RWKV7 family: WKV7 + GATED_LINEAR_ATTN op conformance vs NumPy ports of
the ggml scalar kernels (ggml-cpu.c:11711 / :11520), and rwkv7 / arwkv7 /
rwkv6qwen2 forward passes with chunked-state consistency."""
import numpy as np
import jax.numpy as jnp

from ggml_hexagon_tpu.gguf import GGUFReader, GGUFWriter
from ggml_hexagon_tpu.models.rwkv6 import (
    RWKV7Config, forward_rwkv6qwen2, forward_rwkv7, gla, init_rwkv7_state,
    load_rwkv7_weights, wkv7)


def wkv7_numpy(r, w, k, v, a, b, state0):
    """Port of ggml_compute_forward_rwkv_wkv7_f32 scalar loop."""
    B, T, H, N = r.shape
    out = np.zeros((B, T, H, N), np.float32)
    S = state0.copy()  # [B,H,N(i=v-dim),N(j=k-dim)]
    for bb in range(B):
        for t in range(T):
            for h in range(H):
                for i in range(N):
                    sa = float(np.dot(a[bb, t, h], S[bb, h, i]))
                    kv = v[bb, t, h, i] * k[bb, t, h]  # over j
                    S[bb, h, i] = S[bb, h, i] * w[bb, t, h] + kv + sa * b[bb, t, h]
                    out[bb, t, h, i] = float(np.dot(S[bb, h, i], r[bb, t, h]))
    return out, S


def gla_numpy(k, v, q, g, state0, scale):
    """Port of ggml_compute_forward_gla_f32 scalar loop."""
    B, T, H, N = k.shape
    out = np.zeros((B, T, H, N), np.float32)
    S = state0.copy()  # [B,H,N(i=k-dim),N(j=v-dim)]
    for bb in range(B):
        for t in range(T):
            for h in range(H):
                for i in range(N):
                    S[bb, h, i] = S[bb, h, i] * g[bb, t, h, i] \
                        + k[bb, t, h, i] * v[bb, t, h]
                    out[bb, t, h] += q[bb, t, h, i] * scale * S[bb, h, i]
    return out, S


def test_wkv7_op_conformance():
    rng = np.random.default_rng(0)
    B, T, H, N = 2, 5, 3, 8
    r, k, v, aa, bb = (rng.standard_normal((B, T, H, N), dtype=np.float32) * 0.5
                       for _ in range(5))
    w = 1.0 / (1.0 + np.exp(-rng.standard_normal((B, T, H, N)))).astype(np.float32)
    s0 = (rng.standard_normal((B, H, N, N)) * 0.1).astype(np.float32)
    ref_out, ref_S = wkv7_numpy(r, w, k, v, aa, bb, s0)
    out, S = wkv7(*(jnp.asarray(x) for x in (r, w, k, v, aa, bb, s0)))
    assert np.abs(np.asarray(out) - ref_out).max() < 1e-4
    assert np.abs(np.asarray(S) - ref_S).max() < 1e-4


def test_gla_op_conformance():
    rng = np.random.default_rng(1)
    B, T, H, N = 2, 4, 2, 8
    k, v, q = (rng.standard_normal((B, T, H, N), dtype=np.float32) * 0.5
               for _ in range(3))
    g = 1.0 / (1.0 + np.exp(-rng.standard_normal((B, T, H, N)))).astype(np.float32)
    s0 = (rng.standard_normal((B, H, N, N)) * 0.1).astype(np.float32)
    scale = float(N) ** -0.5
    ref_out, ref_S = gla_numpy(k, v, q, g, s0, scale)
    out, S = gla(*(jnp.asarray(x) for x in (k, v, q, g, s0)), scale)
    assert np.abs(np.asarray(out) - ref_out).max() < 1e-4
    assert np.abs(np.asarray(S) - ref_S).max() < 1e-4


# --- GGUF builders ----------------------------------------------------------

D, FF, L, V = 64, 96, 2, 80
HS = 16  # head_size
H = D // HS
RK = 8  # lora ranks


def rnd(rng, *s):
    return (rng.standard_normal(s) * 0.05).astype(np.float32)


def build_rwkv7(tmp_path, arch):
    w = GGUFWriter()
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", L)
    w.add(f"{arch}.embedding_length", D)
    w.add(f"{arch}.feed_forward_length", FF)
    w.add(f"{arch}.wkv.head_size", HS)
    w.add(f"{arch}.vocab_size", V)
    w.add(f"{arch}.context_length", 128)
    w.add(f"{arch}.attention.decay_lora_rank", RK)
    w.add(f"{arch}.attention.iclr_lora_rank", RK)
    w.add(f"{arch}.attention.value_residual_mix_lora_rank", RK)
    w.add(f"{arch}.attention.gate_lora_rank", RK)
    if arch == "rwkv7":
        w.add(f"{arch}.token_shift_count", 2)
    rng = np.random.default_rng(3)
    w.add_tensor("token_embd.weight", rnd(rng, V, D))
    if arch == "rwkv7":
        w.add_tensor("token_embd_norm.weight", np.ones(D, np.float32))
        w.add_tensor("token_embd_norm.bias", np.zeros(D, np.float32))
        w.add_tensor("output_norm.bias", np.zeros(D, np.float32))
    w.add_tensor("output_norm.weight", np.ones(D, np.float32))
    w.add_tensor("output.weight", rnd(rng, V, D))
    for i in range(L):
        p = f"blk.{i}."
        r = np.random.default_rng(40 + i)
        w.add_tensor(p + "attn_norm.weight", np.ones(D, np.float32))
        if arch == "rwkv7":
            w.add_tensor(p + "attn_norm.bias", np.zeros(D, np.float32))
            w.add_tensor(p + "attn_norm_2.weight", np.ones(D, np.float32))
            w.add_tensor(p + "attn_norm_2.bias", np.zeros(D, np.float32))
            w.add_tensor(p + "time_mix_ln.weight", np.ones(D, np.float32))
            w.add_tensor(p + "time_mix_ln.bias", np.zeros(D, np.float32))
        w.add_tensor(p + "time_mix_w0.weight", rnd(r, D) - 2.0)
        w.add_tensor(p + "time_mix_w1.weight", rnd(r, RK, D))
        w.add_tensor(p + "time_mix_w2.weight", rnd(r, D, RK))
        w.add_tensor(p + "time_mix_a0.weight", rnd(r, D))
        w.add_tensor(p + "time_mix_a1.weight", rnd(r, RK, D))
        w.add_tensor(p + "time_mix_a2.weight", rnd(r, D, RK))
        if i > 0:
            w.add_tensor(p + "time_mix_v0.weight", rnd(r, D))
            w.add_tensor(p + "time_mix_v1.weight", rnd(r, RK, D))
            w.add_tensor(p + "time_mix_v2.weight", rnd(r, D, RK))
        w.add_tensor(p + "time_mix_g1.weight", rnd(r, RK, D))
        w.add_tensor(p + "time_mix_g2.weight", rnd(r, D, RK))
        w.add_tensor(p + "time_mix_lerp_fused.weight",
                     rnd(r, 6, 1, 1, D))
        w.add_tensor(p + "time_mix_k_k.weight", 1.0 + rnd(r, D))
        w.add_tensor(p + "time_mix_k_a.weight", rnd(r, D))
        w.add_tensor(p + "time_mix_r_k.weight", rnd(r, D))
        w.add_tensor(p + "time_mix_key.weight", rnd(r, D, D))
        w.add_tensor(p + "time_mix_value.weight", rnd(r, D, D))
        w.add_tensor(p + "time_mix_receptance.weight", rnd(r, D, D))
        w.add_tensor(p + "time_mix_output.weight", rnd(r, D, D))
        if arch == "rwkv7":
            w.add_tensor(p + "channel_mix_lerp_k.weight", rnd(r, D))
            w.add_tensor(p + "channel_mix_key.weight", rnd(r, FF, D))
            w.add_tensor(p + "channel_mix_value.weight", rnd(r, D, FF))
        else:  # arwkv7: SwiGLU
            w.add_tensor(p + "ffn_norm.weight", np.ones(D, np.float32))
            w.add_tensor(p + "ffn_gate.weight", rnd(r, FF, D))
            w.add_tensor(p + "ffn_up.weight", rnd(r, FF, D))
            w.add_tensor(p + "ffn_down.weight", rnd(r, D, FF))
    path = str(tmp_path / f"{arch}.gguf")
    w.write_file(path)
    return path


def build_rwkv6qwen2(tmp_path, n_head_kv=2):
    arch = "rwkv6qwen2"
    ED, DED = 8, 16
    kv_size = n_head_kv * HS
    w = GGUFWriter()
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", L)
    w.add(f"{arch}.embedding_length", D)
    w.add(f"{arch}.feed_forward_length", FF)
    w.add(f"{arch}.wkv.head_size", HS)
    w.add(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add(f"{arch}.vocab_size", V)
    w.add(f"{arch}.context_length", 128)
    w.add(f"{arch}.time_mix_extra_dim", ED)
    w.add(f"{arch}.time_decay_extra_dim", DED)
    rng = np.random.default_rng(5)
    w.add_tensor("token_embd.weight", rnd(rng, V, D))
    w.add_tensor("output_norm.weight", np.ones(D, np.float32))
    w.add_tensor("output.weight", rnd(rng, V, D))
    for i in range(L):
        p = f"blk.{i}."
        r = np.random.default_rng(50 + i)
        w.add_tensor(p + "attn_norm.weight", np.ones(D, np.float32))
        w.add_tensor(p + "time_mix_lerp_x.weight", rnd(r, D))
        w.add_tensor(p + "time_mix_lerp_fused.weight", rnd(r, 5, 1, 1, D))
        w.add_tensor(p + "time_mix_w1.weight", rnd(r, 5 * ED, D))
        w.add_tensor(p + "time_mix_w2.weight", rnd(r, 5, D, ED))
        w.add_tensor(p + "time_mix_decay.weight", rnd(r, D) - 2.0)
        w.add_tensor(p + "time_mix_decay_w1.weight", rnd(r, DED, D))
        w.add_tensor(p + "time_mix_decay_w2.weight", rnd(r, D, DED))
        w.add_tensor(p + "time_mix_key.weight", rnd(r, kv_size, D))
        w.add_tensor(p + "time_mix_key.bias", rnd(r, kv_size))
        w.add_tensor(p + "time_mix_value.weight", rnd(r, kv_size, D))
        w.add_tensor(p + "time_mix_value.bias", rnd(r, kv_size))
        w.add_tensor(p + "time_mix_receptance.weight", rnd(r, D, D))
        w.add_tensor(p + "time_mix_receptance.bias", rnd(r, D))
        w.add_tensor(p + "time_mix_gate.weight", rnd(r, D, D))
        w.add_tensor(p + "time_mix_output.weight", rnd(r, D, D))
        w.add_tensor(p + "ffn_norm.weight", np.ones(D, np.float32))
        w.add_tensor(p + "ffn_gate.weight", rnd(r, FF, D))
        w.add_tensor(p + "ffn_up.weight", rnd(r, FF, D))
        w.add_tensor(p + "ffn_down.weight", rnd(r, D, FF))
    path = str(tmp_path / "rwkv6qwen2.gguf")
    w.write_file(path)
    return path


def check_chunked(cfg, weights, fwd):
    rng = np.random.default_rng(2)
    ids = rng.integers(0, V, size=(2, 6))
    st = init_rwkv7_state(cfg, 2)
    full, _ = fwd(cfg, weights, jnp.asarray(ids, jnp.int32), st,
                  logits_all=True)
    st = init_rwkv7_state(cfg, 2)
    a, st = fwd(cfg, weights, jnp.asarray(ids[:, :3]), st, logits_all=True)
    b, st = fwd(cfg, weights, jnp.asarray(ids[:, 3:]), st, logits_all=True)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(a), np.asarray(b)], 1),
        np.asarray(full), atol=3e-4)
    assert np.isfinite(np.asarray(full)).all()


def test_rwkv7_forward(tmp_path):
    with GGUFReader.open(build_rwkv7(tmp_path, "rwkv7")) as r:
        cfg, weights = load_rwkv7_weights(r)
    assert cfg.arch == "rwkv7" and cfg.n_head == H
    assert "time_mix_v1" not in weights["layers"][0]  # layer 0: v_first source
    assert "time_mix_v1" in weights["layers"][1]
    check_chunked(cfg, weights, forward_rwkv7)


def test_arwkv7_forward(tmp_path):
    with GGUFReader.open(build_rwkv7(tmp_path, "arwkv7")) as r:
        cfg, weights = load_rwkv7_weights(r)
    assert cfg.arch == "arwkv7"
    assert "ffn_gate" in weights["layers"][0]  # SwiGLU FFN
    assert "channel_mix_key" not in weights["layers"][0]
    check_chunked(cfg, weights, forward_rwkv7)


def test_rwkv6qwen2_forward(tmp_path):
    with GGUFReader.open(build_rwkv6qwen2(tmp_path)) as r:
        cfg, weights = load_rwkv7_weights(r)
    assert cfg.arch == "rwkv6qwen2" and cfg.n_head_kv == 2
    assert "time_mix_key_b" in weights["layers"][0]
    check_chunked(cfg, weights, forward_rwkv6qwen2)
