"""GGUF reader/writer tests — round trips plus malformed-file robustness
(modeled on the reference's tests/test-gguf.cpp handcrafted-buffer strategy)."""
import io
import struct

import numpy as np
import pytest

from ggml_hexagon_tpu.gguf.reader import (
    GGUF_MAGIC,
    GGUFFormatError,
    GGUFReader,
    GGUFValueType,
)
from ggml_hexagon_tpu.gguf.writer import GGUFWriter
from ggml_hexagon_tpu.quant.formats import GGMLType


def build_sample(rng) -> bytes:
    w = GGUFWriter()
    w.add("general.architecture", "llama")
    w.add("general.name", "test-model")
    w.add("llama.block_count", 2)
    w.add("llama.embedding_length", 64)
    w.add("llama.rope.freq_base", 10000.0)
    w.add("tokenizer.ggml.tokens", ["<s>", "</s>", "hello"])
    w.add("tokenizer.ggml.scores", [0.0, 0.0, -1.0])
    w.add("flag", True)
    w.add_tensor("tok_embd.weight", rng.normal(size=(16, 64)).astype(np.float32))
    w.add_tensor("blk.0.attn_q.weight", rng.normal(size=(64, 64)).astype(np.float32), GGMLType.Q4_0)
    w.add_tensor("blk.0.ffn_up.weight", rng.normal(size=(128, 256)).astype(np.float32), GGMLType.Q4_K)
    buf = io.BytesIO()
    w.write(buf)
    return buf.getvalue()


@pytest.fixture
def sample(rng):
    return build_sample(rng)


def test_roundtrip_metadata(sample):
    r = GGUFReader.from_buffer(sample)
    assert r.version == 3
    assert r.metadata["general.architecture"] == "llama"
    assert r.metadata["llama.block_count"] == 2
    assert r.metadata["llama.rope.freq_base"] == pytest.approx(10000.0)
    assert r.metadata["tokenizer.ggml.tokens"] == ["<s>", "</s>", "hello"]
    assert r.metadata["flag"] is True


def test_roundtrip_tensors(sample, rng):
    r = GGUFReader.from_buffer(sample)
    t = r.tensors["blk.0.attn_q.weight"]
    assert t.ggml_type == GGMLType.Q4_0
    assert t.ne == (64, 64)
    assert t.shape == (64, 64)
    f = r.tensor_f32("tok_embd.weight")
    assert f.shape == (16, 64)
    # payload decodes through the quant layer
    q = r.tensor_f32("blk.0.ffn_up.weight")
    assert q.shape == (128, 256)
    assert np.isfinite(q).all()


def test_file_roundtrip(tmp_path, rng, sample):
    p = tmp_path / "m.gguf"
    p.write_bytes(sample)
    with GGUFReader.open(p) as r:
        assert "tok_embd.weight" in r.tensors
        x = r.tensor_f32("tok_embd.weight")
        assert x.dtype == np.float32


def test_bad_magic(sample):
    bad = b"XXXX" + sample[4:]
    with pytest.raises(GGUFFormatError, match="magic"):
        GGUFReader.from_buffer(bad)


def test_bad_version(sample):
    bad = sample[:4] + struct.pack("<I", 99) + sample[8:]
    with pytest.raises(GGUFFormatError, match="version"):
        GGUFReader.from_buffer(bad)


def test_truncated(sample):
    for cut in (6, 20, len(sample) // 2, len(sample) - 1):
        with pytest.raises(GGUFFormatError):
            GGUFReader.from_buffer(sample[:cut])


def test_implausible_counts():
    buf = struct.pack("<IIQQ", GGUF_MAGIC, 3, 1 << 60, 0)
    with pytest.raises(GGUFFormatError, match="implausible"):
        GGUFReader.from_buffer(buf)


def test_empty_file_and_garbage():
    with pytest.raises(GGUFFormatError):
        GGUFReader.from_buffer(b"")
    with pytest.raises(GGUFFormatError):
        GGUFReader.from_buffer(b"\x00" * 64)


def test_reference_gguf_py_reads_our_files(reference_gguf_py, tmp_path, rng, sample):
    """Cross-check: files we write parse under the reference's reader."""
    from gguf.gguf_reader import GGUFReader as TheirReader

    p = tmp_path / "ours.gguf"
    p.write_bytes(sample)
    theirs = TheirReader(str(p))
    names = {f.name for f in theirs.tensors}
    assert names == {"tok_embd.weight", "blk.0.attn_q.weight", "blk.0.ffn_up.weight"}
    kv = theirs.fields["general.architecture"]
    assert bytes(kv.parts[kv.data[0]]).decode() == "llama"
