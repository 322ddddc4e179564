"""Differential tokenizer tests against the reference's in-tree golden
fixtures (/root/reference/models/ggml-vocab-*.gguf + .inp/.out pairs —
the same files tests/test-tokenizer-0.cpp runs against, with the same
protocol: add_special=false, parse_special=false).

These cover SPM (llama-spm, phi-3), WPM (bert-bge) and the BPE
pre-tokenizer variants gpt-2, mpt, starcoder, refact, falcon,
deepseek-llm, deepseek-coder — the fidelity gaps named in round-1 VERDICT
items 2-3.  Skipped when the reference checkout is absent.
"""
import os

import pytest

from ggml_hexagon_tpu.gguf.reader import GGUFReader
from ggml_hexagon_tpu.tokenizer import Vocab, build_tokenizer

REF_MODELS = "/root/reference/models"

FIXTURES = [
    "bert-bge",
    "deepseek-coder",
    "deepseek-llm",
    "falcon",
    "gpt-2",
    "llama-spm",
    "mpt",
    "phi-3",
    "refact",
    "starcoder",
]


def _fixture_paths(name):
    base = os.path.join(REF_MODELS, f"ggml-vocab-{name}.gguf")
    return base, base + ".inp", base + ".out"


def _read_cases(inp_path, out_path):
    with open(inp_path, encoding="utf-8") as f:
        chunks = f.read().split("\n__ggml_vocab_test__\n")
    with open(out_path, encoding="utf-8") as f:
        outs = [
            [int(t) for t in line.split()] for line in f.read().splitlines()
        ]
    # the trailing separator+newline yields one final empty pseudo-chunk
    if len(chunks) == len(outs) + 1 and chunks[-1] == "":
        chunks.pop()
    return chunks, outs


@pytest.mark.parametrize("name", FIXTURES)
def test_golden_tokenization(name):
    gguf, inp, out = _fixture_paths(name)
    if not (os.path.exists(gguf) and os.path.exists(inp)):
        pytest.skip(f"reference fixture {name} not available")
    with GGUFReader.open(gguf) as r:
        vocab = Vocab.from_gguf(r.metadata)
    tok = build_tokenizer(vocab)
    chunks, expected = _read_cases(inp, out)
    assert len(chunks) == len(expected), f"{name}: fixture length mismatch"
    n_fail = 0
    for i, (text, want) in enumerate(zip(chunks, expected)):
        got = tok.encode(text, add_bos=False, add_eos=False,
                         parse_special=False)
        if got != want:
            n_fail += 1
            print(f"{name} case {i} {text!r}:\n  got  {got}\n  want {want}")
    assert n_fail == 0, f"{name}: {n_fail}/{len(chunks)} cases mismatch"
