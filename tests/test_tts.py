"""OuteTTS pipeline: text processing, prompt assembly, CLI codes path.

Oracle values mirror the reference semantics (examples/tts/tts.cpp:281-417
process_text/number expansion; 437-466 guide tokens; 1000-1010 code window).
"""
import subprocess
import sys

import numpy as np
import pytest

from ggml_hexagon_tpu.runtime.tts import (
    CODE_TOKEN_OFFSET, build_prompt_ids, generate_codes, number_to_words,
    process_text, speaker_audio_data, speaker_audio_text)


def test_number_to_words():
    assert number_to_words("0") == "zero"
    assert number_to_words("17") == "seventeen"
    assert number_to_words("342") == "three hundred forty two"
    assert number_to_words("2005").strip() == "two thousand five"
    assert number_to_words("3.14") == "three point one four"
    assert number_to_words("1000000").strip() == "one million"


def test_process_text():
    # lowercase, punctuation -> sep, non-alpha dropped, numbers expanded
    assert process_text("Hello, World!") == "hello<|text_sep|>world"
    assert process_text("a  b") == "a<|text_sep|>b"
    assert (process_text("I have 2 cats.")
            == "i<|text_sep|>have<|text_sep|>two<|text_sep|>cats")
    assert process_text("x", version="0.3") == "x"
    assert process_text("a b", version="0.3") == "a<|space|>b"


def test_speaker_segments():
    spk = {"words": [{"word": "hi", "duration": 0.15, "codes": [5, 9]}]}
    assert speaker_audio_text(spk) == "<|text_start|>hi<|text_sep|>"
    data = speaker_audio_data(spk)
    assert data.startswith("<|audio_start|>\n")
    assert "hi<|t_0.15|><|code_start|><|5|><|9|><|code_end|>" in data


class _FakeTok:
    """Word-level fake tokenizer: stable ids by hash of the text."""

    def encode(self, text, add_bos=None, **kw):
        return [abs(hash(p)) % 1000 + 10 for p in text.split()] or [10]


def test_build_prompt_contains_text_sections():
    ids, guide = build_prompt_ids(_FakeTok(), "hello world")
    assert len(ids) > 3
    assert len(guide) == 3  # newline + 2 words


class _FakeEngine:
    """Emits a scripted token stream through the Engine protocol."""

    def __init__(self, script):
        self.script = list(script)
        self.vocab = type("V", (), {"eos_id": 1})()

    def prefill(self, ids):
        return self._next()

    def decode_one(self, tok):
        return self._next()

    def _next(self):
        tok = self.script.pop(0) if self.script else 1
        logits = np.full((1, CODE_TOKEN_OFFSET + 4200), -1e9, np.float32)
        logits[0, tok] = 0.0
        return logits


def test_generate_codes_extracts_window_and_guides():
    # script: code, newline, code (will be guide-overridden), eos
    s = [CODE_TOKEN_OFFSET + 7, 198, CODE_TOKEN_OFFSET + 9, 1]
    eng = _FakeEngine(s)
    # guide fires only right after a newline token
    codes = generate_codes(eng, [0], guide_tokens=[CODE_TOKEN_OFFSET + 3],
                           n_predict=8)
    # first token replaced by guide (use_guide starts True), others pass
    assert codes == [3, 9]


def test_cli_tts_codes_path(tmp_path):
    from ggml_hexagon_tpu.models.wavtokenizer import (WavTokenizerConfig,
                                                      convert_tensors_gguf)
    from test_wavtokenizer import _rand_model, F, P, NFF, OUT, V, GROUPS

    t = _rand_model(np.random.default_rng(0))
    cfg = WavTokenizerConfig(
        n_vocab=V, n_embd=OUT, n_embd_features=F, n_posnet=P,
        n_posnet_layer=6, n_convnext=P, n_convnext_layer=2, n_ff=NFF,
        gn_groups=GROUPS)
    voc = str(tmp_path / "voc.gguf")
    convert_tensors_gguf(t, cfg, voc)
    out = str(tmp_path / "o.wav")
    r = subprocess.run(
        [sys.executable, "-m", "ggml_hexagon_tpu.cli", "tts",
         "-mv", voc, "--codes", "1 2 3 4 5 6 7 8", "-o", out],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    assert open(out, "rb").read(4) == b"RIFF"
