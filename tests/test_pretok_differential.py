"""Differential pre-tokenizer conformance: every regex set in
tokenizer/pretok.py vs the REFERENCE'S OWN splitter (unicode_regex_split
compiled from /root/reference/src/unicode.cpp via tools/pretok_shim.cpp),
with regexes extracted mechanically from llama-vocab.cpp — the
transcription-bug class golden fixtures can't reach (VERDICT r2 item 7)."""
import os
import shutil
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

REF = "/root/reference"
HAVE_REF = os.path.exists(f"{REF}/src/unicode.cpp")
HAVE_GXX = shutil.which("g++") is not None

pytestmark = pytest.mark.skipif(
    not (HAVE_REF and HAVE_GXX),
    reason="reference tree or g++ unavailable")


@pytest.fixture(scope="module")
def shim():
    import pretok_diff as PD

    try:
        s = PD.Shim()
    except (subprocess.CalledProcessError, OSError) as e:
        pytest.skip(f"shim build failed: {e}")
    yield s, PD
    s.close()


def test_all_regex_sets_match_reference(shim):
    s, PD = shim
    from ggml_hexagon_tpu.tokenizer.bpe import bytes_to_unicode
    from ggml_hexagon_tpu.tokenizer.pretok import (PRE_TO_SET, compiled_set,
                                                   regex_split)

    b2u = bytes_to_unicode()
    enc = lambda p: "".join(b2u[b] for b in p.encode("utf-8"))
    ref_sets = PD.parse_ref_regex_sets()
    ref_names = PD.parse_ref_pre_names()
    assert len(ref_sets) >= 25 and len(ref_names) >= 30  # parser sanity
    tested = 0
    for name in sorted(PRE_TO_SET):
        enum = ref_names.get(name)
        if enum is None or enum not in ref_sets:
            continue
        pats = compiled_set(name)
        for text in PD.CORPORA:
            ours = [enc(p) for p in regex_split(text, pats)]
            want = s.split(text, ref_sets[enum])
            assert ours == want, (name, enum, text[:60])
        tested += 1
    assert tested >= 30  # all mapped pre types exercised
