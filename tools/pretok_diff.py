"""Differential pre-tokenizer oracle (VERDICT r2 item 7).

Fuzzes OUR Python regex-set translations (tokenizer/pretok.py) against the
reference's OWN splitter: regexes are extracted mechanically from
/root/reference/src/llama-vocab.cpp (the llm_tokenizer_bpe ctor switch),
fed to a compiled shim over unicode_regex_split (tools/pretok_shim.cpp),
and every regex set is driven over multilingual / code / emoji corpora.
Any piece-list mismatch is exactly the transcription-bug class golden
fixtures can't catch for the exotic sets (tekken, gpt-4o, superbpe, ...).

Used by tests/test_pretok_differential.py; run standalone for a report:
    python tools/pretok_diff.py
"""
from __future__ import annotations

import os
import re
import struct
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"
SHIM_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "pretok_shim.cpp")
SHIM_BIN = "/tmp/pretok_shim"


def parse_ref_regex_sets() -> dict[str, list[str]]:
    """{LLAMA_VOCAB_PRE_TYPE_* -> [regex, ...]} parsed from the
    llm_tokenizer_bpe constructor switch (llama-vocab.cpp:276-425)."""
    src = open(f"{REF}/src/llama-vocab.cpp", encoding="utf-8").read()
    m = re.search(r"switch \(vocab\.get_pre_type\(\)\) \{(.*?)\n        \}",
                  src, re.S)
    body = m.group(1)
    sets: dict[str, list[str]] = {}
    cases: list[str] = []
    exprs: list[str] | None = None
    for line in body.splitlines():
        s = line.strip()
        cm = re.match(r"case (LLAMA_VOCAB_PRE_TYPE_\w+):", s)
        if cm:
            cases.append(cm.group(1))
            continue
        if s.startswith("regex_exprs = {"):
            exprs = []
            continue
        if exprs is not None:
            if s.startswith("};"):
                for c in cases:
                    sets[c] = exprs
                cases, exprs = [], None
                continue
            lit = _parse_c_string_concat(s)
            if lit is not None:
                exprs.append(lit)
        elif s == "break;" or s.startswith("default:"):
            cases = []
    return sets


def _parse_c_string_concat(s: str):
    """Parse a line holding one or more adjacent C string literals ending
    in ','; returns the decoded string or None (comments etc.)."""
    s = s.rstrip(",")
    parts = re.findall(r'"((?:[^"\\]|\\.)*)"', s)
    if not parts or not s.lstrip().startswith('"'):
        return None
    return "".join(_c_unescape(p) for p in parts)


_C_ESC = {"n": "\n", "r": "\r", "t": "\t", "\\": "\\", '"': '"', "'": "'",
          "0": "\0", "a": "\a", "b": "\b", "f": "\f", "v": "\v"}


def _c_unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        n = s[i + 1]
        if n in "xuU":
            ln = {"x": 2, "u": 4, "U": 8}[n]
            out.append(chr(int(s[i + 2:i + 2 + ln], 16)))
            i += 2 + ln
        else:
            out.append(_C_ESC[n])
            i += 2
    return "".join(out)


def parse_ref_pre_names() -> dict[str, str]:
    """{tokenizer_pre name -> LLAMA_VOCAB_PRE_TYPE_*} from the name
    detection chain in llama_vocab::impl::load (llama-vocab.cpp:1503+)."""
    src = open(f"{REF}/src/llama-vocab.cpp", encoding="utf-8").read()
    out: dict[str, str] = {}
    pend: list[str] = []
    for line in src.splitlines():
        for nm in re.findall(r'tokenizer_pre == "([^"]+)"', line):
            pend.append(nm)
        am = re.search(r"pre_type = (LLAMA_VOCAB_PRE_TYPE_\w+);", line)
        if am and pend:
            for nm in pend:
                out[nm] = am.group(1)
            pend = []
    return out


def build_shim() -> str:
    if (os.path.exists(SHIM_BIN)
            and os.path.getmtime(SHIM_BIN) >= os.path.getmtime(SHIM_SRC)):
        return SHIM_BIN
    cmd = ["g++", "-O1", "-std=c++17", f"-I{REF}/src", SHIM_SRC,
           f"{REF}/src/unicode.cpp", f"{REF}/src/unicode-data.cpp",
           "-o", SHIM_BIN]
    subprocess.run(cmd, check=True, capture_output=True, timeout=600)
    return SHIM_BIN


class Shim:
    def __init__(self):
        self.proc = subprocess.Popen([build_shim()], stdin=subprocess.PIPE,
                                     stdout=subprocess.PIPE)

    def split(self, text: str, regexes: list[str]) -> list[str]:
        w = self.proc.stdin
        bs = [r.encode() for r in regexes]
        w.write(struct.pack("<I", len(bs)))
        for b in bs:
            w.write(struct.pack("<I", len(b)) + b)
        tb = text.encode()
        w.write(struct.pack("<I", len(tb)) + tb)
        w.flush()
        r = self.proc.stdout
        (np_,) = struct.unpack("<I", r.read(4))
        out = []
        for _ in range(np_):
            (ln,) = struct.unpack("<I", r.read(4))
            out.append(r.read(ln).decode("utf-8", errors="surrogateescape"))
        return out

    def close(self):
        self.proc.stdin.close()
        self.proc.wait(timeout=30)


CORPORA = [
    "Hello World!  it's 2024, isn't it?   I'VE 12345 678 tokens...",
    "def f(x):\n    return x**2  # comment\n\tprint('done')\r\n",
    "你好世界，こんにちは"
    "世界 안녕하세요 123世界",
    "caf\xe9 na\xefve Жизнь αβγ"
    " مرحبا שלום",
    "\U0001f600\U0001f680 emoji \U0001f1fa\U0001f1f8 test ❤️"
    " \U0001f44d\U0001f3fd",
    "  leading  spaces\t\ttabs\n\n\nnewlines   trailing   ",
    "MixedCASE's don'T WE'RE i'll 100,000.50 $99 #hashtag @user",
    "a" * 300 + " " + "一" * 50 + "1234567890" * 3,
    "राजधान สวัสด"
    "ี გამარჯობა",
    "", " ", "\n", "'", "x",
]


def main():
    from ggml_hexagon_tpu.tokenizer.bpe import bytes_to_unicode
    from ggml_hexagon_tpu.tokenizer.pretok import (PRE_TO_SET, REGEX_SETS,
                                                   compiled_set, regex_split)

    # the reference's unicode_regex_split returns BYTE-ENCODED pieces
    # (unicode.cpp:848 tail-calls unicode_byte_encoding_process); our
    # splitter returns raw text and the BPE layer byte-encodes later —
    # apply the same mapping to our pieces before comparing
    b2u = bytes_to_unicode()

    def byte_encode(piece: str) -> str:
        return "".join(b2u[b] for b in piece.encode("utf-8"))

    ref_sets = parse_ref_regex_sets()
    ref_names = parse_ref_pre_names()
    shim = Shim()
    n_fail = 0
    tested = set()
    for name, our_key in sorted(PRE_TO_SET.items()):
        enum = ref_names.get(name)
        if enum is None or enum not in ref_sets:
            print(f"{name:18s} -> no reference regex set ({enum}); skip")
            continue
        if (our_key, enum) in tested:
            continue
        tested.add((our_key, enum))
        pats = compiled_set(name)
        bad = 0
        for text in CORPORA:
            ours = [byte_encode(p) for p in regex_split(text, pats)]
            want = shim.split(text, ref_sets[enum])
            if ours != want:
                bad += 1
                if bad == 1:
                    print(f"  MISMATCH {name} on {text[:40]!r}:")
                    print(f"    ref : {want[:12]}")
                    print(f"    ours: {ours[:12]}")
        status = "OK" if bad == 0 else f"FAIL ({bad}/{len(CORPORA)})"
        print(f"{name:18s} [{our_key:14s}] vs {enum:40s} {status}")
        n_fail += bad > 0
    shim.close()
    print(f"\n{n_fail} regex sets mismatched")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
