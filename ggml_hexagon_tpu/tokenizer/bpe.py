"""Byte-level BPE tokenizer (GPT-2 family).

Mirrors the reference's llm_tokenizer_bpe (src/llama-vocab.cpp:276): regex
pre-tokenization (variant chosen by tokenizer.ggml.pre), GPT-2 byte->unicode
mapping, then lowest-rank-first pair merging using tokenizer.ggml.merges.
Only the most common pre-tokenizer variants are implemented; unknown ones
fall back to the GPT-2 default pattern (matching the reference's warning +
default behavior).
"""
from __future__ import annotations

import regex as _re

from .vocab import Vocab

# GPT-2 default pre-tokenizer regex
_GPT2_PAT = _re.compile(
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
)
# llama-3 pattern (llama-vocab.cpp pre-type LLAMA3)
_LLAMA3_PAT = _re.compile(
    r"""(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"""
)

_PATTERNS = {
    "default": _GPT2_PAT,
    "gpt-2": _GPT2_PAT,
    "llama3": _LLAMA3_PAT,
    "llama-v3": _LLAMA3_PAT,
    "llama-bpe": _LLAMA3_PAT,
}


def bytes_to_unicode() -> dict[int, str]:
    bs = list(range(ord("!"), ord("~") + 1)) + list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


_B2U = bytes_to_unicode()
_U2B = {v: k for k, v in _B2U.items()}


class BPETokenizer:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        self.pat = _PATTERNS.get(vocab.pre, _GPT2_PAT)
        self.ranks = {tuple(m.split(" ", 1)): i for i, m in enumerate(vocab.merges)}

    def _bpe_word(self, word: str) -> list[str]:
        parts = list(word)
        if len(parts) < 2:
            return parts
        while True:
            best = None
            best_rank = None
            for i in range(len(parts) - 1):
                r = self.ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                return parts
            parts = parts[:best] + [parts[best] + parts[best + 1]] + parts[best + 2 :]

    def encode(self, text: str, add_bos: bool | None = None, add_eos: bool | None = None) -> list[int]:
        v = self.vocab
        out: list[int] = []
        if (add_bos if add_bos is not None else v.add_bos) and v.bos_id >= 0:
            out.append(v.bos_id)
        for frag in self.pat.findall(text):
            mapped = "".join(_B2U[b] for b in frag.encode("utf-8"))
            for piece in self._bpe_word(mapped):
                tid = v.by_text.get(piece)
                if tid is not None:
                    out.append(tid)
                else:  # unmergeable: emit per-char (reference falls back likewise)
                    for ch in piece:
                        t = v.by_text.get(ch)
                        if t is not None:
                            out.append(t)
        if (add_eos if add_eos is not None else v.add_eos) and v.eos_id >= 0:
            out.append(v.eos_id)
        return out

    def decode(self, ids: list[int], skip_special: bool = True) -> str:
        v = self.vocab
        buf = bytearray()
        for tid in ids:
            if skip_special and (tid in (v.bos_id, v.eos_id) or v.is_control(tid)):
                continue
            for ch in v.tokens[tid]:
                b = _U2B.get(ch)
                if b is not None:
                    buf.append(b)
                else:
                    buf.extend(ch.encode("utf-8"))
        return buf.decode("utf-8", errors="replace")
