"""WordPiece tokenizer (BERT family) — llm_tokenizer_wpm analog
(src/llama-vocab.cpp:617): lowercase + accent-strip normalization,
punctuation/CJK splitting, then greedy longest-match with "##" continuation
pieces; words with no match become [UNK].
"""
from __future__ import annotations

import unicodedata

from .vocab import Vocab


def _is_punct(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return (
        0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF or 0xF900 <= cp <= 0xFAFF
    )


class WPMTokenizer:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        self.unk = vocab.by_text.get("[UNK]", vocab.unk_id)
        self.cls = vocab.by_text.get("[CLS]")
        self.sep = vocab.by_text.get("[SEP]")
        self.max_word = 128

    def _normalize(self, text: str) -> list[str]:
        """Returns whitespace-split 'words' after BERT basic normalization."""
        out = []
        for ch in unicodedata.normalize("NFD", text.lower()):
            if unicodedata.category(ch) == "Mn":  # strip accents
                continue
            if _is_punct(ch) or _is_cjk(ch):
                out.append(" ")
                out.append(ch)
                out.append(" ")
            elif ch.isspace() or unicodedata.category(ch).startswith("C"):
                out.append(" ")
            else:
                out.append(ch)
        return "".join(out).split()

    def encode(self, text: str, add_bos: bool | None = None, add_eos: bool | None = None) -> list[int]:
        v = self.vocab
        ids: list[int] = []
        if (add_bos if add_bos is not None else v.add_bos) and self.cls is not None:
            ids.append(self.cls)
        for word in self._normalize(text):
            if len(word) > self.max_word:
                ids.append(self.unk)
                continue
            pieces: list[int] = []
            start = 0
            ok = True
            while start < len(word):
                end = len(word)
                tid = None
                while end > start:
                    sub = word[start:end]
                    if start > 0:
                        sub = "##" + sub
                    tid = v.by_text.get(sub)
                    if tid is not None:
                        break
                    end -= 1
                if tid is None:
                    ok = False
                    break
                pieces.append(tid)
                start = end
            ids.extend(pieces if ok else [self.unk])
        if (add_eos if add_eos is not None else v.add_eos) and self.sep is not None:
            ids.append(self.sep)
        return ids

    def decode(self, ids: list[int], skip_special: bool = True) -> str:
        v = self.vocab
        out = []
        for tid in ids:
            t = v.tokens[tid]
            if skip_special and (t.startswith("[") and t.endswith("]")):
                continue
            if t.startswith("##"):
                out.append(t[2:])
            else:
                if out:
                    out.append(" ")
                out.append(t)
        return "".join(out)
