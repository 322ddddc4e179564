"""Unigram tokenizer (T5 family) — llm_tokenizer_ugm analog
(src/llama-vocab.cpp:733): Viterbi segmentation maximizing the sum of piece
log-probabilities (the GGUF scores), with an unknown-token penalty for
uncovered characters.  Whitespace is escaped to U+2581 like SPM.
(The reference additionally applies a precompiled_charsmap normalization
blob when present; plain NFKC-style passthrough here.)
"""
from __future__ import annotations

import math

from .vocab import Vocab

SPACE_ESC = "▁"
UNKNOWN_PENALTY = 10.0


class UGMTokenizer:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        self.max_piece = max((len(t) for t in vocab.tokens), default=1)
        # min score used to derive the unknown-char penalty (ugm reference)
        scores = [s for s in vocab.scores if s != 0.0]
        self.min_score = min(scores) if scores else -10.0

    def encode(self, text: str, add_bos: bool | None = None, add_eos: bool | None = None) -> list[int]:
        v = self.vocab
        ids: list[int] = []
        if add_bos if add_bos is not None else v.add_bos:
            if v.bos_id >= 0:
                ids.append(v.bos_id)
        if text:
            if v.add_space_prefix:
                text = " " + text
            text = text.replace(" ", SPACE_ESC)
            ids.extend(self._viterbi(text))
        if add_eos if add_eos is not None else v.add_eos:
            if v.eos_id >= 0:
                ids.append(v.eos_id)
        return ids

    def _viterbi(self, text: str) -> list[int]:
        n = len(text)
        NEG = -1e30
        best = [NEG] * (n + 1)
        back: list[tuple[int, int] | None] = [None] * (n + 1)
        best[0] = 0.0
        unk_score = self.min_score - UNKNOWN_PENALTY
        for i in range(n):
            if best[i] == NEG:
                continue
            for j in range(i + 1, min(n, i + self.max_piece) + 1):
                tid = self.vocab.by_text.get(text[i:j])
                if tid is not None and not self.vocab.is_control(tid):
                    s = best[i] + self.vocab.scores[tid]
                    if s > best[j]:
                        best[j] = s
                        back[j] = (i, tid)
            # unknown single char fallback
            s = best[i] + unk_score
            if s > best[i + 1]:
                best[i + 1] = s
                back[i + 1] = (i, self.vocab.unk_id)
        # backtrack
        out: list[int] = []
        pos = n
        while pos > 0:
            i, tid = back[pos]
            out.append(tid)
            pos = i
        return out[::-1]

    def decode(self, ids: list[int], skip_special: bool = True) -> str:
        v = self.vocab
        parts = []
        for tid in ids:
            if skip_special and (tid in (v.bos_id, v.eos_id) or v.is_control(tid)):
                continue
            parts.append(v.tokens[tid])
        s = "".join(parts).replace(SPACE_ESC, " ")
        return s[1:] if v.add_space_prefix and s.startswith(" ") else s
