"""Vocabulary loaded from GGUF metadata.

Mirrors the data model of the reference's llama_vocab (src/llama-vocab.cpp):
token texts + scores + type flags, special token ids, tokenizer-model
selection ('llama' -> SPM, 'gpt2' -> byte-level BPE).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from enum import IntEnum


class TokenType(IntEnum):  # gguf token_type values
    UNDEFINED = 0
    NORMAL = 1
    UNKNOWN = 2
    CONTROL = 3
    USER_DEFINED = 4
    UNUSED = 5
    BYTE = 6


@dataclass
class Vocab:
    tokens: list[str]
    scores: list[float]
    token_types: list[int]
    model: str = "llama"  # 'llama' (SPM) | 'gpt2' (BPE)
    pre: str = "default"  # BPE pre-tokenizer variant
    merges: list[str] = field(default_factory=list)
    bos_id: int = 1
    eos_id: int = 2
    unk_id: int = 0
    pad_id: int = -1
    add_bos: bool = True
    add_eos: bool = False
    add_space_prefix: bool = True
    by_text: dict = field(default_factory=dict)

    def __post_init__(self):
        if not self.by_text:
            self.by_text = {t: i for i, t in enumerate(self.tokens)}

    @property
    def n_tokens(self) -> int:
        return len(self.tokens)

    def is_control(self, tid: int) -> bool:
        return self.token_types[tid] == TokenType.CONTROL

    def is_byte(self, tid: int) -> bool:
        return self.token_types[tid] == TokenType.BYTE

    @classmethod
    def from_gguf(cls, md: dict) -> "Vocab":
        tokens = md.get("tokenizer.ggml.tokens", [])
        n = len(tokens)
        return cls(
            tokens=tokens,
            scores=md.get("tokenizer.ggml.scores", [0.0] * n),
            token_types=md.get("tokenizer.ggml.token_type", [TokenType.NORMAL] * n),
            model=md.get("tokenizer.ggml.model", "llama"),
            pre=md.get("tokenizer.ggml.pre", "default"),
            merges=md.get("tokenizer.ggml.merges", []),
            bos_id=int(md.get("tokenizer.ggml.bos_token_id", 1)),
            eos_id=int(md.get("tokenizer.ggml.eos_token_id", 2)),
            unk_id=int(md.get("tokenizer.ggml.unknown_token_id", 0)),
            pad_id=int(md.get("tokenizer.ggml.padding_token_id", -1)),
            add_bos=bool(md.get("tokenizer.ggml.add_bos_token", True)),
            add_eos=bool(md.get("tokenizer.ggml.add_eos_token", False)),
            add_space_prefix=bool(md.get("tokenizer.ggml.add_space_prefix", True)),
        )


def build_tokenizer(vocab: Vocab):
    from .bpe import BPETokenizer
    from .spm import SPMTokenizer
    from .ugm import UGMTokenizer
    from .wpm import WPMTokenizer

    if vocab.model in ("llama", "spm"):
        return SPMTokenizer(vocab)
    if vocab.model in ("gpt2", "bpe"):
        return BPETokenizer(vocab)
    if vocab.model in ("bert", "wpm"):
        return WPMTokenizer(vocab)
    if vocab.model in ("t5", "ugm", "unigram"):
        return UGMTokenizer(vocab)
    if vocab.model == "rwkv":
        from .rwkv import RWKVTokenizer

        return RWKVTokenizer(vocab)
    raise NotImplementedError(f"tokenizer model {vocab.model!r}")
