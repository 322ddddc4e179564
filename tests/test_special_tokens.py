"""Special-token partitioning tests (tokenizer_st_partition,
/root/reference/src/llama-vocab.cpp:2193-2309): chat-template markers must
encode to their single control ids when parse_special=True, USER_DEFINED
tokens partition even when parse_special=False, and LSTRIP/RSTRIP attrs
eat adjacent whitespace (the phi-3 behavior)."""
import pytest

from ggml_hexagon_tpu.tokenizer import Vocab, build_tokenizer
from ggml_hexagon_tpu.tokenizer.vocab import TokenType


def _bpe_vocab(extra=(), extra_types=()):
    # ASCII single-char tokens + merges for "he" "ll" "llo" etc.
    base = [chr(c) for c in range(ord("!"), ord("~") + 1)] + ["Ġ"]
    toks = base + list(extra)
    types = [int(TokenType.NORMAL)] * len(base) + [int(t) for t in extra_types]
    return Vocab(
        tokens=toks, scores=[0.0] * len(toks), token_types=types,
        model="gpt2", pre="llama3", merges=[], bos_id=-1, eos_id=-1,
        add_bos=False, add_eos=False,
    )


def test_control_token_parsed_only_with_parse_special():
    v = _bpe_vocab(["<|start_header_id|>", "<|end_header_id|>"],
                   [TokenType.CONTROL, TokenType.CONTROL])
    tok = build_tokenizer(v)
    sid = v.by_text["<|start_header_id|>"]
    eid = v.by_text["<|end_header_id|>"]
    ids = tok.encode("<|start_header_id|>user<|end_header_id|>",
                     parse_special=True)
    assert ids[0] == sid and ids[-1] == eid
    assert [v.tokens[i] for i in ids[1:-1]] == ["u", "s", "e", "r"]
    # parse_special=False: control markers tokenize as plain text
    ids2 = tok.encode("<|start_header_id|>", parse_special=False)
    assert sid not in ids2 and len(ids2) > 1


def test_user_defined_partitioned_without_parse_special():
    v = _bpe_vocab(["<extra_tok>"], [TokenType.USER_DEFINED])
    tok = build_tokenizer(v)
    uid = v.by_text["<extra_tok>"]
    ids = tok.encode("a<extra_tok>b", parse_special=False)
    assert ids == [v.by_text["a"], uid, v.by_text["b"]]


def test_longest_special_wins():
    # cache is sorted longest-first: "<|eot|>x" must win over "<|eot|>"
    v = _bpe_vocab(["<|eot|>", "<|eot|>x"],
                   [TokenType.CONTROL, TokenType.CONTROL])
    tok = build_tokenizer(v)
    long_id = v.by_text["<|eot|>x"]
    ids = tok.encode("<|eot|>x", parse_special=True)
    assert ids == [long_id]


def test_rstrip_eats_following_whitespace():
    v = _bpe_vocab(["<|end|>"], [TokenType.CONTROL])
    v.rstrip_ids.add(v.by_text["<|end|>"])
    tok = build_tokenizer(v)
    ids = tok.encode("a<|end|>   b", parse_special=True)
    assert ids == [v.by_text["a"], v.by_text["<|end|>"], v.by_text["b"]]


def test_lstrip_eats_preceding_whitespace():
    v = _bpe_vocab(["<mask>"], [TokenType.USER_DEFINED])
    v.lstrip_ids.add(v.by_text["<mask>"])
    tok = build_tokenizer(v)
    ids = tok.encode("a  <mask>", parse_special=True)
    assert ids == [v.by_text["a"], v.by_text["<mask>"]]


def test_spm_space_prefix_after_special():
    # SPM: a raw fragment following a special token gets the space prefix
    # again (is_prev_special, llama-vocab.cpp:2377-2407)
    toks = ["<unk>", "<s>", "</s>", "▁", "▁a", "a", "b", "▁b", "<|x|>"]
    types = [int(TokenType.NORMAL)] * 8 + [int(TokenType.CONTROL)]
    v = Vocab(tokens=toks, scores=[0.0] * 9, token_types=types,
              model="llama", bos_id=1, eos_id=2, unk_id=0,
              add_bos=False, add_eos=False, add_space_prefix=True)
    tok = build_tokenizer(v)
    ids = tok.encode("a<|x|>b", parse_special=True)
    texts = [v.tokens[i] for i in ids]
    assert texts == ["▁a", "<|x|>", "▁b"]


def test_phi3_rstrip_from_gguf_metadata():
    md = {
        "general.name": "Phi-3-mini",
        "tokenizer.ggml.model": "llama",
        "tokenizer.ggml.tokens": ["<unk>", "<s>", "</s>", "▁a", "a",
                                  "<|end|>", "▁"],
        "tokenizer.ggml.scores": [0.0] * 7,
        "tokenizer.ggml.token_type": [
            int(TokenType.UNKNOWN), int(TokenType.CONTROL),
            int(TokenType.CONTROL), int(TokenType.NORMAL),
            int(TokenType.NORMAL), int(TokenType.CONTROL),
            int(TokenType.NORMAL)],
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
        "tokenizer.ggml.unknown_token_id": 0,
        "tokenizer.ggml.add_bos_token": False,
    }
    v = Vocab.from_gguf(md)
    assert v.by_text["<|end|>"] in v.rstrip_ids
    assert v.by_text["</s>"] in v.rstrip_ids
    assert v.by_text["<s>"] not in v.rstrip_ids
    tok = build_tokenizer(v)
    ids = tok.encode("a<|end|>\n a", parse_special=True)
    texts = [v.tokens[i] for i in ids]
    # the newline+space after <|end|> is consumed by RSTRIP; the following
    # fragment re-acquires the SPM space prefix
    assert texts == ["▁a", "<|end|>", "▁a"]
