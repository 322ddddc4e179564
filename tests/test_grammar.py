"""GBNF grammar + JSON-schema tests (mirror tests/test-grammar-parser.cpp,
test-grammar-integration.cpp, test-json-schema-to-grammar.cpp strategy)."""
import json

import numpy as np
import pytest

from ggml_hexagon_tpu.runtime.grammar import (
    GBNFParser,
    Grammar,
    GrammarParseError,
    GrammarSampler,
    parse_gbnf,
)
from ggml_hexagon_tpu.runtime.json_schema import json_schema_to_gbnf
from ggml_hexagon_tpu.runtime.sampling import Candidates


def accepts(g: Grammar, text: str, end=True) -> bool:
    gg = g.copy()
    if not gg.accept_text(text):
        return False
    return gg.can_end if end else True


def test_literals_and_alternates():
    g = parse_gbnf('root ::= "yes" | "no"')
    assert accepts(g, "yes")
    assert accepts(g, "no")
    assert not accepts(g, "maybe")
    assert not accepts(g, "ye")  # incomplete
    assert accepts(g, "ye", end=False)  # but extensible


def test_char_classes_and_ranges():
    g = parse_gbnf("root ::= [a-z]+ [0-9]{2}")
    assert accepts(g, "abc42")
    assert not accepts(g, "abc4")
    assert not accepts(g, "ABC42")
    g2 = parse_gbnf('root ::= [^x]*')
    assert accepts(g2, "hello")
    assert not accepts(g2, "hex", end=False)


def test_nested_rules_and_repetition():
    g = parse_gbnf(
        """
        root ::= item ("," item)*
        item ::= [a-z]+
        """
    )
    assert accepts(g, "a,bc,def")
    assert not accepts(g, "a,,b", end=False)


def test_repetition_bounds():
    g = parse_gbnf('root ::= "a"{2,4}')
    assert not accepts(g, "a")
    assert accepts(g, "aa")
    assert accepts(g, "aaaa")
    assert not accepts(g, "aaaaa", end=False)


def test_json_grammar_accepts_json():
    g = parse_gbnf(json_schema_to_gbnf({"type": "object", "properties": {
        "name": {"type": "string"}, "age": {"type": "integer"}},
        "required": ["name", "age"]}))
    assert accepts(g, '{ "name" "x"', end=False) is False  # missing colon
    assert accepts(g, '{ "name": "bob", "age": 42 }')
    assert not accepts(g, '{ "age": 42 }', end=False)  # wrong property order/missing


def test_json_schema_enum_and_array():
    gb = json_schema_to_gbnf({"type": "array", "items": {"enum": ["a", "b"]}})
    g = parse_gbnf(gb)
    assert accepts(g, '[ "a", "b", "a" ]'.replace("  ", " ")) or accepts(g, '["a", "b"]')
    assert not accepts(g, '["c"]')


def test_json_schema_anyof():
    g = parse_gbnf(json_schema_to_gbnf({"anyOf": [{"type": "integer"}, {"type": "boolean"}]}))
    assert accepts(g, "42")
    assert accepts(g, "true")
    assert not accepts(g, '"x"')


def test_parse_errors():
    with pytest.raises(GrammarParseError):
        parse_gbnf('foo ::= "no root rule"')
    with pytest.raises(GrammarParseError):
        parse_gbnf('root ::= undefined_rule')
    # empty rule body is legal (matches epsilon)
    g = parse_gbnf('root ::=')
    assert g.can_end
    # left recursion must be detected, not hang
    with pytest.raises(GrammarParseError):
        parse_gbnf('root ::= root "a" | "b"')


def test_grammar_sampler_constrains():
    vocab = ["<unk>", "<s>", "</s>", "yes", "no", "maybe", "y", "es"]
    g = parse_gbnf('root ::= "yes" | "no"')
    s = GrammarSampler(g, vocab, eos_id=2)
    logits = np.array([1.0, 1.0, 5.0, 0.5, 0.2, 9.0, 0.1, 0.0], np.float32)
    c = Candidates(logits.copy())
    s.apply(c)
    # 'maybe' (highest) masked; EOS masked (can't end yet); 'yes' survives
    assert not np.isfinite(c.logits[5])
    assert not np.isfinite(c.logits[2])
    assert np.isfinite(c.logits[3])
    # accept 'y' then only 'es'-compatible tokens remain
    s.accept(6)
    c2 = Candidates(logits.copy())
    s.apply(c2)
    assert np.isfinite(c2.logits[7])  # 'es'
    assert not np.isfinite(c2.logits[4])  # 'no' impossible now
    s.accept(7)
    c3 = Candidates(logits.copy())
    s.apply(c3)
    assert np.isfinite(c3.logits[2])  # EOS now allowed


def test_lazy_grammar_trigger_pattern():
    """Lazy grammars stay inert until a trigger pattern matches the
    generated text, then constrain from the first capture group
    (llama_sampler_init_grammar_lazy_patterns, llama.h:1298-1308;
    accept semantics llama-grammar.cpp:1116-1160)."""
    import numpy as np

    from ggml_hexagon_tpu.runtime.grammar import GrammarSampler, parse_gbnf

    g = parse_gbnf('root ::= "<tool>" [0-9]+ "</tool>"')
    texts = ["hello ", "world", "<tool>", "1", "2", "</tool>", "x"]
    gs = GrammarSampler(g, texts, eos_id=len(texts) - 1, lazy=True,
                        trigger_patterns=[r".*?(<tool>.*)"])

    class Cand:
        def __init__(self, n):
            self.logits = np.zeros(n, np.float32)

    # inert: nothing masked while awaiting the trigger
    c = Cand(len(texts))
    gs.apply(c)
    assert np.isfinite(c.logits).all()
    gs.accept(0)  # "hello "
    gs.accept(1)  # "world"
    assert gs.awaiting_trigger
    gs.accept(2)  # "<tool>" -> pattern matches; grammar fed "<tool>"
    assert not gs.awaiting_trigger
    # now the grammar constrains: only digits legal next
    c = Cand(len(texts))
    gs.apply(c)
    assert np.isfinite(c.logits[3]) and np.isfinite(c.logits[4])
    assert not np.isfinite(c.logits[0])  # "hello " illegal mid-tool-call
    gs.accept(3)
    gs.accept(5)  # "</tool>" completes the grammar
    c = Cand(len(texts))
    gs.apply(c)
    assert np.isfinite(c.logits[len(texts) - 1])  # EOS legal at end


def test_lazy_grammar_trigger_token():
    import numpy as np

    from ggml_hexagon_tpu.runtime.grammar import GrammarSampler, parse_gbnf

    g = parse_gbnf('root ::= "<T>" "a"')
    texts = ["zzz", "<T>", "a"]
    gs = GrammarSampler(g, texts, eos_id=2, lazy=True, trigger_tokens=[1])
    gs.accept(0)
    assert gs.awaiting_trigger
    gs.accept(1)  # trigger token: grammar fed its piece "<T>"
    assert not gs.awaiting_trigger

    class Cand:
        def __init__(self, n):
            self.logits = np.zeros(n, np.float32)

    c = Cand(3)
    gs.apply(c)
    assert np.isfinite(c.logits[2]) and not np.isfinite(c.logits[0])
