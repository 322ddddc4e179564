"""Benchmark-scoring protocol tests (hellaswag / winogrande / MMLU-class;
reference: examples/perplexity/perplexity.cpp hellaswag_score /
winogrande_score / multiple_choice_score).

The decision rule (mean logprob over tokens past the common prefix,
argmax over candidates) is verified against an independently computed
oracle on a tiny random model."""
import json

import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.runtime.evaluate import (
    _chunk_logprobs, _common_prefix, hellaswag, multiple_choice,
    parse_hellaswag, parse_winogrande_csv, score_choice_tasks, winogrande)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


class ByteTok:
    """Deterministic toy tokenizer: one id per character (+BOS=1)."""

    def encode(self, text, add_bos=True, **kw):
        ids = [2 + (ord(c) % 250) for c in text]
        return ([1] + ids) if add_bos else ids


@pytest.fixture(scope="module")
def tiny():
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(3)
    m = transformers.LlamaForCausalLM(cfg)
    from ggml_hexagon_tpu.gguf import GGUFReader
    from ggml_hexagon_tpu.models.convert_hf import convert_hf_llama
    from ggml_hexagon_tpu.models.llama import load_llama_weights
    from ggml_hexagon_tpu.quant.formats import GGMLType
    import tempfile, os

    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "t.gguf")
        convert_hf_llama(sd, cfg, p, qtype=GGMLType.F32)
        with GGUFReader.open(p) as r:
            return load_llama_weights(r, dtype=jnp.float32)


def test_parse_hellaswag():
    lines = []
    for t in range(3):
        lines += [f"ctx {t}", str(t % 4), "e0", "e1", "e2", "e3"]
    tasks = parse_hellaswag("\n".join(lines))
    assert len(tasks) == 3 and tasks[1] == ("ctx 1", ["e0", "e1", "e2", "e3"], 1)
    assert len(parse_hellaswag("\n".join(lines), n_tasks=2)) == 2


def test_parse_winogrande_csv():
    csv = ('0,"Sarah was better than Maria, so _ won.",Sarah,Maria,1\n'
           "1,The cup broke because _ was fragile.,the cup,the table,1\n")
    rows = parse_winogrande_csv(csv)
    assert len(rows) == 2
    first, second, c1, c2, ans = rows[0]
    assert first.endswith("so ") and second == " won." and ans == 1
    assert (c1, c2) == ("Sarah", "Maria")


def _oracle_choice(cfg, weights, tok, context, cands):
    seqs = [tok.encode(context + " " + c) for c in cands]
    cp = _common_prefix(seqs)
    scores = []
    for s in seqs:
        lps, _ = _chunk_logprobs(cfg, weights, s, jnp.float32)
        scores.append(float(np.sum(lps[cp - 1 : len(s) - 1])) / (len(s) - cp))
    return int(np.argmax(scores))


def test_score_choice_matches_oracle(tiny):
    cfg, weights = tiny
    tok = ByteTok()
    tasks = [("the cat sat", ["on a mat", "под столом", "qq", "zebra!"], 0),
             ("one two", ["three", "four", "five six seven", "8"], 2)]
    # gold set to the ORACLE's decision -> accuracy must be 100%
    gold = [_oracle_choice(cfg, weights, tok, c, cands)
            for c, cands, _ in tasks]
    tasks = [(c, cands, g) for (c, cands, _), g in zip(tasks, gold)]
    res = score_choice_tasks(cfg, weights, tasks, tok,
                             compute_dtype=jnp.float32)
    assert res.n_done == 2 and res.n_correct == 2
    # and flipping the gold breaks it
    tasks_bad = [(c, cands, (g + 1) % 4) for (c, cands, g) in tasks]
    res2 = score_choice_tasks(cfg, weights, tasks_bad, tok,
                              compute_dtype=jnp.float32)
    assert res2.n_correct == 0


def test_hellaswag_end_to_end(tiny):
    cfg, weights = tiny
    tok = ByteTok()
    lines = []
    for t in range(2):
        lines += [f"context {t}", "1", "aa bb", "cc dd", "ee ff", "gg hh"]
    res = hellaswag(cfg, weights, "\n".join(lines), tok,
                    compute_dtype=jnp.float32)
    assert res.n_done == 2 and 0 <= res.n_correct <= 2
    # deterministic
    res2 = hellaswag(cfg, weights, "\n".join(lines), tok,
                     compute_dtype=jnp.float32)
    assert res2.n_correct == res.n_correct


def test_winogrande_end_to_end(tiny):
    cfg, weights = tiny
    tok = ByteTok()
    csv = ("0,Alice gave Bob a book because _ was generous.,Alice,Bob,1\n"
           "1,The ball hit the window and _ broke.,the ball,the window,2\n")
    res = winogrande(cfg, weights, csv, tok, compute_dtype=jnp.float32)
    assert res.n_done == 2


def test_multiple_choice_json(tiny):
    cfg, weights = tiny
    tok = ByteTok()
    tasks = [{"question": "2+2=", "answers": ["4", "5", "22"], "label": 0},
             {"question": "capital of france:",
              "answers": ["paris", "rome"], "label": 0}]
    res = multiple_choice(cfg, weights, json.dumps(tasks), tok,
                          compute_dtype=jnp.float32)
    assert res.n_done == 2
