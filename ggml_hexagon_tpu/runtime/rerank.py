"""Cross-encoder reranking (llama-server /rerank analog).

Mirrors the reference's rerank task: each (query, document) pair is encoded
as one sequence — [BOS]query[EOS][SEP]doc[EOS] (format_rerank,
examples/server/utils.hpp:258) — run through the encoder, and scored by
RANK pooling: the CLS-token hidden state through the classification head
tanh(cls . h + b) with an optional cls.output projection
(build_pooling LLAMA_POOLING_TYPE_RANK, src/llama-graph.cpp:1596).
"""
from __future__ import annotations

import numpy as np

from ..models.bert import forward_bert, pool_bert


def format_rerank(md: dict, query_ids: list, doc_ids: list) -> list:
    """[BOS]query[EOS][SEP]doc[EOS] token layout (utils.hpp:258)."""
    def tid(key, default):
        v = md.get(key)
        return int(v) if v is not None else default

    bos = tid("tokenizer.ggml.bos_token_id", 1)
    eos = tid("tokenizer.ggml.eos_token_id", 2)
    # the reference GGUF key really is spelled "seperator"
    sep = tid("tokenizer.ggml.seperator_token_id", eos)
    return [bos, *query_ids, eos, sep, *doc_ids, eos]


def rerank_scores(cfg, weights, pair_token_lists, compute_dtype=None) -> np.ndarray:
    """Score each tokenized (query+doc) sequence -> [n] float relevance.

    Sequences are right-padded into one batch with an attention mask, so one
    forward pass scores all documents (batch rides the MXU instead of a
    per-doc loop).
    """
    import jax.numpy as jnp

    if compute_dtype is None:
        compute_dtype = jnp.float32
    n = len(pair_token_lists)
    T = max(len(t) for t in pair_token_lists)
    toks = np.zeros((n, T), np.int32)
    mask = np.zeros((n, T), np.float32)
    for i, ids in enumerate(pair_token_lists):
        toks[i, : len(ids)] = ids
        mask[i, : len(ids)] = 1.0
    h = forward_bert(cfg, weights, jnp.asarray(toks), jnp.asarray(mask),
                     compute_dtype=compute_dtype)
    scores = pool_bert(cfg, weights, h, attn_mask=mask, pooling="rank")
    return np.asarray(scores, np.float32)[:, 0]


def rerank(cfg, weights, md: dict, tokenizer, query: str,
           documents: list) -> list:
    """query + docs -> [{'index': i, 'relevance_score': s}], best first kept
    in input order (the reference returns input order; clients sort)."""
    q_ids = tokenizer.encode(query, add_bos=False)
    pairs = [
        format_rerank(md, q_ids, tokenizer.encode(d, add_bos=False))
        for d in documents
    ]
    scores = rerank_scores(cfg, weights, pairs)
    return [
        {"index": i, "relevance_score": float(s),
         "tokens_evaluated": len(pairs[i])}
        for i, s in enumerate(scores)
    ]
