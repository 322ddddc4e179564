"""Quality evaluation: perplexity, KL-divergence, imatrix collection.

Perplexity follows the reference protocol exactly (SURVEY §A.6,
examples/perplexity/perplexity.cpp:460-650): the corpus is split into
non-overlapping n_ctx chunks, BOS replaces each chunk's first token, and
NLL is accumulated only over the second half of each window; ppl =
exp(Σnll/n) with variance from Σnll².  This is the parity harness against
llama.cpp's published numbers (BASELINE.md).

KL-divergence mode mirrors the --kl-divergence flow: a base run stores
log-probs; the quantized run compares distributions per position.

imatrix accumulates per-input-column Σx² and counts for every quantized
matmul (examples/imatrix/imatrix.cpp:72-201) via the forward tap hook.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import forward, init_kv_cache


@dataclass
class PerplexityResult:
    ppl: float
    err: float  # standard error of ln(ppl)
    nll_sum: float
    nll_count: int
    chunk_ppls: list = field(default_factory=list)

    def __str__(self):
        return f"PPL = {self.ppl:.4f} +/- {self.ppl*self.err:.4f}"


def _chunk_logprobs(cfg, weights, chunk_ids, compute_dtype):
    """Token logprobs for one chunk: returns [T-1] logprob of each next token."""
    T = len(chunk_ids)
    kv = init_kv_cache(cfg, 1, T, dtype=compute_dtype)
    f = jax.jit(
        partial(forward, cfg, compute_dtype=compute_dtype), static_argnames=("logits_all",)
    )
    logits, _ = f(weights, jnp.asarray(np.asarray(chunk_ids, np.int32)[None]), kv,
                  jnp.int32(0), logits_all=True)
    lp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
    nxt = jnp.asarray(np.asarray(chunk_ids[1:], np.int32))
    return np.asarray(jnp.take_along_axis(lp[:-1], nxt[:, None], axis=1)[:, 0]), np.asarray(lp)


def perplexity(
    cfg, weights, tokens, n_ctx: int = 512, bos_id: int | None = 1,
    compute_dtype=jnp.bfloat16, progress=None,
) -> PerplexityResult:
    tokens = list(tokens)
    n_chunk = len(tokens) // n_ctx
    assert n_chunk >= 1, f"need >= {n_ctx} tokens, have {len(tokens)}"
    first = n_ctx // 2
    nll = 0.0
    nll2 = 0.0
    count = 0
    chunk_ppls = []
    for c in range(n_chunk):
        chunk = tokens[c * n_ctx : (c + 1) * n_ctx]
        if bos_id is not None:
            chunk = [bos_id] + chunk[:-1]  # BOS replaces first (ppl.cpp:508)
        lps, _ = _chunk_logprobs(cfg, weights, chunk, compute_dtype)
        # predict positions first..n_ctx-1 (logits index j predicts token j+1)
        sel = lps[first - 1 :] if bos_id is None else lps[first - 1 :]
        for v in sel:
            nll += -float(v)
            nll2 += float(v) * float(v)
            count += 1
        chunk_ppls.append(math.exp(nll / count))
        if progress:
            progress(c + 1, n_chunk, chunk_ppls[-1])
    mean = nll / count
    var = nll2 / count - mean * mean
    err = math.sqrt(max(var, 0.0) / count)
    return PerplexityResult(math.exp(mean), err, nll, count, chunk_ppls)


def kl_divergence(
    cfg_base, weights_base, cfg_test, weights_test, tokens, n_ctx: int = 512,
    bos_id: int | None = 1, compute_dtype=jnp.bfloat16,
) -> dict:
    """Mean KL(base || test) per token + same-top-1 rate."""
    tokens = list(tokens)
    n_chunk = len(tokens) // n_ctx
    kls = []
    same_top = 0
    total = 0
    for c in range(n_chunk):
        chunk = tokens[c * n_ctx : (c + 1) * n_ctx]
        if bos_id is not None:
            chunk = [bos_id] + chunk[:-1]
        _, lp_b = _chunk_logprobs(cfg_base, weights_base, chunk, compute_dtype)
        _, lp_t = _chunk_logprobs(cfg_test, weights_test, chunk, compute_dtype)
        p_b = np.exp(lp_b)
        kl = (p_b * (lp_b - lp_t)).sum(axis=-1)
        kls.extend(kl.tolist())
        same_top += int((lp_b.argmax(-1) == lp_t.argmax(-1)).sum())
        total += lp_b.shape[0]
    kls = np.asarray(kls)
    return {
        "kld_mean": float(kls.mean()),
        "kld_max": float(kls.max()),
        "same_top1": same_top / total,
        "n": total,
    }


class IMatrixCollector:
    """Accumulates per-column Σx² for each quantized matmul input."""

    def __init__(self, cfg, weights, compute_dtype=jnp.bfloat16):
        self.cfg = cfg
        self.weights = weights
        self.sums: dict[str, np.ndarray] = {}
        self.counts: dict[str, int] = {}
        self.compute_dtype = compute_dtype
        self._fwd = None

    def _build(self, T: int):
        cfg, cd = self.cfg, self.compute_dtype

        def run(weights, tokens, kv):
            taps = {}

            def tap(name, x):
                if name.endswith(".l_out"):  # layer states are for cvector, not imatrix
                    return
                x2 = (x.astype(jnp.float32) ** 2).reshape(-1, x.shape[-1]).sum(axis=0)
                taps[name] = taps.get(name, 0) + x2

            logits, _ = forward(cfg, weights, tokens, kv, jnp.int32(0),
                                logits_all=True, compute_dtype=cd, tap=tap)
            return taps

        return jax.jit(run)

    def process_chunk(self, chunk_ids):
        T = len(chunk_ids)
        if self._fwd is None:
            self._fwd = self._build(T)
        kv = init_kv_cache(self.cfg, 1, T, dtype=self.compute_dtype)
        taps = self._fwd(self.weights, jnp.asarray(np.asarray(chunk_ids, np.int32)[None]), kv)
        for name, s in taps.items():
            s = np.array(s)  # writable copy (np.asarray of a jax array is read-only)
            if name in self.sums:
                self.sums[name] += s
                self.counts[name] += T
            else:
                self.sums[name] = s
                self.counts[name] = T

    def result(self) -> dict[str, np.ndarray]:
        """name -> mean x² per column (what quantize feeds as quant_weights)."""
        return {n: self.sums[n] / max(1, self.counts[n]) for n in self.sums}

    def save(self, path: str):
        np.savez(path, **{n: v for n, v in self.result().items()},
                 **{f"__count__{n}": np.int64(c) for n, c in self.counts.items()})

    @staticmethod
    def load(path: str) -> dict[str, np.ndarray]:
        z = np.load(path)
        return {n: z[n] for n in z.files if not n.startswith("__count__")}
