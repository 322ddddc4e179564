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
    # exact reference protocol (perplexity.cpp:460-650, verified
    # token-for-token against a CPU build via tools/parity.py):
    # the corpus stream carries ONE leading BOS; each n_ctx chunk is
    # evaluated with its first token REPLACED by BOS (original restored
    # for the next chunk's stream), and NLL covers chunk positions
    # first+1 .. n_ctx-1 (n_ctx - 1 - first targets per chunk)
    tokens = ([bos_id] + list(tokens)) if bos_id is not None else list(tokens)
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
            chunk = [bos_id] + chunk[1:]
        lps, _ = _chunk_logprobs(cfg, weights, chunk, compute_dtype)
        # lps[j] scores chunk[j+1]; targets are positions first+1..n_ctx-1
        sel = lps[first:]
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
    """Accumulates per-column Σx² for each quantized matmul input.

    Expert (MUL_MAT_ID) tensors accumulate PER-EXPERT slices: entry shape
    [E, C] with per-expert routed-token counts, stored expert-major
    [E*C] — the reference's format (imatrix.cpp:104-169: e.values of size
    ne[0]*n_as, counts incremented only for routed tokens)."""

    def __init__(self, cfg, weights, compute_dtype=jnp.bfloat16):
        self.cfg = cfg
        self.weights = weights
        self.sums: dict[str, np.ndarray] = {}
        self.counts: dict = {}  # name -> int (dense) | np.ndarray [E] (MoE)
        self.compute_dtype = compute_dtype
        self._fwd = None

    def _build(self, T: int):
        cfg, cd = self.cfg, self.compute_dtype

        def run(weights, tokens, kv):
            taps = {}
            ecnt = {}  # expert entries: per-expert routed-token counts

            def tap(name, x, expert=None):
                if name.endswith(".l_out"):  # layer states are for cvector, not imatrix
                    return
                xf = x.astype(jnp.float32)
                C = x.shape[-1]
                if expert is None:
                    x2 = (xf ** 2).reshape(-1, C).sum(axis=0)
                    taps[name] = taps.get(name, 0) + x2
                    return
                e, E, sel = expert
                selr = sel.astype(jnp.float32).reshape(-1)
                x2 = ((xf ** 2).reshape(-1, C) * selr[:, None]).sum(axis=0)
                if name not in taps:
                    taps[name] = jnp.zeros((E, C), jnp.float32)
                    ecnt[name] = jnp.zeros((E,), jnp.float32)
                taps[name] = taps[name].at[e].add(x2)
                ecnt[name] = ecnt[name].at[e].add(selr.sum())

            logits, _ = forward(cfg, weights, tokens, kv, jnp.int32(0),
                                logits_all=True, compute_dtype=cd, tap=tap)
            return taps, ecnt

        return jax.jit(run)

    def process_chunk(self, chunk_ids):
        T = len(chunk_ids)
        if self._fwd is None:
            self._fwd = self._build(T)
        kv = init_kv_cache(self.cfg, 1, T, dtype=self.compute_dtype)
        taps, ecnt = self._fwd(
            self.weights,
            jnp.asarray(np.asarray(chunk_ids, np.int32)[None]), kv)
        for name, s in taps.items():
            s = np.array(s)  # writable copy (np.asarray of a jax array is read-only)
            c = np.array(ecnt[name]) if name in ecnt else T
            if name in self.sums:
                self.sums[name] += s
                self.counts[name] += c
            else:
                self.sums[name] = s
                self.counts[name] = c

    def result(self) -> dict[str, np.ndarray]:
        """name -> mean x² per column (what quantize feeds as
        quant_weights); expert entries flatten expert-major [E*C]."""
        out = {}
        for n, s in self.sums.items():
            c = self.counts[n]
            if isinstance(c, np.ndarray):  # per-expert [E] counts
                out[n] = (s / np.maximum(c, 1.0)[:, None]).reshape(-1)
            else:
                out[n] = s / max(1, c)
        return out

    def save(self, path: str):
        np.savez(path, **{n: v for n, v in self.result().items()},
                 **{f"__count__{n}": np.asarray(c) for n, c in self.counts.items()})

    @staticmethod
    def load(path: str) -> dict[str, np.ndarray]:
        z = np.load(path)
        return {n: z[n] for n in z.files if not n.startswith("__count__")}


# ---------------------------------------------------------------------------
# Multiple-choice benchmark scoring (HellaSwag / Winogrande / MMLU-class)
# ---------------------------------------------------------------------------
# Reference protocols: examples/perplexity/perplexity.cpp —
# hellaswag_score (:741-997), winogrande_score (:1084-1292),
# multiple_choice_score (:1388-1669).  Each candidate continuation is
# scored by the MEAN token log-probability of its tokens past the common
# prefix (the first continuation token is scored from the last prefix
# logit); the candidate with the maximum mean wins.  We evaluate each
# candidate sequence with an independent full forward (identical scores;
# the reference's shared-prefix multi-sequence batch is a throughput
# optimization, not a scoring difference).


@dataclass
class ScoreResult:
    n_done: int
    n_correct: int

    @property
    def acc(self) -> float:
        return self.n_correct / self.n_done if self.n_done else 0.0

    @property
    def sigma(self) -> float:
        """100 * sqrt(p(1-p)/(n-1)) — the reference's reported error."""
        if self.n_done < 2:
            return 0.0
        p = self.acc
        return 100.0 * math.sqrt(p * (1 - p) / (self.n_done - 1))

    def __str__(self):
        return f"{100*self.acc:.4f} +/- {self.sigma:.4f} ({self.n_done} tasks)"


def _seq_logprobs(cfg, weights, ids, compute_dtype):
    """Full-sequence next-token logprob rows: lp[t-1, ids[t]] scores token t."""
    lps, _ = _chunk_logprobs(cfg, weights, ids, compute_dtype)
    return lps  # [T-1] logprob of each next token


def _mean_continuation_logprob(cfg, weights, ids, start: int, end: int,
                               compute_dtype):
    """Mean logprob of tokens ids[start:end] given their prefixes."""
    lps = _seq_logprobs(cfg, weights, ids, compute_dtype)
    span = lps[start - 1 : end - 1]
    return float(np.sum(span)) / max(len(span), 1)


def _common_prefix(seqs) -> int:
    cp = 0
    for toks in zip(*seqs):
        if any(t != toks[0] for t in toks):
            break
        cp += 1
    return min(cp, min(len(s) for s in seqs) - 1)


def score_choice_tasks(cfg, weights, tasks, tokenizer, bos: bool = True,
                       compute_dtype=jnp.bfloat16, progress=None,
                       joiner: str = " ") -> ScoreResult:
    """tasks: [(context, [candidates...], gold_idx)].  The hellaswag /
    multiple-choice scoring core (acc_norm: mean-logprob argmax)."""
    res = ScoreResult(0, 0)
    for context, cands, gold in tasks:
        seqs = [tokenizer.encode(context + joiner + c, add_bos=bos)
                for c in cands]
        cp = _common_prefix(seqs)
        scores = [
            _mean_continuation_logprob(cfg, weights, s, cp, len(s),
                                       compute_dtype)
            for s in seqs
        ]
        res.n_done += 1
        res.n_correct += int(int(np.argmax(scores)) == gold)
        if progress:
            progress(res)
    return res


def parse_hellaswag(text: str, n_tasks: int | None = None, seed: int = 1):
    """The reference's 6-lines-per-task layout (perplexity.cpp:752-761):
    context / gold index / 4 endings.  Task selection is randomized like
    the reference (different PRNG stream; the score converges identically,
    perplexity.cpp:783 'the random seed should not impact the result')."""
    import random

    lines = text.splitlines()
    assert len(lines) % 6 == 0, "hellaswag input must be 6 lines per task"
    tasks = []
    for i in range(0, len(lines), 6):
        tasks.append((lines[i], lines[i + 2 : i + 6], int(lines[i + 1])))
    if n_tasks is not None and n_tasks < len(tasks):
        rng = random.Random(seed)
        tasks = rng.sample(tasks, n_tasks)
    return tasks


def hellaswag(cfg, weights, text: str, tokenizer, n_tasks: int | None = None,
              compute_dtype=jnp.bfloat16, progress=None) -> ScoreResult:
    return score_choice_tasks(cfg, weights, parse_hellaswag(text, n_tasks),
                              tokenizer, compute_dtype=compute_dtype,
                              progress=progress)


def parse_winogrande_csv(text: str):
    """index,sentence-with-_,choice1,choice2,answer(1|2) CSV
    (load_winogrande_from_csv, perplexity.cpp:1014-1074)."""
    import csv
    import io

    out = []
    for row in csv.reader(io.StringIO(text)):
        if len(row) < 5:
            continue
        _, sentence, c1, c2, ans = row[:5]
        if "_" not in sentence:
            continue
        first, second = sentence.split("_", 1)
        out.append((first, second, c1, c2, int(ans)))
    return out


def winogrande(cfg, weights, text: str, tokenizer, n_tasks: int | None = None,
               compute_dtype=jnp.bfloat16, progress=None) -> ScoreResult:
    """Winogrande scoring (winogrande_score, perplexity.cpp:1084-1292):
    each choice fills the blank; the score is the mean logprob of the
    SECOND sentence part after the choice.  When either trailing part is
    k_min_trailing_ctx (=3) tokens or shorter, scoring falls back to all
    tokens past the common prefix.  (We always score with each sequence's
    own correct logits; the reference notes a FIXME for its batched
    variant's non-skip path.)"""
    entries = parse_winogrande_csv(text)
    if n_tasks is not None:
        entries = entries[:n_tasks]
    K_MIN_TRAILING = 3
    res = ScoreResult(0, 0)
    for first, second, c1, c2, answer in entries:
        seqs = []
        n_bases = []
        for choice in (c1, c2):
            seqs.append(tokenizer.encode(first + choice + second,
                                         add_bos=True))
            n_bases.append(len(tokenizer.encode(first + choice,
                                                add_bos=True)))
        cp = _common_prefix(seqs)
        skip_choice = all(len(s) - cp > K_MIN_TRAILING for s in seqs)
        scores = []
        for s, n_base in zip(seqs, n_bases):
            start = n_base if skip_choice else cp
            # drop the final token from scoring when >1 trailing token
            # (perplexity.cpp:1221 last_1st/last_2nd)
            last = 1 if len(s) - start > 1 else 0
            scores.append(_mean_continuation_logprob(
                cfg, weights, s, start, len(s) - last, compute_dtype))
        got = 1 if scores[0] > scores[1] else 2
        res.n_done += 1
        res.n_correct += int(got == answer)
        if progress:
            progress(res)
    return res


def multiple_choice(cfg, weights, tasks_json, tokenizer,
                    n_tasks: int | None = None,
                    compute_dtype=jnp.bfloat16, progress=None) -> ScoreResult:
    """MMLU-class scoring (multiple_choice_score, perplexity.cpp:1388):
    tasks_json is a JSON list of {"question", "answers": [..],
    "label": gold_index (0-based)}; same mean-logprob scoring as
    hellaswag with a variable answer count."""
    import json as _json

    tasks = tasks_json
    if isinstance(tasks, (str, bytes)):
        tasks = _json.loads(tasks)
    parsed = [(t["question"], list(t["answers"]), int(t["label"]))
              for t in tasks]
    if n_tasks is not None:
        parsed = parsed[:n_tasks]
    return score_choice_tasks(cfg, weights, parsed, tokenizer,
                              compute_dtype=compute_dtype, progress=progress)
