"""Continuous-batching scheduler — the server's core.

The design mirrors examples/server/server.cpp (SURVEY §3.3): a fixed pool of
slots, each an independent sequence with its own sampler/grammar state; every
scheduler tick either (a) processes pending prompt chunks — all slots with
outstanding prompt tokens advance together in one [B, chunk] forward — or
(b) decodes one token for every GENERATING slot in one [B, 1] forward.
Idle rows are "parked": they feed a pad token at the reserved last cache
slot (masked forever), so slot insertion/removal never recompiles the graph
(fixed-capacity batch + masks; SURVEY §7 hard part 6).

Compilation count is fixed: one program per prompt-chunk bucket + one decode
program, regardless of request traffic.
"""
from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from enum import Enum
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import LlamaConfig, forward, init_kv_cache
from ..runtime.sampling import SamplerChain, greedy_chain, make_chain

PROMPT_CHUNK = 128


class SlotState(Enum):
    IDLE = 0
    PROMPT = 1
    GENERATING = 2


@dataclass
class Slot:
    id: int
    state: SlotState = SlotState.IDLE
    prompt: list = field(default_factory=list)
    n_prompt_done: int = 0
    n_past: int = 0
    generated: list = field(default_factory=list)
    settled: list = field(default_factory=list)  # tokens whose rows are cached
    n_predict: int = 0
    sampler: Optional[SamplerChain] = None
    stop_ids: set = field(default_factory=set)
    stop_strings: list = field(default_factory=list)
    out_queue: Optional[queue.Queue] = None
    pending_logits: Optional[np.ndarray] = None
    # speculative rounds emit every accepted token (each sampled EXACTLY
    # once — common_sampler_sample_and_accept_n semantics); the last one
    # is carried here as the next round's `cur` instead of being
    # re-sampled from pending_logits (a re-sample would advance stateful
    # samplers twice per boundary token)
    pending_tok: Optional[int] = None
    t_start: float = 0.0
    t_first_token: float = 0.0
    finish_reason: str = ""
    # stats
    n_decoded: int = 0

    def reset(self):
        self.state = SlotState.IDLE
        self.prompt = []
        self.n_prompt_done = 0
        self.n_past = 0
        self.generated = []
        self.settled = []
        self.sampler = None
        self.pending_logits = None
        self.pending_tok = None
        self.finish_reason = ""
        self.n_decoded = 0

    def release(self):
        """Finish the request but RETAIN the cache bookkeeping (settled
        tokens + n_past) so the next request on this slot can reuse the
        longest common token prefix without re-prefilling (the reference's
        slot.cache_tokens surviving across requests, server.cpp:2883)."""
        settled, n_past = self.settled, self.n_past
        self.reset()
        self.settled, self.n_past = settled, n_past


class DraftModel:
    """Per-slot draft state for server-side speculative decoding — the
    analog of the reference's shared draft model + per-slot draft context
    (server.cpp:1901-1933; slot.can_speculate + speculative branch
    :3269+).  One small model, one batched KV cache with the same slot
    layout as the target; proposals run as k greedy [B, 1] forwards."""

    def __init__(self, cfg, weights, n_slots: int, max_seq: int,
                 compute_dtype=jnp.bfloat16, kv_dtype=jnp.bfloat16):
        self.cfg = cfg
        self.weights = weights
        self.kv = init_kv_cache(cfg, n_slots, max_seq, kv_dtype)
        self.n_past = np.zeros(n_slots, np.int64)  # settled tokens in KV
        self.max_seq = max_seq
        self._fwd = jax.jit(
            partial(forward, cfg, compute_dtype=compute_dtype),
            static_argnames=("logits_all",),
            donate_argnames=("kv_cache",),
        )

    @classmethod
    def from_gguf(cls, path: str, n_slots: int, max_seq: int):
        from ..gguf.reader import GGUFReader
        from ..models.fuse import fuse_weights, permute_rope_neox
        from ..models.llama import load_llama_weights
        from ..quant.pack import drop_wire_planes

        with GGUFReader.open(path) as r:
            cfg, weights = load_llama_weights(r)
        weights, cfg = permute_rope_neox(weights, cfg)
        weights = fuse_weights(weights, cfg)
        weights = drop_wire_planes(weights)
        return cls(cfg, weights, n_slots, max_seq)

    def reset_slot(self, slot_id: int):
        self.n_past[slot_id] = 0


class BatchEngine:
    """Fixed-slot continuous-batching engine over one model."""

    def __init__(self, cfg: LlamaConfig, weights: dict, vocab=None,
                 n_slots: int = 4, max_seq: int = 1024,
                 kv_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
                 draft: Optional[DraftModel] = None, n_draft: int = 8,
                 draft_p_min: float = 0.75, ctx_shift: bool = False,
                 n_keep: int = 0):
        self.cfg = cfg
        self.weights = weights
        self.vocab = vocab
        self.n_slots = n_slots
        self.max_seq = max_seq  # last slot reserved for parked writes
        self.kv = init_kv_cache(cfg, n_slots, max_seq, kv_dtype)
        self.slots = [Slot(i) for i in range(n_slots)]
        self.park_pos = max_seq - 1
        self.draft = draft
        self.n_draft = n_draft
        self.draft_p_min = draft_p_min
        # context-shift-on-overflow instead of finishing (server ctx_shift:
        # slots survive longer-than-window conversations, server.cpp
        # slot.params.n_keep + n_discard halving)
        self.ctx_shift = ctx_shift
        self.n_keep = n_keep
        self._fwd = jax.jit(
            partial(forward, cfg, compute_dtype=compute_dtype),
            static_argnames=("logits_all",),
            donate_argnames=("kv_cache",),
        )
        self.lock = threading.Lock()
        self.pending: queue.Queue = queue.Queue()
        self.metrics = {
            "n_requests": 0, "n_tokens_generated": 0, "n_prompt_tokens": 0,
            "n_prompt_tokens_cached": 0,
            "t_decode": 0.0, "t_prompt": 0.0,
            "n_draft_proposed": 0, "n_draft_accepted": 0, "n_ctx_shifts": 0,
            "n_draft_rounds_decoupled": 0,
        }
        # per-request time-to-first-token samples (seconds, last 512) for
        # the /metrics p50 line (BASELINE metric: decode t/s + p50 TTFT)
        from collections import deque

        self.ttft_samples = deque(maxlen=512)

    @classmethod
    def from_gguf(cls, path: str, **kw) -> "BatchEngine":
        from ..gguf.reader import GGUFReader
        from ..models.llama import load_llama_weights
        from ..tokenizer import Vocab

        with GGUFReader.open(path) as r:
            cfg, weights = load_llama_weights(r)
            vocab = Vocab.from_gguf(r.metadata)
            md = dict(r.metadata)
        from ..quant.pack import drop_wire_planes

        weights = drop_wire_planes(weights)
        eng = cls(cfg, weights, vocab, **kw)
        eng.metadata = md
        return eng

    # -- request API ---------------------------------------------------------

    def submit(self, prompt_ids: list[int], n_predict: int = 64,
               sampler: Optional[SamplerChain] = None,
               stop_ids: Optional[set] = None,
               stop_strings: Optional[list] = None,
               cache_prompt: bool = True) -> queue.Queue:
        """Enqueue a request; returns a queue yielding (token|None, finish_reason)."""
        q: queue.Queue = queue.Queue()
        req = dict(prompt=list(prompt_ids), n_predict=n_predict,
                   sampler=sampler or greedy_chain(),
                   stop_ids=stop_ids if stop_ids is not None
                   else ({self.vocab.eos_id} if self.vocab else set()),
                   stop_strings=stop_strings or [], out=q,
                   cache_prompt=cache_prompt)
        self.pending.put(req)
        self.metrics["n_requests"] += 1
        return q

    # -- cached-prompt prefix reuse (server.cpp:2883,3042-3164 analog) -------

    @staticmethod
    def _lcp(a: list, b: list) -> int:
        n = min(len(a), len(b))
        i = 0
        while i < n and a[i] == b[i]:
            i += 1
        return i

    def _reusable(self, slot: Slot, req: dict) -> int:
        """Tokens of the request's prompt already resident in the slot's
        KV rows: the longest common prefix with the slot's settled tokens,
        capped so at least one prompt token is always evaluated (logits
        for sampling come from the last prompt position — the reference
        keeps n_past < n_prompt the same way, server.cpp:3074)."""
        if not req.get("cache_prompt", True):
            return 0
        prompt = req["prompt"]
        resident = slot.settled[: slot.n_past]
        return max(0, min(self._lcp(resident, prompt),
                          len(prompt) - 1, slot.n_past))

    def _launch(self, slot: Slot, req: dict):
        reuse = self._reusable(slot, req)
        slot.reset()
        slot.state = SlotState.PROMPT
        slot.prompt = req["prompt"]
        slot.settled = list(req["prompt"])
        slot.n_past = reuse          # KV rows [0, reuse) stay live
        slot.n_prompt_done = reuse   # prefill only the tail
        slot.n_predict = req["n_predict"]
        slot.sampler = req["sampler"]
        slot.stop_ids = req["stop_ids"]
        slot.stop_strings = req["stop_strings"]
        slot.out_queue = req["out"]
        slot.t_start = time.perf_counter()
        self.metrics["n_prompt_tokens"] += len(slot.prompt)
        self.metrics["n_prompt_tokens_cached"] += reuse
        if self.draft is not None:
            # the draft's rows were fed the same settled tokens at the same
            # positions — its prefix up to `reuse` stays valid too
            self.draft.n_past[slot.id] = min(
                int(self.draft.n_past[slot.id]), reuse)

    # -- scheduler tick (update_slots analog) --------------------------------

    def has_work(self) -> bool:
        return not self.pending.empty() or any(
            s.state != SlotState.IDLE for s in self.slots
        )

    def step(self):
        """One scheduler tick.  Returns True if any work was done."""
        # assign pending requests to idle slots, each to the idle slot
        # whose resident tokens share the longest prefix with its prompt
        # (the reference's similarity-based slot selection, server.cpp
        # get_available_slot)
        idle = [s for s in self.slots if s.state == SlotState.IDLE]
        while idle:
            try:
                req = self.pending.get_nowait()
            except queue.Empty:
                break
            best = max(idle, key=lambda s: self._reusable(s, req))
            idle.remove(best)
            self._launch(best, req)

        prompt_slots = [s for s in self.slots if s.state == SlotState.PROMPT]
        if prompt_slots:
            self._prompt_tick(prompt_slots)
            return True
        gen_slots = [s for s in self.slots if s.state == SlotState.GENERATING]
        if gen_slots:
            self._decode_tick(gen_slots)
            return True
        return False

    def _prompt_tick(self, prompt_slots: list[Slot]):
        t0 = time.perf_counter()
        B = self.n_slots
        chunk = min(PROMPT_CHUNK, self.max_seq - 1)
        tokens = np.zeros((B, chunk), dtype=np.int32)
        pos = np.full(B, self.park_pos, dtype=np.int32)
        idx = np.zeros(B, dtype=np.int32)
        active = []
        for s in prompt_slots:
            rest = s.prompt[s.n_prompt_done :]
            take = min(len(rest), chunk)
            tokens[s.id, :take] = rest[:take]
            pos[s.id] = s.n_past
            idx[s.id] = take - 1
            active.append((s, take))
        logits, self.kv = self._fwd(
            self.weights, jnp.asarray(tokens), self.kv, jnp.asarray(pos),
            logits_idx=jnp.asarray(idx),
        )
        if self.draft is not None:
            # mirror the prompt into the draft KV (reference: the draft
            # context re-evaluates the slot prompt, server.cpp:3269+)
            _, self.draft.kv = self.draft._fwd(
                self.draft.weights, jnp.asarray(tokens), self.draft.kv,
                jnp.asarray(pos), logits_idx=jnp.asarray(idx))
            for s, take in active:
                self.draft.n_past[s.id] = s.n_past + take
        logits = np.asarray(logits)
        for s, take in active:
            s.n_prompt_done += take
            s.n_past += take
            if s.n_prompt_done >= len(s.prompt):
                s.state = SlotState.GENERATING
                s.pending_logits = logits[s.id]
        self.metrics["t_prompt"] += time.perf_counter() - t0

    def _decode_tick(self, gen_slots: list[Slot]):
        t0 = time.perf_counter()
        B = self.n_slots
        # sample on host for every generating slot
        to_decode = []
        for s in gen_slots:
            if s.pending_tok is not None:
                # carried from the last speculative round: already sampled
                # AND emitted there — just feed it as this round's cur
                tok = s.pending_tok
                s.pending_tok = None
                to_decode.append((s, tok))
                continue
            tok = s.sampler.sample(s.pending_logits)
            if s.t_first_token == 0.0:
                s.t_first_token = time.perf_counter() - s.t_start
                self.ttft_samples.append(s.t_first_token)
            finished = self._emit(s, tok)
            if not finished:
                to_decode.append((s, tok))
        if not to_decode:
            self.metrics["t_decode"] += time.perf_counter() - t0
            return
        if self.draft is not None:
            self._spec_decode(to_decode)
            self.metrics["t_decode"] += time.perf_counter() - t0
            return
        tokens = np.zeros((B, 1), dtype=np.int32)
        pos = np.full(B, self.park_pos, dtype=np.int32)
        for s, tok in to_decode:
            tokens[s.id, 0] = tok
            pos[s.id] = s.n_past
        logits, self.kv = self._fwd(
            self.weights, jnp.asarray(tokens), self.kv, jnp.asarray(pos),
        )
        logits = np.asarray(logits)
        for s, tok in to_decode:
            s.n_past += 1
            s.pending_logits = logits[s.id]
        self.metrics["t_decode"] += time.perf_counter() - t0

    # -- speculative decoding (per-slot draft, server.cpp:3269+ analog) ------

    @staticmethod
    def _spec_continue(n_alive: int, n_started: int) -> bool:
        """Draft-round continuation policy: keep batch-drafting while at
        least half the round's participants still want tokens.  A
        minority of long-drafting slots must not hold the whole tick."""
        return 2 * n_alive >= n_started

    def _spec_decode(self, to_decode):
        """One speculative round for every decoding slot: the draft
        proposes up to n_draft greedy tokens per slot (early-stopped on
        p_min), the target scores [cur]+draft in ONE [B, 1+k] forward, and
        each slot accepts its longest agreeing prefix — multi-token emits
        per tick (common_sampler_sample_and_accept_n semantics)."""
        B = self.n_slots
        d = self.draft
        k = self.n_draft
        # 1. draft catch-up: feed settled tokens the draft hasn't seen
        #    (the previous round's accepted/correction tokens)
        for _ in range(64):  # bounded; lag is ~1-2 tokens per round
            lags = []
            for s, tok in to_decode:
                settled = s.settled
                lag = len(settled) - int(d.n_past[s.id])
                if lag > 0:
                    lags.append((s, settled[int(d.n_past[s.id])]))
            if not lags:
                break
            tokens = np.zeros((B, 1), np.int32)
            pos = np.full(B, d.max_seq - 1, np.int32)
            for s, nxt in lags:
                tokens[s.id, 0] = nxt
                pos[s.id] = int(d.n_past[s.id])
            dl, d.kv = d._fwd(d.weights, jnp.asarray(tokens), d.kv,
                              jnp.asarray(pos))
            d_logits = np.asarray(dl)
            for s, _ in lags:
                d.n_past[s.id] += 1
        # 2. propose: k greedy draft steps, all slots batched; per-slot
        #    early stop when the draft's confidence drops below p_min
        proposals = {s.id: [] for s, _ in to_decode}
        alive = {s.id for s, _ in to_decode}
        n_started = len(alive)
        # seed: the draft's next-token distribution after [..settled, cur]
        tokens = np.zeros((B, 1), np.int32)
        pos = np.full(B, d.max_seq - 1, np.int32)
        for s, tok in to_decode:
            tokens[s.id, 0] = tok
            pos[s.id] = int(d.n_past[s.id])
        dl, d.kv = d._fwd(d.weights, jnp.asarray(tokens), d.kv,
                          jnp.asarray(pos))
        d_logits = np.asarray(dl)
        d_written = {s.id: 1 for s, _ in to_decode}  # cur row in draft KV
        for step in range(k):
            tokens = np.zeros((B, 1), np.int32)
            pos = np.full(B, d.max_seq - 1, np.int32)
            for s, _ in to_decode:
                if s.id not in alive:
                    continue
                row = d_logits[s.id]
                e = np.exp(row - row.max())
                p = e / e.sum()
                top = int(np.argmax(p))
                if p[top] < self.draft_p_min:
                    alive.discard(s.id)
                    continue
                proposals[s.id].append(top)
                tokens[s.id, 0] = top
                pos[s.id] = int(d.n_past[s.id]) + d_written[s.id]
            if not alive or step == k - 1:
                break
            if not self._spec_continue(len(alive), n_started):
                # decoupling: each batched draft step costs a full [B, 1]
                # draft forward for EVERY slot; once most slots have
                # stopped (confidence early-out), the marginal value of
                # further steps accrues to a minority while the whole
                # batch pays — stop the round instead of letting the
                # longest-drafting slot hold the tick (round-3 weak #4;
                # reference analog: common_speculative per-slot budgets,
                # common/speculative.cpp:137-278)
                self.metrics["n_draft_rounds_decoupled"] += 1
                break
            dl, d.kv = d._fwd(d.weights, jnp.asarray(tokens), d.kv,
                              jnp.asarray(pos))
            d_logits = np.asarray(dl)
            for s, _ in to_decode:
                if s.id in alive:
                    d_written[s.id] += 1
        n_prop = max((len(v) for v in proposals.values()), default=0)
        self.metrics["n_draft_proposed"] += sum(map(len, proposals.values()))
        # 3. target verification: ONE [B, 1+n_prop] forward, all positions
        width = 1 + n_prop
        tokens = np.zeros((B, width), np.int32)
        pos = np.full(B, self.park_pos, np.int32)
        for s, tok in to_decode:
            row = [tok] + proposals[s.id]
            tokens[s.id, : len(row)] = row
            pos[s.id] = s.n_past
        logits, self.kv = self._fwd(
            self.weights, jnp.asarray(tokens), self.kv, jnp.asarray(pos),
            logits_all=True)
        logits = np.asarray(logits)
        # 4. accept the longest agreeing prefix per slot.  Each position
        #    is sampled EXACTLY ONCE (the reference's
        #    common_sampler_sample_and_accept_n, common/sampling.h:79 —
        #    sample, accept into the sampler, stop at the first
        #    disagreement); every accepted token is emitted NOW, and the
        #    last one carries over as next round's `cur` via pending_tok
        #    instead of being re-sampled (a re-sample would advance
        #    stateful samplers — penalty/DRY rings, RNG draws — twice for
        #    the boundary token and could emit a different token than the
        #    one the round accepted)
        for s, tok in to_decode:
            prop = proposals[s.id]
            accepted = []
            for i, dtok in enumerate(prop):
                t_tok = s.sampler.sample(logits[s.id, i])
                if t_tok == dtok:
                    accepted.append(dtok)
                else:
                    accepted.append(t_tok)  # target's correction
                    break
            else:
                accepted.append(s.sampler.sample(logits[s.id, len(prop)]))
            n_agree = sum(1 for i, dtok in enumerate(prop)
                          if i < len(accepted) and accepted[i] == dtok)
            self.metrics["n_draft_accepted"] += n_agree
            # rows beyond the accepted frontier are stale; masking hides
            # them and later writes overwrite (the reference's seq_rm)
            s.n_past += len(accepted)
            s.pending_logits = logits[s.id, len(accepted) - 1]
            # draft rows for cur + the agreeing prefix are already correct
            # in its KV — advance its frontier so catch-up only re-feeds
            # the correction token (the reference's prompt-reuse)
            d.n_past[s.id] += 1 + min(n_agree,
                                      max(d_written.get(s.id, 1) - 1, 0))
            for j, a in enumerate(accepted):
                if self._emit(s, a) or s.state != SlotState.GENERATING:
                    break
                if j == len(accepted) - 1:
                    # fully emitted and still generating: the last token
                    # is the next round's cur (already sampled + emitted)
                    s.pending_tok = a

    def _emit(self, s: Slot, tok: int) -> bool:
        """Deliver a sampled token; returns True when the slot finished."""
        if tok in s.stop_ids:
            return self._finish(s, "stop")
        s.generated.append(tok)
        s.settled.append(tok)
        s.n_decoded += 1
        self.metrics["n_tokens_generated"] += 1
        s.out_queue.put((tok, None))
        if s.stop_strings and self.vocab:
            text = "".join(self.vocab.tokens[t] for t in s.generated[-8:])
            if any(ss in text for ss in s.stop_strings):
                return self._finish(s, "stop_string")
        if s.n_decoded >= s.n_predict:
            return self._finish(s, "length")
        spec_room = 1 + (self.n_draft if self.draft is not None else 0)
        if s.n_past + spec_room >= self.max_seq - 1:
            if self.ctx_shift:
                # survive a longer-than-window conversation by discarding
                # half the evictable prefix (server.cpp ctx-shift:
                # n_discard = (n_past - n_keep)/2, positions re-rotated)
                n_keep = min(self.n_keep, s.n_past - 2)
                n_discard = max((s.n_past - n_keep) // 2, 1)
                self.shift_slot(s.id, n_keep, n_discard)
                self.metrics["n_ctx_shifts"] += 1
                return False
            return self._finish(s, "context_full")
        return False

    def shift_slot(self, slot_id: int, n_keep: int, n_discard: int):
        """Per-slot context shift on the shared batched cache: the slot's
        rows are sliced out, shifted with K re-rotation (kv_ops.kv_shift),
        and written back; other slots untouched."""
        from ..runtime.kv_ops import kv_shift

        s = self.slots[slot_id]
        # explicit copies: kv_shift donates its input, and an identity
        # slice (n_slots == 1) would alias — and delete — the live cache
        sub = {name: jnp.copy(arr[:, slot_id : slot_id + 1])
               for name, arr in self.kv.items()}
        sub = kv_shift(self.cfg, sub, n_keep, n_discard, s.n_past)
        for name, arr in sub.items():
            self.kv[name] = self.kv[name].at[:, slot_id : slot_id + 1].set(arr)
        s.n_past -= n_discard
        # the settled-token list mirrors the cache content (the
        # reference's slot.cache_tokens)
        s.settled = s.settled[:n_keep] + s.settled[n_keep + n_discard :]
        if self.draft is not None:
            # the draft's rotated positions don't match its un-rotated
            # rope rows, so its cache is invalid from n_keep on — re-feed
            # the post-shift history in [B, chunk] prefill forwards HERE
            # (one-time, ~len/128 dispatches) instead of leaving it to
            # the speculative catch-up loop, which replays one [B, 1]
            # forward per token and stalls the tick for many rounds
            # (round-4 weak #6; reference: the draft ctx re-prompts in
            # batches, common/speculative.cpp:137-278)
            self.draft.reset_slot(slot_id)
            self._draft_refeed(slot_id, s.settled[: s.n_past])

    def _draft_refeed(self, slot_id: int, toks: list):
        """Re-prefill one slot's draft KV with `toks` in chunked [B, chunk]
        forwards (other rows parked), leaving draft.n_past = len(toks)."""
        d = self.draft
        B = self.n_slots
        chunk = min(PROMPT_CHUNK, d.max_seq - 1)
        done = 0
        while done < len(toks):
            take = min(chunk, len(toks) - done)
            tokens = np.zeros((B, chunk), np.int32)
            pos = np.full(B, d.max_seq - 1, np.int32)
            idx = np.zeros(B, np.int32)
            tokens[slot_id, :take] = toks[done : done + take]
            pos[slot_id] = done
            idx[slot_id] = take - 1
            # same (shape, logits_idx) signature as the prompt mirror in
            # _prompt_tick -> reuses its compiled program
            _, d.kv = d._fwd(d.weights, jnp.asarray(tokens), d.kv,
                             jnp.asarray(pos), logits_idx=jnp.asarray(idx))
            done += take
        d.n_past[slot_id] = len(toks)

    def _finish(self, s: Slot, reason: str) -> bool:
        s.finish_reason = reason
        s.out_queue.put((None, reason))
        s.release()  # keep settled/n_past: the rows stay reusable
        return True

    # -- slot state save/restore (server slot_save API analog) ---------------

    def save_slot(self, slot_id: int, path: str):
        """Persist a slot's KV rows + bookkeeping (llama-server
        /slots/{id}?action=save).  EVERY cache plane is saved — with a
        quantized cache (kv_dtype="q8_0"/"q4_0") that includes the
        per-row scale planes k_d/v_d; a restore that dropped them would
        attend with stale scales."""
        import numpy as np

        s = self.slots[slot_id]
        planes = {}
        for name, arr in self.kv.items():
            a = arr[:, slot_id]
            if jnp.issubdtype(arr.dtype, jnp.floating):
                planes[name] = np.asarray(a, np.float32)
            else:  # int8/int4 value planes -> portable int8
                planes[name] = np.asarray(a.astype(jnp.int8))
        np.savez(
            path,
            n_past=np.int64(s.n_past),
            prompt=np.asarray(s.prompt + s.generated, np.int64),
            **planes,
        )

    def erase_slot(self, slot_id: int) -> int:
        """Drop a slot's cached tokens (server /slots/{id}?action=erase).
        Returns the number of erased cache tokens."""
        s = self.slots[slot_id]
        if s.state != SlotState.IDLE:
            raise RuntimeError(f"slot {slot_id} busy")
        n = s.n_past
        s.reset()
        return n

    def restore_slot(self, slot_id: int, path: str):
        import jax.numpy as jnp
        import numpy as np

        z = np.load(path)
        s = self.slots[slot_id]
        if s.state != SlotState.IDLE:
            raise RuntimeError(f"slot {slot_id} busy")
        missing = [n for n in self.kv if n not in z]
        if missing:
            raise ValueError(
                f"slot file {path} lacks cache planes {missing} required "
                f"by this engine's kv_dtype (saved with a different cache "
                f"type?)")
        for name in self.kv:
            self.kv[name] = self.kv[name].at[:, slot_id].set(
                jnp.asarray(z[name], self.kv[name].dtype))
        s.n_past = int(z["n_past"])
        s.prompt = z["prompt"].astype(int).tolist()
        s.n_prompt_done = len(s.prompt)
        # restored rows are reusable by the next request on this slot
        s.settled = list(s.prompt[: s.n_past])

    # -- blocking convenience ------------------------------------------------

    def run_until_idle(self, max_ticks: int = 100000):
        for _ in range(max_ticks):
            if not self.has_work():
                return
            self.step()
        raise RuntimeError("scheduler did not drain")

    def complete(self, prompt_ids, **kw) -> list[int]:
        """Synchronous single-request helper."""
        q = self.submit(prompt_ids, **kw)
        self.run_until_idle()
        out = []
        while True:
            tok, fin = q.get_nowait()
            if tok is None:
                break
            out.append(tok)
        return out
