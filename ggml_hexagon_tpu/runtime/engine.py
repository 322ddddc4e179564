"""Inference engine: jitted decode loop over a GGUF model.

The runtime analog of the reference's llama_context (src/llama-context.cpp):
owns the KV cache, compiles one XLA program per (batch, chunk-size) bucket
(where the reference re-plans a ggml graph per ubatch, llama-context.cpp:1317
— here compilation is cached by shape), streams prompt chunks, and samples
host-side.  Perf counters mirror llama_perf_context (llama.h:1402).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..models.llama import LlamaConfig, forward, init_kv_cache, load_llama_weights
from ..tokenizer import Vocab, build_tokenizer
from .sampling import SamplerChain, greedy_chain

PREFILL_BUCKETS = (8, 32, 128, 512)


class ContextOverflowError(RuntimeError):
    """Graded decode failure: the request does not fit the context window
    (the reference's positive llama_decode status 1 — KV full — which the
    server maps to a client error / retry, server.cpp:3202-3214).  Callers
    can catch and context-shift or reject instead of crashing."""


@dataclass
class PerfCounters:
    """llama_perf_context-style counters (t_* in seconds)."""

    t_load: float = 0.0
    t_prefill: float = 0.0
    t_decode: float = 0.0
    n_prefill: int = 0
    n_decode: int = 0

    def report(self) -> str:
        pp = self.n_prefill / self.t_prefill if self.t_prefill else 0.0
        tg = self.n_decode / self.t_decode if self.t_decode else 0.0
        return (
            f"load {self.t_load*1e3:.0f} ms | "
            f"prefill {self.n_prefill} tok {pp:.1f} t/s | "
            f"decode {self.n_decode} tok {tg:.1f} t/s"
        )


class Engine:
    def __init__(
        self,
        cfg: LlamaConfig,
        weights: dict,
        vocab: Optional[Vocab] = None,
        max_seq: int = 2048,
        batch: int = 1,
        kv_dtype=jnp.bfloat16,
        compute_dtype=jnp.bfloat16,
        fuse: bool = False,
    ):
        if hasattr(cfg, "resolve_rope_factors"):
            cfg = cfg.resolve_rope_factors(max_seq)  # phi3 longrope long/short
        if fuse:
            from ..models.fuse import fuse_weights, permute_rope_neox

            weights, cfg = permute_rope_neox(weights, cfg)
            weights = fuse_weights(weights, cfg)
        self.cfg = cfg
        self.weights = weights
        self.vocab = vocab
        self.tokenizer = build_tokenizer(vocab) if vocab and vocab.tokens else None
        self.max_seq = max_seq
        self.batch = batch
        self.kv_dtype = kv_dtype
        self.compute_dtype = compute_dtype
        self.kv = init_kv_cache(cfg, batch, max_seq, kv_dtype)
        self.n_past = 0
        self.cached_tokens: list[int] = []  # prompt-cache (batch=1 reuse)
        self.perf = PerfCounters()
        self._fwd = jax.jit(
            partial(forward, cfg, compute_dtype=compute_dtype),
            static_argnames=("logits_all",),
            donate_argnames=("kv_cache",),
        )

    # -- construction --------------------------------------------------------

    @classmethod
    def from_gguf(cls, path: str, fuse: bool = False, **kw) -> "Engine":
        """fuse=True row-concatenates QKV and gate/up projections (fewer
        kernels per decode step, ~5% tg); leave off when LoRA adapters will
        be attached at runtime (adapters target the unfused names)."""
        t0 = time.perf_counter()
        with GGUFReader.open(path) as r:
            cfg, weights = load_llama_weights(r)
            vocab = Vocab.from_gguf(r.metadata)
        from ..quant.pack import drop_wire_planes

        if fuse:
            from ..models.fuse import fuse_weights, permute_rope_neox

            weights, cfg = permute_rope_neox(weights, cfg)
            weights = fuse_weights(weights, cfg)
        weights = drop_wire_planes(weights)
        eng = cls(cfg, weights, vocab, **kw)
        eng.perf.t_load = time.perf_counter() - t0
        return eng

    # -- KV management (llama_kv_self_* analogs) -----------------------------

    def reset(self):
        self.kv = init_kv_cache(self.cfg, self.batch, self.max_seq, self.kv_dtype)
        self.n_past = 0
        self.cached_tokens = []

    def truncate(self, n: int):
        """Keep only the first n positions (llama_kv_self_seq_rm of a suffix:
        masking hides slots >= n_past, so rewinding the counter suffices)."""
        assert 0 <= n <= self.n_past
        self.n_past = n
        self.cached_tokens = self.cached_tokens[:n]

    def shift_context(self, n_keep: int, n_discard: int):
        """Context shift (llama-cli/server style): drop positions
        [n_keep, n_keep+n_discard), slide the rest down re-rotating K."""
        from .kv_ops import kv_shift

        assert n_keep + n_discard <= self.n_past
        self.kv = kv_shift(self.cfg, self.kv, n_keep, n_discard, self.n_past)
        self.n_past -= n_discard
        self.cached_tokens = (
            self.cached_tokens[:n_keep] + self.cached_tokens[n_keep + n_discard :]
        )

    def apply_lora(self, path: str, scale: float = 1.0):
        """Attach a LoRA adapter GGUF (runtime apply; base weights shared)."""
        from ..models.lora import LoraAdapter, attach_lora

        self.weights = attach_lora(self.weights, LoraAdapter.from_gguf(path, scale))

    def save_state(self, path):
        from .kv_ops import save_state

        save_state(self, path)

    def load_state(self, path):
        from .kv_ops import load_state

        load_state(self, path)

    # -- self-extend / grouped attention (llama-cli --grp-attn-n/-w) --------

    def enable_self_extend(self, ga_n: int, ga_w: int):
        """Grouped-attention self-extend (examples/main/main.cpp ga loop,
        llama_kv_self_seq_div, llama.h:718): groups of ga_w positions
        compress by factor ga_n as the context grows, so ~ga_n times the
        trained window stays inside trained position range.  Positions
        decouple from storage slots: the engine keeps an explicit
        cache_pos array and the forward masks/ropes against it."""
        assert self.batch == 1 and self.n_past == 0
        assert ga_w % ga_n == 0, "grp-attn-w must be a multiple of grp-attn-n"
        self.ga_n, self.ga_w, self.ga_i = ga_n, ga_w, 0
        self.pos_head = 0
        self.cache_pos = np.full((1, self.max_seq), 2 ** 29, np.int32)

    def _self_extend_step(self):
        """The main.cpp transformation (seq_add / seq_div / seq_add),
        applied to the position array with one per-slot K re-rotation."""
        from .kv_ops import kv_rerotate

        ga_n, ga_w = self.ga_n, self.ga_w
        while self.pos_head >= self.ga_i + ga_w:
            ga_i = self.ga_i
            ib = (ga_n * ga_i) // ga_w
            bd = (ga_w // ga_n) * (ga_n - 1)
            dd = (ga_w // ga_n) - ib * bd - ga_i
            pos = self.cache_pos[0].astype(np.int64)
            live = np.arange(self.max_seq) < self.n_past
            p = pos.copy()
            sel = live & (p >= ga_i) & (p < self.pos_head)
            p[sel] += ib * bd
            sel = live & (p >= ga_i + ib * bd) & (p < ga_i + ib * bd + ga_w)
            p[sel] //= ga_n
            sel = live & (p >= ga_i + ib * bd + ga_w) & (
                p < self.pos_head + ib * bd)
            p[sel] += dd
            deltas = (p - pos).astype(np.int32)
            if deltas.any():
                self.kv = kv_rerotate(self.cfg, self.kv, jnp.asarray(deltas)[None])
            self.cache_pos[0] = p.astype(np.int32)
            self.pos_head -= bd
            self.ga_i += ga_w // ga_n

    def _pos_arg(self):
        if getattr(self, "ga_n", 0):
            return jnp.int32(self.pos_head)
        return jnp.int32(self.n_past)

    def _se_kwargs(self, take: int = 1):
        """Pre-forward self-extend bookkeeping: run the transformation
        loop, then stamp the incoming tokens' positions so the forward's
        mask can see the freshly written rows."""
        if not getattr(self, "ga_n", 0):
            return {}
        self._self_extend_step()
        self.cache_pos[0, self.n_past : self.n_past + take] = np.arange(
            self.pos_head, self.pos_head + take, dtype=np.int32)
        return dict(cache_pos=jnp.asarray(self.cache_pos),
                    write_pos=jnp.int32(self.n_past))

    def _advance_pos(self, T: int):
        if getattr(self, "ga_n", 0):
            self.pos_head += T

    # -- decoding ------------------------------------------------------------

    def _chunks(self, n: int):
        """Split n prompt tokens into bucket-sized chunks.

        Bucket shapes bound compilation count (the reference instead re-plans
        its graph per ubatch size); the padded tail never exceeds cache space.
        """
        out = []
        left = n
        past = self.n_past
        while left > 0:
            space = self.max_seq - past
            b = next((b for b in PREFILL_BUCKETS if b >= min(left, space)), None)
            if b is None or b > space:
                b = next((bb for bb in reversed(PREFILL_BUCKETS) if bb <= space), space)
            take = min(left, b)
            out.append((take, b))
            left -= take
            past += take
        return out

    def prefill(self, ids: np.ndarray, reuse_cache: bool = False) -> np.ndarray:
        """Feed prompt tokens; returns logits at the last true position [B, V].

        reuse_cache (batch=1): longest-common-prefix reuse against the
        tokens already in the KV cache (the server's prompt-cache matching,
        server.cpp:2883) — only the unseen tail is evaluated.
        """
        ids = np.atleast_2d(np.asarray(ids, dtype=np.int32))
        B, T = ids.shape
        if reuse_cache and B == 1 and self.n_past == len(self.cached_tokens):
            flat = ids[0].tolist()
            common = 0
            for a, b in zip(self.cached_tokens, flat):
                if a != b:
                    break
                common += 1
            common = min(common, len(flat) - 1)  # must eval >= 1 token for logits
            if common > 0:
                self.truncate(common)
                ids = ids[:, common:]
                B, T = ids.shape
        assert B == self.batch, f"engine batch {self.batch} vs prompt batch {B}"
        if self.n_past + T > self.max_seq:
            raise ContextOverflowError(
                f"prompt needs {self.n_past + T} slots, window {self.max_seq}")
        if B == 1:
            self.cached_tokens = self.cached_tokens[: self.n_past] + ids[0].tolist()
        t0 = time.perf_counter()
        logits = None
        off = 0
        for take, bucket in self._chunks(T):
            chunk = ids[:, off : off + take]
            if take < bucket:  # pad tail chunk; garbage KV slots stay masked
                chunk = np.pad(chunk, ((0, 0), (0, bucket - take)))
            kw = self._se_kwargs(take)
            out, self.kv = self._fwd(
                self.weights, jnp.asarray(chunk), self.kv,
                self._pos_arg(), logits_all=True, **kw
            )
            logits = np.asarray(out[:, take - 1, :])
            self._advance_pos(take)
            self.n_past += take
            off += take
        jax.block_until_ready(self.kv["k"])
        self.perf.t_prefill += time.perf_counter() - t0
        self.perf.n_prefill += T
        return logits

    def prefill_embeds(self, embeds: np.ndarray) -> np.ndarray:
        """Feed raw embeddings [B, T, n_embd] (llava image segments —
        the analog of llava_eval_image_embed, examples/llava/llava.cpp).
        Returns last-position logits [B, V]."""
        embeds = np.asarray(embeds, dtype=np.float32)
        if embeds.ndim == 2:
            embeds = embeds[None]
        B, T, D = embeds.shape
        assert B == self.batch and self.n_past + T <= self.max_seq
        logits = None
        off = 0
        for take, bucket in self._chunks(T):
            chunk = embeds[:, off : off + take]
            if take < bucket:
                chunk = np.pad(chunk, ((0, 0), (0, bucket - take), (0, 0)))
            out, self.kv = self._fwd(
                self.weights, None, self.kv, jnp.int32(self.n_past),
                logits_all=True, input_embeds=jnp.asarray(chunk),
            )
            logits = np.asarray(out[:, take - 1, :])
            self.n_past += take
            off += take
        self.cached_tokens = []  # token-identity cache is void after embeds
        self.perf.n_prefill += T
        return logits

    def eval_tokens(self, tokens) -> np.ndarray:
        """Consume tokens (batch=1) returning logits at EVERY position [T, V]
        (the speculative verifier's one-pass scoring of a draft block)."""
        assert self.batch == 1
        ids = np.asarray(tokens, dtype=np.int32).reshape(-1)
        T = ids.size
        if self.n_past + T > self.max_seq:
            raise ContextOverflowError(
                f"prompt needs {self.n_past + T} slots, window {self.max_seq}")
        bucket = 1
        while bucket < T:
            bucket *= 2
        chunk = np.pad(ids, (0, bucket - T))[None, :]
        out, self.kv = self._fwd(
            self.weights, jnp.asarray(chunk), self.kv, jnp.int32(self.n_past),
            logits_all=True,
        )
        self.n_past += T
        self.cached_tokens = self.cached_tokens[: self.n_past - T] + ids.tolist()
        return np.asarray(out[0, :T, :])

    def decode_one(self, tokens: np.ndarray) -> np.ndarray:
        """One decode step for [B] tokens -> last-position logits [B, V]."""
        t0 = time.perf_counter()
        tok = jnp.asarray(np.asarray(tokens, dtype=np.int32).reshape(self.batch, 1))
        kw = self._se_kwargs(1)
        logits, self.kv = self._fwd(
            self.weights, tok, self.kv, self._pos_arg(), logits_all=False,
            **kw
        )
        self._advance_pos(1)
        self.n_past += 1
        if self.batch == 1:
            self.cached_tokens.append(int(tokens.reshape(-1)[0]))
        out = np.asarray(logits)
        self.perf.t_decode += time.perf_counter() - t0
        self.perf.n_decode += 1
        return out

    def generate(
        self,
        prompt_ids,
        n_predict: int = 64,
        sampler: Optional[SamplerChain] = None,
        stop_ids: Optional[set] = None,
        reuse_cache: bool = False,
    ) -> Iterator[int]:
        """Greedy/sampled generation for batch=1.  reuse_cache enables
        longest-prefix KV reuse (llama-cli --prompt-cache semantics)."""
        assert self.batch == 1
        sampler = sampler or greedy_chain()
        stop_ids = stop_ids if stop_ids is not None else (
            {self.vocab.eos_id} if self.vocab else set()
        )
        logits = self.prefill(np.asarray(prompt_ids, dtype=np.int32)[None, :],
                              reuse_cache=reuse_cache)
        for _ in range(n_predict):
            tok = sampler.sample(logits[0])
            if tok in stop_ids:
                return
            yield tok
            logits = self.decode_one(np.array([tok]))

    def generate_ondevice(
        self,
        prompt_ids,
        n_predict: int = 64,
        params: "DeviceSamplerParams | None" = None,
        seed: int = 0,
        stop_at_eos: bool = True,
    ) -> np.ndarray:
        """Whole generation as one device program (lax.scan decode loop with
        on-device sampling) — a single host sync at the end.  This is the
        production path: per-token host syncs cost a full dispatch RTT.
        """
        from .device_sampling import DeviceSamplerParams, sample_logits

        params = params or DeviceSamplerParams()
        eos = self.vocab.eos_id if (self.vocab and stop_at_eos) else -1
        logits = self.prefill(np.atleast_2d(np.asarray(prompt_ids, dtype=np.int32)))
        first = sample_logits(jnp.asarray(logits), jax.random.PRNGKey(seed), params)

        cache_key = (n_predict - 1, params, eos)
        if not hasattr(self, "_scan_cache"):
            self._scan_cache = {}
        if cache_key not in self._scan_cache:
            fwd = self._fwd
            n = n_predict - 1

            @partial(jax.jit, donate_argnames=("kv",))
            def scan_decode(weights, kv, tok0, pos0, key):
                def step(carry, _):
                    tok, kv, pos, key, done = carry
                    logits, kv = fwd(weights, tok[:, None], kv, pos, logits_all=False)
                    key, sub = jax.random.split(key)
                    nxt = sample_logits(logits, sub, params)
                    nxt = jnp.where(done, eos if eos >= 0 else 0, nxt)
                    done = done | (nxt == eos)
                    return (nxt, kv, pos + 1, key, done), nxt

                done0 = tok0 == eos
                (tok, kv, pos, _, _), toks = jax.lax.scan(
                    step, (tok0, kv, pos0, key, done0), None, length=n
                )
                return kv, toks  # toks [n, B]

            self._scan_cache[cache_key] = scan_decode

        self.kv, toks = self._scan_cache[cache_key](
            self.weights, self.kv, first, jnp.int32(self.n_past),
            jax.random.PRNGKey(seed + 1),
        )
        t0 = time.perf_counter()
        out = np.concatenate([np.asarray(first)[None], np.asarray(toks)], axis=0).T  # [B, n]
        self.n_past += n_predict - 1
        self.perf.t_decode += time.perf_counter() - t0
        self.perf.n_decode += n_predict - 1
        if eos >= 0:
            trimmed = []
            for row in out:
                stop = np.flatnonzero(row == eos)
                trimmed.append(row[: stop[0]] if stop.size else row)
            return trimmed if self.batch > 1 else trimmed[0]
        return out if self.batch > 1 else out[0]

    def generate_text(self, prompt: str, n_predict: int = 64, sampler=None) -> str:
        assert self.tokenizer is not None, "model has no tokenizer vocab"
        ids = self.tokenizer.encode(prompt)
        out = list(self.generate(ids, n_predict, sampler))
        return self.tokenizer.decode(out)
