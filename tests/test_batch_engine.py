"""Continuous-batching scheduler tests.

Key invariant (matches the reference's slot model): each slot's output must
be IDENTICAL to running its request alone on a plain Engine — batching and
slot interleaving must not change any sequence's result."""
import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.models.convert_hf import convert_hf_llama
from ggml_hexagon_tpu.quant.formats import GGMLType
from ggml_hexagon_tpu.runtime import Engine, greedy_chain, make_chain
from ggml_hexagon_tpu.server import BatchEngine

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=300, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False)
    torch.manual_seed(7)
    m = transformers.LlamaForCausalLM(cfg)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    toks = ["<unk>", "<s>", "</s>"] + [f"<0x{b:02X}>" for b in range(256)] + [f"t{i}" for i in range(41)]
    p = str(tmp_path_factory.mktemp("srv") / "m.gguf")
    convert_hf_llama(sd, cfg, p, qtype=GGMLType.F32, tokenizer_fields={
        "tokenizer.ggml.model": "llama", "tokenizer.ggml.tokens": toks[:300],
        "tokenizer.ggml.scores": [0.0]*300,
        "tokenizer.ggml.token_type": [2, 3, 3] + [6]*256 + [1]*41})
    return p


def baseline(model, prompt, n):
    eng = Engine.from_gguf(model, max_seq=128, compute_dtype=jnp.float32,
                           kv_dtype=jnp.float32)
    return list(eng.generate(prompt, n_predict=n, sampler=greedy_chain(), stop_ids=set()))


def test_single_request_matches_engine(model):
    be = BatchEngine.from_gguf(model, n_slots=2, max_seq=128,
                               kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    prompt = [1, 10, 20, 30]
    got = be.complete(prompt, n_predict=12, stop_ids=set())
    assert got == baseline(model, prompt, 12)


def test_concurrent_requests_all_match(model):
    be = BatchEngine.from_gguf(model, n_slots=4, max_seq=128,
                               kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(3, 299, size=n).tolist() for n in (4, 9, 17, 3)]
    queues = [be.submit(p, n_predict=10, stop_ids=set()) for p in prompts]
    be.run_until_idle()
    for p, q in zip(prompts, queues):
        out = []
        while True:
            tok, fin = q.get_nowait()
            if tok is None:
                break
            out.append(tok)
        assert out == baseline(model, p, 10), f"slot output diverged for prompt {p[:3]}..."


def test_more_requests_than_slots(model):
    be = BatchEngine.from_gguf(model, n_slots=2, max_seq=128,
                               kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    rng = np.random.default_rng(1)
    prompts = [rng.integers(3, 299, size=5).tolist() for _ in range(5)]
    queues = [be.submit(p, n_predict=6, stop_ids=set()) for p in prompts]
    be.run_until_idle()
    for p, q in zip(prompts, queues):
        out = [t for t, _ in iter(q.get_nowait, (None, "stop"))
               if t is not None] if False else []
        while True:
            tok, fin = q.get_nowait()
            if tok is None:
                assert fin == "length"
                break
            out.append(tok)
        assert out == baseline(model, p, 6)
    assert be.metrics["n_requests"] == 5
    assert be.metrics["n_tokens_generated"] == 30


def test_long_prompt_chunked(model):
    be = BatchEngine.from_gguf(model, n_slots=2, max_seq=256,
                               kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    rng = np.random.default_rng(2)
    prompt = rng.integers(3, 299, size=150).tolist()  # > PROMPT_CHUNK
    got = be.complete(prompt, n_predict=5, stop_ids=set())
    eng = Engine.from_gguf(model, max_seq=256, compute_dtype=jnp.float32,
                           kv_dtype=jnp.float32)
    want = list(eng.generate(prompt, n_predict=5, sampler=greedy_chain(), stop_ids=set()))
    assert got == want


def test_slot_save_restore(model, tmp_path):
    """Saved slot restored into a fresh engine continues identically
    (the reference's test_slot_save.py property)."""
    be = BatchEngine.from_gguf(model, n_slots=2, max_seq=128,
                               kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    rng = np.random.default_rng(5)
    prompt = rng.integers(3, 299, size=10).tolist()
    out1 = be.complete(prompt, n_predict=4, stop_ids=set())
    # slot 0 is reset after finishing; re-prime it by prefilling again
    q = be.submit(prompt + out1, n_predict=1, stop_ids=set())
    be.run_until_idle()
    while not q.empty():
        q.get_nowait()
    # the finished slot has been reset; emulate a live slot by re-running
    # prompt processing only, then save mid-stream
    be2 = BatchEngine.from_gguf(model, n_slots=2, max_seq=128,
                                kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    q2 = be2.submit(prompt, n_predict=8, stop_ids=set())
    # advance only the prompt phase
    while be2.slots[0].state.name == "IDLE" or be2.slots[0].state.name == "PROMPT":
        be2.step()
        if be2.slots[0].state.name == "GENERATING":
            break
    p = str(tmp_path / "slot.npz")
    # freeze the generating slot's cache rows
    sid = 0
    be2.save_slot(sid, p)
    want = []
    while True:
        try:
            tok, fin = q2.get_nowait()
        except Exception:
            be2.step()
            continue
        if tok is None:
            break
        want.append(tok)
    # restore into a fresh engine and decode the same continuation
    be3 = BatchEngine.from_gguf(model, n_slots=2, max_seq=128,
                                kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    be3.restore_slot(0, p)
    s = be3.slots[0]
    from ggml_hexagon_tpu.runtime.sampling import greedy_chain as gc
    import jax.numpy as jnpp
    # recompute the pending logits at the restored position and decode
    got = []
    import numpy as npp
    from ggml_hexagon_tpu.models.llama import forward
    logits, be3.kv = be3._fwd(
        be3.weights,
        jnpp.asarray(npp.asarray([s.prompt[-1:]] + [[0]] * (be3.n_slots - 1),
                                 npp.int32).reshape(be3.n_slots, 1)),
        be3.kv,
        jnpp.asarray(npp.asarray([s.n_past - 1] + [be3.park_pos] * (be3.n_slots - 1), npp.int32)),
    )
    cur = npp.asarray(logits)[0]
    sampler = gc()
    for _ in range(len(want)):
        tok = sampler.sample(cur)
        got.append(tok)
        logits, be3.kv = be3._fwd(
            be3.weights,
            jnpp.asarray(npp.asarray([[tok]] + [[0]] * (be3.n_slots - 1), npp.int32)),
            be3.kv,
            jnpp.asarray(npp.asarray([s.n_past] + [be3.park_pos] * (be3.n_slots - 1), npp.int32)),
        )
        s.n_past += 1
        cur = npp.asarray(logits)[0]
    assert got == want


def test_speculative_decoding_matches_and_accepts(model):
    """Per-slot server speculation (server.cpp:3269+ analog): with the
    draft == target, every proposal agrees -> multi-token accepts per
    tick, and the outputs stay IDENTICAL to non-speculative decoding."""
    from ggml_hexagon_tpu.gguf.reader import GGUFReader
    from ggml_hexagon_tpu.models.llama import load_llama_weights
    from ggml_hexagon_tpu.server.batch_engine import DraftModel

    with GGUFReader.open(model) as r:
        dcfg, dweights = load_llama_weights(r, dtype=jnp.float32)
    draft = DraftModel(dcfg, dweights, n_slots=2, max_seq=128,
                       compute_dtype=jnp.float32, kv_dtype=jnp.float32)
    be = BatchEngine.from_gguf(model, n_slots=2, max_seq=128,
                               kv_dtype=jnp.float32,
                               compute_dtype=jnp.float32,
                               draft=draft, n_draft=4, draft_p_min=0.0)
    prompts = [[1, 10, 20, 30], [1, 50, 60]]
    queues = [be.submit(p, n_predict=12, stop_ids=set()) for p in prompts]
    be.run_until_idle()
    for p, q in zip(prompts, queues):
        out = []
        while True:
            tok, fin = q.get_nowait()
            if tok is None:
                break
            out.append(tok)
        assert out == baseline(model, p, 12)
    # multi-token accepts happened (an untrained model's near-uniform
    # logits make T=1-vs-T=5 reduction-order argmax flips common, so full
    # acceptance is not expected — correctness is the baseline match above)
    assert be.metrics["n_draft_proposed"] > 0
    assert be.metrics["n_draft_accepted"] >= be.metrics["n_draft_proposed"] * 0.25


def test_ctx_shift_slot_survives_window(model):
    """ctx_shift=True: a conversation longer than the window keeps going
    (server.cpp:3202-3214 ctx-shift) instead of finishing context_full."""
    be = BatchEngine.from_gguf(model, n_slots=1, max_seq=48,
                               kv_dtype=jnp.float32,
                               compute_dtype=jnp.float32,
                               ctx_shift=True, n_keep=4)
    q = be.submit([1, 10, 20, 30], n_predict=70, stop_ids=set())
    be.run_until_idle()
    out, fin = [], None
    while True:
        tok, f = q.get_nowait()
        if tok is None:
            fin = f
            break
        out.append(tok)
    assert len(out) == 70 and fin == "length"
    assert be.metrics["n_ctx_shifts"] >= 1


def test_prompt_cache_multiturn_reuse(model):
    """Cached-prompt prefix reuse (server.cpp:2883,3042-3164): a second
    turn whose prompt extends the slot's resident tokens prefills ONLY the
    tail — and still produces exactly the baseline tokens."""
    be = BatchEngine.from_gguf(model, n_slots=1, max_seq=256,
                               kv_dtype=jnp.float32,
                               compute_dtype=jnp.float32)
    rng = np.random.default_rng(3)
    p1 = rng.integers(3, 299, size=150).tolist()  # > PROMPT_CHUNK
    out1 = be.complete(p1, n_predict=6, stop_ids=set())
    assert be.metrics["n_prompt_tokens_cached"] == 0
    # multi-turn: user appends to the conversation (prompt extends the
    # resident tokens: p1 + generated + new user tokens)
    p2 = p1 + out1 + rng.integers(3, 299, size=5).tolist()
    ticks = 0
    orig = be._prompt_tick

    def counting(slots):
        nonlocal ticks
        ticks += 1
        return orig(slots)

    be._prompt_tick = counting
    out2 = be.complete(p2, n_predict=6, stop_ids=set())
    # resident rows cover p1 + out1[:-1] (the last sampled token's row is
    # written by the first decode forward of turn 2's... it was never
    # forwarded) -> reuse >= len(p1), so the >150-token prompt fits ONE
    # prompt tick instead of two
    assert be.metrics["n_prompt_tokens_cached"] >= len(p1)
    assert ticks == 1
    # and the output is exactly what a fresh engine computes for p2
    eng = Engine.from_gguf(model, max_seq=256, compute_dtype=jnp.float32,
                           kv_dtype=jnp.float32)
    want = list(eng.generate(p2, n_predict=6, sampler=greedy_chain(),
                             stop_ids=set()))
    assert out2 == want


def test_prompt_cache_opt_out_and_divergent_prefix(model):
    """cache_prompt=False never reuses; a divergent second prompt reuses
    only the common prefix and still matches the baseline."""
    be = BatchEngine.from_gguf(model, n_slots=1, max_seq=128,
                               kv_dtype=jnp.float32,
                               compute_dtype=jnp.float32)
    p1 = [1, 10, 20, 30, 40, 50]
    be.complete(p1, n_predict=4, stop_ids=set())
    q = be.submit(p1, n_predict=4, stop_ids=set(), cache_prompt=False)
    be.run_until_idle()
    assert be.metrics["n_prompt_tokens_cached"] == 0
    out = []
    while True:
        tok, _ = q.get_nowait()
        if tok is None:
            break
        out.append(tok)
    assert out == baseline(model, p1, 4)
    # divergent turn: shares only the first 3 tokens
    p3 = [1, 10, 20, 99, 98]
    out3 = be.complete(p3, n_predict=4, stop_ids=set())
    assert be.metrics["n_prompt_tokens_cached"] == 3
    assert out3 == baseline(model, p3, 4)


def test_prompt_cache_slot_affinity(model):
    """With several idle slots, a request lands on the slot with the
    longest matching resident prefix (the reference's similarity-based
    slot selection)."""
    be = BatchEngine.from_gguf(model, n_slots=2, max_seq=128,
                               kv_dtype=jnp.float32,
                               compute_dtype=jnp.float32)
    pa = [1, 10, 20, 30, 40]
    pb = [1, 50, 60, 70, 80]
    qa = be.submit(pa, n_predict=3, stop_ids=set())
    qb = be.submit(pb, n_predict=3, stop_ids=set())
    be.run_until_idle()
    for q in (qa, qb):
        while q.get_nowait()[0] is not None:
            pass
    cached0 = be.metrics["n_prompt_tokens_cached"]
    # resubmit pb: must hit the slot that served pb, whichever that was
    out = be.complete(pb, n_predict=3, stop_ids=set())
    assert be.metrics["n_prompt_tokens_cached"] - cached0 == len(pb) - 1
    assert out == baseline(model, pb, 3)


def test_spec_draft_decoupling_policy():
    """The batched draft round stops once a minority of slots remain
    drafting (round-3 weak #4: one long-drafting slot must not hold the
    tick for the whole batch)."""
    assert BatchEngine._spec_continue(4, 4)
    assert BatchEngine._spec_continue(2, 4)
    assert not BatchEngine._spec_continue(1, 4)
    assert not BatchEngine._spec_continue(3, 8)
    assert BatchEngine._spec_continue(1, 1)  # single slot always drafts


def test_spec_decoupled_still_matches_baseline(model):
    """4 heterogeneous slots with a real p_min cutoff: the decoupled
    draft loop preserves the per-slot correctness invariant."""
    from ggml_hexagon_tpu.gguf.reader import GGUFReader
    from ggml_hexagon_tpu.models.llama import load_llama_weights
    from ggml_hexagon_tpu.server.batch_engine import DraftModel

    with GGUFReader.open(model) as r:
        dcfg, dweights = load_llama_weights(r, dtype=jnp.float32)
    draft = DraftModel(dcfg, dweights, n_slots=4, max_seq=128,
                       compute_dtype=jnp.float32, kv_dtype=jnp.float32)
    be = BatchEngine.from_gguf(model, n_slots=4, max_seq=128,
                               kv_dtype=jnp.float32,
                               compute_dtype=jnp.float32,
                               draft=draft, n_draft=6, draft_p_min=0.02)
    rng = np.random.default_rng(9)
    prompts = [rng.integers(3, 299, size=n).tolist() for n in (4, 7, 5, 9)]
    queues = [be.submit(p, n_predict=8, stop_ids=set()) for p in prompts]
    be.run_until_idle()
    for p, q in zip(prompts, queues):
        out = []
        while True:
            tok, fin = q.get_nowait()
            if tok is None:
                break
            out.append(tok)
        assert out == baseline(model, p, 8)


def _drain(q):
    out = []
    while True:
        tok, fin = q.get_nowait()
        if tok is None:
            return out, fin
        out.append(tok)


def _mk_draft(model, n_slots, max_seq=128):
    from ggml_hexagon_tpu.gguf.reader import GGUFReader
    from ggml_hexagon_tpu.models.llama import load_llama_weights
    from ggml_hexagon_tpu.server.batch_engine import DraftModel

    with GGUFReader.open(model) as r:
        dcfg, dweights = load_llama_weights(r, dtype=jnp.float32)
    return DraftModel(dcfg, dweights, n_slots=n_slots, max_seq=max_seq,
                      compute_dtype=jnp.float32, kv_dtype=jnp.float32)


def test_slot_save_restore_quantized_kv(model, tmp_path):
    """q8_0-cache slot save/restore roundtrip: the per-row scale planes
    k_d/v_d must survive (round-4 weak #3 — dropping them makes a
    restored slot attend with stale scales)."""
    prompt = [1, 10, 20, 30]
    be = BatchEngine.from_gguf(model, n_slots=2, max_seq=128,
                               kv_dtype="q8_0", compute_dtype=jnp.float32)
    out1 = be.complete(prompt, n_predict=6, stop_ids=set())
    assert set(be.kv) == {"k", "v", "k_d", "v_d"}
    path = str(tmp_path / "slot0.npz")
    sid = next(s.id for s in be.slots if s.n_past > 0)
    be.save_slot(sid, path)
    orig = {n: np.asarray(a[:, sid]).copy() for n, a in be.kv.items()}
    n_past = be.slots[sid].n_past
    # corrupt everything, then restore: every plane must round-trip
    be.erase_slot(sid)
    be.kv = {n: jnp.zeros_like(a) for n, a in be.kv.items()}
    be.restore_slot(sid, path)
    for n in orig:
        np.testing.assert_array_equal(np.asarray(be.kv[n][:, sid]), orig[n])
    assert be.slots[sid].n_past == n_past
    # and the restored slot CONTINUES exactly like a fresh engine
    out2 = be.complete(prompt + out1, n_predict=6, stop_ids=set())
    be2 = BatchEngine.from_gguf(model, n_slots=2, max_seq=128,
                                kv_dtype="q8_0", compute_dtype=jnp.float32)
    assert out2 == be2.complete(prompt + out1, n_predict=6, stop_ids=set())


def test_spec_stateful_sampler_matches_nonspec(model):
    """Atomic sample-and-accept (round-4 weak #4): with a STATEFUL
    stochastic chain (repeat-penalty ring + seeded RNG draws), speculative
    output must equal non-speculative output — any position sampled twice
    (the old re-sample of accepted[-1]) desyncs the RNG stream and the
    penalty ring and diverges."""
    mk = lambda: make_chain(temp=0.9, top_k=0, top_p=1.0, min_p=0.0,
                            penalty_last_n=8, penalty_repeat=1.4, seed=11)
    prompt = [1, 10, 20, 30]
    be_ref = BatchEngine.from_gguf(model, n_slots=1, max_seq=128,
                                   kv_dtype=jnp.float32,
                                   compute_dtype=jnp.float32)
    q = be_ref.submit(prompt, n_predict=14, sampler=mk(), stop_ids=set())
    be_ref.run_until_idle()
    want, _ = _drain(q)

    be = BatchEngine.from_gguf(model, n_slots=1, max_seq=128,
                               kv_dtype=jnp.float32,
                               compute_dtype=jnp.float32,
                               draft=_mk_draft(model, 1), n_draft=4,
                               draft_p_min=0.0)
    q = be.submit(prompt, n_predict=14, sampler=mk(), stop_ids=set())
    be.run_until_idle()
    got, _ = _drain(q)
    assert got == want
    assert be.metrics["n_draft_proposed"] > 0


def test_ctx_shift_draft_refeed_bounded(model):
    """After a context shift the draft cache re-syncs by CHUNKED re-prefill
    (round-4 weak #6), not a one-token-per-forward replay of the whole
    history — and generation with a draft still matches the no-draft
    engine through the shift."""
    from functools import partial as _part

    prompt = [1, 10, 20, 30]
    be_ref = BatchEngine.from_gguf(model, n_slots=1, max_seq=48,
                                   kv_dtype=jnp.float32,
                                   compute_dtype=jnp.float32,
                                   ctx_shift=True, n_keep=4)
    q = be_ref.submit(prompt, n_predict=50, stop_ids=set())
    be_ref.run_until_idle()
    want, _ = _drain(q)
    assert be_ref.metrics["n_ctx_shifts"] >= 1

    draft = _mk_draft(model, 1, max_seq=64)
    be = BatchEngine.from_gguf(model, n_slots=1, max_seq=48,
                               kv_dtype=jnp.float32,
                               compute_dtype=jnp.float32,
                               draft=draft, n_draft=4, draft_p_min=0.0,
                               ctx_shift=True, n_keep=4)
    calls = {"one": 0, "chunk": 0}
    inner = draft._fwd

    def counting_fwd(w, toks, kv, pos, **kw):
        calls["one" if toks.shape[1] == 1 else "chunk"] += 1
        return inner(w, toks, kv, pos, **kw)

    draft._fwd = counting_fwd
    q = be.submit(prompt, n_predict=50, stop_ids=set())
    be.run_until_idle()
    got, fin = _drain(q)
    # shift TIMING differs between the engines (spec_room reserves
    # 1+n_draft slots), so full-sequence equality is not expected — the
    # pre-shift prefix must match and the slot must survive to length
    assert got[:30] == want[:30]
    assert len(got) == 50 and fin == "length"
    assert be.metrics["n_ctx_shifts"] >= 1
    # the refeed ran chunked (>= one [B, chunk] forward per shift) and
    # the draft frontier is synced — the per-round [B,1] catch-up never
    # replays history, so [B,1] forwards stay bounded by
    # rounds * (seed + n_draft + ~2 catch-up) with rounds <= 50
    assert calls["chunk"] >= be.metrics["n_ctx_shifts"]
    assert calls["one"] <= 50 * (1 + 4 + 2), calls
    s = be.slots[0]
    assert int(draft.n_past[0]) >= s.n_past - 1
