"""Sampler chain tests — distribution-level assertions modeled on the
reference's tests/test-sampling.cpp."""
import numpy as np
import pytest

from ggml_hexagon_tpu.runtime.sampling import (
    Candidates,
    Dist,
    Greedy,
    MinP,
    Penalties,
    SamplerChain,
    Temp,
    TopK,
    TopP,
    Typical,
    XTC,
    greedy_chain,
    make_chain,
)


def logits_from_probs(probs):
    return np.log(np.asarray(probs, dtype=np.float32))


def surviving(cand):
    return set(np.flatnonzero(np.isfinite(cand.logits)))


def test_top_k():
    c = Candidates(logits_from_probs([0.4, 0.3, 0.2, 0.1]))
    TopK(2).apply(c)
    assert surviving(c) == {0, 1}


def test_top_p_boundary():
    # test-sampling.cpp: {0.4,0.3,0.2,0.1} with p~0.7 keeps exactly {0,1}
    c = Candidates(logits_from_probs([0.4, 0.3, 0.2, 0.1]))
    TopP(0.69).apply(c)
    assert surviving(c) == {0, 1}
    c = Candidates(logits_from_probs([0.4, 0.3, 0.2, 0.1]))
    TopP(0.71).apply(c)
    assert surviving(c) == {0, 1, 2}


def test_min_p():
    c = Candidates(logits_from_probs([0.5, 0.25, 0.2, 0.05]))
    MinP(0.5).apply(c)  # threshold 0.25
    assert surviving(c) == {0, 1}


def test_typical():
    # uniform distribution: all tokens equally typical, p<1 keeps a prefix
    c = Candidates(logits_from_probs([0.97, 0.01, 0.01, 0.01]))
    Typical(0.5).apply(c)
    assert 0 in surviving(c)


def test_temp_sharpens():
    l = logits_from_probs([0.4, 0.6])
    c = Candidates(l.copy())
    Temp(0.5).apply(c)
    p_cold = c.softmax()
    assert p_cold[1] > 0.6


def test_penalties_discourage_repeats():
    p = Penalties(last_n=8, repeat=1.5)
    for _ in range(3):
        p.accept(2)
    c = Candidates(np.array([1.0, 1.0, 1.0], np.float32))
    p.apply(c)
    assert c.logits[2] < c.logits[0]


def test_greedy_chain_deterministic():
    ch = greedy_chain()
    l = np.array([0.1, 5.0, 0.3], np.float32)
    assert all(ch.sample(l.copy()) == 1 for _ in range(5))


def test_dist_seeded_reproducible():
    l = np.log(np.array([0.5, 0.3, 0.2], np.float32))
    a = SamplerChain([Dist(seed=7)])
    b = SamplerChain([Dist(seed=7)])
    seq_a = [a.sample(l.copy()) for _ in range(20)]
    seq_b = [b.sample(l.copy()) for _ in range(20)]
    assert seq_a == seq_b


def test_dist_matches_distribution():
    probs = np.array([0.6, 0.3, 0.1])
    l = np.log(probs.astype(np.float32))
    ch = SamplerChain([Dist(seed=0)])
    draws = np.array([ch.sample(l.copy()) for _ in range(4000)])
    freq = np.bincount(draws, minlength=3) / draws.size
    np.testing.assert_allclose(freq, probs, atol=0.03)


def test_make_chain_full_pipeline():
    ch = make_chain(temp=0.8, top_k=10, top_p=0.9, min_p=0.05, seed=3,
                    penalty_repeat=1.2, penalty_last_n=16)
    rng = np.random.default_rng(0)
    l = rng.normal(size=512).astype(np.float32)
    toks = [ch.sample(l.copy()) for _ in range(32)]
    assert all(0 <= t < 512 for t in toks)
    # greedy temp<=0 path
    ch2 = make_chain(temp=0.0)
    assert ch2.sample(l.copy()) == int(np.argmax(l))


def test_xtc_removes_top():
    c = Candidates(logits_from_probs([0.6, 0.3, 0.1]))
    x = XTC(p=1.0, threshold=0.2, seed=0)
    x.apply(c)
    # both 0 and 1 exceed threshold; all but the LAST (lowest prob above) removed
    assert 0 not in surviving(c) and 1 in surviving(c)


def test_dry_penalizes_repeats():
    from ggml_hexagon_tpu.runtime.sampling import DRY

    d = DRY(multiplier=1.0, base=2.0, allowed_length=2)
    # context ... 5 6 7 5 6  -> continuing with 7 extends the repeat (len 2)
    for t in [1, 5, 6, 7, 5, 6]:
        d.accept(t)
    c = Candidates(np.zeros(10, np.float32))
    d.apply(c)
    assert c.logits[7] < 0          # repeat continuation penalized
    assert c.logits[3] == 0         # unrelated token untouched
    # longer repeats penalized harder
    d2 = DRY(multiplier=1.0, base=2.0, allowed_length=2)
    for t in [5, 6, 7, 8, 5, 6, 7]:
        d2.accept(t)
    c2 = Candidates(np.zeros(10, np.float32))
    d2.apply(c2)
    assert c2.logits[8] < c.logits[7]


def test_mirostat_v1_converges_surprise():
    from ggml_hexagon_tpu.runtime.sampling import Candidates, MirostatV1

    rng = np.random.default_rng(0)
    s = MirostatV1(n_vocab=200, tau=3.0, eta=0.2, seed=1)
    surprises = []
    for _ in range(150):
        # Zipf-ish logits
        logits = (-1.2 * np.log(np.arange(1, 201))).astype(np.float32)
        rng.shuffle(logits)
        c = Candidates(logits=logits.copy())
        s.apply(c)
        tid = int(np.argmax(c.logits))
        s.accept(tid)
        surprises.append(s._last_surprise)
    # mu control loop keeps observed surprise near tau on average
    assert abs(np.mean(surprises[50:]) - 3.0) < 1.5


def test_infill_prefers_eog_when_dominant():
    from ggml_hexagon_tpu.runtime.sampling import Candidates, Infill

    V = 16
    eog = {2}
    s = Infill(is_eog=lambda t: t in eog, piece=lambda t: f"tok{t}".encode(),
               eot_id=2)
    logits = np.full(V, -2.0, np.float32)
    logits[2] = 5.0  # EOG dominates
    c = Candidates(logits=logits.copy())
    s.apply(c)
    assert np.argmax(c.logits) == 2
    assert np.isneginf(c.logits[[0, 1, 3]]).all()


def test_infill_merges_prefixes_and_thresholds():
    from ggml_hexagon_tpu.runtime.sampling import Candidates, Infill

    pieces = {0: b"he", 1: b"hello", 2: b"", 3: b"x", 4: b"y"}
    s = Infill(is_eog=lambda t: t == 2, piece=lambda t: pieces.get(t, b""),
               eot_id=2)
    # 'he' (0.3) is a prefix of 'hello' (0.4) -> merged into 'hello' (0.7)
    logits = np.log(np.array([0.3, 0.4, 0.01, 0.19, 0.10], np.float32))
    c = Candidates(logits=logits.copy())
    s.apply(c)
    probs = c.softmax()
    assert np.argmax(probs) == 1          # merged mass went to 'hello'
    assert probs[1] > 0.75                # 0.7 of 0.9 kept mass
    assert np.isneginf(c.logits[0])       # prefix token was merged away
