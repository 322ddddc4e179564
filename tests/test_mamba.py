"""Mamba (recurrent SSM) differential tests vs transformers."""
import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.gguf import GGUFReader
from ggml_hexagon_tpu.models.mamba import (
    MambaConfig, convert_hf_mamba, forward, init_mamba_state, load_mamba_weights)
from ggml_hexagon_tpu.quant.formats import GGMLType

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cfg = transformers.MambaConfig(
        vocab_size=256, hidden_size=128, state_size=16,
        num_hidden_layers=2, conv_kernel=4, expand=2, time_step_rank=8)
    torch.manual_seed(9)
    m = transformers.MambaForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    p = str(tmp_path_factory.mktemp("mamba") / "m.gguf")
    convert_hf_mamba(sd, cfg, p, qtype=GGMLType.F32)
    return p, m


def test_mamba_logits_match_hf(setup):
    path, hf = setup
    with GGUFReader.open(path) as r:
        cfg, weights = load_mamba_weights(r)
    assert cfg.d_inner == 256 and cfg.d_state == 16 and cfg.d_conv == 4
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 256, size=(2, 11))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    state = init_mamba_state(cfg, 2)
    logits, _ = forward(cfg, weights, jnp.asarray(ids, jnp.int32), state,
                        logits_all=True)
    ours = np.asarray(logits)
    err = np.abs(ours - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-3, f"max rel err {err}"


def test_mamba_recurrent_state_composition(setup):
    """prefill(a+b) == prefill(a) then prefill(b) with carried state —
    the recurrent-cache analog of KV prefill/decode equivalence."""
    path, _ = setup
    with GGUFReader.open(path) as r:
        cfg, weights = load_mamba_weights(r)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 256, size=(1, 12))
    full, _ = forward(cfg, weights, jnp.asarray(ids, jnp.int32),
                      init_mamba_state(cfg, 1), logits_all=True)
    state = init_mamba_state(cfg, 1)
    _, state = forward(cfg, weights, jnp.asarray(ids[:, :7], jnp.int32), state)
    step, _ = forward(cfg, weights, jnp.asarray(ids[:, 7:], jnp.int32), state,
                      logits_all=True)
    np.testing.assert_allclose(np.asarray(step), np.asarray(full)[:, 7:],
                               rtol=2e-4, atol=2e-4)


def test_mamba_greedy_matches_hf(setup):
    path, hf = setup
    with GGUFReader.open(path) as r:
        cfg, weights = load_mamba_weights(r)
    prompt = [3, 10, 50]
    state = init_mamba_state(cfg, 1)
    logits, state = forward(cfg, weights, jnp.asarray([prompt], jnp.int32), state)
    ours = []
    tok = int(np.argmax(np.asarray(logits)[0]))
    for _ in range(8):
        ours.append(tok)
        logits, state = forward(cfg, weights, jnp.asarray([[tok]], jnp.int32), state)
        tok = int(np.argmax(np.asarray(logits)[0]))
    with torch.no_grad():
        theirs = hf.generate(torch.tensor([prompt]), max_new_tokens=8,
                             do_sample=False, pad_token_id=0)[0, 3:].tolist()
    assert ours == theirs
