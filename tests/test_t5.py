"""T5 encoder-decoder differential tests vs transformers."""
import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.gguf import GGUFReader
from ggml_hexagon_tpu.models.t5 import convert_hf_t5, decode, encode, load_t5_weights
from ggml_hexagon_tpu.quant.formats import GGMLType

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module", params=["relu", "gated-gelu"])
def setup(request, tmp_path_factory):
    cfg = transformers.T5Config(
        vocab_size=256, d_model=128, d_kv=32, d_ff=256, num_layers=2,
        num_heads=4, relative_attention_num_buckets=32,
        feed_forward_proj=request.param, tie_word_embeddings=True,
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=1)
    torch.manual_seed(21)
    m = transformers.T5ForConditionalGeneration(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    p = str(tmp_path_factory.mktemp("t5") / f"{request.param}.gguf")
    convert_hf_t5(sd, cfg, p, qtype=GGMLType.F32)
    return p, m


def test_t5_logits_match_hf(setup):
    path, hf = setup
    with GGUFReader.open(path) as r:
        cfg, weights = load_t5_weights(r)
    rng = np.random.default_rng(0)
    enc_ids = rng.integers(2, 256, size=(2, 9))
    dec_ids = np.concatenate([np.zeros((2, 1), dtype=np.int64),
                              rng.integers(2, 256, size=(2, 5))], axis=1)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(enc_ids),
                 decoder_input_ids=torch.tensor(dec_ids)).logits.numpy()
    enc_out = encode(cfg, weights, jnp.asarray(enc_ids, jnp.int32))
    logits = decode(cfg, weights, jnp.asarray(dec_ids, jnp.int32), enc_out)
    ours = np.asarray(logits)
    err = np.abs(ours - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-3, f"max rel err {err}"


def test_t5_greedy_matches_hf(setup):
    path, hf = setup
    with GGUFReader.open(path) as r:
        cfg, weights = load_t5_weights(r)
    enc_ids = np.array([[5, 9, 13, 17]])
    enc_out = encode(cfg, weights, jnp.asarray(enc_ids, jnp.int32))
    dec = [0]
    for _ in range(6):
        logits = decode(cfg, weights, jnp.asarray([dec], jnp.int32), enc_out,
                        logits_all=False)
        dec.append(int(np.argmax(np.asarray(logits)[0])))
    with torch.no_grad():
        ref = hf.generate(torch.tensor(enc_ids), max_new_tokens=6,
                          do_sample=False, min_new_tokens=6).numpy()[0]
    assert dec[1:] == ref[1:7].tolist()
