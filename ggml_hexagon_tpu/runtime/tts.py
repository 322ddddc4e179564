"""OuteTTS text-to-speech pipeline — the llama-tts analog.

Reference counterpart: examples/tts/tts.cpp — an OuteTTS "ttc" LM turns a
formatted text prompt into audio-code tokens; the WavTokenizer-dec vocoder
(models/wavtokenizer.py) turns the codes into a 24 kHz waveform.

Pieces ported by behavior:
  - process_text / number expansion        tts.cpp:281-417
  - guide tokens (anti-hallucination)      tts.cpp:437-466, 866-890
  - speaker json -> audio_text/audio_data  tts.cpp:482-553
  - code-id window [151672, 155772]        tts.cpp:1000-1010
"""
from __future__ import annotations

import json as _json
import re

import numpy as np

_ONES = ("zero one two three four five six seven eight nine ten eleven twelve "
         "thirteen fourteen fifteen sixteen seventeen eighteen nineteen"
         ).split()
_TENS = ("zero ten twenty thirty forty fifty sixty seventy eighty ninety"
         ).split()

# token-id window the TTC model uses for audio codes (tts.cpp:1000)
CODE_TOKEN_OFFSET = 151672
CODE_TOKEN_MAX = 155772
NEWLINE_ID = 198  # next_token_uses_guide_token trigger (tts.cpp:889)


def _less_than_thousand(n: int) -> str:
    parts = []
    if n >= 100:
        parts.append(_ONES[n // 100] + " hundred")
        n %= 100
    if n >= 20:
        parts.append(_TENS[n // 10])
        n %= 10
    if n > 0:
        parts.append(_ONES[n])
    return " ".join(parts)


def number_to_words(s: str) -> str:
    """Integer/decimal string -> English words (tts.cpp:313-361)."""
    int_part, _, dec_part = s.partition(".")
    try:
        n = int(int_part)
    except ValueError:
        return " "
    if n == 0:
        out = "zero"
    else:
        out = ""
        for scale, name in ((10**9, "billion"), (10**6, "million"),
                            (10**3, "thousand")):
            if n >= scale:
                out += _less_than_thousand(n // scale) + f" {name} "
                n %= scale
        if n > 0:
            out += _less_than_thousand(n)
    if dec_part:
        out += " point" + "".join(" " + _ONES[int(d)] for d in dec_part
                                  if d.isdigit())
    return out


def process_text(text: str, version: str = "0.2") -> str:
    """Text -> OuteTTS word stream with <|text_sep|>/<|space|> separators
    (tts.cpp:382-417)."""
    text = re.sub(r"\d+(\.\d+)?", lambda m: number_to_words(m.group()), text)
    text = text.lower()
    text = re.sub(r"[-_/,\.\\]", " ", text)
    text = re.sub(r"[^a-z\s]", "", text)
    text = re.sub(r"\s+", " ", text).strip()
    sep = "<|space|>" if version == "0.3" else "<|text_sep|>"
    return text.replace(" ", sep)


def speaker_audio_text(speaker: dict, version: str = "0.2") -> str:
    """Speaker json -> audio_text prompt segment (tts.cpp:audio_text_from_speaker)."""
    sep = "<|space|>" if version == "0.3" else "<|text_sep|>"
    return "<|text_start|>" + "".join(
        w["word"] + sep for w in speaker.get("words", []))


def speaker_audio_data(speaker: dict, version: str = "0.2") -> str:
    """Speaker json -> audio_data prompt segment (tts.cpp:audio_data_from_speaker)."""
    out = "<|audio_start|>\n"
    for w in speaker.get("words", []):
        dur = f"<|t_{w['duration']:.2f}|>"
        codes = "".join(f"<|{c}|>" for c in w["codes"])
        if version == "0.3":
            out += w["word"] + dur + codes + "<|space|>\n"
        else:
            out += w["word"] + dur + "<|code_start|>" + codes + "<|code_end|>\n"
    return out


def build_prompt_ids(tokenizer, text: str, speaker: dict | None = None,
                     version: str = "0.2") -> tuple[list[int], list[int]]:
    """Assemble the TTC prompt (tts.cpp:666-718) and guide tokens.

    Returns (prompt_ids, guide_tokens).  Guide tokens are the first token of
    each word, used to pin word fragments during generation (tts.cpp:437)."""
    ids = tokenizer.encode("<|im_start|>\n", parse_special=True)
    clean = process_text(text, version)
    guide = [tokenizer.encode("\n", add_bos=False)[0]]
    sep = "<|space|>" if version == "0.3" else "<|text_sep|>"
    for word in clean.split(sep):
        toks = tokenizer.encode(word, add_bos=False)
        if toks:
            guide.append(toks[0])
    if speaker:
        ids += tokenizer.encode(speaker_audio_text(speaker, version),
                                add_bos=False)
    else:
        ids += tokenizer.encode("<|text_start|>", add_bos=False, parse_special=True)
    ids += tokenizer.encode(clean, add_bos=False)
    ids += tokenizer.encode("<|text_end|>\n", add_bos=False, parse_special=True)
    if speaker:
        ids += tokenizer.encode(speaker_audio_data(speaker, version),
                                add_bos=False)
    else:
        ids += tokenizer.encode("<|audio_start|>\n", add_bos=False, parse_special=True)
    return ids, guide


def generate_codes(engine, prompt_ids, guide_tokens=None, n_predict: int = 768,
                   sampler=None) -> list[int]:
    """Run the TTC LM and return vocoder code indices (id - 151672).

    Implements the guide-token override: after each newline the next sampled
    token is replaced by the next guide token (tts.cpp:866-890)."""
    from .sampling import make_chain

    sampler = sampler or make_chain(temp=0.0)
    guide = list(guide_tokens or [])
    eos = engine.vocab.eos_id if engine.vocab else -1
    out: list[int] = []
    logits = engine.prefill(np.asarray(prompt_ids, np.int32)[None, :])
    use_guide = True
    for _ in range(n_predict):
        tok = sampler.sample(logits[0])
        if guide and use_guide and tok != eos:
            tok = guide.pop(0)
        use_guide = tok == NEWLINE_ID
        if tok == eos:
            break
        out.append(int(tok))
        logits = engine.decode_one(np.array([tok]))
    return [t - CODE_TOKEN_OFFSET for t in out
            if CODE_TOKEN_OFFSET <= t <= CODE_TOKEN_MAX]


def synthesize(ttc_path: str, vocoder_path: str, text: str,
               speaker_file: str | None = None, n_predict: int = 768,
               max_seq: int = 4096):
    """Full pipeline: text -> codes -> waveform.  Returns float32 samples."""
    from ..gguf import GGUFReader
    from ..models.wavtokenizer import codes_to_audio, load_wavtok_weights
    from .engine import Engine

    speaker = None
    version = "0.2"
    if speaker_file:
        speaker = _json.loads(open(speaker_file).read())
        version = str(speaker.get("version", "0.2"))
    eng = Engine.from_gguf(ttc_path, max_seq=max_seq)
    prompt_ids, guide = build_prompt_ids(eng.tokenizer, text, speaker, version)
    codes = generate_codes(eng, prompt_ids, guide, n_predict=n_predict)
    with GGUFReader.open(vocoder_path) as r:
        cfg, w = load_wavtok_weights(r)
    return codes_to_audio(cfg, w, np.asarray(codes, np.int32))
