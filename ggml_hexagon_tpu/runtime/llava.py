"""LLaVA multimodal runtime — image embeddings spliced into the decoder.

The counterpart of the reference's examples/llava/llava-cli.cpp flow:
  load model GGUF + mmproj GGUF (clip.cpp) -> preprocess image ->
  clip encode + project -> eval prompt-before, image embeds, prompt-after
  (llava_eval_image_embed) -> sample.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..gguf.reader import GGUFReader
from ..models.clip import (ClipVisionConfig, encode_image, load_clip_weights,
                           preprocess_image)
from .engine import Engine
from .sampling import greedy_chain


class LlavaEngine:
    """Engine + CLIP tower. Images are referenced in the prompt by the
    placeholder token sequence supplied per call (like llava-cli's
    `<image>` splitting)."""

    def __init__(self, engine: Engine, clip_cfg: ClipVisionConfig, clip_weights):
        self.engine = engine
        self.clip_cfg = clip_cfg
        self.clip_weights = clip_weights

    @classmethod
    def from_gguf(cls, model_path: str, mmproj_path: str, **kw) -> "LlavaEngine":
        eng = Engine.from_gguf(model_path, **kw)
        with GGUFReader.open(mmproj_path) as r:
            ccfg, cw = load_clip_weights(r)
        return cls(eng, ccfg, cw)

    def image_embed(self, image: np.ndarray) -> np.ndarray:
        """uint8 HxWx3 (or pre-normalized [3,S,S]) -> [n_tokens, d_model].
        GLM-Edge adapters splice boi/eoi embeddings around the image tokens
        (clip.cpp:2790)."""
        if image.dtype == np.uint8:
            image = preprocess_image(image, self.clip_cfg)
        pixels = jnp.asarray(image, jnp.float32)[None]
        out = np.asarray(
            encode_image(self.clip_cfg, self.clip_weights, pixels)[0])
        if self.clip_cfg.proj_type == "adapter":
            from ..models.clip import glm_boi_eoi

            boi, eoi = glm_boi_eoi(self.clip_weights)
            if boi is not None:
                out = np.concatenate(
                    [np.asarray(boi), out, np.asarray(eoi)], axis=0)
        return out

    def prefill_multimodal(self, segments) -> np.ndarray:
        """segments: list of (('tokens', [ids]) | ('image', HxWx3 array)).
        Evaluates them in order; returns final-position logits [B, V]."""
        logits = None
        for kind, payload in segments:
            if kind == "tokens":
                if len(payload) == 0:
                    continue
                logits = self.engine.prefill(np.asarray(payload, np.int32)[None])
            elif kind == "image":
                logits = self.engine.prefill_embeds(self.image_embed(payload)[None])
            elif kind == "embeds":
                logits = self.engine.prefill_embeds(np.asarray(payload)[None])
            else:
                raise ValueError(f"unknown segment kind {kind!r}")
        return logits

    def generate(self, segments, n_predict: int = 32, sampler=None,
                 stop_ids=None):
        """Multimodal generation: prefill the segments, then decode."""
        sampler = sampler or greedy_chain()
        stop_ids = stop_ids if stop_ids is not None else set()
        logits = self.prefill_multimodal(segments)
        out = []
        eng = self.engine
        for _ in range(n_predict):
            tok = sampler.sample(logits[0])
            if tok in stop_ids:
                break
            out.append(tok)
            logits = eng.decode_one(np.asarray([tok], np.int32))
        return out
