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

        Raw images dispatch to the model's preprocessing strategy like
        clip_image_preprocess (clip.cpp:2365): minicpmv -> LLaVA-UHD
        slicing, qwen2vl -> native resolution, llava-1.6 pinpoints ->
        multi-crop grid with image_newline, else square resize.  GLM-Edge
        adapters splice boi/eoi embeddings around the image tokens
        (clip.cpp:2790)."""
        cfg = self.clip_cfg
        if image.dtype == np.uint8:
            if cfg.proj_type == "resampler":
                return self._embed_uhd(image)
            if cfg.proj_type == "qwen2vl_merger":
                from ..models.mm_preprocess import normalize, qwen2vl_resize

                px = normalize(qwen2vl_resize(image, cfg.patch_size),
                               cfg.image_mean, cfg.image_std)
                return self._encode(px[None])[0]
            if cfg.image_grid_pinpoints and cfg.proj_type in (
                    "mlp", "mlp_norm"):
                return self._embed_llava16(image)
            image = preprocess_image(image, cfg)
        out = self._encode(np.asarray(image, np.float32)[None])[0]
        if cfg.proj_type == "adapter":
            from ..models.clip import glm_boi_eoi

            boi, eoi = glm_boi_eoi(self.clip_weights)
            if boi is not None:
                out = np.concatenate(
                    [np.asarray(boi), out, np.asarray(eoi)], axis=0)
        return out

    def _encode(self, pixels: np.ndarray) -> np.ndarray:
        return np.asarray(encode_image(
            self.clip_cfg, self.clip_weights, jnp.asarray(pixels)))

    def _embed_llava16(self, image: np.ndarray) -> np.ndarray:
        """llava-1.6 multi-crop: base + grid crops in ONE batched forward
        (all crops share the square shape -> one MXU-shaped program),
        merged with image_newline columns (clip_llava_handle_patches)."""
        from ..models.mm_preprocess import (llava16_merge_embeds,
                                            llava16_preprocess)

        cfg = self.clip_cfg
        batch, grid = llava16_preprocess(image, cfg.image_size,
                                         cfg.image_grid_pinpoints,
                                         cfg.image_mean, cfg.image_std)
        embeds = self._encode(batch)
        newline = self.clip_weights["mm"].get("model.image_newline")
        return llava16_merge_embeds(
            embeds, grid, cfg.image_size // cfg.patch_size,
            None if newline is None else np.asarray(newline))

    def _embed_uhd(self, image: np.ndarray) -> np.ndarray:
        """MiniCPM-V: source resize + refined slices (uhd_slice_image),
        each through the resampler; source first, slices row-major."""
        from ..models.mm_preprocess import normalize, uhd_slice_image

        cfg = self.clip_cfg
        source, rows, _grid = uhd_slice_image(
            image, patch_size=cfg.patch_size)
        parts = [self._encode(normalize(
            source, cfg.image_mean, cfg.image_std)[None])[0]]
        flat = [s for row in rows for s in row]
        if flat:
            # slices share one shape -> batch them
            batch = np.stack([normalize(s, cfg.image_mean, cfg.image_std)
                              for s in flat])
            parts.extend(self._encode(batch))
        return np.concatenate(parts, axis=0)

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
