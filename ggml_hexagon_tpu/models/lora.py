"""LoRA adapters — applied at matmul time, base weights untouched.

Mirrors the reference's adapter design (src/llama-adapter.cpp: ab_map of
name -> (A, B) pairs applied inside build_lora_mm): y = W x + scale * B(A x)
with scale = alpha / r.  Adapter files use the GGUF LoRA convention
(convert_lora_to_gguf.py output: <tensor>.lora_a / <tensor>.lora_b +
adapter.lora.alpha metadata).
"""
from __future__ import annotations

import re

import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader


class LoraAdapter:
    def __init__(self, ab_map: dict, alpha: float, scale: float = 1.0):
        self.ab_map = ab_map  # gguf tensor name -> (A [r, K], B [N, r])
        self.alpha = alpha
        self.scale = scale

    @property
    def names(self):
        return sorted(self.ab_map)

    @classmethod
    def from_gguf(cls, path: str, scale: float = 1.0, dtype=jnp.float32) -> "LoraAdapter":
        with GGUFReader.open(path) as r:
            alpha = float(r.metadata.get("adapter.lora.alpha", 16.0))
            pairs: dict[str, dict] = {}
            for name in r.tensors:
                m = re.match(r"(.*)\.lora_([ab])$", name)
                if not m:
                    continue
                base, which = m.groups()
                pairs.setdefault(base, {})[which] = jnp.asarray(
                    r.tensor_f32(name), dtype=dtype
                )
        ab = {}
        for base, d in pairs.items():
            if "a" in d and "b" in d:
                ab[base] = (d["a"], d["b"])
        return cls(ab, alpha, scale)

    def effective_scale(self, base: str) -> float:
        a, _ = self.ab_map[base]
        r = a.shape[0]
        return self.scale * self.alpha / r


# weight-dict key -> gguf tensor base name (per layer)
_KEY_TO_NAME = {
    "wq": "attn_q.weight", "wk": "attn_k.weight", "wv": "attn_v.weight",
    "wo": "attn_output.weight", "ffn_gate": "ffn_gate.weight",
    "ffn_up": "ffn_up.weight", "ffn_down": "ffn_down.weight",
}


def attach_lora(weights: dict, adapter: LoraAdapter) -> dict:
    """Return a weights dict with lora pairs attached (base planes shared)."""
    out = dict(weights)
    out["layers"] = []
    n_attached = 0
    for il, lw in enumerate(weights["layers"]):
        new_lw = dict(lw)
        for key, suffix in _KEY_TO_NAME.items():
            base = f"blk.{il}.{suffix}"[: -len(".weight")] + ".weight"
            base = f"blk.{il}.{suffix}"
            if base in adapter.ab_map:
                a, b = adapter.ab_map[base]
                new_lw[key + "_lora"] = (a, b, adapter.effective_scale(base))
                n_attached += 1
        out["layers"].append(new_lw)
    if "output.weight" in adapter.ab_map:
        a, b = adapter.ab_map["output.weight"]
        out["output_lora"] = (a, b, adapter.effective_scale("output.weight"))
        n_attached += 1
    if n_attached == 0:
        raise ValueError(
            f"no adapter tensors matched the model; adapter has {adapter.names[:4]}..."
        )
    return out


class ControlVector:
    """Per-layer steering vectors added to the hidden state
    (llama-adapter.h:17 llama_adapter_cvec; cvector-generator output:
    tensors named direction.<layer>)."""

    def __init__(self, directions: dict[int, "jnp.ndarray"], strength: float = 1.0):
        self.directions = directions
        self.strength = strength

    @classmethod
    def from_gguf(cls, path: str, strength: float = 1.0) -> "ControlVector":
        import re as _re

        with GGUFReader.open(path) as r:
            dirs = {}
            for name in r.tensors:
                m = _re.match(r"direction\.(\d+)$", name)
                if m:
                    dirs[int(m.group(1))] = jnp.asarray(r.tensor_f32(name))
        if not dirs:
            raise ValueError("no direction.<layer> tensors found")
        return cls(dirs, strength)


def attach_control_vector(weights: dict, cvec: ControlVector) -> dict:
    out = dict(weights)
    out["layers"] = []
    for il, lw in enumerate(weights["layers"]):
        new_lw = dict(lw)
        if il in cvec.directions:
            new_lw["cvec"] = cvec.directions[il] * cvec.strength
        out["layers"].append(new_lw)
    return out


def write_cvector_gguf(path: str, directions: dict[int, "np.ndarray"]):
    from ..gguf.writer import GGUFWriter

    w = GGUFWriter()
    w.add("general.architecture", "controlvector")
    for il, v in directions.items():
        w.add_tensor(f"direction.{il}", np.asarray(v, np.float32))
    w.write_file(path)
    return path


def write_lora_gguf(path: str, ab_map: dict, alpha: float = 16.0):
    """Write an adapter file (test fixtures / export-lora analog)."""
    from ..gguf.writer import GGUFWriter

    w = GGUFWriter()
    w.add("general.architecture", "llama")
    w.add("general.type", "adapter")
    w.add("adapter.type", "lora")
    w.add("adapter.lora.alpha", float(alpha))
    for base, (a, b) in ab_map.items():
        w.add_tensor(f"{base}.lora_a", np.asarray(a, np.float32))
        w.add_tensor(f"{base}.lora_b", np.asarray(b, np.float32))
    w.write_file(path)
    return path


def merge_lora_gguf(base_path: str, lora_paths, out_path: str,
                    scales=None, out_type=None):
    """Merge LoRA adapter(s) into base weights -> new GGUF
    (examples/export-lora analog: W' = W + scale*(alpha/r)*B@A per tensor;
    quantized bases are dequantized first, output written as F16 by default
    like the reference's --outtype default)."""
    from ..gguf.reader import GGUFReader
    from ..gguf.writer import GGUFWriter
    from ..quant.formats import GGMLType

    if isinstance(lora_paths, str):
        lora_paths = [lora_paths]
    scales = scales or [1.0] * len(lora_paths)
    adapters = [LoraAdapter.from_gguf(p, scale=s)
                for p, s in zip(lora_paths, scales)]
    out_type = out_type or GGMLType.F16
    with GGUFReader.open(base_path) as r:
        w = GGUFWriter()
        for k, v in r.metadata.items():
            w.add(k, v)
        n_merged = 0
        for name, t in r.tensors.items():
            touched = [ad for ad in adapters if name in ad.ab_map]
            if not touched:
                w.add_tensor(name, np.asarray(r.tensor_bytes(name)),
                             t.ggml_type, raw_ne=t.ne)
                continue
            x = r.tensor_f32(name)
            for ad in touched:
                a, b = ad.ab_map[name]
                x = x + ad.effective_scale(name) * np.asarray(
                    np.asarray(b, np.float32) @ np.asarray(a, np.float32))
            ot = out_type if t.ggml_type not in (GGMLType.F32,) else t.ggml_type
            w.add_tensor(name, np.asarray(x, np.float32), ot)
            n_merged += 1
        if n_merged == 0:
            raise ValueError("no adapter tensors matched the base model")
        w.write_file(out_path)
    return out_path


# HF PEFT module path -> GGUF tensor stem (convert_lora_to_gguf.py analog)
_PEFT_TO_GGUF = {
    "self_attn.q_proj": "attn_q", "self_attn.k_proj": "attn_k",
    "self_attn.v_proj": "attn_v", "self_attn.o_proj": "attn_output",
    "mlp.gate_proj": "ffn_gate", "mlp.up_proj": "ffn_up",
    "mlp.down_proj": "ffn_down",
}


def convert_peft_lora(sd: dict, out_path: str, alpha: float | None = None,
                      r: int | None = None):
    """HF PEFT LoRA state dict -> adapter GGUF (convert_lora_to_gguf.py).

    Accepts keys like
    `base_model.model.model.layers.3.self_attn.q_proj.lora_A.weight`
    (PEFT stores lora_A [r, K] / lora_B [N, r], matching our ab_map)."""
    pat = re.compile(
        r"(?:base_model\.model\.)?model\.layers\.(\d+)\.([a-z_.]+)"
        r"\.lora_([AB])\.weight$")
    pairs: dict[str, dict] = {}
    for key, val in sd.items():
        m = pat.search(key)
        if not m:
            if key.endswith("lora_A.weight") or key.endswith("lora_B.weight"):
                raise ValueError(f"unmapped PEFT tensor {key!r}")
            continue
        il, module, which = m.groups()
        if module not in _PEFT_TO_GGUF:
            raise ValueError(f"unsupported PEFT module {module!r}")
        stem = f"blk.{il}.{_PEFT_TO_GGUF[module]}.weight"
        pairs.setdefault(stem, {})[which.lower()] = np.asarray(val, np.float32)
    ab = {}
    for stem, d in pairs.items():
        if "a" not in d or "b" not in d:
            raise ValueError(f"incomplete LoRA pair for {stem}")
        ab[stem] = (d["a"], d["b"])
    if not ab:
        raise ValueError("no LoRA tensors found in state dict")
    if alpha is None:
        r_found = next(iter(ab.values()))[0].shape[0]
        alpha = float(r if r is not None else r_found)
    return write_lora_gguf(out_path, ab, alpha=alpha)
