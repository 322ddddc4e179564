"""Model quantization policy — per-tensor type selection.

The analog of the reference's llama_model_quantize driver
(src/llama-quant.cpp): an ftype names the mixture, and per-tensor
heuristics bump sensitive tensors (attn_v, ffn_down, output/embedding)
to higher-precision types (llama_tensor_get_type, llama-quant.cpp:122-310).
The policy here reproduces the load-bearing rules for the common ftypes;
exotic branches (MoE expert counts, imatrix-presence switches) are noted
where simplified.
"""
from __future__ import annotations

from dataclasses import dataclass

from .formats import GGMLType


# ftype table (llama.h:148-189 subset)
FTYPES = {
    "F16": GGMLType.F16,
    "BF16": GGMLType.BF16,
    "Q8_0": GGMLType.Q8_0,
    "Q6_K": GGMLType.Q6_K,
    "Q5_K_M": GGMLType.Q5_K,
    "Q5_K_S": GGMLType.Q5_K,
    "Q4_K_M": GGMLType.Q4_K,
    "Q4_K_S": GGMLType.Q4_K,
    "Q3_K_M": GGMLType.Q3_K,
    "Q3_K_S": GGMLType.Q3_K,
    "Q3_K_L": GGMLType.Q3_K,
    "Q2_K": GGMLType.Q2_K,
    "Q5_0": GGMLType.Q5_0,
    "Q5_1": GGMLType.Q5_1,
    "Q4_0": GGMLType.Q4_0,
    "Q4_1": GGMLType.Q4_1,
    # i-quant mixtures (llama.h ftypes IQ1_S..IQ4_XS)
    "IQ1_S": GGMLType.IQ1_S,
    "IQ1_M": GGMLType.IQ1_M,
    "IQ2_XXS": GGMLType.IQ2_XXS,
    "IQ2_XS": GGMLType.IQ2_XS,
    "IQ2_S": GGMLType.IQ2_S,
    "IQ2_M": GGMLType.IQ2_S,
    "IQ3_XXS": GGMLType.IQ3_XXS,
    "IQ3_S": GGMLType.IQ3_S,
    "IQ3_M": GGMLType.IQ3_S,
    "IQ4_NL": GGMLType.IQ4_NL,
    "IQ4_XS": GGMLType.IQ4_XS,
}

_IQ_LOW = ("IQ1_S", "IQ1_M", "IQ2_XXS", "IQ2_XS", "IQ2_S", "IQ2_M")


@dataclass
class QuantPolicy:
    ftype: str
    n_layer: int

    def tensor_type(self, name: str, shape: tuple[int, ...]) -> GGMLType:
        """Choose the quant type for a tensor (llama_tensor_get_type rules)."""
        base = FTYPES[self.ftype]
        if base in (GGMLType.F16, GGMLType.BF16):
            return base
        # 1-D tensors (norms) always stay f32
        if len(shape) == 1:
            return GGMLType.F32
        # output / token embedding: protected (llama-quant.cpp: output gets
        # Q6_K for all K-quant ftypes unless already >= 6 bits)
        if name == "output.weight":
            if self.ftype in _IQ_LOW:  # llama-quant.cpp: sub-3bpw -> Q5_K out
                return GGMLType.Q5_K
            return base if base in (GGMLType.Q8_0,) else GGMLType.Q6_K
        if name == "token_embd.weight":
            if self.ftype in ("IQ1_S", "IQ1_M", "IQ2_XXS", "IQ2_XS"):
                return GGMLType.Q2_K
            if self.ftype in ("IQ2_S", "IQ2_M", "IQ3_XXS"):
                return GGMLType.IQ3_S
            if self.ftype in ("Q2_K", "Q3_K_S"):
                return GGMLType.Q2_K
            if self.ftype.startswith("Q3_K"):
                return GGMLType.Q3_K
            return base
        layer = self._layer_of(name)
        use_more_bits = layer is not None and (
            layer < self.n_layer // 8
            or layer >= 7 * self.n_layer // 8
            or (layer - self.n_layer // 8) % 3 == 2
        )
        if ".attn_v.weight" in name:
            if self.ftype in ("IQ1_S", "IQ1_M", "IQ2_XXS", "IQ2_XS"):
                return GGMLType.Q4_K  # n_gqa>=4 branch; safe default
            if self.ftype in ("IQ2_S", "IQ2_M", "IQ3_XXS"):
                return GGMLType.IQ3_S
            if self.ftype == "Q4_K_M":
                return GGMLType.Q6_K if use_more_bits else GGMLType.Q4_K
            if self.ftype == "Q5_K_M":
                return GGMLType.Q6_K if use_more_bits else GGMLType.Q5_K
            if self.ftype in ("Q3_K_M", "Q3_K_L"):
                return GGMLType.Q5_K
            if self.ftype == "Q2_K":
                return GGMLType.Q4_K
            return base
        if ".ffn_down" in name:
            if self.ftype == "Q4_K_M":
                return GGMLType.Q6_K if use_more_bits else GGMLType.Q4_K
            if self.ftype == "Q5_K_M":
                return GGMLType.Q6_K if use_more_bits else GGMLType.Q5_K
            if self.ftype == "Q3_K_M":
                return GGMLType.Q4_K if layer is not None and layer < self.n_layer // 8 else GGMLType.Q3_K
            return base
        if ".attn_k.weight" in name or ".attn_q.weight" in name:
            return base
        return base

    @staticmethod
    def _layer_of(name: str):
        if name.startswith("blk."):
            try:
                return int(name.split(".")[1])
            except ValueError:
                return None
        return None


def quantize_model(
    reader,
    out_path: str,
    ftype: str,
    imatrix: dict | None = None,
    progress=None,
):
    """Re-quantize every tensor of a GGUF per policy; write a new file.

    imatrix: name -> per-column weights (Σx² from tools/imatrix.py), fed to
    the imatrix-aware encoders exactly as llama-quant.cpp:544 feeds
    quant_weights.
    """
    import numpy as np

    from ..gguf.writer import GGUFWriter
    from . import ref_numpy
    from .formats import TYPE_TRAITS

    md = reader.metadata
    n_layer = int(md.get(f"{md.get('general.architecture','llama')}.block_count", 0))
    policy = QuantPolicy(ftype, n_layer)
    w = GGUFWriter()
    for k, v in md.items():
        if k == "general.file_type":
            continue
        w.add(k, v)
    for name, info in reader.tensors.items():
        data = reader.tensor_f32(name)
        ttype = policy.tensor_type(name, data.shape)
        if TYPE_TRAITS[ttype].block_size > 1 and data.shape[-1] % TYPE_TRAITS[ttype].block_size:
            ttype = GGMLType.F16  # row not blockable (llama-quant fallback)
        qw = None
        if imatrix is not None and name in imatrix and ttype in ref_numpy.QUANTIZE_IMATRIX:
            im = np.asarray(imatrix[name], np.float32)
            C = data.shape[-1]
            if im.size == C:
                qw = np.tile(im, data.size // C)
            elif im.size % C == 0 and data.size % im.size == 0:
                # per-expert slices, expert-major [E*C] (imatrix.cpp MUL_MAT_ID
                # entries; quantize applies slice e to expert e's rows —
                # llama-quant.cpp "quantize each expert separately")
                E = im.size // C
                rows_pe = data.size // im.size
                qw = np.concatenate(
                    [np.tile(im[e * C:(e + 1) * C], rows_pe)
                     for e in range(E)])
            else:
                raise ValueError(
                    f"imatrix size {im.size} incompatible with tensor "
                    f"{name} ({data.size} elements, row {C})")
        from .. import native

        packed = native.quantize_native(data.reshape(-1), int(ttype), quant_weights=qw)
        if packed is None:
            packed = ref_numpy.quantize(data.reshape(-1), ttype, quant_weights=qw)
        w.add_tensor(name, packed, ttype, raw_ne=info.ne)
        if progress:
            progress(name, ttype)
    w.write_file(out_path)
    return out_path
