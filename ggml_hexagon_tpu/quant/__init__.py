from .formats import GGMLType, TYPE_TRAITS, QK_K, row_size, is_quantized
from . import ref_numpy

__all__ = ["GGMLType", "TYPE_TRAITS", "QK_K", "row_size", "is_quantized", "ref_numpy"]
