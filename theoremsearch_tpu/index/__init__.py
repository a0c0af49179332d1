from .flat import FlatIndex
from .quant import quantize_int8, dequantize_int8
from .builder import IndexBuilder

__all__ = ["FlatIndex", "quantize_int8", "dequantize_int8", "IndexBuilder"]
