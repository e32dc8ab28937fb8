from .bits import bit_reverse, float32_unpack, ilog, lookup1_values

__all__ = ["bit_reverse", "float32_unpack", "ilog", "lookup1_values"]
