"""Batched (device-side) decode pipelines — the framework's "model" layer."""

from .pipeline import BatchSynthesizer, decode_file_batch, decode_stream_batch

__all__ = ["BatchSynthesizer", "decode_file_batch", "decode_stream_batch"]
