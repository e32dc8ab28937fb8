"""Batched (device-side) decode pipelines — the framework's "model" layer."""

from .corpus import decode_corpus, merge_streams
from .pipeline import BatchSynthesizer, decode_file_batch, decode_stream_batch

__all__ = [
    "BatchSynthesizer",
    "decode_file_batch",
    "decode_stream_batch",
    "decode_corpus",
    "merge_streams",
]
