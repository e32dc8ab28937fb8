"""Overlap-add assembly as a gather (JAX/XLA).

The reference laps adjacent frames serially
(NVorbis/StreamDecoder.cs:764 OverlapBuffers). Frame supports tile the
output contiguously and at most TWO windowed frames cover any PCM sample
(the lapping pair; long->short transitions meet exactly at the boundary), so
instead of scatter-adding frames into an accumulator — XLA scatters are
slow on both CPU and TPU — every output sample *gathers* its one or two
contributions:

    pcm[i] = flat[a_idx[i]] + (b_valid[i] ? flat[b_idx[i]] : 0)

where ``flat`` is all windowed frames flattened. The index arrays are pure
int32 prefix math over the frame plan, built host-side (build_gather_plan);
the device side is two vectorized gathers and an add — HBM-bandwidth bound,
MXU/VPU friendly, no atomics.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class OlaUnsupported(Exception):
    """More than two frames cover one output sample (malformed geometry)."""


def build_gather_plan(
    offsets: np.ndarray,  # [F] int64 global start of each frame, ascending
    sizes: np.ndarray,  # [F] int64 frame lengths
    flat_base: np.ndarray,  # [F] int64 index of frame f's sample 0 in `flat`
    segments: list[tuple[int, int]],  # kept [start, end) global ranges
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-output-sample gather indices: (a_idx, b_idx, b_valid).

    b_idx points at flat position 0 where invalid (b_valid False there)."""
    offsets = np.asarray(offsets, dtype=np.int64)
    sizes = np.asarray(sizes, dtype=np.int64)
    ends = offsets + sizes
    if len(offsets) >= 3 and not np.all(ends[:-2] <= offsets[2:]):
        raise OlaUnsupported("three frames overlap one sample")
    if len(segments) == 0 or len(offsets) == 0:
        z = np.zeros(0, dtype=np.int32)
        return z, z, np.zeros(0, dtype=bool)
    pos = np.concatenate(
        [np.arange(s, e, dtype=np.int64) for s, e in segments]
    )
    a = np.searchsorted(offsets, pos, side="right") - 1
    a = np.clip(a, 0, len(offsets) - 1)
    in_a = (pos >= offsets[a]) & (pos < ends[a])
    b = np.maximum(a - 1, 0)
    b_valid = (b < a) & (pos < ends[b])
    a_idx = np.where(in_a, flat_base[a] + (pos - offsets[a]), 0)
    b_idx = np.where(b_valid, flat_base[b] + (pos - offsets[b]), 0)
    if not np.all(in_a | b_valid):
        raise OlaUnsupported("output sample not covered by any frame")
    a_valid = in_a
    return (
        a_idx.astype(np.int32),
        b_idx.astype(np.int32),
        b_valid,
        a_valid,
    )


def gather_assemble(flat, a_idx, b_idx, b_valid, a_valid):
    """Device side: pcm[c, i] = flat[c, a_idx[i]]*a_valid + flat[c, b_idx[i]]*b_valid."""
    a = jnp.take(flat, a_idx, axis=1) * a_valid
    b = jnp.take(flat, b_idx, axis=1) * b_valid
    return a + b


def overlap_add(out, frames, offsets):
    """Scatter-add reference implementation (tests only — slow under XLA).

    out: [C, total]; frames: [F, C, n]; offsets: [F] (may be negative =
    partially out of range; those samples are dropped)."""
    n = frames.shape[-1]
    total = out.shape[-1]
    idx = offsets[:, None] + jnp.arange(n, dtype=jnp.int32)[None, :]  # [F, n]
    # JAX's mode="drop" only drops indices >= total; negatives would WRAP.
    idx = jnp.where(idx < 0, total, idx)
    flat = frames.transpose(1, 0, 2).reshape(frames.shape[1], -1)  # [C, F*n]
    return out.at[:, idx.reshape(-1)].add(flat, mode="drop", unique_indices=False)
