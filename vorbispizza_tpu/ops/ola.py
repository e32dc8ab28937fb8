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
int32 prefix math over the frame plan — computed ON DEVICE from per-frame
offset tables (models/pipeline.py) via searchsorted; the assembly is two
vectorized gathers and an add — HBM-bandwidth bound, no atomics. On TPU the
gather path is superseded by the Pallas per-hop DMA kernel
(ops/ola_pallas.py) for cut-free streams.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..frames import BatchUnsupported


class OlaUnsupported(BatchUnsupported):
    """Overlap geometry the batch OLA cannot model (non-ascending frame
    supports, >2-deep coverage). Subclasses BatchUnsupported so callers of
    the batch pipeline need a single fallback exception."""


def gather_assemble(flat, a_idx, a_valid, b_idx, b_valid):
    """Device side: pcm[c, i] = flat[c, a_idx[i]]*a_valid + flat[c, b_idx[i]]*b_valid.

    Out-of-bounds indices (possible on masked/padding positions) gather 0
    explicitly — the default NaN fill would rely on the mask multiply
    lowering to a select."""
    a = jnp.take(flat, a_idx, axis=1, mode="fill", fill_value=0.0) * a_valid
    b = jnp.take(flat, b_idx, axis=1, mode="fill", fill_value=0.0) * b_valid
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
