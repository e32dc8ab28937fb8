"""Overlap-add assembly as a gather (JAX/XLA).

The reference laps adjacent frames serially
(NVorbis/StreamDecoder.cs:764 OverlapBuffers). Frame supports tile the
output contiguously and at most TWO windowed frames cover any PCM sample
(the lapping pair; long->short transitions meet exactly at the boundary), so
instead of scatter-adding frames into an accumulator — XLA scatters are
slow on both CPU and TPU — every output sample *gathers* its one or two
contributions:

    pcm[i] = flat[a_idx[i]] + (b_valid[i] ? flat[b_idx[i]] : 0)

where ``flat`` is all windowed frames flattened. The production formulation
is block_assemble(): the per-sample index arrays are piecewise i+const, so
whole 128-sample blocks are contiguous slices of flat — expanded from
host-precomputed events at BLOCK granularity (scatter + NB-length cumsums +
K+1 slice-gathers per side), never materializing per-sample indices.
gather_assemble() below is the per-sample fallback formulation kept for
reference/tests. On TPU a Pallas per-hop DMA kernel (ops/ola_pallas.py)
also exists for cut-free aligned streams.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..frames import BatchUnsupported


class OlaUnsupported(BatchUnsupported):
    """Overlap geometry the batch OLA cannot model (non-ascending frame
    supports, >2-deep coverage). Subclasses BatchUnsupported so callers of
    the batch pipeline need a single fallback exception."""


#: block-OLA granularity: one TPU lane tile; also the minimum OLA hop
#: (blocksize 256 -> 128-sample hops), so blocks rarely hold >2 events
OLA_BLOCK = 128


def block_assemble(flat, evs, B, K, L):
    """Event-expanded OLA assembly: the gather indices and validity masks
    are piecewise j+const / piecewise-constant between host events
    (models/pipeline.py _build_events), so they expand with unit scatters
    + cumsums — no per-sample index tables ride the wire. The assembly is
    then two per-sample takes (gather_assemble).

    Measured on v5e: the takes cost 45-66 ms per 5M indices and the
    cumsums ~8 ms each. A block-granular variant (contiguous B-sample
    slices per block, K+1 layers, vmapped dynamic_slice) was tried and is
    3.7x SLOWER (310 ms vs 83 ms per 120 s chunk): XLA lowers the
    unaligned lane-dimension slice gather to per-slice code, and Mosaic
    cannot DMA dynamically-unaligned lane slices either (the same reason
    the Pallas hop kernel is gated to 128-aligned hop classes). Padding
    events carry j = L: mode="drop" discards them.

    evs: (ev_j, ev_da, ev_db, ev_va, ev_vb) i32 arrays.
    """
    ev_j, ev_da, ev_db, ev_va, ev_vb = evs
    ones = jnp.ones(L, jnp.int32)
    zero = jnp.zeros(L, jnp.int32)
    a_idx = jnp.cumsum(ones.at[ev_j].add(ev_da, mode="drop")) - 1
    b_idx = jnp.cumsum(ones.at[ev_j].add(ev_db, mode="drop")) - 1
    a_valid = jnp.cumsum(zero.at[ev_j].add(ev_va, mode="drop")) > 0
    b_valid = jnp.cumsum(zero.at[ev_j].add(ev_vb, mode="drop")) > 0
    return gather_assemble(flat, a_idx, a_valid, b_idx, b_valid)


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
