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
    """Block-granular OLA expansion + assembly.

    Between host events (models/pipeline.py _build_events) the gather index
    advances exactly +1 per sample and validity is constant, so every
    B-sample output block is covered by at most K+1 CONTIGUOUS slices of
    ``flat`` per side (K = max events per block, computed on host along
    with each event's within-block rank). Per side this costs: 2 scatters
    of E events to NB=L/B block totals, 2 NB-length cumsums, one
    [NB, K+1]-row slice gather, and an elementwise K+1-way select — versus
    the naive per-sample formulation's L-length cumsums and 5M-index
    scalar takes (45-66 ms each on v5e).

    evs: (ev_j, ev_da, ev_db, ev_va, ev_vb, ev_rank) i32 arrays; padding
    events carry j = L so their block index NB is dropped by the scatters.
    """
    import jax

    ev_j, ev_da, ev_db, ev_va, ev_vb, ev_rank = evs
    C = flat.shape[0]
    NB = L // B
    blk = ev_j // B
    off = ev_j - blk * B
    io = jnp.arange(B, dtype=jnp.int32)
    base = jnp.arange(NB, dtype=jnp.int32) * B
    # per-(block, rank) event offsets; B = no event (a sample offset never
    # reaches B, so absent layers never select)
    offk = (
        jnp.full((NB, K), B, jnp.int32).at[blk, ev_rank].set(off, mode="drop")
    )
    # sel[nb, i] = number of events at offsets <= i: the layer each sample
    # reads. Duplicate-j events skip a layer — its zero-width mask never
    # selects and the cumulative deltas stay correct.
    sel = (offk[:, :, None] <= io[None, None, :]).sum(axis=1, dtype=jnp.int32)
    flat_pad = jnp.pad(flat, ((0, 0), (0, B)))

    def side(dv, vv):
        # block-start levels: exclusive prefix over per-block event totals
        d_tot = jnp.zeros(NB, jnp.int32).at[blk].add(dv, mode="drop")
        d_pre = jnp.cumsum(d_tot) - d_tot
        v_tot = jnp.zeros(NB, jnp.int32).at[blk].add(vv, mode="drop")
        v_pre = jnp.cumsum(v_tot) - v_tot
        # within-block cumulative deltas through event k
        dk = jnp.zeros((NB, K), jnp.int32).at[blk, ev_rank].add(
            dv, mode="drop"
        )
        dk = jnp.cumsum(dk, axis=1)
        vk = jnp.zeros((NB, K), jnp.int32).at[blk, ev_rank].add(
            vv, mode="drop"
        )
        vk = jnp.cumsum(vk, axis=1)
        s0 = (base + d_pre)[:, None]
        starts = jnp.concatenate([s0, s0 + dk], axis=1)  # [NB, K+1]
        valid = (
            jnp.concatenate([v_pre[:, None], v_pre[:, None] + vk], axis=1) > 0
        )
        rows = jax.vmap(
            lambda s: jax.lax.dynamic_slice_in_dim(flat_pad, s, B, axis=1)
        )(starts.reshape(-1)).reshape(NB, K + 1, C, B)
        acc = jnp.zeros((NB, C, B), jnp.float32)
        for k in range(K + 1):
            m = (sel == k) & valid[:, k : k + 1]  # [NB, B]
            acc = acc + rows[:, k] * m[:, None, :]
        return acc

    acc = side(ev_da, ev_va) + side(ev_db, ev_vb)
    return acc.transpose(1, 0, 2).reshape(C, L)


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
