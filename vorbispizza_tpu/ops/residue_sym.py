"""Device-side residue reconstruction from entropy symbols.

The wire carries, per bucket (see native/symbols.py for the host contract):

  syms     per (submap, pass, book) group: bit-packed VQ entry numbers,
           ``book.entries`` = zero-row sentinel (end-of-packet padding)
  idx      per group, parallel to syms: one bit-packed region row index
           per applied partition (frame * Pt*V + traversal slot pv;
           sentinel F*Pt*V = padding), precomputed by the C++ front end +
           host merge — the device never sees classifications or pair
           counts

Reconstruction is one row-gather per group from the VQ-expanded value
table plus a single scatter-add of all groups' partition rows into the
region — work scales with the number of APPLIED partitions (sparse),
not with passes x region rows.

Mirrors native/symbols.py expand_symbols() (the numpy executable spec,
which reconstructs the same mapping from cls + pair counts);
reference behavior: NVorbis/Residue0.cs:117-231.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def unpack_bits(buf: jnp.ndarray, w: int, count: int) -> jnp.ndarray:
    """LSB-first fixed-width unpack: u8[B] -> int32[count] of w-bit values
    (host packs with np.packbits(..., bitorder='little'))."""
    bits = (buf[:, None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
    bits = bits.reshape(-1)[: count * w].reshape(count, w).astype(jnp.int32)
    return (bits * (1 << jnp.arange(w, dtype=jnp.int32))).sum(axis=1)


def pack_bits(vals: np.ndarray, w: int) -> np.ndarray:
    """Host-side LSB-first fixed-width pack: int[N] -> u8[ceil(N*w/8)]."""
    v = np.ascontiguousarray(vals, dtype=np.uint32)
    bits = ((v[:, None] >> np.arange(w, dtype=np.uint32)) & 1).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little")


def expand_submap(
    sub_sig,
    sym_bufs: list,  # packed u8 entry streams, one per group in wire order
    idx_bufs: list,  # packed u8 scatter-index streams, parallel to sym_bufs
    vq_tables: list,  # np [E+1, d] f32 per group (zero row appended)
    F: int,
) -> jnp.ndarray:
    """One submap's residue vectors [F, n_ch, half] float32.

    Scatter formulation: the host ships, per group, the VQ entry stream
    plus one PRE-COMPUTED region row index per applied partition
    (frame * Pt*V + pv; sentinel F*Pt*V marks padding). The device expands
    each group's symbols through its VQ table into psize-wide partition
    rows and lands everything with ONE scatter-add — work scales with the
    applied partitions (typically ~10% of region rows summed over passes)
    instead of passes x F*PV row-gathers, and no classifications, rank
    cumsums or pair counts exist on the device at all. Exactness: rows are
    integer-valued (symbol-transport eligibility), so f32 scatter-add
    accumulation is order-independent."""
    (V, Pt, psize, limit_begin, vec_len, fmt2, w_i, groups, n_ch) = sub_sig
    PV = Pt * V
    parts = []
    idxs = []
    for (w, d, nsym, fmt1, np_pad), sbuf, xbuf, vq in zip(
        groups, sym_bufs, idx_bufs, vq_tables
    ):
        syms = unpack_bits(sbuf, w, np_pad * nsym)
        rows = jnp.take(jnp.asarray(vq), syms, axis=0)  # [S, d]
        if fmt1:
            # format 1: dims contiguous (nsym*d == psize by eligibility)
            part = rows.reshape(np_pad, nsym * d)
        else:
            # format 0: symbol k covers strided positions k, k+nsym, ...
            part = rows.reshape(np_pad, nsym, d).transpose(0, 2, 1)
            part = part.reshape(np_pad, d * nsym)
        if part.shape[1] < psize:
            part = jnp.pad(part, ((0, 0), (0, psize - part.shape[1])))
        parts.append(part)
        idxs.append(unpack_bits(xbuf, w_i, np_pad))
    part_all = jnp.concatenate(parts, axis=0)
    idx_all = jnp.concatenate(idxs, axis=0)
    # sentinel indices equal F*PV: mode="drop" discards >= N (never use
    # negative sentinels — JAX scatter WRAPS them)
    region = (
        jnp.zeros((F * PV, psize), dtype=jnp.float32)
        .at[idx_all]
        .add(part_all, mode="drop")
    )
    region = (
        region.reshape(F, Pt, V, psize)
        .transpose(0, 2, 1, 3)
        .reshape(F, V, Pt * psize)
    )
    vec = jnp.pad(
        region,
        ((0, 0), (0, 0), (limit_begin, vec_len - limit_begin - Pt * psize)),
    )
    if fmt2:
        # de-interleave [F, 1, half*n_ch] -> [F, n_ch, half]
        half = vec_len // n_ch
        return vec.reshape(F, half, n_ch).transpose(0, 2, 1)
    return vec
