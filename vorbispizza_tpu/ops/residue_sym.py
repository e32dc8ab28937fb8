"""Device-side residue reconstruction from entropy symbols.

The wire carries, per bucket (see native/symbols.py for the host contract):

  cls      bit-packed classifications in traversal order [F, Pt*V]
           (value ``ncls`` = no vector / never decoded)
  npairs   i16 [F, NA]: applied (partition, vector) pair count per active
           (submap, pass) — residue decode stops permanently at the first
           end-of-packet, so applied pairs are a PREFIX of the coded pairs
           in traversal order
  syms     per (submap, pass, book) group: bit-packed VQ entry numbers,
           ``book.entries`` = zero-row sentinel (end-of-packet padding)

Reconstruction is gather-light and cumsum-driven (TPU-friendly — no
scatter): classifications select a book per pair via a tiny table lookup,
exclusive cumsums rank the applied pairs into each group's symbol stream,
one row-gather per pass pulls whole psize-wide partitions from the
VQ-expanded value table, placed by static reshapes.

Mirrors native/symbols.py expand_symbols() (the numpy executable spec);
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
    cls_buf: jnp.ndarray,
    npairs: jnp.ndarray,  # i16/i32 [F, NA] (all active columns)
    sym_bufs: list,  # packed u8 arrays, one per group in pass order
    slot_tables: list,  # np [ncls+1] i32 per active pass (local slot / -1)
    vq_tables: list,  # np [E+1, d] f32 per group (zero row appended)
    F: int,
) -> jnp.ndarray:
    """One submap's residue vectors [F, n_ch, half] float32."""
    (V, Pt, psize, limit_begin, vec_len, fmt2, ncls, w_c, passes, n_ch) = sub_sig
    PV = Pt * V
    cls = unpack_bits(cls_buf, w_c, F * PV).reshape(F, PV)
    region = jnp.zeros((F * PV, psize), dtype=jnp.float32)
    buf_iter = iter(sym_bufs)
    vq_iter = iter(vq_tables)
    for (p_idx, (gpass, col, groups)), slot_np in zip(
        enumerate(passes), slot_tables
    ):
        bsel = jnp.take(jnp.asarray(slot_np), cls)  # [F, PV] local slot/-1
        coded = bsel >= 0
        rank = jnp.cumsum(coded, axis=1) - coded  # exclusive, per frame
        applied = coded & (rank < npairs[:, col].astype(jnp.int32)[:, None])
        appf = applied.reshape(-1)
        bself = bsel.reshape(-1)
        parts = [jnp.zeros((1, psize), dtype=jnp.float32)]
        gmap = jnp.zeros(F * PV, dtype=jnp.int32)
        base = 1
        for li, (w, d, nsym, fmt1, np_pad) in enumerate(groups):
            syms = unpack_bits(next(buf_iter), w, np_pad * nsym)
            rows = jnp.take(
                jnp.asarray(next(vq_iter)), syms, axis=0
            )  # [S, d]
            if fmt1:
                # format 1: dims contiguous (nsym*d == psize by eligibility)
                part = rows.reshape(np_pad, nsym * d)
            else:
                # format 0: symbol k covers strided positions k, k+nsym, ...
                part = rows.reshape(np_pad, nsym, d).transpose(0, 2, 1)
                part = part.reshape(np_pad, d * nsym)
            if part.shape[1] < psize:
                part = jnp.pad(part, ((0, 0), (0, psize - part.shape[1])))
            m = appf & (bself == li)
            within = jnp.cumsum(m) - m  # exclusive, global stream order
            gmap = jnp.where(m, base + within, gmap)
            parts.append(part)
            base += np_pad
        part_all = jnp.concatenate(parts, axis=0)
        region = region + jnp.take(part_all, gmap, axis=0)
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
