"""Offline sizing of a delta-coded floor1 posts wire.

floor1_posts is 1.9 MB of the 7.7 MB h2d budget (tools/h2d_breakdown.py)
— one u8 per (frame, channel, post). Posts are spectral-envelope knots
that evolve slowly frame-to-frame, so a zigzag time-delta should have
far less than 8 bits of entropy. This sizes the candidate schemes BEFORE
any wire change (same discipline as tools/wiresweep.py for the d2h
side):

  a) nibble deltas + escape (0xF) with a quantized exception list
     (STATIC shapes -> no signature explosion; device unpack is the
     repeat/shift trick already used for step2 bits, gather-free)
  b) 2-bit deltas + escape (0b11)
  c) per-column best width in {0,2,4,8} (upper bound; width table would
     be data-dependent -> signature churn, so this is a BOUND not a plan)
  d) channel-delta first (ch1 -= ch0) then time-delta, nibble+escape

Pure host work (CPU backend).
"""

from __future__ import annotations

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from vorbispizza_tpu.config import VorbisConfig  # noqa: E402
from vorbispizza_tpu.models.corpus import (  # noqa: E402
    _front_end,
    merge_streams,
)
from vorbispizza_tpu.testing.encode import (  # noqa: E402
    encode_vorbis,
    make_signal,
)


def zigzag(d: np.ndarray) -> np.ndarray:
    return (np.abs(d) * 2 - (d < 0)).astype(np.int64)


def time_delta(posts: np.ndarray) -> np.ndarray:
    """Zigzag deltas along the frame axis; row 0 kept absolute (costed
    separately as one u8 row per bucket)."""
    d = posts.astype(np.int64)
    return zigzag(d[1:] - d[:-1])


def scheme_fixed_escape(z: np.ndarray, bits: int) -> tuple[int, float]:
    """bits-wide zigzag with the top code reserved as escape; escapes
    ship as (i32 flat index, u8 value) padded to a 64-quantum."""
    esc = (1 << bits) - 1
    n = z.size
    n_esc = int((z >= esc).sum())
    body = (n * bits + 7) // 8
    pad_esc = ((n_esc + 63) // 64) * 64
    return body + pad_esc * 5, 100.0 * n_esc / max(n, 1)


def scheme_per_column(z3: np.ndarray) -> int:
    """z3: [F-1, nc, P] zigzag deltas; per (nc,P) column pick the
    smallest w in {0,2,4,8} that holds every delta (no escapes)."""
    f = z3.shape[0]
    colmax = z3.max(axis=0)  # [nc, P]
    total = 0
    for w in (0, 2, 4, 8):
        lo = 0 if w == 0 else (1 << (w // 2))  # crude class edges below
    # explicit classes: 0 -> all-zero, 2 -> <4, 4 -> <16, 8 -> rest
    n0 = int((colmax == 0).sum())
    n2 = int(((colmax > 0) & (colmax < 4)).sum())
    n4 = int(((colmax >= 4) & (colmax < 16)).sum())
    n8 = int((colmax >= 16).sum())
    total = (f * (n2 * 2 + n4 * 4 + n8 * 8) + 7) // 8
    ncols = colmax.size
    total += (ncols * 2 + 7) // 8  # width table, 2 bits/col
    return total


def main() -> None:
    rate = 44100
    corpus = [
        encode_vorbis(
            make_signal(2, 15.0, rate=rate, kind="music", seed=seed),
            rate=rate,
            quality=0.5,
        )
        for seed in range(32)
    ]
    cfg = VorbisConfig()
    fronts = [_front_end(c) for c in corpus]
    chunks: list[list[int]] = []
    cur: list[int] = []
    cost = 0
    for i, front in enumerate(fronts):
        cur.append(i)
        cost += sum(b.batch_cost for b in front[3])
        if cost >= cfg.corpus_batch_bytes:
            chunks.append(cur)
            cur, cost = [], 0
    if cur:
        chunks.append(cur)

    raw = 0
    tot = {k: 0 for k in ("a4", "b2", "c_col", "d_ch4")}
    esc_pct: list[float] = []
    hist = np.zeros(512, dtype=np.int64)
    for chunk in chunks:
        plan_m, buckets_m, _ = merge_streams([fronts[i][2:4] for i in chunk])
        for b in buckets_m:
            for g in b.floor_groups:
                posts = getattr(g, "posts", None)
                if posts is None or posts.ndim != 3:
                    continue
                raw += posts.size
                base = posts.shape[1] * posts.shape[2]  # row-0 absolute
                z = time_delta(posts)
                hist += np.bincount(
                    np.minimum(z.ravel(), 511), minlength=512
                )
                s, p = scheme_fixed_escape(z.ravel(), 4)
                tot["a4"] += s + base
                esc_pct.append(p)
                s, _ = scheme_fixed_escape(z.ravel(), 2)
                tot["b2"] += s + base
                tot["c_col"] += scheme_per_column(z) + base
                pc = posts.astype(np.int64).copy()
                if pc.shape[1] == 2:
                    pc[:, 1] -= pc[:, 0]
                zc = zigzag(
                    np.diff(pc, axis=0, prepend=pc[:1] * 0)
                )[1:]
                s, _ = scheme_fixed_escape(zc.ravel(), 4)
                tot["d_ch4"] += s + base

    print(f"raw posts bytes: {raw:,}")
    for k, v in tot.items():
        print(f"scheme {k:>6}: {v:>10,} bytes  ({raw / max(v,1):.2f}x)")
    print(f"nibble escape rate: mean {np.mean(esc_pct):.2f}%")
    cum = hist.cumsum() / hist.sum()
    for edge in (1, 2, 3, 4, 7, 15, 31, 63):
        print(f"  zigzag < {edge + 1:>3}: {100 * cum[edge]:.2f}%")


if __name__ == "__main__":
    main()
