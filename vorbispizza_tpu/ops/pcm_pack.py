"""Delta block-pack: a lossless device-side wire codec for s16 PCM output.

The device->host link is the throughput wall for host-delivered PCM (the
attached chip sits behind a ~40 MB/s tunnel; even PCIe hosts win from fewer
bytes). Audio PCM is smooth: its second difference needs ~5 bits/sample on
typical program material vs 16 shipped raw. This codec:

  1. second- OR third-difference per 128-sample block, whichever packs
     narrower (d3 wins ~23% on smooth music; ties go to d2; the choice
     rides bit 5 of the width byte and reconstruction chains d3 -> d2 ->
     d1 -> q with carried accumulators),
  2. zigzag to unsigned (max |d2| = 131070 -> 18 bits always suffice; d3
     blocks that would need 19 are forced to d2),
  3. per block, the narrowest width from WIDTHS that holds the block's
     max, LSB-first bit-packed (all block byte sizes are u32-word
     multiples, so compaction is one word gather),
  4. outputs (packed u8[cap], nbytes, width table u8[NBt]) — the host pulls
     only nbytes (+ the tiny width table) and unpacks vectorized.

Measured ~3.2x over raw s16 on decoded music (q0.5) with even d2-only
widths — fine widths + d3 add ~1.45x more — beating in-flight link
compression (which is weather-dependent on the tunnel) deterministically.
Wholly new capability vs the reference (NVorbis returns PCM in host memory
by construction); the reference analog of the output stage is
StreamDecoder.StoreInterleaved:515-592.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

#: allowed block bit-widths; every w gives a u32-word-multiple block size
#: (128*w/8 = 16*w bytes). Fine granularity where blocks actually land
#: (measured on decoded music q0.4-0.5: 95% of blocks at w<=4, ~99% at
#: w<=6, nothing above 12), coarse escape rungs above: a block rounds up
#: to the next available width, costing ~0.7% extra wire bytes, while the
#: device-side all-widths selection matmul shrinks with sum(WIDTHS)
#: (16*84=1344 output columns vs 2736 for full 0..18 — the pack stage was
#: the largest exec-only term at 50 ms/120 s chunk). 18 always suffices
#: (zigzagged d2 of s16 spans 18 bits). Must match the W[] table in
#: native/frontend.cpp vp_unpack_pcm.
WIDTHS = (0, 1, 2, 3, 4, 5, 6, 8, 10, 12, 15, 18)
BLOCK = 128
MAX_W = WIDTHS[-1]
#: u32 words per block for each width
WORDS = tuple(w * BLOCK // 32 for w in WIDTHS)


def wire_rows(out_len: int, channels: int = 1) -> int:
    """Width-byte rows of the dpack wire header for ``out_len`` samples:
    one byte per BLOCK-sample block per channel ([nbytes][widx][payload]
    layout). The single place wire geometry is derived from BLOCK — the
    unpack/overflow sites must agree with pack_pcm byte for byte."""
    return channels * (-(-out_len // BLOCK))



#: spec channel orders (Vorbis I §4.3.9) put center/LFE between the
#: correlated L/R and surround pairs; pair those, leave center/LFE/rear-
#: center unpaired. 1/2/4ch orders are already adjacent-correlated; >8 is
#: application-defined, adjacent fallback.
_PARTNERS = {
    3: (0, 1, 0),                   # L C R
    5: (0, 1, 0, 3, 3),             # L C R Rl Rr
    6: (0, 1, 0, 3, 3, 5),          # L C R Rl Rr LFE
    7: (0, 1, 0, 3, 3, 5, 6),       # L C R Sl Sr Rc LFE
    8: (0, 1, 0, 3, 3, 5, 5, 7),    # L C R Sl Sr Rl Rr LFE
}


def pair_partner(C: int) -> np.ndarray:
    """Per-channel inter-candidate partner (partner[c] == c means channel
    c has no inter candidates). Adjacent pairing would couple
    uncorrelated channels on the 3/5/6/7/8-channel spec orders (e.g. L
    with center, Rr with LFE), so those counts pair the correlated
    front L/R and surround pairs per _PARTNERS; every other count pairs
    adjacently: (0,1), (2,3), … Must match the partner table in
    native/frontend.cpp vp_unpack_pcm (wire bit 6 = 'subtract THIS
    table's partner'; _unpack_pcm_numpy calls this function)."""
    if C in _PARTNERS:
        return np.array(_PARTNERS[C])
    ch = np.arange(C)
    return np.where(ch % 2 == 1, ch - 1, ch)


def select_candidate(q: jnp.ndarray):
    """Stage 1 of pack_pcm: per-block candidate choice, narrowest wins
    (ties to the earlier, cheaper-to-reconstruct candidate):
      d2      second difference (baseline; always fits 18 bits)
      d3      third difference (~23% fewer bytes on smooth music)
      i2, i3  inter-channel: dk(ch) - dk(pair partner) — stereo content
      is usually correlated, and diff-space decorrelation needs no
      sample-space stitching (the accumulator chain still tracks ch).
    Candidates whose zigzag exceeds WIDTHS[-1] bits are forced out (d2
    always fits, so a winner always exists). Channels pair (0,1),(2,3)…;
    even channels and a trailing odd channel have no inter candidates.
    Flag bits in the width byte: 5 = third difference, 6 = inter.

    Returns (blk u32 [NBt, BLOCK] zigzagged winner, widx i32 [NBt],
    blk_flags i32 [NBt]). Module-level so tools/ablate.py can snap the
    candidate search out (d2-only) and attribute its exec cost."""
    C, L = q.shape
    NB = -(-L // BLOCK)
    pad = NB * BLOCK - L
    d1 = jnp.diff(q, axis=1, prepend=jnp.zeros((C, 1), q.dtype))
    d2 = jnp.diff(d1, axis=1, prepend=jnp.zeros((C, 1), d1.dtype))
    d3 = jnp.diff(d2, axis=1, prepend=jnp.zeros((C, 1), d2.dtype))

    def zig_blocks(d):
        z = ((d << 1) ^ (d >> 31)).astype(jnp.uint32)
        if pad:
            z = jnp.pad(z, ((0, 0), (0, pad)))
        return z.reshape(C * NB, BLOCK)

    def width_index(maxz):
        wi = jnp.zeros(maxz.shape[0], dtype=jnp.int32)
        for w in WIDTHS[:-1]:
            wi = wi + (maxz > ((1 << w) - 1)).astype(jnp.int32)
        return wi

    NBt = C * NB
    cands = [zig_blocks(d2), zig_blocks(d3)]
    flags = [0, 1 << 5]
    if C >= 2:
        partner = pair_partner(C)
        cands.append(zig_blocks(d2 - d2[partner]))
        cands.append(zig_blocks(d3 - d3[partner]))
        flags += [1 << 6, (1 << 5) | (1 << 6)]
        # inter only valid for paired dependents (block t -> ch t//NB)
        inter_ok = jnp.asarray(
            partner[np.arange(NBt) // NB] != (np.arange(NBt) // NB)
        )
    INVALID = jnp.int32(len(WIDTHS))
    wis = []
    for k, cb in enumerate(cands):
        m = cb.max(axis=1)
        wi = jnp.where(m > ((1 << MAX_W) - 1), INVALID, width_index(m))
        if flags[k] & (1 << 6):
            wi = jnp.where(inter_ok, wi, INVALID)
        wis.append(wi)
    wstack = jnp.stack(wis)  # [K, NBt]
    best = jnp.argmin(wstack * len(cands) + jnp.arange(len(cands))[:, None], axis=0)
    widx = jnp.take_along_axis(wstack, best[None, :], axis=0)[0]
    # select via where-accumulation, NOT stack + take_along_axis: XLA
    # fuses each masked candidate into the accumulation instead of
    # materializing a [K, NBt, BLOCK] stack in HBM and gathering rows
    blk = cands[0]
    for k in range(1, len(cands)):
        blk = jnp.where((best == k)[:, None], cands[k], blk)
    flag_tbl = jnp.asarray(np.asarray(flags, dtype=np.int32))
    blk_flags = jnp.take(flag_tbl, best)
    return blk, widx, blk_flags


_sel16_cache: list = []


def _selection_matrix16():
    """Bit-PAIR -> per-width-HALFWORD selection matrix (bf16), columns
    ordered [all EVEN halfwords | all ODD halfwords], plus the 0/1 mask
    for the odd->even carry (0 at each width region's last odd column).

    Vs the byte/bit-plane formulation this is 4x fewer MACs: the operand
    packs two bit planes per element (b_2p + 2*b_2p+1, values 0..3 —
    exact in bf16) and each output column is a 16-bit halfword, both
    halving their axis. A pair whose two bits straddle a halfword
    boundary (q mod 16 == 15) keeps weight 2^q: its odd bit contributes
    2^(q+1) = an overflow into bit 16, which IS that bit's value in the
    next halfword — recovered exactly by the integer carry pass in
    words_matmul. Weights are powers of two (bf16-exact) and column sums
    stay < 2^18 (f32-exact).

    The even/odd column split lets the i32 WORD stream form from two
    contiguous lane slices (even | odd<<16) with no byte interleave: a
    u8 interleave of the full matmul output measured ~36 ms per 120 s
    chunk on v5e (8-bit relayouts), vs ~4 ms for the word combine.
    ``offs`` are per-width offsets in WORD columns (half the halfword
    count)."""
    if not _sel16_cache:
        offs = np.cumsum([0] + [4 * w for w in WIDTHS[1:]])  # word cols
        HALF = int(offs[-1])  # even (= odd) halfword column count
        NPAIR = MAX_W // 2
        M = np.zeros((BLOCK * NPAIR, 2 * HALF), dtype=np.float32)
        carry_oe_ok = np.ones(HALF, dtype=np.float32)
        for wi, w in enumerate(WIDTHS[1:]):
            base = int(offs[wi])  # word base of this width region
            if base > 0:
                # a block's non-chosen width columns hold garbage sums
                # whose >>16 may be nonzero: a carry out of region wi-1's
                # LAST odd halfword must never pollute region wi's first
                # even column. In-region carries are the recovered
                # straddle bits and stay enabled. (The even->odd carry
                # never crosses a region: both halves of a word share
                # one region.)
                carry_oe_ok[base - 1] = 0.0
            for s in range(BLOCK):
                for p in range((w + 1) // 2):
                    q = s * w + 2 * p
                    j = q // 16  # halfword index within the region
                    col = (
                        base + j // 2 if j % 2 == 0 else HALF + base + j // 2
                    )
                    M[p * BLOCK + s, col] += float(1 << (q % 16))
        _sel16_cache.append((M.astype(jnp.bfloat16), offs, carry_oe_ok))
    return _sel16_cache[0]


def words_matmul(blk: jnp.ndarray):
    """Stage 2 of pack_pcm: every width's packed stream as i32 WORDS from
    ONE MXU matmul.

    Bit-pair operand x [NBt, 9*BLOCK] (two planes per element) times the
    static even|odd halfword selection matrix -> integer halfwords + a
    carry pass (straddling pairs overflow bit 16 = bit 0 of the next
    halfword; the receiving halfword misses that bit so +carry cannot
    overflow) -> little-endian u32 words combined from two CONTIGUOUS
    lane slices. Everything stays 32-bit until after compaction — the
    full-size stream is never materialized as u8 (8-bit relayouts
    measured ~36 ms per 120 s chunk). History at corpus-chunk scale:
    18-candidate VPU loop 82 ms -> bit-plane/byte matmul 49 ms ->
    halfword/bit-pair matmul (4x fewer MACs) -> this word-native layout.

    blk u32 [NBt, BLOCK] -> words i32 [NBt, sum(4*w)]. Module-level for
    tools/ablate.py stage attribution."""
    NBt = blk.shape[0]
    M16, offs, carry_oe_ok = _selection_matrix16()
    HALF = int(offs[-1])
    NPAIR = MAX_W // 2
    # pair-major expansion [NBt, NPAIR, BLOCK]: sample axis stays minor
    # (lanes), so the reshape to the matmul operand is layout-free
    pairs = (
        (
            blk[:, None, :]
            >> (2 * jnp.arange(NPAIR, dtype=jnp.uint32))[None, :, None]
        )
        & 3
    ).astype(jnp.bfloat16).reshape(NBt, NPAIR * BLOCK)
    # halfword sums reach ~2^17: bf16 output would round them (bytes
    # <= 255 fit bf16; halfwords do not) — force the f32 accumulator out
    r = jnp.matmul(
        pairs, jnp.asarray(M16), preferred_element_type=jnp.float32
    ).astype(jnp.int32)
    r_even, r_odd = r[:, :HALF], r[:, HALF:]
    h_even = r_even & 0xFFFF
    h_odd = (r_odd & 0xFFFF) + (r_even >> 16)  # even->odd: same word
    # odd->even carry crosses words; masked at width-region boundaries
    c_oe = (r_odd >> 16) * jnp.asarray(carry_oe_ok, jnp.int32)[None, :]
    h_even = h_even + jnp.concatenate(
        [jnp.zeros((NBt, 1), jnp.int32), c_oe[:, :-1]], axis=1
    )
    return h_even | (h_odd << 16)


#: worst-case 16-byte groups per block (width 18)
G_PER = 4 * WORDS[-1] // 16

#: soft compaction capacity, in groups per block AVERAGED over the chunk.
#: A block's group count equals its width index's w (16w bytes); measured
#: music sits at ~2.5 groups/block mean, so 6 is ~2.4x headroom while the
#: compaction gather (the largest exec-only term: 71.5 of 115.5 ms per
#: 120 s chunk at the full 18-group cap, 2026-08-18 ablation) shrinks 3x.
#: Content that overflows (near-white-noise PCM) is detected EXACTLY on
#: the host — nbytes in the wire header exceeds the payload capacity ->
#: PackOverflow -> the caller re-runs the chunk with the full-cap
#: program ("s16df"). Wire bytes are identical either way.
SOFT_GROUPS_PER_BLOCK = 6


class PackOverflow(Exception):
    """The chunk's true packed size exceeds the soft-capacity wire buffer;
    re-run with the full-capacity pack program (output="s16df")."""


def compact(words: jnp.ndarray, widx: jnp.ndarray, cap_groups: int | None = None):
    """Stage 3 of pack_pcm: compaction at 16-BYTE (4-word) granularity
    DIRECTLY from the per-width word streams: every width's words sit at
    a static column offset in ``words`` (4w words at 4*cum(w)), so one
    flat row take per output group indexes straight into the matmul
    result — no intermediate select/pad pass materializing masked copies
    of every block. The per-group source row is ``g + comb[blk_of[g]]``
    with comb = blk*COLS + gbase - goff folded into ONE per-block table,
    so the expansion costs one cumsum, one scalar take and one 4-lane
    i32 row take per group; bytes are extracted arithmetically AFTER the
    gather, on the compacted output only (u8 relayout of the full-size
    stream measured ~36 ms per 120 s chunk; on the compacted ~3 ms).
    ``cap_groups`` bounds the STATIC output (soft cap: see
    SOFT_GROUPS_PER_BLOCK); groups past it are dropped (the true total is
    still returned, so the host detects overflow exactly). Module-level
    for tools/ablate.py stage attribution."""
    NBt = words.shape[0]
    _, offs, _ = _selection_matrix16()
    COLS = int(offs[-1]) // 4  # 4-word group columns per block
    w4flat = words.reshape(NBt * COLS, 4)
    gbase_np = np.zeros(len(WIDTHS), dtype=np.int32)
    gbase_np[1:] = np.asarray(offs[:-1], dtype=np.int32) // 4
    groups_tbl = jnp.asarray(
        np.asarray([4 * wd // 16 for wd in WORDS], dtype=np.int32)
    )
    gpb = jnp.take(groups_tbl, widx)  # groups per block
    goff = jnp.cumsum(gpb) - gpb  # exclusive group offsets
    total_groups = goff[-1] + gpb[-1] if NBt else jnp.int32(0)

    if cap_groups is None:
        cap_groups = NBt * G_PER
    # block id per output group: unit marker at each block's start offset
    # (empty blocks collapse — their marker stacks on the next offset;
    # offsets past the cap drop)
    marker = jnp.zeros(cap_groups + 1, dtype=jnp.int32)
    marker = marker.at[goff].add(1, mode="drop")
    blk_of = jnp.clip(jnp.cumsum(marker[:-1]) - 1, 0, NBt - 1)
    comb = (
        jnp.arange(NBt, dtype=jnp.int32) * COLS
        + jnp.take(jnp.asarray(gbase_np), widx)
        - goff
    )
    idx = jnp.arange(cap_groups, dtype=jnp.int32) + jnp.take(comb, blk_of)
    g4 = jnp.take(w4flat, idx, axis=0, mode="fill", fill_value=0)
    # little-endian byte extraction on the COMPACTED stream only
    packed = (
        (
            g4[:, :, None]
            >> jnp.asarray([0, 8, 16, 24], jnp.int32)[None, None, :]
        )
        & 0xFF
    ).astype(jnp.uint8).reshape(-1)
    return packed, (total_groups * 16).astype(jnp.int32)


def pack_pcm(q: jnp.ndarray, cap_groups: int | None = None):
    """Device-side pack: q int32 [C, L] (s16-range) ->
    (packed u8 [16*cap_groups], nbytes int32, widx u8 [C*NB]).

    Only the first ``nbytes`` of ``packed`` are meaningful; blocks are laid
    out back-to-back in (channel, block) order. nbytes may exceed the
    buffer under a soft ``cap_groups`` — the host must then re-run with
    the full cap (PackOverflow). Three stages — candidate selection,
    word matmul, group compaction — live as module-level functions so
    the on-chip ablation can attribute them."""
    blk, widx, blk_flags = select_candidate(q)
    words = words_matmul(blk)
    packed, nbytes = compact(words, widx, cap_groups)
    # widx byte: bits 0-4 width index, bit 5 = third difference, 6 = inter
    wout = (widx | blk_flags).astype(jnp.uint8)
    return packed, nbytes, wout


#: page sizes for sized pulls: big pages while >= _PAGE_BIG of payload
#: remains, then one exact 256 KB-quantized tail (dynamic START, static
#: SIZE — a python-sliced pull would compile one program per distinct
#: length; the quantized sizes bound the set at _PAGE_BIG/256K programs
#: per buffer shape, each compiled once and cached persistently)
_PAGE_BIG = 4 << 20
#: slice-size quantum shared by start_page0 and pull_wire's tail: both
#: must agree or the compiled-size set doubles
_PAGE_QUANTUM = 256 << 10

_page_fns: dict = {}


def _page_fn(size: int):
    fn = _page_fns.get(size)
    if fn is None:
        import jax

        fn = jax.jit(
            lambda x, i: jax.lax.dynamic_slice_in_dim(x, i, size),
            static_argnames=(),
        )
        _page_fns[size] = fn
    return fn


def start_page0(dev: "jnp.ndarray", hint_bytes: int | None = None):
    """Launch the wire's first page (slice program + async host copy) so
    it rides behind later work; hand the result to pull_wire.

    ``hint_bytes``: host-side estimate of the total wire size (header +
    widx + packed). The wire buffer is the PADDED soft capacity —
    typically ~2x the real payload — so pulling a fixed-size first page
    moves ~1.3 MB of dead padding per chunk over the link (+33% of the
    d2h byte budget measured on the 32-file bench corpus). The first
    page is sized to the 256 KB-quantized hint instead; an undershoot
    costs one extra sized-page round trip in pull_wire (which already
    pulls any remainder), an overshoot is bounded by the quantum."""
    cap = int(dev.shape[0])
    if hint_bytes is None:
        size = _PAGE_BIG
    else:
        q = _PAGE_QUANTUM
        size = min(_PAGE_BIG, -(-max(int(hint_bytes), 1) // q) * q)
    page = dev if cap <= size else _page_fn(size)(dev, 0)
    try:
        page.copy_to_host_async()
    except (AttributeError, RuntimeError):
        pass
    return page


def pull_wire(dev: "jnp.ndarray", nbt: int, page0=None):
    """Pull a single-buffer dpack wire [4B nbytes][widx u8[nbt]][packed]
    -> (nbytes, widx, packed bytes). The header rides in the first page,
    so a chunk costs no separate nbytes/widx round-trips."""
    cap = int(dev.shape[0])
    if page0 is None:
        page0 = start_page0(dev)
    h = np.asarray(page0)
    first = h.shape[0]
    if first < 4 + nbt:
        # the header + width table must ride the first page; a chunk-size
        # change that overflows it must fail loudly, not corrupt the PCM
        raise ValueError(
            f"dpack header ({4 + nbt} B) exceeds the first wire page "
            f"({first} B); raise _PAGE_BIG or shrink the chunk"
        )
    nb = int(h[:4].view(np.int32)[0])
    if nb > cap - 4 - nbt:
        # soft-capacity wire: the chunk's true packed size exceeds the
        # buffer (near-incompressible PCM) — the payload is truncated on
        # device. Exact detection: nbytes in the header is the true total.
        raise PackOverflow(
            f"dpack payload {nb} B exceeds wire capacity {cap - 4 - nbt} B"
        )
    widx = h[4 : 4 + nbt]
    data = np.empty(nb, dtype=np.uint8)
    take0 = min(nb, first - 4 - nbt)
    if take0 > 0:
        data[:take0] = h[4 + nbt : 4 + nbt + take0]
    off = 4 + nbt  # device offset of the payload
    a = max(take0, 0)
    pages = []
    q = _PAGE_QUANTUM
    while a < nb:
        # big pages while >= _PAGE_BIG remains, then ONE exact
        # 256 KB-quantized tail page: nb is known here (the header rode
        # the first page), so the remainder ships ≤256 KB of padding —
        # bytes are the shared-pipe currency, and each distinct
        # quantized size compiles its slice program once (≤16 sizes)
        if nb - a >= _PAGE_BIG and cap >= _PAGE_BIG:
            size = _PAGE_BIG
        else:
            # min() with cap: the quantized tail must still fit a wire
            # buffer smaller than one quantum
            size = min(cap, -(-(nb - a) // q) * q)
        start = min(off + a, cap - size)
        page = _page_fn(size)(dev, start)
        try:
            page.copy_to_host_async()
        except (AttributeError, RuntimeError):
            pass
        take = min(nb - a, size - (off + a - start))
        pages.append((a, start, take, page))
        a += take
    for a, start, take, page in pages:
        hst = np.asarray(page)
        s0 = off + a - start
        data[a : a + take] = hst[s0 : s0 + take]
    return nb, widx, data


def unpack_pcm(packed: np.ndarray, widx: np.ndarray, C: int, L: int):
    """Host-side unpack -> int16 [C, L]: the threaded C++ unpacker when
    available (native/frontend.cpp vp_unpack_pcm), else vectorized numpy."""
    from .. import native

    if native.available():
        out = native.unpack_pcm(packed, widx, C, L)
        if out is not None:
            return out
    return _unpack_pcm_numpy(packed, widx, C, L)


def _unpack_pcm_numpy(packed: np.ndarray, widx: np.ndarray, C: int, L: int):
    NBt = widx.shape[0]
    NB = NBt // C
    # mirror the C++ unpacker's wire validations (frontend.cpp
    # vp_unpack_pcm): a malformed wire must fail loudly on this path
    # too, never return silently truncated PCM
    if C <= 0 or NBt % C != 0:
        raise ValueError(f"dpack wire geometry invalid: nbt={NBt} C={C}")
    if NB * BLOCK < L:
        raise ValueError(f"dpack wire covers {NB * BLOCK} < L={L} samples")
    wclass = (widx & 0x1F).astype(np.int64)
    if wclass.size and int(wclass.max()) >= len(WIDTHS):
        raise ValueError(
            f"dpack width class {int(wclass.max())} out of range"
        )
    ord3 = ((widx >> 5) & 1).astype(bool)
    ws = np.asarray(WIDTHS, dtype=np.int64)
    bpb = ws[wclass] * BLOCK // 8  # bytes per block
    boff = np.cumsum(bpb) - bpb
    z = np.zeros((NBt, BLOCK), dtype=np.int64)
    for wi, w in enumerate(WIDTHS):
        if w == 0:
            continue
        sel = np.nonzero(wclass == wi)[0]
        if sel.size == 0:
            continue
        nb = w * BLOCK // 8
        idx = (boff[sel][:, None] + np.arange(nb)).reshape(-1)
        by = packed[idx]
        bits = np.unpackbits(by, bitorder="little").reshape(
            sel.size, BLOCK, w
        )
        vals = (bits.astype(np.int64) << np.arange(w, dtype=np.int64)).sum(
            axis=2
        )
        z[sel] = vals
    d = (z >> 1) ^ -(z & 1)  # un-zigzag: signed block values
    d_flat = d.reshape(C, NB * BLOCK)
    f = ord3.reshape(C, NB)
    inter = ((widx >> 6) & 1).astype(bool).reshape(C, NB)

    def chain_d2(v, fl):
        """[K, NB*BLOCK] block values + order-3 flags [K, NB] -> d2.

        Order-3 blocks carry d3: within each RUN of flagged blocks d2 is
        the running sum of d3 seeded by the d2 value just before the run
        (last sample of an order-2 block — whose value IS its d2 — or 0
        at channel start)."""
        if not fl.any():
            return v
        K = v.shape[0]
        f_s = np.repeat(fl, BLOCK, axis=1)
        S = np.cumsum(v * f_s, axis=1)
        first = fl & ~np.concatenate(
            [np.zeros((K, 1), bool), fl[:, :-1]], axis=1
        )
        startb = np.maximum.accumulate(
            np.where(first, np.arange(NB)[None, :], -1), axis=1
        )
        pre = np.repeat(startb * BLOCK - 1, BLOCK, axis=1)
        valid = pre >= 0
        idx = np.clip(pre, 0, NB * BLOCK - 1)
        base = np.where(valid, np.take_along_axis(v, idx, axis=1), 0)
        s_pre = np.where(valid, np.take_along_axis(S, idx, axis=1), 0)
        return np.where(f_s, base + S - s_pre, v)

    d2 = np.empty_like(d_flat)
    partner = pair_partner(C)
    ind = np.nonzero(partner == np.arange(C))[0]  # stash + unpaired
    d2[ind] = chain_d2(d_flat[ind], f[ind])
    dep = np.nonzero(partner != np.arange(C))[0]
    if dep.size:
        # inter blocks add the pair partner's same-order difference
        d2_p = d2[partner[dep]]
        d3_p = np.diff(d2_p, axis=1, prepend=0)
        f_s = np.repeat(f[dep], BLOCK, axis=1)
        g_s = np.repeat(inter[dep], BLOCK, axis=1)
        v = d_flat[dep] + g_s * np.where(f_s, d3_p, d2_p)
        d2[dep] = chain_d2(v, f[dep])
    q = np.cumsum(np.cumsum(d2, axis=1), axis=1)[:, :L]
    return q.astype(np.int16)
