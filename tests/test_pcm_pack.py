"""Delta block-pack s16 wire codec (ops/pcm_pack.py): lossless round-trip
across content classes, block-boundary and width-escalation edges."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vorbispizza_tpu.ops.pcm_pack import BLOCK, WIDTHS, pack_pcm, unpack_pcm


def pack_parts(q):
    """jit pack -> host (data, widx, cuts, nb)."""
    payload, nbytes, widx, cuts = jax.jit(pack_pcm)(
        jnp.asarray(q, dtype=jnp.int32)
    )
    nb = int(nbytes)
    return np.asarray(payload[:nb]), np.asarray(widx), np.asarray(cuts), nb


def roundtrip(q: np.ndarray) -> int:
    from vorbispizza_tpu.ops.pcm_pack import _unpack_pcm_numpy

    payload, nbytes, widx, cuts = jax.jit(pack_pcm)(
        jnp.asarray(q, dtype=jnp.int32)
    )
    nb = int(nbytes)
    data = np.asarray(payload[:nb])
    widx_h = np.asarray(widx)
    cuts_h = np.asarray(cuts)
    got = unpack_pcm(data, widx_h, q.shape[0], q.shape[1], cuts_h)
    assert np.array_equal(got, q.astype(np.int16)), "round-trip mismatch"
    got_np = _unpack_pcm_numpy(data, widx_h, q.shape[0], q.shape[1], cuts_h)
    assert np.array_equal(got_np, q.astype(np.int16)), "numpy mismatch"
    return nb


@pytest.mark.parametrize(
    "shape,kind",
    [
        ((2, 44100), "noise"),
        ((2, 70001), "smooth"),  # non-multiple of BLOCK
        ((1, 257), "zeros"),
        ((3, 1000), "rails"),  # full-scale alternation (the 18-bit escape)
        ((6, 12800), "quiet"),
        ((1, 1), "single"),
        ((2, BLOCK), "oneblock"),
    ],
)
def test_roundtrip(shape, kind):
    rng = np.random.default_rng(7)
    C, L = shape
    if kind == "noise":
        q = rng.integers(-32768, 32768, size=shape)
    elif kind == "smooth":
        q = np.cumsum(rng.integers(-50, 51, size=shape), axis=1).clip(
            -32768, 32767
        )
    elif kind == "zeros":
        q = np.zeros(shape, dtype=np.int64)
    elif kind == "rails":
        q = np.tile(np.array([[-32768, 32767]]), (C, L // 2))[:, :L]
    elif kind == "quiet":
        q = rng.integers(-3, 4, size=shape)
    else:
        q = rng.integers(-32768, 32768, size=shape)
    roundtrip(q.astype(np.int32))


def test_compresses_smooth_audio():
    rng = np.random.default_rng(1)
    t = np.arange(44100 * 2, dtype=np.float64)
    sig = 0.3 * np.sin(2 * np.pi * 220 * t / 44100) + 0.05 * np.sin(
        2 * np.pi * 1761 * t / 44100
    )
    q = np.rint(sig * 32767).astype(np.int32)[None, :]
    nb = roundtrip(q)
    # tonal content at this amplitude needs ~10 bits/sample of d2
    assert nb < 0.7 * q.size * 2, (nb, q.size * 2)


def test_every_width_exercised():
    """One block per width class, constructed in d2 space.

    Every block must be DENSE at its magnitude: rice mode legitimately
    claims sparse-spike blocks (128 + sum(z) bits beats BLOCK*w), so a
    block only lands on width rung w when most samples need w bits. The
    dense period-4 pattern [m, -m, -m, m] is neutral in d1 and q with
    q <= m; rung 11 (width 18) uses full-scale rail alternation (the
    only q-realizable d2 of that magnitude); width 1 (d2 in {0,-1}
    cannot sum to zero) leaves a -1 slope repaired by a final +1 spike
    (which rice may claim at k=0 — rung 0 is covered by the zeros
    block either way)."""
    blocks = []

    def blk(*spikes):
        b = np.zeros(BLOCK, dtype=np.int64)
        for pos, v in spikes:
            b[pos] = v
        blocks.append(b)

    blk()  # width 0 (rung 0)
    for w in [w for w in WIDTHS if 2 <= w <= 16]:
        # dense: every sample |d2| = m, zigzag(2m) needs exactly w bits
        m = 1 << (w - 2)
        blocks.append(np.tile([m, -m, -m, m], BLOCK // 4))
    # width 18 (rung 11): q rails -A, +A, ... give dense d2 = ±2A with
    # zigzag ~4A >= 2^17; close with two zeros so d1 and q end at 0
    A = 32767
    q_rail = np.tile([-A, A], BLOCK // 2).astype(np.int64)
    q_rail[-2:] = 0
    d1r = np.diff(q_rail, prepend=0)
    blocks.append(np.diff(d1r, prepend=0))
    blk((0, -1))  # width 1: d2 in {0,-1}; leaves d1 = -1
    blk((0, 1))  # repair spike (rice-claimable; slope restored)

    d2 = np.concatenate(blocks)
    q = np.cumsum(np.cumsum(d2))[None, :]
    assert q.min() >= -32768 and q.max() <= 32767
    _, widx, _, _ = pack_parts(q)
    roundtrip(q)
    assert set((widx & 0x1F).tolist()) == set(range(len(WIDTHS)))
    rice = (widx >> 7) & 1
    # the dense rungs must all have come from width mode
    for rung in range(1, len(WIDTHS)):
        assert ((widx & 0x1F) == rung)[rice == 0].any() or (
            (widx & 0x1F) != rung
        ).all(), rung


def test_d3_blocks_and_numpy_fallback():
    """Smooth (quadratic/cubic) content makes the packer choose the
    third-difference predictor; the C++ unpacker and the numpy fallback
    must agree exactly on mixed d2/d3 block runs."""
    from vorbispizza_tpu.ops.pcm_pack import _unpack_pcm_numpy

    rng = np.random.default_rng(3)
    t = np.arange(40_000, dtype=np.float64)
    # tonal content (d3-friendly) plus a noisy segment (d2-friendly) so
    # block runs alternate
    sig = 20000 * np.sin(2 * np.pi * 220 * t / 44100)
    sig[15_000:18_000] += rng.integers(-3000, 3000, size=3000)
    q = np.stack([sig, -0.7 * sig]).round().astype(np.int32).clip(-32768, 32767)
    data, widx_h, cuts, nb = pack_parts(q)
    assert ((widx_h >> 5) & 1).any(), "expected some third-difference blocks"
    assert (((widx_h >> 5) & 1) == 0).any(), "expected some second-difference blocks"
    via_native = unpack_pcm(data, widx_h, 2, q.shape[1], cuts)
    via_numpy = _unpack_pcm_numpy(data, widx_h, 2, q.shape[1], cuts)
    assert np.array_equal(via_native, q.astype(np.int16))
    assert np.array_equal(via_numpy, q.astype(np.int16))


def test_d3_saves_bytes_on_smooth_content():
    t = np.arange(44100 * 2, dtype=np.float64)
    sig = 0.5 * np.sin(2 * np.pi * 220 * t / 44100)
    q = np.rint(sig * 32767).astype(np.int32)[None, :]
    _, widx, _, _ = pack_parts(q)
    # pure tone: d3 narrows nearly every block vs d2-only packing
    assert ((widx >> 5) & 1).mean() > 0.9
    roundtrip(q)


def test_inter_channel_blocks():
    """Correlated stereo picks the inter-channel candidates (bit 6); both
    unpackers reconstruct exactly, and the wire shrinks vs independent
    channels."""
    from vorbispizza_tpu.ops.pcm_pack import _unpack_pcm_numpy

    rng = np.random.default_rng(4)
    t = np.arange(60_000, dtype=np.float64)
    base = 15000 * np.sin(2 * np.pi * 220 * t / 44100) + 4000 * np.sin(
        2 * np.pi * 663 * t / 44100
    )
    side = 300 * np.sin(2 * np.pi * 441 * t / 44100)
    q = (
        np.stack([base + side, base - side])
        .round()
        .astype(np.int32)
        .clip(-32768, 32767)
    )
    data, widx_h, cuts, nb = pack_parts(q)
    NB = widx_h.shape[0] // 2
    assert not ((widx_h[:NB] >> 6) & 1).any(), "even channel must never be inter"
    assert ((widx_h[NB:] >> 6) & 1).any(), "correlated stereo should pick inter"
    assert np.array_equal(
        unpack_pcm(data, widx_h, 2, q.shape[1], cuts), q.astype(np.int16)
    )
    assert np.array_equal(
        _unpack_pcm_numpy(data, widx_h, 2, q.shape[1], cuts),
        q.astype(np.int16),
    )
    # the independent encoding of the same content costs more
    assert nb < pack_parts(q[1:])[3] + pack_parts(q[:1])[3]


def test_inter_channel_multichannel_pairs():
    """Multichannel pairing (pair_partner): the 3/5/6/7/8-channel spec
    orders pair the correlated front L/R (0,2), surrounds (3,4) and —
    for 8 channels — rears (5,6), leaving center/LFE/rear-center
    unpaired; other counts pair adjacently and leave a trailing odd
    channel alone. Both unpackers reconstruct exactly."""
    from vorbispizza_tpu.ops.pcm_pack import _unpack_pcm_numpy, pair_partner

    rng = np.random.default_rng(5)
    t = np.arange(20_000, dtype=np.float64)
    tone = 9000 * np.sin(2 * np.pi * 180 * t / 44100)
    chans = [tone + 100 * rng.standard_normal(t.size) for _ in range(8)]
    for C in (2, 3, 4, 5, 6, 7, 8):
        q = (
            np.stack(chans[:C])
            .round()
            .astype(np.int32)
            .clip(-32768, 32767)
        )
        data, widx_h, cuts, nb = pack_parts(q)
        NB = widx_h.shape[0] // C
        partner = pair_partner(C)
        for c in range(C):  # only paired dependents may carry bit 6
            has_inter = bool(
                ((widx_h[c * NB : (c + 1) * NB] >> 6) & 1).any()
            )
            if partner[c] == c:
                assert not has_inter, c
        assert np.array_equal(
            unpack_pcm(data, widx_h, C, q.shape[1], cuts),
            q.astype(np.int16),
        )
        assert np.array_equal(
            _unpack_pcm_numpy(data, widx_h, C, q.shape[1], cuts),
            q.astype(np.int16),
        )

    # 5.1-shaped correlation (front pair + rear pair, distinct content):
    # dependents 2 and 4 pick inter against partners 0 and 3, and the wire
    # beats adjacent pairing on this content
    front = 12000 * np.sin(2 * np.pi * 220 * t / 44100)
    rear = 7000 * np.sin(2 * np.pi * 147 * t / 44100)
    side_f = 250 * np.sin(2 * np.pi * 441 * t / 44100)
    side_r = 180 * np.sin(2 * np.pi * 330 * t / 44100)
    center = 5000 * np.sin(2 * np.pi * 95 * t / 44100)
    lfe = 3000 * np.sin(2 * np.pi * 40 * t / 44100)
    q51 = (
        np.stack([
            front + side_f, center, front - side_f,
            rear + side_r, rear - side_r, lfe,
        ])
        .round().astype(np.int32).clip(-32768, 32767)
    )
    data, widx_h, cuts, nb = pack_parts(q51)
    NB = widx_h.shape[0] // 6
    for c in (2, 4):
        assert ((widx_h[c * NB : (c + 1) * NB] >> 6) & 1).any(), c
    assert np.array_equal(
        unpack_pcm(data, widx_h, 6, q51.shape[1], cuts),
        q51.astype(np.int16),
    )


def test_soft_cap_truncates_and_reports_true_nbytes():
    """compact() under a soft cap drops groups past the cap but still
    reports the exact total, so hosts detect overflow from the header
    alone; the kept prefix is byte-identical to the full-cap pack."""
    from vorbispizza_tpu.ops.pcm_pack import compact, select_candidate, words_matmul

    rng = np.random.default_rng(3)
    q = rng.integers(-32768, 32768, size=(2, 4 * BLOCK))  # wide blocks
    blk, widx, _, _ = select_candidate(jnp.asarray(q, jnp.int32))
    allb = words_matmul(blk)
    full, nb_full = compact(allb, widx)
    cap = 8  # groups; noise blocks need ~18 each -> overflow
    soft, nb_soft = compact(allb, widx, cap_groups=cap)
    assert int(nb_soft) == int(nb_full) > cap * 16
    assert soft.shape[0] == cap * 16
    assert np.array_equal(np.asarray(soft), np.asarray(full)[: cap * 16])


def test_corpus_overflow_redispatch():
    """A near-incompressible corpus overflows the soft-capacity dpack wire;
    decode_corpus must detect it from the header and re-run with the
    full-capacity program, bit-equal to the per-file anchor path."""
    from vorbispizza_tpu.models.corpus import decode_corpus
    from vorbispizza_tpu.reader import VorbisReader
    from vorbispizza_tpu.testing.encode import encode_vorbis, make_signal

    rate = 44100
    data = encode_vorbis(
        make_signal(2, 1.2, rate=rate, kind="noise", seed=5),
        rate=rate,
        quality=0.7,
    )
    outs = decode_corpus([data], output="s16")
    r = VorbisReader(data)
    r.initialize()
    ref = r.read_all(planar=True)
    q = np.clip(
        np.rint(ref.astype(np.float64) * 32768.0), -32768, 32767
    ).astype(np.int64)
    assert np.abs(outs[0].astype(np.int64) - q).max() <= 1


def _build_wire(nbt: int, cap: int, rng, channels: int = 1):
    """A consistent all-width-18 wire (plane-only, no rice) of nbt blocks
    inside a cap-byte buffer; returns (wire, nb, HDR)."""
    from vorbispizza_tpu.ops.pcm_pack import wire_header_bytes

    HDR = wire_header_bytes(channels)
    nb = nbt * 16 * WIDTHS[-1]
    assert HDR + nbt + nb <= cap
    wire = np.zeros(cap, dtype=np.uint8)
    wire[:4] = np.array([nb], dtype=np.int32).view(np.uint8)
    wire[4:8] = np.array(
        [cap - HDR - nbt], dtype=np.uint32
    ).view(np.uint8)  # plane cap = whole payload region (no unary)
    # ch_ubit stays zero (no rice blocks)
    wire[HDR : HDR + nbt] = len(WIDTHS) - 1  # rung 11 = width 18
    wire[HDR + nbt : HDR + nbt + nb] = rng.integers(
        0, 255, size=nb, dtype=np.uint8
    )
    return wire, nb, HDR


def test_pull_wire_small_buffer_hint_undershoot():
    """A hint-sized first page that undershoots on a wire buffer SMALLER
    than the fixed page sizes must still pull the remainder (regression:
    the remainder slice was sized past the buffer and crashed)."""
    from vorbispizza_tpu.ops.pcm_pack import pull_wire, start_page0

    nbt = 1024  # 1024 width-18 blocks -> 288 KB payload
    cap = 400 * 1024  # between one 256 KB quantum and two: the quantized
    # tail slice must clamp to the buffer
    rng = np.random.default_rng(9)
    wire, nb, HDR = _build_wire(nbt, cap, rng)
    dev = jnp.asarray(wire)
    page0 = start_page0(dev, hint_bytes=10 * 1024)  # deliberate undershoot
    got_nb, got_widx, got_cuts, got_data = pull_wire(dev, nbt, 1, page0)
    assert got_nb == nb
    assert np.array_equal(got_widx, wire[HDR : HDR + nbt])
    assert np.array_equal(got_data, wire[HDR + nbt : HDR + nbt + nb])


def test_malformed_wire_fails_loudly():
    """An integrity-violating wire (bad geometry, out-of-range width
    class) must raise on BOTH unpack paths — the C++ unpacker's
    rejections (frontend.cpp vp_unpack_pcm rc<0) must not fall through
    to the numpy path and return silently truncated PCM."""
    from vorbispizza_tpu import native
    from vorbispizza_tpu.ops.pcm_pack import _unpack_pcm_numpy

    L = 4 * BLOCK
    C = 2
    good_widx = np.zeros(C * 4, dtype=np.uint8)  # all width-0 blocks
    payload = np.zeros(0, dtype=np.uint8)
    # 1) wire covering fewer samples than L
    short_widx = np.zeros(C * 3, dtype=np.uint8)
    with pytest.raises(ValueError):
        _unpack_pcm_numpy(payload, short_widx, C, L)
    if native.available():
        with pytest.raises(ValueError):
            native.unpack_pcm(payload, short_widx, C, L)
    # 2) width class beyond the WIDTHS table
    bad_widx = good_widx.copy()
    bad_widx[1] = len(WIDTHS)  # class 12: invalid, bit5/6 clear
    with pytest.raises(ValueError):
        _unpack_pcm_numpy(payload, bad_widx, C, L)
    if native.available():
        with pytest.raises(ValueError):
            native.unpack_pcm(payload, bad_widx, C, L)
    # 3) widx not divisible by channel count
    with pytest.raises(ValueError):
        _unpack_pcm_numpy(payload, np.zeros(C * 4 + 1, dtype=np.uint8), C, L)


def test_corrupt_unary_fails_loudly():
    """Rice-wire integrity: a unary stream whose terminators desync from
    the channel cuts (flipped byte, truncated section, missing cuts)
    must raise on BOTH unpack paths, never silently emit wrong PCM."""
    from vorbispizza_tpu import native
    from vorbispizza_tpu.ops.pcm_pack import (
        _unpack_pcm_numpy,
        plane_bytes_of,
    )

    t = np.arange(20_000, dtype=np.float64)
    q = (
        (9000 * np.sin(2 * np.pi * 220 * t / 44100))
        .round()
        .astype(np.int32)[None, :]
    )
    data, widx, cuts, nb = pack_parts(q)
    assert (widx >> 7).any(), "content must pick rice blocks"
    C, L = q.shape

    def paths_raise(d, w, cu):
        with pytest.raises(ValueError):
            _unpack_pcm_numpy(d, w, C, L, cu)
        if native.available():
            with pytest.raises(ValueError):
                native.unpack_pcm(d, w, C, L, cu)

    # 1) missing channel cuts on a rice wire
    paths_raise(data, widx, None)
    # 2) a cleared unary byte drops terminators -> counts desync
    plane = plane_bytes_of(widx)
    first_set = plane + int(np.flatnonzero(data[plane:])[0])
    bad = data.copy()
    bad[first_set] = 0
    paths_raise(bad, widx, cuts)
    # 3) truncated unary section
    paths_raise(data[: plane + 4], widx, cuts)
    # 4) non-monotonic cuts (multichannel)
    q2 = np.vstack([q, q])
    d2, w2, c2, _ = pack_parts(q2)
    if (w2 >> 7).any():
        badc = c2.copy()[::-1].copy()
        if badc[0] != badc[-1]:  # genuinely decreasing
            with pytest.raises(ValueError):
                _unpack_pcm_numpy(d2, w2, 2, q2.shape[1], badc)


def test_pull_wire_midrange_remainder():
    """A 0.5-4 MB remainder after first-page undershoot pulls small
    pages (bounded overshoot) and reassembles exactly."""
    from vorbispizza_tpu.ops.pcm_pack import pull_wire, start_page0

    nbt = 5461  # ~1.5 MB of width-18 blocks
    cap = 8 * 1024 * 1024
    rng = np.random.default_rng(11)
    wire, nb, HDR = _build_wire(nbt, cap, rng)
    dev = jnp.asarray(wire)
    page0 = start_page0(dev, hint_bytes=8 * 1024)  # deliberate undershoot
    got_nb, got_widx, got_cuts, got_data = pull_wire(dev, nbt, 1, page0)
    assert got_nb == nb
    assert np.array_equal(got_widx, wire[HDR : HDR + nbt])
    assert np.array_equal(got_data, wire[HDR + nbt : HDR + nbt + nb])


def test_pull_wire_moved_accounting():
    """moved_out reports the ACTUAL page bytes materialized: one
    hint-covered page when the hint overshoots (no remainder trips), and
    first page + remainder pages on undershoot — always >= the payload."""
    from vorbispizza_tpu.ops.pcm_pack import pull_wire, start_page0

    nbt = 2048  # 576 KB of width-18 blocks
    cap = 4 * 1024 * 1024
    rng = np.random.default_rng(13)
    wire, nb, HDR = _build_wire(nbt, cap, rng)
    dev = jnp.asarray(wire)

    # overshoot: the first page covers the whole wire -> ONE page moved
    moved = [0]
    page0 = start_page0(dev, hint_bytes=HDR + nbt + nb + 100_000)
    got_nb, _, _, got_data = pull_wire(dev, nbt, 1, page0, moved_out=moved)
    assert got_nb == nb
    assert np.array_equal(got_data, wire[HDR + nbt : HDR + nbt + nb])
    assert moved[0] == int(page0.shape[0]) >= HDR + nbt + nb

    # undershoot: first page + remainder pages, all counted
    moved = [0]
    page0 = start_page0(dev, hint_bytes=8 * 1024)
    got_nb, _, _, got_data = pull_wire(dev, nbt, 1, page0, moved_out=moved)
    assert got_nb == nb
    assert np.array_equal(got_data, wire[HDR + nbt : HDR + nbt + nb])
    assert moved[0] >= HDR + nbt + nb
    assert moved[0] > int(page0.shape[0])  # remainder pages counted too


def test_corpus_learns_wire_ratio():
    """decode_corpus teaches the dispatch-side wire-size predictor: after
    a dpack corpus decode the synthesizer carries a payload/raw ratio in
    (0, 1.3), so the next corpus's first page is sized to cover the whole
    wire (one async copy per chunk instead of a header round trip + a
    collect-time remainder launch)."""
    from vorbispizza_tpu.models.corpus import _synthesizer_for, decode_corpus
    from vorbispizza_tpu.reader import VorbisReader
    from vorbispizza_tpu.testing.encode import encode_vorbis, make_signal

    data = encode_vorbis(
        make_signal(2, 1.5, rate=44100, kind="music", seed=3),
        rate=44100,
        quality=0.4,
    )
    out1 = decode_corpus([data], output="s16")[0]
    r = VorbisReader(data)
    r.initialize()
    ref = np.clip(
        np.round(r.read_all(planar=True) * 32767.0), -32768, 32767
    ).astype(np.int16)
    assert out1.shape == ref.shape
    assert np.abs(out1.astype(np.int32) - ref.astype(np.int32)).max() <= 1

    # the synthesizer registry is keyed by channel count; fetch through
    # the same front end the corpus used
    from vorbispizza_tpu.models.corpus import _front_end

    setup, channels = _front_end(data)[:2]
    synth = _synthesizer_for(setup, channels)
    ratio = getattr(synth, "_wire_ratio", None)
    assert ratio is not None and 0.0 < ratio < 1.3

    # calibrated second decode is still bit-identical
    out2 = decode_corpus([data], output="s16")[0]
    assert np.array_equal(out1, out2)


def test_wire_assembly_and_pull_roundtrip():
    """The full device wire as the pipeline assembles it — header with
    per-channel unary cuts, widx, planes|unary payload — pulled via
    pull_wire and unpacked, on rice-heavy content."""
    from vorbispizza_tpu.ops.pcm_pack import (
        G_PER,
        UNARY_WORDS_FULL_PER_BLOCK,
        pull_wire,
        start_page0,
        wire_header_bytes,
        wire_rows,
    )

    rng = np.random.default_rng(13)
    t = np.arange(50_000, dtype=np.float64)
    base = 11000 * np.sin(2 * np.pi * 220 * t / 44100)
    q = (
        np.stack([base + 200 * rng.standard_normal(t.size), 0.8 * base])
        .round()
        .astype(np.int32)
        .clip(-32768, 32767)
    )
    C, L = q.shape
    NBt = wire_rows(L, C)

    def assemble(qd):
        payload, nbytes, widx, cuts = pack_pcm(qd)
        hdr = (
            nbytes >> jnp.asarray([0, 8, 16, 24], jnp.int32)
        ).astype(jnp.uint8)
        plane_cap = jnp.asarray(
            np.array([16 * NBt * G_PER], dtype=np.uint32).view(np.uint8)
        )
        cuts8 = (
            (cuts[:, None] >> jnp.asarray([0, 8, 16, 24], jnp.uint32))
            & 0xFF
        ).astype(jnp.uint8).reshape(-1)
        return jnp.concatenate([hdr, plane_cap, cuts8, widx, payload])

    wire = jax.jit(assemble)(jnp.asarray(q))
    assert wire.shape[0] == (
        wire_header_bytes(C)
        + NBt
        + 16 * NBt * G_PER
        + 4 * NBt * UNARY_WORDS_FULL_PER_BLOCK
    )
    page0 = start_page0(wire, hint_bytes=4 * 1024)
    nb, widx_h, cuts_h, data = pull_wire(wire, NBt, C, page0)
    assert (widx_h >> 7).any(), "expected rice blocks on this content"
    got = unpack_pcm(data, widx_h, C, L, cuts_h)
    assert np.array_equal(got, q.astype(np.int16))
