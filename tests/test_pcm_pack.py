"""Delta block-pack s16 wire codec (ops/pcm_pack.py): lossless round-trip
across content classes, block-boundary and width-escalation edges."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vorbispizza_tpu.ops.pcm_pack import BLOCK, WIDTHS, pack_pcm, unpack_pcm


def roundtrip(q: np.ndarray) -> int:
    packed, nbytes, widx = jax.jit(pack_pcm)(jnp.asarray(q, dtype=jnp.int32))
    nb = int(nbytes)
    got = unpack_pcm(
        np.asarray(packed[:nb]), np.asarray(widx), q.shape[0], q.shape[1]
    )
    assert np.array_equal(got, q.astype(np.int16)), "round-trip mismatch"
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

    Each block's d2 pattern sums to zero in both d1 and q so blocks are
    independent — except the width-1 block (d2 in {0,-1} only cannot sum
    to zero), which leaves a -1 slope that the final width-2 block (+1)
    repairs; q drifts by ~BLOCK in between, still well inside s16."""
    blocks = []

    def blk(*spikes):
        b = np.zeros(BLOCK, dtype=np.int64)
        for pos, v in spikes:
            b[pos] = v
        blocks.append(b)

    blk()  # width 0
    for w in [w for w in WIDTHS if 2 <= w <= 16]:
        # zigzag(-2B) = 4B-1 = 2^w - 1: exactly w bits
        B = 1 << (w - 2)
        blk((0, B), (1, -2 * B), (2, B))
    # width 18 needs |d2| beyond the q range; derive from an in-range
    # q spike [A, B, 0, 0]: d2 = [A, B-2A, A-2B, B]
    for A, B, w in ((32600, -32700, 18),):
        d2 = [A, B - 2 * A, A - 2 * B, B]
        zz = max((abs(v) * 2 - (v < 0)) for v in d2)
        assert (1 << (w - 1)) <= zz < (1 << w), (w, zz)
        blk(*enumerate(d2))
    blk((0, -1))  # width 1: d2 in {0,-1}; leaves d1 = -1
    blk((0, 1))  # width 2 again; repairs the slope

    d2 = np.concatenate(blocks)
    q = np.cumsum(np.cumsum(d2))[None, :]
    assert q.min() >= -32768 and q.max() <= 32767
    packed, nbytes, widx = jax.jit(pack_pcm)(jnp.asarray(q, dtype=jnp.int32))
    roundtrip(q)
    assert set((np.asarray(widx) & 0x1F).tolist()) == set(range(len(WIDTHS)))


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
    packed, nbytes, widx = jax.jit(pack_pcm)(jnp.asarray(q))
    nb = int(nbytes)
    widx_h = np.asarray(widx)
    assert (widx_h >> 5).any(), "expected some third-difference blocks"
    assert ((widx_h >> 5) == 0).any(), "expected some second-difference blocks"
    data = np.asarray(packed[:nb])
    via_native = unpack_pcm(data, widx_h, 2, q.shape[1])
    via_numpy = _unpack_pcm_numpy(data, widx_h, 2, q.shape[1])
    assert np.array_equal(via_native, q.astype(np.int16))
    assert np.array_equal(via_numpy, q.astype(np.int16))


def test_d3_saves_bytes_on_smooth_content():
    t = np.arange(44100 * 2, dtype=np.float64)
    sig = 0.5 * np.sin(2 * np.pi * 220 * t / 44100)
    q = np.rint(sig * 32767).astype(np.int32)[None, :]
    packed, nbytes, widx = jax.jit(pack_pcm)(jnp.asarray(q))
    nb = int(nbytes)
    # pure tone: d3 narrows nearly every block vs d2-only packing
    assert (np.asarray(widx) >> 5).mean() > 0.9
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
    packed, nbytes, widx = jax.jit(pack_pcm)(jnp.asarray(q))
    nb = int(nbytes)
    widx_h = np.asarray(widx)
    NB = widx_h.shape[0] // 2
    assert not (widx_h[:NB] >> 6).any(), "even channel must never be inter"
    assert (widx_h[NB:] >> 6).any(), "correlated stereo should pick inter"
    data = np.asarray(packed[:nb])
    assert np.array_equal(unpack_pcm(data, widx_h, 2, q.shape[1]), q.astype(np.int16))
    assert np.array_equal(_unpack_pcm_numpy(data, widx_h, 2, q.shape[1]), q.astype(np.int16))
    # the independent encoding of the same content costs more
    mono = jax.jit(pack_pcm)(jnp.asarray(q[1:]))
    assert nb < int(mono[1]) + int(
        jax.jit(pack_pcm)(jnp.asarray(q[:1]))[1]
    )


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
        packed, nbytes, widx = jax.jit(pack_pcm)(jnp.asarray(q))
        nb = int(nbytes)
        data = np.asarray(packed[:nb])
        widx_h = np.asarray(widx)
        NB = widx_h.shape[0] // C
        partner = pair_partner(C)
        for c in range(C):  # only paired dependents may carry bit 6
            has_inter = bool((widx_h[c * NB : (c + 1) * NB] >> 6).any())
            if partner[c] == c:
                assert not has_inter, c
        assert np.array_equal(
            unpack_pcm(data, widx_h, C, q.shape[1]), q.astype(np.int16)
        )
        assert np.array_equal(
            _unpack_pcm_numpy(data, widx_h, C, q.shape[1]), q.astype(np.int16)
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
    packed, nbytes, widx = jax.jit(pack_pcm)(jnp.asarray(q51))
    widx_h = np.asarray(widx)
    NB = widx_h.shape[0] // 6
    for c in (2, 4):
        assert (widx_h[c * NB : (c + 1) * NB] >> 6).any(), c
    data = np.asarray(packed[: int(nbytes)])
    assert np.array_equal(
        unpack_pcm(data, widx_h, 6, q51.shape[1]), q51.astype(np.int16)
    )


def test_soft_cap_truncates_and_reports_true_nbytes():
    """compact() under a soft cap drops groups past the cap but still
    reports the exact total, so hosts detect overflow from the header
    alone; the kept prefix is byte-identical to the full-cap pack."""
    from vorbispizza_tpu.ops.pcm_pack import compact, select_candidate, words_matmul

    rng = np.random.default_rng(3)
    q = rng.integers(-32768, 32768, size=(2, 4 * BLOCK))  # wide blocks
    blk, widx, _ = select_candidate(jnp.asarray(q, jnp.int32))
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


def test_pull_wire_small_buffer_hint_undershoot():
    """A hint-sized first page that undershoots on a wire buffer SMALLER
    than the fixed page sizes must still pull the remainder (regression:
    the remainder slice was sized past the buffer and crashed)."""
    from vorbispizza_tpu.ops.pcm_pack import pull_wire, start_page0

    nbt = 64
    nb = 300 * 1024
    cap = 400 * 1024  # between one 256 KB quantum and two: the quantized
    # tail slice must clamp to the buffer
    rng = np.random.default_rng(9)
    wire = np.empty(cap, dtype=np.uint8)
    wire[:4] = np.array([nb], dtype=np.int32).view(np.uint8)
    wire[4 : 4 + nbt] = rng.integers(0, 255, size=nbt, dtype=np.uint8)
    payload = rng.integers(0, 255, size=nb, dtype=np.uint8)
    wire[4 + nbt : 4 + nbt + nb] = payload
    dev = jnp.asarray(wire)
    page0 = start_page0(dev, hint_bytes=10 * 1024)  # deliberate undershoot
    got_nb, got_widx, got_data = pull_wire(dev, nbt, page0)
    assert got_nb == nb
    assert np.array_equal(got_widx, wire[4 : 4 + nbt])
    assert np.array_equal(got_data, payload)


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


def test_pull_wire_midrange_remainder():
    """A 0.5-4 MB remainder after first-page undershoot pulls small
    pages (bounded overshoot) and reassembles exactly."""
    from vorbispizza_tpu.ops.pcm_pack import pull_wire, start_page0

    nbt = 64
    nb = int(1.5 * 1024 * 1024)
    cap = 8 * 1024 * 1024
    rng = np.random.default_rng(11)
    wire = np.zeros(cap, dtype=np.uint8)
    wire[:4] = np.array([nb], dtype=np.int32).view(np.uint8)
    wire[4 : 4 + nbt] = rng.integers(0, 255, size=nbt, dtype=np.uint8)
    payload = rng.integers(0, 255, size=nb, dtype=np.uint8)
    wire[4 + nbt : 4 + nbt + nb] = payload
    dev = jnp.asarray(wire)
    page0 = start_page0(dev, hint_bytes=8 * 1024)  # deliberate undershoot
    got_nb, got_widx, got_data = pull_wire(dev, nbt, page0)
    assert got_nb == nb
    assert np.array_equal(got_widx, wire[4 : 4 + nbt])
    assert np.array_equal(got_data, payload)
