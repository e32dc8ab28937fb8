"""libnogg-style page-level anomaly vectors vs the native libvorbis oracle
(reference NVorbis.Tests/OggTests.cs:9-64: long-first-packet, empty page,
partial granule position, bad continued-packet flag)."""

import numpy as np
import pytest

from vorbispizza_tpu.reader import VorbisReader
from vorbispizza_tpu.testing.encode import encode_vorbis, make_signal
from vorbispizza_tpu.testing.pagecraft import (
    corrupt_interior_continuation,
    make_bad_continued_flag,
    make_empty_page,
    make_long_first_packet,
    make_multipage_continued,
    make_partial_granule,
    _reframe,
)


@pytest.fixture(scope="module")
def base_stream():
    sig = make_signal(2, 1.2, kind="music", seed=7)
    return encode_vorbis(sig, quality=0.3)


def s16(x):
    return np.clip(
        np.rint(np.asarray(x, dtype=np.float64) * 32768.0), -32768, 32767
    )


def oracle(data: bytes, tmp_path, name):
    from vorbispizza_tpu.testing.oracle import OracleDecoder

    p = tmp_path / name
    p.write_bytes(data)
    return OracleDecoder(str(p)).read_float()


def ours(data: bytes, accelerated=False):
    r = VorbisReader(data, accelerated=accelerated)
    r.initialize()
    return r.read_all(planar=True)


def check_vs_oracle(data, tmp_path, name, budget_frac=0.0):
    nat = oracle(data, tmp_path, name)
    got = ours(data)
    assert got.shape == nat.shape, (got.shape, nat.shape)
    diff = np.abs(s16(got) - s16(nat))
    assert (diff > 2).mean() <= budget_frac, name
    # the batch/accelerated path must agree with our scalar on these shapes
    acc = ours(data, accelerated=True)
    assert acc.shape == got.shape
    assert np.abs(acc - got).max() <= 2e-6, name


def _page_meta(data):
    import io

    from vorbispizza_tpu.ogg.container import OggContainer

    c = OggContainer(io.BytesIO(data))
    assert c.try_init()
    pr = c.providers[0]
    pr._s.ensure_all_pages()
    return pr._s.pages


def _count_packets(data):
    import io

    from vorbispizza_tpu.ogg.container import OggContainer

    c = OggContainer(io.BytesIO(data))
    assert c.try_init()
    pr = c.providers[0]
    n = 0
    while pr.get_next_packet() is not None:
        n += 1
    return n


def test_reframe_identity(base_stream, tmp_path):
    """The hand framer itself must be transparent: re-paged healthy stream
    decodes identically through native libvorbis."""
    check_vs_oracle(_reframe(base_stream), tmp_path, "reframed.ogg")


def test_long_first_packet(base_stream, tmp_path):
    data = make_long_first_packet(base_stream)
    pages = _page_meta(data)
    assert any(p.continues_packet for p in pages), "first packet must span"
    check_vs_oracle(data, tmp_path, "long-first.ogg")


def test_empty_page_mid_stream(base_stream, tmp_path):
    data = make_empty_page(base_stream)
    pages = _page_meta(data)
    assert any(p.n_slices == 0 for p in pages[3:]), "needs an empty page"
    check_vs_oracle(data, tmp_path, "empty-page.ogg")


def test_partial_granule_position(base_stream, tmp_path):
    data = make_partial_granule(base_stream)
    pages = _page_meta(data)
    assert any(
        p.granule < 0 and p.n_slices > 0 for p in pages[3:]
    ), "needs a granule-less data page"
    check_vs_oracle(data, tmp_path, "partial-granule.ogg")


def test_bad_continued_packet_flag(base_stream, tmp_path):
    """libvorbis silently drops the orphan continued data; so do we
    (reference OggTests.cs:23-31, budget 0)."""
    data = make_bad_continued_flag(base_stream)
    # exactly one packet must be swallowed by the bogus continuation flag
    assert _count_packets(data) == _count_packets(base_stream) - 1
    check_vs_oracle(data, tmp_path, "bad-continued.ogg")


def test_pagecraft_seek_parity(base_stream):
    """Seeking must agree between scalar and accelerated decoders on the
    anomaly vectors too (granule-space map)."""
    for make in (make_partial_granule, make_bad_continued_flag):
        data = make(base_stream)
        r = VorbisReader(data)
        r.initialize()
        a = VorbisReader(data, accelerated=True)
        a.initialize()
        total = r.total_samples
        for pos in (0, total // 3, total // 2):
            r.seek_to(pos)
            want = r.read_samples(512, planar=True)
            a.seek_to(pos)
            got = a.read_samples(512, planar=True)
            assert got.shape == want.shape
            assert np.abs(got - want).max() <= 2e-6, (make.__name__, pos)


def test_zero_length_packets(base_stream, tmp_path):
    """Empty packets (lacing value 0) mid-stream decode transparently —
    no samples emitted, no desync, overlap state preserved (reference
    StreamDecoder ReadNextPacket records a failed decode and continues).

    The oracle is NOT authoritative here: libvorbisfile treats the failed
    packet as a hole and re-derives its PCM offset from page granules,
    shifting/dropping ~1.8k samples (measured). The spec-correct output is
    bit-identical to the unmodified stream, which is what we assert."""
    from vorbispizza_tpu.testing.pagecraft import make_zero_length_packets

    data = make_zero_length_packets(base_stream)
    assert _count_packets(data) > _count_packets(base_stream)
    want = ours(base_stream)
    got = ours(data)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)
    acc = ours(data, accelerated=True)
    assert acc.shape == want.shape
    assert np.abs(acc - got).max() <= 2e-6
    # the oracle must still decode it (no crash / error)
    nat = oracle(data, tmp_path, "zero-length.ogg")
    assert nat.shape[0] == want.shape[0]


def test_serial_reuse_chain(base_stream):
    """Second chain reuses the first chain's retired serial (reference
    Ogg/PageReader.cs:77-87): EOS retires the serial, the later BOS claims
    it again as a NEW logical stream; both chains must decode bit-exactly.

    libvorbisfile cannot be the oracle for this shape: its chain bisection
    keys on serial-number CHANGES, so a reused serial hides the second link
    and its hole-recovery emits untrimmed tails (measured 2x53208 vs the
    correct 2x52920) — the very defect the reference's serial retirement
    exists to avoid."""
    from vorbispizza_tpu.testing.pagecraft import make_serial_reuse_chain

    data = make_serial_reuse_chain(base_stream)
    for accelerated in (False, True):
        want = ours(base_stream, accelerated=accelerated)
        r = VorbisReader(data, accelerated=accelerated)
        r.initialize()
        parts = [r.read_all(planar=True)]
        while r.find_next_stream():
            r.switch_streams(r.streams_count - 1)
            parts.append(r.read_all(planar=True))
        assert r.streams_count == 2, accelerated
        assert all(p.shape == want.shape for p in parts), accelerated
        tol = 0.0 if not accelerated else 2e-6
        for p in parts:
            assert np.abs(p - want).max() <= tol, accelerated


def test_max_lacing_page(base_stream, tmp_path):
    """A full 255x255 page (no terminating lacing value; body at the Ogg
    address-quantum ceiling) continuing onto the next page — the libnogg
    large-page analog. CRC, lacing walk, and packet assembly must span it."""
    from vorbispizza_tpu.testing.pagecraft import make_max_lacing_page

    data = make_max_lacing_page(base_stream)
    # raw walk: one page must carry 255 lacing values, all 255 (body at
    # the 65025-byte ceiling, no terminator)
    off, found = 0, False
    while off < len(data):
        assert data[off : off + 4] == b"OggS"
        nseg = data[off + 26]
        lac = data[off + 27 : off + 27 + nseg]
        if nseg == 255 and min(lac) == 255:
            found = True
        off += 27 + nseg + sum(lac)
    assert found, "needs a full 255x255 page"
    pages = _page_meta(data)
    assert any(p.continues_packet for p in pages), "packet must continue"
    check_vs_oracle(data, tmp_path, "max-lacing.ogg")


def test_multipage_continued_packet(base_stream, tmp_path):
    """A packet continued across >2 pages: interior pages are pure
    continuation (open AND close mid-packet) — geometry a 2-page span
    never produces. Must decode bit-equal to libvorbis (reference
    continuation assembly: Ogg/PacketProvider.cs, OggTests.cs:9-92)."""
    data = make_multipage_continued(base_stream)
    pages = _page_meta(data)
    interior = [
        p for p in pages if p.continues_packet and p.last_incomplete
    ]
    assert len(interior) >= 2, "packet must span more than two pages"
    check_vs_oracle(data, tmp_path, "multipage-continued.ogg")


def test_resync_inside_continuation(base_stream, tmp_path):
    """CRC failure on an INTERIOR page of a >2-page continued packet: the
    packet can never complete, so the decoder drops the partial data,
    resyncs on the next page boundary, and keeps decoding — like
    libvorbis. Parity assertions are structural, because libvorbisfile
    re-derives post-hole PCM offsets from page granules and lands on a
    slightly different total (cf. test_zero_length_packets): (a) both
    decoders' outputs diverge from the healthy stream at the SAME first
    sample (the hole), (b) after resync the final 16k samples agree at
    f32 precision (both re-anchor the end to the final page granule)."""
    healthy = make_multipage_continued(base_stream)
    bad = corrupt_interior_continuation(healthy)
    assert bad != healthy and len(bad) == len(healthy)
    want = ours(healthy)
    got = ours(bad)
    nat = oracle(bad, tmp_path, "continued-resync.ogg")
    # (a) same first divergence from healthy in both decoders
    m = min(want.shape[1], got.shape[1], nat.shape[1])
    # s16 domain: ours is the f64 anchor, the oracle is f32 — raw floats
    # differ benignly at ~1e-7 everywhere; the hole diverges at ~1e-1
    ours_diff = np.nonzero(
        np.abs(s16(want[:, :m]) - s16(got[:, :m])).max(0) > 2
    )[0]
    nat_diff = np.nonzero(
        np.abs(s16(want[:, :m]) - s16(nat[:, :m])).max(0) > 2
    )[0]
    assert len(ours_diff) and len(nat_diff), "corruption must be audible"
    # ±2: the exact first >2-LSB sample wobbles with s16 rounding at the
    # divergence boundary
    assert abs(int(ours_diff[0]) - int(nat_diff[0])) <= 2, (
        "hole must start at the same sample",
        int(ours_diff[0]),
        int(nat_diff[0]),
    )
    assert ours_diff[0] > 16384, "prefix before the hole must be intact"
    # (b) tail parity after resync
    K = 16384
    tail = np.abs(s16(got[:, -K:]) - s16(nat[:, -K:]))
    assert (tail > 2).mean() == 0.0, "post-resync tail must match libvorbis"
    # scalar and accelerated paths must agree on the damaged stream too
    acc = ours(bad, accelerated=True)
    assert acc.shape == got.shape
    assert np.abs(acc - got).max() <= 2e-6


def test_multipage_continued_truncation_fuzz(base_stream):
    """Truncating the multi-page-continued vector anywhere — including
    mid-continuation — must never crash either decode path."""
    data = make_multipage_continued(base_stream)
    for frac in (0.35, 0.5, 0.6, 0.66, 0.72, 0.85, 0.97):
        cut = data[: int(len(data) * frac)]
        for accelerated in (False, True):
            r = VorbisReader(cut, accelerated=accelerated)
            try:
                r.initialize()
            except Exception:
                continue  # headers truncated: a clean refusal is fine
            pcm = r.read_all(planar=True)
            assert pcm.shape[0] == 2


def test_multipage_setup_header(base_stream, tmp_path):
    """Setup header spanning ~16 tiny pages (large-codebook shape): header
    continuation assembly is page-count-agnostic, PCM bit-equal."""
    from vorbispizza_tpu.testing.pagecraft import make_multipage_setup_header

    data = make_multipage_setup_header(base_stream)
    pages = _page_meta(data)
    # many continuation pages before the first audio page
    n_header_cont = sum(1 for p in pages[:20] if p.continues_packet)
    assert n_header_cont >= 10, "setup must span many pages"
    check_vs_oracle(data, tmp_path, "multipage-setup.ogg")
    # corrupting an interior header continuation page must yield a clean
    # refusal (no Vorbis stream), not a crash or garbage decode — the same
    # failure mode libvorbis exhibits (ov_fopen error)
    from vorbispizza_tpu.errors import InvalidDataError

    bad = corrupt_interior_continuation(data)
    r = VorbisReader(bad)
    try:
        r.initialize()
    except InvalidDataError:
        pass  # clean refusal
    else:
        # some corruption positions only damage the COMMENT packet;
        # decode must then still work and match the oracle
        check_vs_oracle(bad, tmp_path, "multipage-setup-bad.ogg")


def test_sample_rate_max(base_stream, tmp_path):
    """Ident sample rate at the u32 maximum (libnogg sample-rate-max
    analog): PCM is rate-independent, and ident parsing / duration math
    must survive the unsigned extreme without overflow or sign flips."""
    from vorbispizza_tpu.testing.pagecraft import make_sample_rate

    rate = 2**32 - 1
    data = make_sample_rate(base_stream, rate)
    r = VorbisReader(data)
    r.initialize()
    assert r.sample_rate == rate
    got = r.read_all(planar=True)
    want = ours(base_stream)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)
    acc = ours(data, accelerated=True)
    assert np.abs(acc - got).max() <= 2e-6
    # duration math stays finite and non-negative at the extreme rate
    assert r.total_samples == want.shape[1]
    assert 0.0 <= r.total_samples / r.sample_rate < 1.0
    # native libvorbis agrees on the PCM through the same file
    nat = oracle(data, tmp_path, "sample-rate-max.ogg")
    assert nat.shape == want.shape
    assert (np.abs(s16(got) - s16(nat)) > 2).mean() == 0.0
