"""Ogg layer tests: CRC, page scan, demux, packet assembly, corruption resync."""

import io

import pytest

from vorbispizza_tpu.ogg import OggContainer, PageScanner, ogg_crc
from vorbispizza_tpu.ogg.crc import ogg_crc_slow


def test_crc_matches_slow_reference():
    import random

    rng = random.Random(1234)
    for n in [0, 1, 3, 27, 255, 4096]:
        data = bytes(rng.randrange(256) for _ in range(n))
        assert ogg_crc(data) == ogg_crc_slow(data)


def test_scan_pages(testfile1):
    with open(testfile1, "rb") as f:
        sc = PageScanner(f)
        pages = []
        while (p := sc.next_page()) is not None:
            pages.append(p)
    assert len(pages) >= 3
    assert pages[0].is_bos
    assert pages[-1].is_eos
    serials = {p.serial for p in pages}
    assert len(serials) == 1
    seqs = [p.sequence for p in pages]
    assert seqs == list(range(len(pages)))
    assert sc.waste_bits == 0


def test_scan_resync_after_corruption(testfiles):
    path = [p for p in testfiles if p.name == "3test.ogg"][0]
    raw = bytearray(path.read_bytes())
    with open(path, "rb") as f:
        sc = PageScanner(f)
        for _ in range(4):
            p = sc.next_page()
        target = p  # 4th page
    raw[target.offset + 40] ^= 0xFF
    sc = PageScanner(io.BytesIO(bytes(raw)))
    pages = []
    while (p := sc.next_page()) is not None:
        pages.append(p)
    seqs = [p.sequence for p in pages]
    assert target.sequence not in seqs  # corrupted page rejected
    assert sc.waste_bits > 0
    nxt = [p for p in pages if p.sequence == target.sequence + 1]
    assert nxt and nxt[0].is_resync  # gap detected by scanner


def test_container_demux_and_packets(testfile1):
    events = []
    with open(testfile1, "rb") as f:
        c = OggContainer(f, new_stream_callback=lambda pr: events.append(pr) or True)
        assert c.try_init()
        assert len(events) == 1
        provider = events[0]
        packets = []
        while (pkt := provider.get_next_packet()) is not None:
            packets.append(pkt)
    # Vorbis: 3 header packets then audio
    assert len(packets) > 3
    assert packets[0].data[:7] == b"\x01vorbis"
    assert packets[1].data[:7] == b"\x03vorbis"
    assert packets[2].data[:7] == b"\x05vorbis"
    assert packets[-1].is_end_of_stream
    # every page granule must surface on exactly one packet
    granules = [p.granule for p in packets if p.granule >= 0]
    assert granules == sorted(granules)


def test_packet_spanning_pages_roundtrip():
    """Build a synthetic 2-page stream with a packet split across pages."""
    import struct

    from vorbispizza_tpu.ogg.crc import ogg_crc as crc

    def page(serial, seq, granule, flags, segs, payload):
        hdr = b"OggS" + bytes([0, flags]) + struct.pack("<qIII", granule, serial, seq, 0)
        hdr += bytes([len(segs)]) + bytes(segs)
        full = bytearray(hdr + payload)
        c = crc(bytes(full))
        full[22:26] = struct.pack("<I", c)
        return bytes(full)

    big = bytes(range(256)) * 2  # 512 bytes -> lacing [255, 255, 2]
    pg1 = page(7, 0, -1, 0x02, [255, 255], big[:510])  # granule -1: none completes
    pg2 = page(7, 1, 100, 0x05, [2, 3], big[510:] + b"abc")
    data = pg1 + pg2

    c = OggContainer(io.BytesIO(data))
    assert c.try_init()
    pr = c.providers[0]
    p1 = pr.get_next_packet()
    assert p1.data == big
    assert p1.granule == -1  # not last completed on its end page
    p2 = pr.get_next_packet()
    assert p2.data == b"abc"
    assert p2.granule == 100
    assert p2.is_end_of_stream
    assert pr.get_next_packet() is None


def test_forward_only_stream(testfile1):
    class ForwardOnly(io.RawIOBase):
        def __init__(self, data):
            self._b = io.BytesIO(data)

        def read(self, n=-1):
            return self._b.read(n)

        def seekable(self):
            return False

    data = testfile1.read_bytes()
    c = OggContainer(ForwardOnly(data))
    assert c.try_init()
    pr = c.providers[0]
    n = 0
    while pr.get_next_packet() is not None:
        n += 1
    assert n > 3


def test_scanner_random_access_helpers(testfile1):
    """read_header_at / read_page_at / find_page_after / stream_length
    (reference PageReader.ReadPageHeaderAt:159, ReadPageAt:104)."""
    import io

    from vorbispizza_tpu.ogg.page import PageScanner

    data = testfile1.read_bytes()
    sc = PageScanner(io.BytesIO(data))
    p0 = sc.next_page()
    p1 = sc.next_page()
    assert sc.stream_length() == len(data)
    info = sc.read_header_at(p1.offset)
    assert (info.serial, info.sequence, info.granule) == (
        p1.serial, p1.sequence, p1.granule,
    )
    again = sc.read_page_at(p1.offset)
    assert again.payload == p1.payload
    after = sc.find_page_after(p0.offset + 1)
    assert after.offset == p1.offset
    # scanner's sequential state is undisturbed by random access
    p2 = sc.next_page()
    assert p2.sequence == p1.sequence + 1


def test_peek_next_packet(testfile1):
    import io

    from vorbispizza_tpu.ogg.container import OggContainer

    c = OggContainer(io.BytesIO(testfile1.read_bytes()))
    c.try_init()
    pr = c.providers[0]
    peeked = pr.peek_next_packet()
    got = pr.get_next_packet()
    assert peeked.data == got.data and peeked.granule == got.granule


def test_invalidate_granule_table(testfile1):
    import io

    from vorbispizza_tpu.decoder import StreamDecoder
    from vorbispizza_tpu.ogg.container import OggContainer

    c = OggContainer(io.BytesIO(testfile1.read_bytes()))
    c.try_init()
    pr = c.providers[0]
    d = StreamDecoder(pr)
    d.initialize()
    t1 = pr.build_granule_table(d.get_packet_blocksize)
    pr.invalidate_granule_table()
    t2 = pr.build_granule_table(d.get_packet_blocksize)
    assert t1 is not t2 and t1.end == t2.end


def test_bisect_seek_cursor_matches_table_on_continued_packets():
    """The bisection seek must land the packet cursor on exactly the same
    (page, packet) as the exact-table seek — including when the target (or
    its preroll) is a packet continued from an earlier page, where a naive
    preroll walk skips all packets completing on the start page and decodes
    up to a full extra page (reference SeekTo preroll is minimal,
    PacketProvider.cs:56-88)."""
    import io

    from vorbispizza_tpu.decoder import StreamDecoder
    from vorbispizza_tpu.ogg.container import OggContainer
    from vorbispizza_tpu.testing.rawstream import make_extreme_blocksize_stream

    # pad packets past the libogg page capacity so packets span pages
    data = make_extreme_blocksize_stream(n_packets=12, pad_to=70000)

    def fresh():
        c = OggContainer(io.BytesIO(data))
        assert c.try_init()
        pr = c.providers[0]
        d = StreamDecoder(pr)
        d.initialize()
        return pr, d

    pr0, d0 = fresh()
    pr0._s.ensure_all_pages()
    assert any(p.continues_packet for p in pr0._s.pages), "fixture is paged"
    table = pr0.build_granule_table(d0.get_packet_blocksize)
    total = table.end[-1]

    bisected = 0
    for g in range(0, total, 997):
        pr_b, d_b = fresh()
        start_b = pr_b.seek_to_granule(g, 1, d_b.get_packet_blocksize)
        if pr_b._granule_table is None:
            bisected += 1  # fast path actually taken (no table fallback)
        pr_t, d_t = fresh()
        pr_t.build_granule_table(d_t.get_packet_blocksize)
        start_t = pr_t.seek_to_granule(g, 1, d_t.get_packet_blocksize)
        assert start_b == start_t, g
        assert (pr_b._page_cursor, pr_b._packet_cursor) == (
            pr_t._page_cursor,
            pr_t._packet_cursor,
        ), g
    assert bisected > 0
