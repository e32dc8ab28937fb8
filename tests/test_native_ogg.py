"""Native (C++) Ogg scanner vs the Python page/packet layer: identical
packet streams on clean, corrupted, truncated, and synthesized inputs."""

import io

import numpy as np
import pytest

from vorbispizza_tpu import native
from vorbispizza_tpu.ogg.container import OggContainer

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native front end unavailable"
)


def python_packets(data: bytes):
    c = OggContainer(io.BytesIO(data))
    if not c.try_init():
        return []
    pr = c.providers[0]
    out = []
    while True:
        p = pr.get_next_packet()
        if p is None:
            break
        out.append(p)
        if p.is_end_of_stream:
            break
    return out


def assert_same_packets(data: bytes):
    res = native.scan_ogg(data)
    py = python_packets(data)
    if res is None:
        pytest.skip("native scanner declined this stream")
    nat, _serial = res
    assert len(nat) == len(py), (len(nat), len(py))
    for a, b in zip(nat, py):
        assert a.data == b.data
        assert a.granule == b.granule
        assert a.is_resync == b.is_resync
        assert a.is_end_of_stream == b.is_end_of_stream


@pytest.mark.parametrize(
    "name", ["1test.ogg", "2test.ogg", "3test.ogg", "issue6test.ogg"]
)
def test_scan_matches_python_reference_files(name, testfiles):
    data = (testfiles[0].parent / name).read_bytes()
    assert_same_packets(data)


def test_scan_matches_python_corrupted(testfiles):
    raw = bytearray((testfiles[0].parent / "3test.ogg").read_bytes())
    rng = np.random.default_rng(3)
    for _ in range(6):
        bad = bytearray(raw)
        for pos in rng.integers(200, len(bad), size=3):
            bad[int(pos)] ^= 0xFF
        assert_same_packets(bytes(bad))


def test_scan_matches_python_truncated(testfiles):
    raw = (testfiles[0].parent / "3test.ogg").read_bytes()
    for frac in (0.9, 0.5, 0.21):
        assert_same_packets(raw[: int(len(raw) * frac)])


def test_scan_matches_python_junk_prefix(testfiles):
    raw = (testfiles[0].parent / "1test.ogg").read_bytes()
    assert_same_packets(b"garbage" * 33 + raw)


def test_scan_matches_python_synthesized():
    from vorbispizza_tpu.testing.encode import encode_vorbis, make_signal
    from vorbispizza_tpu.testing.rawstream import (
        make_extreme_blocksize_stream,
        make_floor0_stream,
    )

    assert_same_packets(encode_vorbis(make_signal(2, 0.7, kind="music"), quality=0.4))
    assert_same_packets(make_floor0_stream())
    assert_same_packets(make_extreme_blocksize_stream())


def test_build_plan_from_scan_matches_provider():
    """The vectorized array plan (build_plan_from_scan over the native
    scan's raw arrays) must equal the provider-walk plan field for field:
    frames (mode/window/offset/prime/final/granule), chains, segments,
    buckets."""
    import numpy as np

    from vorbispizza_tpu import native
    from vorbispizza_tpu.decoder import StreamDecoder
    from vorbispizza_tpu.frames import build_plan, build_plan_from_scan
    from vorbispizza_tpu.ogg.container import OggContainer
    from vorbispizza_tpu.testing.encode import encode_vorbis, make_signal
    from vorbispizza_tpu.testing.rawstream import (
        make_extreme_blocksize_stream,
        make_floor0_stream,
        make_multisubmap_stream,
    )

    if not native.available():
        import pytest

        pytest.skip("native front end unavailable")

    streams = [
        encode_vorbis(make_signal(2, 1.0, kind="music", seed=1), quality=0.4),
        encode_vorbis(make_signal(6, 0.5, kind="music", seed=2), quality=0.3),
        make_extreme_blocksize_stream(n_packets=20),
        make_floor0_stream(n_packets=12),
        make_multisubmap_stream(n_packets=10),
    ]
    # start-offset (issue6test) + CRC-gap shapes exercise the exact-layout
    # fallback inside build_plan_from_scan
    import pathlib

    tf = pathlib.Path("/root/reference/TestFiles")
    if tf.exists():
        streams.append((tf / "issue6test.ogg").read_bytes())
        raw = bytearray((tf / "3test.ogg").read_bytes())
        raw[60000] ^= 0xFF
        streams.append(bytes(raw))
    for si, data in enumerate(streams):
        c = OggContainer(io.BytesIO(data))
        assert c.try_init()
        pr = c.providers[0]
        dec = StreamDecoder(pr)
        dec.initialize()
        ref = build_plan(pr, dec._setup)

        blob, offs, granules, flags, _ = native.scan_ogg_arrays(data)
        got = build_plan_from_scan(blob, offs, granules, flags, dec._setup)

        assert len(got.frames) == len(ref.frames), si
        for a, b in zip(got.frames, ref.frames):
            assert (a.mode_idx, a.info, a.offset, a.prime, a.final,
                    a.granule) == (
                b.mode_idx, b.info, b.offset, b.prime, b.final, b.granule
            ), si
        assert got.chains == ref.chains, si
        assert got.chain_segments == ref.chain_segments, si
        assert got.total_len == ref.total_len, si
        assert {k: list(v) for k, v in got.buckets.items()} == {
            k: list(v) for k, v in ref.buckets.items()
        }, si
        # scan spans address the right bytes
        sblob, sstarts, sends = got.scan
        for a, b in zip(ref.frames, range(len(sstarts))):
            assert sblob[sstarts[b] : sends[b]].tobytes() == a.packet.data, si
