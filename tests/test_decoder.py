"""Differential decode tests vs native libvorbisfile (the reference's own
test strategy: NVorbis.Tests/AssetTest.cmp_output), plus seek, tags, stats,
and malformed-input robustness."""

import io

import numpy as np
import pytest

from vorbispizza_tpu import InvalidDataError, SeekOutOfRangeError, VorbisReader
from vorbispizza_tpu.testing.oracle import OracleDecoder

CLIP = np.float32(0.99999994)


def s16(x):
    return np.clip(np.round(np.clip(x, -CLIP, CLIP).astype(np.float64) * 32767), -32768, 32767).astype(np.int16)


@pytest.mark.parametrize("name", ["1test", "2test", "3test", "issue6test"])
def test_decode_matches_oracle(name, testfiles):
    path = [p for p in testfiles if p.stem == name][0]
    with VorbisReader(str(path), clip_samples=False) as r:
        total = r.total_samples
        mine = r.read_all(planar=True)
    ref = OracleDecoder(str(path)).read_float()
    assert mine.shape == ref.shape
    assert total == ref.shape[1]
    # float parity: well under the 1e-6 target (oracle itself is f32)
    assert np.abs(mine - ref).max() <= 1e-6
    # s16 parity with the reference's +-2 LSB budget, zero bad packets
    assert np.abs(s16(mine).astype(int) - s16(ref).astype(int)).max() <= 2


@pytest.mark.parametrize("name", ["2test", "issue6test"])
def test_seek_exact(name, testfiles):
    path = [p for p in testfiles if p.stem == name][0]
    r = VorbisReader(str(path), clip_samples=False)
    r.initialize()
    full = r.read_all(planar=True)
    for pos in [0, 1, 255, 4097, 100000, r.total_samples - 100]:
        r.seek_to(pos)
        assert r.sample_position == pos
        got = r.read_samples(256, planar=True)
        want = full[:, pos : pos + 256]
        n = min(got.shape[1], want.shape[1])
        assert n > 0
        np.testing.assert_array_equal(got[:, :n], want[:, :n])
    with pytest.raises(SeekOutOfRangeError):
        r.seek_to(r.total_samples + 1)
    with pytest.raises(SeekOutOfRangeError):
        r.seek_to(-5)
    r.close()


def test_interleaved_matches_planar(testfile1):
    r1 = VorbisReader(str(testfile1))
    r1.initialize()
    inter = r1.read_all(planar=False)
    r2 = VorbisReader(str(testfile1))
    r2.initialize()
    planar = r2.read_all(planar=True)
    np.testing.assert_array_equal(inter.T, planar)


def test_forward_only_decode_matches_seekable(testfiles):
    path = [p for p in testfiles if p.stem == "3test"][0]

    class ForwardOnly(io.RawIOBase):
        def __init__(self, data):
            self._b = io.BytesIO(data)

        def read(self, n=-1):
            return self._b.read(n)

        def seekable(self):
            return False

    with VorbisReader(str(path)) as r:
        a = r.read_all(planar=True)
    fr = VorbisReader(ForwardOnly(path.read_bytes()))
    fr.initialize()
    b = fr.read_all(planar=True)
    # forward-only cannot see the granule table; end-trim still applies via
    # streaming anchors, so outputs must be identical
    np.testing.assert_array_equal(a, b)


def test_tags_and_stats(testfile1):
    with VorbisReader(str(testfile1)) as r:
        tags = r.tags
        assert isinstance(tags.encoder_vendor, str)
        r.read_samples(4096)
        st = r.stats
        assert st.packet_count > 0
        assert st.audio_bits > 0
        assert st.effective_bit_rate > 0


def test_clipping_flag(testfiles):
    path = [p for p in testfiles if p.stem == "3test"][0]  # has hot samples
    with VorbisReader(str(path), clip_samples=True) as r:
        pcm = r.read_all()
        assert r.has_clipped
        assert np.abs(pcm).max() <= CLIP
    with VorbisReader(str(path), clip_samples=False) as r:
        pcm = r.read_all()
        assert np.abs(pcm).max() > 1.0


def test_malformed_garbage_header():
    data = b"OggS" + bytes(100)
    with pytest.raises(InvalidDataError):
        with VorbisReader(io.BytesIO(data)) as r:
            pass


def test_malformed_corrupt_setup(testfile1):
    raw = bytearray(testfile1.read_bytes())
    # trash the middle of the setup page (page 1) - CRC will reject the page
    # entirely, so no usable stream appears
    raw[100:200] = bytes(100)
    with pytest.raises(InvalidDataError):
        with VorbisReader(bytes(raw)) as r:
            r.read_all()


def test_corrupt_audio_page_recovers(testfiles):
    """Mid-file corruption: decode must not crash and must keep s16 parity
    outside the damaged region."""
    path = [p for p in testfiles if p.stem == "3test"][0]
    raw = bytearray(path.read_bytes())
    raw[60000] ^= 0xFF
    with VorbisReader(bytes(raw)) as r:
        pcm = r.read_all(planar=True)
    assert pcm.shape[1] > 0


def test_time_seek_and_position(testfiles):
    path = [p for p in testfiles if p.stem == "2test"][0]
    with VorbisReader(str(path)) as r:
        r.seek_to(1.0, seconds=True)
        assert r.sample_position == r.sample_rate
        assert abs(r.time_position - 1.0) < 1e-9
        assert r.total_time == r.total_samples / r.sample_rate


def test_stats_container_waste_attribution(testfiles):
    """Per-stream container/waste bit accounting (reference
    StreamStats.AddPacket:94-122 fed by VorbisPacket.ContainerOverheadBits):
    after a full decode, every page's header bits are attributed to exactly
    one packet of the stream, so the per-stream total equals the
    container-wide count; waste = trailing bits never consumed."""
    for path in testfiles:
        with VorbisReader(str(path)) as r:
            r.read_all()
            st = r.stats
            assert st.container_bits > 0, path.name
            assert st.container_bits == r.container_overhead_bits, path.name
            assert st.waste_bits >= 0
            assert st.audio_bits > 0
            # effective bitrate now includes framing overhead: strictly
            # greater than the audio-bits-only rate (reference definition)
            audio_only = int(
                (st.audio_bits + st.header_bits)
                / st.total_samples
                * st.sample_rate
            )
            assert st.effective_bit_rate > audio_only
