"""Seek conformance vs native libvorbisfile: after seeking both decoders to
the same sample position, the next samples must agree within the s16 band.
Covers the preroll/roll-forward logic (reference StreamDecoder.SeekTo:817)
against the authoritative implementation, and the accelerated reader."""

import numpy as np
import pytest

from vorbispizza_tpu import VorbisReader
from vorbispizza_tpu.testing.oracle import OracleDecoder


def s16(x):
    return np.clip(np.rint(np.asarray(x, np.float64) * 32768.0), -32768, 32767)


@pytest.mark.parametrize("name", ["3test.ogg", "issue6test.ogg"])
def test_seek_matches_oracle(name, testfiles):
    path = str(testfiles[0].parent / name)
    nat = OracleDecoder(path)
    r = VorbisReader(path)
    r.initialize()
    total = min(r.total_samples, nat.total)
    rng = np.random.default_rng(13)
    positions = sorted(int(p) for p in rng.integers(0, total - 2048, size=6))
    for pos in positions:
        nat.seek(pos)
        want = nat.read_float_n(1024)
        r.seek_to(pos)
        got = r.read_samples(1024).T  # planar
        m = min(want.shape[1], got.shape[1])
        assert m >= 512
        assert np.abs(s16(got[:, :m]) - s16(want[:, :m])).max() <= 2, pos


def test_accelerated_seek_matches_oracle(testfiles):
    path = str(testfiles[0].parent / "3test.ogg")
    nat = OracleDecoder(path)
    a = VorbisReader(path, accelerated=True)
    a.initialize()
    for pos in (1000, 77777, 200000):
        nat.seek(pos)
        want = nat.read_float_n(512)
        a.seek_to(pos)
        got = a.read_samples(512).T
        m = min(want.shape[1], got.shape[1])
        assert np.abs(s16(got[:, :m]) - s16(want[:, :m])).max() <= 2, pos


def test_device_trace_smoke(tmp_path, testfile1):
    """Profiling hooks produce a trace directory (new capability over the
    reference's bit-accounting-only observability)."""
    from vorbispizza_tpu.models.pipeline import decode_file_batch
    from vorbispizza_tpu.utils.profiling import DecodeTimer, device_trace

    timer = DecodeTimer()
    with device_trace(str(tmp_path)):
        with timer.stage("decode"):
            decode_file_batch(str(testfile1))
    assert timer.report()["decode"] > 0
    assert any(tmp_path.rglob("*")), "no trace output written"
