"""Property tests: batch pipeline == scalar decoder across randomized
encoder configs and randomized corruption (compact versions of the larger
sweeps run during development — 24 config / 30 corruption trials, all
passing)."""

import numpy as np
import pytest

from vorbispizza_tpu.errors import VorbisError
from vorbispizza_tpu.models.pipeline import decode_file_batch
from vorbispizza_tpu.reader import VorbisReader
from vorbispizza_tpu.testing.encode import encode_vorbis, make_signal


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_encoder_configs(trial):
    rng = np.random.default_rng(trial)
    ch = int(rng.choice([1, 2, 3, 4, 6]))
    rate = int(rng.choice([8000, 22050, 44100, 48000]))
    q = float(rng.uniform(-0.1, 1.0))
    data = encode_vorbis(
        make_signal(ch, 0.35, rate=rate, kind="music", seed=trial),
        rate=rate, quality=q,
    )
    r = VorbisReader(data)
    r.initialize()
    ref = r.read_all(planar=True)
    got = decode_file_batch(data)
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() <= 2e-6


def test_fuzz_regression_shard_ys_clone():
    """Offline-fuzzer regression (seed 9003): a sharded corpus where one
    shard is missing a bucket key gets a zero-frame clone — the clone
    must preserve coded-ys availability or that shard falls back to the
    posts wire while the others pick ys, and the shard sigs refuse to
    unify (ShardMismatch)."""
    from vorbispizza_tpu.tools.fuzz import _one_trial

    rng = np.random.default_rng(9003)
    status = _one_trial(rng)
    assert status in ("ok", "skip", "reject"), status


@pytest.mark.parametrize("mode", ["bitflip", "truncate", "shear"])
def test_fuzz_corruption(mode):
    base = encode_vorbis(make_signal(2, 0.8, kind="music", seed=5), quality=0.4)
    rng = np.random.default_rng(hash(mode) % 2**32)
    for _ in range(4):
        bad = bytearray(base)
        if mode == "bitflip":
            for pos in rng.integers(1500, len(bad), size=3):
                bad[int(pos)] ^= int(rng.integers(1, 256))
        elif mode == "truncate":
            bad = bad[: int(rng.integers(len(bad) // 10, len(bad)))]
        else:
            cut = int(rng.integers(1500, len(bad) - 500))
            del bad[cut : cut + int(rng.integers(37, 3000))]
        data = bytes(bad)
        try:
            r = VorbisReader(data)
            r.initialize()
            ref = r.read_all(planar=True)
        except VorbisError:
            continue  # loud rejection is acceptable
        try:
            got = decode_file_batch(data)
        except VorbisError:
            continue
        assert got.shape == ref.shape
        if got.size:
            assert np.abs(got - ref).max() <= 2e-6
