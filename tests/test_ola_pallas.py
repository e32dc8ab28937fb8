"""Pallas hop-OLA kernel vs the gather path (interpret mode on CPU)."""

import numpy as np
import pytest

from vorbispizza_tpu.models.corpus import _front_end
from vorbispizza_tpu.models.pipeline import BatchSynthesizer
from vorbispizza_tpu.reader import VorbisReader


@pytest.fixture(scope="module")
def stream():
    from vorbispizza_tpu.testing.encode import encode_vorbis, make_signal

    return encode_vorbis(make_signal(2, 0.6, kind="music", seed=5), quality=0.4)


def test_hop_ola_matches_gather(stream):
    setup, ch, plan, buckets = _front_end(stream)
    ref_synth = BatchSynthesizer(setup, ch, use_pallas_ola=False)
    ref = np.asarray(ref_synth.assemble(plan, buckets))
    pal_synth = BatchSynthesizer(setup, ch, use_pallas_ola=True)
    got = np.asarray(pal_synth.assemble(plan, buckets))
    assert got.shape == ref.shape
    assert np.array_equal(got, ref)


def test_hop_ola_matches_scalar(stream):
    r = VorbisReader(stream)
    r.initialize()
    ref = r.read_all(planar=True)
    setup, ch, plan, buckets = _front_end(stream)
    synth = BatchSynthesizer(setup, ch, use_pallas_ola=True)
    got = np.clip(
        np.asarray(synth.assemble(plan, buckets)), -0.99999994, 0.99999994
    )
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() <= 2e-6
