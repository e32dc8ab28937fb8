"""Floor0 (LSP) device synthesis vs the scalar anchor.

The synthesized test corpus never exercises floor0 (libvorbisenc only emits
floor1), so the device kernel is validated against Floor0.synthesize on
directly-constructed configs and random LSP coefficients. Real floor0
streams (Xiph lsp-test*, libnogg moving-sine) exist only in the online
conformance corpora (SURVEY.md §4)."""

import numpy as np
import pytest

from vorbispizza_tpu.ops.floor import floor0_curves
from vorbispizza_tpu.setup.floor import Floor0, FloorData


def make_floor0(order=8, rate=8000, bark_map_size=128, amplitude_bits=6,
                amplitude_offset=160, blocksizes=(256, 2048)):
    f = object.__new__(Floor0)
    f.order = order
    f.rate = rate
    f.bark_map_size = bark_map_size
    f.amplitude_bits = amplitude_bits
    f.amplitude_offset = amplitude_offset
    f.books = []
    f._book_bits = 1
    f._maps = {n: f._bark_map(n) for n in blocksizes}
    return f


@pytest.mark.parametrize("order", [4, 9, 24])
@pytest.mark.parametrize("n", [256, 2048])
def test_floor0_device_matches_scalar(order, n):
    fl = make_floor0(order=order)
    rng = np.random.default_rng(order * 1000 + n)
    G = 7
    # realistic LSP coefficients: monotonic in (0, pi) with clear separation
    # (degenerate clusters underflow the product in any precision)
    gaps = rng.uniform(0.3, 1.0, size=(G, order + 1))
    coeffs = (
        np.cumsum(gaps, axis=1)[:, :-1]
        / np.sum(gaps, axis=1, keepdims=True)
        * (np.pi - 0.2)
        + 0.1
    ).astype(np.float32)
    amp = rng.integers(1, 64, size=G).astype(np.int32)
    used = np.ones(G, dtype=bool)
    used[3] = False

    got = np.asarray(
        floor0_curves(
            coeffs, amp, used,
            order=order,
            bark_map=tuple(int(v) for v in fl._maps[n]),
            bark_map_size=fl.bark_map_size,
            amplitude_bits=fl.amplitude_bits,
            amplitude_offset=fl.amplitude_offset,
        )
    )
    for g in range(G):
        data = FloorData(
            unused=not used[g], amplitude=int(amp[g]), coefficients=coeffs[g]
        )
        ref = fl.synthesize(data, n)
        # device computes the LSP product in float32 (like libvorbis);
        # the scalar anchor uses float64 — allow small relative error.
        # Compare where the curve is in the audio-meaningful range; the f32
        # exp() amplifies product rounding at astronomically large values
        # that well-formed streams never produce (their curves are O(1)).
        ok = np.abs(ref) < 1e4
        denom = np.maximum(np.abs(ref[ok]), 1e-6)
        assert np.max(np.abs(got[g][ok] - ref[ok]) / denom) < 2e-4
        assert np.all(np.isfinite(got[g]))
        if not used[g]:
            assert np.all(got[g] == 0.0)
