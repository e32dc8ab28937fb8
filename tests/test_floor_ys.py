"""Device floor1 unwrap cascade (ops/floor.floor1_unwrap) vs the scalar
anchor (setup/floor.py Floor1._unwrap): bit-exact over random configs and
coded values, including the adversarial corners (val >= room folds, odd/
even parity, zero vals, range clamp).

Reference contract: spec 7.2.2 step 2 (NVorbis/Floor1.cs:270 UnwrapPosts).
"""

import numpy as np
import pytest

from vorbispizza_tpu.ops.floor import floor1_unwrap
from vorbispizza_tpu.setup.floor import Floor1


def _make_floor(rng, rangebits, n_extra, multiplier):
    """A Floor1 with the attributes _unwrap needs, bypassing the bitstream
    constructor: unique xs (xs[0]=0, xs[1]=2^rangebits), neighbor tables
    derived exactly as Floor1.__init__ does."""
    hi = 1 << rangebits
    pool = rng.permutation(np.arange(1, hi))[:n_extra]
    xs = np.concatenate([[0, hi], pool]).astype(np.int64)
    f = Floor1.__new__(Floor1)
    f.xs = xs
    f.n_posts = len(xs)
    f.multiplier = multiplier
    f.range = Floor1.RANGES[multiplier - 1]
    f.low_neighbor = np.zeros(f.n_posts, dtype=np.int64)
    f.high_neighbor = np.zeros(f.n_posts, dtype=np.int64)
    for i in range(2, f.n_posts):
        below = [j for j in range(i) if xs[j] < xs[i]]
        above = [j for j in range(i) if xs[j] > xs[i]]
        f.low_neighbor[i] = max(below, key=lambda j: xs[j])
        f.high_neighbor[i] = min(above, key=lambda j: xs[j])
    return f


@pytest.mark.parametrize("multiplier", [1, 2, 3, 4])
def test_unwrap_matches_scalar_anchor(multiplier):
    rng = np.random.default_rng(41 + multiplier)
    fl = _make_floor(rng, rangebits=8, n_extra=26, multiplier=multiplier)
    P = fl.n_posts
    G = 96
    # mixture: mostly tiny values (the real distribution), some rows with
    # large values to force the >= room folds, some all-zero rows
    ys = rng.integers(0, 8, size=(G, P)).astype(np.int64)
    big_rows = rng.random((G, 1)) < 0.3
    ys = np.where(
        big_rows & (rng.random((G, P)) < 0.4),
        rng.integers(0, 256, size=(G, P)),
        ys,
    )
    ys[:4] = 0
    ys[:, 0] = rng.integers(0, fl.range, size=G)
    ys[:, 1] = rng.integers(0, fl.range, size=G)

    want_posts = np.zeros((G, P), dtype=np.int64)
    want_step2 = np.zeros((G, P), dtype=bool)
    for g in range(G):
        want_posts[g], want_step2[g] = fl._unwrap(ys[g])

    posts, step2 = floor1_unwrap(
        ys.astype(np.int32),
        xs=tuple(int(x) for x in fl.xs),
        multiplier=multiplier,
    )
    np.testing.assert_array_equal(np.asarray(posts), want_posts)
    np.testing.assert_array_equal(np.asarray(step2), want_step2)


def test_ys_wire_static_gate():
    """The coded-ys wire is only taken when every subclass book's entry
    numbers fit u8 (values are book ENTRY numbers, bounded statically);
    otherwise the posts+step2 wire must be chosen — and a missing ys
    capture must also fall back."""
    from types import SimpleNamespace

    from vorbispizza_tpu.frames import BucketBatch, FloorGroup
    from vorbispizza_tpu.models.pipeline import BatchSynthesizer

    small = SimpleNamespace(entries=256)
    big = SimpleNamespace(entries=257)
    fl_ok = SimpleNamespace(subclass_books=[[small, None], [small]])
    fl_big = SimpleNamespace(subclass_books=[[small], [big, None]])
    assert BatchSynthesizer._floor1_ys_ok(fl_ok) is True
    assert BatchSynthesizer._floor1_ys_ok(fl_big) is False

    def bucket_with(floor, ys):
        g = FloorGroup(floor=floor, channels=[0, 1])
        g.ys = ys
        g.posts = np.zeros((1, 2, 4), dtype=np.int32)
        g.step2 = np.zeros((1, 2, 4), dtype=bool)
        g.used = np.ones((1, 2), dtype=bool)
        return BucketBatch(
            key=("k",),
            n=256,
            frame_indices=np.zeros(1, dtype=np.int64),
            offsets=np.zeros(1, dtype=np.int32),
            prime=np.zeros(1, dtype=bool),
            final=np.zeros(1, dtype=bool),
            residues=None,
            floor_groups=[g],
        )

    fl1 = SimpleNamespace(
        floor_type=1,
        subclass_books=[[small]],
        xs=np.array([0, 64, 16, 48]),
        multiplier=2,
    )
    ys = np.zeros((1, 2, 4), dtype=np.int16)
    metas, _ = BatchSynthesizer._group_meta(bucket_with(fl1, ys))
    assert dict(metas[0]).get("wire") == "ys"
    metas, _ = BatchSynthesizer._group_meta(bucket_with(fl1, None))
    assert dict(metas[0]).get("wire") is None
    fl_bad = SimpleNamespace(
        floor_type=1,
        subclass_books=[[big]],
        xs=np.array([0, 64, 16, 48]),
        multiplier=2,
    )
    metas, _ = BatchSynthesizer._group_meta(bucket_with(fl_bad, ys))
    assert dict(metas[0]).get("wire") is None


def test_unwrap_small_config():
    """Minimal 2-post floor (no cascade steps at all)."""
    fl = _make_floor(np.random.default_rng(7), 6, 0, 2)
    ys = np.array([[5, 63], [0, 0]], dtype=np.int64)
    for g in range(2):
        wp, ws = fl._unwrap(ys[g])
        posts, step2 = floor1_unwrap(
            ys[g : g + 1].astype(np.int32),
            xs=tuple(int(x) for x in fl.xs),
            multiplier=2,
        )
        np.testing.assert_array_equal(np.asarray(posts)[0], wp)
        np.testing.assert_array_equal(np.asarray(step2)[0], ws)
