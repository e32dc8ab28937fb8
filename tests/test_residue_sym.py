"""Symbol-level residue transport (native/symbols.py + ops/residue_sym.py).

The wire carries bit-packed codebook entry numbers + classifications; the
device reconstructs the residue vectors. Gate: reconstruction must be
BIT-IDENTICAL to value transport (both the numpy spec expansion vs the C++
value path, and the full device pipeline symbol-mode vs value-mode), across
encoder shapes, spec corners (residue types 0/1, multi-submap, floor0) and
truncated packets (end-of-packet partial-data semantics,
NVorbis/Residue0.cs:162-201)."""

import numpy as np
import pytest

from vorbispizza_tpu import native
from vorbispizza_tpu.config import VorbisConfig
from vorbispizza_tpu.frames import build_plan_from_scan
from vorbispizza_tpu.models.pipeline import decode_file_batch
from vorbispizza_tpu.native import symbols as S
from vorbispizza_tpu.native.serialize import serialize_setup
from vorbispizza_tpu.reader import VorbisReader
from vorbispizza_tpu.setup.header import parse_ident, parse_setup_cached
from vorbispizza_tpu.testing.encode import encode_vorbis, make_signal

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native front end unavailable"
)


def _front(data):
    blob, offs, granules, flags, _ = native.scan_ogg_arrays(data)
    ident = parse_ident(blob[offs[0] : offs[1]].tobytes())
    setup = parse_setup_cached(blob[offs[2] : offs[3]].tobytes(), ident)
    plan = build_plan_from_scan(blob, offs, granules, flags, setup)
    return ident, setup, plan


def _expand_all_and_compare(data, require_eligible=True):
    """Decode both C++ modes; numpy-expand every packet's symbols and
    assert equality with the value-mode residues."""
    ident, setup, plan = _front(data)
    sblob, sstarts, sends = plan.scan
    C = ident.channels
    max_half = ident.blocksizes[1] // 2
    max_order = max(
        (f.order for f in setup.floors if f.floor_type == 0), default=0
    )
    sb = serialize_setup(setup, ident)
    lay = S.symbol_layout(setup, ident)
    if lay is None:
        assert not require_eligible, "setup unexpectedly ineligible"
        return None
    val = native.decode_packet_spans(
        sb, sblob, sstarts, sends, C, max_half, max_order
    )
    sym = native.decode_packet_spans_sym(
        sb, sblob, sstarts, sends, C, max_order, lay
    )
    assert np.array_equal(val["meta"], sym["meta"])
    for k in ("posts", "step2", "used", "f0_amp", "f0_coeffs"):
        assert np.array_equal(val[k], sym[k]), k
    for i in range(len(plan.frames)):
        mode_idx = int(sym["meta"][i, 1])
        half = setup.modes[mode_idx].n // 2
        got = S.expand_symbols(
            setup, mode_idx, C,
            sym["cls"][i], sym["syms"][i], sym["sym_counts"][i],
            sym["pair_counts"][i],
            groups=lay.groups_per_mapping[setup.modes[mode_idx].mapping_idx],
        )
        assert np.array_equal(got, val["residues"][i][:, :half]), f"frame {i}"
    return lay


@pytest.mark.parametrize(
    "channels,quality",
    [(2, 0.5), (2, 0.1), (2, 0.9), (6, 0.4), (1, 0.3)],
)
def test_symbol_expansion_matches_values(channels, quality):
    data = encode_vorbis(
        make_signal(channels, 1.2, kind="music", seed=channels),
        quality=quality,
    )
    _expand_all_and_compare(data)


def test_symbol_expansion_spec_corners():
    """Residue types 0/1, multi-submap, odd books (rawstream vectors)."""
    from vorbispizza_tpu.testing.rawstream import (
        make_extreme_blocksize_stream,
        make_multisubmap_stream,
        make_oddbooks_stream,
    )

    for data in (
        make_multisubmap_stream(),
        make_oddbooks_stream(),
        make_extreme_blocksize_stream(n_packets=12),
    ):
        _expand_all_and_compare(data, require_eligible=False)


def test_symbol_expansion_truncated_packets():
    """End-of-packet mid-residue keeps partial data; symbol transport must
    reproduce the truncation exactly (applied-pair prefix + sentinel pad)."""
    data = encode_vorbis(make_signal(2, 1.0, kind="music", seed=9), quality=0.5)
    ident, setup, plan = _front(data)
    sblob, sstarts, sends = plan.scan
    # truncate every audio packet to a range of lengths (cut mid-residue)
    rng = np.random.default_rng(0)
    ends2 = sends.copy()
    for i in range(len(ends2)):
        ln = ends2[i] - sstarts[i]
        if ln > 8:
            ends2[i] = sstarts[i] + int(rng.integers(4, ln))
    C = ident.channels
    max_half = ident.blocksizes[1] // 2
    max_order = 0
    sb = serialize_setup(setup, ident)
    lay = S.symbol_layout(setup, ident)
    assert lay is not None
    val = native.decode_packet_spans(
        sb, sblob, sstarts, ends2, C, max_half, max_order
    )
    sym = native.decode_packet_spans_sym(
        sb, sblob, sstarts, ends2, C, max_order, lay
    )
    assert np.array_equal(val["meta"], sym["meta"])
    for i in range(len(sstarts)):
        if val["meta"][i, 0] != 1:
            continue
        mode_idx = int(val["meta"][i, 1])
        half = setup.modes[mode_idx].n // 2
        got = S.expand_symbols(
            setup, mode_idx, C,
            sym["cls"][i], sym["syms"][i], sym["sym_counts"][i],
            sym["pair_counts"][i],
        )
        assert np.array_equal(got, val["residues"][i][:, :half]), f"pkt {i}"


def _pipeline_both(data):
    saved = VorbisConfig.default.residue_transport
    try:
        VorbisConfig.default.residue_transport = "symbols"
        got_sym = decode_file_batch(data)
        VorbisConfig.default.residue_transport = "values"
        got_val = decode_file_batch(data)
    finally:
        VorbisConfig.default.residue_transport = saved
    return got_sym, got_val


@pytest.mark.parametrize("channels,quality", [(2, 0.5), (6, 0.4)])
def test_device_pipeline_symbols_vs_values(channels, quality):
    data = encode_vorbis(
        make_signal(channels, 1.0, kind="music", seed=20 + channels),
        quality=quality,
    )
    r = VorbisReader(data)
    r.initialize()
    ref = r.read_all(planar=True)
    got_sym, got_val = _pipeline_both(data)
    assert np.array_equal(got_sym, got_val)
    assert np.abs(got_sym - ref).max() <= 2e-6


def test_device_pipeline_symbols_rawstream_corners():
    from vorbispizza_tpu.testing.rawstream import (
        make_extreme_blocksize_stream,
        make_floor0_stream,
        make_multisubmap_stream,
    )

    for data in (
        make_multisubmap_stream(),
        make_extreme_blocksize_stream(n_packets=10),
        make_floor0_stream(n_packets=8),
    ):
        got_sym, got_val = _pipeline_both(data)
        assert np.array_equal(got_sym, got_val)


def test_corpus_merged_symbols_vs_values():
    """Merged multi-stream chunks keep per-group stream ranks aligned."""
    from vorbispizza_tpu.models.corpus import decode_corpus

    corpus = [
        encode_vorbis(
            make_signal(2, 0.8, kind="music", seed=40 + s), quality=0.5
        )
        for s in range(4)
    ]
    saved = VorbisConfig.default.residue_transport
    try:
        VorbisConfig.default.residue_transport = "symbols"
        outs_sym = decode_corpus(corpus)
        VorbisConfig.default.residue_transport = "values"
        outs_val = decode_corpus(corpus)
    finally:
        VorbisConfig.default.residue_transport = saved
    for a, b in zip(outs_sym, outs_val):
        assert np.array_equal(a, b)


@pytest.mark.parametrize("channels,quality", [(2, 0.5), (6, 0.4)])
def test_cpp_slot_stream_matches_spec(channels, quality):
    """The C++-recorded scatter slot ids (SymOut.slots) equal the spec
    derivation from classifications + pair counts (applied_slots) for
    every packet and group — including truncated packets."""
    data = encode_vorbis(
        make_signal(channels, 1.0, kind="music", seed=channels), quality=quality
    )
    ident, setup, plan = _front(data)
    sblob, sstarts, sends = plan.scan
    # truncate some packets to exercise the EOP prefix path too
    rng = np.random.default_rng(1)
    ends2 = sends.copy()
    for i in range(2, len(ends2), 5):
        ln = ends2[i] - sstarts[i]
        if ln > 16:
            ends2[i] = sstarts[i] + int(rng.integers(8, ln))
    C = ident.channels
    sb = serialize_setup(setup, ident)
    lay = S.symbol_layout(setup, ident)
    assert lay is not None
    sym = native.decode_packet_spans_sym(sb, sblob, sstarts, ends2, C, 0, lay)
    for i in range(len(sstarts)):
        if sym["meta"][i, 0] != 1:
            continue
        mode_idx = int(sym["meta"][i, 1])
        groups = lay.groups_per_mapping[setup.modes[mode_idx].mapping_idx]
        want = S.applied_slots(
            setup, mode_idx, C, sym["cls"][i], sym["pair_counts"][i],
            groups=groups,
        )
        cnt = sym["sym_counts"][i]
        pos = 0
        for gi, g in enumerate(groups):
            n_parts = int(cnt[gi]) // g.nsym
            got = sym["slots"][i][pos : pos + n_parts]
            pos += n_parts
            assert np.array_equal(got, want[gi]), (i, gi)


def test_wire_size_shrinks():
    """The point of the feature: symbol wire < value wire on typical audio."""
    from vorbispizza_tpu.frames import extract_batch

    data = encode_vorbis(make_signal(2, 2.0, kind="music", seed=3), quality=0.5)
    ident, setup, plan = _front(data)
    saved = VorbisConfig.default.residue_transport
    try:
        VorbisConfig.default.residue_transport = "symbols"
        sym_buckets = extract_batch(plan, setup, ident.channels, ident=ident)
        VorbisConfig.default.residue_transport = "values"
        val_buckets = extract_batch(plan, setup, ident.channels, ident=ident)
    finally:
        VorbisConfig.default.residue_transport = saved
    sym_bytes = sum(b.transport_nbytes for b in sym_buckets)
    # value transport wire: int8 values of nonzero 32-blocks + u16 gather map
    val_bytes = 0
    for b in val_buckets:
        F, C, half = b.residues.shape
        blk = b.residues.reshape(-1, 32)
        nz = int(np.any(blk != 0, axis=1).sum())
        val_bytes += nz * 32 + blk.shape[0] * 2
    assert sym_bytes < 0.75 * val_bytes, (sym_bytes, val_bytes)
