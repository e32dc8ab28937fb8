"""Decoder configuration (reference NVorbis/VorbisConfig.cs:6 analog).

The reference's config carries a shared page-buffer pool; pooling is a
garbage-collector concern that does not exist in this design (pages are
numpy views), so the TPU-native config instead carries the knobs of the
batch pipeline and decode defaults. ``VorbisConfig.default`` mirrors the
reference's ``VorbisConfig.Default`` singleton.
"""

from __future__ import annotations

from dataclasses import dataclass, replace


@dataclass
class VorbisConfig:
    clip_samples: bool = True  # reference StreamDecoder.ClipSamples
    skip_tags: bool = False  # reference StreamDecoder.SkipTags
    # batch pipeline knobs
    use_native_frontend: bool = True  # C++ entropy decode when available
    corpus_workers: int = 8  # front-end thread pool size
    # merged-chunk cap per execution (dense spectrum bytes). Swept on the
    # attached v5e (32x15s corpus): 6MB=123x, 12MB=165x, 24MB=183x,
    # 48MB=53x (too few chunks to pipeline). Re-swept 2026-08-18 after
    # exec got 4x faster (median rtf of 3): 24MB=345, 16MB=345, 12MB=240,
    # 8MB=240 — the optimum did NOT shift down; per-call latency on the
    # high-latency link punishes extra chunks more than overlap gains.
    # 24MB balances per-chunk
    # dispatch overhead against transfer/exec overlap granularity.
    corpus_batch_bytes: int = 24 << 20
    # s16 PCM wire format for host delivery (all lossless):
    #   "dpack"  — delta block-pack (ops/pcm_pack.py): second difference +
    #              per-128-sample-block bit width, ~3x fewer bytes than raw
    #              on typical audio, deterministic (no reliance on in-flight
    #              link compression)
    #   "planes" — biased byte planes (lo, hi): the hi plane compresses in
    #              flight on links that compress (~1.4x when the tunnel's
    #              compressor is active)
    #   "raw"    — int16 as-is
    s16_wire: str = "dpack"
    # rice mode inside the dpack wire: per-block k-bit plane + unary high
    # parts, ~13% fewer d2h bytes on music but slower to pack (exec-only
    # 1517x -> 1056x measured). "auto" enables it only when the measured
    # d2h rate (utils/link.py) is below s16_rice_threshold_mbps — below
    # that the byte saving outruns the exec cost, above it (PCIe/ICI)
    # rice is a pure loss. "on"/"off" force it.
    s16_rice: str = "auto"
    s16_rice_threshold_mbps: float = 90.0
    # floor1 wire format for the batch pipeline:
    #   "ys"    — ship the CODED values (the bitstream's own prediction
    #             residuals: u8 for posts 0/1, a zero bitmask + compacted
    #             u8 nonzeros for the rest — ~59% of coded values are 0)
    #             and run the spec 7.2.2 unwrap cascade on device
    #             (ops/floor.floor1_unwrap). ~4.3 bits/value vs 9.125 for
    #             "posts" on the bench corpus family. Falls back to
    #             "posts" per floor config when a subclass book could
    #             produce values > 255 (static gate) or ys was not
    #             captured by the front end.
    #   "posts" — ship unwrapped posts u8 + step2 bit planes.
    floor1_wire: str = "ys"
    # residue wire format: "symbols" ships bit-packed codebook entry
    # numbers + classifications and expands on device (2-3x smaller than
    # packed values; bit-exact when every residue book is integer-valued);
    # "values" ships packed residue values; "auto" = symbols when the
    # setup is eligible (native/symbols.py symbol_layout)
    residue_transport: str = "auto"

    def clone(self) -> "VorbisConfig":
        """Reference VorbisConfig.Clone():26."""
        return replace(self)


VorbisConfig.default = VorbisConfig()
