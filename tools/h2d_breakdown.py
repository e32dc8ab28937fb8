"""Per-component h2d byte breakdown of the bench corpus wire.

Replicates bench.py's headline corpus (32x15 s stereo music q0.5) and
decode_corpus's chunk composition, then runs the host half of prepare
(prepare_host) with the accounting hook and prints what the 7.7 MB of
host->device transfer actually consists of — the sizing step before any
further h2d wire work (the symbol wire, scatter indices, floor posts
and OLA event tables are independent levers with very different costs).

Pure host work: runs on the CPU backend, never touches the chip.
"""

from __future__ import annotations

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from vorbispizza_tpu.config import VorbisConfig  # noqa: E402
from vorbispizza_tpu.models.corpus import (  # noqa: E402
    _front_end,
    _synthesizer_for,
    merge_streams,
)
from vorbispizza_tpu.testing.encode import (  # noqa: E402
    encode_vorbis,
    make_signal,
)


def main() -> None:
    rate = 44100
    corpus = [
        encode_vorbis(
            make_signal(2, 15.0, rate=rate, kind="music", seed=seed),
            rate=rate,
            quality=0.5,
        )
        for seed in range(32)
    ]
    cfg = VorbisConfig()
    fronts = [_front_end(c) for c in corpus]
    acc: dict = {}
    chunks: list[list[int]] = []
    cur: list[int] = []
    cost = 0
    for i, front in enumerate(fronts):
        cur.append(i)
        cost += sum(b.batch_cost for b in front[3])
        if cost >= cfg.corpus_batch_bytes:
            chunks.append(cur)
            cur, cost = [], 0
    if cur:
        chunks.append(cur)
    print(f"chunks: {[len(c) for c in chunks]}")
    for chunk in chunks:
        setup, channels = fronts[chunk[0]][:2]
        synth = _synthesizer_for(setup, channels)
        for i in chunk[1:]:
            synth.add_setup(fronts[i][0])
        plan_m, buckets_m, _ = merge_streams(
            [fronts[i][2:4] for i in chunk]
        )
        synth.prepare_host(plan_m, buckets_m, "s16d", accounting=acc)
    total = acc.pop("total_shipped", 0)
    named = sum(acc.values())
    acc["layout_padding_other"] = total - named
    width = max(len(k) for k in acc)
    audio_s = 32 * 15.0
    print(f"{'component':<{width}}  {'bytes':>12}  {'MB':>7}  {'%':>6}")
    for k, v in sorted(acc.items(), key=lambda kv: -kv[1]):
        print(
            f"{k:<{width}}  {v:>12,}  {v / 1e6:>7.2f}  "
            f"{100.0 * v / total:>5.1f}%"
        )
    print(
        f"{'TOTAL':<{width}}  {total:>12,}  {total / 1e6:>7.2f}  "
        f"= {total / audio_s / 1e3:.1f} KB/s of audio"
    )


if __name__ == "__main__":
    main()
