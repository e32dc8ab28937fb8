"""Anatomy of one corpus-chunk wire pull.

The overlap probe (tools/overlap_probe.py) proved axon overlaps d2h
with exec and that an 8 MB raw-buffer pull runs at probe rate
(~57 MB/s). Yet the bench timeline shows per-chunk wire pulls of
~2.3 MB costing ~200 ms (~11 MB/s) back-to-back. This script builds ONE
bench-shaped chunk (5x15 s stereo q0.5), decodes it on the chip, and
times each piece in isolation:

  prepare   device_put of the h2d arrays (~1.1 MB)
  run       fused program dispatch (async)
  exec      wall until the wire's first byte is provably computed
  pull now  pull_wire right after dispatch (corpus-shaped: includes
            exec wait + page0 + remainder)
  pull idle re-run, sleep until exec + async page0 surely done, then
            pull_wire (isolates the pure d2h cost of the same pages)
  per page  each np.asarray(page) timed inside a re-implementation of
            the pull loop

Requires the chip; run when the link is otherwise idle.
"""

from __future__ import annotations

import time

import numpy as np


def main() -> None:
    import jax

    from vorbispizza_tpu.utils import cache as _cache

    _cache.configure(jax)
    print("backend:", jax.default_backend())

    from vorbispizza_tpu.models.corpus import (
        _front_end,
        _synthesizer_for,
        merge_streams,
    )
    from vorbispizza_tpu.ops import pcm_pack
    from vorbispizza_tpu.testing.encode import encode_vorbis, make_signal

    rate = 44100
    corpus = [
        encode_vorbis(
            make_signal(2, 15.0, rate=rate, kind="music", seed=s),
            rate=rate,
            quality=0.5,
        )
        for s in range(5)
    ]
    fronts = [_front_end(c) for c in corpus]
    setup, channels = fronts[0][:2]
    synth = _synthesizer_for(setup, channels)
    for f in fronts[1:]:
        synth.add_setup(f[0])
    plan_m, buckets_m, _ = merge_streams([f[2:4] for f in fronts])

    def one(label: str, idle_first: bool):
        t0 = time.perf_counter()
        sig, device_args, total = synth.prepare(plan_m, buckets_m, "s16d")
        t_prep = time.perf_counter() - t0
        h2d = sum(int(a.size) * a.dtype.itemsize for a in device_args)
        t0 = time.perf_counter()
        out = synth.run(sig, device_args, total)
        t_disp = time.perf_counter() - t0
        _, buf, nbt, out_len, tot = out[:5]
        C = nbt // pcm_pack.wire_rows(out_len)
        hint = pcm_pack.wire_header_bytes(C) + nbt + int(0.35 * out_len * C * 2)
        t0 = time.perf_counter()
        page0 = pcm_pack.start_page0(buf, hint)
        t_page0 = time.perf_counter() - t0
        if idle_first:
            time.sleep(2.5)  # let exec + async copy drain on an idle pipe
        t0 = time.perf_counter()
        nb, wtab, cuts, data = pcm_pack.pull_wire(buf, nbt, C, page0)
        t_pull = time.perf_counter() - t0
        print(
            f"{label}: prepare={t_prep*1e3:6.1f}ms (h2d {h2d/1e6:.2f} MB) "
            f"dispatch={t_disp*1e3:5.1f}ms page0_launch={t_page0*1e3:5.1f}ms "
            f"pull={t_pull*1e3:7.1f}ms (wire {nb/1e6:.2f} MB -> "
            f"{nb/1e6/max(t_pull,1e-9):.1f} MB/s)",
            flush=True,
        )
        return nb

    # warm: compile + load the fused program and slice programs
    one("warm     ", idle_first=False)
    for rep in range(2):
        one(f"hot   r{rep} ", idle_first=False)
    for rep in range(2):
        one(f"idle  r{rep} ", idle_first=True)

    # page-level timing of the same pull
    sig, device_args, total = synth.prepare(plan_m, buckets_m, "s16d")
    out = synth.run(sig, device_args, total)
    _, buf, nbt, out_len, tot = out[:5]
    C = nbt // pcm_pack.wire_rows(out_len)
    hint = pcm_pack.wire_header_bytes(C) + nbt + int(0.35 * out_len * C * 2)
    page0 = pcm_pack.start_page0(buf, hint)
    t0 = time.perf_counter()
    h = np.asarray(page0)
    t1 = time.perf_counter()
    print(
        f"page0 asarray: {(t1-t0)*1e3:.1f} ms for {h.nbytes/1e6:.2f} MB "
        f"({h.nbytes/1e6/max(t1-t0,1e-9):.1f} MB/s)"
    )
    HDR = pcm_pack.wire_header_bytes(C)
    nb = int(h[:4].view(np.int32)[0])
    covered = h.shape[0] - HDR - nbt
    print(f"wire nbytes={nb/1e6:.2f} MB, page0 covers {covered/1e6:.2f} MB, "
          f"remainder={max(nb-covered,0)/1e6:.2f} MB")


if __name__ == "__main__":
    main()
