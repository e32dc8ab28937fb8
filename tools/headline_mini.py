"""Headline-only mini-bench: the bench corpus (32x15 s stereo q0.5) ->
host s16, warm + N timed reps, with stage walls and the d2h counter.
For A/B runs of pull/wire scheduling changes without draining the link
on the full bench's optional sections."""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import jax

    from vorbispizza_tpu.utils import cache as _cache

    _cache.configure(jax)
    print("backend:", jax.default_backend(), flush=True)

    from vorbispizza_tpu.models.corpus import decode_corpus
    from vorbispizza_tpu.testing.encode import encode_vorbis, make_signal
    from vorbispizza_tpu.utils.profiling import DecodeTimer

    rate = 44100
    corpus = [
        encode_vorbis(
            make_signal(2, 15.0, rate=rate, kind="music", seed=s),
            rate=rate,
            quality=0.5,
        )
        for s in range(32)
    ]
    audio_s = 32 * 15.0
    t0 = time.perf_counter()
    decode_corpus(corpus, output="s16")  # warm + ratio calibration
    print(f"warm: {time.perf_counter() - t0:.1f}s", flush=True)
    rtfs = []
    for rep in range(reps):
        timer = DecodeTimer()
        t0 = time.perf_counter()
        c0 = time.process_time()
        outs = decode_corpus(corpus, output="s16", timer=timer)
        cpu = time.process_time() - c0
        dt = time.perf_counter() - t0
        assert all(o is not None for o in outs)
        rtfs.append(audio_s / dt)
        st = {k: round(v, 3) for k, v in sorted(timer.stages.items())}
        print(
            f"rep{rep}: wall={dt:6.3f}s cpu={cpu:6.3f}s "
            f"rtf={audio_s/dt:7.1f}x "
            f"d2h={timer.counters.get('d2h_bytes',0)/1e6:5.2f}MB "
            f"h2d={timer.counters.get('h2d_bytes',0)/1e6:5.2f}MB "
            f"stages={st}",
            flush=True,
        )
    rtfs.sort()
    print(f"median rtf: {rtfs[len(rtfs)//2]:.1f}x  (min {rtfs[0]:.1f} "
          f"max {rtfs[-1]:.1f})")


if __name__ == "__main__":
    main()
