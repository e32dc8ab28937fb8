"""Headline benchmark: corpus decode throughput per chip, stereo 44.1 kHz.

Synthesizes a corpus of music-like stereo streams (libvorbisenc), decodes
them through the full pipeline — threaded host front ends (Ogg demux + C++
entropy decode) overlapped with the fused device synthesis program — and
prints ONE JSON line. The headline metric is total decoded audio seconds
per wall second on one chip (realtime factor); vs_baseline is against the
driver target of 1000x realtime (BASELINE.md north star; the reference
publishes no numbers of its own).

Accuracy is asserted against the float64 scalar anchor each run.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from vorbispizza_tpu.models.corpus import decode_corpus
    from vorbispizza_tpu.reader import VorbisReader
    from vorbispizza_tpu.testing.encode import encode_vorbis, make_signal

    n_streams = 16
    seconds = 15.0
    corpus = []
    for seed in range(n_streams):
        sig = make_signal(2, seconds, rate=44100, kind="music", seed=seed)
        corpus.append(encode_vorbis(sig, rate=44100, quality=0.5))

    # ---- accuracy vs the float64 scalar anchor -----------------------------------
    r = VorbisReader(corpus[0])
    r.initialize()
    ref = r.read_all(planar=True)

    # ---- warm (compile) then measure ---------------------------------------------
    outs = decode_corpus(corpus)
    max_err = float(np.abs(outs[0] - ref).max())
    total_audio = sum(o.shape[1] for o in outs) / 44100.0

    def measure(reps=3, **kw):
        decode_corpus(corpus, **kw)  # warm/compile
        t0 = time.perf_counter()
        for _ in range(reps):
            outs_ = decode_corpus(corpus, **kw)
            if kw.get("output") == "device":
                for o in outs_:
                    o.block_until_ready()
        return total_audio / ((time.perf_counter() - t0) / reps)

    def safe(fn, *a, **kw):
        try:
            return fn(*a, **kw)
        except Exception:
            return -1.0

    rtf_f32 = safe(measure, output="f32")
    rtf_s16 = safe(measure, output="s16")
    rtf_device = safe(measure, output="device")

    # single-stream end-to-end (no cross-stream overlap), for the breakdown
    decode_corpus(corpus[:1], output="s16")  # warm single-stream shapes
    t0 = time.perf_counter()
    decode_corpus(corpus[:1], output="s16")
    single = (total_audio / n_streams) / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": "decode_rtf_corpus",
                "value": round(rtf_s16, 2),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(rtf_s16 / 1000.0, 4),
                "rtf_f32_host": round(rtf_f32, 2),
                "rtf_device_resident": round(rtf_device, 2),
                "single_stream_rtf": round(single, 2),
                "max_abs_err_vs_anchor": max_err,
                "corpus_streams": n_streams,
                "corpus_audio_seconds": round(total_audio, 2),
                "backend": jax.default_backend(),
            }
        )
    )
    assert max_err <= 1e-6, f"accuracy budget exceeded: {max_err}"


if __name__ == "__main__":
    main()
