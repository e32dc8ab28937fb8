"""Headline benchmark: realtime decode factor, stereo 44.1 kHz, per chip.

Synthesizes a music-like stereo stream (libvorbisenc), decodes it through
the full TPU batch pipeline (host entropy front end -> fused device
synthesis -> gather OLA), verifies PCM against the float64 scalar anchor,
and prints ONE JSON line:

    {"metric": "decode_rtf_e2e", "value": <x realtime>, "unit": "x_realtime",
     "vs_baseline": <value / 1000>, ...}

vs_baseline is measured against the driver target of 1000x realtime
(BASELINE.md north star; the reference publishes no numbers of its own).
"""

from __future__ import annotations

import io
import json
import time

import numpy as np


def _make_stream(seconds: float) -> bytes:
    from vorbispizza_tpu.testing.encode import encode_vorbis, make_signal

    sig = make_signal(2, seconds, rate=44100, kind="music", seed=7)
    return encode_vorbis(sig, rate=44100, quality=0.5)


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from vorbispizza_tpu.decoder import StreamDecoder
    from vorbispizza_tpu.frames import build_plan, extract_batch
    from vorbispizza_tpu.models.pipeline import BatchSynthesizer
    from vorbispizza_tpu.ogg.container import OggContainer
    from vorbispizza_tpu.reader import VorbisReader

    seconds = 30.0
    data = _make_stream(seconds)

    # ---- scalar anchor (accuracy reference) --------------------------------------
    r = VorbisReader(data)
    r.initialize()
    ref = r.read_all(planar=True)
    duration = ref.shape[1] / 44100.0

    # ---- batch pipeline ----------------------------------------------------------
    def front_end():
        container = OggContainer(io.BytesIO(data))
        container.try_init()
        provider = container.providers[0]
        dec = StreamDecoder(provider)
        dec.initialize()
        plan = build_plan(provider, dec._setup)
        buckets = extract_batch(plan, dec._setup, dec.channels)
        return dec, plan, buckets

    dec, plan, buckets = front_end()  # warm (page cache etc. irrelevant; fresh objects)
    t0 = time.perf_counter()
    dec, plan, buckets = front_end()
    host_s = time.perf_counter() - t0

    synth = BatchSynthesizer(dec._setup, dec.channels)
    out = synth.assemble(plan, buckets)  # compile
    out.block_until_ready()
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = synth.assemble(plan, buckets)
        out.block_until_ready()
    device_s = (time.perf_counter() - t0) / reps

    pcm = np.asarray(out)
    max_err = float(np.abs(np.clip(pcm, -0.99999994, 0.99999994) - ref).max())

    e2e_s = host_s + device_s
    rtf_e2e = duration / e2e_s
    rtf_device = duration / device_s
    print(
        json.dumps(
            {
                "metric": "decode_rtf_e2e",
                "value": round(rtf_e2e, 2),
                "unit": "x_realtime",
                "vs_baseline": round(rtf_e2e / 1000.0, 4),
                "device_rtf": round(rtf_device, 2),
                "host_front_end_rtf": round(duration / host_s, 2),
                "max_abs_err_vs_anchor": max_err,
                "stream_seconds": round(duration, 2),
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
