"""Headline benchmark: corpus decode throughput per chip + BASELINE configs.

Measures, on the attached chip:
  1. headline  — 32x15s stereo 44.1 kHz corpus -> host s16 (the BASELINE
     "batched corpus" config), with a stage breakdown (DecodeTimer) and
     h2d/d2h byte counts;
  2. device-resident mode (PCM stays in HBM for downstream TPU consumers);
  3. 5.1 multichannel (Residue2 + coupling, BASELINE config #3);
  4. chained streams + seeking (BASELINE config #4);
  5. a Pallas-vs-gather OLA cross-check on a 64/8192 block-switching stream
     (every hop class under Mosaic, not interpret);
  6. raw tunnel rates (computed, incompressible payloads) -> a physical
     ceiling for this environment and the achieved fraction.

The interconnect to this chip is a tunnel measured at ~45 MB/s AGGREGATE
(duplex shares one budget), with ~30 ms per-call latency; 1000x realtime of
host-delivered s16 stereo needs ~176 MB/s of output alone, so the honest
headline here is the achieved fraction of the measured physical ceiling
(vs_baseline stays against the 1000x north star; the reference publishes no
numbers of its own).

Accuracy is asserted against the float64 scalar anchor each run.
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_T0 = time.perf_counter()

#: soft wall-clock budget: optional bench sections are skipped (their
#: metrics report -2.0) once exceeded, so a cold compile cache or bad
#: tunnel weather still yields the JSON line instead of a timeout
_BUDGET_S = float(os.environ.get("VP_BENCH_BUDGET_S", "2400"))


def _over_budget() -> bool:
    over = time.perf_counter() - _T0 > _BUDGET_S
    if over:
        _mark("over budget: skipping optional section")
    return over


def _mark(msg: str) -> None:
    """Progress to stderr (stdout carries only the JSON line)."""
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def measure_tunnel(jax, jnp):
    """Aggregate tunnel rates with computed (incompressible) payloads.

    block_until_ready is unreliable over the tunnel, so h2d completion is
    proven by pulling a full-data reduction (4 bytes back), and d2h by a
    real pull of computed data."""
    x = np.random.randint(-30000, 30000, size=(4 << 20,), dtype=np.int16)  # 8MB
    d = jax.device_put(x)
    np.asarray((d.astype(jnp.float32) * 1.0001).sum())  # warm end-to-end
    t0 = time.perf_counter()
    d = jax.device_put(x + 1)
    np.asarray((d.astype(jnp.float32) * 1.0003).sum())
    h2d = x.nbytes / (time.perf_counter() - t0)
    y = d.astype(jnp.float32) * 1.0007
    np.asarray(y.sum())  # ensure computed before timing the pull
    t0 = time.perf_counter()
    np.asarray(y)
    d2h = y.nbytes / (time.perf_counter() - t0)
    return h2d, d2h


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from vorbispizza_tpu.config import VorbisConfig
    from vorbispizza_tpu.models.corpus import decode_corpus
    from vorbispizza_tpu.models.pipeline import decode_file_batch
    from vorbispizza_tpu.reader import VorbisReader
    from vorbispizza_tpu.testing.encode import (
        chain_streams,
        encode_vorbis,
        make_signal,
    )
    from vorbispizza_tpu.utils.profiling import DecodeTimer

    _mark("encoding corpus")
    rate = 44100
    n_streams = 32
    seconds = 15.0
    corpus = [
        encode_vorbis(
            make_signal(2, seconds, rate=rate, kind="music", seed=seed),
            rate=rate,
            quality=0.5,
        )
        for seed in range(n_streams)
    ]
    total_audio = n_streams * seconds

    # ---- accuracy vs the float64 scalar anchor ---------------------------------
    _mark("accuracy check (first compile)")
    r = VorbisReader(corpus[0])
    r.initialize()
    ref = r.read_all(planar=True)
    outs = decode_corpus(corpus[:1])
    max_err = float(np.abs(outs[0] - ref).max())

    # ---- headline: corpus -> host s16, stage-attributed ------------------------
    _mark("headline warm (compile)")
    decode_corpus(corpus, output="s16")  # warm (compile)
    _mark("headline timed reps")
    reps = 2
    timer = DecodeTimer()
    t0 = time.perf_counter()
    for _ in range(reps):
        decode_corpus(corpus, output="s16", timer=timer)
    wall = (time.perf_counter() - t0) / reps
    rtf_s16 = total_audio / wall
    stages = {k: round(v / reps, 3) for k, v in timer.stages.items()}
    h2d_mb = timer.counters.get("h2d_bytes", 0) / reps / 1e6
    d2h_mb = timer.counters.get("d2h_bytes", 0) / reps / 1e6

    # ---- device-resident (no PCM pull; TPU-native deployment shape) ------------
    _mark("device-resident mode")
    rtf_dev = -2.0

    def rtf_device():
        outs_ = decode_corpus(corpus, output="device")
        for o in outs_:
            o.block_until_ready()
        # block_until_ready is unreliable over the tunnel: pull one value
        # to prove the (in-order) device queue drained, without paying a
        # PCM-sized transfer
        np.asarray(outs_[-1][:, -1])
        return outs_

    if not _over_budget():
        rtf_device()  # warm
        t0 = time.perf_counter()
        rtf_device()
        rtf_dev = total_audio / (time.perf_counter() - t0)

    # ---- device execution in isolation (no transfers in the timed loop) --------
    # Quantifies what the chip itself sustains: prepare (h2d) once, then
    # loop the fused program; the 4-byte nbytes pull at the end proves the
    # in-order queue drained (block_until_ready is unreliable here).
    _mark("device exec only")
    rtf_exec = -2.0
    from vorbispizza_tpu.models.corpus import (
        _front_end,
        _synthesizer_for,
        merge_streams,
    )

    if not _over_budget():
        fronts = [_front_end(c) for c in corpus[:8]]
        synth_x = _synthesizer_for(fronts[0][0], fronts[0][1])
        plan_x, buckets_x, lens_x = merge_streams([f[2:4] for f in fronts])
        args_x = synth_x.prepare(plan_x, buckets_x, "s16d")
        out_x = synth_x.run(*args_x)
        np.asarray(out_x[1][:4])  # warm + drain (4-byte header pull)
        audio_x = sum(lens_x) / rate
        reps_x = 5
        t0 = time.perf_counter()
        for _ in range(reps_x):
            out_x = synth_x.run(*args_x)
        np.asarray(out_x[1][:4])
        rtf_exec = reps_x * audio_x / (time.perf_counter() - t0)

    # ---- single stereo file (BASELINE config #1: TestFiles/1test.ogg) ----------
    _mark("single file")
    try:
        single = open("/root/reference/TestFiles/1test.ogg", "rb").read()
    except OSError:
        single = corpus[0]
    outs1 = decode_corpus([single], output="s16")  # warm
    single_seconds = outs1[0].shape[1] / rate
    t0 = time.perf_counter()
    decode_corpus([single], output="s16")
    rtf_single = single_seconds / (time.perf_counter() - t0)

    # ---- 5.1 multichannel (Residue2 + coupling) ---------------------------------
    _mark("5.1 multichannel")
    rtf51, err51 = -2.0, 0
    corpus51 = [
        encode_vorbis(
            make_signal(6, 10.0, rate=rate, kind="music", seed=100 + s),
            rate=rate,
            quality=0.4,
        )
        for s in range(4)
    ]
    if not _over_budget():
        r51 = VorbisReader(corpus51[0])
        r51.initialize()
        ref51 = r51.read_all(planar=True)
        outs51 = decode_corpus(corpus51, output="s16")  # warm + shapes
        q51 = np.clip(np.rint(ref51.astype(np.float64) * 32768.0), -32768, 32767)
        err51 = int(np.abs(outs51[0].astype(np.int64) - q51.astype(np.int64)).max())
        t0 = time.perf_counter()
        decode_corpus(corpus51, output="s16")
        rtf51 = (4 * 10.0) / (time.perf_counter() - t0)

    # ---- chained + seek ----------------------------------------------------------
    _mark("chained + seek")
    a = encode_vorbis(make_signal(2, 8.0, rate=rate, kind="music", seed=200),
                      rate=rate, quality=0.4, serial=1)
    b = encode_vorbis(make_signal(2, 8.0, rate=rate, kind="music", seed=201),
                      rate=rate, quality=0.4, serial=2)
    chained = chain_streams(a, b)
    rd = VorbisReader(chained, accelerated=True)
    rd.initialize()
    rd.read_samples(1024)  # warm (full batch decode happens here)
    rng = np.random.default_rng(0)
    positions = rng.integers(0, rd.total_samples - 4096, size=64)
    t0 = time.perf_counter()
    for p in positions:
        rd.seek_to(int(p))
        rd.read_samples(1024)
    seek_ms = (time.perf_counter() - t0) / len(positions) * 1e3

    # ---- Pallas OLA vs gather path under Mosaic (hop-class coverage) ------------
    # Current Mosaic only accepts 128-aligned DMA hop geometry, so the
    # Pallas kernel serves uniform-blocksize streams; mixed-blocksize (and
    # all granule-trimmed) plans route through the fused gather path. Both
    # engagement modes are checked here on the real chip: the aligned class
    # must compile under Mosaic and match the gather path bit-exactly.
    _mark("pallas vs gather check")
    pallas_check = -1.0
    if jax.default_backend() == "tpu" and not _over_budget():
        from vorbispizza_tpu.models.pipeline import BatchSynthesizer
        from vorbispizza_tpu.testing.rawstream import (
            make_extreme_blocksize_stream,
        )

        saved = VorbisConfig.default.use_pallas_ola
        try:
            pallas_check = 0.0
            for pattern in ("long", "short", "alternate"):
                ext = make_extreme_blocksize_stream(
                    n_packets=24, pattern=pattern
                )
                VorbisConfig.default.use_pallas_ola = True
                via_pallas = decode_file_batch(ext)
                VorbisConfig.default.use_pallas_ola = False
                via_gather = decode_file_batch(ext)
                pallas_check = max(
                    pallas_check,
                    float(np.abs(via_pallas - via_gather).max()),
                )
        finally:
            VorbisConfig.default.use_pallas_ola = saved
        assert pallas_check == 0.0, f"Pallas OLA != gather OLA: {pallas_check}"

    # ---- physical ceiling of this environment ------------------------------------
    # The link meters sustained use (token bucket): rates measured right
    # after the heavy sections read the drained bucket, so take the best
    # of two samples spaced by the (idle) encode of the tail configs.
    _mark("tunnel rate measurement")
    h2d_rate, d2h_rate = measure_tunnel(jax, jnp)
    time.sleep(20)
    h2d2, d2h2 = measure_tunnel(jax, jnp)
    h2d_rate, d2h_rate = max(h2d_rate, h2d2), max(d2h_rate, d2h2)
    # the tunnel budget is aggregate (duplex shares one pipe): the floor is
    # total bytes moved at the direction-specific measured rates
    transfer_s = (h2d_mb * 1e6) / h2d_rate + (d2h_mb * 1e6) / d2h_rate
    ceiling_rtf = total_audio / transfer_s if transfer_s > 0 else -1.0
    fraction = rtf_s16 / ceiling_rtf if ceiling_rtf > 0 else -1.0

    print(
        json.dumps(
            {
                "metric": "decode_rtf_corpus",
                "value": round(rtf_s16, 2),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(rtf_s16 / 1000.0, 4),
                "rtf_device_resident": round(rtf_dev, 2),
                "rtf_single_file": round(rtf_single, 2),
                "rtf_device_exec_only": round(rtf_exec, 2),
                "rtf_multichannel_5_1": round(rtf51, 2),
                "chained_seek_ms": round(seek_ms, 2),
                "stages_s": stages,
                "h2d_mb": round(h2d_mb, 1),
                "d2h_mb": round(d2h_mb, 1),
                "tunnel_h2d_mbps": round(h2d_rate / 1e6, 1),
                "tunnel_d2h_mbps": round(d2h_rate / 1e6, 1),
                "tunnel_ceiling_rtf": round(ceiling_rtf, 1),
                "fraction_of_ceiling": round(fraction, 3),
                "pallas_vs_gather_max_err": pallas_check,
                "max_abs_err_vs_anchor": max_err,
                "s16_err_5_1_lsb": err51,
                "corpus_streams": n_streams,
                "corpus_audio_seconds": round(total_audio, 1),
                "backend": jax.default_backend(),
            }
        )
    )
    assert max_err <= 1e-6, f"accuracy budget exceeded: {max_err}"
    assert err51 <= 1, f"5.1 s16 error: {err51}"  # 0 when section skipped


if __name__ == "__main__":
    main()
