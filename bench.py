"""Headline benchmark: corpus decode throughput per chip + BASELINE configs.

Measures, on the attached chip:
  1. headline  — 32x15s stereo 44.1 kHz corpus -> host s16 (the BASELINE
     "batched corpus" config), median of up to 3 reps with min/max spread,
     stage breakdown (DecodeTimer) and h2d/d2h byte counts;
  2. device execution in isolation (no transfers in the timed loop);
  3. 5.1 multichannel (Residue2 + coupling, BASELINE config #3), with its
     own exec-only metric;
  4. device-resident mode (PCM stays in HBM for downstream TPU consumers);
  5. chained streams + seeking (BASELINE config #4);
  6. raw tunnel rates (computed, incompressible payloads) -> a physical
     ceiling for this environment and the achieved fraction.

The interconnect to this chip is a tunnel measured at ~45 MB/s AGGREGATE
(duplex shares one budget), with ~30 ms per-call latency; 1000x realtime of
host-delivered s16 stereo needs ~176 MB/s of output alone, so the honest
headline here is the achieved fraction of the measured physical ceiling
(vs_baseline stays against the 1000x north star; the reference publishes no
numbers of its own).

Accuracy is asserted against the float64 scalar anchor each run.

Prints ONE JSON line — ALWAYS. The results dict is updated section by
section and flushed exactly once, whether we finish, blow the soft budget
(optional sections report -2.0), hit the hard self-alarm, or receive the
driver's SIGTERM. The driver kills at ~1800 s; the hard alarm fires before
that so the line lands with whatever sections completed.
"""

from __future__ import annotations

import atexit
import json
import os
import signal
import sys
import time

import numpy as np

_T0 = time.perf_counter()

#: soft wall-clock budget: optional bench sections are skipped (their
#: metrics stay -2.0) once exceeded, so a cold compile cache or bad
#: tunnel weather still yields every mandatory number
_BUDGET_S = float(os.environ.get("VP_BENCH_BUDGET_S", "1000"))
#: hard self-deadline: SIGALRM flushes the JSON and exits, safely before
#: the driver's ~1800 s kill window
_HARD_S = float(os.environ.get("VP_BENCH_HARD_S", "1450"))

RESULTS = {
    "metric": "decode_rtf_corpus",
    "value": -2.0,
    "unit": "x_realtime_per_chip",
    "vs_baseline": -0.002,
    "value_min": -2.0,
    "value_max": -2.0,
    "value_reps": 0,
    "rtf_device_resident": -2.0,
    "rtf_single_file": -2.0,
    "rtf_device_exec_only": -2.0,
    "rtf_multichannel_5_1": -2.0,
    "rtf_exec_5_1": -2.0,
    "chained_seek_ms": -2.0,
    "stages_s": {},
    "h2d_mb": -2.0,
    "d2h_mb": -2.0,
    "tunnel_h2d_mbps": -2.0,
    "tunnel_d2h_mbps": -2.0,
    "tunnel_ceiling_rtf": -2.0,
    "fraction_of_ceiling": -2.0,
    "fraction_reps": [],
    "max_abs_err_vs_anchor": -2.0,
    "s16_err_5_1_lsb": 0,
    "corpus_streams": 0,
    "corpus_audio_seconds": 0.0,
    "backend": "",
    "bench_wall_s": -2.0,
}

_emitted = [False]
_emit_lock = __import__("threading").Lock()


def _emit_json() -> None:
    """Print the one JSON line exactly once (normal end, atexit, signal,
    watchdog thread). The lock makes the check-and-set atomic: the
    watchdog thread and a late-returning main thread must not both pass
    the _emitted check and print two lines."""
    with _emit_lock:
        if _emitted[0]:
            return
        _emitted[0] = True
    RESULTS["bench_wall_s"] = round(time.perf_counter() - _T0, 1)
    print(json.dumps(RESULTS), flush=True)
    try:
        signal.alarm(0)  # line is out: the hard deadline has done its job
    except Exception:
        pass


def _install_guards() -> None:
    atexit.register(_emit_json)

    def on_signal(signum, frame):
        _mark(f"signal {signum}: flushing JSON and exiting")
        _emit_json()
        sys.stdout.flush()
        os._exit(3)

    signal.signal(signal.SIGTERM, on_signal)
    signal.signal(signal.SIGALRM, on_signal)
    signal.alarm(int(_HARD_S))

    # the SIGALRM handler only runs between Python bytecodes on the main
    # thread — a backend init or compile HUNG inside a C call (observed:
    # 18+ min tunnel-down init stalls) would ride straight through the
    # alarm into the driver's kill. A daemon watchdog THREAD needs no
    # main-thread cooperation: at the hard deadline it flushes the
    # best-known JSON and force-exits.
    import threading

    def watchdog():
        time.sleep(_HARD_S + 10.0)
        if not _emitted[0]:
            _mark("watchdog: main thread wedged; flushing JSON")
            _emit_json()
            sys.stdout.flush()
            os._exit(4)

    threading.Thread(target=watchdog, daemon=True).start()


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


def _probe_backend(timeout_s: float = 120.0) -> bool:
    """Touch the accelerator from a SUBPROCESS with a hard timeout.

    A down tunnel wedges backend init inside a C call for tens of minutes
    (observed: 18+ min) — in-process nothing can interrupt it but the
    watchdog at _HARD_S. Probing in a child process costs ~15 s when the
    chip answers and bounds the loss to ``timeout_s`` when it doesn't,
    letting the bench emit its JSON line early with backend="unreachable"
    instead of burning the driver's whole window."""
    import subprocess

    code = (
        "import jax, numpy as np;"
        "from vorbispizza_tpu.utils.cache import configure;"
        "configure(jax);"
        "d = jax.device_put(np.arange(8));"
        "assert int(np.asarray(d).sum()) == 28"
    )
    try:
        rc = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        ).returncode
        return rc == 0
    except subprocess.TimeoutExpired:
        return False
    except Exception:
        return True  # probe infrastructure failed: let the real init try


#: keep re-probing a down chip this long before giving up: a chip that
#: answers mid-window still gets its headline (warm-cache mandatory path
#: is ~250-330 s; the hard alarm at _HARD_S bounds the worst case anyway)
_PROBE_WINDOW_S = float(os.environ.get("VP_BENCH_PROBE_WINDOW_S", "1000"))


def _probe_backend_window() -> bool:
    """Escalating probes until the chip answers or the window closes.

    The first attempt is short (120 s) so a healthy chip costs ~15 s; the
    later attempts run 420 s EACH, because every probe is a fresh
    subprocess restarting backend init from zero — four 120 s probes can
    never outlast a single 2-7 min first-contact stall (VERDICT r4 weak
    #2; the stalls themselves are documented in CLAUDE.md round-4 notes).
    A success at +950 s still fits the ~250-330 s warm mandatory path
    before the hard alarm at _HARD_S."""
    timeouts = [120.0, 420.0]
    attempt = 0
    while True:
        elapsed = time.perf_counter() - _T0
        remaining = _PROBE_WINDOW_S - elapsed
        if remaining < 60.0:
            return False
        t = min(timeouts[min(attempt, len(timeouts) - 1)], remaining)
        if _probe_backend(t):
            return True
        attempt += 1
        _mark(
            f"probe failed at +{time.perf_counter() - _T0:.0f}s "
            f"(timeout {t:.0f}s); re-probing"
        )
        time.sleep(10.0)


def main() -> None:
    _install_guards()
    _mark("probing accelerator reachability (subprocess)")
    if not _probe_backend_window():
        _mark("backend unreachable: emitting sentinel JSON early")
        RESULTS["backend"] = "unreachable"
        _emit_json()
        return
    import jax
    import jax.numpy as jnp

    from vorbispizza_tpu.utils.cache import configure as _configure_cache

    _configure_cache(jax)  # repo-local: survives container restarts

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

    RESULTS["backend"] = jax.default_backend()

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
    RESULTS["corpus_streams"] = n_streams
    RESULTS["corpus_audio_seconds"] = round(total_audio, 1)

    # 5.1 corpus: pure host work (libvorbisenc) — encode it HERE, before
    # the first chip contact, so it doesn't sit between timed sections
    # (VERDICT r3 #7)
    _mark("encoding 5.1 corpus")
    corpus51 = [
        encode_vorbis(
            make_signal(6, 10.0, rate=rate, kind="music", seed=100 + s),
            rate=rate,
            quality=0.4,
        )
        for s in range(4)
    ]

    # ---- accuracy vs the float64 scalar anchor ---------------------------------
    # (mandatory; also the first chip contact, which can absorb minutes on
    # bad hours — everything below stays budget-gated against that)
    _mark("accuracy check (first compile)")
    r = VorbisReader(corpus[0])
    r.initialize()
    ref = r.read_all(planar=True)
    outs = decode_corpus(corpus[:1])
    max_err = float(np.abs(outs[0] - ref).max())
    RESULTS["max_abs_err_vs_anchor"] = max_err

    # ---- tunnel rates (cheap; needed for the ceiling) --------------------------
    _mark("tunnel rate measurement")
    h2d_rate, d2h_rate = measure_tunnel(jax, jnp)
    RESULTS["tunnel_h2d_mbps"] = round(h2d_rate / 1e6, 1)
    RESULTS["tunnel_d2h_mbps"] = round(d2h_rate / 1e6, 1)

    # ---- headline: corpus -> host s16, stage-attributed, median-of-reps --------
    _mark("headline warm (compile)")
    decode_corpus(corpus, output="s16")  # warm (compile)
    _mark("headline timed reps")
    rep_rtfs = []
    rep_ceilings = []
    rep_fracs = []
    timer = DecodeTimer()
    # median-of-5 when budget allows: rep-to-rep tunnel weather swings
    # 240-420x on identical code; extra reps cost ~2 s each warm
    max_reps = 5
    for rep in range(max_reps):
        st0 = dict(timer.stages)
        ct0 = dict(timer.counters)
        t0 = time.perf_counter()
        decode_corpus(corpus, output="s16", timer=timer)
        rep_rtfs.append(total_audio / (time.perf_counter() - t0))
        # Per-rep ceiling from the rep's OWN transfer occupancy — the
        # same weather as the rep by construction (VERDICT r4 weak #4:
        # the old formula mixed a max-of-two-moments link rate with each
        # rep's moment). "collect_pull" counts lock-held pull time only
        # (pulls serialize, so the sum is true d2h link occupancy); the
        # h2d side shares the same aggregate pipe and is folded in by
        # byte ratio. The ceiling is the RTF the rep would score if its
        # wall were ONLY transfers; fraction -> 1 means transfer-bound
        # at this weather.
        pull_s = timer.stages.get("collect_pull", 0.0) - st0.get(
            "collect_pull", 0.0
        )
        d2h_rep = timer.counters.get("d2h_bytes", 0) - ct0.get(
            "d2h_bytes", 0
        )
        h2d_rep = timer.counters.get("h2d_bytes", 0) - ct0.get(
            "h2d_bytes", 0
        )
        if pull_s > 0 and d2h_rep > 0:
            xfer_s = pull_s * (1.0 + h2d_rep / d2h_rep)
            rep_ceilings.append(total_audio / xfer_s)
            rep_fracs.append(rep_rtfs[-1] / rep_ceilings[-1])
        # record the best-known median after every rep (run-to-run tunnel
        # weather swings 3x; one spike must not halve the recorded score)
        reps = len(rep_rtfs)
        RESULTS["value"] = round(float(np.median(rep_rtfs)), 2)
        RESULTS["value_min"] = round(min(rep_rtfs), 2)
        RESULTS["value_max"] = round(max(rep_rtfs), 2)
        RESULTS["value_reps"] = reps
        RESULTS["vs_baseline"] = round(RESULTS["value"] / 1000.0, 4)
        RESULTS["stages_s"] = {
            k: round(v / reps, 3) for k, v in timer.stages.items()
        }
        h2d_mb = timer.counters.get("h2d_bytes", 0) / reps / 1e6
        d2h_mb = timer.counters.get("d2h_bytes", 0) / reps / 1e6
        RESULTS["h2d_mb"] = round(h2d_mb, 1)
        RESULTS["d2h_mb"] = round(d2h_mb, 1)
        if rep_ceilings:
            RESULTS["tunnel_ceiling_rtf"] = round(
                float(np.median(rep_ceilings)), 1
            )
            RESULTS["fraction_of_ceiling"] = round(
                float(np.median(rep_fracs)), 3
            )
            RESULTS["fraction_reps"] = [round(f, 3) for f in rep_fracs]
        if rep >= 1 and time.perf_counter() - _T0 > _BUDGET_S * 0.6:
            _mark("headline: stopping reps early (budget)")
            break

    # ---- device execution in isolation (no transfers in the timed loop) --------
    # Quantifies what the chip itself sustains: prepare (h2d) once, then
    # loop the fused program; the 4-byte nbytes pull at the end proves the
    # in-order queue drained (block_until_ready is unreliable here).
    _mark("device exec only")
    from vorbispizza_tpu.models.corpus import (
        _front_end,
        _synthesizer_for,
        merge_streams,
    )

    if not _over_budget():
        try:
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
            RESULTS["rtf_device_exec_only"] = round(
                reps_x * audio_x / (time.perf_counter() - t0), 2
            )
        except Exception as e:  # pragma: no cover - report, don't die
            _mark(f"exec-only section failed: {e!r}")

    # ---- 5.1 multichannel (Residue2 + coupling) ---------------------------------
    _mark("5.1 multichannel")
    if not _over_budget():
        try:
            r51 = VorbisReader(corpus51[0])
            r51.initialize()
            ref51 = r51.read_all(planar=True)
            outs51 = decode_corpus(corpus51, output="s16")  # warm + shapes
            q51 = np.clip(np.rint(ref51.astype(np.float64) * 32768.0), -32768, 32767)
            RESULTS["s16_err_5_1_lsb"] = int(
                np.abs(outs51[0].astype(np.int64) - q51.astype(np.int64)).max()
            )
            t0 = time.perf_counter()
            decode_corpus(corpus51, output="s16")
            RESULTS["rtf_multichannel_5_1"] = round(
                (4 * 10.0) / (time.perf_counter() - t0), 2
            )
            # exec-only for the 6-channel path (VERDICT r2 asked for the
            # attribution surface)
            fronts51 = [_front_end(c) for c in corpus51]
            synth51 = _synthesizer_for(fronts51[0][0], fronts51[0][1])
            plan51, buckets51, lens51 = merge_streams(
                [f[2:4] for f in fronts51]
            )
            a51 = synth51.prepare(plan51, buckets51, "s16d")
            o51 = synth51.run(*a51)
            np.asarray(o51[1][:4])
            t0 = time.perf_counter()
            for _ in range(5):
                o51 = synth51.run(*a51)
            np.asarray(o51[1][:4])
            RESULTS["rtf_exec_5_1"] = round(
                5 * sum(lens51) / rate / (time.perf_counter() - t0), 2
            )
        except Exception as e:  # pragma: no cover
            _mark(f"5.1 section failed: {e!r}")

    # ---- device-resident (no PCM pull; TPU-native deployment shape) ------------
    _mark("device-resident mode")
    if not _over_budget():
        try:

            def rtf_device():
                outs_ = decode_corpus(corpus, output="device")
                for o in outs_:
                    o.block_until_ready()
                # block_until_ready is unreliable over the tunnel: pull one
                # value to prove the (in-order) device queue drained, without
                # paying a PCM-sized transfer
                np.asarray(outs_[-1][:, -1])
                return outs_

            rtf_device()  # warm
            t0 = time.perf_counter()
            rtf_device()
            RESULTS["rtf_device_resident"] = round(
                total_audio / (time.perf_counter() - t0), 2
            )
        except Exception as e:  # pragma: no cover
            _mark(f"device-resident section failed: {e!r}")

    # ---- single stereo file (BASELINE config #1: TestFiles/1test.ogg) ----------
    _mark("single file")
    if not _over_budget():
        try:
            try:
                single = open("/root/reference/TestFiles/1test.ogg", "rb").read()
            except OSError:
                single = corpus[0]
            outs1 = decode_corpus([single], output="s16")  # warm
            single_seconds = outs1[0].shape[1] / rate
            t0 = time.perf_counter()
            decode_corpus([single], output="s16")
            RESULTS["rtf_single_file"] = round(
                single_seconds / (time.perf_counter() - t0), 2
            )
        except Exception as e:  # pragma: no cover
            _mark(f"single-file section failed: {e!r}")

    # ---- chained + seek ----------------------------------------------------------
    _mark("chained + seek")
    if not _over_budget():
        try:
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
            RESULTS["chained_seek_ms"] = round(
                (time.perf_counter() - t0) / len(positions) * 1e3, 2
            )
        except Exception as e:  # pragma: no cover
            _mark(f"chained section failed: {e!r}")

    # ---- late tunnel re-measure (token bucket may have drained/refilled) --------
    # raw link-rate reporting only: the ceiling/fraction come from each
    # rep's own transfer walls above and are NOT recomputed from this
    # different-weather sample (VERDICT r4 weak #4)
    if not _over_budget():
        _mark("tunnel re-measurement")
        try:
            h2d2, d2h2 = measure_tunnel(jax, jnp)
            RESULTS["tunnel_h2d_mbps"] = round(max(h2d_rate, h2d2) / 1e6, 1)
            RESULTS["tunnel_d2h_mbps"] = round(max(d2h_rate, d2h2) / 1e6, 1)
        except Exception as e:  # pragma: no cover
            _mark(f"tunnel re-measure failed: {e!r}")

    # Accuracy gates BEFORE the JSON goes out: a build that blows the
    # anchor budget must not publish a harvestable RTF (advisor r3 #1).
    # value=-3.0 is the "fast but wrong" sentinel, distinct from -2.0
    # (section never ran).
    err51 = RESULTS["s16_err_5_1_lsb"]
    failures = []
    if max_err > 1e-6:
        failures.append(f"accuracy budget exceeded: {max_err}")
    if err51 > 1:  # 0 when section skipped
        failures.append(f"5.1 s16 error: {err51}")
    if failures:
        _mark("ACCURACY GATE FAILED: " + "; ".join(failures))
        RESULTS["value"] = -3.0
        RESULTS["vs_baseline"] = -0.003
    _emit_json()
    assert not failures, "; ".join(failures)


if __name__ == "__main__":
    main()
