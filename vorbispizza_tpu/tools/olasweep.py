"""On-chip sweep of block_assemble's phase width W, plus the Pallas
per-hop kernel vs the block path on its one eligible shape (cut-free,
128-aligned uniform-blocksize streams) — the data for VERDICT r2 item 5
(keep or delete the Pallas OLA).

Usage: python -m vorbispizza_tpu.tools.olasweep [n_files] [secs] [channels]
(channels=6 sweeps the 5.1 lane-fill case — VERDICT r3 #3)
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time_exec(synth, plan, buckets, output, reps=5):
    sig, args, total = synth.prepare(plan, buckets, output)
    t_c0 = time.perf_counter()
    out = synth.run(sig, args, total)
    probe = out[1] if isinstance(out, tuple) else out
    np.asarray(probe.ravel()[:4])
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = synth.run(sig, args, total)
    probe = out[1] if isinstance(out, tuple) else out
    np.asarray(probe.ravel()[:4])
    return (time.perf_counter() - t0) / reps, compile_s


def run_sweep(n_files: int = 8, secs: float = 15.0, channels: int = 2):
    from ..models import pipeline as pl
    from ..models.corpus import _front_end, merge_streams
    from ..models.pipeline import BatchSynthesizer
    from ..ops import ola
    from ..testing.encode import encode_vorbis, make_signal

    rate = 44100
    corpus = [
        encode_vorbis(
            make_signal(channels, secs, rate=rate, kind="music", seed=s),
            rate=rate,
            quality=0.4,
        )
        for s in range(n_files)
    ]
    fronts = [_front_end(c) for c in corpus]
    setup, channels = fronts[0][0], fronts[0][1]
    plan, buckets, lens = merge_streams([f[2:4] for f in fronts])
    audio_s = sum(lens) / rate

    ref = None
    for W in (8, 16, 32, 64, 128):
        def wth(flat, evs, L, _W=W):
            return ola.block_assemble(flat, evs, L, W=_W)

        saved = pl.block_assemble
        pl.block_assemble = wth
        try:
            synth = BatchSynthesizer(setup, channels, use_pallas_ola=False)
            per, compile_s = _time_exec(synth, plan, buckets, "f32")
            sig, args, total = synth.prepare(plan, buckets, "f32")
            outw = np.asarray(synth.run(sig, args, total))
            if ref is None:
                ref = outw
            exact = bool(np.array_equal(outw, ref))
            print(
                f"W={W:3d}  {per * 1e3:8.1f} ms/chunk  rtf {audio_s / per:8.1f}"
                f"  bitexact_vs_W8 {exact}  (compile {compile_s:.1f}s)",
                flush=True,
            )
        finally:
            pl.block_assemble = saved

    # ---- Pallas kernel vs block path on its eligible (aligned) shape ----
    if channels != 2:
        return  # the Pallas-vs-block rawstream shapes are stereo-only
    from ..testing.rawstream import make_extreme_blocksize_stream

    for pattern in ("long", "short"):
        ext = make_extreme_blocksize_stream(n_packets=192, pattern=pattern)
        f = _front_end(ext)
        psetup, pch, pplan, pbuckets = f
        plens = None
        for use_pallas in (True, False):
            synth = BatchSynthesizer(psetup, pch, use_pallas_ola=use_pallas)
            per, compile_s = _time_exec(
                synth, pplan, pbuckets, "f32", reps=10
            )
            name = "pallas" if use_pallas else "block "
            print(
                f"{pattern:6s} {name}  {per * 1e3:8.2f} ms/run"
                f"  (compile {compile_s:.1f}s)",
                flush=True,
            )


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    s = float(sys.argv[2]) if len(sys.argv) > 2 else 15.0
    ch = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    run_sweep(n, s, ch)
