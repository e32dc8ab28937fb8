"""Does the axon tunnel overlap device execution with d2h pulls?

The corpus pipeline assumes chunk k's d2h can stream while chunk k+1
executes. Bench history suggests otherwise: across every recorded run,
rep wall ~= exec + bytes/rate + per-call latency, and on strong-weather
days fraction_of_ceiling DROPS (0.32 at 57-68 MB/s probe rates vs 0.77
at 25 MB/s) — a structural cap, not weather, would explain both.

Measurement rules (CLAUDE.md): completion of a program is proven by a
real pull of computed data (a tiny in-graph slice program), and every
timed pull materializes a buffer the host has NEVER materialized
(np.asarray of an already-pulled buffer returns from a host-side copy
cache in ~0 ms — the first version of this probe fell for that).

Trials, all on pre-warmed programs:
  A. exec-alone: dispatch heavy(a), pull its tiny output.
  B. pull-alone: fresh 8 MB incompressible output, proven complete,
     then time np.asarray.
  C. overlap: fresh 8 MB output proven complete, copy_to_host_async,
     dispatch heavy, then time np.asarray (and the total incl. exec).
If C.pull ~= B: transfers and exec overlap (fraction_of_ceiling < 1 is
weather skew). If C.pull ~= A + B: the device stream is serial — exec
time buys headline 1:1 and the rice pack's exec regression is a real
headline cost.
"""

from __future__ import annotations

import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vorbispizza_tpu.utils import cache as _cache

    _cache.configure(jax)
    dev = jax.devices()[0]
    print("device:", dev)

    MB = 1 << 20
    N_OUT = 8 * MB  # incompressible pull payload
    rng = np.random.default_rng(0)
    host_payload = rng.integers(0, 256, size=N_OUT, dtype=np.uint8)

    @jax.jit
    def heavy(a):
        def body(_, x):
            return jnp.tanh(x @ a) * 0.999

        x = jax.lax.fori_loop(0, 2000, body, a)
        return x[:1, :1]

    @jax.jit
    def gen(base, seed):
        # fresh incompressible 8 MB buffer per seed, near-zero exec cost
        return base + seed.astype(jnp.uint8)

    @jax.jit
    def head(x):
        return x[:4]

    a = jnp.asarray(rng.standard_normal((2048, 2048), dtype=np.float32))
    base = jax.device_put(host_payload, dev)
    # warm every program; prove completion via real pulls
    np.asarray(heavy(a))
    o = gen(base, jnp.uint8(255))
    np.asarray(head(o))
    np.asarray(o)
    del o
    time.sleep(0.5)

    def fresh(seed: int):
        o = gen(base, jnp.uint8(seed))
        np.asarray(head(o))  # proves o finished; pulls 4 bytes
        return o

    seed = 0
    for rep in range(3):
        t0 = time.perf_counter()
        np.asarray(heavy(a))
        e = time.perf_counter() - t0

        o = fresh(seed)
        seed += 1
        time.sleep(0.2)
        t0 = time.perf_counter()
        out = np.asarray(o)
        p = time.perf_counter() - t0
        assert int(out[0]) == (int(host_payload[0]) + seed - 1) % 256

        o = fresh(seed)
        seed += 1
        time.sleep(0.2)
        try:
            o.copy_to_host_async()
        except (AttributeError, RuntimeError):
            pass
        t0 = time.perf_counter()
        h = heavy(a)  # async dispatch onto the same stream?
        d = time.perf_counter() - t0
        out = np.asarray(o)
        po = time.perf_counter() - t0
        np.asarray(h)
        al = time.perf_counter() - t0
        assert int(out[0]) == (int(host_payload[0]) + seed - 1) % 256
        print(
            f"rep{rep}: exec={e*1e3:7.1f}ms  pull_alone={p*1e3:7.1f}ms  "
            f"overlap: dispatch={d*1e3:6.1f}ms pull={po*1e3:7.1f}ms "
            f"all={al*1e3:7.1f}ms",
            flush=True,
        )
    print(
        "verdict hint: overlap.pull ~= pull_alone -> overlapping stream; "
        "overlap.pull ~= exec + pull_alone -> serial stream"
    )


if __name__ == "__main__":
    main()
